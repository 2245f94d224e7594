from . import (audio, dct, dctlib, encoding, framing, legacy, mdct,  # noqa: F401
               quant, window)

