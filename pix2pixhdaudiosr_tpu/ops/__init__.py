from . import window, dct, framing, mdct, audio, encoding  # noqa: F401
