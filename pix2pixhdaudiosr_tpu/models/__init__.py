from .generator import GlobalGenerator, LocalEnhancer, Encoder, build_generator  # noqa: F401
from .discriminator import NLayerDiscriminator, MultiscaleDiscriminator, build_discriminator  # noqa: F401
