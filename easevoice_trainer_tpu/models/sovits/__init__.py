from .synthesizer import SynthesizerTrn, SovitsConfig
from .discriminator import MultiPeriodDiscriminator
from .quantize import ResidualVectorQuantizer
from . import losses
