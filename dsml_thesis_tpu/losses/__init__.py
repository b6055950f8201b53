from .discriminator import (
    NLayerDiscriminator,
    hinge_d_loss,
    vanilla_d_loss,
    adopt_weight,
    measure_perplexity,
)
from .lpips import LPIPS, convert_lpips_weights
from .vqperceptual import VQGANLoss
from .contperceptual import KLAutoencoderLoss
