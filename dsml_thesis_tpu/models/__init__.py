from .unet import UNetModel, timestep_embedding
from .autoencoder import (
    Encoder,
    Decoder,
    VQModel,
    AutoencoderKL,
    IdentityFirstStage,
    DiagonalGaussian,
)
from .quantize import VectorQuantizer, GumbelQuantizer, EMAVectorQuantizer
from .encoders import (
    ClassEmbedder,
    Conv1DTemporalAttention,
    LandmarkEncoder,
    TransformerTextEmbedder,
)
