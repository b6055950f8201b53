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
from .wav2vec2 import AudioEmbedder, Wav2Vec2, Wav2Vec2Config, convert_wav2vec2
from .insight_face import (
    IRSE,
    FaceViT,
    MobileFaceNet,
    convert_face_vit,
    convert_irse,
    convert_mobilefacenet,
    make_embed_fn,
)
from .efficientnet import (
    EffNetConfig,
    EfficientNet,
    convert_enet,
    load_enet_checkpoint,
    make_enet_logits_apply,
)
from .lipreader import (
    LipreaderFrontend,
    convert_lipreader,
    load_lipreader_checkpoint,
    make_lipreader_apply,
)
