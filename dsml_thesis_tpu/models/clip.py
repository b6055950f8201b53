"""CLIP ViT (image + text) towers for the DiffusionCLIP directional loss.

Parity target: the `clip.load('ViT-B/16')` model the reference CLIPLoss wraps
(face_reenactment/ldm/modules/losses/cliploss.py:31-60) — OpenAI CLIP
architecture: pre-LN transformer with QuickGELU, fused-qkv attention, class
token + learned positions on the vision side, causal text transformer pooled
at the EOT token. Weight converters accept both the OpenAI checkpoint layout
(`visual.transformer.resblocks...`) and the HuggingFace CLIPModel layout
(`vision_model.encoder.layers...`); tests oracle against a random-init
`transformers.CLIPModel`.

Text-direction precompute mirrors cliploss.py:120-127 (per-template text
features, normalized, mean difference renormalized) with the prompt templates
from utils/text_templates.py.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# CLIP pixel normalization (clip/clip.py _transform; used via cliploss.py:46-49)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """Defaults are ViT-B/16 (the reference's clip_model, cliploss.py:39)."""

    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    embed_dim: int = 512
    # OpenAI CLIP uses QuickGELU; some HF CLIP checkpoints (LAION ViT-H/bigG)
    # use plain GELU — converting those with the wrong activation silently
    # corrupts every embedding
    use_quick_gelu: bool = True


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    """Pre-LN residual attention block (OpenAI ResidualAttentionBlock)."""

    heads: int
    causal: bool = False
    use_quick_gelu: bool = True

    @nn.compact
    def __call__(self, x):
        b, l, d = x.shape
        hd = d // self.heads
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, l, 3 * self.heads, hd), 3, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd ** -0.5
        if self.causal:
            mask = jnp.tril(jnp.ones((l, l), bool))
            logits = jnp.where(mask, logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        h = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, d)
        x = x + nn.Dense(d, name="out_proj")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * d, name="c_fc")(h)
        h = quick_gelu(h) if self.use_quick_gelu else jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(d, name="c_proj")(h)


class CLIPVisionTower(nn.Module):
    """224px NHWC (CLIP-normalized) -> embed_dim image features."""

    cfg: CLIPConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b = x.shape[0]
        h = nn.Conv(c.vision_width, (c.patch_size,) * 2, strides=(c.patch_size,) * 2,
                    padding="VALID", use_bias=False, name="patch_conv")(x)
        h = h.reshape(b, -1, c.vision_width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.vision_width,))
        h = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), h], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (h.shape[1], c.vision_width))
        h = h + pos
        h = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(h)
        for i in range(c.vision_layers):
            h = CLIPBlock(c.vision_heads, use_quick_gelu=c.use_quick_gelu,
                          name=f"block_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_post")(h[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (c.vision_width, c.embed_dim))
        return h @ proj


class CLIPTextTower(nn.Module):
    """(B, context) int tokens -> embed_dim text features (pooled at EOT).

    EOT position = argmax(tokens), matching clip.model.CLIP.encode_text
    (the EOT id is the largest in the vocab; padding is zeros).
    """

    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.text_width))
        h = emb[tokens]
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (c.context_length, c.text_width))
        h = h + pos[: h.shape[1]]
        for i in range(c.text_layers):
            h = CLIPBlock(c.text_heads, causal=True,
                          use_quick_gelu=c.use_quick_gelu,
                          name=f"block_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_final")(h)
        eot = jnp.argmax(tokens, axis=-1)
        h = h[jnp.arange(h.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (c.text_width, c.embed_dim))
        return h @ proj


class CLIP(nn.Module):
    """Both towers; apply with method='encode_image' / 'encode_text'."""

    cfg: CLIPConfig = CLIPConfig()

    def setup(self):
        self.visual = CLIPVisionTower(self.cfg)
        self.text = CLIPTextTower(self.cfg)

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        return self.encode_image(images), self.encode_text(tokens)


# ---------------------------------------------------------------------------
# Preprocessing & loss-side helpers
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _bicubic_matrix(in_size: int, out_size: int, a: float = -0.75):
    """Dense [out_size, in_size] bicubic interpolation matrix matching
    torch's tensor-path bicubic (antialias=False): cubic convolution kernel
    with a=-0.75 (torch/torchvision; jax.image.resize's 'cubic' is
    Catmull-Rom a=-0.5 and measurably differs), half-pixel sample centers,
    replicate borders via index clamping."""
    import numpy as np

    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0

    def cub(x):
        x = np.abs(x)
        return np.where(
            x <= 1.0, ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0))

    w = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    for j in range(-1, 3):
        np.add.at(w, (rows, np.clip(i0 + j, 0, in_size - 1)),
                  cub(frac - j).astype(np.float32))
    return w


def bicubic_resize_torch(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC bicubic resize with exact torch F.interpolate(mode='bicubic',
    align_corners=False, antialias=False) semantics, as two dense
    MXU-friendly matmuls (separable kernel). Differentiable."""
    wy = jnp.asarray(_bicubic_matrix(x.shape[1], out_h), x.dtype)
    wx = jnp.asarray(_bicubic_matrix(x.shape[2], out_w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wy, x)
    return jnp.einsum("pw,bhwc->bhpc", wx, x)


def preprocess_gan_output(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[-1,1] NHWC (any square size) -> CLIP-normalized NHWC at image_size.

    Mirrors the reference preprocess chain (cliploss.py:46-49): un-normalize
    to [0,1], bicubic resize, CLIP mean/std normalize. Differentiable.
    """
    x = (images + 1.0) * 0.5
    if x.shape[1] != image_size or x.shape[2] != image_size:
        # antialias=False + a=-0.75: the reference's torchvision 0.12
        # tensor-path Resize runs plain (aliased) torch bicubic; both the
        # antialiased and the Catmull-Rom (a=-0.5) variants feed measurably
        # different pixels into the CLIP loss (up to ~0.1 in [0,1] units)
        x = bicubic_resize_torch(x, image_size, image_size)
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


def make_clip_image_embed(cfg: CLIPConfig, params: Dict):
    """Bind an `images([-1,1] NHWC) -> normalized embeddings` callable.

    NOTE: closes over the weights — fine for host-side metric scripts, but
    jitted training losses must use make_clip_image_embed_apply so the
    weights travel as jit arguments (CLAUDE.md)."""
    apply_fn = make_clip_image_embed_apply(cfg)
    return lambda images: apply_fn(params, images)


def make_clip_image_embed_apply(cfg: CLIPConfig):
    """Param-taking variant: fn(visual_params, images) -> normalized
    embeddings, safe inside jitted losses."""
    tower = CLIPVisionTower(cfg)

    def fn(params, images):
        feats = tower.apply({"params": params},
                            preprocess_gan_output(images, cfg.image_size))
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    return fn


def compute_text_direction(
    cfg: CLIPConfig,
    text_params: Dict,
    src_tokens: jnp.ndarray,
    trg_tokens: jnp.ndarray,
) -> jnp.ndarray:
    """Normalized mean difference of per-template text features.

    src/trg_tokens: (T, context) tokenized `template.format(class)` prompts
    (cliploss.py:120-127 compute_text_direction).
    """
    tower = CLIPTextTower(cfg)

    def embed(tok):
        f = tower.apply({"params": text_params}, tok)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    d = (embed(trg_tokens) - embed(src_tokens)).mean(axis=0)
    # eps guards identical src/trg prompts (e.g. contempt, which has no
    # reference edit text): the direction degrades to an exact zero row
    # instead of 0/0 = NaN, so its directional loss is a constant with zero
    # gradient rather than poisoning the whole batch
    return d / (jnp.linalg.norm(d) + 1e-8)


# Prompt templates for text-direction averaging (StyleGAN-NADA's ImageNet
# template set; reference vendored copy at utils/text_templates.py:1-82).
IMAGENET_TEMPLATES = [
    "a bad photo of a {}.", "a sculpture of a {}.",
    "a photo of the hard to see {}.", "a low resolution photo of the {}.",
    "a rendering of a {}.", "graffiti of a {}.", "a bad photo of the {}.",
    "a cropped photo of the {}.", "a tattoo of a {}.", "the embroidered {}.",
    "a photo of a hard to see {}.", "a bright photo of a {}.",
    "a photo of a clean {}.", "a photo of a dirty {}.",
    "a dark photo of the {}.", "a drawing of a {}.", "a photo of my {}.",
    "the plastic {}.", "a photo of the cool {}.", "a close-up photo of a {}.",
    "a black and white photo of the {}.", "a painting of the {}.",
    "a painting of a {}.", "a pixelated photo of the {}.",
    "a sculpture of the {}.", "a bright photo of the {}.",
    "a cropped photo of a {}.", "a plastic {}.", "a photo of the dirty {}.",
    "a jpeg corrupted photo of a {}.", "a blurry photo of the {}.",
    "a photo of the {}.", "a good photo of the {}.", "a rendering of the {}.",
    "a {} in a video game.", "a photo of one {}.", "a doodle of a {}.",
    "a close-up photo of the {}.", "a photo of a {}.", "the origami {}.",
    "the {} in a video game.", "a sketch of a {}.", "a doodle of the {}.",
    "a origami {}.", "a low resolution photo of a {}.", "the toy {}.",
    "a rendition of the {}.", "a photo of the clean {}.",
    "a photo of a large {}.", "a rendition of a {}.",
    "a photo of a nice {}.", "a photo of a weird {}.",
    "a blurry photo of a {}.", "a cartoon {}.", "art of a {}.",
    "a sketch of the {}.", "a embroidered {}.",
    "a pixelated photo of a {}.", "itap of the {}.",
    "a jpeg corrupted photo of the {}.", "a good photo of a {}.",
    "a plushie {}.", "a photo of the nice {}.", "a photo of the small {}.",
    "a photo of the weird {}.", "the cartoon {}.", "art of the {}.",
    "a drawing of the {}.", "a photo of the large {}.",
    "a black and white photo of a {}.", "the plushie {}.",
    "a dark photo of a {}.", "itap of a {}.", "graffiti of the {}.",
    "a toy {}.", "itap of my {}.", "a photo of a cool {}.",
    "a photo of a small {}.", "a tattoo of the {}.",
]


# ---------------------------------------------------------------------------
# Weight converters
# ---------------------------------------------------------------------------

def _np32(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def convert_clip_openai(
    sd: Dict,
    vision_heads: Optional[int] = None,
    text_heads: Optional[int] = None,
) -> Tuple[CLIPConfig, Dict]:
    """OpenAI `clip` checkpoint state_dict -> (config, {'visual':…, 'text':…}).

    Layout: visual.conv1/class_embedding/positional_embedding/ln_pre/
    transformer.resblocks.{i}.{ln_1,attn.in_proj_*,attn.out_proj,ln_2,
    mlp.c_fc,mlp.c_proj}/ln_post/proj; text side transformer.resblocks…,
    token_embedding, positional_embedding, ln_final, text_projection.
    """
    vw = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    tw = sd["text_projection"].shape[0]
    cfg = CLIPConfig(
        image_size=grid * patch, patch_size=patch, vision_width=vw,
        vision_layers=sum(1 for k in sd if k.endswith(".attn.in_proj_weight")
                          and k.startswith("visual.")),
        vision_heads=vision_heads or vw // 64,
        vocab_size=sd["token_embedding.weight"].shape[0],
        context_length=sd["positional_embedding"].shape[0],
        text_width=tw, text_heads=text_heads or tw // 64,
        text_layers=sum(1 for k in sd if k.endswith(".attn.in_proj_weight")
                        and not k.startswith("visual.")),
        embed_dim=sd["text_projection"].shape[1],
    )

    def ln(t):
        return {"scale": _np32(sd[f"{t}.weight"]), "bias": _np32(sd[f"{t}.bias"])}

    def block(t):
        return {
            "ln_1": ln(f"{t}.ln_1"), "ln_2": ln(f"{t}.ln_2"),
            "qkv": {"kernel": _np32(sd[f"{t}.attn.in_proj_weight"]).T,
                    "bias": _np32(sd[f"{t}.attn.in_proj_bias"])},
            "out_proj": {"kernel": _np32(sd[f"{t}.attn.out_proj.weight"]).T,
                         "bias": _np32(sd[f"{t}.attn.out_proj.bias"])},
            "c_fc": {"kernel": _np32(sd[f"{t}.mlp.c_fc.weight"]).T,
                     "bias": _np32(sd[f"{t}.mlp.c_fc.bias"])},
            "c_proj": {"kernel": _np32(sd[f"{t}.mlp.c_proj.weight"]).T,
                       "bias": _np32(sd[f"{t}.mlp.c_proj.bias"])},
        }

    visual: Dict = {
        "patch_conv": {"kernel": _np32(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np32(sd["visual.class_embedding"]),
        "positional_embedding": _np32(sd["visual.positional_embedding"]),
        "ln_pre": ln("visual.ln_pre"), "ln_post": ln("visual.ln_post"),
        "proj": _np32(sd["visual.proj"]),
    }
    for i in range(cfg.vision_layers):
        visual[f"block_{i}"] = block(f"visual.transformer.resblocks.{i}")
    text: Dict = {
        "token_embedding": _np32(sd["token_embedding.weight"]),
        "positional_embedding": _np32(sd["positional_embedding"]),
        "ln_final": ln("ln_final"),
        "text_projection": _np32(sd["text_projection"]),
    }
    for i in range(cfg.text_layers):
        text[f"block_{i}"] = block(f"transformer.resblocks.{i}")
    return cfg, {"visual": visual, "text": text}


def convert_clip_hf(
    sd: Dict,
    vision_heads: Optional[int] = None,
    text_heads: Optional[int] = None,
    use_quick_gelu: bool = True,
) -> Tuple[CLIPConfig, Dict]:
    """HuggingFace transformers CLIPModel state_dict -> (config, params).

    use_quick_gelu=True matches OpenAI-lineage checkpoints
    (hidden_act='quick_gelu'); pass False for checkpoints trained with plain
    GELU (LAION ViT-H/bigG) — the state_dict alone cannot tell them apart."""
    vw = sd["vision_model.embeddings.patch_embedding.weight"].shape[0]
    patch = sd["vision_model.embeddings.patch_embedding.weight"].shape[-1]
    grid = int(round(
        (sd["vision_model.embeddings.position_embedding.weight"].shape[0] - 1) ** 0.5
    ))
    tw = sd["text_projection.weight"].shape[1]
    n_v = sum(1 for k in sd if k.startswith("vision_model.encoder.layers.")
              and k.endswith(".self_attn.q_proj.weight"))
    n_t = sum(1 for k in sd if k.startswith("text_model.encoder.layers.")
              and k.endswith(".self_attn.q_proj.weight"))
    # head counts are not recoverable from the state dict; standard CLIP uses
    # 64-d heads (ViT-B/16: 12 vision / 8 text)
    cfg = CLIPConfig(
        image_size=grid * patch, patch_size=patch, vision_width=vw,
        vision_layers=n_v, vision_heads=vision_heads or max(1, vw // 64),
        vocab_size=sd["text_model.embeddings.token_embedding.weight"].shape[0],
        context_length=sd["text_model.embeddings.position_embedding.weight"].shape[0],
        text_width=tw, text_heads=text_heads or max(1, tw // 64),
        text_layers=n_t,
        embed_dim=sd["visual_projection.weight"].shape[0],
        use_quick_gelu=use_quick_gelu,
    )

    def ln(t):
        return {"scale": _np32(sd[f"{t}.weight"]), "bias": _np32(sd[f"{t}.bias"])}

    def block(t):
        qkv_w = np.concatenate(
            [_np32(sd[f"{t}.self_attn.{p}_proj.weight"]) for p in "qkv"], axis=0
        )
        qkv_b = np.concatenate(
            [_np32(sd[f"{t}.self_attn.{p}_proj.bias"]) for p in "qkv"], axis=0
        )
        return {
            "ln_1": ln(f"{t}.layer_norm1"), "ln_2": ln(f"{t}.layer_norm2"),
            "qkv": {"kernel": qkv_w.T, "bias": qkv_b},
            "out_proj": {"kernel": _np32(sd[f"{t}.self_attn.out_proj.weight"]).T,
                         "bias": _np32(sd[f"{t}.self_attn.out_proj.bias"])},
            "c_fc": {"kernel": _np32(sd[f"{t}.mlp.fc1.weight"]).T,
                     "bias": _np32(sd[f"{t}.mlp.fc1.bias"])},
            "c_proj": {"kernel": _np32(sd[f"{t}.mlp.fc2.weight"]).T,
                       "bias": _np32(sd[f"{t}.mlp.fc2.bias"])},
        }

    visual: Dict = {
        "patch_conv": {"kernel": _np32(
            sd["vision_model.embeddings.patch_embedding.weight"]
        ).transpose(2, 3, 1, 0)},
        "class_embedding": _np32(sd["vision_model.embeddings.class_embedding"]),
        "positional_embedding": _np32(
            sd["vision_model.embeddings.position_embedding.weight"]),
        "ln_pre": ln("vision_model.pre_layrnorm"),
        "ln_post": ln("vision_model.post_layernorm"),
        "proj": _np32(sd["visual_projection.weight"]).T,
    }
    for i in range(cfg.vision_layers):
        visual[f"block_{i}"] = block(f"vision_model.encoder.layers.{i}")
    text: Dict = {
        "token_embedding": _np32(sd["text_model.embeddings.token_embedding.weight"]),
        "positional_embedding": _np32(
            sd["text_model.embeddings.position_embedding.weight"]),
        "ln_final": ln("text_model.final_layer_norm"),
        "text_projection": _np32(sd["text_projection.weight"]).T,
    }
    for i in range(cfg.text_layers):
        text[f"block_{i}"] = block(f"text_model.encoder.layers.{i}")
    return cfg, {"visual": visual, "text": text}


def load_clip_checkpoint(path: str,
                         use_quick_gelu: bool = True) -> Tuple[CLIPConfig, Dict]:
    """Load an OpenAI (`clip.load` jit archive or plain state_dict) or HF
    CLIP checkpoint from disk and convert.

    use_quick_gelu only affects HF-layout checkpoints (OpenAI-layout ones
    are always QuickGELU): pass False for plain-GELU checkpoints (LAION
    ViT-H/bigG) — the state_dict alone cannot tell the activations apart,
    and the wrong one silently corrupts every embedding."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "visual.conv1.weight" in obj:
        return convert_clip_openai(obj)
    if "vision_model.embeddings.patch_embedding.weight" in obj:
        return convert_clip_hf(obj, use_quick_gelu=use_quick_gelu)
    raise ValueError(f"unrecognized CLIP checkpoint layout in {path}")
