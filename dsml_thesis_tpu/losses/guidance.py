"""Guidance losses for the DiffusionCLIP-style emotion finetune.

Parity targets:
  - CLIP directional loss (StyleGAN-NADA style): ldm/modules/losses/cliploss.py:31-318
    loss = 1 - cos(ΔI, ΔT) with ΔI = E_I(edit) - E_I(src), ΔT = E_T(trg) - E_T(src);
    the model maps it through -log((2 - d)/2) (latent_diffclip.py loss assembly)
  - ID loss (ArcFace cosine): ldm/modules/losses/idloss.py:11-59
  - CLS loss (frozen emotion classifier CE): ldm/modules/losses/clsloss.py:80-114
  - emotion prompt pairs: face_reenactment/utils/text_dic.py (SRC_TRG_TXT_DIC)

Pretrained encoders (CLIP ViT, ArcFace, HSEmotion) cannot be downloaded here;
each loss takes the encoder as an injected callable / converted params, so the
math is exercised in tests with stand-ins and runs with real weights when the
user supplies them.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

# emotion index -> (source prompt, target prompt) pairs, mirroring the intent
# of the reference's SRC_TRG_TXT_DIC (utils/text_dic.py:1-17)
# reference label2emotion_dict (latent_diffclip.py:542): the SOURCE-side text
# per AffectNet class; the class equal to the edit target maps to 'face'
# (:545-547), as do neutral (0) and contempt (7)
LABEL2EMOTION = {
    0: "face", 1: "happy face", 2: "sad face", 3: "surprised face",
    4: "scared face", 5: "disgusted face", 6: "angry face", 7: "face",
}

# per-TARGET-class prompts (extension mode, no edit_attr): target texts use
# the reference's SRC_TRG_TXT_DIC vocabulary ('scared face' for fear;
# contempt has no reference edit — plain 'face' like LABEL2EMOTION)
EMOTION_PROMPTS = {
    0: ("face", "neutral face"),
    1: ("face", "happy face"),
    2: ("face", "sad face"),
    3: ("face", "surprised face"),
    4: ("face", "scared face"),
    5: ("face", "disgusted face"),
    6: ("face", "angry face"),
    7: ("face", "face"),
}


def _norm(x, axis=-1, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def clip_directional_loss(
    image_embed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    src_images: jnp.ndarray,
    edited_images: jnp.ndarray,
    text_direction: jnp.ndarray,
) -> jnp.ndarray:
    """1 - cos(image direction, text direction), averaged over the batch.

    text_direction = normalize(E_T(target prompt) - E_T(source prompt)) is
    precomputed offline (the reference embeds prompt templates at init,
    cliploss.py:181-220).
    """
    e_src = image_embed_fn(src_images)
    e_edit = image_embed_fn(edited_images)
    img_dir = _norm(e_edit - e_src)
    txt_dir = _norm(text_direction)
    return jnp.mean(1.0 - jnp.sum(img_dir * txt_dir, axis=-1))


def diffusionclip_direction_loss(d: jnp.ndarray) -> jnp.ndarray:
    """-log((2 - d) / 2) mapping of the directional distance (latent_diffclip)."""
    return -jnp.log(jnp.clip((2.0 - d) / 2.0, 1e-6, 1.0))


def id_loss(
    embed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    src_images: jnp.ndarray,
    edited_images: jnp.ndarray,
) -> jnp.ndarray:
    """1 - cos(ArcFace(src), ArcFace(edit)); images are 112x112 crops
    (idloss.py resizes/pools to the face region)."""
    a = _norm(embed_fn(src_images))
    b = _norm(embed_fn(edited_images))
    return jnp.mean(1.0 - jnp.sum(a * b, axis=-1))


def cls_loss(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    edited_images: jnp.ndarray,
    target_labels: jnp.ndarray,
) -> jnp.ndarray:
    """Cross-entropy toward the target emotion under a frozen classifier."""
    logits = logits_fn(edited_images)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target_labels[:, None], axis=-1))


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)
