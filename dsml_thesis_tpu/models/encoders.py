"""Conditioning-stage encoders.

Parity targets (architecture, not code):
  - ClassEmbedder / ClassEmbedder3 (trainable null row + whole-batch CFG drop):
    face_reenactment/ldm/modules/encoders/modules.py:20-94,
    talking_face/ldm/modules/encoders/modules.py:44-73
  - Conv1DTemporalAttention (audio window -> 1 pooled token):
    talking_face/ldm/modules/encoders/modules.py:75-113
  - LandmarkEncoder: talking_face/ldm/modules/encoders/modules.py:331-348

CFG label-drop is a whole-batch Bernoulli(p_uncond) during training, exactly
like the reference (torch.rand(1) < p). The PRNG comes from the 'cfg' rng
collection so the train step stays pure.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class ClassEmbedder(nn.Module):
    """Class-label -> single crossattn token, with a trainable null embedding.

    Unifies the reference's ClassEmbedder variants:
      - null_mode="separate": distinct 1-row null table (ClassEmbedder3)
      - null_mode="extra_row": row n_classes of an (n_classes+1)-row table
        (talking_face ClassEmbedder)
      - null_mode="none": plain embedder, no null table / CFG dropout
        (face_reenactment's original ClassEmbedder, modules.py:20)
    """

    embed_dim: int
    n_classes: int
    p_uncond: float = 0.0
    null_mode: str = "extra_row"
    # ClassEmbedder2 pins its null row at random init (modules.py:41-43
    # requires_grad=False); stop_gradient keeps that semantic here
    freeze_null: bool = False
    key: str = "class_label"  # config parity (batch key)

    def setup(self):
        if self.freeze_null and self.null_mode != "separate":
            # only the 'separate' table has a distinct null row to pin
            # (ClassEmbedder2); silently ignoring the flag would train a
            # row the config says is frozen
            raise ValueError(
                "freeze_null=True requires null_mode='separate' "
                f"(got null_mode={self.null_mode!r})")
        if self.null_mode == "extra_row":
            self.embedding = nn.Embed(self.n_classes + 1, self.embed_dim)
        elif self.null_mode == "separate":
            self.embedding = nn.Embed(self.n_classes, self.embed_dim)
            self.uncond_embedding = nn.Embed(1, self.embed_dim)
        else:
            assert self.null_mode == "none", self.null_mode
            assert self.p_uncond == 0.0, "null_mode='none' cannot drop labels"
            self.embedding = nn.Embed(self.n_classes, self.embed_dim)

    def frozen_paths(self):
        """Param sub-trees the optimizer must skip (collected by
        LDM.frozen_subpaths): the pinned null row is requires_grad=False in
        the reference (ClassEmbedder2, modules.py:41-43) — stop_gradient
        zeroes its grads, but AdamW's decoupled weight decay would still
        shrink it every step without this exclusion."""
        return ("uncond_embedding",) if self.freeze_null else ()

    def _null(self, batch_size: int) -> jnp.ndarray:
        if self.null_mode == "extra_row":
            ids = jnp.full((batch_size,), self.n_classes, dtype=jnp.int32)
            return self.embedding(ids)
        if self.null_mode == "separate":
            e = self.uncond_embedding(jnp.zeros((batch_size,), dtype=jnp.int32))
            return jax.lax.stop_gradient(e) if self.freeze_null else e
        raise ValueError(
            "this ClassEmbedder has no null embedding (null_mode='none', the "
            "plain reference variant) — CFG sampling needs ClassEmbedder3 / "
            "the talking_face variant"
        )

    def __call__(self, labels: jnp.ndarray, training: bool = False):
        """labels: int [B] -> tokens [B, 1, embed_dim]."""
        c = self.embedding(labels)
        if self.null_mode != "none":
            # always touch the null table so its params materialize at init
            # (null_token is used by CFG sampling even when training never
            # drops)
            null = self._null(labels.shape[0])
            if training and self.p_uncond > 0:
                drop = jax.random.uniform(self.make_rng("cfg"), ()) < self.p_uncond
                c = jnp.where(drop, null, c)
        return c[:, None, :]

    def null_token(self, batch_size: int):
        """Unconditional token for CFG sampling."""
        return self._null(batch_size)[:, None, :]


class Conv1DTemporalAttention(nn.Module):
    """Attention-pool a (2w+1)-frame audio-feature window into one token.

    5-layer Conv1d pyramid 768->192->64->16->4->1 (LeakyReLU 0.02) produces
    per-frame scores; a Dense+softmax over the window yields attention weights;
    the pooled feature is the weighted sum. Output [B, 1, subspace_dim].
    """

    seq_len: int
    subspace_dim: int = 768
    subspace2hidden: bool = False
    hidden_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        """x: [B, seq_len, subspace_dim] -> [B, 1, subspace_dim or hidden]."""
        b = x.shape[0]
        h = x
        for i, ch in enumerate((192, 64, 16, 4, 1)):
            h = nn.Conv(ch, (3,), padding=1, name=f"att_conv_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.02)
        scores = nn.Dense(self.seq_len, name="att_dense")(h.reshape(b, self.seq_len))
        attn = jax.nn.softmax(scores, axis=1)[:, :, None]  # [B, L, 1]
        pooled = jnp.sum(x * attn, axis=1)  # [B, subspace_dim]
        if self.subspace2hidden:
            # reference returns the projected hidden WITHOUT the token axis
            # (modules.py:110-111 `return hidden`, no unsqueeze)
            assert self.hidden_dim is not None
            return nn.Dense(self.hidden_dim, name="to_hidden")(pooled)
        return pooled[:, None, :]


class TransformerTextEmbedder(nn.Module):
    """Token-id sequence -> contextual embeddings for crossattn conditioning.

    Capability parity with the reference's x_transformer-based
    TransformerEmbedder / BERTEmbedder (ldm/modules/x_transformer.py +
    encoders/modules.py:96-145) — a compact pre-LN transformer encoder with
    learned positional embeddings, returning [B, L, n_embed] token states.
    """

    n_embed: int
    n_layer: int
    vocab_size: int = 30522
    max_seq_len: int = 77
    n_heads: int = 8

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, training: bool = False):
        b, L = tokens.shape
        h = nn.Embed(self.vocab_size, self.n_embed, name="tok_emb")(tokens)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (self.max_seq_len, self.n_embed)
        )
        h = h + pos[None, :L]
        for i in range(self.n_layer):
            ln1 = nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")(h)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, name=f"attn_{i}"
            )(ln1, ln1)
            h = h + attn
            ln2 = nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")(h)
            ff = nn.Dense(4 * self.n_embed, name=f"ff_in_{i}")(ln2)
            ff = nn.gelu(ff)
            ff = nn.Dense(self.n_embed, name=f"ff_out_{i}")(ff)
            h = h + ff
        return nn.LayerNorm(epsilon=1e-5, name="ln_f")(h)

    def encode(self, tokens, training: bool = False):
        return self(tokens, training)


class LandmarkEncoder(nn.Module):
    """Flattened 48-landmark (96-d) 5-layer MLP encoder -> one token.

    Exact reference architecture (talking_face modules.py:331-348):
    in -> 128 -> 256 -> 512 -> 256 -> output_dim, ReLU between layers,
    so reference weights convert layer-for-layer."""

    output_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        b = x.shape[0]
        h = x.reshape(b, -1)
        for i, d in enumerate((128, 256, 512, 256)):
            h = nn.relu(nn.Dense(d, name=f"fc{i}")(h))
        h = nn.Dense(self.output_dim, name="fc4")(h)
        return h[:, None, :]
