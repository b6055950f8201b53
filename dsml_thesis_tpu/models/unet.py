"""TPU-native denoising UNet (Flax linen, NHWC, bf16 MXU compute).

Behavioral parity target (architecture, not code):
  face_reenactment/ldm/modules/diffusionmodules/openaimodel.py:413-743 (UNetModel)
  face_reenactment/ldm/modules/attention.py:152-260 (CrossAttention /
  BasicTransformerBlock / SpatialTransformer)

Differences by design (TPU-first):
  - NHWC layout end-to-end (native for TPU convolutions).
  - Self-attention over latent tokens runs through the Pallas flash kernel
    (ops/attention.py); tiny-KV cross-attention stays as fused XLA einsums.
  - GroupNorm+SiLU pairs use the fused Pallas kernel on TPU.
  - Parameters are fp32; activations can be bf16 (dtype arg) — norms and
    softmax accumulate in fp32.
  - Gradient checkpointing = jax.checkpoint at ResBlock/transformer boundaries
    (replaces the reference's custom autograd CheckpointFunction).

Config keys accepted mirror the reference YAML `unet_config.params` exactly
(image_size, in_channels, model_channels, out_channels, num_res_blocks,
attention_resolutions, channel_mult, num_heads / num_head_channels,
use_spatial_transformer, transformer_depth, context_dim, dropout, ...).
"""
from __future__ import annotations

import math
import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..flags import env_flag, env_mode
from ..ops.attention import multi_head_attention, packed_multi_head_attention
from ..ops.conv_gn import conv3x3_stats, conv_stats, group_norm_silu_apply
from ..ops.groupnorm import group_norm_silu


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000):
    """Sinusoidal embeddings, [cos | sin] ordering like guided-diffusion."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNormSiLU(nn.Module):
    """GroupNorm (fp32 stats) optionally fused with SiLU.

    `stats=(ch_sum, ch_sq)` (per-channel fp32 sums over the spatial axes,
    e.g. from a producing conv's epilogue — ops/conv_gn.py) skips the
    dedicated statistics passes and normalizes directly."""

    num_groups: int = 32
    eps: float = 1e-5
    silu: bool = True

    @nn.compact
    def __call__(self, x, stats=None):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if stats is not None:
            return group_norm_silu_apply(
                x, stats[0], stats[1], gamma, beta,
                num_groups=self.num_groups, eps=self.eps, silu=self.silu,
            )
        return group_norm_silu(
            x, gamma, beta, num_groups=self.num_groups, eps=self.eps, silu=self.silu
        )


def _gn_epilogue_mode(full: bool = False):
    """DSML_GN_EPILOGUE — conv-epilogue GN-stats fusion (ops/conv_gn.py):
      '1'         fuse everywhere (block convs, stem convs, 1x1 proj_outs)
      'res'       fuse only the 3x3 ResBlock/ResnetBlock convs — far fewer
                  distinct Pallas shapes (each is a separate Mosaic remote
                  compile, minutes each cold through the tunnel), and they
                  carry most of the win; first-A/B lever
      'interpret' / 'res-interpret'
                  the same two scopes in Pallas interpret mode (CPU tests)
    Call with full=True from the stem/proj_out sites that only run under the
    full modes. On a >1-device mesh conv_stats shard_maps the kernel over
    the data axis itself (or falls back to the GSPMD-partitionable jnp
    spec), so no mesh gate is needed here."""
    mode = env_mode("DSML_GN_EPILOGUE", "0",
                    ("0", "1", "res", "interpret", "res-interpret"))
    if mode == "0":
        return None
    if full and mode.startswith("res"):
        return None
    from ..ops.attention import _on_tpu

    if not mode.endswith("interpret") and not _on_tpu():
        return None
    return "interpret" if mode.endswith("interpret") else "1"


class _ConvParams(nn.Module):
    """Param-compatible stand-in for `nn.Conv(features, (K, K))`: identical
    param names (kernel, bias), shapes, and initializers, so the fused
    conv-epilogue path (ops/conv_gn.py) round-trips checkpoints with the
    unfused path."""

    features: int
    ksize: int = 3
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, cin: int):
        k = self.param(
            "kernel", self.kernel_init,
            (self.ksize, self.ksize, cin, self.features), jnp.float32,
        )
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return k, b


def _per_batch_bias(bias, batch: int, features: int):
    """[Cout] conv bias -> the kernel's per-batch [B, Cout] fp32 bias rows."""
    return jnp.broadcast_to(bias[None, :].astype(jnp.float32),
                            (batch, features))


class _GNParams(nn.Module):
    """Param-compatible stand-in for GroupNormSiLU (scale, bias) when the
    normalize itself is folded into a conv_stats kernel."""

    @nn.compact
    def __call__(self, c: int):
        return (self.param("scale", nn.initializers.ones, (c,), jnp.float32),
                self.param("bias", nn.initializers.zeros, (c,), jnp.float32))


def _concat_stats(a, b):
    """Per-channel stats compose through a channel concat: the channel sums
    of concat([x, y], -1) are concat of the channel sums. None if either
    side is missing (consumer falls back to its own reduce)."""
    if a is None or b is None:
        return None
    return (jnp.concatenate([a[0], b[0]], axis=-1),
            jnp.concatenate([a[1], b[1]], axis=-1))


class ResBlock(nn.Module):
    """Residual block with timestep-embedding FiLM (openaimodel.py:163-276).

    Returns `(out, stats)`: under the conv-epilogue fusion (DSML_GN_EPILOGUE,
    ops/conv_gn.py) `stats` is the per-channel (sum, sum_sq) of `out`,
    emitted by the fused out_conv+residual kernel for the NEXT GroupNorm
    consumer; otherwise None. `in_stats` accepts the same pair for this
    block's in_norm."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True, in_stats=None):
        ch_in = x.shape[-1]
        epi = _gn_epilogue_mode()
        fuse_in = epi is not None and not self.use_scale_shift_norm
        # in_norm folds INTO the in_conv kernel (normalize in VMEM from the
        # producer's stats) when stats exist and nothing resizes in between
        fold_in = fuse_in and in_stats is not None and not (self.up or self.down)
        if fold_in:
            g1, b1 = _GNParams(name="in_norm")(ch_in)
            h = x
        else:
            h = GroupNormSiLU(name="in_norm")(x, stats=in_stats)
        if self.up:
            h = upsample_nearest(h)
            x = upsample_nearest(x)
        elif self.down:
            h = avg_pool_2x(h)
            x = avg_pool_2x(x)
        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb))

        # out_norm can fold into out_conv only when dropout is inert
        fold_out = fuse_in and (deterministic or self.dropout == 0.0)
        mid_stats = None
        if fuse_in:
            # kernel A: [in_norm applied in VMEM ->] in_conv + emb-FiLM (a
            # per-batch bias) -> output stats in the epilogue. Identical
            # param tree to the unfused path — checkpoint-compatible.
            k, bconv = _ConvParams(self.out_channels, name="in_conv")(
                h.shape[-1]
            )
            bias_vec = (_per_batch_bias(bconv, emb_out.shape[0],
                                        self.out_channels)
                        + emb_out.astype(jnp.float32))
            gn_kw = (dict(in_stats=in_stats, gamma=g1, beta=b1)
                     if fold_in else {})
            h, ch_sum, ch_sq = conv3x3_stats(
                h.astype(self.dtype), k.astype(self.dtype), bias_vec,
                interpret=epi == "interpret", **gn_kw,
            )
            if fold_out:
                g2, b2n = _GNParams(name="out_norm")(self.out_channels)
                mid_stats = (ch_sum, ch_sq)
            else:
                h = GroupNormSiLU(name="out_norm")(h, stats=(ch_sum, ch_sq))
        else:
            h = nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                name="in_conv",
            )(h)
            emb_out = emb_out[:, None, None, :]
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                h = GroupNormSiLU(silu=False, name="out_norm")(h)
                h = h * (1 + scale) + shift
                h = nn.silu(h)
            else:
                h = h + emb_out
                h = GroupNormSiLU(name="out_norm")(h)
        if not fold_out:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        if epi is not None:
            # kernel B: [out_norm applied in VMEM ->] out_conv + residual,
            # with the stats of the RESULT in the epilogue for the next
            # block's norm
            if ch_in != self.out_channels:
                x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name="skip")(x)
            k2, b2 = _ConvParams(
                self.out_channels, 3, nn.initializers.zeros,
                nn.initializers.zeros, name="out_conv",
            )(h.shape[-1])
            gn_kw = (dict(in_stats=mid_stats, gamma=g2, beta=b2n)
                     if fold_out else {})
            out, s1, s2 = conv3x3_stats(
                h.astype(self.dtype), k2.astype(self.dtype),
                _per_batch_bias(b2, h.shape[0], self.out_channels),
                skip=x.astype(self.dtype), interpret=epi == "interpret",
                **gn_kw,
            )
            return out, (s1, s2)

        h = nn.Conv(
            self.out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="out_conv",
        )(h)
        if ch_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h, None


class _HeadProj(nn.Module):
    """Head-split projection: same param tree as `nn.Dense(heads*dim_head,
    use_bias=False)` (kernel [C, H*D]) but contracted as a per-head einsum
    producing [B, H, N, D] directly, so the head-split transpose is absorbed
    into the matmul's output layout instead of a separate HBM copy."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.heads * self.dim_head), jnp.float32,
        )
        k3 = kern.astype(self.dtype).reshape(
            x.shape[-1], self.heads, self.dim_head
        )
        return jnp.einsum("bnc,chd->bhnd", x.astype(self.dtype), k3)


class _ProjParams(nn.Module):
    """Bare projection kernel with the SAME param tree as
    `nn.Dense(features, use_bias=False)` — used by the fused-qkv path to
    concatenate several projections into one matmul at trace time while the
    checkpoint layout stays byte-identical."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )


class _HeadMerge(nn.Module):
    """Output projection from [B, H, N, D]: same param tree as
    `nn.Dense(q_dim)` (kernel [H*D, q_dim] + bias) but contracted per head,
    absorbing the inverse head transpose."""

    features: int
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, o):
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.heads * self.dim_head, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k3 = kern.astype(self.dtype).reshape(
            self.heads, self.dim_head, self.features
        )
        return jnp.einsum("bhnd,hdc->bnc", o.astype(self.dtype), k3) + bias.astype(self.dtype)


class _OutParams(nn.Module):
    """Bare kernel+bias with the SAME param tree as `nn.Dense(features)` —
    the fused-projection path reads to_out's weights without applying them
    (checkpoint layout stays byte-identical)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


def _attention_mesh_size() -> int:
    from ..ops import attention as _att

    return _att._ATTN_MESH.size if _att._ATTN_MESH is not None else 1


def _fproj_shape_ok(n: int, c: int, hd: int, dtype) -> bool:
    """Route through the fused-projection kernel only where it WINS: a
    single whole-N q-block at the REAL activation itemsize (multi-block
    shapes pay K/V recompute and lost the on-chip A/B; they stay on the
    stock packed kernel, which is also the right fallback — not the
    composed path)."""
    from ..ops.attention import fproj_eligible

    return fproj_eligible(n, c, hd, jnp.dtype(dtype).itemsize)


class CrossAttention(nn.Module):
    """Multi-head attention; self-attn if context is None (attention.py:152-193)."""

    heads: int
    dim_head: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        inner = self.heads * self.dim_head
        q_dim = x.shape[-1]
        is_cross = context is not None
        context = x if context is None else context
        if (is_cross and context.shape[1] == 1
                and env_flag("DSML_XATTN_1TOK", True)):
            # Single-token cross-attention is algebraically a broadcast: the
            # softmax over one key is identically 1 (exp(z)/exp(z)) whatever
            # the logit, so P@V == V for every query row and the Q/K towers
            # are mathematically dead — d(out)/d(W_q) = d(out)/d(W_k) = 0
            # exactly (the softmax Jacobian of a size-1 axis is zero), which
            # is also what the stock path's gradients evaluate to. Both
            # shipped families ride this shape: the talking-face c12 context
            # is ONE 1024-d token (class ⊕ audio, SURVEY §2.3 /
            # mead-128-ldm-f4.yaml:68-81) and the face-reenactment class
            # context is ONE 512-d token. The whole block collapses to two
            # [B, 1, ·] matmuls + a broadcast (to_out is row-linear, so
            # to_out(tile(v)) == tile(to_out(v))), eliminating the N-wide
            # to_q and to_out matmuls, the QK/softmax/PV chain, and — via
            # DCE — the norm2 LayerNorm whose output only fed to_q.
            # Exact-parity + zero-grad tests: tests/test_ops.py. Kill
            # switch: DSML_XATTN_1TOK=0.
            _ProjParams(inner, name="to_q")(q_dim)  # params only: ckpt/tree
            _ProjParams(inner, name="to_k")(context.shape[-1])  # parity
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_v")(context)
            out = nn.Dense(q_dim, dtype=self.dtype, name="to_out")(v)
            out = jnp.broadcast_to(out, (x.shape[0], x.shape[1], q_dim))
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)
        # DSML_ATTN_BHND=1: produce/consume the head axis inside the
        # projection matmuls (einsum bnc,chd->bhnd) instead of explicit
        # reshape+transpose copies around the kernel — identical params and
        # numerics, different XLA data movement. A/B lever for the ~7-8.5%
        # layout-copy share in the device profile (PROFILE.md).
        if env_flag("DSML_ATTN_BHND", False):
            q = _HeadProj(self.heads, self.dim_head, self.dtype, name="to_q")(x)
            k = _HeadProj(self.heads, self.dim_head, self.dtype, name="to_k")(context)
            v = _HeadProj(self.heads, self.dim_head, self.dtype, name="to_v")(context)
            out = multi_head_attention(q, k, v, scale=self.dim_head**-0.5)
            out = _HeadMerge(q_dim, self.heads, self.dim_head, self.dtype,
                             name="to_out")(out)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)
        is_self = context is x
        if (is_self and env_flag("DSML_ATTN_FUSED_PROJ", True)
                and env_flag("DSML_ATTN_PACKED", True)
                and deterministic  # sampling/eval only: training keeps the
                # tuned packed flash BACKWARD (the fused path's VJP is a
                # composed-formula recompute)
                and _attention_mesh_size() <= 1
                and x.shape[0] >= 8  # grid = batch programs: at bs1 (2 CFG
                # programs) nothing hides the serialized in-kernel
                # projections — measured 3.962 vs 4.593 f/s (PROFILE.md r4)
                and _fproj_shape_ok(x.shape[1], q_dim, inner, self.dtype)):
            # projection-FUSED self-attention (ops/attention.py
            # fused_proj_self_attention): the Pallas kernel reads the normed
            # stream once and computes qkv-proj + per-head attention +
            # to_out entirely in VMEM — q/k/v and the attention output never
            # round-trip HBM. Param tree byte-identical (bare kernels below
            # mirror nn.Dense). Composed-op fallback handles CPU/no-fit;
            # custom VJP recomputes through the composed formula, so
            # gradients remain available (the sampler is the target path).
            from ..ops.attention import fused_proj_self_attention

            wq = _ProjParams(inner, name="to_q")(q_dim)
            wk = _ProjParams(inner, name="to_k")(q_dim)
            wv = _ProjParams(inner, name="to_v")(q_dim)
            wo, bo = _OutParams(q_dim, name="to_out")(inner)
            out = fused_proj_self_attention(
                x.astype(self.dtype), wq, wk, wv, wo, bo, self.heads,
                scale=self.dim_head**-0.5)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if (is_self and env_flag("DSML_ATTN_FPROJ_PARTIAL", False)
                and env_flag("DSML_ATTN_PACKED", True)
                and deterministic
                and _attention_mesh_size() <= 1):
            # multi-q-block shapes (the full-fusion gate above rejected
            # them): K/V stay XLA-computed (no per-block recompute), the
            # kernel fuses the q projection and to_out around the per-head
            # attention. A/B lever (ops/attention.py fused_qout_self_attention)
            from ..ops.attention import fused_qout_self_attention

            wq = _ProjParams(inner, name="to_q")(q_dim)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_k")(x)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_v")(x)
            wo, bo = _OutParams(q_dim, name="to_out")(inner)
            out = fused_qout_self_attention(
                x.astype(self.dtype), k, v, wq, wo, bo, self.heads,
                scale=self.dim_head**-0.5)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)
        fused_qkv = env_flag("DSML_ATTN_FUSED_QKV", False)
        # Packed default ON: +5.3% inference / +23% training on-chip
        # (PROFILE.md round-3e). The fused-qkv branch stays on split-head
        # dispatch regardless — handing the packed kernel jnp.split views of
        # one fused projection measured −18% (same A/B table); the combination
        # defeats the kernel's no-transpose premise.
        packed = (not fused_qkv
                  and env_flag("DSML_ATTN_PACKED", True))
        if fused_qkv:
            # fuse the projections into one matmul at trace time (params
            # concatenate; tree unchanged): self-attention reads x ONCE for
            # a [C, 3*inner] dot instead of three [C, inner] dots (and the
            # wider contraction uses the MXU lanes better at the flagship's
            # skinny C=160); cross-attention fuses k/v over the context.
            # A/B lever — same numerics, different XLA data movement.
            wq = _ProjParams(inner, name="to_q")(q_dim)
            wk = _ProjParams(inner, name="to_k")(context.shape[-1])
            wv = _ProjParams(inner, name="to_v")(context.shape[-1])
            if is_self:
                w = jnp.concatenate([wq, wk, wv], axis=-1).astype(self.dtype)
                q, k, v = jnp.split(x.astype(self.dtype) @ w, 3, axis=-1)
            else:
                q = x.astype(self.dtype) @ wq.astype(self.dtype)
                wkv = jnp.concatenate([wk, wv], axis=-1).astype(self.dtype)
                k, v = jnp.split(context.astype(self.dtype) @ wkv, 2, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        if packed:
            # packed-layout kernel: the [B,N,H*D] projections feed the flash
            # kernel directly, no head-split transposes in HBM (same params
            # as the base path; dispatch falls back to split-head for
            # anything the packed kernel can't take)
            out = packed_multi_head_attention(
                q, k, v, self.heads, scale=self.dim_head**-0.5
            )
            out = nn.Dense(q_dim, dtype=self.dtype, name="to_out")(out)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)

        b, n, _ = q.shape
        m = k.shape[1]
        split = lambda t, L: t.reshape(b, L, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = multi_head_attention(
            split(q, n), split(k, m), split(v, m),
            scale=self.dim_head**-0.5,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(q_dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (attention.py:121-149), mult=4."""

    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        inner = dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        a, gate = jnp.split(proj, 2, axis=-1)
        # GELU form: the reference's F.gelu (attention.py:44) is the exact
        # erf; flax's default is the tanh approximation. On v5e the erf
        # lowering costs 8.7% END-TO-END (bench 6.363 vs 6.972 f/s/chip,
        # round-3s A/B) while |gelu_tanh - gelu_erf| <= ~3e-3 peaks below
        # the bf16 compute dtype's own rounding at those magnitudes — so
        # the bf16 flagship defaults to tanh (PARITY.md documents the
        # divergence + the fidelity-gate PSNR) and DSML_GELU_EXACT=1 gives
        # the strict erf form for fp32 parity work.
        exact = env_flag("DSML_GELU_EXACT", False)
        h = a * nn.gelu(gate, approximate=not exact)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True,
                 tile_pairs: bool = False):
        # torch nn.LayerNorm default eps (reference attention.py:203-205);
        # flax defaults to 1e-6, which drifts low-variance token rows
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       name=name)
        x = CrossAttention(
            self.heads, self.dim_head, self.dropout, self.dtype, name="attn1"
        )(ln("norm1")(x), None, deterministic) + x
        if tile_pairs:
            # CFG pair dedup THROUGH the first self-attention: the [uncond;
            # cond] halves are bitwise-identical until the first context
            # consumption, which is attn2 right here — so norm1+attn1 ran at
            # B and the pair materializes only now (exact; attn1 is
            # per-sample and both halves share its input)
            x = jnp.concatenate([x, x], axis=0)
        x = CrossAttention(
            self.heads, self.dim_head, self.dropout, self.dtype, name="attn2"
        )(ln("norm2")(x), context, deterministic) + x
        x = GEGLUFeedForward(dropout=self.dropout, dtype=self.dtype, name="ff")(
            ln("norm3")(x), deterministic
        ) + x
        return x


class AttentionBlock(nn.Module):
    """Plain QKV self-attention block (no context), used when the UNet runs
    without the spatial transformer (openaimodel.py:278-341 AttentionBlock:
    GroupNorm -> 1x1 qkv -> multi-head attention -> zero-init 1x1 proj)."""

    num_heads: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, in_stats=None):
        b, h, w, c = x.shape
        n = h * w
        hd = c // self.num_heads
        norm = GroupNormSiLU(silu=False, name="norm")(x, stats=in_stats)
        norm = norm.reshape(b, n, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(norm)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # explicit opt-in only, under its OWN env var (default stays
        # split-head here, unlike CrossAttention): this block's q/k/v are
        # jnp.split views of one fused qkv projection — the layout pattern
        # that measured −18% with the packed kernel at the CrossAttention
        # site (PROFILE.md round-3e) — and no shipped config puts this block
        # on the bench path to A/B it. It must NOT key off DSML_ATTN_PACKED:
        # '1' is that flag's documented default, so exporting it explicitly
        # would silently flip this block onto the known-losing path.
        if env_flag("DSML_ATTN_PACKED_QKVBLOCK", False):
            out = packed_multi_head_attention(q, k, v, self.num_heads,
                                              scale=hd**-0.5)
        else:
            split = lambda t: t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
            out = multi_head_attention(split(q), split(k), split(v), scale=hd**-0.5)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(
            c, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="proj_out",
        )(out)
        return x + out.reshape(b, h, w, c)


class SpatialTransformer(nn.Module):
    """Project NHWC feature map to tokens, run transformer blocks, project back
    with zero-init (attention.py:218-260)."""

    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True,
                 in_stats=None, tile_pairs: bool = False):
        # tile_pairs: x/in_stats arrive at B (the shared CFG prefix) while
        # context is the [uncond; cond] pair at 2B; the pair materializes
        # inside block_0 just before its cross-attention, so this module's
        # norm, proj_in, and first self-attention all run once per pair
        b, h, w, c = x.shape
        if tile_pairs:
            assert context is not None and context.shape[0] == 2 * b
        inner = self.heads * self.dim_head
        x_in = x
        epi_in = _gn_epilogue_mode(full=True)
        if epi_in is not None and in_stats is not None:
            # norm (silu=False) folds into the 1x1 proj_in kernel; the
            # epilogue stats are unused (LayerNorms follow, not GroupNorms)
            gN, bN = _GNParams(name="norm")(c)
            kP, bP = _ConvParams(inner, 1, name="proj_in")(c)
            x, _, _ = conv_stats(
                x.astype(self.dtype), kP.astype(self.dtype),
                _per_batch_bias(bP, b, inner), in_stats=in_stats,
                gamma=gN, beta=bN, eps=1e-6, silu_in=False,
                interpret=epi_in == "interpret",
            )
        else:
            x = GroupNormSiLU(eps=1e-6, silu=False, name="norm")(
                x, stats=in_stats)
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, self.dropout, self.dtype,
                name=f"block_{d}",
            )(x, context, deterministic, tile_pairs and d == 0)
        if tile_pairs:
            b = 2 * b
            x_in = jnp.concatenate([x_in, x_in], axis=0)
        x = x.reshape(b, h, w, inner)
        if epi_in is not None:
            # fused proj_out (1x1) + residual, stats in the epilogue for the
            # next GroupNorm consumer (ops/conv_gn.py)
            k, b2 = _ConvParams(c, 1, nn.initializers.zeros,
                                nn.initializers.zeros, name="proj_out")(inner)
            out, s1, s2 = conv_stats(
                x, k.astype(self.dtype), _per_batch_bias(b2, b, c),
                skip=x_in, interpret=epi_in == "interpret",
            )
            return out, (s1, s2)
        x = nn.Conv(
            c, (1, 1),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="proj_out",
        )(x)
        return x + x_in, None


def upsample_nearest(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


def avg_pool_2x(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest(x)
        if self.use_conv:
            out_ch = self.out_channels or x.shape[-1]
            x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        if self.use_conv:
            x = nn.Conv(
                out_ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = avg_pool_2x(x)
        return x


class UNetModel(nn.Module):
    """The denoiser. __call__(x[B,H,W,C], t[B], context[B,L,D]) -> eps[B,H,W,out]."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = -1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_spatial_transformer: bool = True
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    num_classes: Optional[int] = None
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32
    # accepted-and-ignored reference config keys
    image_size: Optional[int] = None
    legacy: bool = True

    def _heads(self, ch: int) -> Tuple[int, int]:
        """(num_heads, dim_head) for a channel width, matching the reference's
        legacy head-dim logic (openaimodel.py:541-550)."""
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            heads = ch // self.num_head_channels
        if self.legacy and self.use_spatial_transformer:
            dim_head = ch // heads
        elif self.num_head_channels == -1:
            dim_head = ch // heads
        else:
            dim_head = self.num_head_channels
        return heads, dim_head

    @nn.compact
    def __call__(self, x, timesteps, context=None, y=None, deterministic: bool = True,
                 cfg_pairs: bool = False):
        if self.use_spatial_transformer:
            assert self.context_dim is not None
        if cfg_pairs:
            # CFG batch-pair dedup: x/timesteps arrive at B while context is
            # the [uncond; cond] pair at 2B. The two CFG streams share x_t,
            # t, and every concat-conditioning channel (the framework's CFG
            # replaces only crossattn streams, reference ddim2cond.py:
            # 160-197), so everything BEFORE the first cross-attention is
            # bitwise-identical across the pair — compute it once and tile
            # to 2B at the first context consumption instead of running the
            # whole prefix twice. Exact: per-sample ops are batch-
            # independent, so tiling equals recomputing.
            assert y is None, "cfg_pairs with label_emb would diverge at emb"
            assert deterministic, "cfg_pairs requires deterministic (no dropout)"
            if self.use_spatial_transformer:
                assert context is not None and context.shape[0] == 2 * x.shape[0]
            else:
                # AttentionBlock-only UNets never consume context; the
                # not-diverged tail tiles the output instead, so a None (or
                # pair-batched) context is the supported calling convention
                assert context is None or context.shape[0] == 2 * x.shape[0]
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        if context is not None:
            if self.context_dim is not None and context.shape[-1] != self.context_dim:
                raise ValueError(
                    f"context feature width {context.shape[-1]} != configured "
                    f"context_dim {self.context_dim} — to_k/to_v would lazily "
                    "initialize to the wrong shape and only fail at "
                    "checkpoint restore")
            context = context.astype(self.dtype)

        time_embed_dim = self.model_channels * 4
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(t_emb.astype(self.dtype))
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        if self.num_classes is not None:
            assert y is not None, "class-conditional UNet needs labels y"
        elif y is not None:
            raise ValueError(
                "labels y passed to an unconditional UNet (num_classes unset) "
                "— they would be silently ignored"
            )
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, time_embed_dim, name="label_emb")(y)
        assert self.num_heads != -1 or self.num_head_channels != -1, (
            "set one of num_heads / num_head_channels (openaimodel.py:456)"
        )

        # DSML_REMAT tunes the rematerialization the config's use_checkpoint
        # requests (training-perf A/B lever; PROFILE.md round 4):
        #   full (default) = remat every ResBlock/SpatialTransformer
        #   dots = remat but save dot/matmul outputs (recompute elementwise
        #          only — jax dots_with_no_batch_dims_saveable policy)
        #   none = no remat (costs activation memory, saves recompute FLOPs)
        remat_mode = env_mode("DSML_REMAT", "full", ("full", "dots", "none"))
        use_ckpt = self.use_checkpoint and remat_mode != "none"
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if remat_mode == "dots" else None)
        # flax counts `self` as argument 0 in static_argnums, so index 3 is
        # `deterministic` (index 2 would wrongly pin the traced emb array)
        res_cls = (
            nn.remat(ResBlock, static_argnums=(3,), policy=policy)
            if use_ckpt else ResBlock
        )
        # the reference checkpoints every BasicTransformerBlock too
        # (attention.py:206); remat at the SpatialTransformer boundary —
        # at 4096 tokens its activations dominate backward memory
        # static args: deterministic (3) and tile_pairs (5) — both python
        # bools at every call site
        st_cls = (
            nn.remat(SpatialTransformer, static_argnums=(3, 5), policy=policy)
            if use_ckpt else SpatialTransformer
        )

        # `st` threads the per-channel (sum, sum_sq) of the tensor flowing
        # alongside it: under the conv-epilogue fusion every ResBlock /
        # SpatialTransformer emits the stats of its OUTPUT from its final
        # fused conv, and the next GroupNorm consumes them instead of running
        # its own HBM reduce. None anywhere = that consumer falls back.
        def res(h, st, e, out_ch, name, **kw):
            return res_cls(
                out_ch, self.dropout, self.use_scale_shift_norm,
                dtype=self.dtype, name=name, **kw,
            )(h, e, deterministic, st)

        def attn(h, st, ctx, ch, name, tile_pairs=False):
            heads, dim_head = self._heads(ch)
            if not self.use_spatial_transformer:
                # consumes incoming stats in its norm; its Dense-param
                # proj_out is not fused (config-dead for shipped YAMLs), so
                # the chain breaks here and the next consumer falls back
                # the reference remats this block too (openaimodel.py:278
                # AttentionBlock.forward wraps checkpoint()); no static args
                # beyond self — x/in_stats are both traced
                blk_cls = (nn.remat(AttentionBlock, policy=policy)
                           if use_ckpt else AttentionBlock)
                return blk_cls(heads, self.dtype, name=name)(h, st), None
            return st_cls(
                heads, dim_head, self.transformer_depth, self.dropout,
                self.dtype, name=name,
            )(h, ctx, deterministic, st, tile_pairs)

        _tile = lambda a: jnp.concatenate([a, a], axis=0)
        diverged = not cfg_pairs  # stock mode: already at the full batch

        def _diverge_rest(emb, hs):
            """Tile the rest of the shared CFG prefix (the time embedding and
            every stored skip) to the 2B pair batch. The running h/st cross
            to 2B INSIDE the first SpatialTransformer (tile_pairs), so its
            norm + proj_in + first self-attention also run once per pair."""
            hs_t = [jax.tree.map(_tile, e) for e in hs]  # None st stay None
            return _tile(emb), hs_t

        # --- input blocks ---
        hs = []
        epi = _gn_epilogue_mode(full=True)
        if epi is not None:
            k_in, b_in = _ConvParams(self.model_channels, name="conv_in")(
                x.shape[-1]
            )
            h, s1, s2 = conv3x3_stats(
                x, k_in.astype(self.dtype),
                _per_batch_bias(b_in, x.shape[0], self.model_channels),
                interpret=epi == "interpret",
            )
            st = (s1, s2)
        else:
            h = nn.Conv(
                self.model_channels, (3, 3), padding=1, dtype=self.dtype,
                name="conv_in",
            )(x)
            st = None
        hs.append((h, st))
        ch = self.model_channels
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = mult * self.model_channels
                h, st = res(h, st, emb, ch, f"down_{level}_{i}_res")
                if ds in self.attention_resolutions:
                    first_pair = not diverged and self.use_spatial_transformer
                    h, st = attn(h, st, context, ch, f"down_{level}_{i}_attn",
                                 tile_pairs=first_pair)
                    if first_pair:
                        emb, hs = _diverge_rest(emb, hs)
                        diverged = True
                hs.append((h, st))
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h, st = res(h, st, emb, ch, f"down_{level}_ds", down=True)
                else:
                    h = Downsample(
                        ch, self.conv_resample, self.dtype, name=f"down_{level}_ds"
                    )(h)
                    st = None
                hs.append((h, st))
                ds *= 2

        # --- middle ---
        h, st = res(h, st, emb, ch, "mid_res1")
        first_pair = not diverged and self.use_spatial_transformer
        # no attention in the input blocks: the pair diverges inside mid_attn
        h, st = attn(h, st, context, ch, "mid_attn", tile_pairs=first_pair)
        if first_pair:
            emb, hs = _diverge_rest(emb, hs)
            diverged = True
        h, st = res(h, st, emb, ch, "mid_res2")

        # --- output blocks ---
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h_skip, st_skip = hs.pop()
                st = _concat_stats(st, st_skip)
                h = jnp.concatenate([h, h_skip], axis=-1)
                ch = self.model_channels * mult
                h, st = res(h, st, emb, ch, f"up_{level}_{i}_res")
                if ds in self.attention_resolutions:
                    h, st = attn(h, st, context, ch, f"up_{level}_{i}_attn")
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h, st = res(h, st, emb, ch, f"up_{level}_us", up=True)
                    else:
                        h = Upsample(
                            ch, self.conv_resample, self.dtype, name=f"up_{level}_us"
                        )(h)
                        st = None
                    ds //= 2

        if epi is not None and st is not None:
            # final out_norm folds into conv_out (stats output unused)
            gO, bO = _GNParams(name="out_norm")(h.shape[-1])
            kC, bC = _ConvParams(
                self.out_channels, 3, nn.initializers.zeros,
                nn.initializers.zeros, name="conv_out",
            )(h.shape[-1])
            h, _, _ = conv3x3_stats(
                h.astype(self.dtype), kC.astype(self.dtype),
                _per_batch_bias(bC, h.shape[0], self.out_channels),
                in_stats=st, gamma=gO, beta=bO,
                interpret=epi == "interpret",
            )
        else:
            h = GroupNormSiLU(name="out_norm")(h, stats=st)
            h = nn.Conv(
                self.out_channels, (3, 3), padding=1,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                dtype=self.dtype, name="conv_out",
            )(h)
        if not diverged:
            # context was never consumed (use_spatial_transformer=False):
            # both CFG halves are the full forward — tile the output
            h = _tile(h)
        return h.astype(in_dtype)
