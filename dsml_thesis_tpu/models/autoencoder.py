"""First-stage autoencoders: VQGAN Encoder/Decoder, VQ / KL model wrappers.

Parity targets (architecture, not code):
  - Encoder/Decoder conv nets: face_reenactment/ldm/modules/diffusionmodules/model.py:368-556
    (ResnetBlock :82, AttnBlock :150, Down/Upsample :42-80)
  - VQModel / VQModelInterface / AutoencoderKL / IdentityFirstStage:
    face_reenactment/ldm/models/autoencoder.py:14-443
  - DiagonalGaussianDistribution: ldm/modules/distributions/distributions.py:24-62

TPU-first: NHWC; GroupNorm(eps=1e-6)+swish fused via the Pallas kernel; the
mid-block single-head self-attention uses the shared attention op. The
asymmetric-pad strided downsample conv matches torch's pad=(0,1,0,1) trick.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multi_head_attention
from .quantize import VectorQuantizer
from ..ops.conv_gn import conv3x3_stats, conv_stats
from .unet import (
    GroupNormSiLU,
    _ConvParams,
    _GNParams,
    _gn_epilogue_mode,
    _per_batch_bias,
    upsample_nearest,
)


class ResnetBlock(nn.Module):
    """model.py:82-149. Returns `(out, stats)`: under the conv-epilogue
    fusion (ops/conv_gn.py) and `emit_stats=True`, `stats` is the
    per-channel (sum, sum_sq) of `out` from the fused conv2+residual kernel
    for the next GroupNorm consumer; otherwise None. `in_stats` accepts the
    same pair for this block's norm1."""

    out_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, in_stats=None,
                 emit_stats: bool = False):
        out_ch = self.out_channels or x.shape[-1]
        epi = _gn_epilogue_mode()
        # norm1 folds INTO the conv1 kernel when the producer's stats exist
        fold_in = epi is not None and in_stats is not None
        if fold_in:
            g1, b1 = _GNParams(name="norm1")(x.shape[-1])
            h = x
        else:
            h = GroupNormSiLU(eps=1e-6, name="norm1")(x, stats=in_stats)
        fold_out = epi is not None and (deterministic or self.dropout == 0.0)
        mid_stats = None
        if epi is not None:
            # kernel A: [norm1 in VMEM ->] conv1, norm2's statistics in the
            # epilogue (ops/conv_gn.py; same param tree as nn.Conv — large
            # spatial shapes fall back inside conv3x3_stats)
            k, bconv = _ConvParams(out_ch, name="conv1")(h.shape[-1])
            gn_kw = (dict(in_stats=in_stats, gamma=g1, beta=b1, eps=1e-6)
                     if fold_in else {})
            h, ch_sum, ch_sq = conv3x3_stats(
                h.astype(self.dtype), k.astype(self.dtype),
                _per_batch_bias(bconv, h.shape[0], out_ch),
                interpret=epi == "interpret", **gn_kw,
            )
            if fold_out:
                g2, b2n = _GNParams(name="norm2")(out_ch)
                mid_stats = (ch_sum, ch_sq)
            else:
                h = GroupNormSiLU(eps=1e-6, name="norm2")(
                    h, stats=(ch_sum, ch_sq))
        else:
            h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                        name="conv1")(h)
            h = GroupNormSiLU(eps=1e-6, name="norm2")(h)
        if not fold_out:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        if epi is not None:
            # kernel B: [norm2 in VMEM ->] conv2 + residual (+ the output's
            # stats when a norm consumes them downstream)
            if x.shape[-1] != out_ch:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                            name="nin_shortcut")(x)
            k2, b2 = _ConvParams(out_ch, name="conv2")(h.shape[-1])
            gn_kw = (dict(in_stats=mid_stats, gamma=g2, beta=b2n, eps=1e-6)
                     if fold_out else {})
            out, s1, s2 = conv3x3_stats(
                h.astype(self.dtype), k2.astype(self.dtype),
                _per_batch_bias(b2, h.shape[0], out_ch),
                skip=x.astype(self.dtype), interpret=epi == "interpret",
                **gn_kw,
            )
            return out, ((s1, s2) if emit_stats else None)

        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h, None


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial tokens (model.py:150-203).

    Same `(out, stats)` / `in_stats` convention as ResnetBlock: the fused
    proj_out+residual kernel emits the output's GN statistics."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, in_stats=None, emit_stats: bool = False):
        b, hh, ww, c = x.shape
        epi_in = _gn_epilogue_mode(full=True)
        if epi_in is not None and in_stats is not None:
            # norm folds into ONE [C, 3C] qkv matmul (the three 1x1 conv
            # params concatenate at trace time — identical param tree), so
            # the normalized tensor is never written to HBM at all instead
            # of one write + three projection reads
            gN, bN = _GNParams(name="norm")(c)
            kq, bq = _ConvParams(c, 1, name="q")(c)
            kk, bk = _ConvParams(c, 1, name="k")(c)
            kv, bv = _ConvParams(c, 1, name="v")(c)
            w_qkv = jnp.concatenate([kq, kk, kv], axis=-1)
            b_qkv = jnp.concatenate([bq, bk, bv])
            qkv, _, _ = conv_stats(
                x.astype(self.dtype), w_qkv.astype(self.dtype),
                _per_batch_bias(b_qkv, b, 3 * c), in_stats=in_stats,
                gamma=gN, beta=bN, eps=1e-6, silu_in=False,
                interpret=epi_in == "interpret",
            )
            q, k, v = (t.reshape(b, 1, hh * ww, c)
                       for t in jnp.split(qkv, 3, axis=-1))
        else:
            h = GroupNormSiLU(eps=1e-6, silu=False, name="norm")(
                x, stats=in_stats)
            q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h).reshape(b, 1, hh * ww, c)
            k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h).reshape(b, 1, hh * ww, c)
            v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h).reshape(b, 1, hh * ww, c)
        out = multi_head_attention(q, k, v, scale=c**-0.5)
        out = out.reshape(b, hh, ww, c)
        if epi_in is not None and emit_stats:
            kp, bp = _ConvParams(c, 1, name="proj_out")(c)
            out, s1, s2 = conv_stats(
                out.astype(self.dtype), kp.astype(self.dtype),
                _per_batch_bias(bp, b, c), skip=x.astype(self.dtype),
                interpret=epi_in == "interpret",
            )
            return out, (s1, s2)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out, None


class DownsampleAE(nn.Module):
    """Strided conv with torch's asymmetric (0,1,0,1) padding (model.py:60-80)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1], (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
            name="conv",
        )(x)


class UpsampleAE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest(x)
        return nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    """ddconfig-driven conv encoder (model.py:368-461)."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int
    z_channels: int
    double_z: bool = True
    dropout: float = 0.0
    in_channels: int = 3
    out_ch: int = 3  # accepted for config parity (used by Decoder)
    tanh_out: bool = False  # config parity (used by Decoder); ddconfig is
    # splatted into BOTH nets, so a tanh_out: true YAML must not crash here
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # `st` threads per-channel (sum, sum_sq) stats from each fused
        # producer to the next GroupNorm (ops/conv_gn.py). emit_stats only
        # gates THREADING (whether the pair is returned and consumed) — the
        # kernel's epilogue reduces run either way, they are in-VMEM and
        # cheap; before a Down/Upsample the stats are simply discarded
        epi = _gn_epilogue_mode(full=True)
        if epi is not None:
            k_in, b_in = _ConvParams(self.ch, name="conv_in")(x.shape[-1])
            h, s1, s2 = conv3x3_stats(
                x.astype(self.dtype), k_in.astype(self.dtype),
                _per_batch_bias(b_in, x.shape[0], self.ch),
                interpret=epi == "interpret",
            )
            st = (s1, s2)
        else:
            h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_in")(x)
            st = None
        curr_res = self.resolution
        last_level = len(self.ch_mult) - 1
        for i_level, mult in enumerate(self.ch_mult):
            block_out = self.ch * mult
            for i_block in range(self.num_res_blocks):
                attn_here = curr_res in self.attn_resolutions
                # a Downsample (no norm consumer) directly follows the last
                # position of every non-final level
                at_resample = (i_block == self.num_res_blocks - 1
                               and i_level != last_level)
                h, st = ResnetBlock(
                    block_out, self.dropout, self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h, deterministic, st, attn_here or not at_resample)
                if attn_here:
                    h, st = AttnBlock(
                        self.dtype, name=f"down_{i_level}_attn_{i_block}"
                    )(h, st, not at_resample)
            if i_level != last_level:
                h = DownsampleAE(self.dtype, name=f"down_{i_level}_downsample")(h)
                st = None
                curr_res //= 2
        h, st = ResnetBlock(None, self.dropout, self.dtype, name="mid_block_1")(
            h, deterministic, st, True)
        h, st = AttnBlock(self.dtype, name="mid_attn_1")(h, st, True)
        h, st = ResnetBlock(None, self.dropout, self.dtype, name="mid_block_2")(
            h, deterministic, st, True)
        z_out = 2 * self.z_channels if self.double_z else self.z_channels
        if epi is not None and st is not None:
            gO, bO = _GNParams(name="norm_out")(h.shape[-1])
            kC, bC = _ConvParams(z_out, name="conv_out")(h.shape[-1])
            h, _, _ = conv3x3_stats(
                h.astype(self.dtype), kC.astype(self.dtype),
                _per_batch_bias(bC, h.shape[0], z_out), in_stats=st,
                gamma=gO, beta=bO, eps=1e-6, interpret=epi == "interpret",
            )
            return h
        h = GroupNormSiLU(eps=1e-6, name="norm_out")(h, stats=st)
        return nn.Conv(z_out, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """ddconfig-driven conv decoder (model.py:462-556)."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int
    z_channels: int
    out_ch: int = 3
    dropout: float = 0.0
    in_channels: int = 3  # config parity
    double_z: bool = False  # config parity
    tanh_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_res - 1)
        epi = _gn_epilogue_mode(full=True)
        if epi is not None:
            k_in, b_in = _ConvParams(block_in, name="conv_in")(z.shape[-1])
            h, s1, s2 = conv3x3_stats(
                z.astype(self.dtype), k_in.astype(self.dtype),
                _per_batch_bias(b_in, z.shape[0], block_in),
                interpret=epi == "interpret",
            )
            st = (s1, s2)
        else:
            h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_in")(z)
            st = None
        h, st = ResnetBlock(None, self.dropout, self.dtype, name="mid_block_1")(
            h, deterministic, st, True)
        h, st = AttnBlock(self.dtype, name="mid_attn_1")(h, st, True)
        h, st = ResnetBlock(None, self.dropout, self.dtype, name="mid_block_2")(
            h, deterministic, st, True)
        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                attn_here = curr_res in self.attn_resolutions
                # an Upsample (no norm consumer) directly follows the last
                # position of every non-final level
                at_resample = (i_block == self.num_res_blocks
                               and i_level != 0)
                h, st = ResnetBlock(
                    block_out, self.dropout, self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, deterministic, st, attn_here or not at_resample)
                if attn_here:
                    h, st = AttnBlock(
                        self.dtype, name=f"up_{i_level}_attn_{i_block}"
                    )(h, st, not at_resample)
            if i_level != 0:
                h = UpsampleAE(self.dtype, name=f"up_{i_level}_upsample")(h)
                st = None
                curr_res *= 2
        if epi is not None and st is not None:
            gO, bO = _GNParams(name="norm_out")(h.shape[-1])
            kC, bC = _ConvParams(self.out_ch, name="conv_out")(h.shape[-1])
            h, _, _ = conv3x3_stats(
                h.astype(self.dtype), kC.astype(self.dtype),
                _per_batch_bias(bC, h.shape[0], self.out_ch), in_stats=st,
                gamma=gO, beta=bO, eps=1e-6, interpret=epi == "interpret",
            )
        else:
            h = GroupNormSiLU(eps=1e-6, name="norm_out")(h, stats=st)
            h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


@dataclasses.dataclass
class DiagonalGaussian:
    """Posterior for the KL autoencoder (distributions.py:24-62)."""

    mean: jnp.ndarray
    logvar: jnp.ndarray

    @classmethod
    def from_params(cls, params: jnp.ndarray) -> "DiagonalGaussian":
        mean, logvar = jnp.split(params, 2, axis=-1)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))

    def sample(self, key: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(key, self.mean.shape)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


# pytree registration so a posterior can cross jit boundaries (e.g. the KL
# trainer's jitted model.apply returns (reconstruction, posterior))
jax.tree_util.register_dataclass(
    DiagonalGaussian, data_fields=["mean", "logvar"], meta_fields=[]
)


class VQModel(nn.Module):
    """VQGAN: encoder -> pre-quant conv -> VQ -> post-quant conv -> decoder.

    As the LDM first stage (VQModelInterface, autoencoder.py:264-282) `encode`
    skips quantization and `decode` quantizes first — exposed here via
    method="encode"/"decode"/None.
    """

    ddconfig: dict
    n_embed: int
    embed_dim: int
    beta: float = 0.25
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig)
        dd.pop("dtype", None)
        self.encoder = Encoder(dtype=self.dtype, **dd)
        self.decoder = Decoder(dtype=self.dtype, **dd)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, beta=self.beta)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(
            self.ddconfig["z_channels"], (1, 1), dtype=self.dtype
        )

    def encode(self, x, deterministic: bool = True):
        """Un-quantized latent (the LDM diffuses over this), [B,h,w,embed_dim]."""
        h = self.encoder(x, deterministic)
        return self.quant_conv(h)

    def encode_quantized(self, x, deterministic: bool = True):
        h = self.encode(x, deterministic)
        return self.quantize(h)

    def decode(self, z, force_not_quantize: bool = False, deterministic: bool = True):
        if not force_not_quantize:
            z, _, _ = self.quantize(z)
        z = self.post_quant_conv(z)
        return self.decoder(z, deterministic)

    def __call__(self, x, deterministic: bool = True):
        quant, vq_loss, idx = self.encode_quantized(x, deterministic)
        rec = self.decode(quant, force_not_quantize=True, deterministic=deterministic)
        return rec, vq_loss, idx


class AutoencoderKL(nn.Module):
    """KL-regularized AE (autoencoder.py:285-424)."""

    ddconfig: dict
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig)
        dd.pop("dtype", None)
        assert dd.get("double_z", True)
        self.encoder = Encoder(dtype=self.dtype, **dd)
        self.decoder = Decoder(dtype=self.dtype, **dd)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(
            self.ddconfig["z_channels"], (1, 1), dtype=self.dtype
        )

    def encode(self, x, deterministic: bool = True) -> DiagonalGaussian:
        h = self.encoder(x, deterministic)
        return DiagonalGaussian.from_params(self.quant_conv(h))

    def decode(self, z, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(z), deterministic)

    def __call__(self, x, key=None, sample_posterior: Optional[bool] = None,
                 deterministic: bool = True):
        posterior = self.encode(x, deterministic)
        if sample_posterior is None:  # sample iff a key was provided
            sample_posterior = key is not None
        if sample_posterior:
            assert key is not None, "sample_posterior=True needs a PRNG key"
            z = posterior.sample(key)
        else:
            z = posterior.mode()
        return self.decode(z, deterministic), posterior


class IdentityFirstStage(nn.Module):
    """Pass-through first stage (autoencoder.py:426-443)."""

    def __call__(self, x, *a, **k):
        return x

    def encode(self, x, *a, **k):
        return x

    def decode(self, x, *a, **k):
        return x
