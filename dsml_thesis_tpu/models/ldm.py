"""LatentDiffusion: one engine for every conditioning arrangement.

The reference carries three near-identical 1300-line model classes differing
only in conditioning plumbing:
  - 1-cond crossattn  (face_reenactment/ldm/models/diffusion/ddpm.py:423-1423)
  - 2-cond crossattn+concat (face_reenactment/.../ddpm2cond.py:425-1344)
  - 4-cond (class+audio crossattn, motion+identity concat)
    (talking_face/.../ddpm2cond.py:434-1315)

Here a list of CondSpec declarations expresses all of them: every cond stream
is (batch key, encoder module, route), where route says whether the encoded
stream joins the cross-attention context (feature- or token-concatenated) or
is channel-concatenated onto the UNet input (optionally after being pushed
through the frozen first stage, like the reference's masked-frame / identity
latents, talking_face ddpm2cond.py:667-720).

LatentDiffusion is NOT a stateful trainer object like the reference's
LightningModule — it is a pure-functional composition: params live in one
pytree {unet, first_stage, cond/<name>}, every method takes params explicitly,
and samplers receive a closed-over apply_model. This keeps the whole train
step and the whole sampler jittable.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..diffusion import (
    DiffusionSchedule,
    make_schedule,
    make_ddim_schedule,
    q_sample,
    p_losses,
    cfg_eps_fn,
    ddim_sample,
)
from .autoencoder import DiagonalGaussian


@dataclasses.dataclass(frozen=True)
class CondSpec:
    """One conditioning stream.

    route:
      - "crossattn_feature": encoder tokens concat along feature dim (MEAD
        class ⊕ audio -> one 1024-d token, ddpm2cond.py:886-899)
      - "crossattn_token": encoder tokens concat along the token dim
      - "concat_first_stage": batch value is an image encoded by the frozen
        first stage then channel-concatenated to x_t
      - "concat_raw": batch value channel-concatenated as-is (already a latent)
    """

    key: str
    module: Optional[nn.Module]  # None for concat_first_stage/raw passthrough
    route: str = "crossattn_feature"
    trainable: bool = True


@dataclasses.dataclass
class LatentDiffusion:
    unet: nn.Module
    first_stage: Optional[nn.Module]
    cond_specs: Sequence[CondSpec]
    schedule: DiffusionSchedule
    scale_factor: float = 1.0
    parameterization: str = "eps"
    loss_type: str = "l2"
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    first_stage_key: str = "image"
    # training_loss honors batch["_sample_weights"] (exact ragged-tail eval)
    supports_sample_weights = True
    image_size: int = 32
    channels: int = 3
    monitor: str = "val_loss_ema"
    # split-input fold/unfold tiling (reference ddpm.py:893-1013, config-gated
    # and unset by every shipped YAML): {"ks": (h,w), "stride": (h,w),
    # "vqf": f, "patch_distributed_vq": bool, tie/clip knobs}. When set,
    # apply_model and the first-stage codecs run over overlapping patches and
    # blend with the border weighting (diffusion/tiling.py).
    split_input_params: Optional[Dict] = None

    # ---------- initialization ----------

    def init_params(self, key: jax.Array, batch: Dict[str, jnp.ndarray]) -> Dict:
        """Initialize the full params pytree from an example batch."""
        keys = jax.random.split(key, 3 + len(self.cond_specs))
        params: Dict[str, Any] = {}
        x = batch[self.first_stage_key]
        if self.first_stage is not None:
            if self.first_stage_key == "latent":
                # batch carries cached latents (LatentDiffusionCLIP,
                # first_stage_key: latent) — already scale-factored by
                # compute_latents; the first stage only decodes. Initialize
                # it on an IMAGE-shaped dummy so param shapes match real
                # checkpoints even when embed_dim != image channels.
                z = x
                fs_in = self._dummy_image_for_latent(x)
            else:
                fs_in = x
            params["first_stage"] = jax.jit(self.first_stage.init)(
                keys[0], fs_in
            )["params"]
            if self.first_stage_key != "latent":
                z = self.encode_first_stage(params, x)
        else:
            z = x * self.scale_factor

        cond = {}
        for i, spec in enumerate(self.cond_specs):
            if spec.module is not None:
                rngs = {"params": keys[2 + i], "cfg": jax.random.fold_in(keys[2 + i], 1)}
                out, cp = spec.module.init_with_output(
                    rngs, batch[spec.key], training=False
                )
                params[f"cond/{spec.key}"] = cp["params"]
                cond[spec.key] = out
            else:
                cond[spec.key] = batch[spec.key]
        c = self._route_conditioning(params, cond)

        x_in = z if c["concat"] is None else jnp.concatenate([z, c["concat"]], axis=-1)
        t = jnp.zeros((z.shape[0],), dtype=jnp.int32)
        params["unet"] = jax.jit(self.unet.init)(keys[1], x_in, t, c["crossattn"])["params"]
        return params

    def _dummy_image_for_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        """Image-shaped zeros matching latent z through the first stage's
        downsampling factor (for shape-only init when the batch carries
        cached latents)."""
        dd = getattr(self.first_stage, "ddconfig", None)
        if not dd:
            return z
        f = 2 ** (len(dd["ch_mult"]) - 1)
        b, h, w = z.shape[0], z.shape[1], z.shape[2]
        return jnp.zeros((b, h * f, w * f, dd.get("in_channels", 3)), z.dtype)

    # ---------- first stage (always frozen, like reference ddpm.py:501-508) ----------

    def encode_first_stage(self, params: Dict, x: jnp.ndarray,
                           rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """rng samples the KL posterior (the reference's
        get_first_stage_encoding draws posterior.sample() during training,
        ddpm.py:533-541); without rng the deterministic mode is used. VQ
        first stages return plain arrays and ignore it."""
        if self.first_stage is None:
            return x * self.scale_factor

        def enc(v):
            z = self.first_stage.apply(
                {"params": params["first_stage"]}, v, method="encode"
            )
            if isinstance(z, DiagonalGaussian):
                z = z.sample(rng) if rng is not None else z.mode()
            return z

        sp = self._split_params()
        if sp is not None:
            # patch-distributed VQ encode (reference ddpm.py:826-864): encode
            # overlapping pixel patches, blend the latent patches (df = vqf)
            from ..diffusion import tiling

            z = tiling.tiled_apply(lambda v, L: enc(v), x, sp,
                                   df=int(sp["vqf"]))
        else:
            z = enc(x)
        return jax.lax.stop_gradient(z * self.scale_factor)

    def _split_params(self) -> Optional[Dict]:
        """split_input_params when the patch-distributed path is enabled."""
        sp = self.split_input_params
        if sp and sp.get("patch_distributed_vq", True):
            return sp
        return None

    def decode_first_stage(self, params: Dict, z: jnp.ndarray,
                           force_not_quantize: bool = False) -> jnp.ndarray:
        """Decode through the FROZEN first stage: gradients flow through the
        decoder to z (needed by the CLIP/lipread finetunes, which backprop
        through pixel-space losses) but not into decoder params."""
        if self.first_stage is None:
            return z / self.scale_factor  # undo encode_first_stage's scaling
        z = z / self.scale_factor
        frozen = jax.tree.map(jax.lax.stop_gradient, params["first_stage"])
        kwargs = {}
        import inspect

        if "force_not_quantize" in inspect.signature(
            self.first_stage.decode
        ).parameters:  # VQ interface only; KL decode has no quantizer
            kwargs["force_not_quantize"] = force_not_quantize
        dec = lambda v: self.first_stage.apply(
            {"params": frozen}, v, method="decode", **kwargs
        )
        sp = self._split_params()
        if sp is not None:
            # patch-distributed decode (reference ddpm.py:707-755): decode
            # overlapping latent patches, blend the pixel patches (uf = vqf)
            from ..diffusion import tiling

            return tiling.tiled_apply(lambda v, L: dec(v), z, sp,
                                      uf=int(sp["vqf"]))
        return dec(z)

    # ---------- conditioning ----------

    def _encode_streams(
        self,
        params: Dict,
        batch: Dict[str, jnp.ndarray],
        *,
        null: bool = False,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        only_crossattn: bool = False,
        batch_size: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Run the cond-stage encoders for every (selected) stream. ONE
        routine behind encode_conditioning / null_conditioning /
        encode_crossattn_tokens so the sampler context cannot drift from the
        training context (they used to be three near-copies that disagreed
        on module-less crossattn streams)."""
        cond = {}
        for i, spec in enumerate(self.cond_specs):
            if only_crossattn and not spec.route.startswith("crossattn"):
                continue
            if (null and spec.route.startswith("crossattn")
                    and spec.module is not None
                    and hasattr(spec.module, "null_token")):
                bs = (batch_size if batch_size is not None
                      else self._cond_batch_size(spec, batch))
                cond[spec.key] = spec.module.apply(
                    {"params": params[f"cond/{spec.key}"]},
                    method="null_token", batch_size=bs,
                )
            elif spec.module is not None:
                rngs = {}
                if training and rng is not None:
                    rngs = {"cfg": jax.random.fold_in(rng, i)}
                out = spec.module.apply(
                    {"params": params[f"cond/{spec.key}"]}, batch[spec.key],
                    training=training, rngs=rngs,
                )
                if not spec.trainable:
                    out = jax.lax.stop_gradient(out)
                cond[spec.key] = out
            else:
                cond[spec.key] = batch[spec.key]
        return cond

    @staticmethod
    def _cond_batch_size(spec: CondSpec, batch: Dict) -> int:
        """Batch size for a null-token branch: the spec's OWN batch value
        when present (an arbitrary other batch entry can carry a different
        leading dim, e.g. per-clip vs per-frame arrays)."""
        v = batch.get(spec.key)
        if v is not None and hasattr(v, "shape") and v.ndim >= 1:
            return v.shape[0]
        for v in batch.values():
            if v is not None and hasattr(v, "shape") and v.ndim >= 1:
                return v.shape[0]
        raise ValueError(
            f"cannot infer batch size for null '{spec.key}' conditioning: "
            "pass batch_size explicitly")

    def encode_conditioning(
        self,
        params: Dict,
        batch: Dict[str, jnp.ndarray],
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Optional[jnp.ndarray]]:
        """Run every cond stage and route streams to crossattn/concat groups.
        During training, rng also samples any KL first-stage posterior for
        concat_first_stage streams (reference get_first_stage_encoding)."""
        cond = self._encode_streams(params, batch, training=training, rng=rng)
        fs_rng = (jax.random.fold_in(rng, 997)
                  if training and rng is not None else None)
        return self._route_conditioning(params, cond, rng=fs_rng)

    def _route_conditioning(self, params, cond: Dict[str, jnp.ndarray],
                            rng: Optional[jax.Array] = None):
        """Join encoded streams: crossattn feature-concat then token-concat;
        concat streams channel-concat (first-stage-encoding image-kind ones,
        with rng sampling a KL posterior when given). Streams absent from
        `cond` (a subset selection) are skipped."""
        crossattn_feat, crossattn_tok, concat = [], [], []
        for i, spec in enumerate(self.cond_specs):
            if spec.key not in cond:
                continue
            v = cond[spec.key]
            if spec.route == "crossattn_feature":
                crossattn_feat.append(v)
            elif spec.route == "crossattn_token":
                crossattn_tok.append(v)
            elif spec.route == "concat_first_stage":
                enc_rng = (jax.random.fold_in(rng, i)
                           if rng is not None else None)
                concat.append(self.encode_first_stage(params, v, rng=enc_rng))
            elif spec.route == "concat_raw":
                concat.append(v)
            else:
                raise ValueError(spec.route)
        ctx = None
        if crossattn_feat:
            ctx = jnp.concatenate(crossattn_feat, axis=-1)
        if crossattn_tok:
            tok = jnp.concatenate(crossattn_tok, axis=1)
            ctx = tok if ctx is None else jnp.concatenate([ctx, tok], axis=1)
        cc = jnp.concatenate(concat, axis=-1) if concat else None
        return {"crossattn": ctx, "concat": cc}

    def encode_crossattn_tokens(self, params: Dict, batch: Dict,
                                null: bool = False) -> jnp.ndarray:
        """Context tokens only (skip concat streams) — used by the progressive
        video sampler, which supplies the masked/identity latents inside its
        own scan. null=True returns the CFG unconditional branch. Same stream
        engine and join order as encode_conditioning, including module-less
        crossattn streams (raw precomputed tokens in the batch)."""
        cond = self._encode_streams(params, batch, null=null,
                                    only_crossattn=True)
        return self._route_conditioning(params, cond)["crossattn"]

    def null_conditioning(self, params: Dict, batch: Dict, batch_size: int):
        """CFG unconditional branch: crossattn streams from each encoder's
        null token, concat streams unchanged (reference ddim2cond.py:160-197).
        Under jit the identical concat-stream encodes of the cond/uncond
        branches CSE into one computation."""
        cond = self._encode_streams(params, batch, null=True,
                                    batch_size=batch_size)
        return self._route_conditioning(params, cond)

    # ---------- model application ----------

    def apply_model(self, params: Dict, x_t: jnp.ndarray, t: jnp.ndarray,
                    cond: Dict[str, Optional[jnp.ndarray]],
                    cfg_pairs: bool = False,
                    deterministic: bool = True,
                    rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """DiffusionWrapper routing (reference ddpm.py:1397-1423): channel-
        concat the concat streams, cross-attend to the context tokens.

        With split_input_params set, the UNet runs over overlapping patches
        and the eps patches are blended (reference ddpm.py:893-1013). The
        spatially-aligned concat streams are channel-concatenated BEFORE
        tiling — equivalent to the reference's unfold of its image-kind cond;
        crossattn tokens replicate per patch (the reference's cond_list
        fan-out). The reference's coordinates_bbox re-tokenization branch is
        Layout2Img-only (dead upstream) and not reproduced."""
        x_in = x_t
        if cond.get("concat") is not None:
            x_in = jnp.concatenate([x_t, cond["concat"]], axis=-1)
        ctx = cond.get("crossattn")
        # deterministic=False activates the UNet's configured dropout (the
        # reference trains with it when unet_config sets dropout > 0); the
        # rng feeds flax's 'dropout' stream (training_loss supplies it)
        rngs = ({"dropout": rng}
                if (not deterministic and rng is not None) else None)
        unet = lambda xi, ti, ci, **kw: self.unet.apply(
            {"params": params["unet"]}, xi, ti, ci,
            deterministic=deterministic, rngs=rngs, **kw
        )
        if cfg_pairs:
            # CFG batch-pair dedup (DSML_CFG_DEDUP): x_t / t / cond["concat"]
            # arrive at B, cond["crossattn"] is the [uncond; cond] pair at
            # 2B; the UNet computes the pre-cross-attention prefix once and
            # tiles at the divergence (models/unet.py cfg_pairs). Valid
            # because CFG replaces only crossattn streams — the concat
            # channels are shared by construction (null_conditioning).
            if self.split_input_params is not None:
                raise NotImplementedError(
                    "cfg_pairs dedup not supported with split_input_params"
                )
            return unet(x_in, t, ctx, cfg_pairs=True)
        if self.split_input_params is not None:
            from ..diffusion import tiling

            def fn(patches, L):
                t_rep = jnp.repeat(t, L, axis=0)
                c_rep = None if ctx is None else jnp.repeat(ctx, L, axis=0)
                return unet(patches, t_rep, c_rep)  # [B*L, kh, kw, C_eps]

            return tiling.tiled_apply(fn, x_in, self.split_input_params)
        return unet(x_in, t, ctx)

    # ---------- training ----------

    def training_loss(self, params: Dict, batch: Dict, rng: jax.Array,
                      training: bool = True):
        """shared_step → get_input → p_losses (reference ddpm.py:866-1045).

        training=False is the VALIDATION form (make_eval_step): t/noise stay
        random and the KL posterior is still sampled (the reference's
        get_first_stage_encoding draws unconditionally), but the CFG label
        drop and UNet dropout turn off — Lightning's validation_step runs
        with model.training=False, so ClassEmbedder never drops labels and
        dropout layers are inert; scoring ~p_uncond of val batches on the
        null token would bias val_loss_ema, the checkpoint monitor."""
        k_t, k_noise, k_cond, k_enc, k_drop = jax.random.split(rng, 5)
        x = batch[self.first_stage_key]
        if self.first_stage_key == "latent":
            # cached latents (compute_latents) are already scale-factored —
            # do NOT push them through the encoder again
            z = x
        else:
            z = self.encode_first_stage(params, x, rng=k_enc)
        cond = self.encode_conditioning(params, batch, training=training,
                                        rng=k_cond if training else None)

        b = z.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, dtype=z.dtype)
        x_t = q_sample(self.schedule, z, t, noise)
        eps = self.apply_model(params, x_t, t, cond,
                               deterministic=not training,
                               rng=k_drop if training else None)
        loss, aux = p_losses(
            self.schedule, eps, z, noise, t,
            parameterization=self.parameterization,
            loss_type=self.loss_type,
            l_simple_weight=self.l_simple_weight,
            original_elbo_weight=self.original_elbo_weight,
            # exact-eval path: masks padding rows in the ragged final val
            # batch (Trainer.validate); absent during training
            sample_weights=batch.get("_sample_weights"),
        )
        return loss, aux

    # ---------- sampling ----------

    def make_eps_fn(
        self, params: Dict, cond, uncond=None, scale: float = 1.0
    ) -> Callable:
        if self.parameterization != "eps":
            # p_sample_ddim's update algebra assumes the net predicts eps;
            # fail loudly instead of sampling noise from an x0-model
            raise NotImplementedError(
                f"sampling implemented for parameterization='eps' only, "
                f"got '{self.parameterization}'"
            )
        apply = lambda x, t, c: self.apply_model(params, x, t, c)
        return cfg_eps_fn(apply, cond, uncond, scale)

    def sample_ddim(
        self,
        params: Dict,
        cond,
        shape,
        key: jax.Array,
        steps: int = 50,
        eta: float = 0.0,
        uncond=None,
        guidance_scale: float = 1.0,
        x_T: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        ddim = make_ddim_schedule(self.schedule, steps, eta=eta)
        eps_fn = self.make_eps_fn(params, cond, uncond, guidance_scale)
        return ddim_sample(
            ddim, self.schedule, eps_fn, shape, key, x_T=x_T,
            eta_noise=(eta > 0),
        )

    # ---------- trainable-parameter partition ----------

    def trainable_filter(self, params: Dict) -> Dict[str, bool]:
        """Which top-level param groups receive gradients: the UNet and the
        trainable cond stages; the first stage is always frozen."""
        out = {}
        for k in params:
            if k == "unet":
                out[k] = True
            elif k == "first_stage":
                out[k] = False
            elif k.startswith("frozen/"):
                # frozen guidance towers (CLIP/IR-SE50) ride in the params
                # tree so jitted losses receive them as ARGUMENTS (closure
                # constants blow up the axon remote compile, CLAUDE.md) but
                # never receive gradients or EMA shadows
                out[k] = False
            elif k.startswith("cond/"):
                name = k.split("/", 1)[1]
                spec = next((s for s in self.cond_specs if s.key == name), None)
                if spec is None:
                    raise KeyError(
                        f"params group '{k}' has no matching CondSpec "
                        f"(known: {[s.key for s in self.cond_specs]})"
                    )
                out[k] = spec.trainable
            else:
                out[k] = True
        return out

    def frozen_subpaths(self) -> Dict[str, Sequence[str]]:
        """Sub-trees INSIDE otherwise-trainable groups that must not receive
        optimizer updates, keyed by top-level group ('/'-joined paths). The
        reference's requires_grad=False params (e.g. wav2vec2's conv feature
        extractor, modules.py:294) are skipped by torch optimizers entirely —
        in particular decoupled AdamW weight decay must not erode them even
        though stop_gradient already zeroes their gradients."""
        out: Dict[str, Sequence[str]] = {}
        for spec in self.cond_specs:
            if (spec.module is not None and spec.trainable
                    and hasattr(spec.module, "frozen_paths")):
                paths = tuple(spec.module.frozen_paths())
                if paths:
                    out[f"cond/{spec.key}"] = paths
        return out
