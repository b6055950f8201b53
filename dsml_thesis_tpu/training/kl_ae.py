"""KL autoencoder training: alternating AE / discriminator steps.

Parity target: ldm/models/autoencoder.py:285-424 (AutoencoderKL.training_step
optimizer_idx 0=autoencoder / 1=discriminator, two Adam(lr, betas=(0.5, 0.9))
optimizers — configure_optimizers :387-396) restructured as pure jitted steps,
the same shape as the VQGAN pair (training/vqgan.py).

Differences from the VQ loop: the encoder emits a DiagonalGaussian posterior
that is SAMPLED during training (reference forward `sample_posterior=True`,
autoencoder.py:335-343), so the train state carries a PRNG key; the loss is
KLAutoencoderLoss (nll + kl_weight * KL + GAN). The reference never optimizes
loss.logvar (see losses/contperceptual.py docstring); train_logvar=True opts
into actually training it alongside the AE params.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses.contperceptual import KLAutoencoderLoss
from ..models.autoencoder import AutoencoderKL


class KLAETrainState(struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    ae_params: Any          # encoder/decoder/quant convs (+ logvar if trained)
    loss_params: Any        # discriminator, logvar (+ frozen lpips)
    ae_opt: Any
    disc_opt: Any


def _ae_tx(lr: float) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.5, b2=0.9)


def create_kl_ae_state(
    model: AutoencoderKL, loss: KLAutoencoderLoss, key: jax.Array,
    image_shape, lr: float, train_logvar: bool = False,
) -> Tuple[KLAETrainState, optax.GradientTransformation,
           optax.GradientTransformation]:
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.zeros(image_shape)
    ae_params = jax.jit(model.init)(k1, x)["params"]
    loss_params = loss.init_params(k2, image_shape)
    if train_logvar:
        # move the scalar under the AE optimizer (the faithful default keeps
        # it frozen in loss_params, like the reference's optimizer split)
        ae_params = dict(ae_params)
        ae_params["_loss_logvar"] = loss_params.pop("logvar")
    ae_tx, disc_tx = _ae_tx(lr), _ae_tx(lr)
    state = KLAETrainState(
        step=jnp.zeros((), jnp.int32),
        rng=k3,
        ae_params=ae_params,
        loss_params=loss_params,
        ae_opt=ae_tx.init(ae_params),
        disc_opt=disc_tx.init(loss_params["discriminator"]),
    )
    return state, ae_tx, disc_tx


def _split_logvar(ae_params, loss_params):
    """Return (model_params, loss_params_with_logvar) for either placement."""
    if "_loss_logvar" in ae_params:
        mp = {k: v for k, v in ae_params.items() if k != "_loss_logvar"}
        return mp, {**loss_params, "logvar": ae_params["_loss_logvar"]}
    return ae_params, loss_params


def make_kl_ae_train_step(
    model: AutoencoderKL, loss: KLAutoencoderLoss,
    ae_tx: optax.GradientTransformation, disc_tx: optax.GradientTransformation,
) -> Callable:
    """One fused step = generator update + discriminator update on the same
    batch (equivalent under Adam to the reference's per-batch alternation,
    same rationale as make_vqgan_train_step)."""

    def step(state: KLAETrainState, batch: Dict):
        x = batch["image"]
        rng, sub = jax.random.split(state.rng)

        def gen_loss_fn(ae_params):
            mp, lp = _split_logvar(ae_params, state.loss_params)
            rec, posterior = model.apply({"params": mp}, x, key=sub)
            # adaptive weight: d(nll)/d(last conv kernel) via a decode of the
            # stop-gradient sampled latent (reference autograd.grad on
            # get_last_layer(), autoencoder.py:398-399)
            z_sg = jax.lax.stop_gradient(posterior.sample(sub))

            def decode_from_last(kernel):
                p = jax.tree_util.tree_map(lambda v: v, mp)  # shallow copy
                p["decoder"]["conv_out"]["kernel"] = kernel
                return model.apply({"params": p}, z_sg, method="decode")

            last_kernel = mp["decoder"]["conv_out"]["kernel"]
            g_total, log = loss.generator_loss(
                lp, posterior.kl(), x, rec, state.step,
                decode_from_last=decode_from_last, last_kernel=last_kernel,
            )
            return g_total, (log, rec)

        (g_total, (g_log, rec)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.ae_params)
        ae_updates, ae_opt = ae_tx.update(g_grads, state.ae_opt, state.ae_params)
        ae_params = optax.apply_updates(state.ae_params, ae_updates)

        def disc_loss_fn(disc_params):
            _, lp = _split_logvar(state.ae_params, state.loss_params)
            lp = dict(lp)
            lp["discriminator"] = disc_params
            return loss.discriminator_loss(lp, x, rec, state.step)

        (d_total, d_log), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.loss_params["discriminator"])
        d_updates, disc_opt = disc_tx.update(
            d_grads, state.disc_opt, state.loss_params["discriminator"]
        )
        disc_params = optax.apply_updates(
            state.loss_params["discriminator"], d_updates
        )
        loss_params = dict(state.loss_params)
        loss_params["discriminator"] = disc_params

        new_state = state.replace(
            step=state.step + 1, rng=rng, ae_params=ae_params,
            loss_params=loss_params, ae_opt=ae_opt, disc_opt=disc_opt,
        )
        metrics = {f"train/{k}": v for k, v in {**g_log, **d_log}.items()}
        return new_state, metrics

    return step


def make_kl_ae_eval_step(model: AutoencoderKL, loss: KLAutoencoderLoss) -> Callable:
    """Validation (reference AutoencoderKL.validation_step,
    autoencoder.py:374-385): posterior is still sampled; generator +
    discriminator losses, no updates. val/rec_loss is the perceptual-weighted
    NLL the reference monitors."""

    def step(state: KLAETrainState, batch: Dict, idx: jnp.ndarray):
        x = batch["image"]
        # fresh posterior noise per val batch (the reference's Lightning
        # validation_step draws new noise each call); folding only a
        # constant here would correlate every batch's draw
        sub = jax.random.fold_in(state.rng, idx)
        mp, lp = _split_logvar(state.ae_params, state.loss_params)
        rec, posterior = model.apply({"params": mp}, x, key=sub)
        g_total, g_log = loss.generator_loss(
            lp, posterior.kl(), x, rec, state.step, val=True
        )
        d_total, _ = loss.discriminator_loss(lp, x, rec, state.step)
        return {
            "val/rec_loss": g_log["rec_loss"],
            "val/aeloss": g_total,
            "val/kl_loss": g_log["kl_loss"],
            "val/disc_loss": d_total,
        }

    return step
