"""VQGAN first-stage training: alternating AE / discriminator steps.

Parity target: ldm/models/autoencoder.py:142-196 (VQModel.training_step with
optimizer_idx 0=autoencoder / 1=discriminator, two Adam(lr, betas=(0.5, 0.9))
optimizers — configure_optimizers :198-206) — restructured as two pure jitted
steps sharing a VQGANTrainState.

The adaptive GAN weight differentiates through the decoder's final conv
(`decoder/conv_out/kernel`) exactly like the reference's get_last_layer()
(autoencoder.py:208-209).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses.vqperceptual import VQGANLoss
from ..models.autoencoder import VQModel


class VQGANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    ae_params: Any          # encoder/decoder/quantize/quant convs
    loss_params: Any        # discriminator (+ frozen lpips)
    ae_opt: Any
    disc_opt: Any


def _ae_tx(lr: float) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.5, b2=0.9)


def create_vqgan_state(
    model: VQModel, loss: VQGANLoss, key: jax.Array, image_shape, lr: float
) -> Tuple[VQGANTrainState, optax.GradientTransformation, optax.GradientTransformation]:
    k1, k2 = jax.random.split(key)
    x = jnp.zeros(image_shape)
    ae_params = jax.jit(model.init)(k1, x)["params"]
    loss_params = loss.init_params(k2, image_shape)
    ae_tx, disc_tx = _ae_tx(lr), _ae_tx(lr)
    state = VQGANTrainState(
        step=jnp.zeros((), jnp.int32),
        ae_params=ae_params,
        loss_params=loss_params,
        ae_opt=ae_tx.init(ae_params),
        disc_opt=disc_tx.init(loss_params["discriminator"]),
    )
    return state, ae_tx, disc_tx


def make_vqgan_train_step(
    model: VQModel, loss: VQGANLoss,
    ae_tx: optax.GradientTransformation, disc_tx: optax.GradientTransformation,
) -> Callable:
    """One fused step = generator update + discriminator update (the reference
    alternates optimizer_idx per batch; fusing both on the same batch halves
    input-pipeline pressure and keeps results equivalent under Adam)."""

    def step(state: VQGANTrainState, batch: Dict):
        x = batch["image"]

        def gen_loss_fn(ae_params):
            rec, qloss, _ = model.apply({"params": ae_params}, x)
            # the adaptive weight only needs d nll/d last_kernel and
            # d g_loss/d last_kernel, and the last conv lives in the DECODER:
            # decode a stop-gradient quant once instead of re-running the
            # encoder+quantizer inside each jax.grad (the reference reuses
            # its autograd graph the same way, autoencoder.py:208-209)
            quant_sg = jax.lax.stop_gradient(
                model.apply({"params": ae_params}, x,
                            method="encode_quantized")[0]
            )

            def decode_from_last(kernel):
                p = jax.tree_util.tree_map(lambda v: v, ae_params)  # shallow copy
                p["decoder"]["conv_out"]["kernel"] = kernel
                return model.apply({"params": p}, quant_sg,
                                   force_not_quantize=True, method="decode")

            last_kernel = ae_params["decoder"]["conv_out"]["kernel"]
            g_total, log = loss.generator_loss(
                state.loss_params, qloss, x, rec, state.step,
                decode_from_last=decode_from_last, last_kernel=last_kernel,
            )
            return g_total, (log, rec)

        (g_total, (g_log, rec)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.ae_params)
        ae_updates, ae_opt = ae_tx.update(g_grads, state.ae_opt, state.ae_params)
        ae_params = optax.apply_updates(state.ae_params, ae_updates)

        def disc_loss_fn(disc_params):
            lp = dict(state.loss_params)
            lp["discriminator"] = disc_params
            d_total, d_log = loss.discriminator_loss(lp, x, rec, state.step)
            return d_total, d_log

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
            step=state.step + 1, ae_params=ae_params,
            loss_params=loss_params, ae_opt=ae_opt, disc_opt=disc_opt,
        )
        metrics = {f"train/{k}": v for k, v in {**g_log, **d_log}.items()}
        return new_state, metrics

    return step


def make_vqgan_eval_step(model: VQModel, loss: VQGANLoss) -> Callable:
    """Validation pass (reference VQModel.validation_step,
    autoencoder.py:165-196): generator + discriminator losses on a val batch,
    no updates; rec_loss is the perceptual-weighted reconstruction NLL the
    reference monitors (val/rec_loss in the checkpoint filenames)."""

    def step(state: VQGANTrainState, batch: Dict, idx: jnp.ndarray):
        # idx: validation batch index — unused here (the VQ eval pass is
        # deterministic) but kept so both eval steps share one call shape;
        # the KL variant folds it into its posterior-noise key
        del idx
        x = batch["image"]
        rec, qloss, _ = model.apply({"params": state.ae_params}, x)
        g_total, g_log = loss.generator_loss(
            state.loss_params, qloss, x, rec, state.step, val=True
        )
        d_total, d_log = loss.discriminator_loss(
            state.loss_params, x, rec, state.step
        )
        return {
            "val/rec_loss": g_log["nll_loss"],
            "val/aeloss": g_total,
            "val/quant_loss": g_log["quant_loss"],
            "val/disc_loss": d_total,
        }

    return step
