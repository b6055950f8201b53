"""Convert reference PyTorch checkpoints to dsml_thesis_tpu Flax params.

Lets users of the torch reference (GiannisPikoulis/dsml-thesis) load their
trained UNet / VQGAN / conditioning weights into this framework, and powers
the numerical-parity test gates.

Name maps are derived from the reference module trees:
  - UNetModel: face_reenactment/ldm/modules/diffusionmodules/openaimodel.py:413-700
    (input_blocks / middle_block / output_blocks TimestepEmbedSequential layout)
  - VQGAN Encoder/Decoder: ldm/modules/diffusionmodules/model.py:368-556
  - VQModel wrappers: ldm/models/autoencoder.py:14-60

Layout transforms: torch Linear (O,I) -> flax kernel (I,O); torch Conv2d
(O,I,kh,kw) -> flax (kh,kw,I,O); torch Conv1d (O,I,k) -> flax (k,I,O);
GroupNorm/LayerNorm weight/bias -> scale/bias. Images are NCHW in torch and
NHWC here; latents/images converted at the array level by callers.
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np


def _t_linear(w):  # (O, I) -> (I, O)
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _t_conv2d(w):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t_conv1d(w):  # (O, I, k) -> (k, I, O)
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _to_np(sd: Mapping, key: str) -> np.ndarray:
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    # np.array (not asarray): torch's .numpy() is a VIEW of the live tensor
    # storage, and same-dtype asarray keeps it — converting from a live
    # module and then training it in-place would silently mutate the
    # "converted" tree (jax CPU can alias numpy buffers zero-copy)
    return np.array(v, dtype=np.float32)


class _P:
    """Nested-dict builder for a flax params tree."""

    def __init__(self):
        self.tree: Dict = {}

    def put(self, path: str, value: np.ndarray):
        node = self.tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value


def _conv(p: _P, sd, tname: str, fname: str, kind: str = "conv2d"):
    tr = {"conv2d": _t_conv2d, "conv1d": _t_conv1d, "linear": _t_linear}[kind]
    p.put(f"{fname}/kernel", tr(_to_np(sd, f"{tname}.weight")))
    if f"{tname}.bias" in sd:
        p.put(f"{fname}/bias", _to_np(sd, f"{tname}.bias"))


def _norm(p: _P, sd, tname: str, fname: str):
    p.put(f"{fname}/scale", _to_np(sd, f"{tname}.weight"))
    p.put(f"{fname}/bias", _to_np(sd, f"{tname}.bias"))


def _resblock(p: _P, sd, t: str, f: str):
    _norm(p, sd, f"{t}.in_layers.0", f"{f}/in_norm")
    _conv(p, sd, f"{t}.in_layers.2", f"{f}/in_conv")
    _conv(p, sd, f"{t}.emb_layers.1", f"{f}/emb_proj", "linear")
    _norm(p, sd, f"{t}.out_layers.0", f"{f}/out_norm")
    _conv(p, sd, f"{t}.out_layers.3", f"{f}/out_conv")
    if f"{t}.skip_connection.weight" in sd:
        _conv(p, sd, f"{t}.skip_connection", f"{f}/skip")


def _spatial_transformer(p: _P, sd, t: str, f: str, depth: int = 1):
    _norm(p, sd, f"{t}.norm", f"{f}/norm")
    _conv(p, sd, f"{t}.proj_in", f"{f}/proj_in")
    for d in range(depth):
        tb, fb = f"{t}.transformer_blocks.{d}", f"{f}/block_{d}"
        for a in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                _conv(p, sd, f"{tb}.{a}.{proj}", f"{fb}/{a}/{proj}", "linear")
            _conv(p, sd, f"{tb}.{a}.to_out.0", f"{fb}/{a}/to_out", "linear")
        for i in (1, 2, 3):
            _norm(p, sd, f"{tb}.norm{i}", f"{fb}/norm{i}")
        _conv(p, sd, f"{tb}.ff.net.0.proj", f"{fb}/ff/proj_in", "linear")
        _conv(p, sd, f"{tb}.ff.net.2", f"{fb}/ff/proj_out", "linear")
    _conv(p, sd, f"{t}.proj_out", f"{f}/proj_out")


def _attention_block(p: _P, sd, t: str, f: str, num_heads: int):
    """Plain QKV AttentionBlock (openaimodel.py:278-341, QKVAttentionLegacy):
    torch's qkv conv1d channels interleave per HEAD ([q_h k_h v_h] blocks);
    our Dense splits q/k/v as thirds then splits heads — permute rows."""
    _norm(p, sd, f"{t}.norm", f"{f}/norm")
    w = _to_np(sd, f"{t}.qkv.weight")[:, :, 0]   # [3c, c]
    b = _to_np(sd, f"{t}.qkv.bias")
    c3 = w.shape[0]
    c = c3 // 3
    hd = c // num_heads
    perm = np.empty(c3, np.int64)
    for i in range(c3):
        head, within = divmod(i, 3 * hd)
        kind, off = divmod(within, hd)
        perm[kind * c + head * hd + off] = i
    p.put(f"{f}/qkv/kernel", w[perm].T)
    p.put(f"{f}/qkv/bias", b[perm])
    po = _to_np(sd, f"{t}.proj_out.weight")[:, :, 0]
    p.put(f"{f}/proj_out/kernel", po.T)
    p.put(f"{f}/proj_out/bias", _to_np(sd, f"{t}.proj_out.bias"))


def convert_unet(
    sd: Mapping,
    num_res_blocks: int,
    channel_mult: Sequence[int],
    attention_resolutions: Sequence[int],
    transformer_depth: int = 1,
    prefix: str = "",
    use_spatial_transformer: bool = True,
    num_heads: int = 1,
    num_head_channels: int = -1,
    model_channels: int = 0,
) -> Dict:
    """torch UNetModel state_dict -> flax params dict (wrap as {'params': ...}).

    use_spatial_transformer=False converts the plain QKV AttentionBlock
    layout (the base-DDPM configs): heads per site follow the model's rule
    (num_head_channels=-1 -> fixed num_heads, else ch // num_head_channels,
    which needs model_channels to derive ch per level)."""
    if not use_spatial_transformer and num_head_channels > 0 and model_channels <= 0:
        raise ValueError(
            "AttentionBlock conversion with num_head_channels needs "
            "model_channels (heads = level_channels // num_head_channels)")
    p = _P()
    g = lambda k: prefix + k

    def attn(t, f, ch):
        if use_spatial_transformer:
            _spatial_transformer(p, sd, t, f, transformer_depth)
        else:
            heads = (num_heads if num_head_channels == -1
                     else ch // num_head_channels)
            _attention_block(p, sd, t, f, heads)
    _conv(p, sd, g("time_embed.0"), "time_embed_0", "linear")
    _conv(p, sd, g("time_embed.2"), "time_embed_2", "linear")
    if g("label_emb.weight") in sd:
        p.put("label_emb/embedding", _to_np(sd, g("label_emb.weight")))

    _conv(p, sd, g("input_blocks.0.0"), "conv_in")
    idx = 1
    ds = 1
    for level, _ in enumerate(channel_mult):
        for i in range(num_res_blocks):
            _resblock(p, sd, g(f"input_blocks.{idx}.0"), f"down_{level}_{i}_res")
            if ds in attention_resolutions:
                attn(g(f"input_blocks.{idx}.1"), f"down_{level}_{i}_attn",
                     model_channels * channel_mult[level])
            idx += 1
        if level != len(channel_mult) - 1:
            _conv(p, sd, g(f"input_blocks.{idx}.0.op"), f"down_{level}_ds/conv")
            idx += 1
            ds *= 2

    _resblock(p, sd, g("middle_block.0"), "mid_res1")
    attn(g("middle_block.1"), "mid_attn",
         model_channels * channel_mult[-1])
    _resblock(p, sd, g("middle_block.2"), "mid_res2")

    idx = 0
    for level, _ in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            _resblock(p, sd, g(f"output_blocks.{idx}.0"), f"up_{level}_{i}_res")
            j = 1
            if ds in attention_resolutions:
                attn(g(f"output_blocks.{idx}.{j}"), f"up_{level}_{i}_attn",
                     model_channels * channel_mult[level])
                j += 1
            if level and i == num_res_blocks:
                _conv(p, sd, g(f"output_blocks.{idx}.{j}.conv"), f"up_{level}_us/conv")
                ds //= 2
            idx += 1

    _norm(p, sd, g("out.0"), "out_norm")
    _conv(p, sd, g("out.2"), "conv_out")
    return p.tree


def _ae_resblock(p: _P, sd, t: str, f: str):
    _norm(p, sd, f"{t}.norm1", f"{f}/norm1")
    _conv(p, sd, f"{t}.conv1", f"{f}/conv1")
    _norm(p, sd, f"{t}.norm2", f"{f}/norm2")
    _conv(p, sd, f"{t}.conv2", f"{f}/conv2")
    if f"{t}.nin_shortcut.weight" in sd:
        _conv(p, sd, f"{t}.nin_shortcut", f"{f}/nin_shortcut")
    if f"{t}.conv_shortcut.weight" in sd:
        # reference use_conv_shortcut=True stores a 3x3 conv (model.py:108);
        # the flax ResnetBlock declares a 1x1 nin_shortcut — mapping it there
        # would corrupt shapes (no shipped checkpoint uses this variant)
        raise NotImplementedError(
            f"{t}.conv_shortcut: 3x3 conv shortcuts (use_conv_shortcut=True) "
            "are not supported by the flax ResnetBlock"
        )


def _ae_attn(p: _P, sd, t: str, f: str):
    _norm(p, sd, f"{t}.norm", f"{f}/norm")
    for name in ("q", "k", "v", "proj_out"):
        _conv(p, sd, f"{t}.{name}", f"{f}/{name}")


def convert_vqgan_encoder(sd, ch_mult, num_res_blocks, attn_resolutions, resolution,
                          prefix="encoder.") -> Dict:
    p = _P()
    g = lambda k: prefix + k
    _conv(p, sd, g("conv_in"), "conv_in")
    curr_res = resolution
    for i_level in range(len(ch_mult)):
        for i_block in range(num_res_blocks):
            _ae_resblock(
                p, sd, g(f"down.{i_level}.block.{i_block}"),
                f"down_{i_level}_block_{i_block}",
            )
            if curr_res in attn_resolutions:
                _ae_attn(
                    p, sd, g(f"down.{i_level}.attn.{i_block}"),
                    f"down_{i_level}_attn_{i_block}",
                )
        if i_level != len(ch_mult) - 1:
            _conv(p, sd, g(f"down.{i_level}.downsample.conv"),
                  f"down_{i_level}_downsample/conv")
            curr_res //= 2
    _ae_resblock(p, sd, g("mid.block_1"), "mid_block_1")
    _ae_attn(p, sd, g("mid.attn_1"), "mid_attn_1")
    _ae_resblock(p, sd, g("mid.block_2"), "mid_block_2")
    _norm(p, sd, g("norm_out"), "norm_out")
    _conv(p, sd, g("conv_out"), "conv_out")
    return p.tree


def convert_vqgan_decoder(sd, ch_mult, num_res_blocks, attn_resolutions, resolution,
                          prefix="decoder.") -> Dict:
    p = _P()
    g = lambda k: prefix + k
    _conv(p, sd, g("conv_in"), "conv_in")
    _ae_resblock(p, sd, g("mid.block_1"), "mid_block_1")
    _ae_attn(p, sd, g("mid.attn_1"), "mid_attn_1")
    _ae_resblock(p, sd, g("mid.block_2"), "mid_block_2")
    curr_res = resolution // 2 ** (len(ch_mult) - 1)
    for i_level in reversed(range(len(ch_mult))):
        for i_block in range(num_res_blocks + 1):
            _ae_resblock(
                p, sd, g(f"up.{i_level}.block.{i_block}"),
                f"up_{i_level}_block_{i_block}",
            )
            if curr_res in attn_resolutions:
                _ae_attn(
                    p, sd, g(f"up.{i_level}.attn.{i_block}"),
                    f"up_{i_level}_attn_{i_block}",
                )
        if i_level != 0:
            _conv(p, sd, g(f"up.{i_level}.upsample.conv"),
                  f"up_{i_level}_upsample/conv")
            curr_res *= 2
    _norm(p, sd, g("norm_out"), "norm_out")
    _conv(p, sd, g("conv_out"), "conv_out")
    return p.tree


def convert_vqmodel(sd, ddconfig: dict, prefix: str = "") -> Dict:
    """Full VQModel state_dict -> flax params for models.autoencoder.VQModel."""
    p = _P()
    g = lambda k: prefix + k
    tree = {
        "encoder": convert_vqgan_encoder(
            sd, ddconfig["ch_mult"], ddconfig["num_res_blocks"],
            ddconfig["attn_resolutions"], ddconfig["resolution"],
            prefix=g("encoder."),
        ),
        "decoder": convert_vqgan_decoder(
            sd, ddconfig["ch_mult"], ddconfig["num_res_blocks"],
            ddconfig["attn_resolutions"], ddconfig["resolution"],
            prefix=g("decoder."),
        ),
    }
    _conv(p, sd, g("quant_conv"), "quant_conv")
    _conv(p, sd, g("post_quant_conv"), "post_quant_conv")
    p.put("quantize/embedding", _to_np(sd, g("quantize.embedding.weight")))
    tree.update(p.tree)
    return tree


def load_first_stage_checkpoint(ckpt_path: str, ddconfig: dict) -> Dict:
    """Standalone pretrained VQGAN checkpoint (the reference's
    first_stage_config.params.ckpt_path, loaded by init_from_ckpt at model
    build) -> flax first-stage params. Accepts both a bare taming VQModel
    layout and an LDM checkpoint carrying first_stage_model.* keys."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = dict(ckpt.get("state_dict", ckpt))
    prefix = ("first_stage_model."
              if any(k.startswith("first_stage_model.") for k in sd) else "")
    return convert_vqmodel(sd, ddconfig, prefix=prefix)


def convert_class_embedder(sd, prefix: str = "", null_mode: str = "extra_row") -> Dict:
    tree: Dict = {"embedding": {"embedding": _to_np(sd, prefix + "embedding.weight")}}
    if null_mode == "separate":
        tree["uncond_embedding"] = {
            "embedding": _to_np(sd, prefix + "uncond_embedding.weight")
        }
    return tree


def convert_conv1d_temporal_attention(sd, prefix: str = "") -> Dict:
    p = _P()
    for i in range(5):
        _conv(p, sd, f"{prefix}attentionConvNet.{2 * i}", f"att_conv_{i}", "conv1d")
    _conv(p, sd, f"{prefix}attentionNet.0", "att_dense", "linear")
    return p.tree


def convert_landmark_encoder(sd, prefix: str = "") -> Dict:
    """Reference LandmarkEncoder (talking_face modules.py:331-348): five
    Linear layers at net.0/2/4/6/8 -> fc0..fc4."""
    p = _P()
    for i, t in enumerate((0, 2, 4, 6, 8)):
        _conv(p, sd, f"{prefix}net.{t}", f"fc{i}", "linear")
    return p.tree


def load_reference_ldm_checkpoint(ckpt_path: str, ldm, model_cfg: Dict) -> Dict:
    """Load a reference PyTorch-Lightning LDM checkpoint into our params tree.

    Handles the reference's module prefixes (sample_affectnet.py:22-37 load
    path): `model.diffusion_model.*` (UNet inside DiffusionWrapper),
    `first_stage_model.*` (VQGAN), `cond_stage_model*.*` (cond stages).
    `ldm` is the models.ldm.LatentDiffusion built from `model_cfg` — used for
    cond-spec names/order.
    """
    return load_ema_or_raw(ckpt_path, ldm, model_cfg, use_ema=False)


def load_ema_or_raw(ckpt_path: str, ldm, model_cfg: Dict, use_ema: bool = True) -> Dict:
    """Load reference checkpoint, preferring EMA weights for the UNet.

    The reference's LitEma stores flattened shadow buffers under
    `model_ema.<name-without-dots>`; we remap by re-flattening each live
    `model.*` key the same way and looking it up. NOTE: the flattening is
    name-lossy in principle (two dotted names can flatten identically), but
    torch's register_buffer raises on duplicate flattened names at training
    time, so any checkpoint that trained successfully is collision-free.
    """
    import torch

    # weights_only=False: torch>=2.6 defaults to True, which rejects the
    # non-tensor pickled extras every Lightning .ckpt carries
    # (hyper_parameters, callbacks) — same fix as load_first_stage_checkpoint
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = dict(ckpt.get("state_dict", ckpt))
    if use_ema:
        live_keys = [k for k in sd if k.startswith("model.diffusion_model.")]
        ema_map = {}
        for k in live_keys:
            flat = "model_ema." + k[len("model."):].replace(".", "")
            if flat in sd:
                ema_map[k] = sd[flat]
        if ema_map:
            sd.update(ema_map)
    return load_reference_ldm_checkpoint_from_sd(sd, ldm, model_cfg)


def load_reference_ldm_checkpoint_from_sd(sd, ldm, model_cfg: Dict) -> Dict:
    p = dict(model_cfg.get("params", {}))
    up = p["unet_config"]["params"]
    params: Dict = {
        "unet": convert_unet(
            sd,
            num_res_blocks=up["num_res_blocks"],
            channel_mult=tuple(up["channel_mult"]),
            attention_resolutions=tuple(up["attention_resolutions"]),
            transformer_depth=up.get("transformer_depth", 1),
            prefix="model.diffusion_model.",
            # AttentionBlock (base-DDPM) checkpoints need the head rule and
            # model_channels to locate/split qkv — without forwarding these
            # the only working path was calling convert_unet by hand
            use_spatial_transformer=up.get("use_spatial_transformer", True),
            num_heads=up.get("num_heads", 1),
            num_head_channels=up.get("num_head_channels", -1),
            model_channels=up.get("model_channels", 0),
        )
    }
    if any(k.startswith("first_stage_model.") for k in sd):
        dd = p["first_stage_config"]["params"]["ddconfig"]
        params["first_stage"] = convert_vqmodel(sd, dd, prefix="first_stage_model.")
    module_specs = [s for s in ldm.cond_specs if s.module is not None]
    for i, spec in enumerate(module_specs):
        prefix = (
            "cond_stage_model." if len(module_specs) == 1
            else f"cond_stage_model_{i + 1}."
        )
        mod_cls = type(spec.module).__name__
        if mod_cls == "ClassEmbedder":
            params[f"cond/{spec.key}"] = convert_class_embedder(
                sd, prefix=prefix, null_mode=spec.module.null_mode
            )
        elif mod_cls == "Conv1DTemporalAttention":
            params[f"cond/{spec.key}"] = convert_conv1d_temporal_attention(
                sd, prefix=prefix
            )
        elif mod_cls == "LandmarkEncoder":
            params[f"cond/{spec.key}"] = convert_landmark_encoder(
                sd, prefix=prefix
            )
        else:
            raise NotImplementedError(mod_cls)
    return params
