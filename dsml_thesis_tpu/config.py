"""Config-YAML surface: reference-compatible `target:`/`params:` instantiation.

The reference builds its object graph by reflection over YAML target strings
(ldm/util.py:78-94, merged at main.py:525-527). This module keeps that YAML
surface working verbatim — the same affectnet/mead config files drive the TPU
framework — by translating reference target names to native builders. Native
`dsml_thesis_tpu.*` targets are also accepted.

Entry points:
  - load_config(paths, overrides): YAML merge left→right + dotlist overrides
  - build_model(cfg.model): -> models.ldm.LatentDiffusion
  - instantiate_from_config(node): generic target/params reflection
"""
from __future__ import annotations

import importlib
from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import yaml

from .diffusion import make_schedule
from .models.autoencoder import AutoencoderKL, IdentityFirstStage, VQModel
from .models.encoders import (
    ClassEmbedder,
    Conv1DTemporalAttention,
    LandmarkEncoder,
    TransformerTextEmbedder,
)
from .models.ldm import CondSpec, LatentDiffusion
from .models.unet import UNetModel


# ---------------------------------------------------------------------------
# YAML loading / merging
# ---------------------------------------------------------------------------

def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def load_config(paths: Sequence[str], overrides: Sequence[str] = ()) -> Dict:
    """Merge YAML files left→right, then apply `a.b.c=value` dotlist overrides
    (reference main.py:525-527 semantics)."""
    cfg: Dict = {}
    for p in paths:
        with open(p) as f:
            cfg = _deep_merge(cfg, yaml.safe_load(f) or {})
    for ov in overrides:
        key, _, val = ov.partition("=")
        if "=" not in ov or key.lstrip().startswith("-"):
            # unknown CLI args land here (parse_known_args); swallowing a
            # mistyped flag (either '--flag value' or '--flag=value' form)
            # as a bogus config key would silently change a run
            raise ValueError(
                f"unrecognized argument {ov!r}: config overrides must be "
                "dotted key=value pairs (e.g. model.params.image_size=32)"
            )
        node = cfg
        parts = key.strip().split(".")
        for i, part in enumerate(parts[:-1]):
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(
                    f"override {key!r}: '{'.'.join(parts[:i + 1])}' is "
                    f"{type(node).__name__} ({node!r}), cannot descend into it"
                )
        node[parts[-1]] = _parse_value(val)
    return cfg


# ---------------------------------------------------------------------------
# target registry
# ---------------------------------------------------------------------------

def _build_unet(params: Dict) -> UNetModel:
    kw = dict(params)
    kw.pop("n_embed", None)
    kw.pop("use_fp16", None)
    for seq_key in ("attention_resolutions", "channel_mult"):
        if seq_key in kw:
            kw[seq_key] = tuple(kw[seq_key])
    dtype = kw.pop("dtype", None)
    if isinstance(dtype, str):
        kw["dtype"] = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]
    elif dtype is not None:
        kw["dtype"] = dtype
    return UNetModel(**kw)


def _build_vq(params: Dict) -> VQModel:
    dd = dict(params["ddconfig"])
    for seq_key in ("ch_mult", "attn_resolutions"):
        if seq_key in dd:
            dd[seq_key] = tuple(dd[seq_key])
    dtype = params.get("dtype")
    if isinstance(dtype, str):
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]
    return VQModel(
        ddconfig=dd,
        n_embed=params["n_embed"],
        embed_dim=params["embed_dim"],
        dtype=dtype or jnp.float32,
    )


def _build_kl(params: Dict) -> AutoencoderKL:
    dd = dict(params["ddconfig"])
    for seq_key in ("ch_mult", "attn_resolutions"):
        if seq_key in dd:
            dd[seq_key] = tuple(dd[seq_key])
    return AutoencoderKL(ddconfig=dd, embed_dim=params["embed_dim"])


def _build_text_embedder(p: Dict) -> TransformerTextEmbedder:
    return TransformerTextEmbedder(
        n_embed=p["n_embed"], n_layer=p["n_layer"],
        vocab_size=p.get("vocab_size", 30522),
        max_seq_len=p.get("max_seq_len", 77),
    )


def _build_class_embedder(params: Dict, null_mode: str,
                          freeze_null: bool = False) -> ClassEmbedder:
    # reference default p_uncond=0.2 for every null-capable variant
    # (ClassEmbedder2/3 and talking_face ClassEmbedder); the plain variant
    # ('none') has no dropout at all
    default_p = 0.0 if null_mode == "none" else 0.2
    return ClassEmbedder(
        embed_dim=params["embed_dim"],
        n_classes=params.get("n_classes", 1000),
        p_uncond=params.get("p_uncond", default_p),
        null_mode=null_mode,
        freeze_null=freeze_null,
        key=params.get("key", "class_label"),
    )


# Reference target names -> builders. Face and talking_face subtrees share
# names; variants that differ (ClassEmbedder) are disambiguated by params.
_BUILDERS = {
    "ldm.modules.diffusionmodules.openaimodel.UNetModel": _build_unet,
    "dsml_thesis_tpu.models.unet.UNetModel": _build_unet,
    "ldm.models.autoencoder.VQModelInterface": _build_vq,
    "ldm.models.autoencoder.VQModel": _build_vq,
    "dsml_thesis_tpu.models.autoencoder.VQModel": _build_vq,
    "ldm.models.autoencoder.AutoencoderKL": _build_kl,
    "dsml_thesis_tpu.models.autoencoder.AutoencoderKL": _build_kl,
    "ldm.models.autoencoder.IdentityFirstStage": lambda p: IdentityFirstStage(),
    "torch.nn.Identity": lambda p: None,  # lossconfig placeholder
    # face_reenactment embedders: plain / frozen-null / trainable-null
    "ldm.modules.encoders.modules.ClassEmbedder3": lambda p: _build_class_embedder(
        p, "separate"
    ),
    # ClassEmbedder2's null embedding is FROZEN at its random init
    # (modules.py:41-43 requires_grad=False)
    "ldm.modules.encoders.modules.ClassEmbedder2": lambda p: _build_class_embedder(
        p, "separate", freeze_null=True
    ),
    # 'ClassEmbedder' is ambiguous across the two reference forks:
    # talking_face's has an (n_classes+1)-row table + p_uncond CFG dropout
    # (modules.py:44-73), face_reenactment's is a plain embedder (no null
    # row, no dropout, modules.py:20). Shipped talking_face configs always
    # spell p_uncond explicitly, so its presence selects the extra-row
    # variant; absent -> the plain embedder (NOT 'separate', whose
    # uncond_embedding buffer the plain reference checkpoint lacks).
    "ldm.modules.encoders.modules.ClassEmbedder": lambda p: _build_class_embedder(
        p, "extra_row" if "p_uncond" in p else "none"
    ),
    "dsml_thesis_tpu.models.encoders.ClassEmbedder": lambda p: ClassEmbedder(**p),
    "ldm.modules.encoders.modules.Conv1DTemporalAttention": (
        lambda p: Conv1DTemporalAttention(**p)
    ),
    "dsml_thesis_tpu.models.encoders.Conv1DTemporalAttention": (
        lambda p: Conv1DTemporalAttention(**p)
    ),
    "ldm.modules.encoders.modules.LandmarkEncoder": lambda p: LandmarkEncoder(
        output_dim=p.get("output_dim", 128)
    ),
    "ldm.modules.encoders.modules.TransformerEmbedder": _build_text_embedder,
    "ldm.modules.encoders.modules.BERTEmbedder": _build_text_embedder,
    "dsml_thesis_tpu.models.encoders.TransformerTextEmbedder": (
        lambda p: TransformerTextEmbedder(**p)
    ),
    # end-to-end trainable wav2vec2 conditioning (the reference's MEADBase4
    # experimental path, modules.py:291-328)
    "ldm.modules.encoders.modules.AudioEmbedder": (
        lambda p: _build_audio_embedder(p)
    ),
    "dsml_thesis_tpu.models.wav2vec2.AudioEmbedder": (
        lambda p: _build_audio_embedder(p)
    ),
}


def _build_audio_embedder(p):
    from .models.wav2vec2 import AudioEmbedder

    return AudioEmbedder(win_len=p.get("win_len", 4),
                         subspace_dim=p.get("subspace_dim", 768))


def _register_data_targets():
    from .data import datasets as D

    _BUILDERS.update({
        "taming.data.custom.AffectnetTrain": lambda p: D.AffectnetTrain(**p),
        "taming.data.custom.AffectnetTest": lambda p: D.AffectnetTest(**p),
        "taming.data.custom.MEADBase3": lambda p: D.MEADBase3(**p),
        "taming.data.custom.MEADBase5": lambda p: D.MEADBase5(**p),
        "ldm.data.latents.LatentTrain": lambda p: D.LatentTrain(**p),
        "ldm.data.latents.LatentTest": lambda p: D.LatentTest(**p),
        "dsml_thesis_tpu.data.SyntheticDataset": lambda p: D.SyntheticDataset(**p),
    })


_register_data_targets()


def get_obj_from_str(target: str):
    """Resolve a native dotted path (non-reference targets)."""
    module, cls = target.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


def instantiate_from_config(node: Dict) -> Any:
    if node in ("__is_first_stage__", "__is_unconditional__"):
        return node
    target = node["target"]
    params = dict(node.get("params", {}))
    if target in _BUILDERS:
        return _BUILDERS[target](params)
    return get_obj_from_str(target)(**params)


# ---------------------------------------------------------------------------
# LatentDiffusion assembly from a reference-style model config
# ---------------------------------------------------------------------------

_LDM_TARGETS_1COND = {
    "ldm.models.diffusion.ddpm.LatentDiffusion",
    "ldm.models.diffusion.latent_diffclip.LatentDiffusionCLIP",
}
_LDM_TARGETS_2COND = {
    "ldm.models.diffusion.ddpm2cond.LatentDiffusion",
    "ldm.models.diffusion.ddpm2condtune.LatentDiffusion",
}


def build_model(model_cfg: Dict) -> LatentDiffusion:
    """Build the unified LatentDiffusion from a reference model config node."""
    target = model_cfg["target"]
    p = dict(model_cfg.get("params", {}))

    schedule = make_schedule(
        beta_schedule=p.get("beta_schedule", "linear"),
        timesteps=p.get("timesteps", 1000),
        linear_start=p.get("linear_start", 1e-4),
        linear_end=p.get("linear_end", 2e-2),
        cosine_s=p.get("cosine_s", 8e-3),
        v_posterior=p.get("v_posterior", 0.0),
        parameterization=p.get("parameterization", "eps"),
    )

    unet = instantiate_from_config(p["unet_config"])
    fs_cfg = p.get("first_stage_config")
    first_stage = instantiate_from_config(fs_cfg) if fs_cfg else None
    if isinstance(first_stage, str):
        first_stage = None

    cond_specs: List[CondSpec] = []
    trainable = p.get("cond_stage_trainable", False)
    if target in _LDM_TARGETS_1COND or target.startswith("dsml_thesis_tpu"):
        cs_cfg = p.get("cond_stage_config")
        if cs_cfg and cs_cfg != "__is_unconditional__":
            # `or`: the reference clip-ldm yaml sets `cond_stage_key: null`
            # explicitly — a None key must still fall back
            key = p.get("cond_stage_key") or "class_label"
            if cs_cfg == "__is_first_stage__":
                cond_specs.append(CondSpec(key, None, "concat_first_stage", False))
            else:
                # a real encoder module's output concatenates DIRECTLY (the
                # reference DiffusionWrapper concat mode, ddpm.py:1397-1423);
                # only __is_first_stage__ pushes the batch value through the
                # frozen first stage — concat_first_stage here would
                # double-encode the module output
                route = (
                    "crossattn_feature"
                    if p.get("conditioning_key", "crossattn") == "crossattn"
                    else "concat_raw"
                )
                cond_specs.append(
                    CondSpec(key, instantiate_from_config(cs_cfg), route, trainable)
                )
    elif target in _LDM_TARGETS_2COND:
        key1 = p.get("cond_stage_key_1", "class_label")
        key2 = p.get("cond_stage_key_2", "audio")
        cond_specs.append(
            CondSpec(
                key1, instantiate_from_config(p["cond_stage_config_1"]),
                "crossattn_feature", trainable,
            )
        )
        cond_specs.append(
            CondSpec(
                key2, instantiate_from_config(p["cond_stage_config_2"]),
                "crossattn_feature", trainable,
            )
        )
        # talking_face 4-cond: masked-motion + identity latents channel-concat
        # (ddpm2cond.py:667-720); detected by the UNet consuming extra channels
        unet_in = p["unet_config"]["params"]["in_channels"]
        latent_ch = p.get("channels", 3)
        if unet_in > latent_ch:
            for key in p.get("concat_keys", ("masked_image", "identity")):
                cond_specs.append(CondSpec(key, None, "concat_first_stage", False))
    else:
        raise NotImplementedError(f"model target {target}")

    return LatentDiffusion(
        unet=unet,
        first_stage=first_stage,
        cond_specs=cond_specs,
        schedule=schedule,
        scale_factor=p.get("scale_factor", 1.0),
        parameterization=p.get("parameterization", "eps"),
        loss_type=p.get("loss_type", "l2"),
        l_simple_weight=p.get("l_simple_weight", 1.0),
        original_elbo_weight=p.get("original_elbo_weight", 0.0),
        first_stage_key=p.get("first_stage_key", "image"),
        image_size=p.get("image_size", 32),
        channels=p.get("channels", 3),
        monitor=p.get("monitor", "val_loss_ema"),
        # config-gated patch tiling (reference ddpm.py:893-1013); tuples come
        # through YAML as lists — tiling.py takes either
        split_input_params=p.get("split_input_params"),
    )


def _resolve_edit_attr(name: str) -> int:
    """SRC_TRG_TXT_DIC attribute name -> AffectNet class index."""
    from .data.datasets import EMOTION2LABEL

    aliases = {"scared": "fear", "fearful": "fear", "anger": "angry",
               "disgust": "disgusted", "surprise": "surprised",
               "contemptuous": "contempt"}
    return EMOTION2LABEL[aliases.get(name, name)]


def build_guidance_encoders(p: Dict, edit_attr: Optional[str] = None,
                            skip: Optional[set] = None) -> Dict:
    """Construct the frozen guidance encoders from checkpoint paths in the
    model config (extension keys — the reference hardcodes the pip `clip`
    download and 'pretrained/model_ir_se50.pth', idloss.py:6-16):
      clip_ckpt: OpenAI or HF CLIP checkpoint -> clip_image_embed (+ text
                 directions when clip_bpe, the BPE merge table, is also given)
      id_ckpt:   IR-SE50 Backbone state_dict -> arcface_embed
    Returns kwargs for DiffusionCLIPFinetune.
    """
    out: Dict = {}
    frozen: Dict = {}
    skip = skip or set()
    if p.get("clip_ckpt") and not (
        "clip_image_embed" in skip and
        ("text_direction" in skip or not p.get("clip_bpe"))
    ):
        from .models import clip as clip_mod

        # clip_quick_gelu: false selects plain-GELU checkpoints (LAION
        # ViT-H/bigG HF layout); the default matches OpenAI-lineage ckpts
        cfg, params = clip_mod.load_clip_checkpoint(
            p["clip_ckpt"], use_quick_gelu=p.get("clip_quick_gelu", True))
        # param-taking fn + weights routed through the params tree
        # ('frozen/guidance'), so jitted losses receive them as ARGUMENTS
        # instead of closure constants (axon rejects those, CLAUDE.md)
        out["clip_image_embed"] = clip_mod.make_clip_image_embed_apply(cfg)
        frozen["clip"] = params["visual"]
        if p.get("clip_bpe"):
            import jax.numpy as jnp
            import numpy as np

            from .data.clip_tokenizer import CLIPTokenizer
            from .losses.guidance import EMOTION_PROMPTS, LABEL2EMOTION

            tok = CLIPTokenizer(p["clip_bpe"])

            def direction(src_txt, trg_txt):
                # truncate=True: the fixed template set fits real CLIP's
                # 77-token context; only tiny test contexts ever truncate
                src = jnp.asarray(tok.tokenize(
                    [t.format(src_txt) for t in clip_mod.IMAGENET_TEMPLATES],
                    context_length=cfg.context_length, truncate=True))
                trg = jnp.asarray(tok.tokenize(
                    [t.format(trg_txt) for t in clip_mod.IMAGENET_TEMPLATES],
                    context_length=cfg.context_length, truncate=True))
                return np.asarray(clip_mod.compute_text_direction(
                    cfg, params["text"], src, trg))

            if edit_attr is not None:
                # reference semantics (latent_diffclip.py:959,1022): the
                # direction is per-example from the SOURCE class's emotion
                # text to the fixed edit_attr target text. Canonicalize the
                # target text through the reference vocabulary so alias
                # spellings ('fear') still embed 'scared face'
                trg_label = _resolve_edit_attr(edit_attr)
                canon = {0: "neutral face", 7: "face"}
                trg_txt = canon.get(trg_label, LABEL2EMOTION[trg_label])
                dirs = []
                for s in sorted(LABEL2EMOTION):
                    src_txt = "face" if s == trg_label else LABEL2EMOTION[s]
                    dirs.append(direction(src_txt, trg_txt))
                out["direction_by_source"] = True
            else:
                # extension mode (no edit_attr): per-TARGET-class directions
                dirs = [direction(*EMOTION_PROMPTS[l])
                        for l in sorted(EMOTION_PROMPTS)]
                out["direction_by_source"] = False
            out["text_direction"] = jnp.asarray(np.stack(dirs))
    if p.get("id_ckpt") and "arcface_embed" not in skip:
        import torch

        from .models.insight_face import IRSE, convert_irse, make_id_embed_apply

        sd = torch.load(p["id_ckpt"], map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        ip, istats = convert_irse(sd)
        affine = "output_layer.4.weight" in sd
        out["arcface_embed"] = make_id_embed_apply(model=IRSE(affine=affine))
        frozen["irse"] = {"params": ip, "batch_stats": istats}
    if p.get("cls_ckpt") and "classifier_logits" not in skip:
        import dataclasses as _dc

        import jax
        import jax.numpy as jnp

        from .models.efficientnet import (
            affectnet_to_head,
            convert_enet,
            load_enet_state_dict,
            make_enet_logits_apply,
        )

        # HSEmotion enet_b2_7/8 (clsloss.py:80-114); knobs cover the non-tf
        # timm lineage (cls_pad_same: false, cls_bn_eps: 1e-5)
        ecfg, ep, estats = convert_enet(load_enet_state_dict(p["cls_ckpt"]))
        ecfg = _dc.replace(
            ecfg,
            pad_same=bool(p.get("cls_pad_same", True)),
            bn_eps=float(p.get("cls_bn_eps", 1e-3)),
            input_size=int(p.get("cls_input_size", 260)),
        )
        raw_logits = make_enet_logits_apply(ecfg)
        # reorder head logits into AffectNet label order (the reference
        # instead remaps the TARGET through IDX_TO_CLASS/CLASS_TO_IDX,
        # clsloss.py:111-113 — exact under softmax permutation equivariance)
        perm = jnp.asarray(affectnet_to_head(ecfg.num_classes))

        def _cls_logits(variables, images, _raw=raw_logits, _perm=perm):
            return _raw(variables, images)[:, _perm]

        out["classifier_logits"] = _cls_logits
        frozen["classifier"] = {
            "params": jax.tree.map(jnp.asarray, ep),
            "batch_stats": jax.tree.map(jnp.asarray, estats),
        }
    if frozen:
        out["frozen_params"] = frozen
    return out


def build_finetune(model_cfg: Dict, ldm: Optional[LatentDiffusion] = None,
                   **encoder_fns):
    """Build the finetune wrapper matching the config's target:
      - latent_diffclip.LatentDiffusionCLIP -> DiffusionCLIPFinetune
        (knobs: affectnet-128-clip-ldm-vq-f4.yaml:18-29)
      - ddpm2condtune.LatentDiffusion -> LipreadFinetune
        (knobs: mead-128-ldm-f4-tune.yaml:19-20)
    encoder_fns inject the frozen pretrained callables (clip_image_embed,
    arcface_embed, classifier_logits, lipreader_fn); any not injected are
    built from checkpoint-path config keys via build_guidance_encoders.
    """
    target = model_cfg["target"]
    p = dict(model_cfg.get("params", {}))
    if ldm is None:
        ldm = build_model(model_cfg)
    if target.endswith("latent_diffclip.LatentDiffusionCLIP"):
        from .models.diffclip import DiffusionCLIPFinetune

        edit_attr = p.get("edit_attr")
        # caller-injected encoders skip the (expensive) config-keyed builds
        enc = {**build_guidance_encoders(p, edit_attr=edit_attr,
                                         skip=set(encoder_fns)),
               **encoder_fns}
        ft = DiffusionCLIPFinetune(
            ldm,
            train_steps=p.get("num_train_steps", 6),
            strength=p.get("strength", 0.5),
            l2_weight=p.get("l2_loss_w", 1.0),
            id_weight=p.get("id_loss_w", 1.0),
            clip_weight=p.get("clip_loss_w", 1.0),
            cls_weight=p.get("cls_loss_w", 0.0),
            clip_image_embed=enc.get("clip_image_embed"),
            arcface_embed=enc.get("arcface_embed"),
            classifier_logits=enc.get("classifier_logits"),
            edit_attr_label=(
                _resolve_edit_attr(edit_attr) if edit_attr else None
            ),
            text_direction=enc.get("text_direction"),
            direction_by_source=enc.get("direction_by_source", False),
            frozen_params=enc.get("frozen_params"),
        )
        return ft
    if target.endswith("ddpm2condtune.LatentDiffusion"):
        from .models.lipread_tune import LipreadFinetune

        lipreader_fn = encoder_fns.get("lipreader_fn")
        frozen = None
        if lipreader_fn is None and p.get("lipread_ckpt"):
            # in-tree Conv3dResNet frontend (models/lipreader.py) replacing
            # the reference's uncheckedout VSR submodule
            # (ddpm2condtune.py:498-535); weights ride 'frozen/guidance' as
            # jit arguments, like the CLIP/ArcFace towers
            from .models.lipreader import (
                load_lipreader_checkpoint,
                make_lipreader_apply,
            )

            lipreader_fn = make_lipreader_apply(
                p.get("lipread_relu_type", "swish"))
            frozen = {"lipreader": load_lipreader_checkpoint(p["lipread_ckpt"])}
        return LipreadFinetune(
            ldm,
            lipreader_fn=lipreader_fn,
            frozen_params=frozen,
            lr_loss_weight=p.get("lr_loss_w", 1.0),
            start_lr_loss=p.get("start_lr_loss", 0),
            # reference constants (ddpm2condtune.py:515-521); overridable so
            # tiny test configs can drive the full mouth chain
            mouth_crop=p.get("mouth_crop", 72),
            mouth_center_crop=p.get("mouth_center_crop", 64),
            mouth_size=p.get("mouth_size", 88),
        )
    raise NotImplementedError(f"finetune target {target}")


FINETUNE_TARGETS = (
    "latent_diffclip.LatentDiffusionCLIP",
    "ddpm2condtune.LatentDiffusion",
)


def is_finetune_target(target: str) -> bool:
    return target.endswith(FINETUNE_TARGETS)
