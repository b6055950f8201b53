"""Parity of the Flax lipreader visual frontend vs the vendored torch oracle,
plus the checkpoint-prefix handling and the lipread-finetune wiring."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from dsml_thesis_tpu.models import lipreader as lr
from tests.lipreader_torch import Conv3dResNet


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.weight.copy_(1.0 + 0.2 * torch.randn(m.weight.shape, generator=g))
                m.bias.copy_(0.2 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(0.2 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(1.0 + 0.5 * torch.rand(m.running_var.shape, generator=g))
            elif isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d)):
                # fan-in scaling keeps 18-layer activations O(1) so fp32
                # accumulation-order noise stays inside the tolerance
                fan_in = m.weight[0].numel()
                m.weight.copy_(torch.randn(m.weight.shape, generator=g)
                               * fan_in ** -0.5)
    return module


@pytest.mark.parametrize("relu_type", ["swish", "relu"])
def test_lipreader_video_parity(relu_type):
    tm = _randomize(Conv3dResNet(relu_type), seed=0).eval()
    x = np.random.RandomState(1).randn(2, 3, 88, 88).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()  # [2, 3, 512]

    params, stats = lr.convert_lipreader(tm.state_dict(), prefix="")
    fn = lr.make_lipreader_video_apply(relu_type)
    got = fn({"params": params, "batch_stats": stats},
             jnp.asarray(x[..., None]))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-4)


def test_frame_adapter_matches_reference_unsqueeze():
    """ddpm2condtune.py:1063 feeds single frames as T=1 clips; the frame
    adapter must equal the video form at T=1."""
    tm = _randomize(Conv3dResNet("swish"), seed=2).eval()
    x = np.random.RandomState(3).randn(4, 88, 88).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x[:, None])).numpy()[:, 0]  # [4, 512]

    params, stats = lr.convert_lipreader(tm.state_dict(), prefix="")
    fn = lr.make_lipreader_apply("swish")
    got = fn({"params": params, "batch_stats": stats},
             jnp.asarray(x[..., None]))
    assert got.shape == (4, 512)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-4)


def test_converter_detects_e2e_prefix(tmp_path):
    """The LRS3 model.pth keys the frontend 'encoder.frontend.*' inside the
    full espnet E2E state_dict (sometimes wrapped in model_state_dict)."""
    tm = _randomize(Conv3dResNet("swish"), seed=4).eval()
    sd = {f"encoder.frontend.{k}": v for k, v in tm.state_dict().items()}
    sd["decoder.something.weight"] = torch.zeros(2, 2)  # non-frontend noise
    assert lr.detect_frontend_prefix(sd) == "encoder.frontend."

    path = tmp_path / "model.pth"
    torch.save({"model_state_dict": sd}, str(path))
    variables = lr.load_lipreader_checkpoint(str(path))

    x = np.random.RandomState(5).randn(1, 88, 88).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x[:, None])).numpy()[:, 0]
    got = lr.make_lipreader_apply("swish")(variables, jnp.asarray(x[..., None]))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-4)


def test_finetune_builds_lipreader_from_config(tmp_path):
    """build_finetune(lipread_ckpt=...) must give LipreadFinetune a
    param-taking tower routed through frozen_params (jit-argument weights)."""
    import yaml

    from dsml_thesis_tpu.config import build_finetune
    from test_ldm import TINY_MEAD_CFG

    cfg = yaml.safe_load(TINY_MEAD_CFG)["model"]
    cfg["target"] = "ldm.models.diffusion.ddpm2condtune.LatentDiffusion"

    tm = Conv3dResNet("swish").eval()
    path = tmp_path / "model.pth"
    torch.save({f"encoder.frontend.{k}": v
                for k, v in tm.state_dict().items()}, str(path))

    cfg["params"]["lipread_ckpt"] = str(path)
    ft = build_finetune(cfg)
    assert ft.lipreader_fn is not None
    assert ft.frozen_params and "lipreader" in ft.frozen_params
    # the bound encoder produces [B, 512] features from an 88px mouth batch
    m = jnp.zeros((2, 88, 88, 1))
    feats = ft._lipreader({"frozen/guidance": ft.frozen_params})(m)
    assert feats.shape == (2, 512)
