"""Surgical checkpoint loading + denoise-trajectory sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.diffusion import (
    ddim_sample_with_intermediates,
    make_ddim_schedule,
    make_schedule,
)
from dsml_thesis_tpu.utils_io import surgical_load


def test_surgical_load_ignore_and_only():
    template = {
        "unet": {"a": jnp.zeros(2), "b": jnp.zeros(2)},
        "cond": {"c": jnp.zeros(2)},
    }
    loaded = {
        "unet": {"a": jnp.ones(2), "b": jnp.ones(2)},
        "cond": {"c": jnp.ones(2)},
        "extra": {"z": jnp.ones(2)},  # dropped
    }
    out = surgical_load(template, loaded, ignore_keys=["unet/b"])
    np.testing.assert_allclose(np.asarray(out["unet"]["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["unet"]["b"]), 0.0)  # ignored
    np.testing.assert_allclose(np.asarray(out["cond"]["c"]), 1.0)
    assert "extra" not in out

    only = surgical_load(template, loaded, only=["unet"])
    np.testing.assert_allclose(np.asarray(only["unet"]["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(only["cond"]["c"]), 0.0)  # not in only

    missing = surgical_load(template, {"unet": {"a": jnp.ones(2)}})
    np.testing.assert_allclose(np.asarray(missing["unet"]["b"]), 0.0)  # kept fresh


def test_denoise_trajectory():
    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    ddim = make_ddim_schedule(sched, 8, eta=0.0)
    eps = lambda x, t: 0.1 * x
    final, traj = ddim_sample_with_intermediates(
        ddim, sched, eps, (2, 4, 4, 3), jax.random.PRNGKey(0), log_every=2
    )
    assert final.shape == (2, 4, 4, 3)
    # uniform discretization may round the step count up (reference semantics)
    expected = -(-ddim.num_steps // 2)
    assert traj.shape == (expected, 2, 4, 4, 3)
    assert np.isfinite(np.asarray(traj)).all()


def test_flags_doc_covers_every_env_flag():
    """Doc-rot guard: every DSML_* flag referenced in source appears in
    docs/FLAGS.md, and the doc lists no phantom flags."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pat = re.compile(r"DSML_[A-Z0-9_]+")
    in_code = set()
    for root, _, files in os.walk(os.path.join(repo, "dsml_thesis_tpu")):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                in_code |= set(pat.findall(open(os.path.join(root, f)).read()))
    for extra in ("bench.py",):
        in_code |= set(pat.findall(open(os.path.join(repo, extra)).read()))
    sdir = os.path.join(repo, "scripts")
    for f in os.listdir(sdir):
        if f.endswith(".py"):
            in_code |= set(pat.findall(open(os.path.join(sdir, f)).read()))
    in_doc = set(pat.findall(open(os.path.join(repo, "docs", "FLAGS.md")).read()))
    assert in_code - in_doc == set(), f"undocumented flags: {in_code - in_doc}"
    assert in_doc - in_code == set(), f"phantom doc flags: {in_doc - in_code}"
