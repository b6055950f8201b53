"""Helpers to load the read-only torch reference as a numerical parity oracle.

The reference tree (if mounted) is used ONLY to instantiate torch modules and
compare outputs — no code is copied. Tests importing this module must skip
cleanly when the reference or torch is unavailable.
"""
import os
import sys
import types

REFERENCE_ROOT = "/root/reference/face_reenactment"
TALKING_ROOT = "/root/reference/talking_face"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def install_reference_path(root=REFERENCE_ROOT):
    """Make `ldm.*` / `taming.*` of the requested reference subtree importable,
    stubbing the heavyweight deps its module headers pull in but our oracles
    don't use.

    Both subtrees define the same package names, so cached modules from a
    previously-imported subtree are purged and `root` is pinned to the front
    of sys.path — otherwise test ORDER decides which fork an oracle test gets.
    """
    for k in [k for k in sys.modules if k.split(".")[0] in ("ldm", "taming")]:
        del sys.modules[k]
    for other in (REFERENCE_ROOT, TALKING_ROOT):
        while other in sys.path:
            sys.path.remove(other)
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        om.OmegaConf = None
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    if "pytorch_lightning" not in sys.modules:
        import torch

        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        pl.Callback = object
        sys.modules["pytorch_lightning"] = pl
    for name in ("clip", "kornia"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    stub_optional_deps()
    if root not in sys.path:
        sys.path.insert(0, root)


def stub_optional_deps():
    """Register complete stubs for heavyweight optional deps the reference's
    module headers import. Idempotent and ADDITIVE: a partial stub installed
    earlier by another test (e.g. torchvision without .utils) is completed
    rather than trusted, so test order cannot break imports."""
    import importlib.machinery

    def module(name):
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            # a real __spec__ keeps importlib.util.find_spec(name) working
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = m
        return m

    tv = module("torchvision")
    tv.models = module("torchvision.models")
    tvu = module("torchvision.utils")
    if not hasattr(tvu, "make_grid"):
        tvu.make_grid = lambda *a, **k: None
    tv.utils = tvu
    for name in ("albumentations", "librosa", "cv2"):
        module(name)
    pl = sys.modules.get("pytorch_lightning")
    if pl is not None and "pytorch_lightning.utilities.distributed" not in sys.modules:
        u = types.ModuleType("pytorch_lightning.utilities")
        d = types.ModuleType("pytorch_lightning.utilities.distributed")
        d.rank_zero_only = lambda fn: fn
        u.distributed = d
        pl.utilities = u
        sys.modules["pytorch_lightning.utilities"] = u
        sys.modules["pytorch_lightning.utilities.distributed"] = d
