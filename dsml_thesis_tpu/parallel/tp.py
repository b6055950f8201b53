"""Tensor-parallel parameter partitioning over the mesh's `model` axis.

The reference has no tensor parallelism (its only parallelism is DDP,
main.py:532); at this model scale (157M params) TP is a capability, not a
necessity. The TPU-native mechanism is GSPMD: attach Megatron-style
PartitionSpecs to the attention projection weights and let the SPMD
partitioner propagate shardings and insert the collectives —

  - to_q / to_k / to_v kernels  [C, H*D]  -> P(None, "model")
    column-parallel: each model shard computes H/m heads. The subsequent
    reshape to [B, N, H, D] keeps head-major order, so the sharded inner
    axis maps exactly onto a sharded head axis (m must divide H) and the
    per-head attention itself partitions with no communication.
  - to_out kernel               [H*D, C]  -> P("model", None)
    row-parallel: each shard contracts its own heads' slice; GSPMD inserts
    the one psum over `model` that completes the block. to_out bias stays
    replicated.

Convolutions, GroupNorm, time-embedding MLPs and the GEGLU feed-forward stay
replicated: the conv params cannot shard without cross-shard halo traffic,
and the GEGLU kernel stores [a | gate] as one concatenated matrix (torch
checkpoint layout) whose halves would land on disjoint shard subsets —
sharding it would force a reshard between the split and the gate multiply.
Gradients of replicated params get the same psum DP already needs.

The Pallas flash-attention kernel is opaque to GSPMD (an unpartitioned
pallas_call would force q/k/v all-gathers), so on multi-device meshes
Trainer._jit scopes ops.attention.attention_mesh around its traces: the
dispatch wraps the kernel in jax.shard_map — batch over `data`, heads over
`model` — and every device runs the single-device flash program on its local
shard with zero collectives (rows and heads of attention are independent).
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import keystr, tree_map_with_path

# matched against the keystr suffix of each leaf, whatever the tree prefix
# (params, adam mu/nu, EMA shadows all share the module path suffix)
TP_RULES = [
    (re.compile(r"\['(to_q|to_k|to_v)'\]\['kernel'\]$"), P(None, "model")),
    (re.compile(r"\['to_out'\]\['kernel'\]$"), P("model", None)),
]


def leaf_spec(path) -> P:
    """PartitionSpec for one leaf path (default: replicated)."""
    s = keystr(path)
    for rx, spec in TP_RULES:
        if rx.search(s):
            return spec
    return P()


def _spec_fits(spec: P, x, mesh: Mesh, num_heads=None, dim_head=None) -> bool:
    """A rule only applies when the leaf has the expected rank and the model
    axis can split the packed [.., H*D] kernel dim on a HEAD boundary: the
    head-parallel invariant is m | H, not merely m | H*D (m=2 over H=3, D=8
    divides 24 but splits head 1 across shards, forcing GSPMD to reshard
    around every [B,N,H,D] reshape). With a num_heads hint the check is
    exact; with dim_head (num_head_channels configs, H varies per level)
    H is derived per leaf; with neither, fall back to m | H*D."""
    if getattr(x, "ndim", 0) != len(spec):
        return False
    m = mesh.shape.get("model", 1)
    for dim, name in zip(x.shape, spec):
        if name != "model":
            continue
        if dim % m != 0:
            return False
        if num_heads is not None and num_heads % m != 0:
            return False
        if dim_head is not None and (
            dim % dim_head != 0 or (dim // dim_head) % m != 0
        ):
            return False
    return True


def fsdp_spec(x, mesh: Mesh, base: P = None, min_elems: int = None) -> P:
    """ZeRO-3-style spec: shard the largest still-unsharded axis that the
    `data` mesh size divides. Small leaves (< min_elems, default 2^16 or
    DSML_FSDP_MIN_ELEMS) stay replicated — all-gathering a bias costs more
    latency than the bytes it saves. `base` carries an existing TP assignment;
    FSDP fills a remaining None axis, so TP+FSDP compose into a 2-D sharding
    (e.g. to_q kernel P("data", "model"))."""
    import os

    if min_elems is None:
        min_elems = int(os.environ.get("DSML_FSDP_MIN_ELEMS", str(2**16)))
    n = mesh.shape.get("data", 1)
    ndim = getattr(x, "ndim", 0)
    dims = list(base) if base is not None else []
    dims += [None] * (ndim - len(dims))  # P() means replicated at any rank
    if (n > 1 and getattr(x, "ndim", 0) >= 1 and x.size >= min_elems):
        free = [(d, i) for i, d in enumerate(x.shape)
                if dims[i] is None and d % n == 0]
        if free:
            dims[max(free)[1]] = "data"
    if all(d is None for d in dims):
        return P()
    return P(*dims)


def shard_state(mesh: Mesh, tree: Any, fsdp: bool = False,
                num_heads=None, dim_head=None) -> Any:
    """Place a TrainState (or any pytree) onto the mesh: attention projection
    leaves sharded over `model` per TP_RULES, everything else replicated.
    num_heads/dim_head (from the UNet config) let _spec_fits enforce the
    head-boundary invariant exactly — Trainer passes them via _head_hints().
    With fsdp=True, every large leaf additionally shards one axis over `data`
    (params, Adam moments, and EMA shadows all ride the same tree_map, so the
    whole optimizer memory partitions — the GSPMD partitioner inserts the
    all-gathers at use and keeps the update math sharded). With model=1 and
    fsdp=False this degenerates to replicate()."""

    def put(path, x):
        spec = leaf_spec(path)
        if spec != P() and not _spec_fits(spec, x, mesh,
                                          num_heads=num_heads,
                                          dim_head=dim_head):
            spec = P()
        if fsdp:
            spec = fsdp_spec(x, mesh, base=spec)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return tree_map_with_path(put, tree)
