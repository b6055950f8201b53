#!/usr/bin/env python
"""Device profile of the flagship full-pipeline bench (one warm iteration).

Traces bench.py's synth program with jax.profiler, parses the trace.json.gz,
and prints the top device-time ops (aggregated by fusion name). Run warm —
the persistent compile cache makes the trace iteration representative.

Usage: python scripts/profile_bench.py [--steps 50 --frames 8 --batch 8
       --res 256] [--top 15] [--outdir /tmp/jaxprof]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


#: parent scopes in the trace nest the leaf ops (their duration double-counts
#: every leaf they contain) — exclude them from totals and shares.
_PARENT_PREFIXES = ("while", "jit_", "jit(", "body", "condition", "cond")


def _is_parent(name):
    return name.startswith(_PARENT_PREFIXES)


def _device_events(path):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify device pids: process_name metadata mentioning TPU / device
    dev_pids = set()
    op_tids = set()  # (pid, tid) of "XLA Ops" threads under a device pid
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name":
            if any(s in name for s in ("TPU", "/device:", "Device")):
                dev_pids.add(e["pid"])
        elif e.get("name") == "thread_name" and name == "XLA Ops":
            op_tids.add((e["pid"], e.get("tid")))
    # device traces carry parallel tracks ("Steps" = one span per dispatched
    # program, "XLA Modules" = one span per program body, "XLA Ops" = the
    # actual leaf ops). Counting all three triple-counts multi-dispatch runs
    # (e.g. train_bench's N separate step invocations) — restrict to the op
    # track whenever the metadata names one.
    op_tids = {(p, t) for p, t in op_tids if p in dev_pids}
    if op_tids:
        return [e for e in events
                if e.get("ph") == "X" and "dur" in e
                and (e.get("pid"), e.get("tid")) in op_tids]
    return [e for e in events
            if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e]


def newest_trace(outdir):
    traces = sorted(
        glob.glob(os.path.join(outdir, "**", "*trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    return traces[-1] if traces else None


def parse_trace(outdir, top=15):
    """Aggregate per-op LEAF device durations from the newest trace.json.gz."""
    path = newest_trace(outdir)
    if path is None:
        return None
    durs = defaultdict(float)
    total = 0.0
    for e in _device_events(path):
        name = e.get("name", "?")
        if _is_parent(name):
            continue
        durs[name] += e["dur"]
        total += e["dur"]
    ranked = sorted(durs.items(), key=lambda kv: -kv[1])[:top]
    return total, ranked


def detail_trace(outdir, prefix, top=10):
    """Within ops matching `prefix`, aggregate by operand shape+layout (from
    the HLO metadata XLA embeds in the trace) — attributes e.g. the `copy`
    bucket to the actual tensors being relaid out, instead of one opaque
    family row. Returns (family_total, leaf_total, rows)."""
    path = newest_trace(outdir)
    if path is None:
        return None
    by_shape = defaultdict(float)
    counts = defaultdict(int)
    example = {}
    fam_total = 0.0
    leaf_total = 0.0
    for e in _device_events(path):
        name = e.get("name", "?")
        if _is_parent(name):
            continue
        leaf_total += e["dur"]
        if not name.startswith(prefix):
            continue
        fam_total += e["dur"]
        args = e.get("args", {})
        key = args.get("shape_with_layout") or args.get("long_name", "?")[:160]
        by_shape[key] += e["dur"]
        counts[key] += 1
        if key not in example:
            example[key] = args.get("long_name", "")[:240]
    rows = [(k, v, counts[k], example[k])
            for k, v in sorted(by_shape.items(), key=lambda kv: -kv[1])[:top]]
    return fam_total, leaf_total, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--outdir", default="/tmp/jaxprof")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--config", default=None,
                    help="override the model yaml (e.g. the reference-faithful "
                         "mead-256-ldm-f4-fullattn.yaml)")
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse the newest trace in --outdir without "
                         "running the benchmark (no TPU needed)")
    ap.add_argument("--detail", default=None, metavar="PREFIX",
                    help="also break one op family (e.g. 'copy', "
                         "'convert_reduce') down by tensor shape+layout")
    args = ap.parse_args()
    if args.parse_only:
        report(args)
        return
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.diffusion import make_ddim_schedule, make_video_pipeline
    from dsml_thesis_tpu.utils_io import cast_sampling_params

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config([
        args.config
        or os.path.join(repo,
                        f"configs/latent-diffusion/mead-{args.res}-ldm-f4.yaml")
    ])
    ldm = build_model(cfg["model"])
    c2p = cfg["model"]["params"]["cond_stage_config_2"]["params"]
    w = (c2p["seq_len"] - 1) // 2
    B, F = args.batch, args.frames

    batch = {
        "image": jnp.zeros((B, args.res, args.res, 3)),
        "masked_image": jnp.zeros((B, args.res, args.res, 3)),
        "identity": jnp.zeros((B, args.res, args.res, 3)),
        "class_label": jnp.zeros((B,), jnp.int32),
        "audio": jnp.zeros((B, c2p["seq_len"], c2p["subspace_dim"])),
    }
    params = cast_sampling_params(ldm.init_params(jax.random.PRNGKey(0), batch))
    ddim = make_ddim_schedule(ldm.schedule, args.steps, eta=0.0)
    pipeline = make_video_pipeline(ldm, ddim, w, guidance_scale=2.0)

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    masked = jax.random.normal(ks[0], (B, F, args.res, args.res, 3)) * 0.5
    audio = jax.random.normal(ks[1], (B, F, c2p["subspace_dim"]))
    ident = jax.random.normal(ks[2], (B, args.res, args.res, 3)) * 0.5
    labels = jnp.zeros((B,), jnp.int32)

    synth = jax.jit(lambda p, k: pipeline(p, masked, audio, ident, labels, k))
    t0 = time.time()
    jax.block_until_ready(synth(params, jax.random.PRNGKey(10)))
    print(f"# warmup {time.time()-t0:.1f}s", file=sys.stderr)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        jax.block_until_ready(synth(params, jax.random.PRNGKey(11)))

    report(args)


def report(args):
    res = parse_trace(args.outdir, args.top)
    if res is None:
        print("no trace written", file=sys.stderr)
        sys.exit(1)
    total, ranked = res
    print(f"total device LEAF-op time: {total/1e6:.3f} s "
          f"(parent while/jit scopes excluded; trace: "
          f"{newest_trace(args.outdir)})")
    for name, dur in ranked:
        print(f"{dur/1e6:8.3f}s  {100*dur/total:5.1f}%  {name[:110]}")
    if args.detail:
        det = detail_trace(args.outdir, args.detail, args.top)
        fam_total, leaf_total, rows = det
        print(f"\n# '{args.detail}*' by shape+layout: {fam_total/1e6:.3f} s "
              f"= {100*fam_total/max(leaf_total, 1e-9):.1f}% of leaf time")
        for key, dur, n, ex in rows:
            print(f"{dur/1e6:8.3f}s x{n:6d}  {key[:120]}")
            if ex:
                print(f"          {ex}")


if __name__ == "__main__":
    main()
