"""Online serving front end: micro-batcher semantics + HTTP parity.

The served frames must be exactly what the compiled pipeline produces for
the same (inputs, batch arrangement, batch_key) — serving adds batching and
transport, never numerics. Batching itself is locked: ragged groups pad by
repeating the last row, padded rows never reach a client, concurrent
requests coalesce into one device dispatch.
"""
import io
import os
import sys
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(__file__))
from test_ldm import TINY_MEAD_CFG

from dsml_thesis_tpu.config import build_model
from dsml_thesis_tpu.diffusion import make_ddim_schedule, make_video_pipeline
from dsml_thesis_tpu.server import (
    MicroBatcher,
    PipelineServer,
    batch_key,
    make_pipeline_runner,
)

B, F, W, SIZE, ADIM = 2, 3, 2, 16, 32
ASEQ = F + W


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def _clip(rng: np.random.RandomState):
    return {
        "masked_frames": rng.randn(F, SIZE, SIZE, 3).astype(np.float32) * 0.3,
        "audio": rng.randn(ASEQ, ADIM).astype(np.float32),
        "identity": rng.randn(SIZE, SIZE, 3).astype(np.float32) * 0.3,
        "class_label": np.int32(3),
    }


# ---------------------------------------------------------------------------
# MicroBatcher unit behavior (no device, fake run_batch)
# ---------------------------------------------------------------------------

def test_microbatcher_pads_ragged_and_coalesces():
    seen = []

    def run_batch(stacked, batch_index):
        seen.append((batch_index, {k: v.shape for k, v in stacked.items()}))
        # identify rows by their content so per-request routing is checkable
        return stacked["x"] * 10.0

    mb = MicroBatcher(run_batch, batch_size=3, max_wait_ms=300.0)
    try:
        results = [None, None]

        def worker(i, val):
            results[i] = mb.submit({"x": np.full((2,), val, np.float32)})

        ts = [threading.Thread(target=worker, args=(i, float(i + 1)))
              for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # both coalesced into ONE padded batch of 3
        assert len(seen) == 1
        assert seen[0][1]["x"] == (3, 2)
        np.testing.assert_array_equal(results[0], np.full((2,), 10.0))
        np.testing.assert_array_equal(results[1], np.full((2,), 20.0))
        # a lone follow-up request forms its own (padded) batch
        out = mb.submit({"x": np.full((2,), 5.0, np.float32)})
        np.testing.assert_array_equal(out, np.full((2,), 50.0))
        s = mb.stats()
        assert s["requests"] == 3 and s["batches"] == 2
        assert s["mean_occupancy"] == pytest.approx(3 / 6)
    finally:
        mb.shutdown()


def test_microbatcher_propagates_errors_per_request():
    def run_batch(stacked, batch_index):
        raise RuntimeError("device fell over")

    mb = MicroBatcher(run_batch, batch_size=2, max_wait_ms=10.0)
    try:
        with pytest.raises(RuntimeError, match="device fell over"):
            mb.submit({"x": np.zeros((1,), np.float32)})
    finally:
        mb.shutdown()


# ---------------------------------------------------------------------------
# HTTP server over the real tiny pipeline
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def served():
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    init_batch = {
        "image": jnp.zeros((B, SIZE, SIZE, 3)),
        "masked_image": jnp.zeros((B, SIZE, SIZE, 3)),
        "identity": jnp.zeros((B, SIZE, SIZE, 3)),
        "class_label": jnp.array([1, 5]),
        "audio": jnp.zeros((B, ASEQ, ADIM)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), init_batch)
    ddim = make_ddim_schedule(ldm.schedule, 4, eta=0.0)
    pipeline = jax.jit(make_video_pipeline(ldm, ddim, W, guidance_scale=2.0))

    batcher = MicroBatcher(make_pipeline_runner(pipeline, params, seed=11),
                           batch_size=B, max_wait_ms=1500.0)
    server = PipelineServer(batcher, clip_shapes={
        "masked_frames": (F, SIZE, SIZE, 3),
        "audio": (ASEQ, ADIM),
        "identity": (SIZE, SIZE, 3),
        "class_label": (),
    })
    port = server.start(port=0)
    yield server, f"http://127.0.0.1:{port}", pipeline, params
    server.stop()


def test_health_and_routes(served):
    _, base, _, _ = served
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        h = yaml.safe_load(r.read())
    assert h["status"] == "ok" and h["batch_size"] == B
    assert h["tier"]["masked_frames"] == [F, SIZE, SIZE, 3]
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert ei.value.code == 404


def test_single_request_matches_direct_pipeline(served):
    server, base, pipeline, params = served
    clip = _clip(np.random.RandomState(0))
    before = server.batcher.stats()["batches"]

    status, body = _post(base + "/synthesize", _npz_bytes(**clip))
    assert status == 200
    got = np.load(io.BytesIO(body))["frames"]
    assert got.shape == (F, SIZE, SIZE, 3)

    # a lone request pads the tier by repeating its row: [clip, clip]; the
    # response is row 0 under this batch's deterministic key
    idx = before  # batch indices are sequential from 0
    direct = pipeline(
        params,
        jnp.stack([clip["masked_frames"]] * B),
        jnp.stack([clip["audio"]] * B),
        jnp.stack([clip["identity"]] * B),
        jnp.full((B,), clip["class_label"], jnp.int32),
        batch_key(11, idx),
    )
    np.testing.assert_allclose(got, np.asarray(direct)[0], atol=1e-5,
                               rtol=1e-5)


def test_concurrent_requests_share_one_batch(served):
    server, base, pipeline, params = served
    a, b = _clip(np.random.RandomState(1)), _clip(np.random.RandomState(2))
    before = server.batcher.stats()["batches"]

    out = {}

    def post(name, clip):
        out[name] = _post(base + "/synthesize", _npz_bytes(**clip))

    ts = [threading.Thread(target=post, args=("a", a)),
          threading.Thread(target=post, args=("b", b))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert out["a"][0] == 200 and out["b"][0] == 200
    assert server.batcher.stats()["batches"] == before + 1  # coalesced

    got_a = np.load(io.BytesIO(out["a"][1]))["frames"]
    got_b = np.load(io.BytesIO(out["b"][1]))["frames"]

    def run(first, second):
        return np.asarray(pipeline(
            params,
            jnp.stack([first["masked_frames"], second["masked_frames"]]),
            jnp.stack([first["audio"], second["audio"]]),
            jnp.stack([first["identity"], second["identity"]]),
            jnp.array([first["class_label"], second["class_label"]],
                      jnp.int32),
            batch_key(11, before),
        ))

    ab, ba = run(a, b), run(b, a)
    ok_ab = (np.allclose(got_a, ab[0], atol=1e-5)
             and np.allclose(got_b, ab[1], atol=1e-5))
    ok_ba = (np.allclose(got_a, ba[1], atol=1e-5)
             and np.allclose(got_b, ba[0], atol=1e-5))
    assert ok_ab or ok_ba  # exact rows for whichever arrival order happened


def test_mesh_data_parallel_serving_matches_unsharded(served):
    """--mesh serving: the 8-device data-parallel runner is numerics-equal
    to the single-device pipeline for the same batch arrangement + key."""
    _, _, pipeline, params = served
    from dsml_thesis_tpu.parallel import make_mesh

    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    runner = make_pipeline_runner(pipeline, params, seed=5, mesh=mesh)
    clip = _clip(np.random.RandomState(4))
    stacked = {k: np.stack([v] * n_dev) for k, v in clip.items()}
    out = np.asarray(runner(stacked, 0))

    direct = pipeline(
        params,
        jnp.asarray(stacked["masked_frames"]),
        jnp.asarray(stacked["audio"]),
        jnp.asarray(stacked["identity"]),
        jnp.asarray(stacked["class_label"], jnp.int32),
        batch_key(5, 0),
    )
    assert out.shape == (n_dev, F, SIZE, SIZE, 3)
    np.testing.assert_allclose(out, np.asarray(direct), atol=2e-4, rtol=1e-3)

    # a tier that can't divide over the data axis is a clear error
    bad = {k: np.stack([v] * (n_dev + 1)) for k, v in clip.items()}
    with pytest.raises(ValueError, match="does not divide"):
        runner(bad, 1)


def test_shape_and_field_validation(served):
    _, base, _, _ = served
    clip = _clip(np.random.RandomState(3))
    bad = dict(clip, audio=np.zeros((ASEQ + 1, ADIM), np.float32))
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/synthesize", _npz_bytes(**bad))
    assert ei.value.code == 400
    assert "compiled tier requires" in ei.value.read().decode()

    missing = {k: v for k, v in clip.items() if k != "identity"}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/synthesize", _npz_bytes(**missing))
    assert ei.value.code == 400


def test_malformed_npz_body_is_400(served):
    """A truncated/corrupt npz is the CLIENT's fault: 400, never 500 (the
    raw zipfile.BadZipFile is not a ValueError and used to fall through)."""
    _, base, _, _ = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/synthesize", b"definitely not a zip archive")
    assert ei.value.code == 400
    assert "not a readable npz" in ei.value.read().decode()


def test_submit_after_shutdown_raises():
    mb = MicroBatcher(lambda s, i: s["x"], batch_size=1, max_wait_ms=5.0)
    mb.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        mb.submit({"x": np.zeros((1,), np.float32)})


def test_timed_out_request_is_cancelled_not_dispatched():
    """A submitter that times out CANCELS its pending row: the worker must
    drop it at collect time instead of dispatching a device batch whose
    answer nobody reads (overload shedding), and the batcher must stay
    healthy for later requests."""
    ran = []

    def run_batch(stacked, i):
        ran.append(float(stacked["x"][0, 0]))
        time.sleep(0.4)
        return stacked["x"] * 10.0

    mb = MicroBatcher(run_batch, batch_size=1, max_wait_ms=1.0)
    try:
        t = threading.Thread(
            target=lambda: mb.submit({"x": np.full((1,), 1.0, np.float32)}))
        t.start()
        time.sleep(0.1)  # batch [1.0] is now in flight on the worker
        with pytest.raises(TimeoutError):
            mb.submit({"x": np.full((1,), 2.0, np.float32)}, timeout=0.05)
        t.join()
        out = mb.submit({"x": np.full((1,), 3.0, np.float32)}, timeout=10.0)
        np.testing.assert_array_equal(out, np.full((1,), 30.0))
        assert 2.0 not in ran  # the cancelled row never reached the device
        assert mb.stats()["cancelled"] == 1
    finally:
        mb.shutdown()


def test_queue_cap_sheds_load_with_overloaded():
    from dsml_thesis_tpu.server import Overloaded

    release = threading.Event()
    entered = threading.Event()

    def run_batch(stacked, i):
        entered.set()
        release.wait(5.0)
        return stacked["x"]

    mb = MicroBatcher(run_batch, batch_size=1, max_wait_ms=1.0, max_queue=1)
    try:
        ts = [threading.Thread(
            target=lambda: mb.submit({"x": np.zeros((1,), np.float32)},
                                     timeout=10.0), daemon=True)
            for _ in range(2)]
        ts[0].start()
        # wait until the worker has DEQUEUED the first request (blocked in
        # run_batch) before submitting the second — starting both at once
        # races the worker's dequeue and the second submit itself can shed
        assert entered.wait(5.0)
        ts[1].start()
        # worker holds one batch (blocked in run_batch), one request queued:
        # admission is at the cap, the next submit must shed immediately
        deadline = time.monotonic() + 5.0
        while mb._q.qsize() < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        with pytest.raises(Overloaded, match="retry later"):
            mb.submit({"x": np.zeros((1,), np.float32)})
        assert mb.stats()["shed"] == 1
    finally:
        release.set()
        for t in ts:
            t.join(timeout=5.0)
        mb.shutdown()


def test_mismatched_inputs_fail_batch_not_worker():
    """Two direct-API requests with mismatched keys/shapes must fail THAT
    group only: batch assembly (np.stack over shared keys) runs inside the
    worker's try, so the dispatcher thread survives and later well-formed
    requests still complete (it used to die, hanging every future submit
    while /healthz kept reporting ok)."""
    mb = MicroBatcher(lambda s, i: s["x"] * 2.0, batch_size=2,
                      max_wait_ms=200.0)
    try:
        errs, outs = [], []

        def client(inputs):
            try:
                outs.append(mb.submit(inputs, timeout=10.0))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=client, args=(inp,)) for inp in (
            {"x": np.zeros((3,), np.float32)},
            {"y": np.zeros((3,), np.float32)},  # wrong key -> KeyError
        )]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=10.0)
        assert len(errs) == 2 and not outs
        assert mb._worker.is_alive()
        out = mb.submit({"x": np.full((3,), 1.0, np.float32)}, timeout=10.0)
        np.testing.assert_array_equal(out, np.full((3,), 2.0))
    finally:
        mb.shutdown()


def test_shutdown_race_after_put_returns_completed_result():
    """If shutdown sets _stop between submit's put and its post-put check
    while the worker has already collected the request, the computed result
    must win — the old check blindly wrote p.error and the client got a 500
    for a synthesis that completed."""
    mb = MicroBatcher(lambda s, i: s["x"] + 1.0, batch_size=1,
                      max_wait_ms=5.0)
    try:
        time.sleep(0.3)  # let the worker block inside queue.get
        orig_put = mb._q.put

        def put_then_stop(p, *a, **kw):
            orig_put(p, *a, **kw)
            mb._stop.set()  # the worker (blocked in get) still collects p

        mb._q.put = put_then_stop
        out = mb.submit({"x": np.zeros((2,), np.float32)}, timeout=10.0)
        np.testing.assert_array_equal(out, np.ones((2,)))
    finally:
        mb._q.put = orig_put
        mb.shutdown()


def test_pipeline_server_rejects_incomplete_clip_shapes():
    """A clip_shapes map missing a required field is a server CONFIG bug —
    it must fail at construction, not surface per-request as a KeyError
    that the old 400 net blamed on the client."""
    mb = MicroBatcher(lambda s, i: s["masked_frames"], batch_size=1,
                      max_wait_ms=5.0)
    try:
        with pytest.raises(ValueError, match="identity"):
            PipelineServer(mb, clip_shapes={
                "masked_frames": (F, SIZE, SIZE, 3),
                "audio": (ASEQ, ADIM),
                "class_label": (),
            })
    finally:
        mb.shutdown()


def _tiny_http_server(run_batch, **server_kw):
    mb = MicroBatcher(run_batch, batch_size=1, max_wait_ms=5.0)
    server = PipelineServer(mb, clip_shapes={
        "masked_frames": (F, SIZE, SIZE, 3),
        "audio": (ASEQ, ADIM),
        "identity": (SIZE, SIZE, 3),
        "class_label": (),
    }, **server_kw)
    port = server.start(port=0)
    return server, f"http://127.0.0.1:{port}"


def test_server_side_valueerror_is_500_not_400():
    """run_batch failures that happen to raise ValueError (a drifted params
    tree rejected by Exported.call, a mesh-divisibility error) are SERVER
    faults: the client's tier-valid upload must get a 500 (retryable), not a
    400 blaming its request."""
    server, base = _tiny_http_server(
        lambda s, i: (_ for _ in ()).throw(
            ValueError("params tree drifted from the exported artifact")))
    try:
        clip = _clip(np.random.RandomState(7))
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/synthesize", _npz_bytes(**clip))
        assert ei.value.code == 500
        assert "drifted" in ei.value.read().decode()
    finally:
        server.stop()


def test_content_length_abuse_rejected():
    """A negative Content-Length must be rejected up front (rfile.read(-1)
    blocks until an EOF that never comes under keep-alive — one leaked
    handler thread per request), and a declared length over max_body_bytes
    is a 413 WITHOUT reading the body into memory."""
    import http.client

    server, base = _tiny_http_server(lambda s, i: s["masked_frames"],
                                     max_body_bytes=1024)
    host = base[len("http://"):]
    try:
        for raw_len, want in (("-1", 400), ("2048", 413), ("junk", 400)):
            conn = http.client.HTTPConnection(host, timeout=10)
            try:
                conn.putrequest("POST", "/synthesize")
                conn.putheader("Content-Length", raw_len)
                conn.endheaders()
                # no body sent: the server must answer from the header alone
                resp = conn.getresponse()
                assert resp.status == want, (raw_len, resp.status)
                resp.read()
            finally:
                conn.close()
        # server still healthy afterwards
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert yaml.safe_load(r.read())["status"] == "ok"
    finally:
        server.stop()
