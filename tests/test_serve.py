"""Serving tests: dynamic batching, HTTP roundtrip, composite semantics."""

import io
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np
import pytest

from video_filler_tpu.checkpoint import save_checkpoint
from video_filler_tpu.config import Opt
from video_filler_tpu.serve import InpaintServer
from video_filler_tpu.train import init_train_state

TINY = dict(nef=8, ngf=8, ndf=8, nBottleneck=32, computeDtype="float32")


def _post(port: int, **arrays) -> np.ndarray:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(f"http://localhost:{port}/inpaint",
                                 data=buf.getvalue(), method="POST")
    with np.load(io.BytesIO(urllib.request.urlopen(req, timeout=60)
                            .read()), allow_pickle=False) as data:
        return data["out"]


@pytest.fixture(scope="module")
def video_server(tmp_path_factory):
    opt = Opt(predLen=2, batchSize=4, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "video")
    d = tmp_path_factory.mktemp("srv")
    path = save_checkpoint(str(d), "srv", 1, state)
    srv = InpaintServer(opt, "video", path, port=0, max_delay_ms=150.0)
    yield srv
    srv.close()


def test_serve_roundtrip_and_composite(video_server):
    srv = video_server
    rs = np.random.RandomState(0)
    ctx = rs.randint(0, 256, (128, 128, 6), np.uint8)

    # zero mask: output == input exactly (composite keeps ctx outside mask)
    out = _post(srv.port, ctx=ctx, mask=np.zeros((128, 128, 1), np.uint8))
    assert out.shape == ctx.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out, ctx)

    # no mask: raw generator output, must differ from the input
    out2 = _post(srv.port, ctx=ctx)
    assert out2.shape == ctx.shape
    assert not np.array_equal(out2, ctx)

    # mask composite: equals ctx outside, generator inside
    mask = np.zeros((128, 128, 1), np.uint8)
    mask[40:80, 40:80] = 1
    out3 = _post(srv.port, ctx=ctx, mask=mask)
    np.testing.assert_array_equal(out3[mask[..., 0] == 0],
                                  ctx[mask[..., 0] == 0])
    np.testing.assert_array_equal(out3[mask[..., 0] == 1],
                                  out2[mask[..., 0] == 1])

    # the common 0/255 PNG mask convention binarizes to the same composite
    out4 = _post(srv.port, ctx=ctx, mask=mask * 255)
    np.testing.assert_array_equal(out4, out3)


def test_serve_dynamic_batching(video_server):
    """Concurrent single-row requests aggregate into shared device batches,
    and every caller gets ITS row (position in the padded batch must not
    change the result — BN runs in eval mode)."""
    srv = video_server
    rs = np.random.RandomState(1)
    ctxs = [rs.randint(0, 256, (128, 128, 6), np.uint8) for _ in range(8)]

    solo = [_post(srv.port, ctx=c) for c in ctxs]
    b0 = srv.stats()["batches"]
    with ThreadPoolExecutor(8) as pool:
        outs = list(pool.map(lambda c: _post(srv.port, ctx=c), ctxs))
    for got, want in zip(outs, solo):
        np.testing.assert_array_equal(got, want)
    used = srv.stats()["batches"] - b0
    assert used < 8, f"no batching happened ({used} batches for 8 requests)"
    s = srv.stats()
    assert s["requests"] >= 16 and s["p95_ms"] > 0 and 0 < s["avg_fill"] <= 1


def test_serve_batched_request_and_errors(video_server):
    srv = video_server
    rs = np.random.RandomState(2)
    ctx = rs.randint(0, 256, (3, 128, 128, 6), np.uint8)
    out = _post(srv.port, ctx=ctx)
    assert out.shape == ctx.shape

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.port, ctx=rs.randint(0, 256, (64, 64, 6), np.uint8))
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.port, ctx=rs.randint(0, 256, (5, 128, 128, 6), np.uint8))
    assert e.value.code == 400  # exceeds server batch

    health = urllib.request.urlopen(
        f"http://localhost:{srv.port}/healthz", timeout=10).read()
    assert health == b"ok"


def test_serve_center_regime_composite(tmp_path):
    """center predicts the 64^2 hole; serve pastes it back into the context
    (demo.lua:73-76) and returns the full inpainted 128^2 frame — equal to
    ctx outside the hole, generated inside.  The overlapPred ring stays
    context.  Masks are rejected (the hole is fixed)."""
    opt = Opt(batchSize=2, overlapPred=4, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "center")
    path = save_checkpoint(str(tmp_path), "c", 1, state)
    srv = InpaintServer(opt, "center", path, port=0, max_delay_ms=1.0)
    try:
        rs = np.random.RandomState(0)
        ctx = rs.randint(0, 256, (128, 128, 3), np.uint8)
        out = _post(srv.port, ctx=ctx)
        assert out.shape == (128, 128, 3)
        # outside the pasted region (center 64^2 minus the 4px overlap ring):
        # untouched context
        hole = np.zeros((128, 128), bool)
        hole[32 + 4:96 - 4, 32 + 4:96 - 4] = True
        np.testing.assert_array_equal(out[~hole], ctx[~hole])
        assert not np.array_equal(out[hole], ctx[hole])  # generated pixels
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, ctx=ctx, mask=np.ones((128, 128, 1), np.uint8))
        assert e.value.code == 400
    finally:
        srv.close()


def test_serve_overload_and_expiry(tmp_path):
    """Bounded queue: a full backlog rejects at ingress (503/ServerOverloaded)
    instead of growing forever, and queue entries whose waiters already
    timed out are dropped unprocessed by the batch loop."""
    import time
    from concurrent.futures import Future

    from video_filler_tpu.serve import ServerOverloaded

    opt = Opt(predLen=2, batchSize=2, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "video")
    path = save_checkpoint(str(tmp_path), "srv2", 1, state)
    # device_thread=False and no run_forever: the queue never drains, making
    # the overload/expiry behavior deterministic.
    srv = InpaintServer(opt, "video", path, port=0, max_delay_ms=1.0,
                        device_thread=False)
    try:
        ctx = np.zeros((1, 128, 128, 6), np.uint8)
        ctx2 = np.zeros((2, 128, 128, 6), np.uint8)
        far = time.perf_counter() + 60.0
        # The backlog is bounded in ROWS, not queue entries: fill the row
        # budget the way infer() does (a 2-row request charges 2 rows).
        while srv._pending_rows + 2 <= srv._max_pending_rows:
            srv._queue.put_nowait((ctx2, None, None, Future(), far))
            with srv._stats_lock:
                srv._pending_rows += 2
        with pytest.raises(ServerOverloaded, match="queue full"):
            srv.infer(ctx2, None)
        assert srv.stats()["rejected"] == 1
        # a single-row request may still fit if exactly one row remains
        if srv._max_pending_rows - srv._pending_rows >= 1:
            srv._queue.put_nowait((ctx, None, None, Future(), far))
            with srv._stats_lock:
                srv._pending_rows += 1
        with pytest.raises(ServerOverloaded, match="queue full"):
            srv.infer(ctx, None)
        # popping an entry frees its ROW count
        before = srv._pending_rows
        got = srv._pop_live(0.5)
        assert got is not None
        assert srv._pending_rows == before - got[0].shape[0]

        # drain, then check expiry: _pop_live skips the stale entry (failing
        # its future) and returns the live one
        while not srv._queue.empty():
            srv._queue.get_nowait()
        stale_fut, live_fut = Future(), Future()
        srv._queue.put_nowait((ctx, None, None, stale_fut,
                               time.perf_counter() - 1.0))
        srv._queue.put_nowait((ctx, None, None, live_fut, far))
        got = srv._pop_live(0.5)
        assert got is not None and got[3] is live_fut
        assert isinstance(stale_fut.exception(timeout=0), TimeoutError)
        assert srv.stats()["expired"] == 1

        # a request that times out waiting surfaces as RequestTimeout (504),
        # not a bare TimeoutError (500)
        import video_filler_tpu.serve as serve_mod
        from video_filler_tpu.serve import RequestTimeout
        old_t = serve_mod.REQUEST_TIMEOUT_S
        serve_mod.REQUEST_TIMEOUT_S = 0.05
        srv._pending_rows = 0  # the raw get_nowait drain above bypassed it
        try:
            with pytest.raises(RequestTimeout):
                srv.infer(ctx, None)  # no worker drains the queue
        finally:
            serve_mod.REQUEST_TIMEOUT_S = old_t
    finally:
        srv.close()


def test_serve_carry_keeps_reservation_and_rechecks_deadline(tmp_path):
    """A request that doesn't fit the assembling batch is HELD (carry) to
    head the next batch.  While held it must keep its row reservation (the
    backlog bound counts it) and its client deadline must be RE-CHECKED
    before assembly: a carry that expired while the previous batch ran on
    the device gets a TimeoutError (504) without burning a device batch
    (round-3 advisor finding; serve.py _run_batches carry path)."""
    import time
    from concurrent.futures import Future

    opt = Opt(predLen=2, batchSize=4, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "video")
    path = save_checkpoint(str(tmp_path), "carry", 1, state)
    srv = InpaintServer(opt, "video", path, port=0, max_delay_ms=150.0)
    orig_fn = srv._serve_fn
    try:
        def slow_fn(*a):  # each device batch takes ~4s: the carry's clock
            time.sleep(4.0)
            return orig_fn(*a)

        srv._serve_fn = slow_fn

        t0 = time.perf_counter()
        fut_p, fut_a, fut_b = Future(), Future(), Future()
        ctx4 = np.zeros((4, 128, 128, 6), np.uint8)
        ctx3 = np.zeros((3, 128, 128, 6), np.uint8)
        ctx2 = np.zeros((2, 128, 128, 6), np.uint8)
        # Reserve rows the way infer() does, so accounting is end-to-end.
        with srv._stats_lock:
            srv._pending_rows += 9
        # Plug: a full batch assembles immediately and pins the worker
        # inside slow_fn, so A and B are enqueued race-free behind it.
        srv._queue.put_nowait((ctx4, None, None, fut_p, t0 + 60.0))
        time.sleep(0.5)
        # A (3 rows, live long) pops first; B (2 rows) doesn't fit 3+2>4 and
        # becomes the carry.  B is live when popped (~t0+4.2) but expires
        # (t0+6) while A's slow batch runs (t0+4.2..8.2).
        srv._queue.put_nowait((ctx3, None, None, fut_a, t0 + 60.0))
        srv._queue.put_nowait((ctx2, None, None, fut_b, t0 + 6.0))

        assert fut_p.result(timeout=30).shape == (4, 128, 128, 6)
        assert fut_a.result(timeout=30).shape == (3, 128, 128, 6)
        # The expired carry fails without a device batch: exactly the plug's
        # and A's batches ran (7 rows), and the expiry was counted.
        assert isinstance(fut_b.exception(timeout=15), TimeoutError)
        s = srv.stats()
        assert s["expired"] == 1
        assert s["batches"] == 2 and s["items"] == 7
        # The carry's reservation was released exactly once: accounting
        # returns to zero (no leak, no double-release).
        deadline = time.time() + 5
        while srv._pending_rows and time.time() < deadline:
            time.sleep(0.05)
        assert srv._pending_rows == 0
    finally:
        srv._serve_fn = orig_fn
        srv.close()


def test_serve_video3d_folded_clips(tmp_path):
    """video3d serving: the wire format stays channel-folded (same client
    code as the video regime); serve unfolds around the temporal G and
    composites inside the mask.  Parity vs a direct unfolded forward."""
    import jax.numpy as jnp

    from video_filler_tpu.eval.common import load_generator
    from video_filler_tpu.ops import image as image_ops
    from video_filler_tpu.ops.layers3d import fold_time, unfold_time

    opt = Opt(predLen=2, batchSize=2, video3dLevels=5, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "video3d")
    path = save_checkpoint(str(tmp_path), "v3", 1, state)
    srv = InpaintServer(opt, "video3d", path, port=0, max_delay_ms=1.0)
    try:
        rs = np.random.RandomState(3)
        ctx = rs.randint(0, 256, (128, 128, 6), np.uint8)
        out = _post(srv.port, ctx=ctx)  # raw folded prediction
        assert out.shape == ctx.shape and out.dtype == np.uint8

        fwd, params, bn = load_generator(opt, "video3d", path)
        x = image_ops.normalize_uint8(jnp.asarray(ctx[None]))
        y = fwd(params, bn, unfold_time(x, opt.predLen))
        want = np.asarray(image_ops.denormalize_to_uint8(
            fold_time(y).astype(jnp.float32)))[0]
        np.testing.assert_array_equal(out, want)

        # mask composite: ctx outside, temporal prediction inside
        mask = np.zeros((128, 128, 1), np.uint8)
        mask[30:70, 50:90] = 1
        out2 = _post(srv.port, ctx=ctx, mask=mask)
        np.testing.assert_array_equal(out2[mask[..., 0] == 0],
                                      ctx[mask[..., 0] == 0])
        np.testing.assert_array_equal(out2[mask[..., 0] == 1],
                                      out[mask[..., 0] == 1])
    finally:
        srv.close()


def test_serve_graceful_drain(tmp_path):
    """initiate_drain: new requests are refused (503/ServerOverloaded),
    every already-accepted request is answered, and the batch loop RETURNS
    instead of spinning — the CLI's SIGTERM handler builds on this."""
    import time
    from threading import Thread

    from video_filler_tpu.serve import ServerOverloaded

    opt = Opt(predLen=2, batchSize=2, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "video")
    path = save_checkpoint(str(tmp_path), "srv3", 1, state)
    srv = InpaintServer(opt, "video", path, port=0, max_delay_ms=1.0,
                        device_thread=False)
    try:
        ctx = np.zeros((1, 128, 128, 6), np.uint8)
        results = []
        threads = [Thread(target=lambda: results.append(srv.infer(ctx, None)))
                   for _ in range(2)]
        for th in threads:
            th.start()
        deadline = time.time() + 10
        while srv._queue.qsize() < 2 and time.time() < deadline:
            time.sleep(0.01)
        assert srv._queue.qsize() == 2
        srv.initiate_drain()
        with pytest.raises(ServerOverloaded, match="draining"):
            srv.infer(ctx, None)
        # a draining pod must drop out of balancer rotation immediately
        with pytest.raises(urllib.error.HTTPError) as he:
            urllib.request.urlopen(
                f"http://localhost:{srv.port}/healthz", timeout=10)
        assert he.value.code == 503
        t0 = time.time()
        srv._run_batches()  # answers the backlog, then returns (drained)
        assert time.time() - t0 < 30
        for th in threads:
            th.join(timeout=30)
        assert len(results) == 2
        assert all(r.shape == (1, 128, 128, 6) for r in results)
    finally:
        srv.close()


def test_serve_noisegen_generator(tmp_path):
    """noiseGen generators serve: omitted noise defaults to zeros
    (deterministic), client-supplied noise reaches the (ctx, z) join —
    parity vs a direct forward with the same z; non-noiseGen servers
    reject a noise array (400)."""
    import jax.numpy as jnp

    from video_filler_tpu.eval.common import load_generator

    opt = Opt(batchSize=2, overlapPred=4, noiseGen=True, nz=16, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "center")
    path = save_checkpoint(str(tmp_path), "ng", 1, state)
    srv = InpaintServer(opt, "center", path, port=0, max_delay_ms=1.0)
    try:
        rs = np.random.RandomState(0)
        ctx = rs.randint(0, 256, (128, 128, 3), np.uint8)
        out0 = _post(srv.port, ctx=ctx)                     # zero noise
        out0b = _post(srv.port, ctx=ctx)
        np.testing.assert_array_equal(out0, out0b)          # deterministic
        z = rs.randn(16).astype(np.float32)
        out1 = _post(srv.port, ctx=ctx, noise=z)
        assert not np.array_equal(out0, out1)               # noise reaches G

        # parity: direct forward with the same z through the paste-back
        from video_filler_tpu.ops.image import normalize_uint8
        from video_filler_tpu.ops import masks as mask_ops
        fwd, p, bn = load_generator(opt, "center", path)
        x = normalize_uint8(jnp.asarray(ctx[None]))
        pred = fwd(p, bn, (x, jnp.asarray(z).reshape(1, 1, 1, 16)))
        want = mask_ops.paste_center(x.astype(jnp.float32),
                                     pred.astype(jnp.float32), 4)
        want_u8 = np.asarray(
            jnp.clip(jnp.round((want + 1.0) * 127.5), 0, 255)
        ).astype(np.uint8)[0]
        np.testing.assert_array_equal(out1, want_u8)
    finally:
        srv.close()

    # non-noiseGen server: a noise array is a client error
    opt2 = Opt(batchSize=2, overlapPred=4, **TINY)
    state2 = init_train_state(jax.random.PRNGKey(0), opt2, "center")
    path2 = save_checkpoint(str(tmp_path), "ng2", 1, state2)
    srv2 = InpaintServer(opt2, "center", path2, port=0, max_delay_ms=1.0)
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv2.port, ctx=ctx,
                  noise=np.zeros(16, np.float32))
        assert e.value.code == 400
    finally:
        srv2.close()


def test_serve_data_parallel_mesh(tmp_path):
    """dataParallel=4 shards each padded device batch over a data:4 mesh
    (serve.py DP scale-out).  Outputs must be bit-identical to the
    single-device server for the same checkpoint, batches must land
    sharded (4 addressable shards), and batchSize % dataParallel is
    enforced loudly."""
    opt1 = Opt(predLen=2, batchSize=4, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt1, "video")
    path = save_checkpoint(str(tmp_path), "dp", 1, state)

    srv1 = InpaintServer(opt1, "video", path, port=0, max_delay_ms=1.0)
    srv4 = InpaintServer(opt1.replace(dataParallel=4), "video", path,
                         port=0, max_delay_ms=1.0)
    try:
        assert len(jax.devices()) >= 4  # conftest: 8 virtual CPU devices
        # params actually replicated over the mesh
        leaf = jax.tree_util.tree_leaves(srv4._params)[0]
        assert len(leaf.sharding.device_set) == 4
        rs = np.random.RandomState(7)
        mask = np.zeros((128, 128, 1), np.uint8)
        mask[30:90, 20:100] = 1
        for rows in (1, 3, 4):  # padded tails and a full batch
            ctx = rs.randint(0, 256, (rows, 128, 128, 6), np.uint8)
            m = np.broadcast_to(mask, (rows,) + mask.shape)
            np.testing.assert_array_equal(
                _post(srv4.port, ctx=ctx, mask=np.ascontiguousarray(m)),
                _post(srv1.port, ctx=ctx, mask=np.ascontiguousarray(m)))
        # dynamic batching composes with DP: concurrent single-row posts
        # aggregate into shared sharded batches and each caller still gets
        # ITS row
        ctxs = [rs.randint(0, 256, (128, 128, 6), np.uint8)
                for _ in range(8)]
        solo = [_post(srv4.port, ctx=c) for c in ctxs]
        with ThreadPoolExecutor(8) as pool:
            outs = list(pool.map(lambda c: _post(srv4.port, ctx=c), ctxs))
        for got, want in zip(outs, solo):
            np.testing.assert_array_equal(got, want)
    finally:
        srv1.close()
        srv4.close()

    with pytest.raises(SystemExit, match="divisible"):
        InpaintServer(opt1.replace(dataParallel=3), "video", path, port=0)

    # the temporal family serves identically under the mesh: folded-clip
    # wire format, unfold/G/fold inside the sharded jit
    opt3 = Opt(predLen=2, batchSize=4, video3dLevels=5, **TINY)
    st3 = init_train_state(jax.random.PRNGKey(0), opt3, "video3d")
    p3 = save_checkpoint(str(tmp_path), "dp3", 1, st3)
    s3a = InpaintServer(opt3, "video3d", p3, port=0, max_delay_ms=1.0)
    s3b = InpaintServer(opt3.replace(dataParallel=4), "video3d", p3,
                        port=0, max_delay_ms=1.0)
    try:
        rs = np.random.RandomState(9)
        ctx = rs.randint(0, 256, (3, 128, 128, 6), np.uint8)
        np.testing.assert_array_equal(_post(s3b.port, ctx=ctx),
                                      _post(s3a.port, ctx=ctx))
    finally:
        s3a.close()
        s3b.close()


def test_serve_malformed_request_does_not_kill_worker(tmp_path):
    """A mis-shaped direct infer() call fails fast (ValueError), and even a
    malformed item injected behind infer()'s back fails ITS future while the
    worker thread survives to serve the next request."""
    import time
    from concurrent.futures import Future

    opt = Opt(predLen=2, batchSize=2, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "video")
    path = save_checkpoint(str(tmp_path), "srv4", 1, state)
    srv = InpaintServer(opt, "video", path, port=0, max_delay_ms=1.0)
    try:
        good = np.zeros((1, 128, 128, 6), np.uint8)
        with pytest.raises(ValueError, match="ctx rows"):
            srv.infer(np.zeros((1, 64, 64, 6), np.uint8), None)
        with pytest.raises(ValueError, match="mask must"):
            srv.infer(good, np.zeros((1, 64, 64, 1), np.uint8))
        with pytest.raises(ValueError, match="noise must"):
            srv.infer(good, None, np.zeros((1, 16), np.float32))

        # inject a poison item directly (bad channel count): the batch
        # assembly raises inside the worker's try, failing only this future
        fut: Future = Future()
        srv._queue.put_nowait((np.zeros((1, 128, 128, 3), np.uint8), None,
                               None, fut, time.perf_counter() + 60))
        with pytest.raises(Exception):
            fut.result(timeout=30)
        # the worker must still be alive and serving
        out = srv.infer(good, None)
        assert out.shape == (1, 128, 128, 6)
    finally:
        srv.close()


def test_serve_rejects_float_mask_and_ctx(video_server):
    """A float [0,1] mask would be unsafe-cast into the uint8 batch buffer,
    truncating every anti-aliased pixel to 0 — a silent no-op inpaint.  Both
    the HTTP path and direct infer() must 400/raise instead."""
    srv = video_server
    rs = np.random.RandomState(3)
    ctx = rs.randint(0, 256, (128, 128, 6), np.uint8)
    fmask = np.zeros((128, 128, 1), np.float32)
    fmask[40:80, 40:80] = 0.7
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.port, ctx=ctx, mask=fmask)
    assert e.value.code == 400 and b"uint8" in e.value.read()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.port, ctx=ctx.astype(np.float32))
    assert e.value.code == 400
    with pytest.raises(ValueError, match="uint8"):
        srv.infer(ctx[None].astype(np.float32), None)
    with pytest.raises(ValueError, match="uint8"):
        srv.infer(ctx[None], fmask[None])


def test_serve_wholeim_full_frame_composite(tmp_path):
    """wholeim with frameH/frameW: the wire carries whole frames + masks;
    the server mask-fills, slices the 3x3 patch grid, runs G once, scatters
    the 2x2 predicted patches back and composites inside the mask
    (test_vid_wholeim.lua:159-220 pattern).  Outside the mask the frame is
    exact; masked pixels under 2x2 coverage are generated; masked pixels
    OUTSIDE the coverage keep the train-time fill value."""
    fh, fw = 180, 240  # steph=(180-128)//2=26, stepw=(240-128)//2=56
    opt = Opt(batchSize=2, frameH=fh, frameW=fw, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "wholeim")
    path = save_checkpoint(str(tmp_path), "wi", 1, state)
    srv = InpaintServer(opt, "wholeim", path, port=0, max_delay_ms=1.0)
    try:
        rs = np.random.RandomState(0)
        frame = rs.randint(0, 256, (fh, fw, 3), np.uint8)
        mask = np.zeros((fh, fw, 1), np.uint8)
        mask[30:60, 40:80] = 1      # inside the 2x2 coverage (154 x 184)
        mask[170:178, 200:230] = 1  # outside it (row 170 > 26+128)
        out = _post(srv.port, ctx=frame, mask=mask)
        assert out.shape == frame.shape and out.dtype == np.uint8

        m = mask[..., 0].astype(bool)
        np.testing.assert_array_equal(out[~m], frame[~m])  # exact outside
        assert not np.array_equal(out[30:60, 40:80], frame[30:60, 40:80])
        # masked-but-uncovered pixels: the fill value the model trained on
        fill = int(round(opt.maskValue * 255.0))
        assert np.abs(out[170:178, 200:230].astype(int) - fill).max() <= 1

        # a mask is REQUIRED in full-frame mode (the implicit all-ones
        # default would mask-fill the whole frame)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, ctx=frame)
        assert e.value.code == 400 and b"mask" in e.value.read()
    finally:
        srv.close()


def test_serve_wholeim_patch_mode_still_raw(tmp_path):
    """Without frameH/frameW the wholeim server keeps the raw wire format:
    27-channel patch arrays in, 12-channel G output back, masks rejected."""
    opt = Opt(batchSize=2, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "wholeim")
    path = save_checkpoint(str(tmp_path), "wip", 1, state)
    srv = InpaintServer(opt, "wholeim", path, port=0, max_delay_ms=1.0)
    try:
        rs = np.random.RandomState(1)
        ctx = rs.randint(0, 256, (128, 128, 27), np.uint8)
        out = _post(srv.port, ctx=ctx)
        assert out.shape == (128, 128, 12) and out.dtype == np.uint8
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, ctx=ctx, mask=np.ones((128, 128, 1), np.uint8))
        assert e.value.code == 400
    finally:
        srv.close()


def test_serve_video_full_frame_tiled(tmp_path):
    """video with frameH/frameW: the reference's FLAGSHIP inference
    (test_vid_wholeim.lua:159-220) served — mask-fill, pad to fineSize
    multiples with -1, vflip-top-tiles trick, one batched G forward,
    mask-only composite.  Pinned against the OFFLINE tiling path
    (eval/tiling gather/scatter around the same generator) on the same
    frame, and exact outside the mask."""
    fh, fw = 180, 240   # pads to 256x256 -> 2x2 tiles, both top tiles
    opt = Opt(predLen=2, batchSize=2, frameH=fh, frameW=fw, **TINY)
    state = init_train_state(jax.random.PRNGKey(0), opt, "video")
    path = save_checkpoint(str(tmp_path), "vf", 1, state)
    srv = InpaintServer(opt, "video", path, port=0, max_delay_ms=1.0)
    try:
        rs = np.random.RandomState(0)
        frame = rs.randint(0, 256, (fh, fw, 6), np.uint8)
        mask = np.zeros((fh, fw, 1), np.uint8)
        mask[20:70, 30:90] = 1
        out = _post(srv.port, ctx=frame, mask=mask)
        assert out.shape == frame.shape and out.dtype == np.uint8
        m3 = np.broadcast_to(mask.astype(bool), frame.shape)
        np.testing.assert_array_equal(out[~m3], frame[~m3])
        assert not np.array_equal(out[m3], frame[m3])

        # a mask is REQUIRED in full-frame mode
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, ctx=frame)
        assert e.value.code == 400 and b"mask" in e.value.read()

        # offline replica through eval/tiling + the same checkpoint
        import jax.numpy as jnp
        from video_filler_tpu.eval.common import load_generator
        from video_filler_tpu.eval.tiling import gather_tiles, scatter_tiles
        from video_filler_tpu.ops import image as image_ops
        from video_filler_tpu.ops import masks as mask_ops
        fwd, p, bn = load_generator(opt, "video", path)
        x = image_ops.normalize_uint8(jnp.asarray(frame))
        xm = np.asarray(mask_ops.apply_logo_mask(
            x, jnp.asarray(mask) > 0, opt.maskValue))
        xp = np.full((256, 256, 6), -1.0, np.float32)
        xp[:fh, :fw] = xm
        mp = np.zeros((256, 256, 1), np.uint8)
        mp[:fh, :fw] = mask
        tiles = np.stack(gather_tiles(xp, 128))
        pred = np.asarray(fwd(p, bn, jnp.asarray(tiles)), np.float32)
        pf = scatter_tiles(pred, 128, 256, 256)
        exp = np.where(mp > 0, pf, xp)
        exp_u8 = np.asarray(image_ops.denormalize_to_uint8(
            jnp.asarray(exp[:fh, :fw])))
        # same math, differently-fused XLA programs: allow 1 uint8 step
        assert np.abs(out.astype(int) - exp_u8.astype(int)).max() <= 1
    finally:
        srv.close()


def test_serve_video_full_frame_with_init_cascade(tmp_path):
    """withInit=1 initName=...: the netI initializer runs ahead of G on
    every tile and its output is composited into the masked pixels
    (test_vid_wholeim.lua:178-190) — the served result must differ from
    the no-cascade serve inside the mask and stay exact outside."""
    fh, fw = 180, 240
    opt = Opt(predLen=2, batchSize=2, frameH=fh, frameW=fw, **TINY)
    g_state = init_train_state(jax.random.PRNGKey(0), opt, "video")
    i_state = init_train_state(jax.random.PRNGKey(9), opt, "video")
    # A freshly-initialized tiny G attenuates every input to tanh(~0) =
    # uint8 128, which would make the cascade's effect invisible at the
    # wire — scale the weights so outputs depend measurably on inputs.
    scale = lambda s: s._replace(  # noqa: E731
        params_g=jax.tree.map(lambda a: a * 8.0, s.params_g))
    g_path = save_checkpoint(str(tmp_path), "g", 1, scale(g_state))
    i_path = save_checkpoint(str(tmp_path), "i", 1, scale(i_state))
    rs = np.random.RandomState(3)
    frame = rs.randint(0, 256, (fh, fw, 6), np.uint8)
    mask = np.zeros((fh, fw, 1), np.uint8)
    mask[20:70, 30:90] = 1

    srv = InpaintServer(opt, "video", g_path, port=0, max_delay_ms=1.0)
    try:
        base = _post(srv.port, ctx=frame, mask=mask)
    finally:
        srv.close()
    srv2 = InpaintServer(opt.replace(withInit=True, initName=i_path),
                         "video", g_path, port=0, max_delay_ms=1.0)
    try:
        casc = _post(srv2.port, ctx=frame, mask=mask)
    finally:
        srv2.close()
    m3 = np.broadcast_to(mask.astype(bool), frame.shape)
    np.testing.assert_array_equal(casc[~m3], frame[~m3])
    assert not np.array_equal(casc[m3], base[m3])
