"""Production inference serving — dynamic-batching inpainting server.

The reference has no serving story at all: its evals (test.lua, test_vid.lua,
test_vid_wholeim.lua) are one-shot batch scripts.  This module serves a
trained generator over HTTP with TPU-shaped batching:

* **Dynamic batching**: concurrent requests are aggregated into the jitted
  fixed-batch forward (padding the tail) — single-image requests still ride
  a full MXU-efficient batch when load is high, and at most ``max_delay_ms``
  of artificial latency is added when it is not.
* **uint8 at the boundary**: requests/responses carry uint8 pixels;
  normalize/denormalize (and the mask composite) are fused into the jitted
  forward, so host<->device transfers are 4x smaller than f32 (the measured
  bottleneck over a remote-TPU link, BASELINE.md).
* **One device client**: all compute funnels through one worker thread — the
  HTTP pool never contends for the device (concurrent dispatch is the
  measured 1.5x step-time inflation in CLAUDE.md).
* **Scale-out over ICI**: ``dataParallel=N`` shards each padded device batch
  across a ('data','model') mesh of N chips — the replicated generator runs
  SPMD under one jit, so a TPU-VM pod serves N-chip batches with the same
  single-client loop (no per-chip processes; XLA owns the collective-free
  row split).  Off by default: serving never silently changes placement
  under a multi-device ``jax.devices()``.

API (all numpy .npz bodies):
  POST /inpaint   {"ctx": (H,W,C) or (B,H,W,C) uint8 masked context,
                   optional "mask": (H,W,1) or (B,H,W,1) uint8 {0,1},
                   optional "noise": (nz,) / (1,1,nz) / (B,1,1,nz) f32 for
                   noiseGen generators (omitted -> zeros: deterministic)}
                  -> {"out": same-shape uint8; inside mask = generated,
                      outside = ctx (absent mask = full G output).
                      center regime: the predicted 64^2 hole is pasted back
                      into ctx (demo.lua:73-76 semantics, overlapPred ring
                      kept from the context) — no mask input needed.
                      video3d: ctx/out are channel-folded clips
                      (S, S, nc*predLen), same wire format as video; the
                      temporal G runs on the unfolded (T, S, S, nc) clip.
                      wholeim with frameH/frameW set: ctx = WHOLE frames
                      (frameH, frameW, nc) + required mask — the server
                      mask-fills, slices the 3x3 patch grid, runs G once,
                      scatters the 2x2 predicted patches back (overlaps
                      averaged) and composites inside the mask
                      (test_vid_wholeim.lua:159-220 pattern); without
                      frameH/frameW wholeim serves raw 27ch->12ch patch
                      arrays.
                      video with frameH/frameW set (the reference's
                      FLAGSHIP inference, test_vid_wholeim.lua:159-220):
                      ctx = predLen channel-folded WHOLE frames
                      (frameH, frameW, nc*predLen) + required mask — the
                      server mask-fills, pads to fineSize multiples, tiles
                      with the vflip-top-tiles trick, optionally cascades
                      the netI initializer (withInit=1 initName=...), runs
                      ONE batched G forward over every tile, scatters back
                      and composites inside the mask only}
  GET  /stats     {"requests", "items", "batches", "expired", "rejected",
                   "avg_fill", "p50_ms", "p95_ms"}
  GET  /healthz   200 "ok"

Overload behavior: the backlog is bounded in ROWS (4 device batches'
worth, so multi-row requests count their size, not one queue slot); over
budget rejects immediately with 503 instead of growing without limit,
requests whose waiters have already hit the client timeout are dropped
unprocessed — the device never burns a batch on abandoned work — and a
request that times out waiting (queued or in flight) returns 504.
Shutdown is graceful: SIGTERM (pod preemption / rollout) drains — new
requests get 503, every accepted request is answered, then the process
exits cleanly.

CLI:
    python -m video_filler_tpu.serve regime=video net=checkpoints/..._state.npz \
        predLen=4 batchSize=64 display_port=8100 [serveMaxDelayMs=5] \
        [dataParallel=4]

The model config (predLen, nBottleneck, fineSize, ...) must match the
checkpoint, exactly as in every eval CLI.
"""

from __future__ import annotations

import io
import json
import os
import queue
import sys
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FutureTimeoutError
from http.server import ThreadingHTTPServer

from video_filler_tpu.utils.httpbase import QuietHandler

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt, from_args
from video_filler_tpu.eval.common import load_generator
from video_filler_tpu.models import specs_for_regime

REQUEST_TIMEOUT_S = 60.0  # client wait bound; queue entries older than this
                          # are dropped unprocessed (their waiter is gone)


class ServerOverloaded(RuntimeError):
    """Request queue full — reject now (HTTP 503) rather than queue forever."""


class RequestTimeout(RuntimeError):
    """Request expired before its batch completed — HTTP 504."""


class InpaintServer:
    """Dynamic-batching HTTP server around one jitted generator forward."""

    def __init__(self, opt: Opt, regime: str, net_path: str,
                 host: str = "localhost", port: int = 0,
                 max_delay_ms: float = 5.0, device_thread: bool = True):
        self.batch = int(opt.batchSize)
        self.fs = int(opt.fineSize)
        self.noise_gen = bool(opt.noiseGen)
        self.nz = int(opt.nz)
        self.video3d = regime == "video3d"
        if self.noise_gen and self.video3d:
            raise SystemExit("noiseGen is a 2D-generator join "
                             "(train.lua:109-124); the 3D family has none")
        if self.video3d:
            # Same wire format as the video regime — channel-folded uint8
            # clips (B, S, S, nc*predLen); serve unfolds to (B, T, S, S, nc)
            # around the temporal G and folds the prediction back.
            from video_filler_tpu.models import video3d_fine_size
            self.fs = video3d_fine_size(opt)
            self.nc_in = opt.nc * opt.predLen
            self.composable = True
        else:
            gspec, _ = specs_for_regime(opt, regime)
            self.nc_in = gspec.nc_in
            # Composite-inside-mask needs output == input geometry (video/
            # logo: 128^2 -> 128^2 same channels).  center predicts the 64^2
            # hole, which pastes back into a fixed region of ctx
            # (demo.lua:73-76) — full inpainted frame out, no mask input.
            # wholeim predicts different channels — it serves the raw G
            # output.
            self.composable = (gspec.nc_in == gspec.nc_out
                               and gspec.out_size == self.fs)
        self.center_paste = regime == "center"
        # wholeim full-frame mode (frameH/frameW set): the wire carries whole
        # frames + masks; the server does the 3x3 slice -> G -> 2x2 composite
        # (the geometry donkey_wholeim.lua:152-211 applies at train time,
        # test_vid_wholeim.lua:159-220's tiling+mask-composite pattern).
        # Without frameH/frameW the wholeim server keeps serving raw
        # 27-channel patch arrays -> 12-channel G output.
        self.wholeim_frame = regime == "wholeim" and \
            (opt.frameH > 0 or opt.frameW > 0)
        # video full-frame mode (round 5, VERDICT r4 item 3): the
        # reference's FLAGSHIP inference (test_vid_wholeim.lua:159-220) —
        # the video G tiled over a fineSize-padded whole frame with the
        # vflip-top-tiles trick, optional netI initializer cascade, and the
        # mask-only composite — served over the same uint8 wire as the
        # wholeim frame mode: ctx = predLen channel-folded WHOLE frames
        # (frameH, frameW, nc*predLen) + required mask.  Until round 5
        # this path existed only offline (eval/wholeim.py, eval/stream.py).
        self.video_frame = regime == "video" and \
            (opt.frameH > 0 or opt.frameW > 0)
        self.in_h = self.in_w = self.fs
        self.in_c = self.nc_in
        if self.wholeim_frame or self.video_frame:
            if opt.frameH < self.fs or opt.frameW < self.fs:
                raise SystemExit(
                    f"frameH/frameW must both be >= fineSize {self.fs} "
                    f"(got {opt.frameH}x{opt.frameW}) — the patch grid "
                    "must fit the frame")
        if self.wholeim_frame:
            if opt.predLen != 1:
                raise SystemExit(
                    "wholeim full-frame serving needs predLen=1 "
                    "(dataset_wholeim.lua:402 asserts length==1)")
            self.in_h, self.in_w, self.in_c = opt.frameH, opt.frameW, opt.nc
        if self.video_frame:
            if self.noise_gen:
                raise SystemExit("video full-frame serving does not "
                                 "compose with noiseGen")
            self.in_h, self.in_w = opt.frameH, opt.frameW
            self.in_c = opt.nc * opt.predLen
            self.composable = False    # the frame fn owns its composite
        self.max_delay = max_delay_ms / 1000.0
        _, self._params, self._bn = load_generator(opt, regime, net_path)
        from video_filler_tpu.models import build_for_regime
        gen = build_for_regime(opt, regime)[0]
        composable, center_paste = self.composable, self.center_paste
        video3d, pred_len = self.video3d, opt.predLen
        overlap, noise_gen = opt.overlapPred, self.noise_gen
        wholeim_frame, video_frame = self.wholeim_frame, self.video_frame
        fs, nc = self.fs, opt.nc
        arrh, arrw, outh, outw = (opt.array_h, opt.array_w,
                                  opt.out_h, opt.out_w)
        mask_value = opt.maskValue

        from video_filler_tpu.ops import image as image_ops
        from video_filler_tpu.ops import masks as mask_ops
        from video_filler_tpu.ops.layers3d import fold_time, unfold_time

        # netI initializer cascade for video full-frame serving
        # (test_vid_wholeim.lua:178-190): a second generator checkpoint run
        # ahead of G, its output composited into the masked pixels of each
        # tile.  Loaded as jit ARGUMENTS (device handles), never closure
        # constants — a baked-in net would bloat the executable.
        use_init = self.video_frame and bool(opt.withInit and opt.initName)
        self._extra_args = ()
        if use_init:
            _, p_i, bn_i = load_generator(opt, regime, opt.initName)
            self._extra_args = (p_i, bn_i)

        if self.video_frame:
            import math as _math
            from video_filler_tpu.eval.tiling import VFLIP_TOP_TILES
            fh, fw = opt.frameH, opt.frameW
            oph = _math.ceil(fh / fs) * fs
            opw = _math.ceil(fw / fs) * fs
            n_th, n_tw = oph // fs, opw // fs

            def _gather(x):
                """(B, oph, opw, C) -> (B*nT, fs, fs, C) row-major tiles,
                the leftmost VFLIP_TOP_TILES of the top row vertically
                flipped (eval/tiling.gather_tiles, batched in-jit)."""
                tiles = []
                for th in range(n_th):
                    for tw in range(n_tw):
                        t = x[:, th * fs:(th + 1) * fs,
                              tw * fs:(tw + 1) * fs]
                        if th == 0 and tw < VFLIP_TOP_TILES:
                            t = t[:, ::-1]
                        tiles.append(t)
                t = jnp.stack(tiles, axis=1)
                return t.reshape((-1,) + t.shape[2:])

            def _scatter(y, b):
                """Inverse of _gather (un-flip the trick tiles)."""
                y = y.reshape((b, n_th * n_tw) + y.shape[1:])
                rows, i = [], 0
                for th in range(n_th):
                    cols = []
                    for tw in range(n_tw):
                        t = y[:, i]
                        if th == 0 and tw < VFLIP_TOP_TILES:
                            t = t[:, ::-1]
                        cols.append(t)
                        i += 1
                    rows.append(jnp.concatenate(cols, axis=2))
                return jnp.concatenate(rows, axis=1)

            def video_frame_fn(params, bn_state, frame_u8, mask_u8,
                               *init_nets):
                """(B, frameH, frameW, nc*predLen) folded frames + mask ->
                composited inpaint: mask-fill, pad bottom-right to fineSize
                multiples with -1 (the reference normalizes after writing
                into a zero canvas, test_vid_wholeim.lua:139-141), tile
                with the vflip trick, optional netI cascade, one batched G
                forward, scatter back, composite ONLY inside the mask
                (test_vid_wholeim.lua:159-220)."""
                b = frame_u8.shape[0]
                x = image_ops.normalize_uint8(frame_u8)
                m = mask_u8 > 0
                xm = mask_ops.apply_logo_mask(x, m, mask_value)
                pad = ((0, 0), (0, oph - fh), (0, opw - fw), (0, 0))
                xp = jnp.pad(xm, pad, constant_values=-1.0)
                mp_ = jnp.pad(m, pad)           # pad region: not inpainted
                tiles = _gather(xp)
                if init_nets:
                    tmask = _gather(mp_)
                    mid, _ = gen.apply(init_nets[0], init_nets[1], tiles,
                                       train=False)
                    tiles = mask_ops.fill_in(tiles, tmask, mid)
                pred, _ = gen.apply(params, bn_state, tiles, train=False)
                frames_out = _scatter(pred.astype(jnp.float32), b)
                out = jnp.where(mp_, frames_out, xp)
                return image_ops.denormalize_to_uint8(out[:, :fh, :fw])

        def wholeim_frame_fn(params, bn_state, frame_u8, mask_u8):
            """(B, frameH, frameW, nc) frame + mask -> composited inpaint:
            mask-fill (donkey_wholeim.lua:161-164), slice the arrh x arrw
            patch grid into channels (:195-211), one G forward, scatter the
            out_h x out_w predicted patches back (overlaps averaged), and
            composite into the frame ONLY inside the mask
            (test_vid_wholeim.lua:207-220 semantics)."""
            x = image_ops.normalize_uint8(frame_u8)
            m = mask_u8 > 0
            xm = mask_ops.apply_logo_mask(x, m, mask_value)
            h, w = x.shape[1], x.shape[2]
            steph = (h - fs) // max(arrh - 1, 1)
            stepw = (w - fs) // max(arrw - 1, 1)
            g_in = jnp.concatenate(
                [xm[:, hi * steph:hi * steph + fs,
                    wi * stepw:wi * stepw + fs, :]
                 for hi in range(arrh) for wi in range(arrw)], axis=-1)
            pred, _ = gen.apply(params, bn_state, g_in, train=False)
            pred = pred.astype(jnp.float32)
            acc = jnp.zeros_like(x, jnp.float32)
            cnt = jnp.zeros((1, h, w, 1), jnp.float32)
            for hi in range(outh):
                for wi in range(outw):
                    oi = hi * outw + wi
                    ys, xs = hi * steph, wi * stepw
                    acc = acc.at[:, ys:ys + fs, xs:xs + fs, :].add(
                        pred[..., oi * nc:(oi + 1) * nc])
                    cnt = cnt.at[:, ys:ys + fs, xs:xs + fs, :].add(1.0)
            mean_pred = acc / jnp.maximum(cnt, 1.0)
            # Composite only where masked AND covered by an output patch —
            # masked pixels outside the 2x2 coverage keep the fill value,
            # exactly what the model saw at train time for those regions.
            out = jnp.where(m & (cnt > 0), mean_pred, xm)
            return image_ops.denormalize_to_uint8(out)

        def serve_fn(params, bn_state, ctx_u8, mask_u8, noise, *extra):
            if video_frame:
                return video_frame_fn(params, bn_state, ctx_u8, mask_u8,
                                      *extra)
            if wholeim_frame:
                return wholeim_frame_fn(params, bn_state, ctx_u8, mask_u8)
            x = image_ops.normalize_uint8(ctx_u8)
            if video3d:
                y, _ = gen.apply(params, bn_state,
                                 unfold_time(x, pred_len), train=False)
                y = fold_time(y)
            else:
                g_in = (x, noise) if noise_gen else x
                y, _ = gen.apply(params, bn_state, g_in, train=False)
            out = y.astype(jnp.float32)
            if composable:
                # Binarize: clients commonly send 0/255 masks (PNG decode);
                # any nonzero pixel means "inside the hole".
                m = (mask_u8 > 0).astype(jnp.float32)
                out = m * out + (1.0 - m) * x
            elif center_paste:
                # Paste the predicted 64^2 center into the context, keeping
                # the overlapPred ring from ctx — the full inpainted frame.
                out = mask_ops.paste_center(x.astype(jnp.float32), out,
                                            overlap)
            return image_ops.denormalize_to_uint8(out)

        # Scale-out over ICI: dataParallel>1 shards every device batch's
        # rows across a ('data','model') mesh — the replicated G runs SPMD
        # and XLA keeps all traffic on-device (no per-chip client code).
        # Default (dataParallel<=1) stays single-device: serving semantics
        # never change under a multi-chip jax.devices() unless asked
        # (train's dataParallel=0 "all devices" default is a TRAIN default).
        dp = int(opt.dataParallel)
        if dp > 1:
            if self.batch % dp:
                raise SystemExit(
                    f"batchSize {self.batch} must be divisible by "
                    f"dataParallel {dp} (fixed padded device batches)")
            from video_filler_tpu import parallel
            mesh = parallel.make_mesh(n_data=dp, n_model=1)
            repl = parallel.replicate(mesh)
            bsh = parallel.batch_sharding(mesh)
            self._params = jax.device_put(self._params, repl)
            self._bn = jax.device_put(self._bn, repl)
            self._extra_args = tuple(jax.device_put(a, repl)
                                     for a in self._extra_args)
            self._serve_fn = jax.jit(
                serve_fn, in_shardings=(repl, repl, bsh, bsh, bsh)
                + (repl,) * len(self._extra_args),
                out_shardings=bsh)
        else:
            self._serve_fn = jax.jit(serve_fn)
        # Bounded backlog, denominated in ROWS (a 64-row POST charges 64,
        # not one queue slot): 4 full device batches.  Overload rejects at
        # ingress (503) instead of queueing unboundedly while the device
        # also churns through requests whose clients already gave up.
        self._queue: queue.Queue = queue.Queue()
        self._max_pending_rows = max(4 * self.batch, 16)
        self._pending_rows = 0
        self._draining = False
        self._closed = False
        self._stats_lock = threading.Lock()
        self._stats = {"requests": 0, "items": 0, "batches": 0,
                       "expired": 0, "rejected": 0}
        self._latencies: list[float] = []

        # Warm up (compile) before accepting traffic.  Host arrays: jit
        # places them per in_shardings (a committed jnp array would fight
        # the DP placement).
        z = np.zeros((self.batch, self.in_h, self.in_w, self.in_c), np.uint8)
        zm = np.ones((self.batch, self.in_h, self.in_w, 1), np.uint8)
        zn = np.zeros((self.batch, 1, 1, self.nz), np.float32)
        np.asarray(self._serve_fn(self._params, self._bn, z, zm, zn,
                                  *self._extra_args))

        # device_thread=False: the caller drives the batch loop itself via
        # run_forever() — lets the DEVICE work own the main thread (some
        # remote-TPU transports service transfers there) while HTTP handlers
        # run on the pool threads.
        self._worker = None
        if device_thread:
            if jax.default_backend() == "axon":
                # This transport services transfers on the main thread;
                # a background device worker degrades ~6x or hangs outright
                # (CLAUDE.md).  Fail loudly instead of hanging.
                raise RuntimeError(
                    "the axon remote-TPU transport cannot run device work "
                    "on a background thread — construct with "
                    "device_thread=False and call run_forever() on the "
                    "main thread (the CLI does this)")
            self._worker = threading.Thread(target=self._run_batches,
                                            daemon=True)
            self._worker.start()
        self._srv = ThreadingHTTPServer((host, port), self._handler_class())
        self.port = self._srv.server_address[1]
        self._http_thread = threading.Thread(target=self._srv.serve_forever,
                                             daemon=True)
        self._http_thread.start()

    # ---- device side ----------------------------------------------------

    def _pop_live(self, timeout: float):
        """Pop the next request whose client is still waiting (None on
        timeout).  Entries past their deadline are dropped unprocessed —
        running them would burn device time on results nobody reads."""
        end = time.perf_counter() + timeout
        while True:
            try:
                item = self._queue.get(
                    timeout=max(end - time.perf_counter(), 1e-4))
            except queue.Empty:
                return None
            with self._stats_lock:
                # Row budget freed on POP (live or expired) — max(0,...)
                # tolerates tests injecting entries behind infer()'s back.
                self._pending_rows = max(
                    0, self._pending_rows - item[0].shape[0])
            if time.perf_counter() <= item[4]:
                return item
            if not item[3].done():
                item[3].set_exception(
                    TimeoutError("request expired in queue"))
            with self._stats_lock:
                self._stats["expired"] += 1

    def _run_batches(self) -> None:
        """Single device client: drain the queue into padded fixed batches."""
        carry = None  # request that didn't fit the previous batch: runs FIRST
        while not self._closed:
            if carry is not None:
                item, carry = carry, None
                # The carry kept its row reservation while held (so the
                # backlog bound counts it); release it now that it's leaving
                # the pending set, and re-check its client deadline — it may
                # have expired while the previous batch ran.
                with self._stats_lock:
                    self._pending_rows = max(
                        0, self._pending_rows - item[0].shape[0])
                if time.perf_counter() > item[4]:
                    if not item[3].done():
                        item[3].set_exception(
                            TimeoutError("request expired in queue"))
                    with self._stats_lock:
                        self._stats["expired"] += 1
                    continue
                items = [item]
            else:
                item = self._pop_live(0.2)
                if item is None:
                    if self._draining:
                        # Exit only when no accepted rows remain anywhere.
                        # infer() reserves rows and checks _draining under
                        # the same lock, so an acceptance racing SIGTERM is
                        # either visible here (_pending_rows > 0) or was
                        # rejected — "every accepted request is answered"
                        # holds without a TOCTOU window.
                        with self._stats_lock:
                            drained = self._pending_rows == 0
                        if drained and self._queue.empty():
                            return
                    continue
                items = [item]
            deadline = time.perf_counter() + self.max_delay
            rows = items[0][0].shape[0]
            while rows < self.batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                nxt = self._pop_live(remaining)
                if nxt is None:
                    break
                if rows + nxt[0].shape[0] > self.batch:
                    # head of the NEXT batch (a re-enqueue to the queue tail
                    # would reorder it behind later arrivals — starvation).
                    # Re-reserve its rows: a held carry is still pending work
                    # the backlog bound must count.
                    carry = nxt
                    with self._stats_lock:
                        self._pending_rows += nxt[0].shape[0]
                    break
                items.append(nxt)
                rows += nxt[0].shape[0]

            try:
                # Assembly runs INSIDE the try: a malformed request (shape
                # mismatch from a direct infer() caller) must fail ITS
                # futures, not kill the worker thread and brick the server.
                ctx = np.zeros((self.batch, self.in_h, self.in_w, self.in_c),
                               np.uint8)
                mask = np.ones((self.batch, self.in_h, self.in_w, 1),
                               np.uint8)
                noise = np.zeros((self.batch, 1, 1, self.nz), np.float32)
                at = 0
                for c, m, nz, _, _ in items:
                    ctx[at:at + c.shape[0]] = c
                    if m is not None:
                        mask[at:at + c.shape[0]] = m
                    if nz is not None:
                        noise[at:at + c.shape[0]] = nz
                    at += c.shape[0]
                out = np.asarray(self._serve_fn(self._params, self._bn,
                                                ctx, mask, noise,
                                                *self._extra_args))
                at = 0
                for c, _, _, fut, _ in items:
                    fut.set_result(out[at:at + c.shape[0]])
                    at += c.shape[0]
            except Exception as e:  # surface device errors to the clients
                for _, _, _, fut, _ in items:
                    if not fut.done():
                        fut.set_exception(e)
            with self._stats_lock:
                self._stats["batches"] += 1
                self._stats["items"] += rows
        if carry is not None:  # don't strand a held-over request at shutdown
            with self._stats_lock:
                self._pending_rows = max(
                    0, self._pending_rows - carry[0].shape[0])
            carry[3].set_exception(RuntimeError("server closed"))

    def infer(self, ctx: np.ndarray, mask: np.ndarray | None,
              noise: np.ndarray | None = None) -> np.ndarray:
        """Enqueue one request (B,fs,fs,nc_in) and block for its rows.
        ``noise``: optional (B,1,1,nz) f32 for noiseGen generators
        (defaults to zeros — deterministic serving)."""
        if ctx.shape[0] > self.batch:
            raise ValueError(
                f"request of {ctx.shape[0]} rows exceeds the server batch "
                f"{self.batch} — split client-side")
        n = ctx.shape[0]
        # Validate BEFORE enqueueing: HTTP callers are pre-validated, but a
        # direct infer() caller with a mis-shaped array must get ValueError
        # here, not poison the shared batch in the device worker.
        if ctx.shape[1:] != (self.in_h, self.in_w, self.in_c):
            raise ValueError(f"ctx rows must be ({self.in_h},{self.in_w},"
                             f"{self.in_c}), got {ctx.shape[1:]}")
        if ctx.dtype != np.uint8:
            raise ValueError(f"ctx must be uint8 [0,255], got {ctx.dtype}")
        if (self.wholeim_frame or self.video_frame) and mask is None:
            # The implicit all-ones default would mask-fill the WHOLE frame
            # — never what a full-frame client means.  Make it explicit.
            raise ValueError("full-frame serving requires a mask "
                             "(which pixels to inpaint)")
        if mask is not None and mask.shape != (n, self.in_h, self.in_w, 1):
            raise ValueError(f"mask must be ({n},{self.in_h},{self.in_w},1), "
                             f"got {mask.shape}")
        if mask is not None and mask.dtype != np.uint8:
            # A float [0,1] mask would be unsafe-cast into the uint8 batch
            # buffer, truncating every fractional pixel to 0 (outside the
            # hole) — a silent no-op inpaint.  Make the client binarize.
            raise ValueError(f"mask must be uint8 {{0,1}}, got {mask.dtype}"
                             " — binarize client-side")
        if noise is not None and noise.shape != (n, 1, 1, self.nz):
            raise ValueError(f"noise must be ({n},1,1,{self.nz}), "
                             f"got {noise.shape}")
        if noise is not None and noise.dtype != np.float32:
            noise = np.asarray(noise, np.float32)
        t0 = time.perf_counter()
        fut: Future = Future()
        with self._stats_lock:
            # _draining is checked under the SAME lock that reserves rows:
            # the batch loop's drained-exit reads _pending_rows under this
            # lock, so an acceptance here is either rejected (flag already
            # set) or visible to the loop before it can exit.
            if self._draining:
                self._stats["rejected"] += 1
                raise ServerOverloaded(
                    "server draining (shutdown in progress) — request "
                    "refused")
            if self._pending_rows + n > self._max_pending_rows:
                self._stats["rejected"] += 1
                raise ServerOverloaded(
                    f"request queue full ({self._pending_rows} rows "
                    f"pending, budget {self._max_pending_rows}) — retry "
                    "with backoff")
            self._pending_rows += n
        self._queue.put_nowait((ctx, mask, noise, fut,
                                t0 + REQUEST_TIMEOUT_S))
        try:
            out = fut.result(timeout=REQUEST_TIMEOUT_S)
        except (TimeoutError, FutureTimeoutError) as e:
            # Either fut.result's wait expired or _pop_live failed the
            # future with "request expired in queue" — 504 both ways.
            # concurrent.futures.TimeoutError is only an alias of the
            # builtin from 3.11; catching both keeps the 504 contract on
            # the 3.10 floor pyproject declares.
            raise RequestTimeout(str(e) or "request timed out") from None
        with self._stats_lock:
            self._stats["requests"] += 1
            self._latencies.append((time.perf_counter() - t0) * 1000.0)
            del self._latencies[:-10_000]
        return out

    # ---- HTTP side ------------------------------------------------------

    def _handler_class(self):
        server = self

        class Handler(QuietHandler):
            def do_GET(self):
                if self.path == "/healthz":
                    # Draining pods must drop out of balancer rotation NOW,
                    # not after the backlog is answered — every new request
                    # would 503 anyway.
                    if server._draining:
                        self._send(503, "text/plain", b"draining")
                    else:
                        self._send(200, "text/plain", b"ok")
                elif self.path == "/stats":
                    self._send(200, "application/json",
                               json.dumps(server.stats()).encode())
                else:
                    self._send(404, "text/plain", b"not found")

            def do_POST(self):
                if self.path != "/inpaint":
                    self._send(404, "text/plain", b"not found")
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    with np.load(io.BytesIO(self.rfile.read(n)),
                                 allow_pickle=False) as data:
                        ctx = data["ctx"]
                        mask = data["mask"] if "mask" in data.files else None
                        noise = (data["noise"] if "noise" in data.files
                                 else None)
                    squeeze = ctx.ndim == 3
                    if squeeze:
                        ctx = ctx[None]
                        mask = None if mask is None else mask[None]
                    if noise is not None:
                        if not server.noise_gen:
                            raise ValueError(
                                "this server's generator takes no noise "
                                "(noiseGen=0)")
                        noise = np.asarray(noise, np.float32)
                        if noise.ndim in (1, 3):   # (nz,) or (1,1,nz)
                            noise = np.broadcast_to(
                                noise.reshape(1, 1, 1, -1),
                                (ctx.shape[0], 1, 1, noise.shape[-1]))
                        if noise.shape != (ctx.shape[0], 1, 1, server.nz):
                            raise ValueError(
                                f"noise must be (B,1,1,{server.nz}), got "
                                f"{noise.shape}")
                    ih, iw, c = server.in_h, server.in_w, server.in_c
                    if ctx.dtype != np.uint8 or \
                            ctx.shape[1:] != (ih, iw, c):
                        raise ValueError(
                            f"ctx must be uint8 (B,{ih},{iw},{c}), got "
                            f"{ctx.dtype} {ctx.shape}")
                    if mask is not None and not (server.composable
                                                 or server.wholeim_frame
                                                 or server.video_frame):
                        raise ValueError(
                            "mask compositing needs matching in/out "
                            "geometry (video/logo regimes) or wholeim "
                            "full-frame mode (frameH/frameW); center models "
                            "inpaint their fixed center hole (no mask "
                            "input) and patch-mode wholeim serves the raw "
                            "G output")
                    if mask is not None and \
                            mask.shape != (ctx.shape[0], ih, iw, 1):
                        raise ValueError(
                            f"mask must be (B,{ih},{iw},1), got {mask.shape}")
                except Exception as e:
                    self._send(400, "text/plain", str(e).encode())
                    return
                try:
                    out = server.infer(ctx, mask, noise)
                except ValueError as e:  # client error (e.g. oversize batch)
                    self._send(400, "text/plain", str(e).encode())
                    return
                except ServerOverloaded as e:
                    self._send(503, "text/plain", str(e).encode())
                    return
                except RequestTimeout as e:
                    self._send(504, "text/plain", str(e).encode())
                    return
                except Exception as e:
                    self._send(500, "text/plain", str(e).encode())
                    return
                buf = io.BytesIO()
                np.savez(buf, out=(out[0] if squeeze else out))
                self._send(200, "application/octet-stream", buf.getvalue())

        return Handler

    def stats(self) -> dict:
        with self._stats_lock:
            s = dict(self._stats)
            lat = sorted(self._latencies)
        s["avg_fill"] = (s["items"] / (s["batches"] * self.batch)
                         if s["batches"] else 0.0)
        s["p50_ms"] = lat[len(lat) // 2] if lat else 0.0
        s["p95_ms"] = lat[int(len(lat) * 0.95)] if lat else 0.0
        return s

    def run_forever(self) -> None:
        """Drive the batch loop on the calling thread (device_thread=False).
        Returns after initiate_drain() once the backlog is answered."""
        self._run_batches()

    def initiate_drain(self) -> None:
        """Graceful shutdown: refuse new requests (503) but answer every
        request already accepted; the batch loop then returns.  Safe to call
        from a signal handler — it only sets a flag."""
        self._draining = True

    def close(self) -> None:
        self._closed = True
        self._srv.shutdown()
        self._srv.server_close()
        if self._worker is not None:
            self._worker.join(timeout=5.0)
        self._http_thread.join(timeout=2.0)


def main(argv: list[str]) -> None:
    from video_filler_tpu.config import split_regime
    regime, rest = split_regime(argv, default="video")
    opt = from_args(rest)
    if not opt.net:
        raise SystemExit("serve needs net=<checkpoint .npz or .t7>")
    # Persistent compile cache: a server restart skips the generator
    # recompile (the startup cost is otherwise compile-dominated).
    from video_filler_tpu.utils import host_keyed_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      host_keyed_cache_dir(os.path.join(
                          os.path.expanduser("~"), ".cache", "vf_tpu_jit")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    srv = InpaintServer(opt, regime, opt.net, host=opt.serveHost,
                        port=opt.display_port,
                        max_delay_ms=opt.serveMaxDelayMs,
                        device_thread=False)
    print(f"serving {opt.net} (regime={regime}, batch={opt.batchSize}) on "
          f"http://{opt.serveHost}:{srv.port}/  — POST /inpaint, GET /stats",
          flush=True)
    # Graceful shutdown: SIGTERM (pod preemption / rollout) drains — new
    # requests get 503, accepted ones are answered, then the loop returns.
    import signal
    signal.signal(signal.SIGTERM,
                  lambda signum, frame: srv.initiate_drain())
    try:
        srv.run_forever()  # device work on the main thread
        print("drained — all accepted requests answered; shutting down",
              flush=True)
    except KeyboardInterrupt:
        pass
    srv.close()


def cli() -> None:
    main(sys.argv[1:])


if __name__ == "__main__":
    main(sys.argv[1:])
