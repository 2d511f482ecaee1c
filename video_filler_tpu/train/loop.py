"""Epoch driver + CLI — the role of the reference's per-experiment trainer
scripts (train.lua:415-468, train_vid_weighted.lua:542-612), one driver for
all regimes.

Differences by design (TPU-first):
* preprocess + fDx + fGx + both Adam updates are ONE donated jit (train/step.py);
* batches stream from the threaded host pipeline as uint8 and are sharded over
  the mesh's data axis before the step (DP over ICI);
* checkpoints carry optimizer state and step, so finetune/resume
  (loadName/loadIter, train_vid_weighted.lua:242-257) is exact;
* metrics stream to stdout + JSONL; display grids become PNG dumps
  (train.lua:427-445's display-server role).

CLI (env-var names match the reference; see config.py):
    python -m video_filler_tpu.train regime=video DATA_ROOT=/data \
        batchSize=64 wtl2=0.999 weight_nomask=0.05 maskName=maskppp.png
"""

from __future__ import annotations

import json
import math
import os
import signal
import sys
import threading
import time
import typing

import jax
import numpy as np

from video_filler_tpu import parallel
from video_filler_tpu.parallel import distributed
from video_filler_tpu.checkpoint import (
    checkpoint_path,
    restore_checkpoint,
    restore_subtree,
    save_checkpoint,
    wait_pending_saves,
)
from video_filler_tpu.models import build_for_regime
from video_filler_tpu.config import REGIMES, Opt, from_args, split_regime
from video_filler_tpu.data.pipeline import DataLoader, make_sampler
from video_filler_tpu.ops import masks
from video_filler_tpu.train.step import (
    init_train_state,
    make_preprocess,
    make_train_step,
)
from video_filler_tpu.utils import MetricsLogger, save_image_grid

# Metrics eval/metrics.evaluate emits (less the *_std/protocol columns);
# keepBest's bestMetric must name one.  Higher-is-better for PSNR/SSIM,
# lower-is-better otherwise.
_EVAL_METRICS = {"l2", "psnr_db", "ssim", "hole_l2"}
_HIGHER_BETTER = {"psnr_db", "ssim"}


class _BestG(typing.NamedTuple):
    """G+BN-only keep-best checkpoint payload.  Saved through the normal
    npz codec, its leaves flatten to the same ``.params_g...`` /
    ``.state_g...`` keys a full TrainState produces, so
    eval/common.load_generator (and serve.py / eval CLIs) read a best-file
    like any other checkpoint; D and the Adam moments are deliberately
    absent — the consumer is inference, and over the axon tunnel the fetch
    is ~4x smaller (the 4.5 GB full-TrainState fetch hung the relay,
    CLAUDE.md).  Every training regime's long-horizon soak shows a
    measured early-stop point (BASELINE.md: center's held-out peaks then
    drifts, video overtrains past ~3k, logo oscillates around ~6.8k) —
    keepBest turns those findings into a trainer feature the reference
    never had (its QC was hand-watching display grids, train.lua:427-445).
    """
    params_g: typing.Any
    state_g: typing.Any
    step: typing.Any


def _display_dump(opt: Opt, regime: str, batch, fake, out_dir: str,
                  epoch: int, step: int) -> None:
    """PNG grids of fake / real / composited (train.lua:427-445 analogue)."""
    import jax.numpy as jnp

    tag = f"{opt.name}_e{epoch}_s{step}"
    fake = jnp.asarray(fake)
    real = jnp.asarray(batch["real"])
    if real.ndim == 5:  # temporal (video3d): show the first frame
        batch = dict(batch, real=real[:, 0],
                     **({"mask": jnp.asarray(batch["mask"])[:, 0]}
                        if "mask" in batch else {}))
        real, fake = real[:, 0], fake[:, 0]
    nc = opt.nc
    save_image_grid(f"{out_dir}/{tag}_fake.png", np.asarray(fake)[..., :nc])
    save_image_grid(f"{out_dir}/{tag}_real.png", np.asarray(real)[..., :nc])
    if regime == "center":
        comp = masks.paste_center(
            masks.center_mask_fill(real, opt.overlapPred), fake,
            opt.overlapPred)
    elif "mask" in batch:
        comp = masks.fill_in(real, jnp.asarray(batch["mask"]), fake)
    else:
        comp = fake
    save_image_grid(f"{out_dir}/{tag}_inpaint.png",
                    np.asarray(comp)[..., :nc])




def train(opt: Opt, regime: str, max_steps: int | None = None,
          quiet: bool = False, epoch_hook=None):
    """Run the full training loop; returns the final TrainState.

    ``epoch_hook(epoch, state)`` (optional) runs at each epoch boundary —
    after the epoch log, before the checkpoint block — with the LIVE
    device-resident TrainState.  Read-only: the next step donates the
    state, so the hook must not retain references past its return.  This
    is the tunnel-safe way to score training progress mid-run (ledgers
    evaluate the generator subtree in place, eval/common.live_generator)
    without the full-TrainState device_get a checkpoint save implies.
    Under multi-host the hook runs on EVERY process (it may contain
    collectives); guard host-0-only work on jax.process_index() inside."""
    if regime not in REGIMES:
        raise SystemExit(f"unknown regime {regime!r}; expected one of "
                         f"{', '.join(REGIMES)}")
    # Multi-host: every process runs this same function (SPMD); the mesh
    # spans all processes' devices, each host's loader feeds only its slice
    # of the global batch, and host-0 owns logging/checkpoints/display.
    n_proc, proc = jax.process_count(), jax.process_index()
    is_main = proc == 0
    quiet = quiet or not is_main
    if opt.evalEvery > 0:
        # Validate the in-train-eval config BEFORE any resource (loader
        # threads, logger, dashboard) exists: these SystemExits used to
        # fire after construction, skipping the close()s the try/finally
        # below owns (ADVICE r4).
        if n_proc > 1:
            raise SystemExit(
                "evalEvery is single-process: in-train eval draws from a "
                "host-local sampler and would desync the SPMD program — "
                "run eval/metrics on saved checkpoints instead")
        # Preflight the eval sampler NOW: evalSplit=test with split=100
        # (or a regime/dataset mismatch) must abort at startup, not 30
        # minutes into the run at the first eval event.  The video/logo
        # samplers raise on the bad combination themselves; the folder
        # dataset's test portion can merely be EMPTY — catch that by size.
        if not make_sampler(opt, regime, split=opt.evalSplit)[1]:
            raise SystemExit(
                f"evalEvery: evalSplit={opt.evalSplit!r} selects an empty "
                f"dataset portion (split={opt.split}) — use split < 100 "
                "to reserve a held-out portion")
    if opt.keepBest:
        # keep-best checkpointing rides the evalEvery events; validate the
        # combination up front (same fail-before-resources rule as above).
        if opt.evalEvery <= 0:
            raise SystemExit(
                "keepBest=1 needs evalEvery=N (>0): the best-so-far test "
                "runs at each in-train eval event")
        if opt.bestMetric not in _EVAL_METRICS:
            raise SystemExit(
                f"bestMetric={opt.bestMetric!r} is not an eval metric; "
                f"expected one of {sorted(_EVAL_METRICS)}")
    if opt.dataDevice:
        # HBM-resident corpus (data/device_data.py): batches are
        # synthesized inside the fused step, so everything that consumes
        # the HOST batch stream is incompatible by construction.
        from video_filler_tpu.data import device_data
        if regime not in device_data.SUPPORTED:
            raise SystemExit(
                f"dataDevice=1 supports regimes {device_data.SUPPORTED}; "
                f"use the host pipeline for {regime!r}")
        if opt.seqParallel > 1:
            raise SystemExit("dataDevice does not support seqParallel")
        if opt.display:
            raise SystemExit(
                "dataDevice=1 is incompatible with display=1 (the preview "
                "grid pulls an extra HOST batch) — set display=0")
    seed = opt.manualSeed or int(np.random.randint(1, 10000))
    if n_proc > 1 and not opt.manualSeed:
        # Model init / in-jit RNG must agree across hosts.
        from jax.experimental import multihost_utils
        import jax.numpy as jnp
        seed = int(multihost_utils.broadcast_one_to_all(jnp.int32(seed)))
    if not quiet:
        print(f"Seed: {seed}")
    key = jax.random.PRNGKey(seed)

    sampler_opt = opt
    if n_proc > 1:
        _, per_host = distributed.process_batch_slice(opt.batchSize)
        sampler_opt = opt.replace(batchSize=per_host)
        if opt.display and is_main:
            print("display grids disabled under multi-host (outputs are "
                  "globally sharded)")
    sampler, ds_size = make_sampler(sampler_opt, regime)

    sp_mesh = None
    if opt.seqParallel > 1:
        # Sequence parallelism (video3d): clips T-sharded over 'seq', batch
        # over 'data' (parallel/temporal.py).  TP and SP are exclusive — the
        # SP bottleneck already reuses the seq axis for its matmuls.
        from video_filler_tpu.parallel import temporal
        if regime != "video3d":
            raise SystemExit("seqParallel requires regime=video3d "
                             "(the 2D regimes have no temporal axis)")
        if opt.predLen % opt.seqParallel:
            raise SystemExit(f"predLen {opt.predLen} must divide by "
                             f"seqParallel {opt.seqParallel}")
        if opt.modelParallel > 1:
            raise SystemExit("seqParallel and modelParallel are exclusive")
        n_data = opt.dataParallel or \
            max(len(jax.devices()) // opt.seqParallel, 1)
        if opt.batchSize % n_data:
            raise SystemExit(
                f"batchSize {opt.batchSize} must divide by the SP data axis "
                f"{n_data} (set dataParallel to a divisor of the batch)")
        mesh = sp_mesh = temporal.make_seq_mesh(n_data=n_data,
                                                n_seq=opt.seqParallel)
    else:
        n_data = opt.dataParallel
        if not n_data:
            # Largest data-axis size dividing the batch that fits the devices.
            avail = len(jax.devices()) // opt.modelParallel
            n_data = math.gcd(opt.batchSize, avail) if avail else 1
            if avail and n_data < avail and not quiet:
                # Silent half-machine runs are a 2x throughput loss nobody
                # notices; say it loudly (dataParallel= overrides).
                print(f"WARNING: using {n_data * opt.modelParallel} of "
                      f"{len(jax.devices())} devices — batchSize "
                      f"{opt.batchSize} does not divide the {avail} "
                      "available data-axis devices; pick a divisible "
                      "batchSize (or set dataParallel=) to use the machine")
        mesh = parallel.make_mesh(n_data=n_data, n_model=opt.modelParallel)
    key, k_init = jax.random.split(key)
    state = init_train_state(k_init, opt, regime)

    start_epoch = 1
    resume_miss = False
    if opt.autoResume:
        # Failure recovery: restart from wherever the last run checkpointed
        # (the reference's only recovery story is manual loadName/loadIter,
        # train_vid_weighted.lua:242-257 — this automates it).
        from video_filler_tpu.checkpoint import restore_latest
        found = restore_latest(opt.checkpointDir, opt.name, state)
        if found is not None:
            state, _, epoch = found
            start_epoch = epoch + 1
            if not quiet:
                print(f"auto-resumed {opt.name} at epoch {epoch}")
    elif opt.loadName and opt.loadIter:
        path = checkpoint_path(opt.checkpointDir, opt.loadName, opt.loadIter)
        try:
            state, _ = restore_checkpoint(path, state)
        except FileNotFoundError:
            if n_proc == 1:
                raise
            resume_miss = True  # report collectively below, not one-sided
        else:
            start_epoch = opt.loadIter + 1
            if not quiet:
                print(f"Resumed {path} at epoch {opt.loadIter}")
    if n_proc > 1 and (opt.autoResume or (opt.loadName and opt.loadIter)):
        # Checkpoints are written by host 0 only; every process restores from
        # its local view of checkpointDir.  If the dir is not one shared
        # filesystem the hosts resume from different epochs (or fresh init)
        # and the SPMD programs desync — fail together, with the evidence.
        from jax.experimental import multihost_utils
        import jax.numpy as jnp
        epochs = multihost_utils.process_allgather(
            jnp.int32(-1 if resume_miss else start_epoch))
        lo, hi = int(np.min(epochs)), int(np.max(epochs))
        if lo != hi or resume_miss:
            raise SystemExit(
                f"multi-host resume desync: per-process resume epochs "
                f"{[int(e) for e in np.asarray(epochs)]} (-1 = checkpoint "
                f"missing) — checkpointDir {opt.checkpointDir!r} must be a "
                "shared filesystem visible to every process")
    if sp_mesh is not None:
        from video_filler_tpu.parallel import temporal
        state = temporal.shard_sp_state(sp_mesh, state)
    else:
        state = parallel.shard_train_state(mesh, state)

    # Resume continuity: fold the restored global step into both RNG
    # streams.  step_seed continues exactly where the interrupted run
    # stopped (an uninterrupted run's per-step seeds are a function of the
    # global step), and the loader draws a fresh per-resume stream — without
    # this a resumed run replays the run's FIRST batches/crops/flips/masks/
    # noise, systematically over-training that prefix under repeated
    # preemption.  (The loader stream itself is stateful and cannot be
    # fast-forwarded to the interruption point, so resume is exact for
    # model/optimizer/step-seed state, fresh-but-disjoint for the data
    # order.)  Hosts still draw disjoint streams via the proc offset.
    step0 = int(jax.device_get(state.step))
    dev_sample = None
    if opt.dataDevice:
        from video_filler_tpu.data import device_data
        arrays, dd_meta = device_data.load_corpus(opt, regime)
        dev_sample = device_data.make_device_sampler(opt, regime, dd_meta)
        # Commit the corpus to device ONCE, replicated over the mesh (jit
        # re-transfers numpy args per call — the whole point is that the
        # per-step upload disappears).
        repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        if n_proc > 1:
            # Multi-host: every process decodes the full (shared-FS) corpus
            # and feeds its local replicas of a GLOBAL replicated array.
            # Inconsistent replicas would corrupt training silently (the
            # SPMD program is identical; only the data would differ), so
            # hosts first agree on a corpus checksum — same discipline as
            # the resume-desync check below.
            import zlib
            from jax.experimental import multihost_utils
            import jax.numpy as jnp
            crc = 0
            for a in arrays:
                crc = zlib.crc32(a.tobytes(), crc)
            crcs = np.asarray(multihost_utils.process_allgather(
                jnp.uint32(crc)))
            if len({int(c) for c in crcs}) != 1:
                raise SystemExit(
                    f"dataDevice multi-host: per-process corpus checksums "
                    f"differ ({[hex(int(c)) for c in crcs]}) — DATA_ROOT "
                    f"{opt.DATA_ROOT!r} must be one shared corpus visible "
                    "identically to every process")
            corpus_dev = tuple(
                jax.make_array_from_callback(a.shape, repl,
                                             lambda idx, a=a: a[idx])
                for a in arrays)
        else:
            corpus_dev = tuple(jax.device_put(a, repl) for a in arrays)
        if not quiet:
            mb = sum(a.nbytes for a in arrays) / 1e6
            print(f"dataDevice: {dd_meta['desc']} resident on device "
                  f"({mb:.0f} MB); per-step host transfer: one int32 seed")
        loader = device_data.NullLoader()
    else:
        loader = DataLoader(sampler, opt.nThreads,
                            seed=seed + 7919 * proc + 104729 * step0,
                            prefetch_depth=opt.prefetchDepth)

    init_net = None
    with_init = bool(opt.withInit and opt.initName)
    if with_init:
        # Initializer cascade: a pre-trained generator checkpoint run ahead
        # of G (train_mycrit.lua:261-265,402-405).  G-only import — the
        # checkpoint's D/optimizer shapes need not match this run's config
        # (util.load loads a single net, util.lua:99-105).
        g_target = build_for_regime(opt, regime)[0].init(jax.random.PRNGKey(0))
        # device_put once: restore_subtree returns numpy trees, and jit
        # re-transfers numpy args per call — without this every step would
        # re-upload the whole initializer net.
        init_net = jax.device_put(
            (restore_subtree(opt.initName, g_target[0], ".params_g"),
             restore_subtree(opt.initName, g_target[1], ".state_g")))

    preprocess = make_preprocess(opt, regime)
    step_fn = make_train_step(opt, regime, with_init=with_init,
                              sp_mesh=sp_mesh)

    # The per-step RNG key is derived INSIDE the jit from a host integer —
    # eager jax.random.split per step would be a device round-trip each
    # iteration (expensive over a remote-TPU link, needless everywhere).
    if dev_sample is not None:
        if with_init:
            def _fused(state, dev, step_seed, init_net):
                kd, k1, k2 = jax.random.split(
                    jax.random.PRNGKey(step_seed), 3)
                batch = dev_sample(dev, kd)
                return step_fn(state, preprocess(batch, k1), k2, init_net)
        else:
            def _fused(state, dev, step_seed):
                # Third stream for the device sampler: the batch itself is
                # a function of (seed, global step) — nothing arrives from
                # the host but the int32 seed.
                kd, k1, k2 = jax.random.split(
                    jax.random.PRNGKey(step_seed), 3)
                batch = dev_sample(dev, kd)
                return step_fn(state, preprocess(batch, k1), k2)
        fused = jax.jit(_fused, donate_argnums=0)
    elif with_init:
        def _fused(state, host_batch, step_seed, init_net):
            k1, k2 = jax.random.split(jax.random.PRNGKey(step_seed))
            return step_fn(state, preprocess(host_batch, k1), k2, init_net)
        fused = jax.jit(_fused, donate_argnums=0)
    else:
        def _fused(state, host_batch, step_seed):
            k1, k2 = jax.random.split(jax.random.PRNGKey(step_seed))
            return step_fn(state, preprocess(host_batch, k1), k2)
        fused = jax.jit(_fused, donate_argnums=0)

    # Preview pass for the display grids (the reference runs an extra batch
    # through G every display_iter steps, train.lua:427-445).  It mirrors
    # training's input distribution: noise drawn by the SAME helper the step
    # uses (uniform vs normal matters — N(0,1) into a U(-1,1)-trained G makes
    # the grids misrepresent the model), a key split so preprocess and noise
    # never share randomness, and the withInit netI cascade applied when G
    # was trained behind one.
    gen = build_for_regime(opt, regime)[0]

    def _preview(params_g, state_g, host_batch, key, init_nets=None):
        from video_filler_tpu.train.step import _draw_noise
        kp, kn = jax.random.split(key)
        batch = preprocess(host_batch, kp)
        g_in = batch.get("masked")
        if g_in is None:
            g_in = (masks.center_mask_fill(batch["real"], opt.overlapPred)
                    if regime == "center" else
                    masks.apply_logo_mask(batch["real"], batch["mask"],
                                          opt.maskValue))
        if init_nets is not None:
            fake_init, _ = gen.apply(init_nets[0], init_nets[1], g_in,
                                     train=False)
            g_in = masks.fill_in(g_in, batch["mask"], fake_init)
        if opt.noiseGen:
            g_in = (g_in, _draw_noise(kn, opt, g_in.shape[0]))
        fake, _ = gen.apply(params_g, state_g, g_in, train=False)
        return batch, fake

    preview = jax.jit(_preview)

    # Per-process JSONL under multi-host (same shared-FS file would garble).
    logger = MetricsLogger(opt.name if is_main else f"{opt.name}_p{proc}",
                           quiet=quiet)
    dashboard = None
    if opt.displayServer and is_main:
        # Live HTTP view over the JSONL + PNG artifacts (the reference's
        # `display` rock server, train.lua:427-445).
        from video_filler_tpu.utils import Dashboard
        dashboard = Dashboard(opt.name, port=opt.display_port)
        if not quiet:
            print(f"dashboard: http://localhost:{dashboard.port}/")
    if opt.evalEvery > 0:
        # In-train held-out evaluation (Opt.evalEvery): every N epochs the
        # LIVE generator is scored on evalSplit through the same metrics
        # harness the ledgers use — device-resident via a once-jitted
        # forward, never a TrainState fetch.  The reference has no in-train
        # eval (its QC is display grids, train.lua:427-445); this makes the
        # ledger protocol a trainer feature.  (Config validation — the
        # n_proc guard and the empty-evalSplit preflight — ran at the top
        # of train(), before any resources were constructed.)
        from video_filler_tpu.eval.common import live_generator
        from video_filler_tpu.eval.metrics import evaluate
        _eval_shared: dict = {}
        if opt.keepBest:
            # Seed best-so-far from an existing best file (same run name):
            # an autoResume'd continuation — the recommended shape for long
            # runs over the axon tunnel (CLAUDE.md's per-process budget) —
            # must not let its first post-resume eval overwrite a better
            # pre-kill peak.  A best file banked under a DIFFERENT metric
            # is ignored (no comparable value; the first eval re-banks).
            bp = checkpoint_path(opt.checkpointDir, opt.name, "best")
            if os.path.exists(bp):
                with np.load(bp, allow_pickle=False) as _d:
                    _meta = json.loads(str(_d["__meta__"]))
                if opt.bestMetric in _meta:
                    _eval_shared["best"] = float(_meta[opt.bestMetric])
                    if not quiet:
                        print(f"keepBest: resuming best-so-far "
                              f"{opt.bestMetric}="
                              f"{_eval_shared['best']:.4g} from {bp}",
                              flush=True)
        user_hook = epoch_hook

        def epoch_hook(ep, st, _user=user_hook):
            if ep % opt.evalEvery == 0:
                if "fwd" not in _eval_shared:
                    _eval_shared["fwd"] = live_generator(opt, regime, st)[0]
                m = evaluate(opt.replace(net="(live)"), regime,
                             n_batches=opt.evalBatches,
                             loaded=(_eval_shared["fwd"], st.params_g,
                                     st.state_g))
                logger.log_eval(ep, opt.evalSplit, m)
                if opt.keepBest:
                    val = float(m[opt.bestMetric])
                    prev = _eval_shared.get("best")
                    better = prev is None or (
                        val > prev if opt.bestMetric in _HIGHER_BETTER
                        else val < prev)
                    if better:
                        _eval_shared["best"] = val
                        # Synchronous write: successive bests target ONE
                        # path (epoch pinned to "best"); overlapping async
                        # replaces could finish out of order and keep a
                        # stale file.
                        # Lands at {name}_best_state.npz: the non-numeric
                        # "epoch" keeps it invisible to prune_checkpoints
                        # and restore_latest (their _(\d+)_ patterns), so
                        # the best file survives retention and can never
                        # be mistaken for an autoResume point.
                        p = save_checkpoint(
                            opt.checkpointDir, opt.name, "best",
                            _BestG(st.params_g, st.state_g, st.step),
                            meta={"step": int(jax.device_get(st.step)),
                                  "epoch": ep, "split": opt.evalSplit,
                                  opt.bestMetric: val})
                        if not quiet:
                            print(f"keepBest: {opt.bestMetric}={val:.4g} "
                                  f"@epoch {ep} -> {p}", flush=True)
            if _user is not None:
                _user(ep, st)

    ntrain = min(ds_size, opt.ntrain)
    steps_per_epoch = max(int(ntrain // opt.batchSize), 1)
    done = 0

    # Profiling hooks (SURVEY §5 "tracing": the reference's torch.Timer
    # triplet becomes wall-clock logging + an optional XLA profiler capture).
    prof_started = prof_done = not opt.profileSteps

    # Host batch -> device arrays: single process uses a plain device_put
    # with the data sharding (SP: frames land on their own seq devices);
    # multi-host assembles per-process rows into one global array.
    if dev_sample is not None:
        def to_device(hb):
            return corpus_dev       # already resident; hb is None
    elif sp_mesh is not None and n_proc == 1:
        from video_filler_tpu.parallel import temporal

        def to_device(hb):
            return temporal.shard_sp_host_batch(sp_mesh, hb, nc=opt.nc)
    else:
        def to_device(hb):
            return distributed.global_batch_from_local(mesh, hb)

    # Metrics are logged ONE step late: fetching step k's scalars would block
    # on its execution, serializing host and device — step k-1's values are
    # already materialized, so the fetch is free and the device pipeline
    # (donated-state chain) never drains.
    pending_log = None

    # Preemption-aware shutdown: TPU maintenance events deliver SIGTERM
    # with a grace window — finish the in-flight step, checkpoint the live
    # state, exit cleanly (the SIGKILL story is autoResume + atomic saves;
    # this one loses NO progress).  Single-process only: an uncoordinated
    # per-host signal would desync the SPMD program mid-collective —
    # multi-host preemption needs coordinated delivery, which the cluster
    # layer owns.  The handler only sets a flag; all real work happens at
    # the next step boundary on the main thread.
    preempted = threading.Event()
    old_sigterm = None
    if n_proc == 1 and threading.current_thread() is threading.main_thread():
        old_sigterm = signal.signal(
            signal.SIGTERM, lambda signum, frame: preempted.set())

    def _flush_log():
        nonlocal pending_log
        if pending_log is not None:
            metrics_host = jax.device_get(pending_log[3])
            if opt.haltOnNonFinite:
                bad = [k for k, v in metrics_host.items()
                       if not np.isfinite(v)]
                if bad:
                    # Divergence detection: fail fast with a pointer to the
                    # last good checkpoint instead of training on NaNs (the
                    # reference's ledger records "!!Diverges:" by hand).
                    epoch_, step_ = pending_log[0], pending_log[1]
                    pending_log = None  # the finally-flush must not re-raise
                    raise RuntimeError(
                        f"non-finite loss {bad} at epoch {epoch_} step "
                        f"{step_} — training diverged (resume from the last "
                        f"checkpoint in {opt.checkpointDir!r} with a lower "
                        f"lr, or set haltOnNonFinite=0 to push through)")
            logger.log_step(*pending_log[:3], metrics_host, *pending_log[4:])
            pending_log = None

    try:
        for epoch in range(start_epoch, opt.niter + 1):
            t_epoch = time.perf_counter()
            for step in range(steps_per_epoch):
                if not prof_done and done == 5:
                    jax.profiler.start_trace(opt.profileDir)
                    prof_started, prof_done = True, False
                if prof_started and not prof_done and \
                        done == 5 + opt.profileSteps:
                    jax.profiler.stop_trace()
                    prof_done = True
                    if not quiet:
                        print(f"profiler trace: {opt.profileDir}")
                t0 = time.perf_counter()
                host_batch = loader.get_batch()
                t_data = time.perf_counter() - t0
                dev_batch = to_device(host_batch)
                step_seed = np.int64(seed * 1_000_003 + step0 + done) \
                    % np.int64(2**31)
                args = (state, dev_batch, np.int32(step_seed)) \
                    + ((init_net,) if with_init else ())
                state, metrics = fused(*args)
                if opt.display and n_proc == 1 and \
                        (step + 1) % opt.display_iter == 0:
                    key, kp = jax.random.split(key)
                    pb = parallel.shard_batch(mesh, loader.get_batch())
                    shown, fake = preview(
                        state.params_g, state.state_g, pb, kp,
                        *((init_net,) if with_init else ()))
                    _display_dump(opt, regime, jax.device_get(shown),
                                  fake, "display", epoch, step + 1)
                _flush_log()
                if (step % opt.logEvery) == 0:
                    pending_log = (epoch, step, steps_per_epoch, metrics,
                                   time.perf_counter() - t0, t_data)
                done += 1
                if preempted.is_set():
                    # Save labeled with the interrupted epoch: resume skips
                    # its remainder — benign here, samplers draw randomly
                    # rather than sweeping a fixed per-epoch order.
                    _flush_log()
                    if opt.keepCheckpoints > 0:
                        # Same retention as the epoch path: repeated
                        # preemptions must not accumulate checkpoints past
                        # the configured keep count.
                        from video_filler_tpu.checkpoint import \
                            prune_checkpoints
                        prune_checkpoints(opt.checkpointDir, opt.name,
                                          opt.keepCheckpoints)
                    p = save_checkpoint(
                        opt.checkpointDir, opt.name, epoch, state,
                        meta={"epoch": epoch, "regime": regime,
                              "seed": seed,
                              "preempted_at_step": step0 + done})
                    if not quiet:
                        print(f"SIGTERM: checkpointed {p} at epoch {epoch} "
                              f"step {done}; exiting cleanly")
                    raise StopIteration
                if max_steps is not None and done >= max_steps:
                    raise StopIteration
            _flush_log()
            logger.log_epoch(epoch, opt.niter,
                             time.perf_counter() - t_epoch)
            if epoch_hook is not None:
                epoch_hook(epoch, state)
            if epoch % opt.checkpointEvery == 0:
                # Multi-host TP: the bottleneck params/moments are sharded
                # ACROSS processes, so every process joins a collective
                # all-gather (lockstep — it runs collectives) and host 0
                # alone writes the full, unsharded state.  Pure-DP leaves
                # are replicated and gather_pytree degrades to device_get.
                to_save = state
                if n_proc > 1 and opt.modelParallel > 1:
                    to_save = distributed.gather_pytree(state)
                if is_main:
                    if opt.keepCheckpoints > 0:
                        # Prune BEFORE saving: `keep` fully-written
                        # checkpoints stay on disk even if the incoming
                        # async write fails.
                        from video_filler_tpu.checkpoint import \
                            prune_checkpoints
                        prune_checkpoints(opt.checkpointDir, opt.name,
                                          opt.keepCheckpoints)
                    # Serialization/disk write happens on a background
                    # thread; only the (mandatory, pre-donation) device
                    # fetch blocks.
                    p = save_checkpoint(opt.checkpointDir, opt.name, epoch,
                                        to_save, meta={"epoch": epoch,
                                                       "regime": regime,
                                                       "seed": seed},
                                        async_write=True)
                    if not quiet:
                        print(f"checkpoint: {p}")
    except StopIteration:
        pass
    finally:
        propagating = sys.exc_info()[0] is not None
        # Cleanup failures worth surfacing (divergence caught at the final
        # flush, a failed async checkpoint write) are DEFERRED to the end of
        # this block instead of raised in place: raising mid-finally would
        # skip the remaining teardown (loader workers decoding forever in a
        # long-lived process, an open JSONL, a stale SIGTERM handler), and
        # they must never REPLACE an exception already propagating out of
        # the loop — that would hide the real cause of the abort.
        deferred = None
        try:
            _flush_log()
        except Exception as e:
            if not propagating:
                deferred = e
        if prof_started and not prof_done:
            jax.profiler.stop_trace()
        loader.close()
        logger.close()
        if dashboard is not None:
            dashboard.close()
        try:
            wait_pending_saves()
        except Exception as e:
            if not propagating and deferred is None:
                deferred = e
        if old_sigterm is not None:
            signal.signal(signal.SIGTERM, old_sigterm)
        if deferred is not None:
            raise deferred
    return state


def main(argv: list[str]) -> None:
    # Multi-host handshake (cluster auto-detect); no-op for a single process.
    distributed.initialize()
    regime, rest = split_regime(argv)
    opt = from_args(rest)
    train(opt, regime)


def cli() -> None:
    """Console-script entry point (`vf-train`, pyproject.toml)."""
    main(sys.argv[1:])


if __name__ == "__main__":
    main(sys.argv[1:])
