"""Tunnel-watching TPU job queue (round 4).

The axon tunnel to the one real chip flaps for hours at a time (rounds 3-4
both lost their on-chip artifacts to outages at capture time).  This
orchestrator turns chip work into a resumable queue: probe the backend
cheaply, run the pending jobs ONE AT A TIME (concurrent clients hang the
tunnel, CLAUDE.md) the moment it comes back, and record per-job status so
a restart — of the queue or the tunnel — picks up where it left off.

Queue discipline:
* one probe (tiny matmul, value-forced) before every job; while the chip
  is unreachable, re-probe every PROBE_INTERVAL_S,
* every job is `timeout`-bounded and its stdout/stderr tee'd to
  /tmp/cq_<name>.log,
* jobs whose `done_marker` file already contains their `done_tag` are
  skipped (idempotent across queue restarts),
* a failed job is retried once (the common failure IS the tunnel dying
  mid-run; the retrained artifacts are cheap relative to losing the slot),
  then skipped,
* a hard DEADLINE_S stops the queue so it can never contend with the
  round driver's own end-of-round bench.py run.

Usage: python scripts/chip_queue.py  (from /root/repo; no PYTHONPATH —
it breaks axon plugin discovery).  Status: /tmp/chip_queue_status.json.
Stop: touch /tmp/chip_queue.stop (checked between probes/jobs).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATUS = "/tmp/chip_queue_status.json"
STOP = "/tmp/chip_queue.stop"
PROBE_INTERVAL_S = 180
PROBE_TIMEOUT_S = 120
DEADLINE_S = float(os.environ.get("CQ_DEADLINE_S", 6.0 * 3600))

_PROBE_SRC = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.ones((128, 128), jnp.bfloat16)\n"
    "print('PROBE-OK', float((x @ x).sum()))\n"  # value fetch: the only
    # real completion signal on axon (block_until_ready lies, CLAUDE.md)
)

# (name, argv, timeout_s, done_marker, done_tag) — done when done_marker
# exists AND contains done_tag.
JOBS = [
    # 1. The perf artifact two verdicts have asked for (~minutes).
    ("bench", [sys.executable, "bench.py"], 580,
     "/tmp/cq_bench.log", '"metric"'),
    # 2. Device-side ms/frame for wholeim full-frame composite serving
    #    (VERDICT r3 item 4's BASELINE.md row; ~minutes).
    # (both earlier attempts died mid-compile of the batch=32 case, so the
    # done tag requires the saturating-batch row, not just batch=8's)
    ("serve_wholeim",
     [sys.executable, "scripts/bench_serve_wholeim.py"], 900,
     "/tmp/cq_serve_wholeim.log", "batch=32 "),
    # 3. Logo held-out row (VERDICT r3 item 3; ~3k steps, batch 64).
    ("logo_split",
     [sys.executable, "scripts/run_logo_wholeim_ledgers.py", "logo_split"],
     7200, "/tmp/lw_ledgers/lw_results_logo_split.json",
     '"ckpt": "step3000"'),
    # 4. The save-free wholeim 10k soak (VERDICT r3 item 1; the long one —
    #    with score_every=250 a mid-run kill keeps the partial curve).
    ("wholeim_soak", [sys.executable, "scripts/run_wholeim_soak.py"],
     4 * 3600, "/tmp/lw_ledgers/wholeim_soak_results.json", '"step10002"'),
    # 5. 16-batch dispersion ledgers for center/video/video3d (VERDICT r3
    #    item 6 — the round-3 checkpoints were wiped, so retrain).
    ("heldout16", [sys.executable, "scripts/run_heldout_ledgers.py"],
     4 * 3600, "/tmp/heldout3/heldout_results.json", '"ckpt": "step3000"'),
    # 6. 16-batch wholeim 3k ledger (same protocol refresh).
    ("wholeim16",
     [sys.executable, "scripts/run_logo_wholeim_ledgers.py", "wholeim"],
     2 * 3600, "/tmp/lw_ledgers/lw_results_wholeim.json",
     '"ckpt": "step3000"'),
    # 7. 16-batch bigcorpus + conditionAdv center ledgers (protocol
    #    refresh for the remaining BASELINE.md tables; run last — their
    #    round-3 numbers stand if time runs out first).
    ("bigcorpus16", [sys.executable, "scripts/run_center_bigcorpus.py"],
     3 * 3600, "/tmp/bigcorpus/bigcorpus_results.json", '"ckpt": "final"'),
    ("condadv16", [sys.executable, "scripts/run_condadv_ledger.py"],
     3 * 3600, "/tmp/bigcorpus/condadv_results.json", '"ckpt": "final"'),
]

t0 = time.time()
state = {"started": time.strftime("%F %T"), "jobs": {}}


def _write_status():
    state["elapsed_s"] = round(time.time() - t0, 1)
    with open(STATUS + ".tmp", "w") as f:
        json.dump(state, f, indent=1)
    os.replace(STATUS + ".tmp", STATUS)


def _stop_requested():
    return os.path.exists(STOP)


def _done(marker, tag):
    try:
        with open(marker) as f:
            return tag in f.read()
    except OSError:
        return False


def _probe():
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SRC], cwd=REPO,
                           capture_output=True, text=True,
                           timeout=PROBE_TIMEOUT_S)
        return r.returncode == 0 and "PROBE-OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_for_chip():
    while True:
        if _stop_requested() or time.time() - t0 > DEADLINE_S:
            return False
        if _probe():
            return True
        state["last_probe"] = f"unreachable {time.strftime('%T')}"
        _write_status()
        time.sleep(PROBE_INTERVAL_S)


for name, argv, tmo, marker, tag in JOBS:
    js = state["jobs"].setdefault(name, {})
    if _done(marker, tag):
        js["status"] = "already-done"
        _write_status()
        continue
    attempts = 0
    while attempts < 2:
        if time.time() - t0 > DEADLINE_S or _stop_requested():
            js["status"] = "deadline" if not _stop_requested() else "stopped"
            _write_status()
            print("QUEUE-STOP", name, js["status"], flush=True)
            sys.exit(0)
        if not _wait_for_chip():
            js["status"] = "no-chip-by-deadline"
            _write_status()
            print("QUEUE-STOP no chip by deadline", flush=True)
            sys.exit(0)
        attempts += 1
        # Cap the job's runtime at the queue deadline: a job still holding
        # the chip when the round driver's own bench.py fires would hang
        # the tunnel and null the round's perf artifact (round 3's fate).
        # Jobs flush partial rows as they land, so truncation is lossless.
        eff_tmo = min(tmo, max(60.0, DEADLINE_S - (time.time() - t0)))
        js.update(status=f"running (attempt {attempts})",
                  start=time.strftime("%T"))
        _write_status()
        log = f"/tmp/cq_{name}.log"
        print(f"RUN {name} attempt {attempts} -> {log}", flush=True)
        try:
            with open(log, "a") as lf:
                lf.write(f"\n=== attempt {attempts} {time.strftime('%F %T')}"
                         f" ===\n")
                lf.flush()
                r = subprocess.run(argv, cwd=REPO, stdout=lf,
                                   stderr=subprocess.STDOUT, timeout=eff_tmo)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        ok = rc == 0 and _done(marker, tag)
        js.update(status="done" if ok else f"failed rc={rc}",
                  end=time.strftime("%T"))
        _write_status()
        print(f"END {name}: {js['status']}", flush=True)
        if ok:
            break
        if rc == "timeout" and eff_tmo < tmo:
            # Deadline truncation, not a tunnel death: the partial rows are
            # the best this job can do before round end — don't burn a
            # retry re-compiling from scratch.
            js["status"] = "truncated-at-deadline"
            _write_status()
            break
print("QUEUE-DONE", flush=True)
_write_status()
