"""Tunnel-watching TPU job queue (round 4; reworked round 5).

The axon tunnel to the one real chip flaps for hours at a time (rounds 3-4
both lost their on-chip artifacts to outages at capture time).  This
orchestrator turns chip work into a resumable queue: probe the backend
cheaply, run the pending jobs ONE AT A TIME (concurrent clients hang the
tunnel, CLAUDE.md) the moment it comes back, and record per-job status so
a restart — of the queue or the tunnel — picks up where it left off.

Round-5 rework (VERDICT r4 item 6b + both ADVICE r4 queue findings):
* all queue state lives under the gitignored repo-local ``.chipq/`` dir
  (status.json, logs/, results/) so it survives a host /tmp wipe,
* jobs come from ``scripts/chip_jobs.json`` and the file is RE-READ after
  every job, so new jobs can be appended while the queue runs,
* a job is done when ITS OWN stdout log contains its ``done_tag``
  (default ``ALL-DONE`` — every ledger script prints it as its terminal
  line), not when some shared results file gains its first row, so a
  mid-run tunnel death can no longer masquerade as completion,
* after every attempt the job's listed ``results`` files are snapshotted
  into ``.chipq/results/`` (partial rows survive host recycling too).

Usage: python scripts/chip_queue.py  (from /root/repo; no PYTHONPATH —
it breaks axon plugin discovery).  Status: .chipq/status.json.
Stop: touch .chipq/stop (checked between probes/jobs).
"""
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QDIR = os.path.join(REPO, ".chipq")
LOGS = os.path.join(QDIR, "logs")
RESULTS = os.path.join(QDIR, "results")
STATUS = os.path.join(QDIR, "status.json")
STOP = os.path.join(QDIR, "stop")
JOBS_FILE = os.path.join(REPO, "scripts", "chip_jobs.json")
PROBE_INTERVAL_S = 180
PROBE_TIMEOUT_S = 120
IDLE_POLL_S = 120           # all jobs done: re-poll JOBS_FILE for new ones
DEADLINE_S = float(os.environ.get("CQ_DEADLINE_S", 6.0 * 3600))

for d in (QDIR, LOGS, RESULTS):
    os.makedirs(d, exist_ok=True)


def _write_pidfile(path, pid):
    with open(path, "w") as f:
        f.write(str(pid))


def _reap_stale(pidfile, marker):
    """Kill a child a PREVIOUS queue instance left behind.

    Externally killing the queue orphans its in-flight probe/job child;
    an orphaned axon client holds the tunnel and every later client hangs
    (wedged it exactly this way, round 5 session 4).  Pid + cmdline-marker
    match only — never kill by pattern.
    """
    try:
        with open(pidfile) as f:
            pid = int(f.read().strip())
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmdline = f.read().decode("utf-8", "replace")
    except (OSError, ValueError):
        return
    if marker in cmdline and pid != os.getpid():
        print(f"reaping stale child {pid} ({marker})", flush=True)
        try:
            os.kill(pid, 9)
        except OSError:
            pass
    try:
        os.remove(pidfile)
    except OSError:
        pass


PROBE_PID = os.path.join(QDIR, "probe.pid")
JOB_PID = os.path.join(QDIR, "job.pid")
_reap_stale(PROBE_PID, "PROBE-OK")
_reap_stale(JOB_PID, "scripts/run_")

_PROBE_SRC = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.ones((128, 128), jnp.bfloat16)\n"
    "print('PROBE-OK', float((x @ x).sum()))\n"  # value fetch: the only
    # real completion signal on axon (block_until_ready lies, CLAUDE.md)
)

t0 = time.time()
state = {"started": time.strftime("%F %T"), "jobs": {}}


def _load_jobs():
    """Job dicts: name, argv, timeout_s; optional done_tag (default
    ALL-DONE), results (files to snapshot into .chipq/results/)."""
    with open(JOBS_FILE) as f:
        return json.load(f)


def _write_status():
    state["elapsed_s"] = round(time.time() - t0, 1)
    with open(STATUS + ".tmp", "w") as f:
        json.dump(state, f, indent=1)
    os.replace(STATUS + ".tmp", STATUS)


def _stop_requested():
    return os.path.exists(STOP)


def _log_path(name):
    return os.path.join(LOGS, f"cq_{name}.log")


def _done(job):
    """Done iff the job's own stdout log contains its terminal tag —
    printed only on full completion, so partial runs never count."""
    try:
        with open(_log_path(job["name"])) as f:
            return job.get("done_tag", "ALL-DONE") in f.read()
    except OSError:
        return False


def _snapshot_results(job):
    for src in job.get("results", ()):
        try:
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(RESULTS,
                                               os.path.basename(src)))
        except OSError as e:
            print(f"snapshot {src}: {e}", flush=True)


def _probe():
    p = subprocess.Popen([sys.executable, "-c", _PROBE_SRC], cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    _write_pidfile(PROBE_PID, p.pid)
    try:
        out, _ = p.communicate(timeout=PROBE_TIMEOUT_S)
        return p.returncode == 0 and "PROBE-OK" in out
    except subprocess.TimeoutExpired:
        p.kill()
        p.communicate()
        return False
    finally:
        try:
            os.remove(PROBE_PID)
        except OSError:
            pass


def _wait_for_chip():
    while True:
        if _stop_requested() or time.time() - t0 > DEADLINE_S:
            return False
        if _probe():
            return True
        state["last_probe"] = f"unreachable {time.strftime('%T')}"
        _write_status()
        time.sleep(PROBE_INTERVAL_S)


def _run_once(job):
    """One attempt; returns 'done' | 'failed' | 'truncated' | 'stop'."""
    name, argv, tmo = job["name"], job["argv"], job["timeout_s"]
    js = state["jobs"].setdefault(name, {"attempts": 0})
    if time.time() - t0 > DEADLINE_S or _stop_requested():
        js["status"] = "stopped" if _stop_requested() else "deadline"
        _write_status()
        return "stop"
    if not _wait_for_chip():
        js["status"] = "no-chip-by-deadline"
        _write_status()
        return "stop"
    js["attempts"] += 1
    # Cap the job's runtime at the queue deadline: a job still holding
    # the chip when the round driver's own bench.py fires would hang
    # the tunnel and null the round's perf artifact (round 3's fate).
    # Jobs flush partial rows as they land, so truncation is lossless.
    eff_tmo = min(tmo, max(60.0, DEADLINE_S - (time.time() - t0)))
    js.update(status=f"running (attempt {js['attempts']})",
              start=time.strftime("%T"))
    _write_status()
    log = _log_path(name)
    print(f"RUN {name} attempt {js['attempts']} -> {log}", flush=True)
    with open(log, "a") as lf:
        lf.write(f"\n=== attempt {js['attempts']} "
                 f"{time.strftime('%F %T')} ===\n")
        lf.flush()
        p = subprocess.Popen(argv, cwd=REPO, stdout=lf,
                             stderr=subprocess.STDOUT)
        _write_pidfile(JOB_PID, p.pid)
        try:
            rc = p.wait(timeout=eff_tmo)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            rc = "timeout"
        finally:
            try:
                os.remove(JOB_PID)
            except OSError:
                pass
    _snapshot_results(job)
    ok = rc == 0 and _done(job)
    js.update(status="done" if ok else f"failed rc={rc}",
              end=time.strftime("%T"))
    _write_status()
    print(f"END {name}: {js['status']}", flush=True)
    if ok:
        return "done"
    if rc == "timeout" and eff_tmo < tmo:
        # Deadline truncation, not a tunnel death: the partial rows are
        # the best this job can do before round end — don't burn a
        # retry re-compiling from scratch.
        js["status"] = "truncated-at-deadline"
        _write_status()
        return "truncated"
    return "failed"


while True:
    if _stop_requested() or time.time() - t0 > DEADLINE_S:
        print("QUEUE-STOP",
              "stopped" if _stop_requested() else "deadline", flush=True)
        break
    try:
        jobs = _load_jobs()
    except (OSError, ValueError) as e:     # mid-edit of the jobs file
        print(f"jobs file unreadable ({e}); retrying", flush=True)
        time.sleep(10)
        continue
    pending = None
    for job in jobs:
        js = state["jobs"].setdefault(job["name"], {"attempts": 0})
        if _done(job):
            if js.get("status") != "done":
                js["status"] = "already-done"
            continue
        if js["attempts"] >= 2 or js.get("status") == "truncated-at-deadline":
            js.setdefault("status", "gave-up")
            continue
        pending = job
        break
    _write_status()
    if pending is None:
        # Everything known is done/given-up: idle-poll for appended jobs.
        state["last_probe"] = f"idle {time.strftime('%T')}"
        _write_status()
        time.sleep(IDLE_POLL_S)
        continue
    if _run_once(pending) == "stop":
        break
print("QUEUE-DONE", flush=True)
_write_status()
