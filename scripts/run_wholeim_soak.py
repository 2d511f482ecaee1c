"""wholeim 10k-step soak (round 3; device-resident data since round 5).

The 3000-step wholeim ledger (scripts/run_logo_wholeim_ledgers.py) shows
the slowest learning of any regime — hole-L2 falls 33% where the others
fall 5-25x — consistent with its task (corner-patch extrapolation) and the
reference's 500-FULL-epoch budget (train_wholeim_input.lua:46).  This soak
extends the same run protocol to 10,000 steps to establish whether the
curve keeps falling (under-trained at 3k, like the reference expects) or
plateaus/overtrains (like video's 10k soak, BASELINE.md:65).

Round-5 protocol change — ``dataDevice=1``: both round-4 attempts were
oom-killed at ~4,800 steps by the axon transport's host-memory leak
(~27 MB retained per step ≈ the host batch size; CLAUDE.md).  The leak's
cause is the per-step host→device batch upload itself, so the round-5
soak removes it: the 204-frame corpus lives in HBM and every batch is
synthesized inside the fused step (data/device_data.py) — per-step host
traffic is one int32 seed, so a single process reaches step 10,002.  The
sample DISTRIBUTION is identical to the host pipeline (parity-tested,
tests/test_device_data.py); the RNG stream differs, so curves are a
fresh draw of the same protocol, directly comparable to (not bitwise
continuous with) the round-4 partial curve.

Usage: python scripts/run_wholeim_soak.py
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

WORK = "/tmp/lw_ledgers"   # shares the ledger run's corpus
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("corpus"):
    synthetic.make_video_corpus("corpus", n_videos=4, frames=64,
                                h=180, w=240)
    synthetic.make_mask_png("mask.png", h=180, w=240)
    print("corpus built", flush=True)

from ledger_common import json_flusher, run_ledger  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402

# Same widths/corpus/seed as the 3000-step ledger; niter=1667 at 6
# steps/epoch -> 10,002 steps.  save=False: nothing is ever checkpointed —
# each full-width wholeim TrainState fetch is 4.5 GB over the axon tunnel,
# which HUNG the client (and took the tunnel relay down) on the first
# attempt of this soak (CLAUDE.md).  Every scored state (init, every
# score_every'th epoch, final) is evaluated DEVICE-RESIDENT
# (live_generator), and ROWS ARE FLUSHED TO DISK AS THEY LAND —
# score_every=250 (1500 steps) bounds a tunnel flap's loss to the last
# scoring point.
rows = []
_flush = json_flusher("wholeim_soak_results.json", rows)

run_ledger(Opt(DATA_ROOT="corpus", maskName="mask.png", loadSize=180,
               batchSize=32, nef=192, ngf=192, ndf=128, nBottleneck=6400,
               wtl2=0.999, weight_nomask=0.05, ntrain=192, nThreads=2,
               manualSeed=222, display=False, logEvery=1000, split=80,
               niter=1667, checkpointEvery=9999, name="wi_soak",
               dataDevice=True),
           "wholeim", ("train", "test"), rows,
           mid_tag="step3000", final_tag="step10002",
           max_steps=10002, save=False, score_every=250, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
