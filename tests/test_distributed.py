"""Multi-host helper tests (single-process semantics; the multi-process path
uses the same code with jax.process_count() > 1)."""

import jax
import numpy as np

from video_filler_tpu import parallel
from video_filler_tpu.parallel import distributed


def test_initialize_noop_single_process():
    distributed.initialize()  # no cluster env: must not raise
    assert jax.process_count() == 1


def test_process_batch_slice():
    start, size = distributed.process_batch_slice(64)
    assert (start, size) == (0, 64)


def test_global_batch_from_local():
    mesh = parallel.make_mesh(n_data=8)
    local = {"raw": np.arange(8 * 4 * 4 * 3, dtype=np.uint8)
             .reshape(8, 4, 4, 3)}
    global_batch = distributed.global_batch_from_local(mesh, local)
    arr = global_batch["raw"]
    assert arr.shape == (8, 4, 4, 3)
    assert arr.sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(arr), local["raw"])
    assert distributed.data_axis_size(mesh) == 8


def test_two_process_training_matches_single(tmp_path):
    """A REAL 2-process jax.distributed run on localhost (4 CPU devices per
    process, 8 global): each host feeds only its slice (asserted in the
    worker), the loop trains end-to-end, both hosts end with identical
    replicated params, host 0 alone writes checkpoints — and the result
    matches a single-process run on the same 8-device batch.

    The dataset is 8 identical 128x128 images, so the global batch content is
    independent of which host sampled which rows; with the in-jit RNG keyed on
    the shared seed, multi-process and single-process runs see the same math.
    """
    import os
    import subprocess
    import sys

    from video_filler_tpu.config import Opt
    from video_filler_tpu.data.synthetic import _texture
    from video_filler_tpu.train.loop import train
    from video_filler_tpu.utils.io import save_png

    img_dir = tmp_path / "data" / "images"
    img_dir.mkdir(parents=True)
    img = _texture(np.random.RandomState(0), 128, 128)
    for i in range(8):
        save_png(str(img_dir / f"im_{i:04d}.png"), img)

    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # free coordinator port (a hardcoded one collides across concurrent runs)
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    # stdout to FILES, not PIPE: sequential communicate() on coordinated
    # workers can deadlock if the un-drained worker fills its pipe buffer
    # and stops participating in the collectives.
    logs = [open(tmp_path / f"w{i}.log", "w") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(tmp_path / "data"),
         str(tmp_path / f"out{i}.npz")],
        cwd=str(tmp_path), env=env,
        stdout=logs[i], stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # don't leak a worker past a timeout failure
        for lf in logs:
            lf.close()
    outs = [(tmp_path / f"w{i}.log").read_text() for i in range(2)]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    d0 = np.load(tmp_path / "out0.npz")
    d1 = np.load(tmp_path / "out1.npz")
    assert int(d0["step"]) == int(d1["step"]) == 2
    # Replicated state must be identical on both hosts.
    np.testing.assert_array_equal(d0["params_g"], d1["params_g"])
    # Host 0 checkpoints; host 1 must not write (it logs to its own jsonl).
    assert (tmp_path / "checkpoints" / "mh_2_state.npz").exists()
    assert (tmp_path / "logs" / "mh.jsonl").exists()
    assert (tmp_path / "logs" / "mh_p1.jsonl").exists()

    # Single-process reference on the same data (same seed, same in-jit RNG):
    # Adam sign-noise bound as in the DP equivalence test.
    opt = Opt(DATA_ROOT=str(tmp_path / "data"), loadSize=128, wtl2=0.999,
              nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=8, nThreads=0,
              niter=2, ntrain=8, manualSeed=222, display=False,
              checkpointEvery=5, computeDtype="float32", name="mh_single")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        s_ref = train(opt, "center", quiet=True)
    finally:
        os.chdir(cwd)
    flat_ref = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(s_ref.params_g)])
    np.testing.assert_allclose(flat_ref, d0["params_g"], atol=8.1e-3)


def test_two_process_tp_checkpoint_and_resume(tmp_path):
    """modelParallel=2 spanning 2 processes: the TP-sharded bottleneck
    leaves are not addressable from either host alone, so checkpointing
    goes through the loop's collective gather.  The workers assert the
    save/restore roundtrip is exact vs the live sharded state and that
    autoResume continues under the same TP mesh; here we assert both hosts
    agree on the gathered final params and host 0 wrote the checkpoints."""
    import os
    import socket
    import subprocess
    import sys

    from video_filler_tpu.data.synthetic import _texture
    from video_filler_tpu.utils.io import save_png

    img_dir = tmp_path / "data" / "images"
    img_dir.mkdir(parents=True)
    img = _texture(np.random.RandomState(0), 128, 128)
    for i in range(8):
        save_png(str(img_dir / f"im_{i:04d}.png"), img)

    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    logs = [open(tmp_path / f"t{i}.log", "w") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(tmp_path / "data"),
         str(tmp_path / f"tout{i}.npz"), "tp"],
        cwd=str(tmp_path), env=env,
        stdout=logs[i], stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # don't leak a worker past a timeout failure
        for lf in logs:
            lf.close()
    outs = [(tmp_path / f"t{i}.log").read_text() for i in range(2)]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    d0 = np.load(tmp_path / "tout0.npz")
    d1 = np.load(tmp_path / "tout1.npz")
    assert int(d0["step"]) == int(d1["step"]) == 2
    np.testing.assert_array_equal(d0["params_g"], d1["params_g"])
    assert (tmp_path / "checkpoints" / "tp_1_state.npz").exists()
    assert (tmp_path / "checkpoints" / "tp_2_state.npz").exists()


def test_two_process_datadevice_matches_single(tmp_path):
    """dataDevice=1 over 2 processes: the corpus becomes a GLOBAL replicated
    array (after the cross-host checksum agreement) and batches are
    synthesized in-jit.  Because the batch stream is a pure function of
    (seed, step), the 2-process run must match a single-process dataDevice
    run on the SAME corpus of DISTINCT images — a stronger equivalence than
    the host-pipeline test above, which needs identical images to hide the
    loader's scheduling nondeterminism."""
    import os
    import socket
    import subprocess
    import sys

    from video_filler_tpu.config import Opt
    from video_filler_tpu.data.synthetic import _texture
    from video_filler_tpu.train.loop import train
    from video_filler_tpu.utils.io import save_png

    img_dir = tmp_path / "data" / "images"
    img_dir.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(8):  # distinct images — the device stream is exact
        save_png(str(img_dir / f"im_{i:04d}.png"), _texture(rs, 128, 128))

    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    logs = [open(tmp_path / f"dd{i}.log", "w") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(tmp_path / "data"),
         str(tmp_path / f"ddout{i}.npz"), "dd"],
        cwd=str(tmp_path), env=env,
        stdout=logs[i], stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # don't leak a worker past a timeout failure
        for lf in logs:
            lf.close()
    outs = [(tmp_path / f"dd{i}.log").read_text() for i in range(2)]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    d0 = np.load(tmp_path / "ddout0.npz")
    d1 = np.load(tmp_path / "ddout1.npz")
    assert int(d0["step"]) == int(d1["step"]) == 2
    np.testing.assert_array_equal(d0["params_g"], d1["params_g"])
    assert (tmp_path / "checkpoints" / "dd_2_state.npz").exists()

    # Single-process reference: same seed, same corpus, same in-jit batch
    # synthesis — agreement up to the collective reduction-order float
    # noise (amplified by Adam's rsqrt, same bound as the DP test above).
    opt = Opt(DATA_ROOT=str(tmp_path / "data"), loadSize=128, wtl2=0.999,
              nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=8, nThreads=0,
              niter=2, ntrain=8, manualSeed=222, display=False,
              checkpointEvery=5, dataDevice=True, computeDtype="float32",
              name="dd_single")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        s_ref = train(opt, "center", quiet=True)
    finally:
        os.chdir(cwd)
    flat_ref = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(s_ref.params_g)])
    np.testing.assert_allclose(flat_ref, d0["params_g"], atol=8.1e-3)


def test_two_process_resume_desync_aborts_both(tmp_path):
    """autoResume with a checkpoint visible to only one host (checkpointDir
    not a shared FS) must abort BOTH processes with a clear collective error
    instead of silently desyncing the SPMD programs."""
    import os
    import socket
    import subprocess
    import sys

    from video_filler_tpu.data.synthetic import _texture
    from video_filler_tpu.utils.io import save_png

    img_dir = tmp_path / "data" / "images"
    img_dir.mkdir(parents=True)
    img = _texture(np.random.RandomState(0), 128, 128)
    for i in range(8):
        save_png(str(img_dir / f"im_{i:04d}.png"), img)
    for i in range(2):
        (tmp_path / f"p{i}").mkdir()  # per-process cwd = per-process ckpt dir

    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    logs = [open(tmp_path / f"d{i}.log", "w") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(tmp_path / "data"),
         "unused", "desync"],
        cwd=str(tmp_path / f"p{i}"), env=env,
        stdout=logs[i], stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # don't leak a worker past a timeout failure
        for lf in logs:
            lf.close()
    outs = [(tmp_path / f"d{i}.log").read_text() for i in range(2)]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed unexpectedly:\n{o[-3000:]}"
        assert "desync detected as expected" in o
