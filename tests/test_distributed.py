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
