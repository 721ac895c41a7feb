'''Pallas kernel parity tests (run in interpreter mode on the CPU test platform;
the same kernels compile via Mosaic on real TPU).'''

import jax.numpy as jnp
import numpy as np
import pytest

from occlusions4d_tpu.ops.fps import fps_batched
from occlusions4d_tpu.ops.pallas_fps import fps_pallas_batched


@pytest.fixture
def rng():
    return np.random.RandomState(17)


def test_fps_pallas_matches_xla(rng):
    xyz = jnp.asarray(rng.rand(2, 300, 3).astype(np.float32))
    a = fps_pallas_batched(xyz, 64)
    b = fps_batched(xyz, 64, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fps_pallas_start_idx_and_mask(rng):
    xyz = jnp.asarray(rng.rand(2, 200, 3).astype(np.float32))
    valid = jnp.asarray(rng.rand(2, 200) > 0.4)
    # Start indices must point at valid entries (the random_start_indices contract).
    start = jnp.asarray([int(np.flatnonzero(np.asarray(valid)[b])[0])
                         for b in range(2)], jnp.int32)
    a = fps_pallas_batched(xyz, 32, valid=valid, start_idx=start)
    b = fps_batched(xyz, 32, valid=valid, start_idx=start, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Masked-out points are never selected.
    sel = np.asarray(a)
    v = np.asarray(valid)
    for bi in range(2):
        assert v[bi][sel[bi]].all()


def test_fps_pallas_unsorted_first_is_start(rng):
    xyz = jnp.asarray(rng.rand(1, 150, 3).astype(np.float32))
    out = fps_pallas_batched(xyz, 16, start_idx=jnp.asarray([5], jnp.int32),
                             sort_result=False)
    assert int(out[0, 0]) == 5


def test_fps_pallas_n_out_one(rng):
    xyz = jnp.asarray(rng.rand(1, 130, 3).astype(np.float32))
    out = fps_pallas_batched(xyz, 1, start_idx=jnp.asarray([9], jnp.int32))
    assert out.shape == (1, 1) and int(out[0, 0]) == 9


def test_fps_pallas_non_multiple_of_128(rng):
    # N and n_out both off the lane boundary.
    xyz = jnp.asarray(rng.rand(1, 391, 3).astype(np.float32))
    a = fps_pallas_batched(xyz, 137)
    b = fps_batched(xyz, 137, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
