'''Oracle tests for the geometry kernel library (numpy brute-force references).'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occlusions4d_tpu import ops


def _np_knn(query, keys, k):
    '''Brute-force oracle mirroring reference my_knn_torch semantics (sorted ascending).'''
    d = np.linalg.norm(query[:, None, :3] - keys[None, :, :3], axis=-1)
    idx = np.argsort(d, axis=-1, kind='stable')[:, :k]
    return np.take_along_axis(d, idx, axis=-1), idx


@pytest.mark.parametrize('n,m,k', [(64, 64, 8), (100, 300, 5), (257, 4100, 16)])
def test_knn_matches_bruteforce(n, m, k):
    rng = np.random.RandomState(0)
    q = rng.randn(n, 3).astype(np.float32) * 2.0
    kk = rng.randn(m, 3).astype(np.float32) * 2.0
    d_ref, i_ref = _np_knn(q, kk, k)
    d, i = ops.knn(q, kk, k, block_size=512)
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-4)


def test_knn_batched_and_masked():
    rng = np.random.RandomState(1)
    q = rng.randn(2, 50, 3).astype(np.float32)
    kk = rng.randn(2, 80, 3).astype(np.float32)
    mask = rng.rand(2, 80) > 0.3
    d, i = ops.knn(q, kk, 4, key_mask=mask, block_size=32)
    for b in range(2):
        valid_keys = kk[b][mask[b]]
        valid_inds = np.where(mask[b])[0]
        d_ref, i_ref = _np_knn(q[b], valid_keys, 4)
        np.testing.assert_array_equal(np.asarray(i[b]), valid_inds[i_ref])
        np.testing.assert_allclose(np.asarray(d[b]), d_ref, rtol=1e-4, atol=1e-4)


def test_knn_ascending_and_self():
    rng = np.random.RandomState(2)
    pts = rng.randn(40, 3).astype(np.float32)
    d, i = ops.knn(pts, pts, 6)
    d = np.asarray(d)
    # Self is the nearest neighbor with distance 0 and sorted ascending after.
    np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(40))
    assert np.all(np.diff(d, axis=-1) >= -1e-6)


def _np_fps(xyz, n_out, start=0):
    N = xyz.shape[0]
    sel = [start]
    min_d = np.full((N,), np.inf)
    for _ in range(n_out - 1):
        d = np.sum((xyz - xyz[sel[-1]]) ** 2, axis=-1)
        min_d = np.minimum(min_d, d)
        sel.append(int(np.argmax(min_d)))
    return np.array(sorted(sel))


@pytest.mark.parametrize('n,n_out', [(64, 16), (300, 100)])
def test_fps_matches_bruteforce(n, n_out):
    rng = np.random.RandomState(3)
    xyz = rng.randn(n, 3).astype(np.float32)
    idx = np.asarray(ops.fps(xyz, n_out))
    np.testing.assert_array_equal(idx, _np_fps(xyz, n_out))


def test_fps_deterministic_and_unique():
    rng = np.random.RandomState(4)
    xyz = rng.randn(200, 3).astype(np.float32)
    i1 = np.asarray(ops.fps(xyz, 50))
    i2 = np.asarray(ops.fps(xyz, 50))
    np.testing.assert_array_equal(i1, i2)
    assert len(np.unique(i1)) == 50


def test_fps_masked_never_selects_invalid():
    rng = np.random.RandomState(5)
    xyz = rng.randn(128, 3).astype(np.float32)
    valid = np.zeros(128, bool)
    valid[:64] = True
    idx = np.asarray(ops.fps(xyz, 32, valid=jnp.asarray(valid)))
    assert np.all(idx < 64)


def test_fps_batched_random_start():
    rng = np.random.RandomState(6)
    xyz = rng.randn(3, 100, 3).astype(np.float32)
    starts = jnp.array([0, 5, 99], jnp.int32)
    idx = np.asarray(ops.fps_batched(xyz, 25, start_idx=starts))
    assert idx.shape == (3, 25)
    for b, s in enumerate([0, 5, 99]):
        np.testing.assert_array_equal(idx[b], _np_fps(xyz[b], 25, start=s))


def test_cuboid_masks_match_reference_tables():
    # CARLA cube_mode=4 input: x in [-0.7b, 2.5b], y in [-b, b], z in [min_z, 0.5b].
    c = ops.carla_input_bounds(20.0, -0.5, cube_mode=4)
    assert c == ops.Cuboid(-14.0, 50.0, -20.0, 20.0, -0.5, 10.0)
    # CARLA cube_mode=4 output with padding 2: x in [-2, 2.5b+2], z_max = 0.4b.
    c = ops.carla_output_bounds(16.0, -0.5, cube_mode=4, padding=2.0)
    assert c == ops.Cuboid(-2.0, 42.0, -18.0, 18.0, -0.5, 6.4)
    g = ops.greater_bounds(5.0, -1.0)
    assert g == ops.Cuboid(-5.0, 5.0, -5.0, 5.0, -1.0, 5.0)

    pts = np.array([[0, 0, 0], [60, 0, 0], [0, 0, -1]], np.float32)
    m = np.asarray(ops.cuboid_mask(pts, ops.carla_input_bounds(20.0, -0.5, 4)))
    np.testing.assert_array_equal(m, [True, False, False])


def test_greater_floor_mask():
    # Points below the inverted pyramid boundary are floor.
    pts = np.array([[0.0, 0.0, 0.0],      # center: (0 - 4.5)/3.5 < 0 -> keep.
                    [8.0, 0.0, 0.0],      # (8-4.5)/3.5 = 1.0 > z=0 -> drop.
                    [8.0, 0.0, 1.5]],     # above boundary -> keep.
                   np.float32)
    m = np.asarray(ops.greater_floor_mask(pts))
    np.testing.assert_array_equal(m, [True, False, True])


def test_sample_uniform_3ball_stats():
    key = jax.random.PRNGKey(0)
    pts = np.asarray(ops.sample_uniform_3ball(key, 20000, 2.0))
    r = np.linalg.norm(pts, axis=-1)
    assert r.max() <= 2.0 + 1e-5
    # Uniform ball: E[r] = 3/4 R.
    assert abs(r.mean() - 1.5) < 0.02
    # Shell sampling respects min radius.
    pts = np.asarray(ops.sample_uniform_3ball(key, 5000, 3.0, min_radius=1.0))
    r = np.linalg.norm(pts, axis=-1)
    assert r.min() >= 1.0 - 1e-5 and r.max() <= 3.0 + 1e-5


def test_grid_points_matches_reference_algorithm():
    # Oracle: transcription of geometry.py:1257-1275 for a GREATER cube.
    num_sample, b, min_z = 1000, 5.0, -1.0
    (x_min, x_max), (y_min, y_max), (z_min, z_max) = (-b, b), (-b, b), (min_z, b)
    volume = (x_max - x_min) * (y_max - y_min) * (z_max - z_min)
    per_unit = np.cbrt(num_sample / volume)
    nx = int(np.ceil(per_unit * (x_max - x_min)))
    ny = int(np.ceil(per_unit * (y_max - y_min)))
    nz = int(np.ceil(per_unit * (z_max - z_min)))
    assert nx * ny * nz > 0

    pts = ops.blind_points_numpy(num_sample, min_z, b, 3, 'greater', 4, 'grid')
    assert pts.shape == (nx * ny * nz, 4)
    np.testing.assert_allclose(pts[:, 3], 3.0)
    # z varies fastest, x slowest.
    assert pts[0, 2] != pts[1, 2] and pts[0, 0] == pts[1, 0]
    assert pts[:, 0].min() > x_min and pts[:, 0].max() < x_max


def test_blind_points_random_bounds_carla():
    rng = np.random.RandomState(7)
    pts = ops.blind_points_numpy(4096, -0.5, 16.0, 1, 'carla', 4, 'random', rng=rng)
    assert pts.shape == (4096, 4)
    assert pts[:, 0].min() >= 0.0 and pts[:, 0].max() <= 40.0
    assert pts[:, 1].min() >= -16.0 and pts[:, 1].max() <= 16.0
    assert pts[:, 2].min() >= -0.5 and pts[:, 2].max() <= 6.4


def test_take_valid_and_duplication():
    x = np.arange(10, dtype=np.float32)[:, None]
    valid = np.array([0, 1, 0, 1, 1, 0, 0, 0, 0, 0], bool)
    rows, cnt = ops.take_valid(jnp.asarray(x), jnp.asarray(valid), 7)
    rows = np.asarray(rows)[:, 0]
    assert int(cnt) == 3
    np.testing.assert_array_equal(rows, [1, 3, 4, 1, 3, 4, 1])


def test_masked_choice_uniform_over_valid():
    key = jax.random.PRNGKey(1)
    valid = np.zeros(100, bool)
    valid[10:20] = True
    idx, ok = ops.masked_choice(key, jnp.asarray(valid), 5000)
    idx = np.asarray(idx)
    assert bool(ok)
    assert idx.min() >= 10 and idx.max() < 20
    counts = np.bincount(idx - 10, minlength=10) / 5000
    np.testing.assert_allclose(counts, 0.1, atol=0.02)


def test_masked_choice_weighted():
    key = jax.random.PRNGKey(2)
    valid = np.array([True, True, False, True])
    w = np.array([1.0, 2.0, 100.0, 1.0])
    idx, ok = ops.masked_choice(key, jnp.asarray(valid), 8000, weights=jnp.asarray(w))
    idx = np.asarray(idx)
    assert 2 not in idx
    frac1 = (idx == 1).mean()
    assert abs(frac1 - 0.5) < 0.03


@pytest.mark.parametrize('n', [1000, 40000])  # straddles the 32768 'auto' gate.
def test_masked_choice_lowerings_bit_identical(n, monkeypatch):
    '''The three searchsorted lowerings ('scan', 'sort', 'unrolled') plus the
    length-gated 'auto' must draw bit-identical indices: the gate is a pure
    performance policy (PERFLOG round 4) and must never shift the RNG-visible
    sample stream. Also semantically pinned against numpy searchsorted fed the
    device-computed cdf/u (a fully-host cdf oracle differs on boundary draws
    from f32 cumsum accumulation order).'''
    from occlusions4d_tpu.ops import select as select_mod
    rng = np.random.RandomState(3)
    valid = rng.rand(n) > 0.4
    weights = rng.rand(n).astype(np.float32) + 0.1
    key = jax.random.PRNGKey(4)
    n_draw = 4096

    draws = {}
    for mode in ('auto', 'scan', 'sort', 'unrolled'):
        monkeypatch.setattr(select_mod, 'SEARCHSORTED_MODE', mode)
        idx, ok = ops.masked_choice(key, jnp.asarray(valid), n_draw,
                                    weights=jnp.asarray(weights))
        assert bool(ok)
        draws[mode] = np.asarray(idx)
    for mode in ('scan', 'sort', 'unrolled'):
        np.testing.assert_array_equal(draws['auto'], draws[mode], err_msg=mode)

    # Semantic oracle on the device-computed MONOTONE cdf and uniforms (raw
    # cumsum is not sorted — np.searchsorted on it would itself be undefined
    # at the tree-scan dip sites).
    w = jnp.where(jnp.asarray(valid), jnp.asarray(weights), 0.0)
    cdf = np.maximum.accumulate(np.asarray(jnp.cumsum(w)))
    u = np.asarray(jax.random.uniform(key, (n_draw,))
                   * jnp.maximum(jnp.asarray(cdf)[-1], 1e-30))
    assert (np.diff(cdf) >= 0).all()
    expect = np.minimum(np.searchsorted(cdf, u, side='right'), n - 1)
    np.testing.assert_array_equal(draws['auto'], expect)
    assert valid[draws['auto']].all()
    # Every draw sits strictly inside a positive-weight cdf step (the u scale
    # is cdf[-1], not the pairwise jnp.sum, so no draw can fall off the end).
    assert (u < cdf[-1]).all()


def test_knn_interpolate_exact_at_source():
    rng = np.random.RandomState(8)
    pts = rng.randn(50, 3).astype(np.float32)
    feats = rng.randn(50, 4).astype(np.float32)
    out = np.asarray(ops.knn_interpolate(feats, pts, pts, k=3, eps=1e-7))
    # At a source location the weight on the exact match dominates (1/eps).
    np.testing.assert_allclose(out, feats, atol=1e-2)


def test_nn1_min_dist_blockwise():
    rng = np.random.RandomState(9)
    q = rng.randn(70, 3).astype(np.float32)
    kk = rng.randn(900, 3).astype(np.float32)
    d = np.asarray(ops.nn1_min_dist(q, kk, block_size=128))
    d_ref = np.linalg.norm(q[:, None] - kk[None], axis=-1).min(axis=-1)
    np.testing.assert_allclose(d, d_ref, rtol=1e-4, atol=1e-4)


def test_nn1_bidirectional_matches_two_passes():
    '''One bidirectional pass == two masked nn1 passes (exact, both directions).'''
    rng = np.random.RandomState(11)
    a = rng.randn(2, 300, 3).astype(np.float32)
    b = rng.randn(2, 450, 3).astype(np.float32)
    am = rng.rand(2, 300) > 0.3
    bm = rng.rand(2, 450) > 0.3
    d_a, d_b = ops.nn1_bidirectional(a, b, a_mask=am, b_mask=bm)
    for i in range(2):
        ref_a = np.linalg.norm(a[i][:, None] - b[i][bm[i]][None], axis=-1).min(-1)
        ref_b = np.linalg.norm(b[i][:, None] - a[i][am[i]][None], axis=-1).min(-1)
        np.testing.assert_allclose(np.asarray(d_a[i]), ref_a, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(d_b[i]), ref_b, rtol=1e-4, atol=1e-4)


def test_nn1_bidirectional_under_vmap():
    '''The sampler calls it per example under vmap; semantics must not change.'''
    import jax
    rng = np.random.RandomState(12)
    a = rng.randn(3, 120, 3).astype(np.float32)
    b = rng.randn(3, 200, 3).astype(np.float32)
    bm = rng.rand(3, 200) > 0.5
    d_a, d_b = jax.vmap(lambda aa, bb, mm: ops.nn1_bidirectional(
        aa, bb, b_mask=mm))(a, b, bm)
    d_a2, d_b2 = ops.nn1_bidirectional(a, b, b_mask=bm)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_a2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_b2), rtol=1e-5)


def test_knn_spatial_matches_bruteforce():
    '''Morton-sorted bbox-pruned kernel: exact distances and (tie-free) indices.'''
    rng = np.random.RandomState(21)
    q = rng.randn(2, 700, 3).astype(np.float32) * 2.0
    kk = rng.randn(2, 1500, 3).astype(np.float32) * 2.0
    d, i = ops.knn(q, kk, 8, use_pallas=True, spatial=True)
    for b in range(2):
        d_ref, i_ref = _np_knn(q[b], kk[b], 8)
        np.testing.assert_array_equal(np.asarray(i[b]), i_ref)
        np.testing.assert_allclose(np.asarray(d[b]), d_ref, rtol=1e-4, atol=1e-4)


def test_knn_spatial_self_and_masked():
    rng = np.random.RandomState(22)
    pts_np = rng.randn(1, 900, 3).astype(np.float32)
    pts = jnp.asarray(pts_np)
    # Self-attention path (same array -> one sort): nearest neighbor is self.
    d, i = ops.knn(pts, pts, 5, use_pallas=True, spatial=True)
    np.testing.assert_array_equal(np.asarray(i)[0, :, 0], np.arange(900))
    np.testing.assert_allclose(np.asarray(d)[0, :, 0], 0.0, atol=1e-3)
    # Masked keys are never returned.
    mask = rng.rand(1, 900) > 0.4
    d, i = ops.knn(pts, pts, 5, key_mask=jnp.asarray(mask), use_pallas=True,
                   spatial=True)
    d_ref, i_ref = _np_knn(pts_np[0], pts_np[0][mask[0]], 5)
    valid_inds = np.where(mask[0])[0]
    np.testing.assert_array_equal(np.asarray(i)[0], valid_inds[i_ref])
    np.testing.assert_allclose(np.asarray(d)[0], d_ref, rtol=1e-4, atol=1e-4)


def test_knn_spatial_clustered_data():
    '''Clustered far-apart data (the pruning-friendly case) stays exact.

    Indices are compared as per-row SETS with distances to tolerance: at
    coordinate scale ~10 the |a|^2+|b|^2-2ab expansion (identical to the
    reference's square_distance f32 numerics) loses ~5e-4 relative precision
    to cancellation, which can swap the order of near-tied neighbors relative
    to a direct-norm oracle; the neighbor set itself is unaffected.'''
    rng = np.random.RandomState(23)
    centers = rng.randn(8, 3).astype(np.float32) * 10.0
    kk = (centers[rng.randint(0, 8, 1200)]
          + rng.randn(1200, 3).astype(np.float32) * 0.3)[None]
    q = (centers[rng.randint(0, 8, 500)]
         + rng.randn(500, 3).astype(np.float32) * 0.3)[None]
    d, i = ops.knn(q, kk, 6, use_pallas=True, spatial=True)
    d_ref, i_ref = _np_knn(q[0], kk[0], 6)
    # atol: the expansion's absolute error on d is ~eps*|coord|^2/(2d), i.e.
    # ~1e-3 for the smallest distances at coordinate scale 10.
    np.testing.assert_allclose(np.asarray(d)[0], d_ref, rtol=1e-3, atol=3e-3)
    i_np = np.asarray(i)[0]
    mismatch = (np.sort(i_np, axis=1) != np.sort(i_ref, axis=1)).any(axis=1)
    # Allow set differences only where the boundary pair is a numerical
    # near-tie (|d_k - d_{k+1}| within the cancellation error).
    d_full = np.linalg.norm(q[0][:, None] - kk[0][None], axis=-1)
    d7 = np.sort(d_full, axis=1)[:, :7]
    near_tie = (d7[:, 6] - d7[:, 5]) < 2e-3 * np.maximum(d7[:, 6], 1.0)
    assert not (mismatch & ~near_tie).any()


def test_knn_spatial_scalar_bounds_bit_identical():
    '''The SMEM scalar-unit bound-test variant must return bit-identical
    (distances, indices) to the vector-bound kernel: its stale carried bound
    only admits extra can't-contribute blocks, whose strict insertions all
    fail. Covered on clustered data (pruning active) at two block sizes.'''
    from occlusions4d_tpu.ops.pallas_knn import knn_pallas_spatial
    rng = np.random.RandomState(31)
    centers = rng.randn(6, 3).astype(np.float32) * 8.0
    kk = (centers[rng.randint(0, 6, 2000)]
          + rng.randn(2000, 3).astype(np.float32) * 0.4)[None]
    q = (centers[rng.randint(0, 6, 700)]
         + rng.randn(700, 3).astype(np.float32) * 0.4)[None]
    for bk in (256, 512):
        d0, i0 = knn_pallas_spatial(jnp.asarray(q), jnp.asarray(kk), 6,
                                    block_k=bk, scalar_bounds=False)
        d1, i1 = knn_pallas_spatial(jnp.asarray(q), jnp.asarray(kk), 6,
                                    block_k=bk, scalar_bounds=True)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    # Self path + key mask, small N (padding edge cases).
    pts = jnp.asarray(rng.randn(1, 611, 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(1, 611) > 0.3)
    d0, i0 = knn_pallas_spatial(pts, pts, 5, key_mask=mask, block_k=256,
                                scalar_bounds=False)
    d1, i1 = knn_pallas_spatial(pts, pts, 5, key_mask=mask, block_k=256,
                                scalar_bounds=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    # B=2: the scalar kernel's batch indexing (bbox_ref[b_idx] SMEM row,
    # tbox row b*n_tiles+t) is production-reachable now that scalar bounds
    # are the default; pin it against the vector kernel AND brute force.
    kk2 = np.stack([kk[0], kk[0][::-1] * 1.3 + 2.0])
    q2 = np.stack([q[0], q[0][::-1] * 1.3 + 2.0])
    d0, i0 = knn_pallas_spatial(jnp.asarray(q2), jnp.asarray(kk2), 6,
                                block_k=256, scalar_bounds=False)
    d1, i1 = knn_pallas_spatial(jnp.asarray(q2), jnp.asarray(kk2), 6,
                                block_k=256, scalar_bounds=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    for b in range(2):
        _, i_ref = _np_knn(q2[b], kk2[b], 6)
        same = np.sort(np.asarray(i1)[b], 1) == np.sort(i_ref, 1)
        assert same.mean() > 0.999  # near-tie swaps only.
