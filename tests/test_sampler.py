'''Guided point sampler tests: budgets, bias mixtures, air/solid separation.'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occlusions4d_tpu.sampler import SamplerConfig, GuidedPointSampler


def _greater_frame(rng, m=2000, m_cap=2048):
    '''(M_cap, 9) GREATER-layout target: (x, y, z, inst, view, R, G, B, mark).'''
    pts = np.zeros((m_cap, 9), np.float32)
    pts[:m, :3] = rng.rand(m, 3) * 8.0 - 4.0
    pts[:m, 2] = rng.rand(m) * 4.0  # z in [0, 4].
    pts[:m, 3] = rng.randint(0, 5, m)
    pts[:m, 4] = rng.randint(0, 4, m)
    pts[:m, 5:8] = rng.rand(m, 3)
    pts[:m, 8] = (rng.rand(m) > 0.8).astype(np.float32)
    valid = np.zeros(m_cap, bool)
    valid[:m] = True
    return pts, valid


def _carla_frame(rng, m=3000, m_cap=3072):
    '''(M_cap, 11) CARLA layout: (x,y,z,cos,inst,sem,view,R,G,B,mark).'''
    pts = np.zeros((m_cap, 11), np.float32)
    pts[:m, 0] = rng.rand(m) * 38.0 + 0.5
    pts[:m, 1] = rng.rand(m) * 30.0 - 15.0
    pts[:m, 2] = rng.rand(m) * 5.0
    pts[:m, 3] = rng.rand(m)
    pts[:m, 4] = rng.randint(0, 20, m)
    pts[:m, 5] = rng.randint(0, 23, m)
    pts[:m, 6] = rng.randint(0, 4, m)
    pts[:m, 7:10] = rng.rand(m, 3)
    valid = np.zeros(m_cap, bool)
    valid[:m] = True
    return pts, valid


def test_solid_budget_and_targets_greater():
    rng = np.random.RandomState(0)
    tgt, valid = _greater_frame(rng)
    other, ovalid = _greater_frame(rng)
    cfg = SamplerConfig(min_z=-1.0, cube_bounds=5.0, point_occupancy_radius=0.2,
                        num_solid=512, num_air=768, data_kind='greater')
    s = GuidedPointSampler(cfg)
    res = s.sample_frame(jax.random.PRNGKey(0), jnp.asarray(tgt), jnp.asarray(valid),
                         jnp.asarray(other), jnp.asarray(ovalid),
                         jnp.zeros(32, jnp.int32), jnp.asarray(0), 3)
    si, st = np.asarray(res['solid_input']), np.asarray(res['solid_target'])
    ai, at = np.asarray(res['air_input']), np.asarray(res['air_target'])
    assert si.shape == (512, 4) and st.shape == (512, 6)
    assert ai.shape == (768, 4) and at.shape == (768, 6)
    assert bool(res['ok'])
    np.testing.assert_allclose(si[:, 3], 3.0)  # time channel.
    np.testing.assert_allclose(ai[:, 3], 3.0)
    np.testing.assert_allclose(st[:, 0], 1.0)  # solid density.
    np.testing.assert_allclose(at[:, 0], 0.0)  # air density.
    np.testing.assert_allclose(at[:, 1:], -1.0)
    np.testing.assert_allclose(st[:, 5], -1.0)  # no segmentation head.
    # Colors copied from valid target rows.
    assert st[:, 1:4].min() >= 0.0 and st[:, 1:4].max() <= 1.0


def test_solid_points_near_target_air_points_far():
    rng = np.random.RandomState(1)
    tgt, valid = _greater_frame(rng)
    other, ovalid = _greater_frame(rng)
    r = 0.2
    cfg = SamplerConfig(min_z=0.0, cube_bounds=5.0, point_occupancy_radius=r,
                        num_solid=256, num_air=512, data_kind='greater')
    s = GuidedPointSampler(cfg)
    res = s.sample_frame(jax.random.PRNGKey(1), jnp.asarray(tgt), jnp.asarray(valid),
                         jnp.asarray(other), jnp.asarray(ovalid),
                         jnp.zeros(32, jnp.int32), jnp.asarray(0), 0)
    si = np.asarray(res['solid_input'])[:, :3]
    ai = np.asarray(res['air_input'])[:, :3]
    txyz = tgt[valid][:, :3]
    d_solid = np.linalg.norm(si[:, None] - txyz[None], axis=-1).min(-1)
    d_air = np.linalg.norm(ai[:, None] - txyz[None], axis=-1).min(-1)
    # Solid queries jittered <= r/2 from a target point.
    assert d_solid.max() <= r / 2 + 1e-5
    # Air strictly farther than r from every target point.
    assert d_air.min() > r - 1e-6


def test_air_fraction_shares_none_bias():
    '''With bias 'none', air shares must be exactly (0.5, 0, 0.3, 0.2).'''
    rng = np.random.RandomState(2)
    tgt, valid = _greater_frame(rng)
    cfg = SamplerConfig(min_z=0.0, cube_bounds=5.0, num_solid=128, num_air=256,
                        data_kind='greater')
    s = GuidedPointSampler(cfg)
    res = s.sample_frame(jax.random.PRNGKey(2), jnp.asarray(tgt), jnp.asarray(valid),
                         jnp.asarray(tgt), jnp.asarray(valid),
                         jnp.zeros(32, jnp.int32), jnp.asarray(0), 0)
    np.testing.assert_allclose(np.asarray(res['air_sbs']), [0.5, 0.0, 0.3, 0.2])
    np.testing.assert_allclose(np.asarray(res['solid_sbs']), [1, 0, 0, 0, 0, 0])


def test_carla_bias_mixture_shares():
    rng = np.random.RandomState(3)
    tgt, valid = _carla_frame(rng)
    other, ovalid = _carla_frame(rng)
    # Make the 'other' frame identical except a moved cluster, so 'moving' triggers.
    other = tgt.copy()
    other[:400, :3] += 5.0
    cfg = SamplerConfig(min_z=-0.5, cube_bounds=16.0, point_occupancy_radius=0.2,
                        num_solid=512, num_air=716, data_kind='carla', cube_mode=4,
                        predict_segmentation=True, semantic_classes=13,
                        point_sample_bias='low_moving_ivalo_sembal')
    s = GuidedPointSampler(cfg)
    valo = np.full(256, -1, np.int32)
    valo[:3] = [1, 2, 3]
    res = s.sample_frame(jax.random.PRNGKey(3), jnp.asarray(tgt), jnp.asarray(valid),
                         jnp.asarray(other), jnp.asarray(ovalid),
                         jnp.asarray(valo), jnp.asarray(3), 2)
    sbs = np.asarray(res['solid_sbs'])
    # (regular, low, moving, vehped, ivalo, sembal): low (plenty of z in [0,2]),
    # moving (400 moved points >= 256 -> 0.4), sembal 0.4; vehped token absent -> 0.
    assert sbs[1] > 0 and sbs[2] > 0 and sbs[5] > 0
    assert sbs[3] == 0.0
    np.testing.assert_allclose(sbs.sum(), 1.0, rtol=1e-5)
    st = np.asarray(res['solid_target'])
    # Segmentation head on: targets in [0, 13) after the 'Other' remap.
    assert st[:, 5].min() >= 0 and st[:, 5].max() < 13
    # CARLA air stays in the output cuboid up to jitter slack: blind points are inside,
    # but hard-negative shells around boundary points may stick out by <= 3r
    # (the reference filters air only by distance to target, geometry.py:1009-1050).
    ai = np.asarray(res['air_input'])
    slack = 3 * 0.2
    assert ai[:, 0].min() >= 0.0 - slack and ai[:, 2].max() <= 16.0 * 0.4 + slack


def test_sampler_jits_and_vmaps():
    rng = np.random.RandomState(4)
    tgts, valids = zip(*[_greater_frame(rng) for _ in range(2)])
    tgt = jnp.asarray(np.stack(tgts))
    valid = jnp.asarray(np.stack(valids))
    cfg = SamplerConfig(min_z=0.0, cube_bounds=5.0, num_solid=128, num_air=192,
                        data_kind='greater')
    s = GuidedPointSampler(cfg)

    @jax.jit
    def run(key, tgt, valid):
        keys = jax.random.split(key, tgt.shape[0])
        fn = lambda k, t, v: s.sample_frame(k, t, v, t, v,
                                            jnp.zeros(32, jnp.int32),
                                            jnp.asarray(0), 1)
        return jax.vmap(fn)(keys, tgt, valid)

    res = run(jax.random.PRNGKey(5), tgt, valid)
    assert res['solid_input'].shape == (2, 128, 4)
    assert res['air_input'].shape == (2, 192, 4)
    assert bool(jnp.all(res['ok']))


def test_dry_air_pool_falls_back_to_regular():
    '''A biased air pool whose every candidate is rejected (dense scene) must NOT
    emit rejected candidates as air labels (silent label noise within
    point_occupancy_radius of solid targets); it falls back to the regular blind
    pool's survivors. Mirrors the reference's hard-error + step-skip semantics
    (/root/reference/utils/geometry.py:1095-1105, train.py:87-94).'''
    rng = np.random.RandomState(11)
    r = 0.5
    m, m_cap = 1900, 2048
    # Dense ball of radius 4r: shell candidates around interior targets land
    # within r of another target with high probability, so the small hsq/ht
    # pools (num_air=20 -> 6/4 slots, 12/8 candidates) occasionally go dry.
    pts = np.zeros((m_cap, 9), np.float32)
    v = rng.randn(m, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts[:m, :3] = v * (rng.rand(m, 1) ** (1 / 3)) * 4 * r
    pts[:m, 5:8] = rng.rand(m, 3)
    valid = np.zeros(m_cap, bool)
    valid[:m] = True
    cfg = SamplerConfig(min_z=-5.0, cube_bounds=5.0, point_occupancy_radius=r,
                        num_solid=32, num_air=20, data_kind='greater')
    s = GuidedPointSampler(cfg)
    tgt_j, valid_j = jnp.asarray(pts), jnp.asarray(valid)
    run = jax.jit(lambda k: s.sample_frame(k, tgt_j, valid_j, tgt_j, valid_j,
                                           jnp.zeros(32, jnp.int32),
                                           jnp.asarray(0), 0))
    txyz = pts[valid][:, :3]
    dry_seen = False
    for seed in range(60):
        res = run(jax.random.PRNGKey(seed))
        counts = np.asarray(res['air_pool_counts'])
        assert bool(res['ok'])  # regular pool always survives (cuboid >> ball).
        assert counts[3] > 0
        dry_seen = dry_seen or counts[1] == 0 or counts[2] == 0
        ai = np.asarray(res['air_input'])[:, :3]
        d_air = np.linalg.norm(ai[:, None] - txyz[None], axis=-1).min(-1)
        assert d_air.min() > r - 1e-6, f'seed {seed}: air point within r of target'
    assert dry_seen, 'scene never produced a dry pool; test exercises nothing'


def test_all_air_pools_dry_flags_frame_not_ok():
    '''When even the regular blind pool has zero survivors (targets saturate the
    whole query cuboid), the frame is flagged not-ok so its loss weight is
    zeroed — the jittable equivalent of the reference skipping the step.'''
    r = 0.5
    # Grid covering the full GREATER blind cuboid [-1,1]^2 x [0,1] at spacing
    # 0.25: every point of the cuboid is within 0.25*sqrt(3)/2 < r of a target.
    g = np.arange(-1.0, 1.01, 0.25, dtype=np.float32)
    gz = np.arange(0.0, 1.01, 0.25, dtype=np.float32)
    xyz = np.stack(np.meshgrid(g, g, gz, indexing='ij'), -1).reshape(-1, 3)
    m, m_cap = xyz.shape[0], 512
    pts = np.zeros((m_cap, 9), np.float32)
    pts[:m, :3] = xyz
    pts[:m, 5:8] = 0.5
    valid = np.zeros(m_cap, bool)
    valid[:m] = True
    cfg = SamplerConfig(min_z=0.0, cube_bounds=1.0, point_occupancy_radius=r,
                        num_solid=64, num_air=64, data_kind='greater')
    s = GuidedPointSampler(cfg)
    res = s.sample_frame(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(valid),
                         jnp.asarray(pts), jnp.asarray(valid),
                         jnp.zeros(32, jnp.int32), jnp.asarray(0), 0)
    assert np.asarray(res['air_pool_counts'])[3] == 0
    assert not bool(res['ok'])


def test_low_bias_share_and_block():
    '''With 'low' bias and plenty of low points, first block draws z in [0, 2].'''
    rng = np.random.RandomState(6)
    tgt, valid = _greater_frame(rng)
    cfg = SamplerConfig(min_z=-1.0, cube_bounds=5.0, num_solid=400, num_air=100,
                        data_kind='greater', point_sample_bias='low',
                        point_occupancy_radius=0.2)
    s = GuidedPointSampler(cfg)
    res = s.sample_frame(jax.random.PRNGKey(7), jnp.asarray(tgt), jnp.asarray(valid),
                         jnp.asarray(tgt), jnp.asarray(valid),
                         jnp.zeros(32, jnp.int32), jnp.asarray(0), 0)
    sbs = np.asarray(res['solid_sbs'])
    np.testing.assert_allclose(sbs, [0.5, 0.5, 0, 0, 0, 0])
    si = np.asarray(res['solid_input'])
    # First floor(0.5 * 400) = 200 slots are the 'low' block: z in [0, 2] +- jitter.
    assert si[:200, 2].max() <= 2.0 + 0.1 + 1e-5
    assert si[:200, 2].min() >= 0.0 - 0.1 - 1e-5
