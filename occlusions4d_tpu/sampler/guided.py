'''
Guided implicit point sampler: per frame, builds `num_solid` solid query/target pairs
from the ground-truth cloud plus `num_air` air (free space) pairs, with a controlled
bias mixture — fully jittable.

Capability parity with GuidedImplicitPointSampler
(/root/reference/utils/geometry.py:578-1105), redesigned for fixed shapes:

  * Solid bias mixture (regular / low / moving / vehped / ivalo / sembal,
    geometry.py:788-906): the reference draws contiguous per-bias blocks of
    int(share * num_solid) rows via randint over boolean-compacted pools. Here each
    slot's bias category comes from the same floor-count block boundaries, and pool
    draws are weighted inverse-CDF samples over masks (ops.select.masked_choice) - the
    same distribution without compaction. `sembal`'s equal-per-class quota becomes a
    per-point weight 1/count(class) over eligible (>= 16 point) classes; `ivalo`'s
    duplicate-append for fully occluded instances (geometry.py:837-842) becomes weight 2.
  * Air construction (geometry.py:940-1093): per-bias candidate pools of static
    worst-case size, oversampled by the reference's factors (1.6 / 2.0 / 2.0 /
    1.3|1.1), rejected by 1-NN distance to the target (> point_occupancy_radius,
    blockwise streaming instead of the 2^27-element slice budget), and repacked with
    select_safely-style cyclic duplication when a pool runs dry.
  * 'moving' dynamic-region detection (geometry.py:697-728): points of one frame
    farther than 2 * radius from every point of a random other frame. The reference
    approximates this on a shuffled slice purely to bound GPU memory; the streaming
    1-NN here uses the full clouds (strictly higher fidelity, same intent).

The sampler runs per example; vmap over the batch replaces the reference's
inside-DataParallel execution (train.py:290).
'''

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import (carla_output_bounds, cuboid_mask, nn1_min_dist,
                   nn1_bidirectional, masked_choice, sample_uniform_3ball,
                   sample_blind_random, blind_sample_bounds, valid_first_order)

__all__ = ['SamplerConfig', 'GuidedPointSampler']

# Column layout of target point clouds (geometry.py:780-783).
_COLS = {
    'greater': dict(inst=3, segm=3, view=4, E=9),
    'carla': dict(inst=4, segm=5, view=6, E=11),
}
_MAX_SEM_CLASSES = 32  # capacity for sembal class bookkeeping (CARLA has 23 tags).


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    min_z: float = -1.0
    cube_bounds: float = 10.0
    point_occupancy_radius: float = 0.25
    num_solid: int = 1024
    num_air: int = 1024
    predict_segmentation: bool = False
    semantic_classes: int = 13
    predict_tracking: bool = False
    data_kind: str = 'greater'
    point_sample_bias: str = 'none'
    cube_mode: int = 4
    low_prefer_min_z: float = 0.0
    low_prefer_max_z: float = 2.0
    knn_block_size: int = 8192

    @property
    def has(self):
        return lambda token: token in self.point_sample_bias


def _ramp_share(count, max_share):
    '''Conditional share: full at >= 256 candidate points, linear ramp from 16
    (geometry.py:803-819, 845-849).'''
    count = count.astype(jnp.float32)
    return jnp.where(count >= 256, max_share,
                     jnp.where(count >= 16, count * max_share / 256.0, 0.0))


class GuidedPointSampler:
    '''Functional sampler; call sample_frame per (example, frame) under jit/vmap.'''

    def __init__(self, cfg: SamplerConfig):
        self.cfg = cfg
        self.cols = _COLS[cfg.data_kind]

    # ------------------------------------------------------------------ helpers --

    def _output_cube_valid(self, pcl, valid):
        '''CARLA restricts supervision to the output cuboid (geometry.py:680-684).'''
        if self.cfg.data_kind == 'carla':
            cub = carla_output_bounds(self.cfg.cube_bounds, self.cfg.min_z,
                                      self.cfg.cube_mode)
            valid = valid & cuboid_mask(pcl, cub)
        return valid

    # -------------------------------------------------------------------- solid --

    def _solid_shares_and_weights(self, tgt, valid, unique_valid, valo_ids,
                                  num_valo_ids):
        '''Returns (shares (6,), per-bias point weights list) in sbs order
        (regular, low, moving, vehped, ivalo, sembal), geometry.py:788-856.'''
        cfg = self.cfg
        z = tgt[:, 2]
        inst = tgt[:, self.cols['inst']].astype(jnp.int32)
        segm = tgt[:, self.cols['segm']].astype(jnp.int32)
        view = tgt[:, self.cols['view']].astype(jnp.int32)
        zero_w = jnp.zeros(tgt.shape[0], jnp.float32)

        shares = [jnp.asarray(1.0, jnp.float32)]  # regular.
        weights = [valid.astype(jnp.float32)]

        # low: conditional on >= 256 low points (geometry.py:795-801).
        low_mask = valid & (z >= cfg.low_prefer_min_z) & (z <= cfg.low_prefer_max_z)
        if cfg.has('low'):
            cnt = jnp.sum(low_mask)
            shares.append(jnp.where(cnt >= 256, 1.0, 0.0).astype(jnp.float32))
            weights.append(low_mask.astype(jnp.float32))
        else:
            shares.append(jnp.asarray(0.0, jnp.float32))
            weights.append(zero_w)

        # moving (geometry.py:803-808).
        if cfg.has('moving'):
            cnt = jnp.sum(unique_valid)
            shares.append(_ramp_share(cnt, 0.4))
            weights.append(unique_valid.astype(jnp.float32))
        else:
            shares.append(jnp.asarray(0.0, jnp.float32))
            weights.append(zero_w)

        # vehped: pedestrians (4) and vehicles (10), geometry.py:810-819.
        vehped_mask = valid & ((segm == 4) | (segm == 10))
        if cfg.has('vehped'):
            shares.append(_ramp_share(jnp.sum(vehped_mask), 0.2))
            weights.append(vehped_mask.astype(jnp.float32))
        else:
            shares.append(jnp.asarray(0.0, jnp.float32))
            weights.append(zero_w)

        # ivalo: occluded-now points of instances visible at least once in the input;
        # weight 2 when the instance is fully occluded now (geometry.py:821-849).
        if cfg.has('ivalo'):
            R = valo_ids.shape[0]
            valo_valid = jnp.arange(R) < num_valo_ids
            is_valo = jnp.any((inst[:, None] == valo_ids[None, :]) & valo_valid[None, :],
                              axis=-1)
            vis_pts = valid & (view == 0) & ((segm == 4) | (segm == 10))
            # Per valo id: visible now iff any visible vehped point carries it.
            id_visible = jnp.any(vis_pts[:, None]
                                 & (inst[:, None] == valo_ids[None, :]), axis=0)
            pt_id_visible = jnp.any(
                (inst[:, None] == valo_ids[None, :]) & id_visible[None, :]
                & valo_valid[None, :], axis=-1)
            ivalo_mask = valid & (view != 0) & ((segm == 4) | (segm == 10)) & is_valo
            w = jnp.where(ivalo_mask, jnp.where(pt_id_visible, 1.0, 2.0), 0.0)
            cnt = jnp.sum(w)  # doubled rows count twice (reference appends twice).
            shares.append(jnp.minimum(_ramp_share(cnt, 0.2), 0.2))
            weights.append(w)
        else:
            shares.append(jnp.asarray(0.0, jnp.float32))
            weights.append(zero_w)

        # sembal: equal share per semantic class with >= 16 points
        # (geometry.py:851-900) == per-point weight 1 / count(class).
        if cfg.has('sembal'):
            cls = jnp.clip(segm, 0, _MAX_SEM_CLASSES - 1)
            counts = jnp.zeros(_MAX_SEM_CLASSES).at[cls].add(valid.astype(jnp.float32))
            eligible = counts >= 16
            w = jnp.where(valid & eligible[cls], 1.0 / jnp.maximum(counts[cls], 1.0), 0.0)
            # No eligible class -> quota falls back to regular (geometry.py:891-900).
            shares.append(jnp.where(jnp.sum(w) > 0, 0.4, 0.0).astype(jnp.float32))
            weights.append(w)
        else:
            shares.append(jnp.asarray(0.0, jnp.float32))
            weights.append(zero_w)

        shares = jnp.stack(shares)
        return shares / jnp.sum(shares), weights

    def _assemble_blocks(self, boundaries, pools, n_out):
        '''
        Contiguous-block assembly: slot i belongs to category searchsorted(bnd, i);
        its row is pool[cat][i - start[cat]].
        :param boundaries (C-1,) int32 cumulative block ends (last block implicit).
        :param pools: list of (n_out, ...) per-category row indices/arrays.
        '''
        slots = jnp.arange(n_out, dtype=jnp.int32)
        cat = jnp.searchsorted(boundaries, slots, side='right').astype(jnp.int32)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), boundaries])
        offset = slots - starts[cat]
        out = pools[0][offset]
        for c in range(1, len(pools)):
            out = jnp.where((cat == c)[(...,) + (None,) * (out.ndim - 1)],
                            pools[c][offset], out)
        return out

    def sample_solid(self, key, tgt, valid, unique_valid, valo_ids, num_valo_ids,
                     time_idx):
        '''
        :return (solid_input (S, 4), solid_target (S, 6), shares (6,), sel_rows (S,)).
        '''
        cfg = self.cfg
        S = cfg.num_solid
        shares, weights = self._solid_shares_and_weights(
            tgt, valid, unique_valid, valo_ids, num_valo_ids)

        # Block sizes: floor(share * S) for low..sembal, remainder regular
        # (geometry.py:859-905). Block order: low, moving, vehped, ivalo, sembal,
        # regular.
        n_biased = jnp.floor(shares[1:] * S).astype(jnp.int32)        # (5,).
        boundaries = jnp.cumsum(n_biased)                             # (5,).

        keys = jax.random.split(key, 7)
        pools = []
        for c, w in enumerate([weights[1], weights[2], weights[3], weights[4],
                               weights[5], weights[0]]):
            idx, _ = masked_choice(keys[c], w > 0, S, weights=w)
            pools.append(idx)
        sel = self._assemble_blocks(boundaries, pools, S)             # (S,) rows.

        rows = tgt[sel]                                               # (S, E).
        xyz = rows[:, :3]
        # Small jitter <= radius/2 (geometry.py:916-918).
        xyz = xyz + sample_uniform_3ball(keys[6], S, cfg.point_occupancy_radius / 2.0)
        t_col = jnp.full((S, 1), jnp.float32(time_idx))
        solid_input = jnp.concatenate([xyz, t_col], axis=-1)

        copy = rows[:, -4:]                                           # (R, G, B, mark).
        dens = jnp.ones((S, 1), jnp.float32)
        if cfg.predict_segmentation:
            segm = rows[:, self.cols['segm']:self.cols['segm'] + 1]
            segm = jnp.where(segm >= cfg.semantic_classes, 3.0, segm)  # 'Other'.
        else:
            segm = -jnp.ones((S, 1), jnp.float32)
        solid_target = jnp.concatenate([dens, copy, segm], axis=-1)
        return solid_input, solid_target, shares, sel

    # ---------------------------------------------------------------------- air --

    def _air_pool(self, key, base_pts, base_valid, n_cand, n_active, jitter,
                  tgt_xyz, tgt_valid, blind_cuboid=None):
        '''
        One air candidate pool: draw n_cand base points (or blind uniform), jitter,
        reject those within r of any valid target point, and return
        (candidates (n_cand, 3), order (n_cand,), count) for cyclic assembly.
        :param jitter: (min_radius, max_radius) or None.
        :param n_active: traced count of candidates actually in play (reference's
            int(n * factor) oversample).
        '''
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        if blind_cuboid is not None:
            cand = sample_blind_random(k1, n_cand, blind_cuboid)
        else:
            idx, _ = masked_choice(k1, base_valid, n_cand)
            cand = base_pts[idx][:, :3]
        if jitter is not None:
            cand = cand + sample_uniform_3ball(k2, n_cand, jitter[1], jitter[0])
        d = nn1_min_dist(cand, tgt_xyz, key_mask=tgt_valid,
                         block_size=cfg.knn_block_size)
        in_play = jnp.arange(n_cand) < n_active
        ok = in_play & (d > cfg.point_occupancy_radius)
        order = valid_first_order(ok)
        return cand, order, jnp.sum(ok)

    def sample_air(self, key, tgt, valid, other_unique, other_unique_valid,
                   solid_input, time_idx):
        '''
        :param other_unique (M, E) + mask: dynamic points of the random other frame.
        :param solid_input (S, 4): jittered solid queries (hard-negative seeds).
        :return (air_input (A, 4), air_target (A, 6), shares (4,), air_ok scalar,
                 pool_counts (4,) survivor counts per pool — the observability
                 analogue of select_safely's insufficiency warning).
        '''
        cfg = self.cfg
        A = cfg.num_air
        tgt_xyz = tgt[:, :3]
        r = cfg.point_occupancy_radius

        # Shares (regular, moving, hard_solid_query, hard_target), geometry.py:964-976.
        mov_share = (_ramp_share(jnp.sum(other_unique_valid), 0.4)
                     if cfg.has('moving') else jnp.asarray(0.0, jnp.float32))
        shares = jnp.stack([jnp.asarray(0.5, jnp.float32), mov_share,
                            jnp.asarray(0.3, jnp.float32), jnp.asarray(0.2, jnp.float32)])
        shares = shares / jnp.sum(shares)

        n_mov = jnp.floor(shares[1] * A).astype(jnp.int32)
        n_hsq = jnp.floor(shares[2] * A).astype(jnp.int32)
        n_ht = jnp.floor(shares[3] * A).astype(jnp.int32)
        boundaries = jnp.cumsum(jnp.stack([n_mov, n_hsq, n_ht]))

        # Static worst-case candidate capacities (shares bounded by construction):
        # moving <= 0.4/1.4, hsq <= 0.3, ht <= 0.2, regular <= 0.5 of A.
        reg_factor = 1.3 if cfg.data_kind == 'greater' else 1.1  # geometry.py:1054-1057.
        C_mov = int(A * 0.4 / 1.4 * 1.6) + 8
        C_hsq = int(A * 0.3 * 2.0) + 8
        C_ht = int(A * 0.2 * 2.0) + 8
        C_reg = int(A * 0.5 * reg_factor) + 8
        C = max(C_mov, C_hsq, C_ht, C_reg)  # one shared capacity simplifies assembly.

        keys = jax.random.split(key, 4)
        blind = blind_sample_bounds(cfg.data_kind, cfg.cube_bounds, cfg.min_z,
                                    cfg.cube_mode)
        # moving: other-frame dynamic points + jitter <= 2r (geometry.py:986-1005).
        # Without the 'moving' bias token the share is STATICALLY zero (no
        # slots can ever map to this pool), so skip its 1-NN rejection pass
        # entirely - at the 57k scale that pass alone streams ~0.8G candidate
        # pairs per frame for rows the assembly never reads.
        if cfg.has('moving'):
            mov = self._air_pool(keys[0], other_unique, other_unique_valid, C,
                                 (n_mov.astype(jnp.float32) * 1.6).astype(jnp.int32),
                                 (0.0, 2.0 * r), tgt_xyz, valid)
        else:
            mov = (jnp.zeros((C, 3), jnp.float32),
                   jnp.arange(C, dtype=jnp.int32), jnp.zeros((), jnp.int32))
        # hard_solid_query: shells around solid queries (geometry.py:1009-1028).
        hsq = self._air_pool(keys[1], solid_input,
                             jnp.ones(solid_input.shape[0], bool), C,
                             (n_hsq.astype(jnp.float32) * 2.0).astype(jnp.int32),
                             (r, 3.0 * r), tgt_xyz, valid)
        # hard_target: shells around target points (geometry.py:1031-1050).
        ht = self._air_pool(keys[2], tgt, valid, C,
                            (n_ht.astype(jnp.float32) * 2.0).astype(jnp.int32),
                            (r, 3.0 * r), tgt_xyz, valid)
        # regular: blind uniform in the output cuboid (geometry.py:1052-1071).
        n_reg = A - n_mov - n_hsq - n_ht
        reg = self._air_pool(keys[3], None, None, C,
                             (n_reg.astype(jnp.float32) * reg_factor).astype(jnp.int32),
                             None, tgt_xyz, valid, blind_cuboid=blind)

        # Assemble with per-pool cyclic duplication (select_safely semantics,
        # geometry.py:1095-1105). A pool whose every candidate was rejected must
        # NOT emit rejected rows (points within r of solid targets labelled air —
        # silent label noise); the reference's select_safely on an empty pool
        # hard-fails and the step is skipped (train.py:87-94). Here a dry biased
        # pool falls back to the regular blind pool's survivors, and if the
        # regular pool itself is dry the frame is flagged not-ok so its loss
        # weight is zeroed (the step-skip equivalent).
        reg_cand, reg_order, reg_cnt = reg
        air_ok = reg_cnt > 0
        pool_counts = jnp.stack([mov[2], hsq[2], ht[2], reg_cnt])
        slots = jnp.arange(A, dtype=jnp.int32)
        cat = jnp.searchsorted(boundaries, slots, side='right').astype(jnp.int32)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), boundaries])
        offset = slots - starts[cat]
        air = jnp.zeros((A, 3), jnp.float32)
        for c, (cand, order, cnt) in enumerate([mov, hsq, ht, reg]):
            dry = cnt == 0
            cand = jnp.where(dry, reg_cand, cand)
            order = jnp.where(dry, reg_order, order)
            cnt = jnp.maximum(jnp.where(dry, reg_cnt, cnt), 1)
            rows = cand[order[offset % cnt]]
            air = jnp.where((cat == c)[:, None], rows, air)

        t_col = jnp.full((A, 1), jnp.float32(time_idx))
        air_input = jnp.concatenate([air, t_col], axis=-1)
        # (density=0, R=G=B=-1, mark=-1, segm=-1), geometry.py:1084-1091.
        air_target = jnp.concatenate(
            [jnp.zeros((A, 1), jnp.float32), -jnp.ones((A, 5), jnp.float32)], axis=-1)
        return air_input, air_target, shares, air_ok, pool_counts

    # --------------------------------------------------------------------- frame --

    def sample_frame(self, key, tgt, tgt_valid, other, other_valid, valo_ids,
                     num_valo_ids, time_idx):
        '''
        One (example, frame) sampling pass (geometry.py:617-762).
        :param tgt (M, E): padded target frame; tgt_valid (M,) bool.
        :param other (M, E): a random *other* target frame (dynamic-air source).
        :param valo_ids (R,) int32; num_valo_ids scalar.
        :param time_idx: static or traced scalar.
        :return dict(solid_input, air_input, solid_target, air_target, solid_sbs,
                     air_sbs, ok): queries are (x, y, z, t); targets are
                     (density, R, G, B, mark_track, segm).
        '''
        cfg = self.cfg
        k_mov, k_solid, k_air = jax.random.split(key, 3)

        valid = self._output_cube_valid(tgt, tgt_valid)
        other_v = self._output_cube_valid(other, other_valid)
        ok = jnp.sum(valid) >= 256  # geometry.py:688-689 runtime guard, as a flag.

        if cfg.has('moving'):
            # Both directions share one distance matrix: a single bidirectional
            # 1-NN pass replaces two full-cloud nn1 calls (geometry.py:697-728
            # does this on a shuffled slice per direction; this is exact).
            d_tgt, d_other = nn1_bidirectional(tgt[:, :3], other[:, :3],
                                               a_mask=valid, b_mask=other_v)
            thr = cfg.point_occupancy_radius * 2.0
            tgt_unique = valid & (d_tgt > thr)
            other_unique = other_v & (d_other > thr)
        else:
            tgt_unique = jnp.zeros_like(valid)
            other_unique = jnp.zeros_like(other_v)

        solid_input, solid_target, solid_sbs, _ = self.sample_solid(
            k_solid, tgt, valid, tgt_unique, valo_ids, num_valo_ids, time_idx)
        air_input, air_target, air_sbs, air_ok, air_pool_counts = self.sample_air(
            k_air, tgt, valid, other, other_unique, solid_input, time_idx)
        ok = ok & air_ok

        return dict(solid_input=solid_input, air_input=air_input,
                    solid_target=solid_target, air_target=air_target,
                    solid_sbs=solid_sbs, air_sbs=air_sbs, ok=ok,
                    air_pool_counts=air_pool_counts)
