'''
CARLA-4D dataset reader (multi-view semantic LiDAR driving).

Capability parity with CARLADataset (/root/reference/data/data_carla.py), numpy
end-to-end, producing fixed-capacity padded arrays:
  * directory layout dataset_root/stage/SCENE/mv_raw_all/{f:05d}_{view}_(rgb.png|
    lidar_segm.npy) + sensor_matrices.npy (T, V, 4, 4) + camera_K.npy, with the
    hard-coded 9-sensor -> 4-view mapping (data_carla.py:399-404);
  * ego-motion correction to the reference frame (present, forward view) and
    ground-origin Z shift of +1 m (data_carla.py:444-463);
  * cube_mode input/target cuboids (target keeps 2 m context padding);
  * occlusion-rate-biased + is-moving-biased clip selection with precomputed
    occlusion_rate_fs{fs}_cm{cm}.npy curves (data_carla.py:25-56, 269-331);
  * validity retry loop with min input/target sizes (data_carla.py:353-379, 547-573);
  * oversample_vehped_target retention during target subsampling.
'''

import json
import os
import pathlib

import numpy as np

from . import common
from ..ops.bounds import carla_input_bounds, carla_output_bounds, cuboid_mask
from ..utils.misc import accumulate_pcl_time, merge_pcl_views

__all__ = ['CarlaDataset', 'get_occlusion_rate', 'is_moving_anytime',
           'transform_lidar_frame', 'merge_intensity_semantic_lidar', 'MAX_VALO_IDS']

MAX_VALO_IDS = 256
VIEW_SENSOR_MATCHING = [0, 3, 4, 5]
VIEW_NAMES = ['forward', 'magic_left', 'magic_right', 'magic_top']


def _imread(fp):
    import matplotlib.pyplot as plt
    return plt.imread(fp)


def get_occlusion_rate(scene_dp, frame_step, cube_mode):
    '''Precomputed occlusion curves: summed over categories, forward view inframe,
    smoothed, plus a 6-frame cumulative window (data_carla.py:25-45).'''
    fp = os.path.join(scene_dp, f'occlusion_rate_fs{frame_step}_cm{cube_mode}.npy')
    rate = np.load(fp)                 # (K, V, T, 3).
    rate = rate.sum(axis=0)[0, :, 2]   # forward view, inframe channel.
    rate = rate.copy()
    rate[1:-1] = rate[1:-1] / 2.0 + rate[:-2] / 4.0 + rate[2:] / 4.0
    window = 6
    cum = np.cumsum(rate)
    cum[window:] = cum[window:] - cum[:-window]
    cum /= window
    return rate, cum


def is_moving_anytime(sensor_RT, frame_start, frame_end, dist_threshold=1.0):
    '''Whether the ego (forward view) moves within the range (data_carla.py:48-56).'''
    delta = sensor_RT[frame_end - 1, 0] - sensor_RT[frame_start, 0]
    return np.abs(delta[..., -1]).sum() >= dist_threshold


def transform_lidar_frame(lidar_pcl, source_matrix, target_matrix,
                          inplace=False):
    '''Coordinate-frame change of (N, D) lidar rows (geometry.py:1286-1306).
    Row-major (N, 3) matmuls with the translation added after the rotation
    dot: the same accumulation grouping as the homogeneous (4, N) form it
    replaces, without the transpose/concat copies (~7 ms -> ~1 ms per 90k-row
    frame). inplace skips the defensive row copy when the caller owns the
    array.'''
    src, inv_t = np.asarray(source_matrix), np.linalg.inv(target_matrix)
    p = lidar_pcl[:, :3] @ src[:3, :3].T + src[:3, 3]
    p = p @ inv_t[:3, :3].T + inv_t[:3, 3]
    out = lidar_pcl if inplace else lidar_pcl.copy()
    out[:, :3] = p
    return out


def merge_intensity_semantic_lidar(lidar, lidar_segm):
    '''(N,7) intensity + (N,9) semantic lidar -> (N,10) merged rows
    (data_carla.py:672-688).'''
    assert lidar.shape[0] == lidar_segm.shape[0]
    np.testing.assert_array_almost_equal(lidar[0, :3], lidar_segm[0, :3])
    np.testing.assert_array_almost_equal(lidar[-1, :3], lidar_segm[-1, :3])
    return np.concatenate([lidar[:, :4], lidar_segm[:, 3:-3], lidar[:, -3:]], axis=-1)


class CarlaDataset:
    '''Map-style dataset: __getitem__(index) -> dict of numpy arrays.'''

    def __init__(self, dataset_root, logger, stage='train',
                 ss_frame_step=3, video_length=4, frame_skip=4,
                 n_points_rnd=8192, n_fps_input=1024, n_fps_target=1024,
                 pcl_input_frames=3, pcl_target_frames=1, reference_frame=None,
                 correct_origin_ground=True, sample_bias='none', sb_occl_frame_shift=2,
                 min_z=-1.0, other_bounds=20.0, target_bounds=16.0, cube_mode=4,
                 oversample_vehped_target=False, use_data_frac=1.0,
                 use_json=True, verbose=False, live_occl_mode='normal', seed=None,
                 return_images=False, shared_counters=False, track_mode='none'):
        self.dataset_root = dataset_root
        self.logger = logger
        self.stage = stage
        self.ss_frame_step = ss_frame_step
        self.video_length = video_length
        self.frame_skip = frame_skip
        self.n_points_rnd = n_points_rnd
        self.n_fps_input = n_fps_input
        self.n_fps_target = n_fps_target
        self.pcl_input_frames = pcl_input_frames
        self.pcl_target_frames = pcl_target_frames
        self.reference_frame = reference_frame
        self.correct_origin_ground = correct_origin_ground
        self.sample_bias = sample_bias
        self.sb_occl_frame_shift = sb_occl_frame_shift
        self.min_z = min_z
        self.other_bounds = other_bounds
        self.target_bounds = target_bounds
        self.cube_mode = cube_mode
        self.oversample_vehped_target = oversample_vehped_target
        self.use_data_frac = use_data_frac
        self.use_json = use_json
        self.verbose = verbose
        self.track_mode = track_mode
        self.live_occl_mode = live_occl_mode
        self.return_images = return_images
        self.allow_random_frames = True
        self.min_input_size = 64
        self.min_target_size = 512
        self.seed = seed
        self._epoch = 0

        self.stage_dir = os.path.join(dataset_root, stage)
        if not os.path.exists(self.stage_dir):
            self.stage_dir = dataset_root
            self.dataset_root = str(pathlib.Path(dataset_root).parent)
        self.is_single_scene = 'mv_raw_all' in os.listdir(self.stage_dir)

        if self.is_single_scene:
            logger.warning(f'({stage}) Pointing to a single scene; ignoring '
                           f'sample_bias / use_json.')
            self.num_scenes = 1
            self.all_scenes = [self.stage_dir]
            num_frames = len(self._rgb_frames(self.stage_dir))
            if use_data_frac < 0.0:
                self.use_data_frac, self.multiplier = 1.0, use_data_frac
            else:
                self.multiplier = (num_frames // self.ss_frame_step
                                   - self.video_length * self.frame_skip)
            self.dset_size = int(self.multiplier * self.use_data_frac)
        else:
            scenes = sorted(dn for dn in os.listdir(self.stage_dir) if '_' in dn
                            and os.path.isdir(os.path.join(self.stage_dir, dn)))
            self.all_scenes = scenes
            self.num_scenes = len(scenes)
            if use_data_frac < 0.0:
                self.num_scenes = min(int(-use_data_frac), len(self.all_scenes))
                self.all_scenes = self.all_scenes[:self.num_scenes]
                self.use_data_frac = 1.0
                self.allow_random_frames = False
            target_size = 960 if 'train' in stage else 120
            self.multiplier = max(int(np.ceil(target_size / max(self.num_scenes, 1))), 1)
            self.dset_size = int(self.num_scenes * self.multiplier * self.use_data_frac)

            self.counter = (common.CounterBoard(self.num_scenes,
                                                shared=shared_counters)
                            if self.sample_bias != 'none' else None)
            self.starting_frames = None
            if 'test' in stage and use_json:
                move_str = '_move' if 'move' in sample_bias else ''
                dset_split = 'val' if 'val' in self.stage_dir else 'test'
                fn = (f'{dset_split}_start_frames_shift{sb_occl_frame_shift}'
                      f'_inputframes12_skip{frame_skip}{move_str}.json')
                self.json_shift = (12 - pcl_input_frames) * frame_skip
                fp = os.path.join(self.dataset_root, fn)
                if os.path.exists(fp):
                    with open(fp, 'r') as f:
                        self.starting_frames = json.load(f)
                else:
                    logger.warning(f'({stage}) {fp} not found.')

    @staticmethod
    def _rgb_frames(scene_dp):
        dp = os.path.join(scene_dp, 'mv_raw_all')
        return [fn for fn in os.listdir(dp) if 'forward_rgb' in fn]

    def __len__(self):
        return self.dset_size

    def set_epoch(self, epoch):
        '''Advance the per-example RNG stream (called by Loader.epoch).'''
        self._epoch = int(epoch)

    def _example_rng(self, index):
        return common.example_rng(self.seed, self._epoch, index)

    def _get_frame_start(self, index, scene_dp, sensor_RT, rng):
        num_frames = len(self._rgb_frames(scene_dp))
        occl_frame_idx, found_rate = -1, -1.0
        if self.is_single_scene:
            return index * self.ss_frame_step, num_frames, -1, -1.0

        scene_idx = index % self.num_scenes
        frame_low, frame_high = 10, num_frames - 20
        frame_start_high = max(frame_high - self.video_length * self.frame_skip,
                               frame_low + 1)
        frame_start = rng.randint(frame_low, frame_start_high)

        if self.starting_frames is not None:
            frame_start = self.starting_frames[str(scene_idx)] + self.json_shift
        elif 'test' not in self.stage and rng.rand() >= 0.40:
            pass  # biased clip sampling 40% of the time (data_carla.py:263-265).
        elif self.sample_bias != 'none':
            if 'occl' in self.sample_bias:
                _, cum = get_occlusion_rate(scene_dp, 3, self.cube_mode)
                time_shift = int((self.pcl_input_frames - self.sb_occl_frame_shift)
                                 * self.frame_skip)
                # 'move' sub-filter folded into the walk via rejection below.
                start, occl_frame_idx, found_rate = common.pick_biased_frame_start(
                    cum, frame_low, frame_start_high, time_shift, 120, self.counter,
                    scene_idx, self.stage, rng, counter_double_prob=0.1)
                if start is not None:
                    if 'move' in self.sample_bias and not is_moving_anytime(
                            sensor_RT, start,
                            start + self.video_length * self.frame_skip):
                        if 'test' in self.stage or rng.rand() < 0.97:
                            start = None
                if start is not None:
                    frame_start = start
            elif 'move' in self.sample_bias:
                end = frame_start + self.video_length * self.frame_skip
                if not is_moving_anytime(sensor_RT, frame_start, end):
                    return None, num_frames, -1, -1.0
        elif not self.allow_random_frames:
            frame_start = min(num_frames // 2, frame_start_high - 1)
        return frame_start, num_frames, occl_frame_idx, found_rate

    def __getitem__(self, index):
        rng = self._example_rng(index)
        # Retry loop for invalid scenes (data_carla.py:353-379).
        for attempt in range(8):
            try:
                result = self._load_example(index, rng)
                if result is not None:
                    return result
            except Exception as e:
                self.logger.warning(f'CARLA load failure (attempt {attempt}): {e}')
            if self.is_single_scene:
                raise RuntimeError('The single specified scene must be valid.')
            index = rng.randint(self.dset_size)
        raise RuntimeError('No valid CARLA example found after retries.')

    def _load_example(self, index, rng):
        if self.is_single_scene:
            scene_idx, scene_dp = -1, self.all_scenes[0]
            scene_dn = str(pathlib.Path(scene_dp).name)
        else:
            scene_idx = index % self.num_scenes
            scene_dn = self.all_scenes[scene_idx]
            scene_dp = os.path.join(self.stage_dir, scene_dn)

        if not os.path.exists(os.path.join(scene_dp, scene_dn + '_video_multiview.mp4')):
            return None
        content_dp = os.path.join(scene_dp, 'mv_raw_all')
        if not os.path.exists(os.path.join(content_dp, 'sensor_matrices.npy')):
            return None

        sensor_RT = np.load(os.path.join(content_dp, 'sensor_matrices.npy')) \
            .astype(np.float32)                                      # (T, V9, 4, 4).
        sensor_K = np.load(os.path.join(content_dp, 'camera_K.npy')).astype(np.float32)
        sensor_RT = sensor_RT[:, VIEW_SENSOR_MATCHING]               # (T, 4, 4, 4).
        num_views = len(VIEW_NAMES)

        (frame_start, num_frames, occl_frame_idx, found_rate) = \
            self._get_frame_start(index, scene_dp, sensor_RT, rng)
        if frame_start is None:
            return None
        frame_inds = np.arange(frame_start,
                               frame_start + self.video_length * self.frame_skip,
                               self.frame_skip)

        in_cub = carla_input_bounds(self.other_bounds, self.min_z, self.cube_mode)
        all_lidar, all_rgb, all_RT, all_K = [], [], [], []
        # Dataset health signals for the train-time histograms
        # (/root/reference/data/data_carla.py:419-421, 639-641).
        cuboid_filter_ratios, sample_input_ratios, sample_target_ratios = [], [], []
        for v, view in enumerate(VIEW_NAMES):
            view_lidar, view_rgb, view_RT, view_K = [], [], [], []
            for f in frame_inds:
                # asarray: no copy when the file is already f32 (np.load always
                # returns fresh memory, so the in-place transform below is safe).
                lidar = np.asarray(np.load(os.path.join(
                    content_dp, f'{f:05d}_{view}_lidar_segm.npy')), np.float32)
                # (N, 9): (x, y, z, cos_angle, inst, sem, R, G, B).
                cam_RT = sensor_RT[f, v]
                ref_f = (frame_inds[self.reference_frame]
                         if self.reference_frame is not None else f)
                if f != ref_f or v != 0:
                    # inplace: `lidar` is this iteration's fresh np.load copy.
                    lidar = transform_lidar_frame(lidar, cam_RT,
                                                  sensor_RT[ref_f, 0],
                                                  inplace=True)
                if self.correct_origin_ground:
                    lidar[:, 2] += 1.0  # sensor height (data_carla.py:461-463).
                pre_filter = lidar.shape[0]
                # Compose the cuboid filter with the subsample gather: the
                # boolean mask-gather would copy all kept rows only for most of
                # them to be dropped again below. keep_idx is ascending and
                # `inds` is sorted, so lidar[keep_idx[inds]] is bit-identical
                # to lidar[mask][inds] (and the rng draw is unchanged: choice
                # consumes the same stream for the same population size).
                keep_idx = np.nonzero(cuboid_mask(lidar, in_cub))[0]
                cuboid_filter_ratios.append(keep_idx.shape[0] / max(pre_filter, 1))
                pre_sample = keep_idx.shape[0]
                if self.n_points_rnd > 0 and keep_idx.shape[0] > self.n_points_rnd:
                    inds = rng.choice(keep_idx.shape[0], self.n_points_rnd,
                                      replace=False)
                    inds.sort()
                    keep_idx = keep_idx[inds]
                lidar = lidar[keep_idx]
                sample_input_ratios.append(lidar.shape[0] / max(pre_sample, 1))
                view_lidar.append(np.asarray(lidar, np.float32))
                view_RT.append(cam_RT)
                view_K.append(sensor_K)
                if self.return_images:
                    rgb = _imread(os.path.join(
                        content_dp, f'{f:05d}_{view}_rgb.png'))[..., :3]
                    view_rgb.append(rgb.astype(np.float32))
            all_lidar.append(view_lidar)
            all_RT.append(np.stack(view_RT))
            all_K.append(np.stack(view_K))
            if self.return_images:
                all_rgb.append(np.stack(view_rgb))

        # Only the forward sensor's accumulated video is consumed: skip the rest.
        lidar_video_fwd = accumulate_pcl_time([all_lidar[0]])[0]
        # (T*N, 10): (..., t).
        # Full multi-view merged rows are consumed only by the target frames;
        # valo counting needs just the instance column of every frame, so the
        # other frames merge one column instead of ten.
        n_tf = self.pcl_target_frames
        merged_targets = merge_pcl_views([view[-n_tf:] for view in all_lidar],
                                         insert_view_idx=True)
        # list-n_tf of (V*N, 10): (x, y, z, cos, inst, sem, view, R, G, B).
        merged_inst = [np.concatenate([all_lidar[v][t][:, 4:5]
                                       for v in range(num_views)])
                       for t in range(self.video_length)]

        if self.pcl_input_frames < self.video_length:
            keep = sum(all_lidar[0][t].shape[0] for t in range(self.pcl_input_frames))
            pcl_input = lidar_video_fwd[:keep]
        else:
            pcl_input = lidar_video_fwd
        pcl_input = common.shuffle_rows(pcl_input, rng)
        pcl_input, pcl_input_size = common.subsample_pad(
            pcl_input, self.n_fps_input, mode='farthest_point', rng=rng,
            fps_start=rng.randint(max(pcl_input.shape[0], 1)))
        if pcl_input_size < self.min_input_size:
            self.logger.warning(f'Invalid due to pcl_input_size: {pcl_input_size}')
            return None

        out_cub = carla_output_bounds(self.target_bounds, self.min_z, self.cube_mode,
                                      padding=2.0)
        tgt_cap = abs(self.n_fps_target) if self.n_fps_target != 0 else \
            max(f.shape[0] for f in merged_inst)
        pcl_target, pcl_target_size = [], []
        for t in range(self.pcl_target_frames):
            frame = merged_targets[t]
            # Fused shuffle+filter: the permutation is composed with the
            # cuboid mask so only the kept rows are gathered (same rng stream
            # and exact rows/order as shuffle_rows -> boolean filter; the mask
            # is per-row, so mask(frame)[perm] == mask(frame[perm])).
            perm = rng.permutation(frame.shape[0])
            keep = np.asarray(cuboid_mask(frame, out_cub))
            frame = frame[perm[keep[perm]]]
            if frame.shape[0] < self.min_target_size:
                self.logger.warning(f'Invalid due to pcl_target_size: {frame.shape[0]}')
                return None
            pre_target = frame.shape[0]
            if self.n_fps_target != 0:
                mode = 'farthest_point' if self.n_fps_target > 0 else 'random'
                frame, size = common.subsample_pad(
                    frame, tgt_cap, mode=mode, rng=rng,
                    retain_vehped=self.oversample_vehped_target, segm_idx=5)
            else:
                frame, size = common.pad_rows(frame, tgt_cap)
            sample_target_ratios.append(size / max(pre_target, 1))
            pcl_target.append(frame)
            pcl_target_size.append(size)

        pcl_input_sem = pcl_input[:, 3:-4]
        # (N, 3): (cos_angle, instance_id, semantic_tag).
        pcl_input = np.concatenate([pcl_input[:, :3], pcl_input[:, -4:]], axis=-1)
        # (N, 7): (x, y, z, R, G, B, t).

        live_occl, valo_pad, num_valo = common.get_valo_ids(
            pcl_input_sem, merged_inst, all_lidar, 0, num_views,
            self.pcl_input_frames, self.video_length, filter_vehped=True,
            sem_inst_col=1, sem_cat_col=2, merged_inst_col=0, pcl_inst_col=4,
            max_valo_ids=MAX_VALO_IDS)

        # mark_track channel. The reference STUBS it to zeros for CARLA
        # (data_carla.py:615-623), so its CARLA models never learn tracking.
        # track_mode='random' is this framework's extension: mirror the GREATER
        # marking semantics (data_greater.py:528-567) using CARLA's instance
        # column — mark one random first-input-frame-visible instance
        # (>= 16 points) in the input, supervise target marks by instance
        # membership — which makes the track head genuinely learnable and
        # enables multi-instance track_mode='all' eval reruns on CARLA.
        track_id = -1
        input_track = np.zeros_like(pcl_input[:, 0:1])
        target_track = [np.zeros_like(f[:, 0:1]) for f in pcl_target]
        if self.track_mode != 'none':
            assert self.track_mode == 'random', self.track_mode
            first_sem = pcl_input_sem[pcl_input[:, -1] == 0]
            vis_ids = [int(i) for i in np.unique(first_sem[:, 1].astype(np.int32))
                       if i >= 0 and (first_sem[:, 1] == i).sum() >= 16]
            # Prefer vehped instances (semantic 4/10): CARLA tracking is about
            # vehicles/pedestrians (the track_mode='all' eval reruns exactly
            # those), and GREATER's analogue marks only OBJECT instances —
            # marking road/wall/landmark ids would spend most of the
            # curriculum on instances the eval never scores. Fall back to any
            # visible instance when no vehped is in view.
            veh_ids = [i for i in vis_ids
                       if np.isin(first_sem[first_sem[:, 1] == i, 2],
                                  (4, 10)).any()]
            if veh_ids:
                track_id = int(rng.choice(veh_ids))
            elif vis_ids:
                track_id = int(rng.choice(vis_ids))
            if track_id >= 0:
                mark = (pcl_input_sem[:, 1] == track_id) & (pcl_input[:, -1] == 0)
                input_track[mark] = 1.0
                for i in range(self.pcl_target_frames):
                    target_track[i][pcl_target[i][:, 4] == track_id] = 1.0
        pcl_input = np.concatenate([pcl_input, input_track], axis=-1)  # (N, 8).
        pcl_target = [np.concatenate([f, tt], axis=-1)
                      for f, tt in zip(pcl_target, target_track)]      # (M, 11).

        valid = np.zeros((self.pcl_target_frames, tgt_cap), bool)
        for t, size in enumerate(pcl_target_size):
            valid[t, :size] = True

        out = dict(
            pcl_input=np.asarray(pcl_input, np.float32),
            pcl_input_sem=np.ascontiguousarray(pcl_input_sem, np.float32),
            pcl_target=np.asarray(np.stack(pcl_target), np.float32),  # (T, M, 11).
            pcl_target_valid=valid,
            valo_ids=valo_pad,
            num_valo_ids=np.int32(num_valo),
            cam_RT=np.stack(all_RT), cam_K=np.stack(all_K),
            meta_data=dict(
                data_kind=1002, num_views=num_views, num_frames=num_frames,
                scene_idx=scene_idx, frame_inds=frame_inds,
                n_fps_input=self.n_fps_input, n_fps_target=self.n_fps_target,
                pcl_input_size=pcl_input_size, pcl_target_size=pcl_target_size,
                view_sensor_matching=VIEW_SENSOR_MATCHING,
                occl_frame_idx=occl_frame_idx, found_occl_rate=found_rate,
                valo_ids=valo_pad, num_valo_ids=num_valo, live_occl=live_occl,
                track_id=track_id,
                cuboid_filter_ratios=np.asarray(cuboid_filter_ratios, np.float32),
                sample_input_ratios=np.asarray(sample_input_ratios, np.float32),
                sample_target_ratios=np.asarray(sample_target_ratios, np.float32)),
        )
        if self.return_images:
            out['rgb'] = np.stack(all_rgb)
        return out
