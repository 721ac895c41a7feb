'''Data plane tests on synthetic tiny scenes written in the exact on-disk formats.'''

import os

import numpy as np
import pytest

from occlusions4d_tpu.data import (GreaterDataset, CarlaDataset, Loader, collate,
                                   synthetic, create_train_val_loaders)
from occlusions4d_tpu.utils.logvis import Logger


@pytest.fixture(scope='module')
def greater_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('greater_mini')
    synthetic.make_greater_dataset(str(root), num_scenes=2, num_views=3,
                                   num_frames=24, image_size=36)
    return str(root)


@pytest.fixture(scope='module')
def carla_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('carla_mini')
    synthetic.make_carla_dataset(str(root), num_scenes=2, num_frames=60,
                                 points_per_frame=2500)
    return str(root)


def _logger():
    return Logger(context='test_data')


def test_greater_example_layout(greater_root):
    dset = GreaterDataset(greater_root, _logger(), stage='train', video_length=4,
                          frame_skip=2, n_points_rnd=2048, n_fps_input=512,
                          n_fps_target=-1024, pcl_input_frames=4,
                          pcl_target_frames=2, min_z=-1.0, other_bounds=5.0,
                          track_mode='random', seed=0)
    assert len(dset) >= 960  # virtual epoch multiplier.
    ex = dset[0]
    assert ex['pcl_input'].shape == (512, 8)
    # (x, y, z, R, G, B, t, mark_track): t in [0, 4), rgb in [0, 1].
    pi = ex['pcl_input']
    size = ex['meta_data']['pcl_input_size']
    assert 0 < size <= 512
    assert pi[:size, 6].min() >= 0 and pi[:size, 6].max() <= 3
    assert pi[:size, 3:6].min() >= 0 and pi[:size, 3:6].max() <= 1
    assert ex['pcl_input_sem'].shape == (512, 1)
    assert ex['pcl_target'].shape == (2, 1024, 9)
    assert ex['pcl_target_valid'].shape == (2, 1024)
    # Target layout: (x, y, z, inst, view, R, G, B, mark).
    tv = ex['pcl_target_valid'][0]
    tgt = ex['pcl_target'][0][tv]
    assert tgt.shape[0] > 100
    assert set(np.unique(tgt[:, 4].astype(int))) <= {0, 1, 2}    # view idx.
    assert tgt[:, 2].min() >= -1.0 - 1e-5                        # min_z filter.
    assert ex['valo_ids'].shape == (32,)
    # Spheres above the floor produce instances; at least one VALO id.
    assert int(ex['num_valo_ids']) >= 1


def test_greater_track_marking(greater_root):
    dset = GreaterDataset(greater_root, _logger(), stage='train', video_length=4,
                          frame_skip=2, n_points_rnd=2048, n_fps_input=512,
                          n_fps_target=-1024, pcl_input_frames=4,
                          pcl_target_frames=2, track_mode='snitch', seed=1)
    ex = dset[0]
    tid = ex['meta_data']['track_id']
    if tid >= 0:
        pi, sem = ex['pcl_input'], ex['pcl_input_sem']
        marked = pi[:, 7] > 0.5
        # Marks only in the first input frame and only on the tracked instance.
        assert np.all(pi[marked, 6] == 0)
        assert np.all(sem[marked, 0] == tid)
        tgt, tv = ex['pcl_target'][0], ex['pcl_target_valid'][0]
        tmarked = tgt[tv][:, 8] > 0.5
        assert np.all(tgt[tv][tmarked, 3] == tid)


def test_carla_example_layout(carla_root):
    dset = CarlaDataset(carla_root, _logger(), stage='train', video_length=4,
                        frame_skip=3, n_points_rnd=2048, n_fps_input=512,
                        n_fps_target=-1024, pcl_input_frames=4, pcl_target_frames=2,
                        reference_frame=3, min_z=-0.5, other_bounds=20.0,
                        target_bounds=16.0, cube_mode=4, seed=0)
    ex = dset[0]
    assert ex['pcl_input'].shape == (512, 8)
    assert ex['pcl_input_sem'].shape == (512, 3)
    assert ex['pcl_target'].shape == (2, 1024, 11)
    tv = ex['pcl_target_valid'][0]
    tgt = ex['pcl_target'][0][tv]
    # Targets restricted to the padded output cuboid.
    assert tgt[:, 0].min() >= -2.0 - 1e-4
    assert tgt[:, 1].min() >= -18.0 - 1e-4 and tgt[:, 1].max() <= 18.0 + 1e-4
    # Semantic tags preserved.
    assert set(np.unique(tgt[:, 5].astype(int))) <= set(range(13))
    assert ex['valo_ids'].shape == (256,)


def test_carla_ego_motion_alignment(carla_root):
    '''With reference-frame correction, static structure must align across frames:
    the same world points from different frames land at the same coordinates.'''
    dset = CarlaDataset(carla_root, _logger(), stage='train', video_length=4,
                        frame_skip=3, n_points_rnd=-1, n_fps_input=2048,
                        n_fps_target=-4096, pcl_input_frames=4, pcl_target_frames=1,
                        reference_frame=3, seed=1)
    ex = dset[0]
    pi = ex['pcl_input']
    size = ex['meta_data']['pcl_input_size']
    pts = pi[:size]
    # Points from all frames share the reference coordinate system: x range bounded
    # by the input cuboid around the *reference* ego position, not growing with t.
    for t in range(4):
        sel = pts[pts[:, 6] == t]
        if len(sel):
            assert sel[:, 0].min() >= -14.0 - 1e-3 and sel[:, 0].max() <= 50.0 + 1e-3


def test_oversample_vehped_target(carla_root):
    dset = CarlaDataset(carla_root, _logger(), stage='train', video_length=4,
                        frame_skip=3, n_points_rnd=-1, n_fps_input=256,
                        n_fps_target=-512, pcl_input_frames=4, pcl_target_frames=1,
                        reference_frame=3, oversample_vehped_target=True, seed=2)
    ex = dset[0]
    tgt = ex['pcl_target'][0][ex['pcl_target_valid'][0]]
    # Vehped retention: all retained rows come first; vehicles never subsampled away.
    assert (tgt[:, 5] == 10).sum() > 0


def test_loader_collate_and_prefetch(greater_root):
    dset = GreaterDataset(greater_root, _logger(), stage='val', video_length=4,
                          frame_skip=2, n_points_rnd=1024, n_fps_input=256,
                          n_fps_target=-512, pcl_input_frames=4, pcl_target_frames=2,
                          seed=3)
    loader = Loader(dset, batch_size=2, shuffle=True, seed=0)
    batches = []
    for i, batch in enumerate(loader.epoch(0)):
        batches.append(batch)
        if i >= 2:
            break
    b = batches[0]
    assert b['pcl_input'].shape == (2, 256, 8)
    assert b['pcl_target'].shape == (2, 2, 512, 9)
    assert b['pcl_target_valid'].shape == (2, 2, 512)
    assert b['valo_ids'].shape == (2, 32)
    assert len(b['meta_data']) == 2


def test_factory_selects_by_path(greater_root, carla_root):
    from occlusions4d_tpu.config import TrainConfig, verify_args
    cfg = TrainConfig(data_path=greater_root, n_points=256, n_data_rnd=512,
                      video_len=4, frame_skip=2, past_frames=2, batch_size=2,
                      pt_cube_bounds=5.0)
    verify_args(cfg, is_train=True)
    kind, tr, va, dargs = create_train_val_loaders(cfg, _logger())
    assert kind == 'greater'
    assert dargs['n_fps_target'] == -1024
    batch = next(iter(tr.epoch(0)))
    assert batch['pcl_input'].shape == (2, 256, 8)

    cfg2 = TrainConfig(data_path=carla_root, n_points=256, n_data_rnd=512,
                       video_len=4, frame_skip=3, past_frames=2, batch_size=2,
                       pt_cube_bounds=20.0, cr_cube_bounds=16.0)
    verify_args(cfg2, is_train=True)
    kind2, tr2, _, dargs2 = create_train_val_loaders(cfg2, _logger())
    assert kind2 == 'carla'
    assert dargs2['reference_frame'] == 3
    batch2 = next(iter(tr2.epoch(0)))
    assert batch2['pcl_target'].shape[-1] == 11


def test_use_data_frac_scene_count_mode(greater_root, carla_root):
    '''use_data_frac < 0 switches to absolute scene-count mode: keep the first
    -frac scenes (sorted order), full virtual-epoch multiplier, and
    deterministic (middle) frame starts
    (/root/reference/data/data_greater.py:146-152, data_carla.py equivalent).'''
    dset = GreaterDataset(greater_root, _logger(), stage='test', video_length=4,
                          frame_skip=2, n_points_rnd=1024, n_fps_input=256,
                          n_fps_target=-512, pcl_input_frames=4,
                          pcl_target_frames=2, use_data_frac=-1,
                          use_json=False, seed=0)
    assert dset.num_scenes == 1 and len(dset.all_scenes) == 1
    assert not dset.allow_random_frames
    # 120 virtual test examples over 1 scene -> multiplier 120.
    assert len(dset) == dset.multiplier == 120
    # Deterministic frame start: the same index yields the same example.
    a, b = dset[0], dset[0]
    np.testing.assert_array_equal(a['pcl_input'], b['pcl_input'])

    cset = CarlaDataset(carla_root, _logger(), stage='test', video_length=4,
                        frame_skip=3, n_points_rnd=1024, n_fps_input=256,
                        n_fps_target=-512, pcl_input_frames=4,
                        pcl_target_frames=2, reference_frame=3, cube_mode=4,
                        use_data_frac=-2, seed=0)
    assert cset.num_scenes == 2 and not cset.allow_random_frames
    assert len(cset) == 2 * cset.multiplier


def test_greater_return_images_full_surface(greater_root):
    '''return_images yields the complete visualization-grade image dict: rgb, depth,
    flat (preflat instance hues), snitch mask stacks
    (/root/reference/data/data_greater.py:356-377, 592-614).'''
    dset = GreaterDataset(greater_root, _logger(), stage='val', video_length=4,
                          frame_skip=2, n_points_rnd=1024, n_fps_input=256,
                          n_fps_target=-512, pcl_input_frames=4, pcl_target_frames=2,
                          return_images=True, seed=4)
    ex = dset[0]
    V, T = 3, 4
    assert ex['rgb'].shape[:2] == (V, T) and ex['rgb'].shape[-1] == 3
    assert ex['depth'].shape[:2] == (V, T) and ex['depth'].ndim == 4
    assert ex['flat'].shape == ex['rgb'].shape
    assert ex['snitch'].shape == ex['rgb'].shape
    assert ex['snitch'].max() <= 1.0 and ex['snitch'].min() >= 0.0
    # The synthetic scenes render a real snitch mask; it is non-empty somewhere.
    assert ex['snitch'].sum() > 0


def test_per_example_rng_reproducible(greater_root, carla_root):
    '''Per-(seed, epoch, index) RNG: num_workers=4 epochs are bit-reproducible, and
    the stream advances across epochs (mirrors the reference's seed_worker intent,
    /root/reference/data/data.py:14-17, without the thread race on a shared
    RandomState).'''
    def make_loader():
        dset = GreaterDataset(greater_root, _logger(), stage='train', video_length=4,
                              frame_skip=2, n_points_rnd=1024, n_fps_input=256,
                              n_fps_target=-512, pcl_input_frames=4,
                              pcl_target_frames=2, track_mode='random', seed=7)
        return Loader(dset, batch_size=2, shuffle=True, seed=7, num_workers=4)

    run1 = [b['pcl_input'] for _, b in zip(range(3), make_loader().epoch(1))]
    run2 = [b['pcl_input'] for _, b in zip(range(3), make_loader().epoch(1))]
    for a, b in zip(run1, run2):
        np.testing.assert_array_equal(a, b)

    # Same index, different epoch -> a different draw (stream advances).
    dset = CarlaDataset(carla_root, _logger(), stage='train', video_length=4,
                        frame_skip=3, n_points_rnd=2048, n_fps_input=512,
                        n_fps_target=-1024, pcl_input_frames=4, pcl_target_frames=2,
                        reference_frame=3, seed=0)
    dset.set_epoch(0)
    e0 = dset[4]['pcl_input']
    dset.set_epoch(1)
    e1 = dset[4]['pcl_input']
    dset.set_epoch(0)
    e0_again = dset[4]['pcl_input']
    np.testing.assert_array_equal(e0, e0_again)
    assert not np.array_equal(e0, e1)


def test_loader_thread_pool_matches_serial(tmp_path):
    '''Pooled decoding yields identical batch order/content to the serial path
    for a deterministic dataset.'''
    from occlusions4d_tpu.data.loader import Loader

    class Dset:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            return dict(pcl_input=np.full((4, 8), float(i), np.float32),
                        meta_data=dict(idx=i))

    a = Loader(Dset(), 3, shuffle=True, drop_last=True, seed=5, num_workers=1)
    b = Loader(Dset(), 3, shuffle=True, drop_last=True, seed=5, num_workers=4)
    batches_a = list(a.epoch(2))
    batches_b = list(b.epoch(2))
    assert len(batches_a) == len(batches_b) == 4
    for ba, bb in zip(batches_a, batches_b):
        np.testing.assert_array_equal(ba['pcl_input'], bb['pcl_input'])
        assert [m['idx'] for m in ba['meta_data']] == \
            [m['idx'] for m in bb['meta_data']]


def test_fps_host_chunked_matches_naive_sequence():
    '''The QuickFPS-style chunked path (n >= 16384, n_out >= 256) must produce
    the exact greedy pick sequence of the naive O(n*n_out) loop.'''
    from occlusions4d_tpu.native import fps_host
    rng = np.random.RandomState(5)
    xyz = rng.rand(20000, 3).astype(np.float32) * 4 - 2
    n_out, start = 300, 11
    out = np.empty(n_out, np.int64)
    out[0] = start
    min_d = np.full(xyz.shape[0], np.inf, np.float32)
    for s in range(1, n_out):
        d = np.sum((xyz - xyz[out[s - 1]]) ** 2, axis=-1).astype(np.float32)
        min_d = np.minimum(min_d, d)
        out[s] = int(np.argmax(min_d))
    got = fps_host(xyz, n_out, start_idx=start, sort_result=False)
    np.testing.assert_array_equal(np.asarray(got, np.int64), out)


def test_loader_process_pool_matches_thread(greater_root):
    '''worker_mode='process' (fork workers, the reference DataLoader model)
    yields bit-identical batches to the thread pool: per-example RNG is
    (seed, epoch, index)-derived, so worker topology cannot change content.'''
    def make_loader(mode):
        dset = GreaterDataset(greater_root, _logger(), stage='train',
                              video_length=4, frame_skip=2, n_points_rnd=1024,
                              n_fps_input=256, n_fps_target=-512,
                              pcl_input_frames=4, pcl_target_frames=2,
                              track_mode='random', seed=7,
                              shared_counters=(mode == 'process'))
        return Loader(dset, batch_size=2, shuffle=True, seed=7, num_workers=2,
                      worker_mode=mode)

    thread_batches = [b for _, b in zip(range(2), make_loader('thread').epoch(0))]
    proc_batches = [b for _, b in zip(range(2), make_loader('process').epoch(0))]
    assert len(thread_batches) == len(proc_batches) == 2
    for bt, bp in zip(thread_batches, proc_batches):
        for key in ('pcl_input', 'pcl_target', 'pcl_target_valid', 'valo_ids'):
            np.testing.assert_array_equal(bt[key], bp[key])


def test_counter_board_shared_across_forks(greater_root):
    '''shared=True CounterBoard claims are visible across fork boundaries.'''
    import multiprocessing
    from occlusions4d_tpu.data.common import CounterBoard
    board = CounterBoard(2, max_frames=16, shared=True)
    assert board.try_claim(0, 3)

    def child(b, q):
        q.put(b.try_claim(0, 3))   # already taken by the parent.
        q.put(b.try_claim(1, 5))   # free.

    ctx = multiprocessing.get_context('fork')
    q = ctx.Queue()
    p = ctx.Process(target=child, args=(board, q))
    p.start(); p.join(timeout=60)
    assert q.get(timeout=10) is False
    assert q.get(timeout=10) is True
    assert board.counts[1, 5] == 1  # child's claim visible in the parent.


def test_native_greater_frame_matches_numpy():
    '''The fused C++ frame decode (native/frame_ops.cpp: hue clustering +
    unprojection + cuboid/floor filter in one pixel pass) must be BYTE-identical
    to the numpy chain — same scalar op order, fp-contract off — so worker-mode
    and fallback paths can never diverge.'''
    from occlusions4d_tpu import native
    from occlusions4d_tpu.data import greater as G
    from occlusions4d_tpu.ops.bounds import greater_bounds

    if not native.native_available():
        pytest.skip('no C++ toolchain')

    rng = np.random.RandomState(11)
    H, W = 96, 128
    rgb = rng.randint(0, 256, (H, W, 3)).astype(np.float32)
    flat = rng.randint(0, 256, (H, W, 3)).astype(np.float32)
    flat[::3] = flat[::3, :, :1]                  # desaturated -> background.
    depth = rng.rand(H, W).astype(np.float32) * 12.0
    depth[rng.rand(H, W) < 0.25] = 0.0
    cam_K = np.array([[90., 0., W / 2], [0., 90., H / 2], [0., 0., 1.]],
                     np.float32)
    th = 0.4
    cam_RT = np.array([[np.cos(th), -np.sin(th), 0., 1.0],
                       [np.sin(th), np.cos(th), 0., -2.0],
                       [0., 0., 1., 0.5]], np.float32)
    cub = greater_bounds(5.0, -1.0)

    pcl_c, nv_c = G.greater_frame_points(rgb, flat, depth, cam_RT, cam_K, cub)

    import occlusions4d_tpu.native as nat
    saved = nat._lib, nat._tried
    try:
        nat._lib, nat._tried = None, True         # force the numpy fallback.
        pcl_n, nv_n = G.greater_frame_points(rgb, flat, depth, cam_RT, cam_K,
                                             cub)
    finally:
        nat._lib, nat._tried = saved

    assert nv_c == nv_n
    assert pcl_c.shape == pcl_n.shape and pcl_c.shape[0] > 100
    np.testing.assert_array_equal(pcl_c, pcl_n)
    # Sane decode: some background (-1) and some clustered instance ids.
    assert (pcl_c[:, 3] == -1).any() and (pcl_c[:, 3] >= 0).any()


def test_subsample_pad_fused_shuffle_bit_identical():
    '''subsample_pad(shuffle=True) == shuffle_rows + subsample_pad, bit for
    bit and rng-stream for rng-stream, across random / fps / pad / exact-fit /
    retain_vehped paths (the fused form only gathers the kept rows).'''
    from occlusions4d_tpu.data import common

    def pair(case, **kw):
        N = case
        rng = np.random.RandomState(123)
        pcl = (rng.rand(N, 9).astype(np.float32) * 8 - 4)
        pcl[:, 5] = rng.randint(0, 12, N)  # semantic tags incl. 4 / 10.
        r1, r2 = np.random.RandomState(7), np.random.RandomState(7)
        a, na = common.subsample_pad(common.shuffle_rows(pcl, r1), **kw, rng=r1)
        b, nb = common.subsample_pad(pcl, **kw, rng=r2, shuffle=True)
        assert na == nb
        np.testing.assert_array_equal(a, b)
        # Identical stream position afterwards.
        assert r1.randint(1 << 30) == r2.randint(1 << 30)

    pair(5000, n_desired=300, mode='random')
    pair(5000, n_desired=300, mode='farthest_point', fps_start=17)
    pair(200, n_desired=300)                 # pad path.
    pair(300, n_desired=300)                 # exact-fit path.
    pair(5000, n_desired=300, mode='random', retain_vehped=True, segm_idx=5)


def test_carla_track_marking(carla_root):
    '''track_mode='random' (framework extension; the reference stubs CARLA
    marks to zero, data_carla.py:615-623): one random first-frame-visible
    instance is marked in the input, target marks equal instance membership,
    and everything else is bit-identical to the stub mode.'''
    kw = dict(video_length=4, frame_skip=3, n_points_rnd=2048, n_fps_input=512,
              n_fps_target=-1024, pcl_input_frames=4, pcl_target_frames=2,
              reference_frame=3, min_z=-0.5, other_bounds=20.0,
              target_bounds=16.0, cube_mode=4, seed=3)
    ds0 = CarlaDataset(carla_root, _logger(), stage='train',
                       track_mode='none', **kw)
    ds1 = CarlaDataset(carla_root, _logger(), stage='train',
                       track_mode='random', **kw)
    e0, e1 = ds0[0], ds1[0]
    assert e0['meta_data']['track_id'] == -1
    assert float(e0['pcl_input'][:, -1].sum()) == 0.0

    tid = e1['meta_data']['track_id']
    assert tid >= 0
    pi, sem = e1['pcl_input'], e1['pcl_input_sem']
    marked = pi[:, 7] > 0.5
    assert marked.sum() >= 16
    # Marks only in the first input frame and only on the tracked instance.
    assert np.all(pi[marked, 6] == 0)
    assert np.all(sem[marked, 1] == tid)
    for t in range(2):
        tgt = e1['pcl_target'][t][e1['pcl_target_valid'][t]]
        np.testing.assert_array_equal(tgt[:, 10] > 0.5, tgt[:, 4] == tid)
    # Non-mark columns identical across modes (per-(seed,epoch,index) rng:
    # the extra track-id draw must not perturb the shared stream).
    np.testing.assert_array_equal(e0['pcl_input'][:, :7], e1['pcl_input'][:, :7])
    np.testing.assert_array_equal(e0['pcl_target'][..., :10],
                                  e1['pcl_target'][..., :10])
    np.testing.assert_array_equal(e0['pcl_input_sem'], e1['pcl_input_sem'])


def _write_png_raw(fp, arr, filter_type, bit16=False):
    '''Hand-rolled PNG writer with a FORCED per-row filter type (PIL/imageio
    write filter 0 only; real GREATER frames come from libpng's adaptive
    filters 0-4, so the native decoder's unfilter paths need a real probe).
    arr: (H, W) gray or (H, W, C) uint8 — or uint16 when bit16 (gray only).'''
    import struct
    import zlib as _z
    a = np.asarray(arr)
    H, W = a.shape[:2]
    C = 1 if a.ndim == 2 else a.shape[2]
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[C]
    depth = 16 if bit16 else 8
    raw = (a.astype('>u2') if bit16 else a.astype(np.uint8)).tobytes()
    bpp = C * (2 if bit16 else 1)
    stride = W * bpp
    rows = [np.frombuffer(raw[y * stride:(y + 1) * stride], np.uint8)
            .astype(np.int32) for y in range(H)]

    def paeth(q, b, c):
        p = q + b - c
        pa, pb, pc = abs(p - q), abs(p - b), abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), q, np.where(pb <= pc, b, c))

    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(H):
        cur = rows[y]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - ((left + prev) >> 1)
        else:
            enc = cur - paeth(left, prev, ul)
        out.append(filter_type)
        out.extend((enc & 0xff).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, data):
        return (struct.pack('>I', len(data)) + tag + data
                + struct.pack('>I', _z.crc32(tag + data) & 0xffffffff))

    ihdr = struct.pack('>IIBBBBB', W, H, depth, color_type, 0, 0, 0)
    with open(fp, 'wb') as f:
        f.write(b'\x89PNG\r\n\x1a\n')
        f.write(chunk(b'IHDR', ihdr))
        f.write(chunk(b'IDAT', _z.compress(bytes(out))))
        f.write(chunk(b'IEND', b''))


def test_native_png_frame_matches_pil(tmp_path):
    '''The fully-fused PNG -> frame decode (native/png_ops.cpp) must be
    BYTE-identical to the PIL + numpy chain (_imread + greater_frame_points)
    on every PNG flavor the GREATER data uses: 8-bit RGB/RGBA rgb+preflat,
    8-bit AND 16-bit gray depth, all five scanline filter types; palettized /
    interlaced files must fall back (return None) rather than misdecode.'''
    from occlusions4d_tpu import native
    from occlusions4d_tpu.data import greater as G
    from occlusions4d_tpu.ops.bounds import greater_bounds

    if not native.native_available():
        pytest.skip('no C++ toolchain')

    rng = np.random.RandomState(23)
    H, W = 40, 56
    cam_K = np.array([[50., 0., W / 2], [0., 50., H / 2], [0., 0., 1.]],
                     np.float32)
    cam_RT = np.array([[1., 0., 0., 0.5], [0., 1., 0., -1.0],
                       [0., 0., 1., 0.25]], np.float32)
    cub = greater_bounds(5.0, -1.0)

    # Gradient + noise content so sub/up/avg/paeth actually change bytes.
    gx = np.linspace(0, 255, W, dtype=np.float32)[None, :, None]
    gy = np.linspace(0, 255, H, dtype=np.float32)[:, None, None]
    base = (0.5 * gx + 0.5 * gy) + rng.randint(0, 32, (H, W, 3))
    rgb8 = np.clip(base, 0, 255).astype(np.uint8)
    flat8 = np.clip(base[..., ::-1] * 0.9, 0, 255).astype(np.uint8)
    depth8 = np.clip(0.3 * gx[..., 0] + rng.randint(0, 64, (H, W)),
                     0, 255).astype(np.uint8)
    depth8[rng.rand(H, W) < 0.2] = 0
    depth16 = (depth8.astype(np.uint16) * 257) ^ rng.randint(
        0, 255, (H, W)).astype(np.uint16)

    def pil_chain(rgb_fp, flat_fp, depth_fp):
        rgb = G._imread(rgb_fp)[..., :3].astype(np.float32)
        flat = G._imread(flat_fp)[..., :3].astype(np.float32)
        depth = G._imread(depth_fp).astype(np.float32) * G.MAX_DEPTH_CLIP
        if depth.ndim == 3:
            depth = depth[..., 0]
        return G.greater_frame_points(rgb, flat, depth, cam_RT, cam_K, cub)

    for filt in range(5):
        for depth_mode in ('gray8', 'gray16'):
            rgb_fp = str(tmp_path / f'rgb_f{filt}.png')
            flat_fp = str(tmp_path / f'flat_f{filt}.png')
            depth_fp = str(tmp_path / f'depth_f{filt}_{depth_mode}.png')
            # RGBA for one filter to cover the 4-channel stride.
            if filt == 3:
                rgba = np.concatenate(
                    [rgb8, np.full((H, W, 1), 200, np.uint8)], axis=-1)
                _write_png_raw(rgb_fp, rgba, filt)
            else:
                _write_png_raw(rgb_fp, rgb8, filt)
            _write_png_raw(flat_fp, flat8, filt)
            if depth_mode == 'gray16':
                _write_png_raw(depth_fp, depth16, filt, bit16=True)
            else:
                _write_png_raw(depth_fp, depth8, filt)

            res = G.greater_frame_points_png(rgb_fp, flat_fp, depth_fp,
                                             cam_RT, cam_K, cub)
            assert res is not None, (filt, depth_mode)
            pcl_ref, nv_ref = pil_chain(rgb_fp, flat_fp, depth_fp)
            assert res[1] == nv_ref
            assert res[0].shape[0] > 20, 'degenerate probe'
            np.testing.assert_array_equal(res[0], pcl_ref)

    # Unsupported flavors fall back to None (PIL path serves them instead).
    from PIL import Image
    pal_fp = str(tmp_path / 'pal.png')
    Image.fromarray(rgb8).convert('P', palette=Image.ADAPTIVE).save(pal_fp)
    ok_flat = str(tmp_path / 'flat_f0.png')
    ok_depth = str(tmp_path / 'depth_f0_gray8.png')
    assert G.greater_frame_points_png(pal_fp, ok_flat, ok_depth,
                                      cam_RT, cam_K, cub) is None
    # Mismatched dimensions are rejected, not misread.
    small_fp = str(tmp_path / 'small.png')
    _write_png_raw(small_fp, rgb8[:H // 2], 0)
    assert G.greater_frame_points_png(small_fp, ok_flat, ok_depth,
                                      cam_RT, cam_K, cub) is None
    # Missing file: graceful fallback.
    assert G.greater_frame_points_png(str(tmp_path / 'nope.png'), ok_flat,
                                      ok_depth, cam_RT, cam_K, cub) is None


def test_native_nn1_grid_matches_bruteforce():
    '''o4d_nn1_grid (uniform-cell 1-NN, the large-problem path behind
    nn1_host) is BIT-identical to the brute-force o4d_nn1 — same per-pair
    float expression, lexicographic (d, index) winner, slack-padded ring
    bound (host_ops.cpp). Adversarial geometry: exact ties from integer-grid
    points, duplicate keys, planar/collinear keys (zero extent), queries far
    outside the key bbox, 1e6-scale coordinates (cell-binning stress),
    heavily clustered keys, m=1.'''
    import ctypes  # noqa: F401 - signatures bound in native._load.
    from occlusions4d_tpu import native
    if not native.native_available():
        pytest.skip('no native library')
    lib = native._load()
    rng = np.random.RandomState(3)

    def run(fn, q, k):
        q = np.ascontiguousarray(q, np.float32)
        k = np.ascontiguousarray(k, np.float32)
        d = np.empty(q.shape[0], np.float32)
        i = np.empty(q.shape[0], np.int32)
        fn(q, q.shape[0], k, k.shape[0], d, i)
        return d, i

    gq = np.stack(np.meshgrid(*[np.arange(7, dtype=np.float32)] * 3),
                  -1).reshape(-1, 3)
    dup = np.repeat(rng.randn(40, 3).astype(np.float32), 8, axis=0)
    rng.shuffle(dup)
    planar = rng.randn(1500, 3).astype(np.float32)
    planar[:, 2] = 0.0
    cases = [
        (rng.randn(2000, 3) * 3, rng.randn(1500, 3) * 3),
        (gq, gq[::2].copy()),                       # exact ties.
        (gq + 0.5, gq.copy()),
        (rng.randn(300, 3), dup),                   # duplicate keys.
        (rng.randn(200, 3) * 100 + 500, rng.randn(800, 3)),  # far queries.
        (rng.randn(400, 3), planar),                # zero-extent axis.
        (rng.randn(500, 3) * 1e6, rng.randn(2000, 3) * 1e6),  # binning stress.
        (rng.randn(100, 3), rng.randn(1, 3)),       # m = 1.
    ]
    for q, k in cases:
        db, ib = run(lib.o4d_nn1, q, k)
        dg, ig = run(lib.o4d_nn1_grid, q, k)
        np.testing.assert_array_equal(db, dg)
        np.testing.assert_array_equal(ib, ig)

    # nn1_host dispatches by problem size; both routes agree with numpy.
    q = rng.randn(4096, 3).astype(np.float32)
    k = rng.randn(1100, 3).astype(np.float32)   # 4096*1100 > 2^22 -> grid.
    d, i = native.nn1_host(q, k)
    ref_d = np.linalg.norm(q[:, None] - k[None], axis=-1)
    ref_i = ref_d.argmin(axis=-1)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(d, ref_d[np.arange(len(q)), ref_i], rtol=1e-5)
