'''Torch/numpy-oracle parity for utils/misc.py against the reference's OWN
utils module (/root/reference/utils/utils.py) — the host-side helpers the data
readers and the track-rerun merge are built on.'''

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from occlusions4d_tpu.utils import misc  # noqa: E402

REF = '/root/reference'

pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, 'utils')),
                                reason='reference repo not mounted')


@pytest.fixture(scope='module')
def ref_utils():
    '''Import the reference's utils module (its shared __init__ pulls heavy
    but available deps; the missing ones are stubbed as in test_reference_parity).'''
    for name in ('torchvision', 'torchvision.datasets', 'torchvision.models',
                 'torchvision.transforms', 'torchvision.utils', 'wandb',
                 'open3d', 'torch_cluster'):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    added = [REF, os.path.join(REF, 'utils')]
    sys.path[:0] = added
    try:
        import importlib
        yield importlib.import_module('utils')
    finally:
        for p in added:
            sys.path.remove(p)


RNG = np.random.RandomState(5)


def test_accumulate_pcl_time_parity(ref_utils):
    # Array domain: (V, T, N, D) -> (V, T*N, D+1).
    arr = RNG.rand(3, 4, 17, 6).astype(np.float32)
    np.testing.assert_array_equal(misc.accumulate_pcl_time(arr.copy()),
                                  ref_utils.accumulate_pcl_time_numpy(arr.copy()))
    # List domain with per-frame point counts (the readers' real case).
    lst = [[RNG.rand(n, 6).astype(np.float32) for n in (5, 9, 3)]
           for _ in range(2)]
    got = misc.accumulate_pcl_time([[f.copy() for f in v] for v in lst])
    ref = ref_utils.accumulate_pcl_time_numpy([[f.copy() for f in v] for v in lst])
    assert len(got) == len(ref) == 2
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g, r)


def test_merge_pcl_views_parity(ref_utils):
    arr = RNG.rand(3, 4, 17, 6).astype(np.float32)
    np.testing.assert_array_equal(misc.merge_pcl_views(arr.copy()),
                                  ref_utils.merge_pcl_views_numpy(arr.copy()))
    lst = [[RNG.rand(7, 8).astype(np.float32) for _ in range(3)]
           for _ in range(4)]
    for insert in (False, True):
        got = misc.merge_pcl_views([[f.copy() for f in v] for v in lst],
                                   insert_view_idx=insert)
        ref = ref_utils.merge_pcl_views_numpy(
            [[f.copy() for f in v] for v in lst], insert_view_idx=insert)
        assert len(got) == len(ref) == 3
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)


def test_find_mask_ranges_parity(ref_utils):
    cases = [
        (RNG.rand(16, 33) > 0.5),
        np.zeros((3, 10), bool),                       # never True.
        np.ones((3, 10), bool),                        # always True.
        np.concatenate([np.zeros((2, 4), bool), np.ones((2, 6), bool)], 1),
        np.concatenate([np.ones((2, 6), bool), np.zeros((2, 4), bool)], 1),
    ]
    for mask in cases:
        ref = ref_utils.find_mask_ranges(torch.from_numpy(mask)).numpy()
        np.testing.assert_array_equal(misc.find_mask_ranges(mask), ref)


def test_elitist_shuffle_parity(ref_utils):
    items = np.arange(40)
    for inequality, seed in [(10, 0), (3, 7), (25, 123)]:
        np.random.seed(seed)
        ref = ref_utils.elitist_shuffle(items, inequality)
        got = misc.elitist_shuffle(items, inequality,
                                   rng=np.random.RandomState(seed))
        np.testing.assert_array_equal(got, ref)


def test_get_data_kind_parity(ref_utils):
    for path in ('/data/gr_sims/train', '/data/GREATER/x', '/x/carla_4d/test',
                 '/x/CARLA/val'):
        assert misc.get_data_kind(path) == ref_utils.get_data_kind(path)
    with pytest.raises(ValueError):
        misc.get_data_kind('/data/kubric')
    with pytest.raises(ValueError):
        ref_utils.get_data_kind('/data/kubric')


def _rerun_fixture(num_tracks, n=50, m=12, d=16, e=7, track_col=6):
    ids = list(range(num_tracks))
    abstract0 = RNG.rand(m, e).astype(np.float32)
    # Reruns share abstract xyz (deterministic FPS) but not the feature tail.
    abstracts = [np.concatenate([abstract0[:, :3],
                                 RNG.rand(m, e - 3).astype(np.float32)], 1)
                 for _ in range(num_tracks)]
    globals_ = [RNG.rand(d).astype(np.float32) for _ in range(num_tracks)]
    outs = [RNG.rand(n, track_col + 2).astype(np.float32)
            for _ in range(num_tracks)]
    return ids, abstracts, globals_, outs


@pytest.mark.parametrize('num_tracks', [1, 3])
def test_multi_track_merge_parity(ref_utils, num_tracks):
    ids, abstracts, globals_, outs = _rerun_fixture(num_tracks)
    track_col = 6
    if num_tracks == 1:
        ids = [-1]                                     # default (no-merge) path.
    got = misc.multi_track_merge(list(ids), [a.copy() for a in abstracts],
                                 [g.copy() for g in globals_],
                                 [o.copy() for o in outs], track_col)
    ref = ref_utils.multi_track_merge(list(ids), [a.copy() for a in abstracts],
                                      [g.copy() for g in globals_],
                                      [o.copy() for o in outs], track_col)
    for g, r in zip(got, ref):
        if g is None:
            assert r is None
        else:
            np.testing.assert_array_equal(g, r)


@pytest.mark.parametrize('last_minus', [0, 1])
def test_merge_steps_into_long_parity(ref_utils, last_minus):
    '''Long-video stitch (evaluate/results.merge_steps_into_long) vs the
    reference's merge_pcl_all_steps_into_long on identical exported records.'''
    from occlusions4d_tpu.evaluate.results import merge_steps_into_long

    def make_list():
        steps = []
        for _ in range(3):                             # To = 3 test steps.
            frames = []
            for _ in range(2):                         # Ti = 2 output frames.
                inp = RNG.rand(40, 8).astype(np.float32)
                inp[:, -2] = np.tile(np.arange(4, dtype=np.float32), 10)
                frames.append((inp, RNG.rand(6, 9).astype(np.float32),
                               RNG.rand(12, 9).astype(np.float32),
                               RNG.rand(12, 9).astype(np.float32),
                               RNG.rand(7, 5).astype(np.float32)))
            steps.append(frames)
        return steps

    state = RNG.get_state()
    lst = make_list()
    RNG.set_state(state)
    lst2 = make_list()
    got = merge_steps_into_long(lst, last_minus=last_minus)
    ref = ref_utils.merge_pcl_all_steps_into_long(lst2, last_minus=last_minus)
    assert len(got) == len(ref) == 3
    for g_rec, r_rec in zip(got, ref):
        for g, r in zip(g_rec, r_rec):
            np.testing.assert_array_equal(g, r)


def test_multi_track_merge_none_abstract_parity(ref_utils):
    ids, _, globals_, outs = _rerun_fixture(3)
    got = misc.multi_track_merge(ids, [None] * 3, [g.copy() for g in globals_],
                                 [o.copy() for o in outs], 6)
    ref = ref_utils.multi_track_merge(ids, [None] * 3,
                                      [g.copy() for g in globals_],
                                      [o.copy() for o in outs], 6)
    assert got[0] is None and ref[0] is None
    np.testing.assert_array_equal(got[1], ref[1])
    np.testing.assert_array_equal(got[2], ref[2])
