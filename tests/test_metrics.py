'''Offline results/metrics tooling tests (evaluate/results.py, evaluate/metrics.py)
plus the new logvis artifact savers and the profiling subsystem.'''

import os
import pickle

import numpy as np
import pytest

from occlusions4d_tpu.evaluate.metrics import (frame_metrics, evaluate_results,
                                               chamfer_distance)
from occlusions4d_tpu.evaluate.results import (find_test_result_files,
                                               load_test_results,
                                               merge_steps_into_long)


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def _make_target(rng, m=200):
    # GREATER layout: (x, y, z, inst, view, R, G, B, mark).
    tgt = np.zeros((m, 9), np.float32)
    tgt[:, :3] = rng.rand(m, 3) * 4.0 - 2.0
    tgt[:, 3] = rng.randint(0, 3, m)
    tgt[:, 5:8] = rng.rand(m, 3)
    tgt[:, 8] = (tgt[:, 3] == 1).astype(np.float32)
    return tgt


def _make_outputs(rng, tgt, color_mode='rgb'):
    # Solid = jittered copies of target points (true positives) + far garbage (FPs).
    n_tp, n_fp, n_fn = 120, 30, 40
    rows_tp = tgt[rng.randint(0, len(tgt), n_tp)]
    solid_tp = np.concatenate([
        rows_tp[:, :3] + rng.randn(n_tp, 3) * 0.01,   # xyz near targets.
        np.zeros((n_tp, 1), np.float32),              # t
        np.full((n_tp, 1), 0.9, np.float32),          # density
        rows_tp[:, 5:8],                              # colors (perfect).
        rows_tp[:, 8:9],                              # mark.
    ], axis=-1)
    solid_fp = solid_tp[:n_fp].copy()
    solid_fp[:, :3] += 100.0                          # far from every target.
    output_solid = np.concatenate([solid_tp, solid_fp])
    # Air: mostly far away (true negatives) + a few near targets (false negatives).
    air = np.zeros((200, 5), np.float32)
    air[:, :3] = rng.rand(200, 3) * 4 + 50.0
    air[:n_fn, :3] = tgt[rng.randint(0, len(tgt), n_fn), :3]
    return output_solid, air


def test_frame_metrics_sane(rng):
    tgt = _make_target(rng)
    output_solid, output_air = _make_outputs(rng, tgt)
    m = frame_metrics(output_solid, output_air, tgt, 'greater', 0.2, 'rgb')
    assert 0.7 < m['occupancy_precision'] <= 1.0
    assert 0.6 < m['occupancy_recall'] <= 1.0
    assert m['occupancy_iou'] <= m['occupancy_f1']
    assert m['color_mae'] < 0.05                      # colors copied from GT.
    assert m['chamfer'] > 0.0 and np.isfinite(m['chamfer'])
    assert 'tracking_precision' in m


def test_tracking_explicit_id_flag(rng):
    '''Id mode (mark_is_instance_id=True, track_mode='all' merges) scores
    multi-instance identity against the GT instance column, and instance id 0
    (the GREATER snitch) counts as a detection — the old value-range heuristic
    (max > 1.0) misread an all-{0,-1} mark column as sigmoid scores. Score
    mode on the same values reads them as scores < 0.5 (no detections).'''
    tgt = _make_target(rng)
    output_solid, output_air = _make_outputs(rng, tgt)
    # Recover each predicted point's source instance via 1-NN and write perfect
    # merged ids for instance 0 only, -1 (undetected) elsewhere: the mark
    # column then contains ONLY {0, -1}.
    from occlusions4d_tpu.native import nn1_host
    _, nn_idx = nn1_host(output_solid[:, :3], tgt[:, :3])
    gt_inst = tgt[nn_idx, 3]
    output_solid[:, 8] = np.where(gt_inst == 0, 0.0, -1.0)
    m_id = frame_metrics(output_solid, output_air, tgt, 'greater', 0.2, 'rgb',
                         mark_is_instance_id=True)
    assert m_id['tracking_precision'] > 0.9    # detected id-0 points correct.
    assert 0.05 < m_id['tracking_recall'] < 0.7  # instances 1, 2 undetected.
    m_score = frame_metrics(output_solid, output_air, tgt, 'greater', 0.2, 'rgb',
                            mark_is_instance_id=False)
    # The same {0, -1} values read as sigmoid scores: nothing crosses 0.5.
    assert m_score['tracking_precision'] == 0.0
    assert m_score['tracking_recall'] == 0.0


def test_chamfer_identity(rng):
    pts = rng.rand(50, 3).astype(np.float32)
    assert chamfer_distance(pts, pts) < 1e-6
    assert chamfer_distance(np.zeros((0, 3), np.float32), pts) == float('inf')


def test_results_roundtrip_and_aggregate(rng, tmp_path):
    # Fabricate two steps of exported artifacts under logs/run_x/test_y/.
    test_dir = tmp_path / 'run_a' / 'test_main'
    os.makedirs(test_dir)
    tgt = _make_target(rng)
    for step in range(2):
        frames = []
        for t in range(3):
            solid, air = _make_outputs(rng, tgt)
            pcl_input = np.zeros((64, 8), np.float32)
            pcl_input[:, -2] = rng.randint(0, 4, 64)      # time channel.
            abstract = rng.rand(16, 6).astype(np.float32)
            frames.append((pcl_input, abstract, solid, tgt, air))
        with open(test_dir / f'pcl_io_s{step}.p', 'wb') as f:
            pickle.dump(frames, f)

    files = find_test_result_files(str(tmp_path / 'run'))
    assert len(files) == 2

    loaded = load_test_results(str(tmp_path / 'run'))
    assert len(loaded) == 2 and len(loaded[0]) == 3

    agg = evaluate_results(loaded, 'greater', 0.2, 'rgb')
    assert agg['num_frames'] == 6
    assert 0.0 < agg['occupancy_f1'] <= 1.0

    long = merge_steps_into_long(loaded)
    assert len(long) == 2
    # Selected output frame gets restamped with the step index as time.
    assert (long[1][2][:, 3] == 1).all()
    # First input is the concatenation of all selected inputs.
    assert long[0][0].shape[0] >= long[1][0].shape[0]


def test_logvis_savers(tmp_path, rng):
    from occlusions4d_tpu.utils.logvis import Logger
    logger = Logger(log_dir=str(tmp_path), context='t')
    img = rng.rand(16, 24, 3).astype(np.float32)
    fp = logger.save_image(img, 'im')
    assert os.path.exists(fp)
    fp = logger.save_gallery(rng.rand(5, 8, 8, 3), 'gal', num_cols=3)
    assert os.path.exists(fp)
    fp = logger.save_video(rng.rand(4, 16, 16, 3), 'vid', fps=4)
    assert os.path.exists(fp)


def test_report_pcl_air_histograms(tmp_path, rng):
    '''Air-split per-channel histograms run for every color mode, xyzt on/off,
    compressed air, and empty sides (reference logvis.py:467-535).'''
    from occlusions4d_tpu.utils.logvis import StepLogger
    logger = StepLogger(log_dir=str(tmp_path), context='t')
    for color_mode, q in (('rgb', 3), ('hsv', 14), ('bins', 9)):
        c = 1 + q + 1 + 13
        solid = rng.rand(50, 4 + c).astype(np.float32)
        air_c = rng.rand(30, 5).astype(np.float32)      # compressed eval air.
        logger.report_pcl_air_histograms('test', solid, air_c, color_mode, 0,
                                         True, 13, True, True, 0)
        flat = rng.rand(40, c).astype(np.float32)       # train-time split.
        logger.report_pcl_air_histograms('val', flat, flat[:0], color_mode, 1,
                                         True, 13, True, False, 0)
    logger.report_pcl_air_histograms('test', np.zeros((0, 9), np.float32), None,
                                     'rgb', 0, False, 13, False, False, 0)


def test_phase_timer():
    from occlusions4d_tpu.utils.profiling import PhaseTimer
    t = PhaseTimer()
    with t.phase('a'):
        pass
    with t.phase('a'):
        pass
    with t.phase('b'):
        pass
    s = t.summary()
    assert s['a'][1] == 2 and s['b'][1] == 1
    assert 'a:' in t.report()
    t.reset()
    assert not t.totals


def test_scalar_history_persists_per_epoch(tmp_path):
    '''epoch_finished commits scalar-memory means into scalar_history and
    logs/<tag>/scalars.json — the file-mode equivalent of the reference's
    wandb scalar timeline (logvis.py:133-151) and the source of the committed
    convergence trajectory.'''
    import json
    from occlusions4d_tpu.utils.logvis import Logger
    logger = Logger(log_dir=str(tmp_path), context='t')
    for e, vals in enumerate(([1.0, 3.0], [2.0])):
        for v in vals:
            logger.report_scalar('train/total_loss', v, remember=True)
        logger.report_scalar('val_aug/total_loss', v + 1, remember=True)
        logger.epoch_finished(e)
    assert [r['epoch'] for r in logger.scalar_history] == [0, 1]
    assert logger.scalar_history[0]['train/total_loss'] == 2.0  # mean.
    assert logger.scalar_history[1]['train/total_loss'] == 2.0
    assert logger.scalar_history[1]['val_aug/total_loss'] == 3.0
    with open(os.path.join(str(tmp_path), 'scalars.json')) as f:
        assert json.load(f) == logger.scalar_history


def test_frame_metrics_precomputed_nn_bit_identical(rng):
    '''The nn_solid/nn_air_d fast path (finish_inference reusing its gt-path
    1-NN) is BIT-identical to in-place recomputation: nn1 is row-independent,
    so distances/indices of the split clouds equal the full-query pass.'''
    from occlusions4d_tpu.native import nn1_host
    tgt = _make_target(rng)
    output_solid, output_air = _make_outputs(rng, tgt)
    d_s, i_s = nn1_host(output_solid[:, :3].astype(np.float32), tgt[:, :3])
    d_a, _ = nn1_host(output_air[:, :3].astype(np.float32), tgt[:, :3])
    base = frame_metrics(output_solid, output_air, tgt, 'greater', 0.2, 'rgb')
    fast = frame_metrics(output_solid, output_air, tgt, 'greater', 0.2, 'rgb',
                         nn_solid=(d_s, i_s), nn_air_d=d_a)
    assert base == fast
    # Empty solid cloud: chamfer inf, occupancy zero, on both paths.
    empty = np.zeros((0, output_solid.shape[1]), np.float32)
    b0 = frame_metrics(empty, output_air, tgt, 'greater', 0.2, 'rgb')
    f0 = frame_metrics(empty, output_air, tgt, 'greater', 0.2, 'rgb',
                       nn_solid=(np.zeros((0,)), np.zeros((0,), np.int64)),
                       nn_air_d=d_a)
    assert b0 == f0 and not np.isfinite(b0['chamfer'])
