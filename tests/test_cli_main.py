'''
CLI-main integration test: the user-facing glue (argv -> train_args -> train.main ->
checkpoints; argv -> test_args with `--resume <name>` resolution -> evaluate.main ->
pcl_io / metrics.json; metrics.main --input) end to end on a synthetic GREATER tree.

Everything else in the suite drives Trainer/run_test directly; this is the only
coverage of the arg plumbing, auto-tag -> output_path, loader-factory wiring and
resume resolution (/root/reference/train.py:368-393, /root/reference/eval/test.py:218-238).
'''

import glob
import json
import os

import numpy as np
import pytest

from occlusions4d_tpu.config import train_args as parse_train_args
from occlusions4d_tpu.config import test_args as parse_test_args
from occlusions4d_tpu.data import synthetic


@pytest.fixture(scope='module')
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp('cli_main')
    data = str(root / 'data')
    synthetic.make_greater_dataset(data, num_scenes=1, num_views=2,
                                   num_frames=16, image_size=32,
                                   stages=('train', 'val', 'test'))
    return dict(root=str(root), data=data,
                ckpt=str(root / 'checkpoints'), logs=str(root / 'logs'))


TRAIN_ARCH = [
    '--n_points', '256', '--n_data_rnd', '512', '--video_len', '4',
    '--frame_skip', '2', '--past_frames', '2', '--future_frames', '0',
    '--pt_cube_bounds', '5.0', '--pt_feat_dim', '4', '--up_down_blocks', '2',
    '--transition_factor', '4', '--pt_num_neighbors', '4', '--down_neighbors', '4',
    '--global_size', '8', '--num_cr_local_feats', '4', '--implicit_mlp_blocks', '3',
    '--cross_attn_layers', '1', '--cross_attn_neighbors', '4',
    '--num_cr_solid', '64', '--color_mode', 'rgb_nosigmoid', '--color_lw', '1.0',
    '--tracking_lw', '1.0', '--seed', '7',
]


@pytest.fixture(scope='module')
def trained_cli(cli_env):
    '''argv -> train_args -> train.main, 2 epochs on a fraction of the data,
    worker pool on, checkpoints under the auto tag.'''
    from occlusions4d_tpu import train as train_mod
    argv = TRAIN_ARCH + [
        '--data_path', cli_env['data'], '--name', 'v1',
        '--checkpoint_root', cli_env['ckpt'], '--log_root', cli_env['logs'],
        '--num_epochs', '2', '--batch_size', '2', '--data_parallel', '1',
        '--use_data_frac', '0.01', '--num_workers', '2',
    ]
    cfg = parse_train_args(argv)
    assert cfg.tag.startswith('v1_'), cfg.tag      # auto experiment tag.
    assert cfg.output_path == os.path.join(cli_env['ckpt'], cfg.tag)
    trainer = train_mod.main(cfg)
    return cfg, trainer


def test_train_main_cli(trained_cli, cli_env):
    cfg, trainer = trained_cli
    # Per-epoch checkpoints: model_{e}.pkl + rolling checkpoint.pkl
    # (/root/reference/train.py:336-357 layout).
    out = cfg.output_path
    assert os.path.isfile(os.path.join(out, 'checkpoint.pkl'))
    assert os.path.isfile(os.path.join(out, 'model_0.pkl'))
    assert os.path.isfile(os.path.join(out, 'model_1.pkl'))
    # The args json landed in the log dir.
    assert glob.glob(os.path.join(cli_env['logs'], cfg.tag, 'args_train.json'))
    assert int(np.asarray(trainer.state['step'])) > 0


def test_train_main_cli_resume_by_name(trained_cli, cli_env):
    '''`--resume v1` resolves through checkpoint_root to the unique v1_* dir
    (/root/reference/args.py:20-36) and continues at epoch 2.'''
    from occlusions4d_tpu import train as train_mod
    argv = TRAIN_ARCH + [
        '--data_path', cli_env['data'], '--name', 'v1',
        '--checkpoint_root', cli_env['ckpt'], '--log_root', cli_env['logs'],
        '--num_epochs', '3', '--batch_size', '2', '--data_parallel', '1',
        '--use_data_frac', '0.01', '--num_workers', '2', '--resume', 'v1',
    ]
    cfg = parse_train_args(argv)
    assert cfg.resume.endswith('checkpoint.pkl')
    assert os.path.isfile(cfg.resume)
    trainer = train_mod.main(cfg)
    assert trainer.start_epoch == 2                # resumed after epoch 1.
    assert os.path.isfile(os.path.join(cfg.output_path, 'model_2.pkl'))


def test_evaluate_main_cli(trained_cli, cli_env):
    '''argv -> test_args (--resume v1 name resolution, auto log path/tag) ->
    evaluate.main --save_metrics: pcl_io_s0.p + metadata_s0.p + metrics.json
    appear with sane contents; then metrics.main --input re-scores them.'''
    from occlusions4d_tpu.evaluate import test_driver, metrics as metrics_mod
    cfg, _ = trained_cli
    argv = [
        '--data_path', cli_env['data'], '--resume', 'v1',
        '--checkpoint_root', cli_env['ckpt'],
        '--num_sample', '2048', '--point_sample_mode', 'random',
        '--save_metrics', 'true', '--save_gt', 'true', '--use_json', 'false',
        # 0.05 -> 6 of the 120 virtual test examples: each eval step pays a
        # full sampler+encoder+decode+metrics pass on the 1-core suite host
        # (the scene-count -2 mode is pinned by
        # test_data.py::test_use_data_frac_scene_count_mode).
        '--use_data_frac', '0.05', '--num_workers', '1', '--seed', '7',
    ]
    targs = parse_test_args(argv)
    # Resume resolved to the v1_* checkpoint dir; test split auto-selected.
    assert targs.resume == os.path.join(cli_env['ckpt'], cfg.tag)
    assert targs.data_path.endswith(os.path.join('', 'test'))
    assert targs.train_tag == cfg.tag

    summary = test_driver.main(targs)
    assert summary is not None and 'mean' in summary

    test_dirs = glob.glob(os.path.join(targs.log_path, 'test_*'))
    assert test_dirs, targs.log_path
    tdir = test_dirs[0]
    assert os.path.isfile(os.path.join(tdir, 'pcl_io_s0.p'))
    assert os.path.isfile(os.path.join(tdir, 'metadata_s0.p'))
    mfile = os.path.join(tdir, 'metrics.json')
    assert os.path.isfile(mfile)
    with open(mfile) as f:
        saved = json.load(f)
    assert 'occupancy_f1' in saved['mean']
    assert saved['per_frame'], saved

    # Offline re-scoring of the exported pcl_io artifacts (exceeds-reference
    # metrics module; evaluate/results.py discovery path).
    out_json = os.path.join(cli_env['root'], 'rescore.json')
    metrics_mod.main(['--input', tdir, '--output', out_json,
                      '--data_kind', 'greater'])
    with open(out_json) as f:
        rescored = json.load(f)
    assert rescored


def test_cli_main_carla_end_to_end(tmp_path_factory):
    '''The same argv -> train.main -> evaluate.main chain for the CARLA
    family (kind-by-path, cv1-flavor flags: segmentation head, layer norm,
    abstract_levels 2, cube_mode-4 cuboids): the GREATER tests above cover the
    shared glue; this pins the CARLA-specific plumbing (channel layouts, segm
    backfill, ego-motion loaders) through the production mains.'''
    from occlusions4d_tpu import train as train_mod
    from occlusions4d_tpu.evaluate import test_driver
    root = tmp_path_factory.mktemp('cli_carla')
    data = str(root / 'data_carla')
    synthetic.make_carla_dataset(data, num_scenes=1, num_frames=24,
                                 points_per_frame=1200,
                                 stages=('train', 'val', 'test'))
    argv = [
        '--n_points', '256', '--n_data_rnd', '512', '--video_len', '4',
        '--frame_skip', '3', '--past_frames', '2', '--future_frames', '0',
        '--min_z', '-0.5', '--pt_cube_bounds', '20.0',
        '--cr_cube_bounds', '16.0', '--cube_mode', '4',
        '--pt_feat_dim', '4', '--up_down_blocks', '2',
        '--transition_factor', '4', '--pt_num_neighbors', '4',
        '--down_neighbors', '4', '--global_size', '8',
        '--num_cr_local_feats', '4', '--implicit_mlp_blocks', '3',
        '--cross_attn_layers', '1', '--cross_attn_neighbors', '4',
        '--num_cr_solid', '64', '--air_sampling_ratio', '1.5',
        '--color_mode', 'rgb_nosigmoid', '--color_lw', '1.0',
        '--tracking_lw', '0.0', '--segmentation_lw', '1.0',
        '--semantic_classes', '13', '--abstract_levels', '2',
        '--pt_norm_type', 'layer', '--seed', '7',
        '--data_path', data, '--name', 'c1',
        '--checkpoint_root', str(root / 'checkpoints'),
        '--log_root', str(root / 'logs'), '--num_epochs', '1',
        '--batch_size', '2', '--data_parallel', '1',
        '--use_data_frac', '0.02', '--num_workers', '1',
    ]
    cfg = parse_train_args(argv)
    trainer = train_mod.main(cfg)
    assert int(np.asarray(trainer.state['step'])) > 0
    assert os.path.isfile(os.path.join(cfg.output_path, 'checkpoint.pkl'))

    targs = parse_test_args([
        '--data_path', data, '--resume', 'c1',
        '--checkpoint_root', str(root / 'checkpoints'),
        '--num_sample', '2048', '--point_sample_mode', 'random',
        '--save_metrics', 'true', '--use_json', 'false',
        '--use_data_frac', '0.05', '--num_workers', '1', '--seed', '7',
    ])
    # Auto log-path derivation mirrors checkpoints -> logs (config.py).
    assert str(root / 'logs') in targs.log_path
    # CARLA-specific backfill from the train checkpoint.
    summary = test_driver.main(targs)
    assert 'segmentation_acc' in summary['mean']
    test_dirs = glob.glob(os.path.join(targs.log_path, 'test_*'))
    assert test_dirs, targs.log_path
    tdir = test_dirs[0]
    assert os.path.isfile(os.path.join(tdir, 'pcl_io_s0.p'))
    assert os.path.isfile(os.path.join(tdir, 'metrics.json'))
