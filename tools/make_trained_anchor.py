'''
Build the trained mini-checkpoint anchor committed under tests/assets/anchor/.

Trains the tiny GREATER configuration (the tests/test_train.py `_tiny_cfg`
architecture) to overfit one synthetic scene through the PRODUCTION CLI glue
(config.train_args -> train.main), then evaluates it through the production
test driver (config.test_args -> evaluate.main --save_metrics) and copies the
resulting rolling checkpoint + metrics.json into tests/assets/anchor/.

The committed artifact is the repo's end-to-end "learns and reconstructs"
proof and a metrics tripwire: tests/test_anchor.py regenerates the identical
synthetic scene (data/synthetic.py is fully seed-deterministic), reloads the
checkpoint, re-runs the same eval, and asserts the metrics reproduce. Run on
the CPU backend so the anchor is bit-stable against the CPU-mesh test suite:

    JAX_PLATFORMS=cpu python tools/make_trained_anchor.py

(BASELINE.md north star "density/seg parity"; the reference's released
pretrained/*.pth oracles are stripped from /root/reference, so a self-trained
anchor is the strongest committable equivalent.)
'''

import argparse
import json
import os
import shutil
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Synthetic-scene generation parameters; tests/test_anchor.py must regenerate
# with EXACTLY these (stored in gen.json for the test to consume).
GEN = dict(num_scenes=1, num_views=2, num_frames=16, image_size=32,
           stages=('train', 'val', 'test'))

# A mini architecture: the tests/test_train.py `_tiny_cfg` family, scaled up
# just enough to genuinely reconstruct the scene (pt_feat_dim 8, 256 solid
# queries/frame) while keeping the checkpoint a few hundred KiB.
ARCH_ARGV = [
    '--n_points', '256', '--n_data_rnd', '512', '--video_len', '4',
    '--frame_skip', '2', '--past_frames', '2', '--future_frames', '0',
    '--pt_cube_bounds', '5.0', '--pt_feat_dim', '8', '--up_down_blocks', '2',
    '--transition_factor', '4', '--pt_num_neighbors', '4',
    '--down_neighbors', '4', '--global_size', '16', '--num_cr_local_feats', '4',
    '--implicit_mlp_blocks', '3', '--cross_attn_layers', '1',
    '--cross_attn_neighbors', '4', '--num_cr_solid', '256',
    '--color_mode', 'rgb_nosigmoid', '--color_lw', '1.0',
    '--tracking_lw', '1.0', '--seed', '7',
]

# num_sample 131072: at the anchor's 10 x 10 x 6 cube this gives ~0.17 grid
# spacing, matching the 0.2 occupancy radius; coarser grids (4096 -> ~0.5
# spacing) artificially floor precision/recall (measured F1 0.18 vs 0.44 for
# the same checkpoint), and 4x denser changes F1 by <0.01.
#
# The eval runs on the TRAIN-stage scene (EVAL_STAGE): the anchor's claim is
# "overfits and reconstructs the scene it memorized" (the stage seeds differ,
# data/synthetic.py:158, so the test-stage scene would measure generalization
# of a deliberately tiny model instead - measured F1 0.41 there vs 0.55 here,
# against a ~0.8 structural ceiling set by the 512-point target sparsity).
EVAL_STAGE = 'train'
# track_mode=all: one inference rerun per visible instance (>= 16 input pts)
# merged via multi_track_merge, so the committed metrics.json also pins
# tracking_precision/recall of a TRAINED model (the track-rerun encoder
# determinism + merge semantics, /root/reference/eval/inference.py:146-169,
# utils/utils.py:343-397).
EVAL_ARGV = [
    '--num_sample', '131072', '--point_sample_mode', 'grid',
    '--density_threshold', '0.5', '--save_metrics', 'true',
    '--track_mode', 'all',
    '--use_json', 'false', '--use_data_frac', '0.2',
    '--num_workers', '1', '--seed', '7',
]

# CARLA counterpart: the cv1 flavor at mini scale (layer norm,
# abstract_levels 2, 13 semantic classes, segmentation objective, cube_mode-4
# road cuboids, ego-motion-corrected LiDAR) so the SECOND data family's whole
# path - loader, channel layouts, segm loss, eval backfill - has a committed
# learns-and-reconstructs proof too. The dataset dir must contain 'carla'
# (dataset-kind-by-path, data/loader.py semantics).
#
# tracking_lw 1.0 + eval track_mode=all (round-4 verdict #3): the synthetic
# CARLA scene carries TWO simultaneous movers (vehicle sem 10 inst 20,
# pedestrian sem 4 inst 21, data/synthetic.py), so the committed metrics.json
# pins multi-instance tracking quality with TRAINED weights - one inference
# rerun per visible instance merged via multi_track_merge + the explicit
# mark_is_instance_id metrics mode (/root/reference/eval/inference.py:146-169,
# utils/utils.py:343-397).
GEN_CARLA = dict(num_scenes=1, num_frames=48, points_per_frame=4000,
                 stages=('train', 'val', 'test'))
ARCH_CARLA_ARGV = [
    '--n_points', '256', '--n_data_rnd', '512', '--video_len', '4',
    '--frame_skip', '3', '--past_frames', '2', '--future_frames', '0',
    '--min_z', '-0.5', '--pt_cube_bounds', '20.0', '--cr_cube_bounds', '16.0',
    '--cube_mode', '4', '--pt_feat_dim', '8', '--up_down_blocks', '2',
    '--transition_factor', '4', '--pt_num_neighbors', '4',
    '--down_neighbors', '4', '--global_size', '16', '--num_cr_local_feats', '4',
    '--implicit_mlp_blocks', '3', '--cross_attn_layers', '1',
    '--cross_attn_neighbors', '4', '--num_cr_solid', '256',
    '--air_sampling_ratio', '1.5', '--color_mode', 'rgb_nosigmoid',
    '--color_lw', '1.0', '--tracking_lw', '1.0', '--segmentation_lw', '1.0',
    '--semantic_classes', '13', '--abstract_levels', '2',
    '--pt_norm_type', 'layer', '--seed', '7',
]
EVAL_CARLA_ARGV = [
    '--num_sample', '262144', '--point_sample_mode', 'grid',
    '--density_threshold', '0.5', '--save_metrics', 'true',
    '--track_mode', 'all',
    '--use_json', 'false', '--use_data_frac', '0.2',
    '--num_workers', '1', '--seed', '7',
]

DATASETS = dict(
    greater=dict(assets='anchor', data_dn='data', gen=GEN,
                 arch=ARCH_ARGV, eval_argv=EVAL_ARGV),
    carla=dict(assets='anchor_carla', data_dn='data_carla', gen=GEN_CARLA,
               arch=ARCH_CARLA_ARGV, eval_argv=EVAL_CARLA_ARGV),
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--dataset', choices=sorted(DATASETS), default='greater')
    p.add_argument('--epochs', type=int, default=24)
    p.add_argument('--data_frac', type=float, default=0.5)
    p.add_argument('--workdir', default='')
    p.add_argument('--skip_train', action='store_true',
                   help='reuse the checkpoint already in --workdir; eval only')
    args = p.parse_args(argv)
    spec = DATASETS[args.dataset]
    assets = os.path.join(REPO, 'tests', 'assets', spec['assets'])

    from occlusions4d_tpu.config import train_args as parse_train_args
    from occlusions4d_tpu.config import test_args as parse_test_args
    from occlusions4d_tpu.data import synthetic
    from occlusions4d_tpu import train as train_mod
    from occlusions4d_tpu.evaluate import test_driver

    work = args.workdir or tempfile.mkdtemp(prefix='anchor_')
    data = os.path.join(work, spec['data_dn'])
    ckpt = os.path.join(work, 'checkpoints')
    logs = os.path.join(work, 'logs')
    if not os.path.isdir(os.path.join(data, 'train')):
        gen_fn = (synthetic.make_carla_dataset if args.dataset == 'carla'
                  else synthetic.make_greater_dataset)
        gen_fn(data, **spec['gen'])

    train_argv = spec['arch'] + [
        '--data_path', data, '--name', 'anchor',
        '--checkpoint_root', ckpt, '--log_root', logs,
        '--num_epochs', str(args.epochs), '--batch_size', '2',
        '--data_parallel', '1', '--use_data_frac', str(args.data_frac),
        '--num_workers', '2',
    ]
    cfg = parse_train_args(train_argv)
    if args.skip_train:
        assert os.path.isfile(os.path.join(cfg.output_path, 'checkpoint.pkl')), \
            cfg.output_path
        print(f'[anchor] reusing checkpoint in {cfg.output_path}', flush=True)
    else:
        print(f'[anchor] training {args.epochs} epochs -> {cfg.output_path}',
              flush=True)
        trainer = train_mod.main(cfg)
        del trainer

    test_argv = spec['eval_argv'] + [
        '--data_path', os.path.join(data, EVAL_STAGE),
        '--resume', 'anchor', '--checkpoint_root', ckpt,
    ]
    targs = parse_test_args(test_argv)
    print(f'[anchor] evaluating {targs.resume}', flush=True)
    summary = test_driver.main(targs)
    print('[anchor] metrics:', json.dumps(summary['mean'], sort_keys=True),
          flush=True)

    mfile = os.path.join(targs.log_path, 'test_' + targs.test_tag,
                         'metrics.json')
    assert os.path.isfile(mfile), mfile

    os.makedirs(assets, exist_ok=True)
    shutil.copy(os.path.join(cfg.output_path, 'checkpoint.pkl'),
                os.path.join(assets, 'checkpoint.pkl'))
    shutil.copy(mfile, os.path.join(assets, 'metrics.json'))
    with open(os.path.join(assets, 'gen.json'), 'w') as f:
        json.dump(dict(spec['gen'], stages=list(spec['gen']['stages']),
                       dataset=args.dataset, eval_stage=EVAL_STAGE,
                       eval_argv=spec['eval_argv']), f, indent=1)
    size = os.path.getsize(os.path.join(assets, 'checkpoint.pkl'))
    print(f'[anchor] wrote {assets} (checkpoint {size / 1024:.0f} KiB)',
          flush=True)


if __name__ == '__main__':
    main()
