'''
Build the committed multi-epoch convergence artifact
(tests/assets/convergence/trajectory.json).

The reference's published configs train 20/40 epochs
(/root/reference/README.md:36,41); this tool demonstrates the production CLI
holding together over a sustained run — loader epochs, per-epoch + rolling
checkpoints, MultiStep LR milestones firing (train.py:315-319 semantics), val
loss improving — and commits the trajectory so tests/test_convergence.py can
(a) validate the recorded dynamics and (b) re-run a 1-epoch prefix live,
failing if training dynamics rot.

It also records a resume-from-epoch-k equivalence check: resuming from the
model_{k} checkpoint and re-running epoch k+1 must reproduce the original
run's epoch-k+1 losses (loader batches are per-(seed, epoch, index)
deterministic and the optimizer state round-trips exactly), matching the
reference's resume semantics (/root/reference/train.py:323-331).

Run on the CPU backend so the committed numbers are bit-stable against the
CPU-mesh test suite:

    JAX_PLATFORMS=cpu python tools/make_convergence_artifact.py
'''

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = dict(num_scenes=2, num_views=2, num_frames=16, image_size=32,
           stages=('train', 'val'))

NUM_EPOCHS = 10
RESUME_EPOCH = 5  # resume from model_5 -> re-run epoch 6.

# Mid-scale architecture: the anchor family (tests/test_train.py _tiny_cfg)
# with a doubled point budget — big enough that the loss trajectory is a real
# optimization signal, small enough that the suite can re-run a 1-epoch prefix.
ARCH_ARGV = [
    '--n_points', '512', '--n_data_rnd', '1024', '--video_len', '4',
    '--frame_skip', '2', '--past_frames', '2', '--future_frames', '0',
    '--pt_cube_bounds', '5.0', '--pt_feat_dim', '8', '--up_down_blocks', '2',
    '--transition_factor', '4', '--pt_num_neighbors', '4',
    '--down_neighbors', '4', '--global_size', '16', '--num_cr_local_feats', '4',
    '--implicit_mlp_blocks', '3', '--cross_attn_layers', '1',
    '--cross_attn_neighbors', '4', '--num_cr_solid', '256',
    '--color_mode', 'rgb_nosigmoid', '--color_lw', '1.0',
    '--tracking_lw', '1.0', '--seed', '11',
    '--num_epochs', str(NUM_EPOCHS), '--batch_size', '2',
    '--data_parallel', '1', '--use_data_frac', '0.04', '--num_workers', '2',
]


def _epoch_scalars(trainer):
    '''logger.scalar_history -> {epoch: {name: mean}}.'''
    out = {}
    for row in trainer.logger.scalar_history:
        out.setdefault(int(row['epoch']), {}).update(
            {k: v for k, v in row.items() if k != 'epoch'})
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default='')
    args = p.parse_args(argv)

    import tempfile

    import jax

    from occlusions4d_tpu import train as train_mod
    from occlusions4d_tpu.config import train_args as parse_train_args
    from occlusions4d_tpu.data import synthetic

    work = args.workdir or tempfile.mkdtemp(prefix='conv_')
    data = os.path.join(work, 'data')
    if not os.path.isdir(os.path.join(data, 'train')):
        synthetic.make_greater_dataset(data, **GEN)

    train_argv = ARCH_ARGV + [
        '--data_path', data, '--name', 'conv',
        '--checkpoint_root', os.path.join(work, 'checkpoints'),
        '--log_root', os.path.join(work, 'logs'),
    ]
    cfg = parse_train_args(train_argv)
    print(f'[conv] training {NUM_EPOCHS} epochs -> {cfg.output_path}',
          flush=True)
    trainer = train_mod.main(cfg)
    steps_per_epoch = None
    scalars = _epoch_scalars(trainer)
    # Recover steps_per_epoch from the schedule boundaries the trainer built.
    from occlusions4d_tpu.data import create_train_val_loaders
    from occlusions4d_tpu.utils.logvis import StepLogger
    _, tl, _, _ = create_train_val_loaders(cfg, StepLogger(log_dir=None))
    steps_per_epoch = tl.steps_per_epoch

    milestones = [(NUM_EPOCHS * 2) // 5, (NUM_EPOCHS * 3) // 5,
                  (NUM_EPOCHS * 4) // 5]
    epochs = []
    for e in range(NUM_EPOCHS):
        row = scalars.get(e, {})
        epochs.append(dict(
            epoch=e,
            train_loss=row.get('train/total_loss'),
            val_loss=row.get('val_aug/total_loss'),
            lr=float(trainer.schedule((e + 1) * steps_per_epoch - 1))))
    ckpts = sorted(n for n in os.listdir(cfg.output_path)
                   if n.startswith('model_') or n == 'checkpoint.pkl')

    # Resume-from-epoch-k equivalence: fresh process state, resume model_{k},
    # run exactly epoch k+1, compare its losses to the original run's.
    resume_argv = ARCH_ARGV + [
        '--data_path', data, '--name', 'conv_resume',
        '--checkpoint_root', os.path.join(work, 'checkpoints_resume'),
        '--log_root', os.path.join(work, 'logs_resume'),
        '--resume', os.path.join(cfg.output_path, f'model_{RESUME_EPOCH}.pkl'),
    ]
    rcfg = parse_train_args(resume_argv)
    # Run exactly epoch k+1 (the LR schedule stays the original 10-epoch one
    # because num_epochs is unchanged); drive the Trainer pieces directly.
    print(f'[conv] resume leg: model_{RESUME_EPOCH} -> epoch {RESUME_EPOCH+1}',
          flush=True)
    from occlusions4d_tpu.train import Trainer
    logger = StepLogger(log_dir=os.path.join(work, 'logs_resume', 'conv'),
                        context='train', batch_size=rcfg.batch_size)
    data_kind, train_loader, val_loader, _ = \
        create_train_val_loaders(rcfg, logger)
    rtrainer = Trainer(rcfg, data_kind, logger=logger)
    rtrainer.resume(rcfg.resume, steps_per_epoch=train_loader.steps_per_epoch)
    assert rtrainer.start_epoch == RESUME_EPOCH + 1
    e = RESUME_EPOCH + 1
    rtrainer.run_epoch(e, 'train', train_loader.epoch(e))
    rtrainer.run_epoch(e, 'val_aug', val_loader.epoch(e))
    rtrainer.logger.epoch_finished(e)
    rrow = _epoch_scalars(rtrainer)[e]
    orig = epochs[e]
    resumed_val = rrow['val_aug/total_loss']
    resumed_train = rrow['train/total_loss']
    rel = abs(resumed_val - orig['val_loss']) / max(abs(orig['val_loss']), 1e-9)
    print(f'[conv] resume equivalence: val {resumed_val:.6f} vs '
          f'{orig["val_loss"]:.6f} (rel {rel:.2e})', flush=True)

    artifact = dict(
        platform=jax.default_backend(),
        gen=dict(GEN, stages=list(GEN['stages'])),
        argv=ARCH_ARGV,
        num_epochs=NUM_EPOCHS,
        steps_per_epoch=steps_per_epoch,
        lr_milestone_epochs=milestones,
        lr_decay=cfg.lr_decay,
        epochs=epochs,
        checkpoints=ckpts,
        resume_check=dict(resume_epoch=RESUME_EPOCH, epoch=e,
                          original_val=orig['val_loss'],
                          resumed_val=resumed_val,
                          original_train=orig['train_loss'],
                          resumed_train=resumed_train,
                          rel_diff=rel),
    )
    out_dir = os.path.join(REPO, 'tests', 'assets', 'convergence')
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'trajectory.json'), 'w') as f:
        json.dump(artifact, f, indent=1)
    print(f'[conv] wrote {out_dir}/trajectory.json '
          f'(val {epochs[0]["val_loss"]:.4f} -> {epochs[-1]["val_loss"]:.4f})',
          flush=True)


if __name__ == '__main__':
    main()
