'''
Sustained multi-epoch training-dynamics regression tests.

The committed artifact (tests/assets/convergence/trajectory.json, built by
tools/make_convergence_artifact.py) records a 10-epoch production-CLI run on
synthetic GREATER: per-epoch train/val losses, the LR value after each epoch,
the checkpoint inventory, and a resume-from-epoch-k equivalence measurement.
These tests (a) validate the recorded dynamics — MultiStep LR milestones fire
at 2/5, 3/5, 4/5 of epochs with gamma=lr_decay (/root/reference/train.py:315-319),
per-epoch + rolling checkpoints roll (train.py:336-357), val loss improves,
resume reproduces — and (b) re-run the run's FIRST EPOCH live through the same
production entry points and assert its losses reproduce the committed ones, so
the test fails if training dynamics rot anywhere in loader/step/optimizer.
'''

import json
import os

import numpy as np
import pytest

_ARTIFACT = os.path.join(os.path.dirname(__file__), 'assets', 'convergence',
                         'trajectory.json')


@pytest.fixture(scope='module')
def artifact():
    if not os.path.isfile(_ARTIFACT):
        pytest.skip('convergence artifact not built '
                    '(tools/make_convergence_artifact.py)')
    with open(_ARTIFACT) as f:
        return json.load(f)


def test_lr_milestones_fired(artifact):
    '''LR drops by exactly lr_decay after each milestone epoch and is constant
    elsewhere (train.py:315-319 MultiStepLR semantics over the whole run).'''
    lrs = [e['lr'] for e in artifact['epochs']]
    milestones = set(artifact['lr_milestone_epochs'])
    gamma = artifact['lr_decay']
    for e in range(1, len(lrs)):
        expect = lrs[e - 1] * (gamma if e in milestones else 1.0)
        np.testing.assert_allclose(lrs[e], expect, rtol=1e-6, err_msg=str(e))
    assert lrs[-1] < lrs[0], lrs


def test_checkpoints_rolled(artifact):
    '''Every epoch saved model_{e}.pkl plus the rolling checkpoint.pkl.'''
    names = set(artifact['checkpoints'])
    assert 'checkpoint.pkl' in names
    for e in range(artifact['num_epochs']):
        assert f'model_{e}.pkl' in names, names


def test_val_loss_improves(artifact):
    '''The sustained run genuinely optimizes: late-epoch val loss is well
    below the first epoch's (and the best of the last 3 beats the best of the
    first 3 — robust to per-epoch noise).'''
    vals = [e['val_loss'] for e in artifact['epochs']]
    assert all(v is not None and np.isfinite(v) for v in vals), vals
    assert vals[-1] < vals[0], vals
    assert min(vals[-3:]) < min(vals[:3]), vals


def test_resume_equivalence_recorded(artifact):
    '''Resuming from model_{k} and re-running epoch k+1 reproduced the
    original run's epoch-k+1 losses (loader batches are per-(seed, epoch,
    index) deterministic; optimizer state round-trips exactly).'''
    rc = artifact['resume_check']
    assert rc['epoch'] == rc['resume_epoch'] + 1
    assert rc['rel_diff'] < 1e-4, rc
    np.testing.assert_allclose(rc['resumed_train'], rc['original_train'],
                               rtol=1e-4)


def test_first_epoch_reproduces_live(artifact, tmp_path):
    '''Re-run epoch 0 of the committed run through the production pieces
    (create_train_val_loaders + Trainer.run_epoch) and assert the train/val
    losses match the committed trajectory — the live tripwire for dynamics
    rot. Scene regeneration is seed-deterministic (data/synthetic.py).'''
    from occlusions4d_tpu.config import train_args as parse_train_args
    from occlusions4d_tpu.data import create_train_val_loaders, synthetic
    from occlusions4d_tpu.train import Trainer
    from occlusions4d_tpu.utils.logvis import StepLogger

    gen = dict(artifact['gen'], stages=tuple(artifact['gen']['stages']))
    data = str(tmp_path / 'data')
    synthetic.make_greater_dataset(data, **gen)

    cfg = parse_train_args(list(artifact['argv']) + [
        '--data_path', data, '--name', 'convlive',
        '--checkpoint_root', str(tmp_path / 'ck'),
        '--log_root', str(tmp_path / 'logs')])
    logger = StepLogger(log_dir=None, context='train',
                        batch_size=cfg.batch_size)
    data_kind, train_loader, val_loader, _ = \
        create_train_val_loaders(cfg, logger)
    assert train_loader.steps_per_epoch == artifact['steps_per_epoch']
    trainer = Trainer(cfg, data_kind, logger=logger)
    example = next(iter(train_loader.epoch(0)))
    trainer.init_state(example, steps_per_epoch=train_loader.steps_per_epoch)
    trainer.run_epoch(0, 'train', train_loader.epoch(0))
    trainer.run_epoch(0, 'val_aug', val_loader.epoch(0))
    logger.epoch_finished(0)
    row = logger.scalar_history[-1]

    ref = artifact['epochs'][0]
    np.testing.assert_allclose(row['train/total_loss'], ref['train_loss'],
                               rtol=5e-3)
    np.testing.assert_allclose(row['val_aug/total_loss'], ref['val_loss'],
                               rtol=5e-3)
