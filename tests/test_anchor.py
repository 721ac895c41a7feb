'''
Trained-anchor regression tests: the committed mini-checkpoints
(tests/assets/anchor/ GREATER + tests/assets/anchor_carla/ CARLA, built by
tools/make_trained_anchor.py) must reload, reconstruct their synthetic scene,
and reproduce their committed metrics.

This is the executable stand-in for the reference's released pretrained/*.pth
parity oracles (stripped, /root/reference/.MISSING_LARGE_BLOBS:1-2): models
this framework trained end-to-end, with their reconstruction quality pinned so
any silent math regression in the encoder/decoder/eval stack trips the diff.
'''

import json
import os

import numpy as np
import pytest

_ASSET_ROOT = os.path.join(os.path.dirname(__file__), 'assets')

# Per-dataset learned-quality floors. Context: the degenerate all-solid
# baseline scores F1 ~0.06 (GREATER grid, 3% queries occupied) / 0.019
# (CARLA road cuboid, measured with the 1-NN baseline sweep); the committed
# anchors measure F1 0.546 (GREATER) and 0.846 / segm acc 0.953 (CARLA, whose
# structured synthetic scene makes color+semantics learnable functions of
# position).
_FLOORS = dict(
    greater=dict(occupancy_f1=0.45, occupancy_precision=0.45,
                 occupancy_recall=0.45, chamfer_max=0.5,
                 # track_mode=all reruns + multi_track_merge: the committed
                 # anchor measures P 0.9995 / R 0.879 (trained tracking head).
                 tracking_precision=0.90, tracking_recall=0.60),
    carla=dict(occupancy_f1=0.60, occupancy_precision=0.50,
               occupancy_recall=0.70, chamfer_max=1.0,
               segmentation_acc=0.70),
)


def _assets(name):
    return os.path.join(_ASSET_ROOT, name)


# Steps (examples) to re-evaluate out of the committed full run. Eval cost on
# the 1-core CPU suite host is linear in steps (each pays a full sampler +
# encoder + dense-decode + metrics pass), and eval steps are independent with
# per-(seed,epoch,index) RNG, so a prefix re-run reproduces the committed
# per_frame prefix exactly; test_anchor_metrics_reproduce compares per-frame
# (stronger than the old mean-vs-mean). The committed metrics.json still
# carries the full 24-step run (tools/make_trained_anchor.py).
_EVAL_STEPS = 3


@pytest.fixture(scope='module', params=['greater', 'carla'])
def anchor_eval(request, tmp_path_factory):
    '''Regenerate the anchor's synthetic scene (seed-deterministic) and re-run
    the production eval driver on the committed checkpoint (first _EVAL_STEPS
    of the committed run).'''
    from occlusions4d_tpu.config import test_args as parse_test_args
    from occlusions4d_tpu.data import synthetic
    from occlusions4d_tpu.evaluate import test_driver

    dataset = request.param
    assets = _assets('anchor' if dataset == 'greater' else 'anchor_carla')
    if not os.path.isfile(os.path.join(assets, 'checkpoint.pkl')):
        pytest.skip(f'{dataset} anchor assets not built '
                    '(tools/make_trained_anchor.py)')

    with open(os.path.join(assets, 'gen.json')) as f:
        gen = json.load(f)
    eval_argv = gen.pop('eval_argv')
    gen.pop('dataset', None)
    # The committed metrics were computed on the scene the anchor OVERFIT
    # (the train stage); stage seeds differ (data/synthetic.py:158).
    eval_stage = gen.pop('eval_stage')
    with open(os.path.join(assets, 'metrics.json')) as f:
        committed = json.load(f)

    root = tmp_path_factory.mktemp(f'anchor_{dataset}')
    # Dataset kind is inferred from the path: keep 'carla' in the CARLA dir.
    data = str(root / ('data_carla' if dataset == 'carla' else 'data'))
    gen_fn = (synthetic.make_carla_dataset if dataset == 'carla'
              else synthetic.make_greater_dataset)
    gen_fn(data, **dict(gen, stages=tuple(gen['stages'])))

    # Shrink use_data_frac so dset_size = _EVAL_STEPS (frame selection is a
    # deterministic prefix; +0.5 keeps int() truncation off the boundary).
    committed_frac = float(eval_argv[eval_argv.index('--use_data_frac') + 1])
    frac = committed_frac * (_EVAL_STEPS + 0.5) / len(committed['per_frame'])

    # --log_path X: config derives log_path=parent(X), test_tag=basename(X).
    targs = parse_test_args(eval_argv + [
        '--data_path', os.path.join(data, eval_stage), '--resume', assets,
        '--use_data_frac', str(frac),
        '--log_path', str(root / 'logs' / 'anchor'),
    ])
    summary = test_driver.main(targs)
    assert len(summary['per_frame']) == _EVAL_STEPS
    return dataset, summary, committed


def test_anchor_model_learned(anchor_eval):
    '''The committed checkpoint genuinely reconstructs the scene it overfit
    (floors documented at _FLOORS, applied to the evaluated-prefix mean —
    prefix means sit within ~0.01 of the full-run means; GREATER commits
    F1 0.546 vs the 0.06 all-solid baseline and ~0.8 structural ceiling).'''
    dataset, summary, _ = anchor_eval
    floors = _FLOORS[dataset]
    mean = summary['mean']
    assert mean['occupancy_f1'] > floors['occupancy_f1'], mean
    assert mean['occupancy_precision'] > floors['occupancy_precision'], mean
    assert mean['occupancy_recall'] > floors['occupancy_recall'], mean
    assert np.isfinite(mean['chamfer']), mean
    assert mean['chamfer'] < floors['chamfer_max'], mean
    if 'segmentation_acc' in floors:
        assert mean['segmentation_acc'] > floors['segmentation_acc'], mean
    if 'tracking_precision' in floors:
        assert mean['tracking_precision'] > floors['tracking_precision'], mean
        assert mean['tracking_recall'] > floors['tracking_recall'], mean


def test_anchor_metrics_reproduce(anchor_eval):
    '''Re-running the committed checkpoint through the current code reproduces
    the committed metrics.json — a tripwire for silent numeric drift anywhere
    in encoder/decoder/sampling/eval. Per-frame prefix compare (eval steps are
    independent, so the re-run prefix must match the committed run frame by
    frame). Tolerance covers backend/XLA-version dot-product variation
    flipping a handful of near-threshold queries.'''
    _, summary, committed = anchor_eval
    assert len(committed['per_frame']) > len(summary['per_frame'])
    for got_f, ref_f in zip(summary['per_frame'], committed['per_frame']):
        for key, ref in ref_f.items():
            got = got_f[key]
            assert abs(got - ref) <= max(0.02, 0.03 * abs(ref)), \
                (key, got, ref)
