'''
Configuration system: typed dataclasses + argparse CLI mirroring the reference's flag
surface (/root/reference/args.py) — shared_args (args.py:46-84), train_args
(args.py:117-308), test_args (args.py:311-410) — including verify_args validation,
auto experiment-tag naming and resume resolution.
'''

import argparse
import dataclasses
import multiprocessing
import os
import pathlib
from dataclasses import dataclass, field
from typing import Optional

__all__ = ['SharedConfig', 'TrainConfig', 'TestConfig', 'train_args', 'test_args',
           'verify_args', 'str2bool', 'config_from_dict']


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ('yes', 'true', 't', 'y', '1'):
        return True
    if v.lower() in ('no', 'false', 'f', 'n', '0'):
        return False
    raise argparse.ArgumentTypeError('Boolean value expected.')


def _arg2str(v):
    return ('1' if v else '0') if isinstance(v, bool) else str(v)


@dataclass
class SharedConfig:
    # Misc (args.py:46-57). device 'tpu'/'cpu' replaces the reference's 'cuda'/'cpu'.
    device: str = 'tpu'
    num_workers: int = -1
    # 'thread' (GIL-light decode path) or 'process' (fork workers + shared
    # multiprocessing.Array counters, the reference DataLoader model).
    worker_mode: str = 'thread'
    seed: int = 1830
    mixed_precision: bool = False  # bf16 compute on TPU (fp16+GradScaler on GPU).

    # Logging & checkpointing (args.py:58-69).
    data_path: str = ''
    name: str = ''
    log_root: str = 'logs/'
    resume: str = ''
    checkpoint_root: str = 'checkpoints/'
    # Native checkpoint backend: 'pkl' (single-file envelope pickle) or
    # 'orbax' (async array store — saves overlap training; SURVEY §7 step 6).
    # Both resume interchangeably (load auto-detects the on-disk layout).
    checkpoint_format: str = 'pkl'

    # Data (args.py:71-84).
    use_data_frac: float = 1.0
    sample_bias: str = 'none'
    sb_occl_frame_shift: int = 2

    # Observability. The reference always inits wandb (train.py:360); hermetic TPU
    # pods have no network, so it is opt-in here and degrades to file logging.
    use_wandb: bool = False


@dataclass
class TrainConfig(SharedConfig):
    batch_size: int = 8
    output_path: str = 'auto'

    # Point transformer architecture (args.py:128-148).
    up_down_blocks: int = 3
    transition_factor: int = 3
    pt_feat_dim: int = 32
    pt_num_neighbors: int = 14
    pt_norm_type: str = 'none'
    down_neighbors: int = 8
    global_size: int = 128
    num_cr_local_feats: int = 8

    # Data (args.py:150-182).
    n_points: int = 8192
    n_data_rnd: int = 16384
    video_len: int = 6
    frame_skip: int = 4
    min_z: float = -1.0
    pt_cube_bounds: float = 5.0
    cr_cube_bounds: float = -1.0
    cube_mode: int = 4
    correct_ego_motion: bool = True
    correct_origin_ground: bool = True

    # Continuous representation (args.py:184-211).
    positional_encoding: bool = True
    activation: str = 'relu'
    implicit_mlp_blocks: int = 6
    use_global_embedding: bool = True
    local_implicit_mode: str = 'attention'
    cross_attn_layers: int = 1
    cross_attn_neighbors: int = 12
    cr_attn_type: str = 'c'
    abstract_levels: int = 1

    # CR output (args.py:213-223).
    color_mode: str = 'rgb'
    semantic_classes: int = 13

    # Training (args.py:225-239).
    parallel_pipeline: bool = True
    learn_rate: float = 1e-3
    lr_decay: float = 0.4
    num_epochs: int = 20
    start_epoch: int = 0
    gradient_clip: float = 0.2

    # Loss (args.py:241-275).
    density_lw: float = 1.0
    color_lw: float = 0.0
    segmentation_lw: float = 0.0
    tracking_lw: float = 0.0
    point_occupancy_radius: float = 0.2
    num_cr_solid: int = 7168
    air_sampling_ratio: float = 1.5
    point_sample_bias: str = 'none'
    oversample_vehped_target: bool = False
    past_frames: int = 2
    future_frames: int = 0

    # TPU-native additions (not in the reference).
    data_parallel: int = -1       # chips for batch sharding; -1 = all local devices.
    query_parallel: int = 1       # chips for query-axis sharding at eval.
    # Fused Pallas decoder (fwd + custom-VJP bwd kernels) for the train step:
    # 'auto' = on for TPU backends on supported configs, 'on', 'off'.
    # NOTE: when active, the decoder's forward/backward compute runs in the
    # kernels' dtype (fused_decoder_dtype below) regardless of mixed_precision
    # - the bf16 kernel path is gradient-parity-tested vs the f32 module path
    # (tests/test_pallas_ops.py) and is what the published step timings use.
    # Set fused_decoder='off' (or fused_decoder_dtype='f32') for strict
    # mixed_precision=False numerics on the decoder too.
    fused_decoder: str = 'auto'
    # Compute dtype inside the fused decoder kernels: 'auto' = bf16 on TPU
    # (f32 elsewhere), 'bf16', 'f32'.
    fused_decoder_dtype: str = 'auto'
    export_visuals: bool = False  # load images for early-epoch gallery exports.
    viz_interval: int = 80        # intermediate-export cadence (pipeline.py:92-94).
    # wandb.watch-equivalent telemetry (/root/reference/utils/logvis.py:75):
    # per-layer parameter/gradient norms computed on device in the train step
    # and committed as epoch histograms. Auto-enabled when wandb is on.
    watch_networks: bool = False
    # Debug: functionalize tensor-boundary NaN/Inf probes (encoder outputs,
    # per-frame decoder outputs, each loss term) via jax.experimental.checkify
    # so the first non-finite tensor is named in the raised error — the TPU
    # analogue of the reference's _CHECK_NAN/_CHECK_NAN_INF probes,
    # /root/reference/pipeline.py:17,113, /root/reference/loss.py:12. Forces
    # the XLA (non-fused, non-remat) paths; debug-only, adds overhead.
    check_numerics: bool = False
    # Capture an XLA device trace (TensorBoard profile plugin / Perfetto) of
    # this many early train steps of epoch 0 — step 0 (the compile step) is
    # excluded — written to <log_path>/profile. 0 = off. The reference has no
    # tracing at all (an unused torch profiler import,
    # /root/reference/model/implicit.py:13); utils/profiling.device_trace is
    # the library surface and this flag is its CLI wiring.
    profile_steps: int = 0
    tag: str = ''


@dataclass
class TestConfig(SharedConfig):
    __test__ = False  # not a pytest class.
    ss_frame_step: int = 3
    force_view_idx: int = -1
    log_path: str = 'auto'
    gpu_id: int = 0               # kept for CLI parity; unused on TPU.
    epoch: int = -1
    implicit_batch_size: int = 65536
    sample_implicit: bool = True
    num_sample: int = 262144
    point_sample_mode: str = 'random'
    store_pcl: bool = True
    density_threshold: float = 0.5
    store_activations: bool = False
    save_metrics: bool = False
    save_gt: bool = False         # referenced by the reference test driver (drift flag).
    track_mode: str = 'none'
    use_json: bool = False
    live_occl_mode: str = 'normal'
    query_parallel: int = -1      # shard dense queries across chips; -1 = all.
    # Eval numerics: 'fast' (fused bf16 kernels), 'f32' (XLA default precision),
    # 'highest' (true-f32 dots, parity oracle), 'auto' = fast on TPU.
    eval_precision: str = 'auto'
    # Pipelined eval loop: a post-processing worker thread overlaps the host
    # stages of frame i (multi_track_merge, 1-NN GT labels, metrics, pickle
    # export) with the device dispatch of frame i+1. Metric values and
    # artifacts are bit-identical either way (same math, same order; pinned by
    # tests/test_evaluate.py); the knob only changes wall-clock. No reference
    # counterpart (its eval loop is fully serial, eval/test.py:31-135).
    eval_overlap: bool = True
    tag: str = ''
    test_tag: str = ''
    train_tag: str = ''
    # Back-filled from checkpoint train args (eval/test.py:166-191):
    min_z: float = -1.0
    pt_cube_bounds: float = 5.0
    cr_cube_bounds: float = 5.0
    cube_mode: int = 4
    color_mode: str = 'rgb'
    segmentation_lw: float = 0.0
    tracking_lw: float = 0.0
    point_occupancy_radius: float = 0.2
    semantic_classes: int = 13


def _add_fields(parser, cls):
    for f in dataclasses.fields(cls):
        if f.name in ('tag', 'test_tag', 'train_tag'):
            continue
        # isinstance, not `in (True, False)`: 0.0 == False would turn float flags
        # with 0/1 defaults (color_lw, start_epoch, ...) into booleans.
        if isinstance(f.default, bool):
            parser.add_argument(f'--{f.name}', default=f.default, type=str2bool)
        else:
            parser.add_argument(f'--{f.name}', default=f.default, type=type(f.default))


def verify_args(args, is_train=False):
    '''Validation mirroring /root/reference/args.py:87-114.'''
    assert args.device in ('tpu', 'cpu', 'cuda')
    assert args.worker_mode in ('thread', 'process')
    assert getattr(args, 'checkpoint_format', 'pkl') in ('pkl', 'orbax')
    assert args.sample_bias in ('none', 'move', 'occl', 'move_occl', 'occl_move')

    if args.num_workers < 0:
        if is_train:
            args.num_workers = max(int(multiprocessing.cpu_count() * 0.9) - 12, 2)
        else:
            args.num_workers = max(multiprocessing.cpu_count() // 4 - 6, 1)

    if is_train:
        if args.cr_cube_bounds <= 0.0:
            args.cr_cube_bounds = args.pt_cube_bounds
        while len(args.cr_attn_type) < args.cross_attn_layers:
            assert len(args.cr_attn_type) != 0
            args.cr_attn_type = args.cr_attn_type + args.cr_attn_type
        assert 256 <= args.n_points <= 65536
        assert args.pt_norm_type in ('none', 'batch', 'layer')
        assert args.past_frames + args.future_frames <= args.video_len
        assert args.future_frames < args.video_len
        assert args.local_implicit_mode in ('none', 'feature', 'attention')
        assert args.color_mode in ('rgb', 'rgb_nosigmoid', 'hsv', 'bins')
        assert args.fused_decoder in ('auto', 'on', 'off')
        assert args.fused_decoder_dtype in ('auto', 'bf16', 'f32')
    else:
        assert args.point_sample_mode in ('random', 'grid')
        assert args.eval_precision in ('auto', 'fast', 'f32', 'highest')
    return args


def _auto_train_tag(args):
    '''Experiment tag encoding key hparams (args.py:280-303).'''
    keys = {'mixed_precision': 'mp', 'up_down_blocks': 'ud', 'n_points': 'np',
            'video_len': 'vl', 'frame_skip': 'fs', 'density_lw': 'dl',
            'color_lw': 'cl', 'segmentation_lw': 'sl', 'tracking_lw': 'tl'}
    tag = args.name + '_'
    tag += '_'.join(k2 + _arg2str(getattr(args, k)) for k, k2 in keys.items())
    if args.use_data_frac < 1.0:
        tag += f'_df{_arg2str(args.use_data_frac)}'
    tag += f'_gs{_arg2str(args.global_size) if args.use_global_embedding else 0}'
    tag += f'_a{args.activation[:2]}'
    tag += f'_im{args.local_implicit_mode[:2]}'
    tag += f'_pt{args.past_frames}_{args.future_frames}'
    return tag


def train_args(argv=None):
    parser = argparse.ArgumentParser()
    _add_fields(parser, TrainConfig)
    ns = parser.parse_args(argv)
    args = TrainConfig(**vars(ns))
    verify_args(args, is_train=True)

    if args.output_path == 'auto':
        args.tag = _auto_train_tag(args)
        args.output_path = os.path.join(args.checkpoint_root, args.tag)

    if args.resume and not (os.path.exists(args.resume) and os.path.isfile(args.resume)):
        from .checkpoint import resolve_resume_path, newest_native_layout
        resolved = resolve_resume_path(args.resume, args.checkpoint_root)
        # pkl layout resumes through the rolling file; the orbax layout has no
        # rolling file — resume from the directory (load auto-picks the latest
        # finalized epoch). When BOTH layouts coexist (a --checkpoint_format
        # switch mid-experiment), the one holding the newest epoch wins, so a
        # stale rolling pkl never shadows newer orbax epochs.
        fmt, _ = newest_native_layout(resolved)
        args.resume = (resolved if fmt == 'orbax'
                       else os.path.join(resolved, 'checkpoint.pkl'))
    return args


def test_args(argv=None):
    parser = argparse.ArgumentParser()
    _add_fields(parser, TestConfig)
    ns = parser.parse_args(argv)
    args = TestConfig(**vars(ns))
    verify_args(args, is_train=False)

    # Point at the test split when present (args.py:366-368).
    if args.data_path and os.path.exists(os.path.join(args.data_path, 'test')):
        args.data_path = os.path.join(args.data_path, 'test')

    if args.resume and not (os.path.exists(args.resume) and os.path.isfile(args.resume)):
        from .checkpoint import resolve_resume_path
        args.resume = resolve_resume_path(args.resume, args.checkpoint_root)

    if args.log_path == 'auto':
        args.log_path = str(pathlib.Path(str(args.resume).replace('checkpoints', 'logs')))
        keys = {'use_data_frac': 'df', 'sample_bias': 'sb', 'num_sample': 'ns',
                'point_sample_mode': 'sm', 'density_threshold': 'dt',
                'store_activations': 'sa', 'save_metrics': 'sm', 'track_mode': 'tm',
                'use_json': 'uj'}
        test_tag = (args.name + '_') if args.name else ''
        test_tag += '_'.join(k2 + _arg2str(getattr(args, k)) for k, k2 in keys.items())
        args.test_tag = test_tag
    else:
        args.log_path = str(pathlib.Path(args.log_path).parent)
        args.test_tag = str(pathlib.Path(args.log_path).name)

    args.log_root = str(pathlib.Path(args.log_path).parent)
    args.train_tag = str(pathlib.Path(args.log_path).name)
    args.tag = args.train_tag
    return args


def config_from_dict(cls, d):
    '''Build a config from a dict, ignoring unknown keys (checkpoint back-compat).'''
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})
