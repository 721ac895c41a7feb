'''End-to-end training tests: pipeline forward, gradient step, NaN guards,
checkpoint resume, and batch sharding over the virtual 8-device CPU mesh.'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occlusions4d_tpu.config import TrainConfig, verify_args
from occlusions4d_tpu.data import synthetic, create_train_val_loaders
from occlusions4d_tpu.parallel import make_mesh, shard_batch as _shard
from occlusions4d_tpu.train import Trainer
from occlusions4d_tpu.utils.logvis import Logger


def shard_batch(batch, mesh):
    return _shard({k: v for k, v in batch.items() if k != 'meta_data'}, mesh)


@pytest.fixture(scope='module')
def greater_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('greater_train')
    synthetic.make_greater_dataset(str(root), num_scenes=1, num_views=2,
                                   num_frames=16, image_size=32,
                                   stages=('train', 'val'))
    return str(root)


def _tiny_cfg(root, **kw):
    base = dict(batch_size=2, data_parallel=1)
    base.update(kw)
    kw = base
    cfg = TrainConfig(
        data_path=root, n_points=256, n_data_rnd=512, video_len=4,
        frame_skip=2, past_frames=2, future_frames=0, pt_cube_bounds=5.0,
        pt_feat_dim=4, up_down_blocks=2, transition_factor=4, pt_num_neighbors=4,
        down_neighbors=4, global_size=8, num_cr_local_feats=4,
        implicit_mlp_blocks=3, cross_attn_layers=1, cross_attn_neighbors=4,
        num_cr_solid=64, air_sampling_ratio=1.5, color_mode='rgb_nosigmoid',
        color_lw=1.0, tracking_lw=1.0, num_epochs=2, seed=7,
        output_path='', **kw)
    verify_args(cfg, is_train=True)
    return cfg


@pytest.fixture(scope='module')
def trained(greater_root):
    cfg = _tiny_cfg(greater_root)
    logger = Logger(context='test_train')
    kind, train_loader, _, _ = create_train_val_loaders(cfg, logger)
    trainer = Trainer(cfg, kind, logger=logger)
    batches = []
    for i, b in enumerate(train_loader.epoch(0)):
        batches.append(b)
        if i >= 3:
            break
    trainer.init_state(batches[0], steps_per_epoch=4)
    return cfg, trainer, batches


def test_train_step_runs_and_descends(trained):
    cfg, trainer, batches = trained
    rng = jax.random.PRNGKey(0)
    losses = []
    state = trainer.state
    for i in range(8):
        rng, k = jax.random.split(rng)
        b = shard_batch(batches[i % len(batches)], trainer.mesh)
        state, metrics = trainer._train_step(state, b, k)
        losses.append(float(metrics['total_loss']))
        assert bool(metrics['grads_finite'])
        assert bool(metrics['params_finite'])
        assert bool(metrics['sample_ok'])
    trainer.state = state
    # Density BCE starts near ln(2); the aggregate objective must descend.
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_degenerate_frame_zero_loss_contribution(trained):
    '''A frame with < 256 valid target points is zero-weighted in the loss: its
    (unsupervisable) contents cannot update the weights. Mask-based analogue of the
    reference's hard error on such frames (/root/reference/utils/geometry.py:688-689)
    absorbed by the step-skip tolerance (train.py:87-94).'''
    cfg, trainer, batches = trained
    base = {k: np.array(v, copy=True) for k, v in batches[0].items()
            if k != 'meta_data'}
    base['pcl_target_valid'][:, 1, 8:] = False      # degenerate frame 1, all examples.
    alt = {k: v.copy() for k, v in base.items()}
    # Scramble the degenerate frame's contents; the loss must not move.
    alt['pcl_target'][:, 1] = alt['pcl_target'][:, 1][:, ::-1] * 0.5 + 0.25

    rng = jax.random.PRNGKey(3)
    params = trainer.state['params']
    to_dev = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
    fwd = jax.jit(trainer.pipeline.forward)  # one compile, both calls share it.
    losses_a, aux_a = fwd(params, to_dev(base), rng)
    losses_b, aux_b = fwd(params, to_dev(alt), rng)

    assert not bool(aux_a['sample_ok'])
    assert float(aux_a['sample_ok_frac']) == pytest.approx(0.5)
    for k in losses_a:
        np.testing.assert_allclose(np.asarray(losses_a[k]), np.asarray(losses_b[k]),
                                   rtol=1e-6, atol=1e-7)
    # The valid frame still supervises: losses are non-trivial.
    assert float(losses_a['dens']) > 0.0


def test_metrics_structure(trained):
    cfg, trainer, batches = trained
    b = shard_batch(batches[0], trainer.mesh)
    # The step donates its input state buffers; keep the returned state live.
    trainer.state, metrics = trainer._train_step(trainer.state, b,
                                                 jax.random.PRNGKey(1))
    for key in ('loss_dens', 'loss_rgb', 'loss_track', 'loss_segm', 'grad_norm'):
        assert key in metrics
    assert metrics['solid_sbs'].shape == (6,)
    assert metrics['air_sbs'].shape == (4,)


@pytest.mark.parametrize('fmt', ['pkl', 'orbax'])
def test_checkpoint_save_resume(trained, tmp_path, fmt):
    '''Both native checkpoint backends: save -> resume reproduces params
    exactly, resumes at the right epoch, and the resumed state steps. The
    orbax arm also pins the eval-side loader (load_models on the orbax dir
    layout rebuilds the engine from the side-file meta).'''
    from occlusions4d_tpu import checkpoint as ckpt_lib
    cfg, trainer, batches = trained
    old_out, old_fmt = cfg.output_path, cfg.checkpoint_format
    cfg.output_path = str(tmp_path / 'ckpt')
    cfg.checkpoint_format = fmt
    try:
        trainer.save(0)
        ckpt_lib.wait_for_async_saves()
        cfg2 = _tiny_cfg(cfg.data_path)
        trainer2 = Trainer(cfg2, 'greater', logger=Logger(context='resume'))
        trainer2.resume(cfg.output_path, steps_per_epoch=4)
        assert trainer2.start_epoch == 1
        a = jax.tree_util.tree_leaves(trainer.state['params'])
        b = jax.tree_util.tree_leaves(trainer2.state['params'])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # Optimizer state (incl. optax namedtuple classes) survives the store.
        assert (jax.tree_util.tree_structure(trainer2.state['opt_state'])
                == jax.tree_util.tree_structure(trainer.state['opt_state']))
        # Resumed state steps fine.
        bt = shard_batch(batches[0], trainer2.mesh)
        _, metrics = trainer2._train_step(trainer2.state, bt,
                                          jax.random.PRNGKey(2))
        assert bool(metrics['grads_finite'])
        if fmt == 'orbax':
            from occlusions4d_tpu.evaluate.inference import load_models
            loaded = load_models(cfg.output_path)
            le = jax.tree_util.tree_leaves(loaded['params'])
            for x, y in zip(le, jax.tree_util.tree_leaves(
                    trainer.state['params'])):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    finally:
        cfg.output_path, cfg.checkpoint_format = old_out, old_fmt


def test_resume_from_reference_pth_warm_start(trained, tmp_path):
    '''`--resume model.pth` on the TRAIN side (MIGRATION.md §3): weights and
    epoch load through the torch bridge; the optimizer restarts fresh at the
    schedule position implied by the epoch (torch Adam moments are not
    bridged), and the warm-started state steps.'''
    torch = pytest.importorskip('torch')
    from occlusions4d_tpu import checkpoint as ckpt_lib
    cfg, trainer, batches = trained
    sd_e = ckpt_lib.export_torch_state_dict(
        trainer.state['params']['encoder'], net='encoder')
    sd_d = ckpt_lib.export_torch_state_dict(
        trainer.state['params']['decoder'], net='decoder')
    pth = str(tmp_path / 'model_4.pth')
    torch.save({'pcl_net': sd_e, 'implicit_net': sd_d, 'epoch': 4}, pth)

    tr2 = Trainer(_tiny_cfg(cfg.data_path), 'greater',
                  logger=Logger(context='pth_resume'))
    tr2.resume(pth, steps_per_epoch=4)
    assert tr2.start_epoch == 5
    assert int(np.asarray(tr2.state['step'])) == 5 * 4  # schedule position.
    for x, y in zip(jax.tree_util.tree_leaves(tr2.state['params']),
                    jax.tree_util.tree_leaves(trainer.state['params'])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
    bt = shard_batch(batches[0], tr2.mesh)
    _, metrics = tr2._train_step(tr2.state, bt, jax.random.PRNGKey(3))
    assert bool(metrics['grads_finite'])


def test_data_parallel_sharded_step(greater_root):
    '''Same step on a dp=8 mesh: batch axis sharded, params replicated; the jitted
    step must compile and execute with XLA-inserted gradient reductions.'''
    cfg = _tiny_cfg(greater_root, batch_size=8, data_parallel=8)
    logger = Logger(context='test_dp')
    kind, train_loader, _, _ = create_train_val_loaders(cfg, logger)
    trainer = Trainer(cfg, kind, logger=logger)
    batch = next(iter(train_loader.epoch(0)))
    trainer.init_state(batch, steps_per_epoch=4)
    assert trainer.mesh.devices.size == 8
    b = shard_batch(batch, trainer.mesh)
    # Batch leaves actually sharded across 8 devices.
    assert len(b['pcl_input'].sharding.device_set) == 8
    state, metrics = trainer._train_step(trainer.state, b, jax.random.PRNGKey(3))
    assert bool(metrics['grads_finite'])
    assert np.isfinite(float(metrics['total_loss']))
    # Params remain replicated after the step.
    leaf = jax.tree_util.tree_leaves(state['params'])[0]
    assert len(leaf.sharding.device_set) == 8


def test_fused_decoder_dp8_sharded_step(greater_root):
    '''fused_decoder='on' under the dp=8 mesh: the Pallas custom-VJP train step
    must compile and execute with the batch axis sharded (params replicated),
    like the XLA-path equivalent above.'''
    cfg = _tiny_cfg(greater_root, batch_size=8, data_parallel=8,
                    fused_decoder='on')
    logger = Logger(context='test_dp_fused')
    kind, train_loader, _, _ = create_train_val_loaders(cfg, logger)
    trainer = Trainer(cfg, kind, logger=logger)
    assert trainer.pipeline.fused_decoder
    batch = next(iter(train_loader.epoch(0)))
    trainer.init_state(batch, steps_per_epoch=4)
    b = shard_batch(batch, trainer.mesh)
    state, metrics = trainer._train_step(trainer.state, b, jax.random.PRNGKey(3))
    assert bool(metrics['grads_finite'])
    assert np.isfinite(float(metrics['total_loss']))
    leaf = jax.tree_util.tree_leaves(state['params'])[0]
    assert len(leaf.sharding.device_set) == 8


def test_training_observability_exports(greater_root, tmp_path):
    '''A tiny training run leaves npy point-cloud exports (input / abstract /
    implicit output / layer coords), filter-ratio scalars, and early-epoch RGB
    galleries behind -- the reference's MyLogger.handle_step surface
    (/root/reference/utils/logvis.py:300-417, pipeline.py:92-94).'''
    import os
    from occlusions4d_tpu.utils.logvis import StepLogger
    cfg = _tiny_cfg(greater_root, export_visuals=True, viz_interval=2,
                    profile_steps=1)
    logger = StepLogger(log_dir=str(tmp_path), context='train',
                        batch_size=cfg.batch_size)
    kind, train_loader, _, _ = create_train_val_loaders(cfg, logger)
    trainer = Trainer(cfg, kind, logger=logger)
    batches = [b for _, b in zip(range(2), train_loader.epoch(0))]
    assert 'rgb' in batches[0] and 'snitch' in batches[0]  # export_visuals plumbed.
    trainer.init_state(batches[0], steps_per_epoch=2)
    trainer.run_epoch(0, 'train', iter(batches), num_steps=2)

    # --profile_steps wiring: step 1 of epoch 0 leaves an XLA device trace
    # under <log_dir>/profile (utils/profiling.device_trace CLI surface).
    prof = tmp_path / 'profile'
    assert prof.is_dir() and any(prof.rglob('*')), 'empty device trace'

    npys = os.listdir(tmp_path / 'numpy')
    for name in ('pcl_input', 'pcl_abstract', 'pcl_target', 'implicit_output',
                 'layer_coords_0'):
        assert any(name in f for f in npys), (name, npys)
    visuals = os.listdir(tmp_path / 'visuals')
    assert any('rgb' in f and f.endswith('.png') for f in visuals)
    assert any('depth' in f and f.endswith('.png') for f in visuals)
    scalars = logger.commit_scalars()
    assert any('cuboid_filter_ratio' in k for k in scalars), scalars
    assert any('sample_input_ratio' in k for k in scalars), scalars


def test_fused_decoder_train_path_matches_module(trained):
    '''fused_decoder='on': the train pipeline routes the per-frame field
    evaluation through the fused Pallas kernels (custom-VJP backward). Losses
    and parameter gradients match the XLA module path (f32 kernels off-TPU).'''
    from occlusions4d_tpu.pipeline import TrainPipeline
    cfg, trainer, batches = trained
    pipe_mod = trainer.pipeline
    assert not pipe_mod.fused_decoder  # 'auto' is off on the CPU test platform.
    pipe_fus = TrainPipeline(trainer.encoder, trainer.decoder,
                             pipe_mod.sampler.cfg, pipe_mod.cfg,
                             fused_decoder='on')
    assert pipe_fus.fused_decoder

    params = trainer.state['params']
    batch = {k: jnp.asarray(v) for k, v in batches[0].items()
             if k != 'meta_data'}
    rng = jax.random.PRNGKey(5)
    # jit: the eager transform is dispatch-bound on the 1-core CPU host.
    (loss_m, _), gm = jax.jit(jax.value_and_grad(pipe_mod.loss, has_aux=True))(
        params, batch, rng)
    (loss_f, _), gf = jax.jit(jax.value_and_grad(pipe_fus.loss, has_aux=True))(
        params, batch, rng)
    np.testing.assert_allclose(float(loss_f), float(loss_m), rtol=1e-4)
    flat_m = jax.tree_util.tree_leaves_with_path(gm)
    flat_f = jax.tree_util.tree_leaves(gf)
    for (path, a), b in zip(flat_m, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-3, err_msg=str(path))


def test_optimizer_schedule_milestones():
    from occlusions4d_tpu.train import build_optimizer
    cfg = TrainConfig(num_epochs=20, learn_rate=1e-3, lr_decay=0.4)
    _, schedule = build_optimizer(cfg, steps_per_epoch=100)
    # Milestones at epochs 8, 12, 16 (2/5, 3/5, 4/5 of 20).
    np.testing.assert_allclose(float(schedule(0)), 1e-3)
    np.testing.assert_allclose(float(schedule(799)), 1e-3)
    np.testing.assert_allclose(float(schedule(801)), 4e-4, rtol=1e-5)
    np.testing.assert_allclose(float(schedule(1201)), 1.6e-4, rtol=1e-5)
    np.testing.assert_allclose(float(schedule(1601)), 6.4e-5, rtol=1e-5)


def test_batchnorm_stats_update_and_survive_decay():
    '''pt_norm_type=batch: running statistics update each step and are not
    weight-decayed by AdamW (they are masked out of the optimizer).'''
    import jax
    from occlusions4d_tpu.parallel import make_mesh, shard_batch

    cfg = TrainConfig(
        batch_size=2, n_points=256, n_data_rnd=256, video_len=4, frame_skip=1,
        past_frames=2, pt_cube_bounds=5.0, cr_cube_bounds=5.0, pt_feat_dim=4,
        up_down_blocks=1, transition_factor=4, pt_num_neighbors=4,
        down_neighbors=4, global_size=8, num_cr_local_feats=4,
        implicit_mlp_blocks=2, cross_attn_layers=1, cross_attn_neighbors=4,
        cr_attn_type='c', num_cr_solid=32, air_sampling_ratio=1.0,
        color_mode='rgb_nosigmoid', color_lw=1.0, num_epochs=2, seed=0,
        pt_norm_type='batch', data_parallel=1, output_path='')
    verify_args(cfg, is_train=True)
    rng = np.random.RandomState(0)
    B, N, T, M = 2, cfg.n_points, cfg.past_frames, 512
    tgt = np.zeros((B, T, M, 9), np.float32)
    tgt[..., :3] = rng.rand(B, T, M, 3) * 6.0 - 3.0
    tgt[..., 2] = np.abs(tgt[..., 2])
    tgt[..., 5:8] = rng.rand(B, T, M, 3)
    batch = dict(
        pcl_input=(rng.rand(B, N, 8) * 2 - 1).astype(np.float32),
        pcl_target=tgt, pcl_target_valid=np.ones((B, T, M), bool),
        valo_ids=np.zeros((B, 32), np.int32),
        num_valo_ids=np.zeros((B,), np.int32))
    mesh = make_mesh(1)
    trainer = Trainer(cfg, 'greater', mesh=mesh)
    trainer.init_state(batch, steps_per_epoch=4)
    assert 'batch_stats' in trainer.state['params']['encoder']
    stats0 = jax.tree_util.tree_map(
        np.asarray, trainer.state['params']['encoder']['batch_stats'])
    sharded = shard_batch(batch, mesh)
    state, _ = trainer._train_step(trainer.state, sharded, jax.random.PRNGKey(0))
    state, _ = trainer._train_step(state, sharded, jax.random.PRNGKey(1))
    stats1 = jax.tree_util.tree_map(
        np.asarray, state['params']['encoder']['batch_stats'])
    leaves0 = jax.tree_util.tree_leaves(stats0)
    leaves1 = jax.tree_util.tree_leaves(stats1)
    # Running mean moved away from init (stats are being updated, not decayed).
    assert any(np.abs(a - b).max() > 1e-6 for a, b in zip(leaves0, leaves1))


def test_carla_cv1_flavor_train_step(tmp_path_factory):
    '''End-to-end CARLA training at the cv1 config shape: segmentation head,
    abstract_levels=2, layer norm, 13 semantic classes (README.md:41).'''
    root = tmp_path_factory.mktemp('carla_train')
    synthetic.make_carla_dataset(str(root), num_scenes=1, num_frames=24,
                                 points_per_frame=1500,
                                 stages=('train', 'val'))
    cfg = TrainConfig(
        data_path=str(root), batch_size=2, data_parallel=1, n_points=256,
        n_data_rnd=512, video_len=4, frame_skip=3, past_frames=2,
        future_frames=0, min_z=-0.5, pt_cube_bounds=20.0, cr_cube_bounds=16.0,
        cube_mode=4, pt_feat_dim=4, up_down_blocks=2, transition_factor=4,
        pt_num_neighbors=4, down_neighbors=4, global_size=8,
        num_cr_local_feats=4, implicit_mlp_blocks=3, cross_attn_layers=1,
        cross_attn_neighbors=4, num_cr_solid=64, air_sampling_ratio=1.5,
        color_mode='rgb_nosigmoid', color_lw=1.0, tracking_lw=0.0,
        segmentation_lw=1.0, semantic_classes=13, abstract_levels=2,
        pt_norm_type='layer', num_epochs=2, seed=13, output_path='')
    verify_args(cfg, is_train=True)
    logger = Logger(context='test_carla_train')
    kind, train_loader, _, _ = create_train_val_loaders(cfg, logger)
    assert kind == 'carla'
    trainer = Trainer(cfg, kind, logger=logger)
    batch = next(iter(train_loader.epoch(0)))
    batch = {k: v for k, v in batch.items() if k != 'meta_data'}
    trainer.init_state(batch, steps_per_epoch=4)
    state, metrics = trainer._train_step(trainer.state, batch,
                                         jax.random.PRNGKey(0))
    assert bool(metrics['grads_finite'])
    assert np.isfinite(float(metrics['total_loss']))
    # The segmentation objective is live at this config.
    assert float(metrics['loss_segm']) > 0.0


def test_per_step_nan_param_guard(trained):
    '''The NaN-parameter poison pill fires within one step of corruption (the
    reference checks every step, /root/reference/train.py:112-122): params are
    poisoned while step 2's batch is being fetched; step 2's guard is read
    right after step 3 is queued (so the device never idles on the fetch), and
    the raise lands before step 4. Step 3 - the only update dispatched on
    poisoned params - is a guard-skipped no-op here (NaN params give NaN grads
    whenever the poisoned leaf touches the loss, as in this full forward).'''
    from occlusions4d_tpu.utils.logvis import StepLogger
    cfg, trainer, batches = trained
    # Snapshot (not alias): the train step donates its input state buffers.
    state0 = jax.tree_util.tree_map(jnp.copy, trainer.state)
    step0 = int(np.asarray(state0['step']))
    orig_logger = trainer.logger
    trainer.logger = StepLogger(context='nan_param', batch_size=cfg.batch_size)

    consumed = []

    def gen():
        for i in range(6):
            if i == 2:  # simulate an overflowed update landing during step 1.
                params = trainer.state['params']
                leaves, treedef = jax.tree_util.tree_flatten(params)
                leaves[0] = leaves[0] * jnp.nan
                trainer.state['params'] = jax.tree_util.tree_unflatten(
                    treedef, leaves)
            consumed.append(i)
            yield batches[i % len(batches)]

    try:
        with pytest.raises(RuntimeError, match='NaN model parameter'):
            trainer.run_epoch(0, 'train', gen(), num_steps=6)
    finally:
        trainer.logger = orig_logger
    # Steps 0-3 dispatched (the guard for step 2 is checked after step 3 is
    # queued); the raise precedes step 4, and step 3's update was skipped by
    # the on-device grads_finite guard.
    assert int(np.asarray(trainer.state['step'])) == step0 + 4
    assert consumed == [0, 1, 2, 3]  # batch 4 was never fetched.
    # Steps 2/3 ran on poisoned params -> NaN grads -> updates skipped: every
    # other leaf is still finite (no corruption spread).
    assert all(bool(np.all(np.isfinite(np.asarray(p))))
               for p in jax.tree_util.tree_leaves(trainer.state['params'])[1:])
    trainer.state = state0  # restore for sibling tests (module-scoped fixture).


def test_nan_param_guard_not_masked_by_data_failures(trained):
    '''A pending poison pill fires even when every later batch fails host-side
    prep: the exception-tolerance path drains the guard before continuing, so
    a data-failure streak cannot mask (or out-raise) the NaN-parameter stop.'''
    from occlusions4d_tpu.utils.logvis import StepLogger
    cfg, trainer, batches = trained
    state0 = jax.tree_util.tree_map(jnp.copy, trainer.state)
    orig_logger = trainer.logger
    trainer.logger = StepLogger(context='nan_mask', batch_size=cfg.batch_size)

    def gen():
        yield batches[0]                     # step 0: healthy.
        params = trainer.state['params']
        leaves, treedef = jax.tree_util.tree_flatten(params)
        leaves[0] = leaves[0] * jnp.nan
        trainer.state['params'] = jax.tree_util.tree_unflatten(treedef, leaves)
        yield batches[1 % len(batches)]      # step 1: poisoned -> bad guard.
        for _ in range(14):                  # then nothing but data failures.
            yield 42                         # fails in host-side batch prep.

    try:
        with pytest.raises(RuntimeError, match='NaN model parameter'):
            trainer.run_epoch(0, 'train', gen(), num_steps=20)
    finally:
        trainer.logger = orig_logger
        trainer.state = state0


def test_per_step_nan_grad_skip_and_log(trained):
    '''A NaN-producing batch yields non-finite gradients: the update is skipped
    on device (params stay finite and unchanged) and the error is logged on the
    very next iteration, not at the 32-step logging cadence.'''
    from occlusions4d_tpu.utils.logvis import StepLogger
    cfg, trainer, batches = trained
    state0 = trainer.state

    errors = []
    orig_logger = trainer.logger
    trainer.logger = StepLogger(context='nan_grad', batch_size=cfg.batch_size)
    trainer.logger.error = lambda msg: errors.append(str(msg))
    try:
        bad = {k: (np.full_like(v, np.nan) if k == 'pcl_input' else v)
               for k, v in batches[0].items() if k != 'meta_data'}
        bad['meta_data'] = batches[0]['meta_data']
        feed = [batches[0], bad, batches[1]]
        trainer.run_epoch(0, 'train', iter(feed), num_steps=3)
    finally:
        trainer.logger = orig_logger

    assert any('NaN/Inf gradient' in e for e in errors), errors
    finite = [bool(np.all(np.isfinite(np.asarray(p))))
              for p in jax.tree_util.tree_leaves(trainer.state['params'])]
    assert all(finite)


def test_watch_networks_layer_norms(trained):
    '''wandb.watch-equivalent telemetry (/root/reference/utils/logvis.py:75):
    per-layer parameter/gradient L2 norms, one stacked array each, names
    aligned with layer_norm_names.'''
    from occlusions4d_tpu.train import make_train_step, layer_norm_names
    cfg, trainer, batches = trained
    step = make_train_step(trainer.pipeline, trainer.tx, watch_networks=True)
    state = jax.tree_util.tree_map(jnp.copy, trainer.state)
    b = shard_batch(batches[0], trainer.mesh)
    _, metrics = step(state, b, jax.random.PRNGKey(0))

    names = layer_norm_names(trainer.state['params'])
    g = np.asarray(metrics['layer_grad_norms'])
    p = np.asarray(metrics['layer_param_norms'])
    assert g.shape == p.shape == (len(names),)
    assert np.isfinite(g).all() and np.isfinite(p).all()
    # Almost every layer has non-zero parameters; every name is distinct.
    assert (p > 0).sum() > len(names) * 0.8
    assert len(set(names)) == len(names)
    assert any('encoder' in n for n in names) and any('decoder' in n for n in names)

    # want_norms=False skips the norm computation (run_epoch passes the 32-step
    # logging cadence so off-cadence steps don't pay the reductions).
    state2 = jax.tree_util.tree_map(jnp.copy, trainer.state)
    _, m2 = step(state2, b, jax.random.PRNGKey(0), False)
    assert np.asarray(m2['layer_param_norms']).max() == 0.0


def test_check_numerics_localizes_nan(greater_root, tmp_path):
    '''--check_numerics wraps the step in checkify float checks: a NaN input
    batch raises a localized error (op-level traceback), the TPU analogue of
    the reference's _CHECK_NAN probes (/root/reference/loss.py:12,61,151).
    The viz and eval steps jit the same probed pipeline.forward, so they must
    be checkified too (un-functionalized checkify.check fails at trace time) -
    exercised here via a log_dir train epoch (viz export at step 0) and a
    val_aug epoch.'''
    from occlusions4d_tpu.utils.logvis import StepLogger
    from occlusions4d_tpu.data import create_train_val_loaders
    cfg = _tiny_cfg(greater_root, check_numerics=True)
    logger = StepLogger(log_dir=str(tmp_path / 'logs'), context='checkify',
                        batch_size=cfg.batch_size)
    kind, train_loader, _, _ = create_train_val_loaders(cfg, logger)
    trainer = Trainer(cfg, kind, logger=logger)
    assert not trainer.pipeline.fused_decoder  # checkify needs the XLA path.
    batches = []
    for i, b in enumerate(train_loader.epoch(0)):
        batches.append(b)
        if i >= 1:
            break
    trainer.init_state(batches[0], steps_per_epoch=2)

    # Clean passes through all three checkified jits (train + viz at step 0,
    # then eval): must run, not ValueError at trace.
    trainer.run_epoch(0, 'train', iter([batches[0]]), num_steps=1)
    trainer.run_epoch(0, 'val_aug', iter([batches[0]]), num_steps=1)

    bad = {k: (np.full_like(v, np.nan) if k == 'pcl_input' else v)
           for k, v in batches[1].items() if k != 'meta_data'}
    bad['meta_data'] = batches[1]['meta_data']
    with pytest.raises(Exception, match='(?i)nan'):
        trainer.run_epoch(0, 'train', iter([batches[0], bad, batches[0]]),
                          num_steps=3)
