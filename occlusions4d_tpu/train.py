'''
Training driver: optimizer, LR schedule, jitted + batch-sharded train step, epoch loop,
checkpointing, NaN guards.

Capability parity with /root/reference/train.py:
  * AdamW lr=1e-3, weight_decay=1e-2, eps=1e-4 (mixed precision) / 1e-8
    (train.py:313-314); MultiStep LR at 2/5, 3/5, 4/5 of epochs with gamma=lr_decay
    (train.py:315-319); global-norm gradient clip 0.2 (train.py:107-109).
  * Mixed precision: bf16 compute policy replaces fp16 + GradScaler (bf16 needs no
    loss scaling on TPU).
  * NaN-gradient detection and NaN-parameter hard fail (train.py:112-122) as on-device
    flags checked by the host loop; non-finite-gradient steps are skipped (the
    reference merely logged and stepped anyway - skipping is strictly safer).
  * Bounded per-step exception tolerance (<= 12/epoch, train.py:87-94) for host-side
    data errors.
  * Checkpoint per epoch: model_{e} + rolling, carrying params, optimizer state,
    epoch, and all constructor args (train.py:336-357).

Parallelism: the batch axis is sharded over a 1-D 'dp' mesh; XLA inserts the gradient
all-reduce over ICI from the sharding annotations (replaces nn.DataParallel).

Run: python -m occlusions4d_tpu.train --data_path ... (flags mirror the reference CLI).
'''

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import checkpoint as ckpt_lib
from .config import TrainConfig, train_args
from .models import factory
from .parallel import make_mesh, shard_batch, replicated
from .pipeline import PipelineConfig, TrainPipeline
from .sampler import SamplerConfig
from .utils.logvis import StepLogger

__all__ = ['build_optimizer', 'make_train_step', 'Trainer', 'main']

# Host-sync cadence for scalar logging AND the want_norms flag passed into the
# train step: the two must agree, or the logging steps would read the
# lax.cond zero-branch norms (silently all-zero telemetry).
LOG_EVERY = 32


def _trainable_mask(params):
    '''False at batch-norm running statistics (not optimizer targets).'''

    def walk(node, under_stats):
        if isinstance(node, dict):
            return {k: walk(v, under_stats or k == 'batch_stats')
                    for k, v in node.items()}
        return not under_stats

    return walk(params, False)


def build_optimizer(cfg: TrainConfig, steps_per_epoch):
    '''AdamW + multistep schedule + global-norm clip (train.py:107-122, 313-319).
    Batch-norm running statistics are masked out (zero-gradient, but AdamW's
    weight decay would otherwise erode them).'''
    milestones = [(cfg.num_epochs * 2) // 5, (cfg.num_epochs * 3) // 5,
                  (cfg.num_epochs * 4) // 5]
    boundaries = {m * steps_per_epoch: cfg.lr_decay for m in milestones if m > 0}
    schedule = optax.piecewise_constant_schedule(cfg.learn_rate, boundaries)
    eps = 1e-4 if cfg.mixed_precision else 1e-8
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip) if cfg.gradient_clip > 0
        else optax.identity(),
        optax.masked(
            optax.adamw(schedule, b1=0.9, b2=0.999, eps=eps, weight_decay=1e-2),
            _trainable_mask),
    )
    return tx, schedule


def layer_norm_names(params):
    '''Flat leaf-path names matching the stacking order of the train step's
    layer_grad_norms / layer_param_norms telemetry arrays.'''
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [jax.tree_util.keystr(path) for path, _ in flat]


def _leaf_norms(tree):
    '''(L,) stacked L2 norms of every leaf, in tree_flatten_with_path order
    (one array -> one D2H transfer for the whole model's telemetry).'''
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return jnp.stack([jnp.sqrt(jnp.sum(jnp.square(l.astype(jnp.float32))))
                      for _, l in flat])


def make_train_step(pipeline: TrainPipeline, tx, watch_networks=False,
                    check_numerics=False):
    '''Returns jitted train_step(state, batch, rng) -> (state, metrics).

    :param watch_networks: add per-layer parameter/gradient L2 norms to the
        metrics (wandb.watch-equivalent telemetry; the reference registers both
        nets at wandb init, /root/reference/utils/logvis.py:75). Stacked into
        two (L,) arrays; decode names with layer_norm_names(params).
    :param check_numerics: functionalize the pipeline's tensor-boundary
        NaN/Inf probes (pipeline._numerics_probe; the pipeline must be built
        with debug_checks=True). metrics gain a 'numerics_err' checkify.Error
        the host loop throws on, naming the first non-finite tensor (encoder
        outputs, per-frame decoder outputs, each loss term) — the reference's
        _CHECK_NAN probes, /root/reference/loss.py:12,61,151,
        pipeline.py:17,113. user_checks (not op-level float_checks): explicit
        probes keep the checkify graph compilable at full pipeline scale.

    The returned step takes an optional want_norms flag (traced, so no
    recompile): the per-layer norms are only computed on steps where the host
    will actually read them (the 32-step logging cadence) — hundreds of small
    reductions otherwise paid on every step.
    '''

    def step_fn(state, batch, rng, want_norms=True):
        params, opt_state, step = state['params'], state['opt_state'], state['step']
        (loss, (losses, aux)), grads = jax.value_and_grad(
            pipeline.loss, has_aux=True)(params, batch, rng)

        grad_leaves = jax.tree_util.tree_leaves(grads)
        grads_finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(g)) for g in grad_leaves]))
        grad_norm = optax.global_norm(grads)

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # Merge batch-norm running statistics updated by the forward pass.
        if aux.get('batch_stats') is not None:
            new_params = dict(new_params)
            new_params['encoder'] = dict(new_params['encoder'],
                                         batch_stats=aux['batch_stats'])
        # Skip the update on non-finite gradients (train.py:112-114 logs; we skip).
        new_params, new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(grads_finite, new, old),
            (new_params, new_opt_state), (params, opt_state))

        params_finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(p)) for p in jax.tree_util.tree_leaves(new_params)]))

        metrics = dict(total_loss=loss, grad_norm=grad_norm,
                       grads_finite=grads_finite, params_finite=params_finite,
                       sample_ok=aux['sample_ok'],
                       sample_ok_frac=aux['sample_ok_frac'],
                       solid_sbs=aux['solid_sbs'], air_sbs=aux['air_sbs'],
                       **{f'loss_{k}': v for k, v in losses.items()})
        if watch_networks:
            n_leaves = len(jax.tree_util.tree_leaves(grads))
            zeros = jnp.zeros((n_leaves,), jnp.float32)
            norms = jax.lax.cond(
                want_norms,
                lambda: (_leaf_norms(grads), _leaf_norms(new_params)),
                lambda: (zeros, zeros))
            metrics['layer_grad_norms'] = norms[0]
            metrics['layer_param_norms'] = norms[1]
        new_state = dict(params=new_params, opt_state=new_opt_state, step=step + 1)
        return new_state, metrics

    if check_numerics:
        from jax.experimental import checkify

        def checked_fn(state, batch, rng, want_norms=True):
            err, out = checkify.checkify(
                step_fn, errors=checkify.user_checks)(state, batch, rng,
                                                      want_norms)
            new_state, metrics = out
            metrics = dict(metrics, numerics_err=err)
            return new_state, metrics

        return jax.jit(checked_fn, donate_argnums=(0,))
    return jax.jit(step_fn, donate_argnums=(0,))


def _checkified(fn):
    '''jit fn with the pipeline's _numerics_probe checkify.check probes
    functionalized, throwing any localized NaN/Inf error host-side. Needed by
    every jit of pipeline.forward under --check_numerics: an un-functionalized
    checkify.check cannot be lowered (ValueError at trace time).'''
    from jax.experimental import checkify
    jitted = jax.jit(
        lambda *a: checkify.checkify(fn, errors=checkify.user_checks)(*a))

    def wrapped(*a):
        err, out = jitted(*a)
        err.throw()
        return out

    return wrapped


def make_viz_step(pipeline: TrainPipeline):
    '''Jitted observability forward: re-runs the pipeline with
    return_intermediate=True and returns the visual-export arrays (input/abstract/
    target/output point clouds + per-layer coordinates). Run every
    cfg.viz_interval train steps, mirroring the reference's
    `return_intermediate = step % 80 == 0` (/root/reference/pipeline.py:92-94) and
    MyLogger's npy exports (logvis.py:300-380). Costs one extra forward on those
    steps only.'''

    def viz_fn(state, batch, rng):
        _, aux = pipeline.forward(state['params'], batch, rng,
                                  return_intermediate=True)
        return dict(abstract=aux['abstract'],
                    points_query=aux['points_query'],
                    implicit_output=aux['implicit_output'],
                    implicit_target=aux['implicit_target'],
                    features_global=aux['features_global'],
                    layer_coords=aux['layer_coords'])

    if pipeline.debug_checks:
        return _checkified(viz_fn)
    return jax.jit(viz_fn)


def make_eval_step(pipeline: TrainPipeline):
    def eval_fn(state, batch, rng):
        from .losses import total_loss
        losses, aux = pipeline.forward(state['params'], batch, rng)
        loss = total_loss(losses, pipeline.cfg.loss_config)
        return dict(total_loss=loss, sample_ok=aux['sample_ok'],
                    **{f'loss_{k}': v for k, v in losses.items()})
    if pipeline.debug_checks:
        return _checkified(eval_fn)
    return jax.jit(eval_fn)


class Trainer:
    '''Orchestrates epochs over a data source (any iterable of batch dicts).'''

    def __init__(self, cfg: TrainConfig, data_kind, logger=None, mesh=None):
        self.cfg = cfg
        self.data_kind = data_kind
        self.logger = logger or StepLogger(context='train', batch_size=cfg.batch_size)
        if mesh is None:
            dp = cfg.data_parallel
            if dp is None or dp < 0:
                # Auto: the largest divisor of batch_size that fits on this host, so
                # the default never produces an unshardable batch.
                n_dev = len(jax.devices())
                dp = max(d for d in range(1, min(cfg.batch_size, n_dev) + 1)
                         if cfg.batch_size % d == 0)
            mesh = make_mesh(dp)
        self.mesh = mesh
        if cfg.batch_size % self.mesh.size != 0:
            raise ValueError(
                f'batch_size={cfg.batch_size} is not divisible by the data-parallel '
                f'mesh size {self.mesh.size}; every step would fail at shard time '
                f'(and be swallowed by the exception tolerance). Adjust '
                f'--batch_size or --data_parallel.')

        dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        # checkify cannot see inside pallas kernels: --check_numerics forces the
        # XLA paths (encoder here, decoder below) for op-level NaN localization.
        fused_attn = 'off' if getattr(cfg, 'check_numerics', False) else None
        self.encoder, self.decoder, self.encoder_args, self.decoder_args = \
            factory.build_models(cfg, data_kind, dtype=dtype,
                                 fused_attention=fused_attn)
        self.sampler_args = factory.build_sampler_args(cfg, data_kind)
        pipe_cfg = PipelineConfig(
            color_mode=cfg.color_mode, semantic_classes=cfg.semantic_classes,
            past_frames=cfg.past_frames, future_frames=cfg.future_frames,
            density_lw=cfg.density_lw, color_lw=cfg.color_lw,
            segmentation_lw=cfg.segmentation_lw, tracking_lw=cfg.tracking_lw)
        self.check_numerics = getattr(cfg, 'check_numerics', False)
        # wandb.watch parity: telemetry is on whenever wandb is
        # (/root/reference/utils/logvis.py:75 registers both nets at init).
        self.watch_networks = (getattr(cfg, 'watch_networks', False)
                               or getattr(cfg, 'use_wandb', False))
        fused = cfg.fused_decoder
        if self.check_numerics:
            # checkify cannot see inside pallas kernels; the XLA module path
            # gives op-level NaN localization through the whole decoder.
            fused = 'off'
        self.pipeline = TrainPipeline(
            self.encoder, self.decoder, SamplerConfig(**self.sampler_args),
            pipe_cfg, fused_decoder=fused,
            # checkify x jax.checkpoint hangs XLA:CPU (effect-threading
            # through the remat'd closed call); check_numerics is a debug mode
            # run at debug scale, so trading its remat memory saving for a
            # working localizer is the right call.
            remat=not self.check_numerics,
            debug_checks=self.check_numerics,
            fused_decoder_dtype=getattr(cfg, 'fused_decoder_dtype', 'auto'))
        self.state = None
        self._train_step = None
        self._eval_step = None
        self.start_epoch = cfg.start_epoch

    # ------------------------------------------------------------------ state --

    def init_state(self, example_batch, seed=None, steps_per_epoch=1000):
        seed = self.cfg.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        k_e, k_d, k_fps = jax.random.split(rng, 3)
        # Params are independent of the point count; init at a small N so the FPS
        # loop is not executed eagerly at full scale (that takes minutes on TPU).
        pcl = jnp.asarray(example_batch['pcl_input'][:1])
        n_init = min(pcl.shape[1], 512)
        pcl = pcl[:, :n_init]
        enc_vars = jax.jit(self.encoder.init)({'params': k_e, 'fps': k_fps}, pcl)
        abstract, fg, _ = jax.jit(self.encoder.apply)(enc_vars, pcl,
                                                      rngs={'fps': k_fps})
        q = jnp.zeros((1, 64, 4), jnp.float32)
        dec_vars = jax.jit(self.decoder.init)(k_d, q, abstract, fg)
        params = dict(encoder=enc_vars, decoder=dec_vars)

        self.tx, self.schedule = build_optimizer(self.cfg, steps_per_epoch)
        opt_state = self.tx.init(params)
        self.state = dict(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))
        # Replicate across the mesh.
        self.state = jax.device_put(self.state, replicated(self.mesh))
        self._build_steps()
        return self.state

    def resume(self, path, steps_per_epoch=1000):
        self.tx, self.schedule = build_optimizer(self.cfg, steps_per_epoch)
        if str(path).endswith('.pth'):
            # Reference-format checkpoint (torch bridge): model weights + epoch
            # warm-start. The reference's torch Adam moments are NOT mapped
            # into optax (different state layout) — the optimizer restarts
            # fresh at the schedule position implied by the epoch.
            ref = ckpt_lib.load_reference_checkpoint(path)
            params = dict(encoder=ref['encoder_variables'],
                          decoder=ref['decoder_variables'])
            epoch = int(ref['epoch'])
            step = jnp.asarray((epoch + 1) * steps_per_epoch, jnp.int32)
            state = dict(params=params, opt_state=self.tx.init(params),
                         step=step)
            if self.logger is not None:
                self.logger.info('Resuming from a reference .pth checkpoint: '
                                 'weights + epoch loaded, optimizer state '
                                 'reinitialized (torch Adam moments are not '
                                 'bridged).')
        else:
            # Orbax stores restore into a freshly-built optimizer template
            # (import-path-decoupled: the stored treedef pickle is never
            # touched); pkl stores ignore the target and round-trip exactly.
            payload = ckpt_lib.load_checkpoint(
                path, make_state_target=lambda pure: dict(
                    params=pure['params'],
                    opt_state=self.tx.init(pure['params']),
                    step=jnp.zeros((), jnp.int32)))
            state, epoch = payload['state'], payload['epoch']
        self.state = jax.device_put(state, replicated(self.mesh))
        self._build_steps()
        self.start_epoch = epoch + 1
        return self.state

    def _build_steps(self):
        self._train_step = make_train_step(self.pipeline, self.tx,
                                           watch_networks=self.watch_networks,
                                           check_numerics=self.check_numerics)
        self._eval_step = make_eval_step(self.pipeline)
        self._viz_step = make_viz_step(self.pipeline)
        self._layer_names = layer_norm_names(self.state['params'])

    def save(self, epoch):
        if not self.cfg.output_path:
            return
        meta = dict(config=vars(self.cfg), encoder_args=self.encoder_args,
                    decoder_args=self.decoder_args, sampler_args=self.sampler_args,
                    data_kind=self.data_kind)
        ckpt_lib.save_checkpoint(self.cfg.output_path, epoch, self.state, meta=meta,
                                 format=getattr(self.cfg, 'checkpoint_format', 'pkl'))

    # ------------------------------------------------------------------- loops --

    def run_epoch(self, epoch, stage, data_iter, num_steps=None):
        assert stage in ('train', 'val', 'val_aug')
        from .utils.profiling import PhaseTimer
        is_train = stage == 'train'
        rng = jax.random.PRNGKey(self.cfg.seed * 1000 + epoch * 10
                                 + (0 if is_train else 1))
        num_exceptions = 0
        metrics_hist = []
        timer = PhaseTimer()
        start = time.time()

        data_iter = iter(data_iter)
        cur_step = -1
        prev_guard = None  # (grads_finite, params_finite) of the last train step.
        # --profile_steps: device-trace steps [1, 1+N) of epoch 0 (step 0 pays
        # the compile and would drown the trace).
        prof_until = (1 + self.cfg.profile_steps
                      if (is_train and epoch == 0 and self.logger.log_dir
                          and getattr(self.cfg, 'profile_steps', 0) > 0)
                      else None)
        prof_active = False

        def check_guard():
            '''Materialize and act on the pending step's guard flags.'''
            nonlocal prev_guard
            if prev_guard is None:
                return
            with timer.phase('guard'):
                g_fin, p_fin = (bool(np.asarray(prev_guard[0])),
                                bool(np.asarray(prev_guard[1])))
                if prev_guard[2] is not None:
                    prev_guard[2].throw()  # checkify: localized NaN/Inf op.
            prev_guard = None
            if not g_fin:
                self.logger.error('NaN/Inf gradient detected! Step skipped.')
            if not p_fin:
                raise RuntimeError('NaN model parameter detected!')
        def _prof_stop():
            nonlocal prof_active
            if prof_active:
                jax.profiler.stop_trace()
                prof_active = False
                self.logger.info('Device trace written to '
                                 f'{os.path.join(self.logger.log_dir, "profile")}')

        try:
          while True:
            cur_step += 1
            if prof_until is not None:
                if prof_active and cur_step >= prof_until:
                    _prof_stop()
                elif not prof_active and cur_step == 1:
                    try:
                        jax.profiler.start_trace(
                            os.path.join(self.logger.log_dir, 'profile'))
                        prof_active = True
                    except Exception as e:  # backend without profiler support.
                        self.logger.warning(f'device trace unavailable: {e}')
                        prof_until = None
            if num_steps is not None and cur_step >= num_steps:
                break
            with timer.phase('data'):
                batch = next(data_iter, None)
            if batch is None:
                break
            rng, k = jax.random.split(rng)
            try:
                # meta_data and image stacks stay on host (bookkeeping / visuals,
                # not step inputs).
                meta_list = batch.get('meta_data')
                host_images = {k2: batch[k2] for k2 in ('rgb', 'depth')
                               if k2 in batch}
                batch = {k2: v for k2, v in batch.items()
                         if k2 not in ('meta_data', 'rgb', 'depth', 'flat',
                                       'snitch', 'cam_RT', 'cam_K')}
                with timer.phase('h2d'):
                    batch = shard_batch(batch, self.mesh)
            except Exception as e:  # host-side data failure tolerance (train.py:87-94).
                num_exceptions += 1
                if num_exceptions >= 12:
                    raise
                self.logger.exception(e)
                # A pending poison pill must not be masked by a data-failure
                # streak ending in the 12-exception re-raise.
                check_guard()
                continue

            with timer.phase('step'):
                if is_train:
                    self.state, metrics = self._train_step(
                        self.state, batch, k, cur_step % LOG_EVERY == 0)
                    new_guard = (metrics['grads_finite'],
                                 metrics['params_finite'],
                                 metrics.pop('numerics_err', None))
                else:
                    metrics = self._eval_step(self.state, batch, k)
                    new_guard = None

            # Per-step NaN guard (/root/reference/train.py:112-122 checks every
            # step) checked AFTER this step is queued: the D2H fetch waits on
            # step N-1 (already retiring) while the device executes step N, so
            # the device never idles on the guard. The poison-pill raise still
            # precedes step N+1's dispatch; the one step dispatched on
            # poisoned params is normally a guard-skipped no-op (NaN params
            # give NaN grads wherever the poisoned leaf touches the loss).
            if is_train:
                check_guard()
                prev_guard = new_guard

            if (is_train and self.logger.log_dir is not None
                    and cur_step % max(self.cfg.viz_interval, 1) == 0):
                with timer.phase('viz'):
                    self._export_intermediates(epoch, stage, cur_step, batch,
                                               host_images, meta_list, k)

            if cur_step % LOG_EVERY == 0:  # host sync for scalar logging only
                #                            (NaN guards run per step, above).
                with timer.phase('sync'):
                    m = {k2: np.asarray(v) for k2, v in metrics.items()}
                loss_terms = {k2: float(v) for k2, v in m.items()
                              if k2.startswith('loss_')}
                self.logger.handle_step(epoch, stage, cur_step, int(m.get('step', 0))
                                        if 'step' in m else cur_step, num_steps or -1,
                                        float(m['total_loss']), loss_terms)
                for name, val in loss_terms.items():
                    self.logger.report_scalar(f'{stage}/{name}', val, remember=True)
                self.logger.report_scalar(f'{stage}/total_loss',
                                          float(m['total_loss']), remember=True)
                if 'layer_grad_norms' in m:
                    # wandb.watch-equivalent per-layer telemetry, committed as
                    # epoch histograms (logvis.py:75 parity).
                    for kind in ('layer_grad_norms', 'layer_param_norms'):
                        for name, val in zip(self._layer_names, m[kind]):
                            self.logger.report_scalar(
                                f'{stage}/{kind[6:-1]}{name}', float(val),
                                remember=True, commit_histogram=True)
                metrics_hist.append(m)

        finally:
            # Close an active device trace even when the step loop raises
            # (NaN-param poison pill, loader error): an unterminated trace is
            # lost/corrupt and leaves the profiler running for the process.
            _prof_stop()
        check_guard()  # trailing-edge guard for the final step.
        self.logger.info(f'[{stage}] epoch {epoch} finished in '
                         f'{time.time() - start:.1f}s')
        timer.report(self.logger, prefix=f'[{stage}] ')
        self.last_phase_timer = timer  # data/h2d/step split for callers (bench).
        return metrics_hist

    def _export_intermediates(self, epoch, stage, cur_step, dev_batch, host_images,
                              meta_list, rng):
        '''Reference-parity training observability (MyLogger.handle_step,
        /root/reference/utils/logvis.py:300-417): npy point-cloud exports of
        input / abstract / target / implicit output / per-layer coordinates,
        per-channel output histograms, dataset filtering-ratio histograms, and
        early-epoch RGB-D galleries when images were loaded.'''
        viz = jax.tree_util.tree_map(np.asarray,
                                     self._viz_step(self.state, dev_batch, rng))
        out_pcl = np.concatenate([viz['points_query'][0],
                                  viz['implicit_output'][0]], axis=-1)  # (T, N, 4+C).
        tgt_pcl = np.concatenate([viz['points_query'][0],
                                  viz['implicit_target'][0]], axis=-1)  # (T, N, 10).
        arrays = dict(pcl_input=np.asarray(dev_batch['pcl_input'][0]),
                      pcl_abstract=viz['abstract'][0],
                      pcl_target=np.asarray(dev_batch['pcl_target'][0]),
                      implicit_output=out_pcl, implicit_target=tgt_pcl)
        for i, lc in enumerate(viz['layer_coords'] or []):
            arrays[f'layer_coords_{i}'] = np.asarray(lc[0])
        self.logger.export_pointclouds(stage, epoch, cur_step, arrays)

        cfg = self.cfg
        for t in range(viz['implicit_output'].shape[1]):
            io_t = viz['implicit_output'][:, t]
            self.logger.report_implicit_histograms(
                stage, io_t, cfg.color_mode, t,
                cfg.segmentation_lw > 0.0, cfg.semantic_classes,
                cfg.tracking_lw > 0.0, step=epoch)
            # Predicted-solid vs predicted-air per-channel split at density
            # logit 0 (reference logvis.py:391-397 val-stage reporting).
            flat = io_t.reshape(-1, io_t.shape[-1])
            self.logger.report_pcl_air_histograms(
                stage, flat[flat[..., 0] >= 0.0], flat[flat[..., 0] < 0.0],
                cfg.color_mode, t, cfg.segmentation_lw > 0.0,
                cfg.semantic_classes, cfg.tracking_lw > 0.0, False, epoch)
        self.logger.report_histogram(f'{stage}/features_global',
                                     viz['features_global'], step=epoch)
        self.logger.report_filter_ratios(stage, meta_list, epoch)

        if host_images and epoch < 2 and cur_step == 0:
            # Early-epoch visual sanity artifacts (logvis.py:300-340 behavior).
            rgb = np.asarray(host_images['rgb'][0, 0])           # (T, H, W, 3).
            self.logger.save_gallery(rgb, f'{stage}_rgb_e{epoch}', step=cur_step)
            self.logger.save_video(rgb, f'{stage}_rgb_e{epoch}', step=cur_step)
            if 'depth' in host_images:
                d = np.asarray(host_images['depth'][0, 0])
                d = d / max(float(d.max()), 1e-6)
                self.logger.save_gallery(d, f'{stage}_depth_e{epoch}', step=cur_step)

    def fit(self, train_loader_fn, val_loader_fn=None, steps_per_epoch=None):
        '''
        :param train_loader_fn: epoch -> iterable of batches.
        '''
        for epoch in range(self.start_epoch, self.cfg.num_epochs):
            self.logger.info(f'Epoch (1-based): {epoch + 1} / {self.cfg.num_epochs}')
            self.run_epoch(epoch, 'train', train_loader_fn(epoch), steps_per_epoch)
            self.save(epoch)
            if val_loader_fn is not None:
                self.run_epoch(epoch, 'val_aug', val_loader_fn(epoch), steps_per_epoch)
            self.logger.epoch_finished(epoch)


def main(cfg: TrainConfig, logger=None):
    '''CLI entry: mirrors /root/reference/train.py:162-365.'''
    from .data import create_train_val_loaders
    logger = logger or StepLogger(
        log_dir=os.path.join(cfg.log_root, cfg.tag or cfg.name or 'run'),
        context='train', batch_size=cfg.batch_size)
    logger.use_wandb = logger.use_wandb or cfg.use_wandb
    logger.init_wandb('occlusions-4d', cfg)  # /root/reference/train.py:360.
    logger.info(f'Args: {cfg}')
    logger.save_args(cfg)
    np.random.seed(cfg.seed)

    (data_kind, train_loader, val_loader, dset_args) = \
        create_train_val_loaders(cfg, logger)
    logger.info(f'data_kind: {data_kind}  output: {cfg.output_path}')

    trainer = Trainer(cfg, data_kind, logger=logger)
    example = next(iter(train_loader.epoch(0)))
    steps_per_epoch = train_loader.steps_per_epoch
    if cfg.resume:
        trainer.resume(cfg.resume, steps_per_epoch)
        logger.info(f'Resumed from {cfg.resume} at epoch {trainer.start_epoch}')
    else:
        trainer.init_state(example, steps_per_epoch=steps_per_epoch)
    trainer.fit(lambda e: train_loader.epoch(e),
                (lambda e: val_loader.epoch(e)) if val_loader else None,
                steps_per_epoch=steps_per_epoch)
    ckpt_lib.wait_for_async_saves()  # orbax: final epoch's save must land.
    return trainer


if __name__ == '__main__':
    main(train_args())
