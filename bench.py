'''
Headline benchmark: dense 4D-field inference at the reference eval workload
(/root/reference/README.md:52) - 524288 grid implicit queries for one scene at
implicit_batch_size 32768, gv1 model scale (n_points=14336 encoder), on real TPU.

North star (BASELINE.md): full scene in < 2 s on v5e-8; tracked metrics are implicit
queries/sec/chip and encoder forward ms at n_points=14336.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
vs_baseline is the speedup vs the 2 s north-star target (so > 1.0 beats it).
'''

import json
import os
import time

import numpy as np

# Persistent XLA compile cache: the remote-compile tunnel takes minutes per
# train-step compile; re-runs on this host then hit the cache in seconds.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '5')

_T0 = time.time()
# Soft deadline for the optional train-step extras: whatever happens, the
# headline dense-eval metric line must be printed.
_TRAIN_DEADLINE_S = float(os.environ.get('O4D_BENCH_TRAIN_DEADLINE', 2700))


def _sync(x):
    '''Force completion: block_until_ready does not truly wait on the tunneled
    axon TPU, so a scalar D2H read is the only reliable barrier.'''
    import numpy as np
    return float(np.asarray(x.ravel()[0]))


def _progress(msg):
    '''Phase marker on stderr (stdout stays the single JSON result line);
    cold compiles through the remote-compile tunnel take minutes per phase,
    so a silent run is indistinguishable from a hung one without these.'''
    import sys
    print(f'[bench +{time.time() - _T0:7.1f}s] {msg}', file=sys.stderr,
          flush=True)


def _time_train_step(cfg, n_points, batch_size=1, steps=3, trials=2,
                     data_kind='greater'):
    '''One-chip jitted train-step latency (ms) at the given point budget:
    full pipeline - encoder, guided sampler, decoder, losses, AdamW update
    (VERDICT r1 item 6: driver-witnessed version of the README train numbers).'''
    import dataclasses
    import jax
    from occlusions4d_tpu.train import Trainer
    from occlusions4d_tpu.parallel import make_mesh, shard_batch

    cfg = dataclasses.replace(cfg, n_points=n_points, batch_size=batch_size,
                              data_parallel=1, output_path='')
    rng = np.random.RandomState(1)
    B, N = batch_size, n_points
    T = cfg.past_frames + cfg.future_frames
    M = 2 * n_points  # target budget: 2 * n_points (data.py:83 semantics).
    E = 9 if data_kind == 'greater' else 11
    half = cfg.cr_cube_bounds
    tgt = np.zeros((B, T, M, E), np.float32)
    tgt[..., :3] = rng.rand(B, T, M, 3) * 2.0 * half - half
    tgt[..., 2] = np.abs(tgt[..., 2])
    if data_kind == 'greater':
        tgt[..., 5:8] = rng.rand(B, T, M, 3)
    else:  # CARLA layout: inst 4, segm 5, view 6, rgb 7:10.
        tgt[..., 4] = rng.randint(0, 50, (B, T, M))
        tgt[..., 5] = rng.randint(0, 23, (B, T, M))
        tgt[..., 6] = rng.randint(0, 4, (B, T, M))
        tgt[..., 7:10] = rng.rand(B, T, M, 3)
    # Production valo capacity differs per dataset (greater.py:33 /carla.py:31);
    # the ivalo bias compares instances against all R slots, so R must match.
    R = 32 if data_kind == 'greater' else 256
    batch = dict(
        pcl_input=(rng.rand(B, N, 8) * 2 - 1).astype(np.float32),
        pcl_target=tgt, pcl_target_valid=np.ones((B, T, M), bool),
        valo_ids=np.tile(np.arange(R, dtype=np.int32), (B, 1)),
        num_valo_ids=np.full((B,), 8, np.int32))

    mesh = make_mesh(1)
    trainer = Trainer(cfg, data_kind, mesh=mesh)
    trainer.init_state(batch, steps_per_epoch=100)
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    state, m = trainer._train_step(trainer.state, sharded, key)  # compile.
    _sync(m['total_loss'])
    best = float('inf')
    for _ in range(trials):
        t0 = time.time()
        for _ in range(steps):
            state, m = trainer._train_step(state, sharded, key)
        _sync(m['total_loss'])
        best = min(best, (time.time() - t0) / steps)
    return best * 1000.0


def _loader_overlap_bench(cfg, batch_size=4, steps=6):
    '''Overlapped host-loader + train-step throughput through the PRODUCTION
    data plane (VERDICT r3 item 1: every other TPU number here skips the
    loader). Generates a gv1-scale synthetic GREATER tree once under /tmp,
    runs the production Loader (thread pool) feeding real train steps, and
    returns the PhaseTimer split + examples/s + an implied loader-core budget.

    Context for reading the numbers on THIS host: the container exposes ONE
    CPU core (PERFLOG data-plane note), so the loader cannot scale here; the
    deliverable is the measured split + per-core supply, from which the
    many-core production budget follows (cores ~= step_demand * s_per_example).
    '''
    import dataclasses
    import jax
    from occlusions4d_tpu.data import synthetic
    from occlusions4d_tpu.data.loader import create_train_val_loaders
    from occlusions4d_tpu.train import Trainer
    from occlusions4d_tpu.utils.logvis import StepLogger

    root = '/tmp/o4d_bench_greater'
    if not os.path.isdir(os.path.join(root, 'train')):
        synthetic.make_greater_dataset(root, num_scenes=2,
                                       stages=('train', 'val'),
                                       num_views=3, num_frames=24,
                                       image_size=320)
    cfg = dataclasses.replace(
        cfg, n_data_rnd=65536, batch_size=batch_size, data_parallel=1,
        num_workers=2, data_path=root, output_path='', viz_interval=10 ** 9,
        use_data_frac=-2.0, seed=3)
    logger = StepLogger(context='bench')
    # bench.py's stdout contract is ONE JSON line; reroute the epoch-loop
    # logging (losses, phase timing) to stderr.
    import logging
    import sys
    for h in logger.logger.handlers:
        if type(h) is logging.StreamHandler:  # not FileHandler subclasses.
            h.setStream(sys.stderr)
    data_kind, train_loader, val_loader, _ = create_train_val_loaders(cfg, logger)
    try:
        ds = train_loader.dataset
        ds.set_epoch(0)
        _ = ds[0]  # warm caches (PNG decode buffers, native lib load).
        times = []
        for i in range(3):
            t0 = time.time()
            _ = ds[i]
            times.append(time.time() - t0)
        ex_s = min(times)

        trainer = Trainer(cfg, data_kind, logger=logger)
        example = next(iter(train_loader.epoch(0)))
        trainer.init_state(example, steps_per_epoch=100)
        trainer.run_epoch(0, 'train', train_loader.epoch(0), num_steps=steps)
        # Second window = steady state (first paid the step compile).
        t0 = time.time()
        trainer.run_epoch(1, 'train', train_loader.epoch(1), num_steps=steps)
        wall = time.time() - t0
        summ = trainer.last_phase_timer.summary()
        data_s = summ.get('data', (0, 0, 0))[0]
        h2d_s = summ.get('h2d', (0, 0, 0))[0]
        step_demand = steps * batch_size / max(wall - data_s, 1e-9)
        return {
            'loader_s_per_example': round(ex_s, 3),
            'overlapped_examples_per_s': round(steps * batch_size / wall, 2),
            'data_pct_of_wall': round(data_s / wall * 100.0, 1),
            'h2d_pct_of_wall': round(h2d_s / wall * 100.0, 1),
            'step_demand_examples_per_s': round(step_demand, 2),
            'implied_loader_cores': round(step_demand * ex_s, 1),
            'host_cores': os.cpu_count(),
            'batch_size': batch_size,
        }
    finally:
        train_loader.close()
        val_loader.close()


def _eval_overlap_bench(cfg, enc_args, dec_args, params, num_sample=131072):
    '''End-to-end PRODUCTION eval-loop throughput (VERDICT r4 item 2: the
    dense-eval headline is encode+decode only; a real test_driver step adds
    track reruns, host 1-NN GT labels, metrics, compress_air, and pcl_io
    pickle export). Saves the bench models as a native checkpoint, then runs
    the full CLI path (load_models -> backfill -> test loader -> run_test with
    track_mode=all + save_metrics + save_gt + store_pcl) over 2 synthetic
    gv1-scale scene steps and reports per-scene wall + the measured phase
    split (step 0 = compile/warmup, step 1 = steady state).

    Scoped for the tunneled-TPU bench host: D2H here runs at ~14 MB/s, so a
    524288-query frame pays ~2 min of pure transfer that a PCIe-attached TPU
    host serves in <0.1 s (measured Aug 20: 9-11 min/scene at 524288, >95 %
    tunnel D2H). num_sample=131072 keeps every production phase exercised at
    1/4 transfer volume; the tunnel_d2h_s estimate in the result separates
    the environment artifact from real host work.'''
    import dataclasses
    import shutil

    from occlusions4d_tpu import checkpoint as ckpt_lib
    from occlusions4d_tpu.config import test_args as parse_test_args
    from occlusions4d_tpu.data import synthetic
    from occlusions4d_tpu.data.loader import _train_dset_args
    from occlusions4d_tpu.evaluate import test_driver
    from occlusions4d_tpu.utils.logvis import StepLogger

    root = '/tmp/o4d_bench_greater'
    if not os.path.isdir(os.path.join(root, 'train')):
        synthetic.make_greater_dataset(root, num_scenes=2,
                                       stages=('train', 'val'),
                                       num_views=3, num_frames=24,
                                       image_size=320)
    # Checkpoint in the exact Trainer.save layout so load_models rebuilds the
    # engine from stored ctor args (the production resume path).
    ckpt_dir = '/tmp/o4d_bench_eval_ckpt'
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    train_cfg = dataclasses.replace(cfg, data_path=root)
    out_dir = '/tmp/o4d_bench_eval_logs'
    shutil.rmtree(out_dir, ignore_errors=True)
    # log_dir: store_pcl/save_metrics write real artifacts (the measured cost).
    logger = StepLogger(log_dir=os.path.join(out_dir, 'run'),
                        context='bench_eval')
    import logging
    import sys
    for h in logger.logger.handlers:
        if type(h) is logging.StreamHandler:
            h.setStream(sys.stderr)
    meta = dict(config=vars(train_cfg), encoder_args=enc_args,
                decoder_args=dec_args,
                sampler_args={}, data_kind='greater',
                dset_args=_train_dset_args(train_cfg, 'greater', logger))
    ckpt_lib.save_checkpoint(ckpt_dir, 0, {'params': params}, meta=meta)

    targs = parse_test_args([
        '--resume', ckpt_dir, '--data_path', os.path.join(root, 'val'),
        '--num_sample', str(num_sample), '--point_sample_mode', 'grid',
        '--implicit_batch_size', '32768', '--track_mode', 'all',
        '--save_metrics', 'true', '--save_gt', 'true',
        '--use_json', 'false', '--num_workers', '1', '--seed', '5',
        '--log_path', os.path.join(out_dir, 'run'),
        # 2 val scenes x multiplier 60 x 0.017 = 2 scene steps: step 0 pays
        # the compiles, step 1 is the steady-state measurement.
        '--use_data_frac', '0.017',
    ])
    t0 = time.time()
    summary = test_driver.main(targs, logger=logger)
    wall = time.time() - t0
    split = summary['phase_split_s']
    frames_per_scene = cfg.past_frames + cfg.future_frames
    n_scenes = max(len(summary['per_frame']) // frames_per_scene, 1)
    device_s = split.get('device_infer', 0.0)
    # dispatch_wall/finish_wall are umbrella spans over the same seconds the
    # component phases (device_infer/gt_nn1/host_post/...) already count —
    # d2h_fetch likewise is a subset of device_infer — and in pipelined mode
    # (--eval_overlap) the post phases overlap dispatch, so 'accounted' is
    # host+device work, not wall.
    accounted = sum(v for k, v in split.items()
                    if k not in ('infer_wall', 'dispatch_wall', 'finish_wall',
                                 'd2h_fetch'))
    scene_walls = summary.get('scene_wall_s', [])
    # Steady state = last scene step (step 0 absorbs compiles/warmup).
    steady = scene_walls[-1] if len(scene_walls) > 1 else wall / n_scenes
    # Environment artifact estimate: bytes fetched per scene over the ~14 MB/s
    # axon tunnel — each track rerun fetches its own full implicit output
    # (multi_track_merge input), so the volume scales with 1 + reruns. A PCIe
    # host moves the same bytes in <0.1 s; subtract to approximate on-host
    # eval cost.
    tunnel_d2h_s = (frames_per_scene * (1.0 + summary['track_reruns_mean'])
                    * num_sample * 14 * 4 / 14e6)
    return {
        'eval_s_per_scene': round(wall / n_scenes, 2),
        'steady_s_per_scene': round(steady, 2),
        'steady_s_per_scene_excl_tunnel': round(max(steady - tunnel_d2h_s,
                                                    0.0), 2),
        'tunnel_d2h_s_per_scene_est': round(tunnel_d2h_s, 2),
        'scenes_per_hour_steady': round(3600.0 / max(steady, 1e-9), 1),
        'scene_wall_s': scene_walls,
        'num_sample': num_sample,
        'n_scenes': n_scenes,
        'track_reruns_mean': summary['track_reruns_mean'],
        'frames_per_scene': frames_per_scene,
        'device_pct_of_accounted': round(device_s / max(accounted, 1e-9)
                                         * 100.0, 1),
        'phase_split_s': split,
        'wall_s': round(wall, 2),
    }


def main():
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.config import TrainConfig, verify_args
    from occlusions4d_tpu.models import factory
    from occlusions4d_tpu.evaluate.inference import InferenceEngine, squash_eval
    from occlusions4d_tpu.ops import blind_points_device

    cfg = TrainConfig(n_points=14336, pt_feat_dim=36, up_down_blocks=3,
                      transition_factor=3, pt_num_neighbors=16, down_neighbors=12,
                      global_size=128, implicit_mlp_blocks=6, cross_attn_layers=2,
                      cross_attn_neighbors=14, cr_attn_type='c',
                      color_mode='rgb_nosigmoid', tracking_lw=1.0, color_lw=1.0,
                      video_len=12, frame_skip=2, pt_cube_bounds=5.0,
                      cr_cube_bounds=5.0, past_frames=4)
    verify_args(cfg, is_train=True)
    _progress('building gv1 models')
    encoder, decoder, enc_args, dec_args = factory.build_models(
        cfg, 'greater', fps_random_start=False)

    rng = np.random.RandomState(0)
    pcl = jnp.asarray(rng.rand(1, 14336, 8).astype(np.float32) * 2.0 - 1.0)
    # Params are independent of the point count: init at small N (full-scale init
    # would run the FPS loop eagerly, taking minutes), then jit-apply at full scale.
    pcl_small = pcl[:, :512]
    enc_vars = jax.jit(encoder.init)(jax.random.PRNGKey(0), pcl_small)
    abstract_s, fg_s, _ = jax.jit(encoder.apply)(enc_vars, pcl_small)
    q0 = jnp.zeros((1, 128, 4), jnp.float32)
    dec_vars = jax.jit(decoder.init)(jax.random.PRNGKey(1), q0, abstract_s, fg_s)

    loaded = dict(encoder=encoder, decoder=decoder,
                  params=dict(encoder=enc_vars, decoder=dec_vars))
    engine = InferenceEngine(loaded, color_mode=cfg.color_mode,
                             predict_segmentation=False, semantic_classes=13,
                             track_mode='none', implicit_batch_size=32768,
                             query_parallel=-1)

    # Queries are generated on device (the scene is defined by static bounds):
    # a tunneled TPU moves host data at ~14 MB/s, which would swamp compute.
    queries = blind_points_device(524288, -1.0, 5.0, 3, 'greater', 4, 'grid')
    n_queries = queries.shape[0]
    n_chips = engine.mesh.devices.size

    _progress('warmup: compiling encoder + full decode scan')
    # Warmup (compile encoder + the full-shape chunked decode scan; a partial
    # query set would compile a different scan length and leave the timed reps
    # paying a recompile).
    abstract, fg = engine.encode(pcl)
    out = engine.decode_all(queries, abstract, fg)
    _sync(out)

    # Encoder forward timing (tracked metric 2): dispatch reps, one sync; best of
    # 3 trials (the tunnel adds sporadic multi-100ms stalls to any one window).
    _progress('timing encoder forward')
    trials = []
    for _ in range(3):
        reps_e = 10
        t0 = time.time()
        for _ in range(reps_e):
            abstract, fg = engine.encode(pcl)
        _sync(fg)
        trials.append((time.time() - t0) / reps_e * 1000.0)
    enc_ms = min(trials)

    # Full dense scene: encode + all query chunks (tracked metric 1 / north star).
    # Best of 3 windows: the tunnel (and any concurrent host load) injects
    # sporadic multi-100ms stalls into individual windows.
    _progress('timing dense scene')
    reps = 3
    scene_trials = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            abstract, fg = engine.encode(pcl)
            out = engine.decode_all(queries, abstract, fg)
        _sync(out)
        scene_trials.append((time.time() - t0) / reps)
    scene_s = min(scene_trials)
    qps_chip = n_queries / scene_s / n_chips

    # Train-step latency (driver-witnessed README numbers): gv1 scale and the
    # BASELINE.json scale-out config n_points=57344, one chip, f32, B=1.
    # Each config is guarded by the soft deadline (a cold compile through the
    # remote-compile tunnel takes minutes per config; the headline metric must
    # survive a bounded run).
    def _maybe_train(fn):
        if time.time() - _T0 > _TRAIN_DEADLINE_S:
            return None
        try:
            return round(fn(), 1)
        except Exception as exc:  # A failed extra must not lose the headline.
            import sys
            print(f'train-step extra failed: {exc!r}', file=sys.stderr)
            return None

    _progress('train step gv1 (compile may take minutes)')
    train_gv1_ms = _maybe_train(lambda: _time_train_step(cfg, n_points=14336))
    _progress('train step n57344')
    train_57k_ms = _maybe_train(lambda: _time_train_step(cfg, n_points=57344))

    # cv1 (CARLA, /root/reference/README.md:41): layer norm, abstract_levels 2
    # (2124-point abstract cloud in the decoder), 13 semantic classes, and the
    # full low_moving_ivalo_sembal sampler bias mixture.
    import dataclasses
    cv1 = dataclasses.replace(
        cfg, pt_norm_type='layer', segmentation_lw=0.6, color_lw=0.0,
        tracking_lw=0.0, frame_skip=3, pt_cube_bounds=20.0, cr_cube_bounds=16.0,
        cube_mode=4, abstract_levels=2, semantic_classes=13,
        point_sample_bias='low_moving_ivalo_sembal', air_sampling_ratio=1.4)
    verify_args(cv1, is_train=True)
    _progress('train step cv1 (carla)')
    train_cv1_ms = _maybe_train(
        lambda: _time_train_step(cv1, n_points=14336, data_kind='carla'))

    _progress('overlapped loader+step throughput (production data plane)')
    loader_stats = None
    if time.time() - _T0 <= _TRAIN_DEADLINE_S:
        try:
            loader_stats = _loader_overlap_bench(cfg)
        except Exception as exc:
            import sys
            print(f'loader-overlap extra failed: {exc!r}', file=sys.stderr)

    _progress('end-to-end production eval loop (track reruns + host post)')
    eval_stats = None
    if time.time() - _T0 <= _TRAIN_DEADLINE_S:
        try:
            eval_stats = _eval_overlap_bench(
                cfg, enc_args, dec_args,
                dict(encoder=enc_vars, decoder=dec_vars))
        except Exception as exc:
            import sys
            print(f'eval-overlap extra failed: {exc!r}', file=sys.stderr)

    result = {
        'metric': 'dense_scene_524288_grid_queries_latency',
        'value': round(scene_s * 1000.0, 1),
        'unit': 'ms',
        'vs_baseline': round(2000.0 / (scene_s * 1000.0), 3),
        'extra': {
            'queries_per_sec_per_chip': round(qps_chip, 0),
            'encoder_fwd_ms_n14336': round(enc_ms, 1),
            'n_chips': n_chips,
            'actual_grid_queries': int(n_queries),
            'implicit_batch_size': 32768,
            # Fused-VJP decoder path (bf16 kernels), f32 params/optimizer.
            # None = skipped by the soft deadline, not a failure.
            'train_step_ms_gv1_b1': train_gv1_ms,
            'train_step_ms_n57344_b1': train_57k_ms,
            'train_step_ms_cv1_b1': train_cv1_ms,
            # Production-data-plane overlapped throughput (None = skipped by
            # the soft deadline or a failed extra). NOTE this container has
            # one CPU core; implied_loader_cores is the production budget.
            'loader_overlap': loader_stats,
            # Full production eval loop (None = skipped/failed extra).
            'eval_overlap': eval_stats,
            'output_checksum': float(jnp.mean(out)),  # device-side reduce.
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
