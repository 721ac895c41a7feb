'''
Batching + double-buffered prefetch, and the loader factory that picks GREATER vs
CARLA by path (parity with /root/reference/data/data.py).

The reference uses torch DataLoader worker *processes*; here a background prefetch
thread assembles fixed-shape numpy batches while the device computes (the TPU host
only needs to stay ahead of one step; device transfer happens in the train loop via
parallel.shard_batch).
'''

import collections
import itertools
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

from .greater import GreaterDataset
from .carla import CarlaDataset

__all__ = ['Loader', 'collate', 'create_train_val_loaders', 'create_test_loader']

# Fork-inherited datasets for process workers. Each process-mode Loader
# registers its dataset under a unique key in the parent BEFORE forking its
# pool; children resolve the key from their fork-inherited copy of the
# registry (no pickling of the dataset, multiprocessing.Array-backed counters
# stay genuinely shared, and concurrently-iterated loaders cannot clobber each
# other the way a single module-level slot could).
_FORK_REGISTRY = {}
_FORK_KEYS = itertools.count()
_WORKER_DATASET = None


def _proc_worker_init(key):
    global _WORKER_DATASET
    _WORKER_DATASET = _FORK_REGISTRY[key]


def _proc_get(epoch, index):
    ds = _WORKER_DATASET
    if hasattr(ds, 'set_epoch'):
        ds.set_epoch(epoch)
    return ds[index]

_STACK_KEYS = ('pcl_input', 'pcl_input_sem', 'pcl_target', 'pcl_target_valid',
               'valo_ids', 'num_valo_ids', 'cam_RT', 'cam_K', 'rgb', 'depth',
               'flat', 'snitch')


def collate(examples):
    '''Stack array fields; collect meta_data dicts in a list.'''
    batch = {}
    for key in _STACK_KEYS:
        if key in examples[0]:
            batch[key] = np.stack([ex[key] for ex in examples])
    batch['meta_data'] = [ex['meta_data'] for ex in examples]
    return batch


class Loader:
    '''Epoch-based iterable with shuffling, drop_last, and prefetch.

    num_workers > 1 decodes examples through a worker pool. worker_mode:
      * 'thread' (default): a thread pool - the hot host ops (C++ FPS/kNN via
        ctypes, PIL decode, most numpy) release the GIL, and shared state like
        the occlusion-bias counter needs no multiprocessing machinery.
      * 'process': fork-based worker processes, the reference's DataLoader
        model (/root/reference/data/data.py:62-67) - full parallelism for the
        Python-level portions of example decoding on many-core hosts. The
        dataset is inherited via fork (never pickled); occlusion-bias counters
        must be constructed with shared_counters=True so all workers see one
        multiprocessing.Array board. The pool is forked EAGERLY at Loader
        construction (a warm-up submit pins every worker fork to __init__,
        which Python 3.12's fork-context executor otherwise defers to the
        first real submit) and reused across epochs - so building loaders
        before the Trainer in train.main means no fork ever happens after the
        JAX/TPU runtime holds threads. Call close() (or drop the Loader) to
        release the pool.
    Per-example RNG is derived from (seed, epoch, index) in both modes, so the
    produced batches are bit-identical across worker modes and counts; batches
    are always yielded in deterministic index order regardless of worker
    completion order.
    '''

    def __init__(self, dataset, batch_size, shuffle=True, drop_last=True,
                 prefetch=2, seed=0, num_workers=0, worker_mode='thread'):
        assert worker_mode in ('thread', 'process')
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.num_workers = num_workers
        self.worker_mode = worker_mode
        self._pool = None
        self._fork_key = None
        if worker_mode == 'process' and num_workers > 1:
            self._start_process_pool()

    def _start_process_pool(self):
        import multiprocessing
        self._fork_key = next(_FORK_KEYS)
        _FORK_REGISTRY[self._fork_key] = self.dataset
        self._pool = ProcessPoolExecutor(
            self.num_workers,
            mp_context=multiprocessing.get_context('fork'),
            initializer=_proc_worker_init, initargs=(self._fork_key,))
        # Force the forks NOW: with a fork context, CPython launches all
        # max_workers processes on the first submit (never on demand), so one
        # warm-up task makes construction the fork point.
        self._pool.submit(int, 0).result()

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None
        if self._fork_key is not None:
            _FORK_REGISTRY.pop(self._fork_key, None)
            self._fork_key = None

    def __del__(self):
        self.close()

    @property
    def steps_per_epoch(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch_idx=0):
        if hasattr(self.dataset, 'set_epoch'):
            self.dataset.set_epoch(epoch_idx)  # per-(seed, epoch, index) RNG streams.
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch_idx).shuffle(order)
        steps = self.steps_per_epoch
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def batches():
            for s in range(steps):
                idxs = order[s * self.batch_size:(s + 1) * self.batch_size]
                if len(idxs) < self.batch_size and self.drop_last:
                    return
                yield idxs

        def producer_serial():
            for idxs in batches():
                if stop.is_set():
                    return
                q.put(collate([self.dataset[int(i)] for i in idxs]))

        def producer_pool():
            window = self.num_workers + self.prefetch * self.batch_size
            own_pool = None
            if self.worker_mode == 'process':
                pool = self._pool  # persistent, forked at construction.
                submit = lambda i: pool.submit(_proc_get, epoch_idx, i)
            else:
                own_pool = ThreadPoolExecutor(self.num_workers)
                submit = lambda i: own_pool.submit(self.dataset.__getitem__, i)
            try:
                pending = collections.deque()   # (batch_futures) in order.
                batch_iter = iter(batches())
                inflight = 0

                def refill():
                    nonlocal inflight
                    while inflight < window:
                        idxs = next(batch_iter, None)
                        if idxs is None:
                            return False
                        futs = [submit(int(i)) for i in idxs]
                        pending.append(futs)
                        inflight += len(futs)
                    return True

                refill()
                while pending and not stop.is_set():
                    futs = pending.popleft()
                    q.put(collate([f.result() for f in futs]))
                    inflight -= len(futs)
                    refill()
            finally:
                if own_pool is not None:
                    own_pool.shutdown(wait=False, cancel_futures=True)

        def producer():
            try:
                if self.num_workers > 1:
                    producer_pool()
                else:
                    producer_serial()
            except Exception as e:  # surface loader errors to the consumer.
                q.put(e)
            finally:
                q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def _train_dset_args(cfg, data_kind, logger):
    '''Mirrors dset_args construction (/root/reference/data/data.py:30-97).'''
    n_target = -int(max(abs(cfg.n_points), abs(cfg.n_data_rnd)) * 2)
    base = dict(
        video_length=cfg.video_len, frame_skip=cfg.frame_skip,
        n_points_rnd=cfg.n_data_rnd, n_fps_input=cfg.n_points,
        n_fps_target=n_target,
        pcl_input_frames=cfg.video_len - cfg.future_frames,
        pcl_target_frames=cfg.past_frames + cfg.future_frames,
        sample_bias=cfg.sample_bias, sb_occl_frame_shift=cfg.sb_occl_frame_shift,
        min_z=cfg.min_z, other_bounds=cfg.pt_cube_bounds,
        use_data_frac=cfg.use_data_frac, verbose='dbg' in cfg.name,
        return_images=getattr(cfg, 'export_visuals', False))
    if data_kind == 'carla':
        reference_frame = (cfg.video_len - cfg.future_frames - 1
                           if cfg.correct_ego_motion else None)
        base.update(reference_frame=reference_frame,
                    correct_origin_ground=cfg.correct_origin_ground,
                    target_bounds=cfg.cr_cube_bounds, cube_mode=cfg.cube_mode,
                    oversample_vehped_target=cfg.oversample_vehped_target,
                    # Extension beyond the reference's zero-stub marks
                    # (data_carla.py:615-623): GREATER-style random-instance
                    # track supervision when the tracking objective is on.
                    track_mode='random' if cfg.tracking_lw > 0.0 else 'none')
    else:
        assert cfg.sample_bias in ('none', 'occl')
        base.update(convert_to_pcl=True, return_segm=True,
                    track_mode='random' if cfg.tracking_lw > 0.0 else 'none')
    return base


def create_train_val_loaders(cfg, logger):
    '''
    :return (data_kind, train_loader, val_aug_loader, dset_args).
    '''
    data_kind = 'carla' if 'carla' in cfg.data_path.lower() else 'greater'
    dset_args = _train_dset_args(cfg, data_kind, logger)
    cls = CarlaDataset if data_kind == 'carla' else GreaterDataset
    mode = getattr(cfg, 'worker_mode', 'thread')
    if mode == 'process':
        dset_args = dict(dset_args, shared_counters=True)
    train_dset = cls(cfg.data_path, logger, stage='train', seed=cfg.seed, **dset_args)
    val_dset = cls(cfg.data_path, logger, stage='val', seed=cfg.seed + 1, **dset_args)
    train_loader = Loader(train_dset, cfg.batch_size, shuffle=True, drop_last=True,
                          seed=cfg.seed, num_workers=cfg.num_workers,
                          worker_mode=mode)
    val_loader = Loader(val_dset, cfg.batch_size, shuffle=True, drop_last=True,
                        seed=cfg.seed + 1, num_workers=cfg.num_workers,
                        worker_mode=mode)
    return data_kind, train_loader, val_loader, dset_args


def create_test_loader(cfg, dset_args, logger):
    '''Test loader with checkpoint-stored dset_args + test-time overrides
    (/root/reference/data/data.py:114-157).'''
    dset_args = dict(dset_args)
    dset_args['ss_frame_step'] = cfg.ss_frame_step
    dset_args['n_fps_target'] = 0
    dset_args['use_data_frac'] = cfg.use_data_frac
    dset_args['sample_bias'] = cfg.sample_bias
    dset_args['sb_occl_frame_shift'] = cfg.sb_occl_frame_shift
    dset_args['verbose'] = 'dbg' in cfg.name
    dset_args['use_json'] = cfg.use_json

    # worker_mode='process' cannot be honored at test time: dset_args come from
    # the checkpoint, so load_models has ALREADY initialized the (multi-
    # threaded) JAX runtime by the time this loader can exist, and the Loader's
    # eager fork would then be exactly the fork-after-runtime hazard process
    # mode is designed to avoid. Fall back to threads; strip any train-time
    # shared_counters carried in the stored dset_args (no forks to share with).
    mode = getattr(cfg, 'worker_mode', 'thread')
    if mode == 'process':
        logger.warning('worker_mode=process is train-only (the test loader is '
                       'built after the JAX runtime initializes; forking now '
                       'could deadlock workers) - using threads.')
        mode = 'thread'
    dset_args['shared_counters'] = False

    data_kind = 'carla' if 'carla' in cfg.data_path.lower() else 'greater'
    if data_kind == 'carla':
        dset_args['oversample_vehped_target'] = False
        # Same test-time semantics as GREATER: 'all' is handled by inference
        # reruns, so the dataset itself must not mark (stored train dset_args
        # may carry track_mode='random').
        if cfg.track_mode in ('none', 'all'):
            dset_args['track_mode'] = 'none'
        dset = CarlaDataset(cfg.data_path, logger, stage='test', seed=cfg.seed,
                            **dset_args)
    else:
        assert cfg.sample_bias in ('none', 'occl')
        dset_args['force_view_idx'] = cfg.force_view_idx
        if cfg.track_mode in ('none', 'all'):
            dset_args['track_mode'] = 'none'  # 'all' is handled by inference reruns.
        dset = GreaterDataset(cfg.data_path, logger, stage='test', seed=cfg.seed,
                              **dset_args)
    loader = Loader(dset, 1, shuffle=False, drop_last=False, seed=cfg.seed,
                    num_workers=cfg.num_workers, worker_mode=mode)
    return data_kind, loader
