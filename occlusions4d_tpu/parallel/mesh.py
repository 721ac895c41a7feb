'''
Device mesh and sharding helpers: the TPU-native replacement for the reference's
torch.nn.DataParallel (/root/reference/train.py:285-306).

Parallelism layout:
  * 'dp' axis: batch dimension of training data and of dense eval query sets.
    Parameters are replicated; gradients are reduced by XLA-inserted all-reduce over
    ICI when the jitted train step consumes dp-sharded batches (the collective is
    derived from the sharding annotations - no hand-written NCCL/MPI analog).
  * Dense inference additionally shards the query-point axis across the same chips
    (the reference's implicit_batch_size chunking handles memory; sharding handles
    throughput).
'''

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'batch_sharding', 'replicated', 'shard_batch', 'P',
           'local_device_count']


def local_device_count():
    return len(jax.devices())


def make_mesh(num_devices=None, axis_name='dp'):
    '''
    1-D mesh over the fastest (ICI) axis. num_devices=None / -1 uses all local
    devices; 1 gives a trivial single-chip mesh (same code path everywhere).
    '''
    devs = jax.devices()
    if num_devices is None or num_devices < 0:
        num_devices = len(devs)
    assert num_devices <= len(devs), f'{num_devices} > {len(devs)} available'
    return Mesh(np.array(devs[:num_devices]), (axis_name,))


def batch_sharding(mesh, ndim, axis_name='dp'):
    '''NamedSharding splitting the leading axis, replicating the rest.'''
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name='dp'):
    '''Place a pytree of host arrays with the leading (batch) axis split over the
    mesh; rank-0 leaves are replicated. A top-level 'meta_data' entry (host-side
    bookkeeping, not per-device data) is passed through untouched. Leading dims must
    divide by mesh size (the loaders pad/draw accordingly).'''

    def place(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name))

    if isinstance(batch, dict) and 'meta_data' in batch:
        meta = batch['meta_data']
        rest = {k: v for k, v in batch.items() if k != 'meta_data'}
        out = jax.tree_util.tree_map(place, rest)
        out['meta_data'] = meta
        return out
    return jax.tree_util.tree_map(place, batch)
