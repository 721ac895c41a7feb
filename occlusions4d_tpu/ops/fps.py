'''
Farthest point sampling (FPS), TPU-native.

The reference relies on the `torch_cluster.fps` CUDA kernel
(/root/reference/model/modules.py:133-134; /root/reference/utils/geometry.py:360-361).
FPS is inherently sequential (each pick is an argmax over a running min-distance field),
so here the running field lives on-device and the loop is a `lax.fori_loop`; the per-step
work is a fused distance update + masked argmax over N lanes, which XLA keeps entirely
in registers/VMEM. A Pallas variant is provided in ops/pallas_fps.py for large N.

Semantics:
  * `n_out = ceil(N / factor)` points are chosen, matching torch_cluster's
    `ratio=1/factor` behavior used by DownTransition (/root/reference/model/modules.py:126-135).
  * `start_idx=0` gives the deterministic mode used at inference
    (`fps_random_start=False`, /root/reference/eval/inference.py:58-59); training passes a
    random start per example.
  * Returned indices are sorted ascending, mirroring `torch.sort(inds)` at
    /root/reference/model/modules.py:135 so downstream gathers keep original point order.
'''

import functools

import jax
import jax.numpy as jnp

__all__ = ['fps', 'fps_batched', 'random_start_indices']


@functools.partial(jax.jit, static_argnums=(1, 4))
def _fps_single(xyz, n_out, valid=None, start_idx=0, sort_result=True):
    '''
    :param xyz (N, 3) array.
    :param n_out (int, static).
    :param valid (N) bool array or None: invalid points are never selected.
    :param start_idx scalar int: first selected point.
    :return idx (n_out,) int32.
    '''
    (N, _) = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((N,), bool)
    # Invalid points can never win the argmax.
    neg_inf = jnp.float32(-jnp.inf)

    start_idx = jnp.asarray(start_idx, jnp.int32)
    sel0 = jnp.zeros((n_out,), jnp.int32).at[0].set(start_idx)

    def body(i, state):
        min_d, sel = state
        last = sel[i - 1]
        d = jnp.sum(jnp.square(xyz - xyz[last]), axis=-1)            # (N,).
        min_d = jnp.minimum(min_d, d)
        scores = jnp.where(valid, min_d, neg_inf)
        nxt = jnp.argmax(scores).astype(jnp.int32)
        return (min_d, sel.at[i].set(nxt))

    init_d = jnp.full((N,), jnp.float32(jnp.inf))
    (_, sel) = jax.lax.fori_loop(1, n_out, body, (init_d, sel0))
    if sort_result:
        sel = jnp.sort(sel)
    return sel


def fps(xyz, n_out, *, valid=None, start_idx=0, sort_result=True):
    '''
    Farthest point sampling of a single point cloud.
    :param xyz (N, C>=3) array (only xyz channels used).
    :param n_out (int): number of points to select (static).
    :param valid (N) bool array or None.
    :param start_idx (int scalar): deterministic if 0; pass a random index for the
        training-time `fps_random_start=True` behavior.
    :return (n_out,) int32 indices, sorted ascending when sort_result.
    '''
    return _fps_single(jnp.asarray(xyz)[..., :3], n_out, valid, start_idx, sort_result)


def fps_batched(xyz, n_out, *, valid=None, start_idx=None, sort_result=True,
                use_pallas=None):
    '''
    Batched FPS. On TPU this dispatches to the Pallas kernel (ops/pallas_fps.py:
    whole loop on-core, ~2.5x faster at n=14336); elsewhere it vmaps the XLA
    fori_loop version. Both produce identical indices.
    :param xyz (B, N, C) array.
    :param start_idx (B,) int array or None (deterministic start 0).
    :param use_pallas (bool or None): force a path; None auto-selects by backend.
    :return (B, n_out) int32 indices.
    '''
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if use_pallas:
        from .pallas_fps import fps_pallas_batched
        return fps_pallas_batched(xyz, n_out, valid=valid, start_idx=start_idx,
                                  sort_result=sort_result)
    xyz = jnp.asarray(xyz)[..., :3]
    B = xyz.shape[0]
    if start_idx is None:
        start_idx = jnp.zeros((B,), jnp.int32)
    if valid is None:
        fn = lambda p, s: _fps_single(p, n_out, None, s, sort_result)
        return jax.vmap(fn)(xyz, start_idx)
    fn = lambda p, v, s: _fps_single(p, n_out, v, s, sort_result)
    return jax.vmap(fn)(xyz, valid, start_idx)


def random_start_indices(key, batch, n_points, valid=None):
    '''Random FPS start per example (`fps_random_start=True` training behavior).'''
    if valid is None:
        return jax.random.randint(key, (batch,), 0, n_points, dtype=jnp.int32)
    # Pick uniformly among valid points via the Gumbel-argmax trick.
    g = jax.random.gumbel(key, (batch, n_points))
    score = jnp.where(valid, g, -jnp.inf)
    return jnp.argmax(score, axis=-1).astype(jnp.int32)
