'''
Exact k-nearest-neighbor search, TPU-native.

The reference implementation materializes a dense (N, M) distance matrix and argsorts it
(/root/reference/model/point_transformer_layer.py:76-99 `kNN_torch`;
/root/reference/utils/geometry.py:458-503 `my_knn_torch`), which is the stated ~48 GB
GPU-memory hot spot (/root/reference/README.md:46). On TPU the memory problem solves
itself at reference scales: XLA fuses the distance computation (one MXU matmul,
|q|^2 + |k|^2 - 2 q.k^T) directly into top_k's partial reduction, so the (N, M) matrix
is never resident and the whole search runs at matmul speed. For key sets beyond the
dense budget, keys are streamed in blocks through a `lax.scan` with a running sorted
top-k merge, bounding peak memory at O(N * (block + k)) regardless of M (the argsort
replacement that lets n_points scale past the reference's 48 GB wall).

Semantics match the reference:
  * neighbors are returned sorted ascending by Euclidean distance;
  * ties break toward the lower key index (torch `topk(largest=False)` / `argsort`
    behavior) because `lax.top_k` prefers earlier positions and blocks are scanned in
    index order with the running result concatenated first.
'''

import functools

import jax
import jax.numpy as jnp

__all__ = ['knn', 'pairwise_sqdist', 'gather_neighbors', 'nn1_min_dist',
           'nn1_bidirectional']

_FILL = jnp.float32(jnp.inf)
# Per-example dense (N, M) element budget: 2^28 f32 = 1 GiB transient, well within
# HBM and usually fused away entirely (never materialized).
_DENSE_BUDGET = 2 ** 28


def pairwise_sqdist(query, keys):
    '''
    Squared Euclidean distances between two point sets via one MXU contraction.
    :param query (..., N, C) array.
    :param keys (..., M, C) array.
    :return (..., N, M) array of squared distances (clamped to >= 0).
    '''
    q2 = jnp.sum(jnp.square(query), axis=-1, keepdims=True)          # (..., N, 1).
    k2 = jnp.sum(jnp.square(keys), axis=-1, keepdims=True)           # (..., M, 1).
    # precision='highest' keeps the contraction in full f32 on TPU (default would use
    # bf16 passes, whose ~1e-2 relative error reorders near-tied neighbors). The inner
    # dimension is only 3, so this matmul is HBM-bound and the precision is free.
    qk = jnp.einsum('...nc,...mc->...nm', query, keys,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)             # (..., N, M).
    d2 = q2 + jnp.swapaxes(k2, -1, -2) - 2.0 * qk
    return jnp.maximum(d2, 0.0)


def _merge_topk(run_d, run_i, blk_d, blk_i, k):
    '''Merge a running sorted top-k with new candidates; running entries win ties.'''
    cat_d = jnp.concatenate([run_d, blk_d], axis=-1)
    cat_i = jnp.concatenate([run_i, blk_i], axis=-1)
    neg_d, pos = jax.lax.top_k(-cat_d, k)
    return -neg_d, jnp.take_along_axis(cat_i, pos, axis=-1)


@functools.partial(jax.jit, static_argnums=(2,), static_argnames=('block_size', 'euclidean'))
def _knn_batched(query, keys, k, key_mask=None, block_size=4096, euclidean=True):
    '''Core kNN over (B, N, 3) queries and (B, M, 3) keys.

    Path selection (measured on v5e): the dense distances + top_k formulation is
    fused by XLA into a single matmul+partial-reduction pass and runs at
    speed-of-light (~0.06 ms at N=M=14336), while a lax.scan over key blocks
    defeats that fusion and is ~2000x slower. So dense is used whenever the
    (N, M) working set fits a memory budget, and the streaming path is reserved
    for key sets too large to materialize (> _DENSE_BUDGET elements per example).
    '''
    (B, N, _) = query.shape
    (_, M, _) = keys.shape
    assert k <= M, f'k={k} exceeds number of keys M={M}'

    query = query.astype(jnp.float32)
    keys = keys.astype(jnp.float32)

    if M <= block_size or N * M <= _DENSE_BUDGET:
        d2 = pairwise_sqdist(query, keys)                            # (B, N, M).
        if key_mask is not None:
            d2 = jnp.where(key_mask[:, None, :], d2, _FILL)
        neg_d, idx = jax.lax.top_k(-d2, k)
        dists = -neg_d
    else:
        num_blocks = -(-M // block_size)
        M_pad = num_blocks * block_size
        keys_p = jnp.pad(keys, ((0, 0), (0, M_pad - M), (0, 0)))
        mask_p = jnp.ones((B, M), bool) if key_mask is None else key_mask
        mask_p = jnp.pad(mask_p, ((0, 0), (0, M_pad - M)))
        keys_b = keys_p.reshape(B, num_blocks, block_size, 3).transpose(1, 0, 2, 3)
        mask_b = mask_p.reshape(B, num_blocks, block_size).transpose(1, 0, 2)

        def scan_body(carry, inp):
            run_d, run_i = carry
            blk_keys, blk_mask, blk_idx = inp
            d2 = pairwise_sqdist(query, blk_keys)                    # (B, N, block).
            d2 = jnp.where(blk_mask[:, None, :], d2, _FILL)
            neg_d, pos = jax.lax.top_k(-d2, k)                       # (B, N, k).
            blk_i = blk_idx * block_size + pos
            run_d, run_i = _merge_topk(run_d, run_i, -neg_d, blk_i, k)
            return (run_d, run_i), None

        init = (jnp.full((B, N, k), _FILL), jnp.zeros((B, N, k), jnp.int32))
        (dists, idx), _ = jax.lax.scan(
            scan_body, init,
            (keys_b, mask_b, jnp.arange(num_blocks, dtype=jnp.int32)))

    if euclidean:
        dists = jnp.sqrt(dists)
    return dists, idx.astype(jnp.int32)


# Above this many (N * M) distance entries, the Pallas kernel beats XLA's fused
# dense top_k on TPU (measured crossover ~2M on v5e; at 14336^2 it is 17x faster).
_PALLAS_MIN_ELEMS = 2 ** 21
# Above this, the plain kernel's O(K*N*M) VPU extraction dominates and the
# Hilbert-sorted bbox-pruned kernel wins despite its sort/unsort overhead
# (57344^2 self-attention: 117 -> 45 ms; 14336^2: 14.8 -> 13.1 ms).
_SPATIAL_MIN_ELEMS = 2 ** 27


def knn(query, keys, k, *, key_mask=None, block_size=4096, euclidean=True,
        use_pallas=None, spatial=None):
    '''
    For each query point, find the k nearest key points by 3D Euclidean distance.

    On TPU, large searches dispatch to the Pallas kernel (ops/pallas_knn.py: MXU
    distance tiles + on-core top-K extraction, never leaving VMEM); very large
    ones additionally Morton-sort both point sets and prune key blocks by
    bounding-box distance (exact; see knn_pallas_spatial). Small searches use
    the dense XLA formulation which fuses completely. Off-TPU always uses XLA.
    :param query (..., N, C>=3) array: only the first 3 channels (x, y, z) are used.
    :param keys (..., M, C>=3) array: only the first 3 channels are used.
    :param k (int): number of neighbors.
    :param key_mask (..., M) bool array: invalid keys are never returned as neighbors.
    :param block_size (int): key streaming block of the XLA fallback for key sets
        beyond the dense budget.
    :param euclidean (bool): return Euclidean (True) or squared (False) distances.
    :param use_pallas (bool or None): force a path; None auto-selects.
    :param spatial (bool or None): force/forbid the Morton-pruned kernel; None
        auto-selects by N * M.
    :return (dists (..., N, k), idx (..., N, k)): ascending by distance.
    '''
    same = query is keys  # before slicing: self-attention reuses one sort.
    query = jnp.asarray(query)[..., :3]
    keys = jnp.asarray(keys)[..., :3]
    batch_shape = query.shape[:-2]
    N, M = query.shape[-2], keys.shape[-2]
    q = query.reshape((-1, N, 3))
    kk = keys.reshape((-1, M, 3))
    km = None if key_mask is None else jnp.asarray(key_mask).reshape((-1, M))

    if use_pallas is None:
        use_pallas = (jax.default_backend() == 'tpu' and k <= 32
                      and N * M >= _PALLAS_MIN_ELEMS)
    if use_pallas:
        if spatial is None:
            spatial = N * M >= _SPATIAL_MIN_ELEMS
        if spatial:
            from .pallas_knn import knn_pallas_spatial
            dists, idx = knn_pallas_spatial(q, kk, k, key_mask=km,
                                            euclidean=euclidean, same=same)
        else:
            from .pallas_knn import knn_pallas
            dists, idx = knn_pallas(q, kk, k, key_mask=km, euclidean=euclidean)
    else:
        dists, idx = _knn_batched(q, kk, k, key_mask=km, block_size=block_size,
                                  euclidean=euclidean)
    return (dists.reshape(batch_shape + (N, k)), idx.reshape(batch_shape + (N, k)))


def gather_neighbors(values, idx):
    '''
    Gather per-neighbor features: the TPU analogue of the reference's `index_points`
    (/root/reference/model/point_transformer_layer.py:102-113).
    :param values (..., M, D) array.
    :param idx (..., N, K) int array with entries in [0, M).
    :return (..., N, K, D) array.
    '''
    return jnp.take_along_axis(values[..., None, :, :], idx[..., :, :, None],
                               axis=-2)


def nn1_min_dist(query, keys, *, key_mask=None, block_size=8192):
    '''
    Distance from each query to its single nearest key. Streaming equivalent of the
    reference's sliced `filter_air_solid_gap` 1-NN pass
    (/root/reference/utils/geometry.py:1164-1196) whose slice budget existed purely for
    GPU memory; here blocking handles that.
    :return (..., N) Euclidean distances.
    '''
    d, _ = knn(query, keys, 1, key_mask=key_mask, block_size=block_size)
    return d[..., 0]


def nn1_bidirectional(a, b, *, a_mask=None, b_mask=None):
    '''
    Both directions of exact 1-NN between two point sets in ONE pass over the
    distance matrix: dist_a[i] = min over valid b of |a_i - b_j|, and
    dist_b[j] = min over valid a of |a_i - b_j|. Two nn1_min_dist calls would
    build the (N, M) tile twice; the sampler's dynamic-region ('moving') masks
    need exactly this pair per frame (geometry.py:697-728 — which the reference
    approximates on a shuffled slice; this is the full-cloud exact version).
    :param a (..., N, C>=3); b (..., M, C>=3): only (x, y, z) is used.
    :param a_mask (..., N) bool or None: invalid a-points never act as keys.
    :param b_mask (..., M) bool or None: likewise for b.
    :return (dist_a (..., N), dist_b (..., M)) f32 Euclidean distances.
    '''
    from .pallas_knn import nn1_bidir_pallas
    a = jnp.asarray(a)[..., :3]
    b = jnp.asarray(b)[..., :3]
    batch_shape = a.shape[:-2]
    N, M = a.shape[-2], b.shape[-2]
    am = None if a_mask is None else jnp.asarray(a_mask).reshape((-1, N))
    bm = None if b_mask is None else jnp.asarray(b_mask).reshape((-1, M))
    d_a, d_b = nn1_bidir_pallas(a.reshape((-1, N, 3)), b.reshape((-1, M, 3)),
                                a_mask=am, b_mask=bm)
    return d_a.reshape(batch_shape + (N,)), d_b.reshape(batch_shape + (M,))
