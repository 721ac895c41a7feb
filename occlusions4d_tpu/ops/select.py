'''
Fixed-capacity selection primitives: the TPU-native replacement for every
dynamic-shape boolean-index / rejection-resample pattern in the reference.

  * take_valid      <-> boolean indexing followed by `select_safely` duplication
                        (/root/reference/utils/geometry.py:1095-1105)
  * masked_choice   <-> `torch.randint(0, pool.shape[0], (n,))` row sampling from a
                        boolean-filtered pool (geometry.py:859-906), done here without
                        compaction via a weighted inverse-CDF over the mask.
'''

import jax
import jax.numpy as jnp

__all__ = ['take_valid', 'masked_choice', 'valid_first_order']

# masked_choice searchsorted lowering crossover (see the in-function note):
# 'sort' wins the full train step at gv1's cdf length (28672), 'scan' wins at
# the 57k scale-out's (114688). 2^15 splits the two measured regimes.
_SEARCHSORTED_SORT_MAX_N = 32768

# Experiment override for the masked_choice searchsorted lowering:
# 'auto' = the measured gate below; 'sort'/'scan' force one jnp lowering;
# 'unrolled' = the branchless statically-unrolled binary search.
SEARCHSORTED_MODE = 'auto'


def _searchsorted_unrolled(cdf, u):
    '''searchsorted(cdf, u, side='right') as a statically-unrolled branchless
    binary search: log2(N) dependent gather+select steps with no XLA while
    loop (each `scan`-method while iteration costs ~0.7 ms of control-flow
    overhead through this backend) and no O(N log N) co-sort.'''
    import numpy as np
    n = cdf.shape[0]
    nbits = max(1, n.bit_length())  # answers live in [0, n]
    pos = jnp.zeros(u.shape, jnp.int32)
    for step in (1 << np.arange(nbits - 1, -1, -1)).astype(np.int32):
        cand = pos + jnp.int32(step)
        val = cdf[jnp.minimum(cand, n) - 1]
        pos = jnp.where((cand <= n) & (val <= u), cand, pos)
    return pos


def valid_first_order(valid):
    '''
    Stable permutation putting valid entries first.
    :param valid (N,) bool.
    :return (N,) int32 permutation indices.
    '''
    # argsort of (invalid, position) lexicographically; stable sort keeps order.
    return jnp.argsort(~valid, stable=True).astype(jnp.int32)


def take_valid(x, valid, n_out):
    '''
    Select the first `n_out` valid rows, duplicating valid rows cyclically when there
    are fewer than n_out (the reference's `select_safely` doubles the array until it is
    long enough, geometry.py:1095-1105 - the same multiset of rows, different order).
    :param x (N, D) array.
    :param valid (N,) bool.
    :param n_out (int, static).
    :return (rows (n_out, D), count): count = min(num_valid, n_out) genuinely distinct.
    '''
    order = valid_first_order(valid)
    cnt = jnp.sum(valid).astype(jnp.int32)
    safe = jnp.maximum(cnt, 1)
    pick = order[jnp.arange(n_out, dtype=jnp.int32) % safe]
    return x[pick], jnp.minimum(cnt, n_out)


def masked_choice(key, valid, n_draw, weights=None):
    '''
    Draw `n_draw` indices uniformly (or weighted) with replacement from the True
    positions of `valid`, without compacting. Equivalent to the reference pattern
    `pool = pcl[mask]; inds = randint(0, len(pool), (n,)); pool[inds]`
    but returning indices into the *original* array.
    :param key: PRNG key.
    :param valid (N,) bool.
    :param n_draw (int, static).
    :param weights (N,) float or None: relative weights (masked by valid).
    :return (idx (n_draw,) int32, ok scalar bool): ok is False when no valid entries
        (indices then point at entry 0 and must be discarded by the caller).
    '''
    w = jnp.where(valid, 1.0 if weights is None else weights, 0.0).astype(jnp.float32)
    ok = jnp.sum(w) > 0
    # XLA lowers cumsum as a tree scan, so with f32 rounding the cdf of
    # non-negative weights is NOT guaranteed monotone (measured: 1-ulp local
    # dips at ~40k elements) — which violates searchsorted's sorted-input
    # contract, makes the 'scan'/'sort'/'unrolled' lowerings disagree on
    # boundary draws, and in the worst case can return a zero-weight (masked
    # out) index. A running max restores monotonicity (identity everywhere
    # except ulp-level dips) and makes all three lowerings bit-identical:
    # each is then exactly count(cdf <= u).
    cdf = jax.lax.cummax(jnp.cumsum(w))
    # Scale the uniforms by the MONOTONE cdf's last element, not by jnp.sum(w):
    # pairwise summation can exceed cdf[-1] by ulps, and a draw landing in
    # (cdf[-1], sum(w)] would searchsort past the end — clamped to n-1, which
    # may be a masked-out entry. The product uniform * cdf[-1] can still round
    # UP to exactly cdf[-1] (uniform near 1, ties-to-even; ~2^-25 per draw), so
    # clamp one ulp below: with u < cdf[-1] strictly, every draw lands inside a
    # positive-weight step of the cdf under all three lowerings.
    u = (jax.random.uniform(key, (n_draw,), minval=0.0, maxval=1.0)
         * jnp.maximum(cdf[-1], 1e-30))
    u = jnp.minimum(u, jnp.nextafter(cdf[-1], jnp.float32(0.0)))
    # Lowering policy (measured, PERFLOG round 4): the default 'scan' lowers
    # to a log2(N)-iteration XLA while loop of gathers whose per-iteration
    # overhead dominates at gv1's pool shapes (the step trace showed the
    # sampler's whiles costing ~24 ms/step); 'sort' co-sorts [cdf, u] once.
    # FULL-STEP A/B: 'sort' wins at gv1 (249.5 -> 245.2 ms, cdf 28672) but
    # LOSES at the 57k scale (450.7 -> 480.1, cdf 114688) even though the
    # isolated op is faster there too (5.31 -> 3.49 ms chained) - in the real
    # graph the big co-sort evidently blocks overlap the whiles allowed. Gate
    # by the static cdf length.
    if SEARCHSORTED_MODE == 'unrolled':
        idx = _searchsorted_unrolled(cdf, u)
    else:
        if SEARCHSORTED_MODE == 'auto':
            method = ('sort' if valid.shape[0] <= _SEARCHSORTED_SORT_MAX_N
                      else 'scan')
        else:
            method = SEARCHSORTED_MODE
        idx = jnp.searchsorted(cdf, u, side='right',
                               method=method).astype(jnp.int32)
    return jnp.minimum(idx, valid.shape[0] - 1), ok
