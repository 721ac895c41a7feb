'''
Pallas TPU kernel for exact k-nearest-neighbor search.

XLA's `lax.top_k` is the measured bottleneck of both the encoder and the decoder on
v5e (193 ms for one N=M=14336, K=16 search; 10.6 ms per 32768x531 decoder search):
its generic sort machinery pays ~O(M log M) per row in HBM passes. This kernel
exploits K <= 32:

  * queries are tiled over a grid; each tile's (T, BK) distance block is produced by
    one MXU matmul (|k|^2 - 2 q.k^T, with |q|^2 added at the end) and never leaves
    VMEM;
  * the block's top-K is extracted by K sequential (min, first-index, invalidate)
    VPU passes - O(K * M) per row with tiny constants;
  * extracted candidates (ascending) are merged into a running sorted K-list via
    branch-free insertion (6 VPU ops over (T, K)).

Tie behavior matches `lax.top_k` / the numpy oracle: equal distances resolve to the
lower key index (within a block via first-index extraction, across blocks because
earlier blocks win strict-insert comparisons).

Used by ops.knn.knn for every attention / interpolation / down-transition graph
build (the torch_cluster.knn and kNN_torch replacement,
/root/reference/model/point_transformer_layer.py:76-99).
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['knn_pallas', 'knn_pallas_spatial', 'nn1_bidir_pallas']

_LANES = 128
_BIG_I = 2 ** 30  # python int: jnp constants would be captured as kernel consts.

# Production defaults of the spatial kernel, read at trace time when the
# corresponding knn_pallas_spatial arguments are left at None. Module-level so
# measurement scripts can A/B the full train step without touching call sites.
SPATIAL_BLOCK_K = 2048
SPATIAL_SCALAR_BOUNDS = True


def _insert_sorted(acc_d, acc_i, v_d, v_i):
    '''Insert one (value, index) per row into a row-wise ascending (T, K) list.
    Strict comparison: existing equal entries keep priority (earlier blocks have
    lower key indices).'''
    ge = acc_d > v_d                                   # (T, K) monotone 0..0 1..1.
    # Mosaic cannot concatenate i1 vectors: shift a f32 copy of the mask instead.
    gef = ge.astype(jnp.float32)
    prev = jnp.concatenate([jnp.zeros_like(gef[:, :1]), gef[:, :-1]], axis=1)
    first_ge = ge & (prev < 0.5)
    shifted_d = jnp.concatenate([acc_d[:, :1], acc_d[:, :-1]], axis=1)
    shifted_i = jnp.concatenate([acc_i[:, :1], acc_i[:, :-1]], axis=1)
    new_d = jnp.where(ge, jnp.where(first_ge, v_d, shifted_d), acc_d)
    new_i = jnp.where(ge, jnp.where(first_ge, v_i, shifted_i), acc_i)
    return new_d, new_i


def _process_block(b, q, col, k_ref, kn_ref, accd_ref, acci_ref, *, k, block_k):
    '''Fold key block `b` into the running sorted top-k accumulators: one MXU
    distance matmul over the (T, BK) block, then k sequential
    (min, first-index, invalidate) extraction passes merged via _insert_sorted.
    Shared verbatim by all three kernels - tie policy, precision, and insert
    semantics must stay identical across them (the scalar-bounds kernel's
    equivalence proof depends on it).'''
    off = b * block_k
    kblk = k_ref[0, :, pl.ds(off, block_k)]                        # (3, BK).
    kn = kn_ref[0, :, pl.ds(off, block_k)]                         # (1, BK).
    prod = jax.lax.dot_general(
        q, kblk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                       # (T, BK).
    d = kn - 2.0 * prod                                            # (T, BK).

    acc_d, acc_i = accd_ref[:], acci_ref[:]
    for _j in range(k):
        m = jnp.min(d, axis=1, keepdims=True)                      # (T, 1).
        idx = jnp.min(jnp.where(d <= m, col, _BIG_I), axis=1,
                      keepdims=True)                               # (T, 1).
        d = jnp.where(col == idx, jnp.inf, d)
        acc_d, acc_i = _insert_sorted(acc_d, acc_i, m, idx + off)
    accd_ref[:] = acc_d
    acci_ref[:] = acc_i


def _knn_kernel(q_ref, k_ref, kn_ref, out_d_ref, out_i_ref, accd_ref, acci_ref,
                *, k, block_k, num_blocks):
    '''
    :param q_ref (1, T, 3) VMEM f32: query tile.
    :param k_ref (1, 3, M_pad) VMEM f32: all keys, channel-major (a (M, 3) layout
        would pad the 3-wide lane dim to 128 and explode VMEM 42x at large M).
    :param kn_ref (1, 1, M_pad) VMEM f32: |key|^2 with +inf at masked/padded keys.
    :param out_d_ref (1, T, K_pad) VMEM f32: squared distances, ascending (first k
        columns valid; |q|^2 not yet added - caller finishes the distance).
    :param out_i_ref (1, T, K_pad) VMEM int32.
    :param accd_ref / acci_ref (T, K_pad) VMEM scratch.
    '''
    (T, K_pad) = accd_ref.shape
    q = q_ref[0]                                                   # (T, 3).
    accd_ref[:] = jnp.full((T, K_pad), jnp.inf, jnp.float32)
    acci_ref[:] = jnp.zeros((T, K_pad), jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, block_k), 1)

    def body(b, _):
        _process_block(b, q, col, k_ref, kn_ref, accd_ref, acci_ref,
                       k=k, block_k=block_k)
        return 0

    jax.lax.fori_loop(0, num_blocks, body, 0)
    out_d_ref[0] = accd_ref[:]
    out_i_ref[0] = acci_ref[:]


@functools.partial(jax.jit,
                   static_argnames=('k', 'tile_n', 'block_k', 'interpret'))
def _knn_pallas_call(q, keys, kn, k, tile_n, block_k, interpret):
    (B, N_pad, _) = q.shape
    (_, _, M_pad) = keys.shape  # keys are channel-major (B, 3, M_pad).
    K_pad = _LANES  # one lane row per query; only the first k columns are real.
    num_blocks = M_pad // block_k
    kern = functools.partial(_knn_kernel, k=k, block_k=block_k,
                             num_blocks=num_blocks)
    grid = (B, N_pad // tile_n)
    out_d, out_i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, M_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_n, K_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N_pad, K_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, N_pad, K_pad), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((tile_n, K_pad), jnp.float32),
                        pltpu.VMEM((tile_n, K_pad), jnp.int32)],
        interpret=interpret,
    )(q, keys, kn)
    return out_d, out_i


def _knn_spatial_kernel(q_ref, qn_ref, k_ref, kn_ref, bbox_ref,
                        out_d_ref, out_i_ref, accd_ref, acci_ref,
                        *, k, block_k, num_blocks):
    '''
    Exact kNN with per-block spatial pruning: keys arrive Morton-sorted (see
    knn_pallas_spatial), so each contiguous key block occupies a compact
    spatial cell whose bounding box is precomputed in bbox_ref. A block is
    skipped when the squared distance lower bound between the query tile's
    bbox and the block's bbox cannot beat the worst running kth distance of
    any query row - an exact criterion (the bound never skips a block that
    could contribute), which turns the O(K * N * M) VPU extraction into
    O(K * N * M_near).
    :param q_ref (1, T, 3) f32 (Morton-sorted queries); qn_ref (1, T, 1) f32
        (|q|^2 - the running distances are stored without it, so the skip
        bound adds it back per row); k_ref (1, 3, M_pad); kn_ref (1, 1, M_pad)
        (+inf at masked/padded keys); bbox_ref (1, num_blocks, 8) f32 rows
        [lo_xyz, hi_xyz, 0, 0]; outputs/scratch as in _knn_kernel.
    '''
    (T, K_pad) = accd_ref.shape
    t_idx = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    q = q_ref[0]                                                   # (T, 3).
    qn = qn_ref[0]                                                 # (T, 1).
    accd_ref[:] = jnp.full((T, K_pad), jnp.inf, jnp.float32)
    acci_ref[:] = jnp.zeros((T, K_pad), jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, block_k), 1)
    tile_lo = jnp.min(q, axis=0, keepdims=True)                    # (1, 3).
    tile_hi = jnp.max(q, axis=0, keepdims=True)                    # (1, 3).
    # Seed block: both sets sit on the same Morton curve, so the keys nearest
    # this query tile live around the proportional curve position. Processing
    # that block first tightens the pruning bound immediately (a 0..nb scan
    # would run with bound=inf until it reaches the tile's neighborhood).
    seed = (t_idx * num_blocks) // jnp.maximum(n_tiles, 1)

    def body(j, _):
        b = jnp.where(j == 0, seed, j - 1)
        blk = bbox_ref[0, pl.ds(b, 1), :]                          # (1, 8).
        gap = jnp.maximum(jnp.maximum(blk[:, 0:3] - tile_hi,
                                      tile_lo - blk[:, 3:6]), 0.0)
        lb2 = jnp.sum(gap * gap)                                   # scalar.
        bound = jnp.max(accd_ref[:, k - 1:k] + qn)                 # scalar.
        revisit = jnp.logical_and(j > 0, b == seed)

        @pl.when(jnp.logical_and(lb2 < bound, jnp.logical_not(revisit)))
        def _process():
            _process_block(b, q, col, k_ref, kn_ref, accd_ref, acci_ref,
                           k=k, block_k=block_k)

        return 0

    jax.lax.fori_loop(0, num_blocks + 1, body, 0)
    out_d_ref[0] = accd_ref[:]
    out_i_ref[0] = acci_ref[:]


def _knn_spatial_scalar_kernel(q_ref, qn_ref, k_ref, kn_ref, bbox_ref,
                               tbox_ref, out_d_ref, out_i_ref, accd_ref,
                               acci_ref, bound_ref, *, k, block_k, num_blocks):
    '''
    Same exact pruned-kNN semantics as _knn_spatial_kernel, with the bound
    tests moved off the vector unit: the block and tile bboxes live in SMEM
    and each iteration's lower-bound test is pure scalar-unit work against an
    SMEM-resident scalar bound (refreshed by a vector reduce only inside the
    pl.when of an actually-processed block). Skipped blocks therefore cost a
    handful of scalar cycles instead of a bbox VMEM row load + a (T, 1) reduce,
    which is why scalar bounds win at the production block_k=2048 (31.0 vs
    32.5 ms on the 57344^2 GREATER-like A/B). NOTE the finer-block hypothesis
    this was built to enable is measured DEAD on hardware: bk 1024/512/256 run
    36.3/54.7/101.2 ms even with scalar bounds - the extra per-PROCESSED-block
    matmul + K-pass extraction overhead of more boundary blocks dwarfs the
    pruning gain, so flat block_k=2048 + scalar bounds is the family optimum
    (PERFLOG round-3 device A/B, Aug 19).

    Equivalence to _knn_spatial_kernel: the bound here is never stale - skipped
    blocks cannot change the accumulator, and every processed block refreshes
    bound_ref - so both kernels test every block against the same bound value
    and process identical block sets (hence bit-identical outputs), PROVIDED
    the lb2 arithmetic rounds identically on both paths. Do NOT relax the
    refresh cadence: with the |b|^2 - 2ab expansion's cancellation error, a
    block admitted under an oversized bound can genuinely insert, silently
    breaking the equivalence. The bit-identity is verified in interpret mode
    by tests/test_ops.py::test_knn_spatial_scalar_bounds_bit_identical; on TPU
    the scalar-core sequential (g0^2 + g1^2) + g2^2 sum could in principle
    round differently from the vector kernel's 3-lane jnp.sum reduce for an
    lb2 within 1 ulp of the bound, so the device A/B re-checks identity before
    any default flip (near-tie index swaps are within the tolerance the
    spatial path already documents).
    :param bbox_ref (B, num_blocks * 8) f32 SMEM, flattened [lo_xyz, hi_xyz,
        0, 0] rows, whole array (Mosaic requires SMEM blocks to equal the
        array dims; the kernel picks its batch row via program_id(0)).
    :param tbox_ref (B * n_tiles, 8) f32 SMEM: per-tile [lo_xyz, hi_xyz, 0, 0]
        (precomputed outside the kernel - scalar lane extracts from a VPU
        reduction are not a Mosaic-supported pattern), whole array; the kernel
        reads row b * n_tiles + t.
    '''
    (T, K_pad) = accd_ref.shape
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    q = q_ref[0]                                                   # (T, 3).
    qn = qn_ref[0]                                                 # (T, 1).
    accd_ref[:] = jnp.full((T, K_pad), jnp.inf, jnp.float32)
    acci_ref[:] = jnp.zeros((T, K_pad), jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, block_k), 1)
    trow = b_idx * n_tiles + t_idx
    tlo = [tbox_ref[trow, j] for j in range(3)]
    thi = [tbox_ref[trow, 3 + j] for j in range(3)]
    seed = (t_idx * num_blocks) // jnp.maximum(n_tiles, 1)

    def process(b):
        _process_block(b, q, col, k_ref, kn_ref, accd_ref, acci_ref,
                       k=k, block_k=block_k)

    process(seed)
    # The running bound lives in SMEM so its vector-reduce refresh is
    # predicated on actually processing a block (a jnp.where over a fori carry
    # would evaluate the reduce every iteration, skipped blocks included).
    bound_ref[0] = jnp.max(accd_ref[:, k - 1:k] + qn)

    def body(b, _):
        # Scalar-unit lower bound: squared bbox gap between tile and block.
        lb2 = jnp.float32(0.0)
        for j in range(3):
            g = jnp.maximum(
                jnp.maximum(bbox_ref[b_idx, b * 8 + j] - thi[j],
                            tlo[j] - bbox_ref[b_idx, b * 8 + 3 + j]),
                0.0)
            lb2 = lb2 + g * g
        hit = jnp.logical_and(lb2 < bound_ref[0], b != seed)

        @pl.when(hit)
        def _():
            process(b)
            bound_ref[0] = jnp.max(accd_ref[:, k - 1:k] + qn)

        return 0

    jax.lax.fori_loop(0, num_blocks, body, 0)
    out_d_ref[0] = accd_ref[:]
    out_i_ref[0] = acci_ref[:]


@functools.partial(jax.jit, static_argnames=('k', 'tile_n', 'block_k',
                                              'interpret', 'scalar_bounds'))
def _knn_spatial_call(q, qn, keys, kn, bbox, k, tile_n, block_k, interpret,
                      scalar_bounds=False):
    (B, N_pad, _) = q.shape
    (_, _, M_pad) = keys.shape
    K_pad = _LANES
    num_blocks = M_pad // block_k
    n_tiles = N_pad // tile_n

    in_specs = [
        pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n, 1), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, M_pad), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, M_pad), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q, qn, keys, kn]
    scratch = [pltpu.VMEM((tile_n, K_pad), jnp.float32),
               pltpu.VMEM((tile_n, K_pad), jnp.int32)]
    if scalar_bounds:
        # Block + per-tile bboxes flattened to rank-2 for SMEM (scalar reads).
        # Mosaic requires SMEM block shapes to equal the array dims (or tile
        # by (8, 128)), so both operands arrive whole and the kernel indexes
        # its batch/tile row off the program ids.
        in_specs.append(pl.BlockSpec((B, num_blocks * 8), lambda b, t: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(bbox.reshape(B, num_blocks * 8))
        tiles = q.reshape(B, n_tiles, tile_n, 3)
        tbox = jnp.concatenate([jnp.min(tiles, axis=2), jnp.max(tiles, axis=2),
                                jnp.zeros((B, n_tiles, 2))], axis=-1)
        in_specs.append(pl.BlockSpec(
            (B * n_tiles, 8), lambda b, t: (0, 0),
            memory_space=pltpu.SMEM))
        operands.append(tbox.reshape(B * n_tiles, 8))
        scratch.append(pltpu.SMEM((1,), jnp.float32))
        kern = functools.partial(_knn_spatial_scalar_kernel, k=k,
                                 block_k=block_k, num_blocks=num_blocks)
    else:
        in_specs.append(pl.BlockSpec((1, num_blocks, 8), lambda b, t: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bbox)
        kern = functools.partial(_knn_spatial_kernel, k=k, block_k=block_k,
                                 num_blocks=num_blocks)
    out_d, out_i = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, tile_n, K_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N_pad, K_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, N_pad, K_pad), jnp.int32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out_d, out_i


def _part1by2(x):
    '''Spread the low 10 bits of x across every third bit (Morton helper).'''
    x = x & 0x3ff
    x = (x | (x << 16)) & 0x030000ff
    x = (x | (x << 8)) & 0x0300f00f
    x = (x | (x << 4)) & 0x030c30c3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton_codes(pts, lo, hi):
    '''30-bit Morton codes of (B, N, 3) points within per-example bounds.'''
    scale = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((pts - lo) / scale * 1023.0, 0.0, 1023.0).astype(jnp.int32)
    return (_part1by2(q[..., 0]) | (_part1by2(q[..., 1]) << 1)
            | (_part1by2(q[..., 2]) << 2))


def _hilbert_codes(pts, lo, hi, bits=10):
    '''30-bit Hilbert codes (Skilling's transpose-form algorithm, vectorized).

    Hilbert ranges have strictly better locality than Morton ranges (no long
    jumps across the cube), which tightens the per-block bounding boxes the
    spatial kNN kernel prunes with (measured: mean block side 1.6 vs 2.0 at
    block_k=2048, 57344 uniform points; ~30 % fewer processed blocks).'''
    scale = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((pts - lo) / scale * (2.0 ** bits - 1.0), 0.0,
                 2.0 ** bits - 1.0).astype(jnp.int32)
    X = [q[..., 0], q[..., 1], q[..., 2]]
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(3):
            hit = (X[i] & Q) > 0
            t = (X[0] ^ X[i]) & P
            x0_inv = X[0] ^ P
            x0_ex, xi_ex = X[0] ^ t, X[i] ^ t
            new_x0 = jnp.where(hit, x0_inv, x0_ex)
            if i != 0:
                X[i] = jnp.where(hit, X[i], xi_ex)
            X[0] = new_x0
        Q >>= 1
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[0])
    Q = 1 << (bits - 1)
    while Q > 1:
        t = jnp.where((X[2] & Q) > 0, t ^ (Q - 1), t)
        Q >>= 1
    X = [x ^ t for x in X]
    # Interleave the transposed coords; X[0] carries the most significant bits.
    return (_part1by2(X[2]) | (_part1by2(X[1]) << 1) | (_part1by2(X[0]) << 2))


def knn_pallas_spatial(query, keys, k, *, key_mask=None, tile_n=256,
                       block_k=None, euclidean=True, same=None,
                       curve='hilbert', scalar_bounds=None):
    '''
    Exact kNN via Morton sorting + bbox-pruned Pallas extraction: both point
    sets are sorted along a space-filling curve (device-side argsort), so
    query tiles and key blocks become compact spatial cells and the kernel
    skips every key block whose bounding box provably cannot contribute to
    any query row's top-k. The pruning bound is exact with respect to the
    kernel's own distances; those use the same |b|^2 - 2ab expansion as
    knn_pallas (and the reference's square_distance), whose f32 cancellation
    error is ~eps * |coord|^2. Consequences: the index returned among
    exactly-equidistant duplicates can differ from the plain kernel's
    argsort order, and neighbors whose distances differ by less than the
    expansion's own rounding error may swap in or out at the top-k boundary
    (see tests/test_ops.py::test_knn_spatial_clustered_data). This is the
    large-N*M path: at n_points=57344 self-attention
    (3.3e9 candidate pairs) the plain kernel's extraction is VPU-bound.
    :param same (bool or None): queries and keys are the same point set
        (self-attention) - reuses one sort. Auto-detected by identity if None.
    :param scalar_bounds: route to the SMEM scalar-unit bound-test kernel
        (bit-identical outputs; per-block skip cost drops from a bbox VMEM
        load + (T, 1) reduce to a few scalar cycles). On by default: the
        round-3 device A/B measured 31.0 vs 32.5 ms at the 57344^2 GREATER
        scale (identical indices, 20-rep best-of-3) and 40.8 vs 42.1 ms on
        a uniform cloud, both at the production block_k=2048. The original
        motivation - making SMALL block_k affordable - did NOT materialize:
        bk 1024/512/256 lose on device (36/55/101 ms) because fine blocks
        cost extra per-processed-block matmul+extraction overhead, not
        bound tests; bk=4096 also loses (35.7/39.7 ms).
    '''
    assert k <= 32
    if block_k is None:
        block_k = SPATIAL_BLOCK_K
    if scalar_bounds is None:
        scalar_bounds = SPATIAL_SCALAR_BOUNDS
    query = jnp.asarray(query, jnp.float32)
    keys_in = jnp.asarray(keys, jnp.float32)
    (B, N, _) = query.shape
    (_, M, _) = keys_in.shape
    if same is None:
        same = query is keys_in

    lo = jnp.min(keys_in, axis=1, keepdims=True)                   # (B, 1, 3).
    hi = jnp.max(keys_in, axis=1, keepdims=True)
    codes = _hilbert_codes if curve == 'hilbert' else _morton_codes
    perm_k = jnp.argsort(codes(keys_in, lo, hi), axis=-1)          # (B, M).
    keys_s = jnp.take_along_axis(keys_in, perm_k[..., None], axis=1)
    if same and N == M:
        perm_q, query_s = perm_k, keys_s
    else:
        perm_q = jnp.argsort(codes(query, lo, hi), axis=-1)
        query_s = jnp.take_along_axis(query, perm_q[..., None], axis=1)

    tile_n = min(tile_n, max(_LANES, 1 << (N - 1).bit_length()))
    N_pad = -(-N // tile_n) * tile_n
    block_k = min(block_k, max(_LANES, 1 << (M - 1).bit_length()))
    M_pad = -(-M // block_k) * block_k

    # Pad queries by repeating the last sorted row (keeps tile bboxes tight);
    # padded rows are dropped by the unsort gather.
    q_p = jnp.concatenate(
        [query_s, jnp.broadcast_to(query_s[:, -1:], (B, N_pad - N, 3))], axis=1
    ) if N_pad > N else query_s
    qn = jnp.sum(jnp.square(q_p), axis=-1, keepdims=True)          # (B, N_pad, 1).
    # Pad keys likewise (kn=+inf keeps them unselected, bbox stays valid).
    k_p = jnp.concatenate(
        [keys_s, jnp.broadcast_to(keys_s[:, -1:], (B, M_pad - M, 3))], axis=1
    ) if M_pad > M else keys_s
    kn = jnp.sum(jnp.square(k_p), axis=-1)                         # (B, M_pad).
    in_play = jnp.arange(M_pad) < M
    if key_mask is not None:
        mask_s = jnp.take_along_axis(jnp.asarray(key_mask), perm_k, axis=1)
        mask_p = jnp.pad(mask_s, ((0, 0), (0, M_pad - M)))
        in_play = in_play[None] & mask_p
        in_play = jnp.broadcast_to(in_play, (B, M_pad))
    kn = jnp.where(in_play, kn, jnp.inf)
    kn = jnp.broadcast_to(kn, (B, M_pad))[:, None, :]              # (B, 1, M_pad).

    num_blocks = M_pad // block_k
    blocks = k_p.reshape(B, num_blocks, block_k, 3)
    bbox = jnp.concatenate([jnp.min(blocks, axis=2), jnp.max(blocks, axis=2),
                            jnp.zeros((B, num_blocks, 2))], axis=-1)  # (B, nb, 8).

    interpret = jax.default_backend() != 'tpu'
    out_d, out_i = _knn_spatial_call(q_p, qn, jnp.transpose(k_p, (0, 2, 1)),
                                     kn, bbox, int(k), int(tile_n),
                                     int(block_k), interpret,
                                     bool(scalar_bounds))
    d2 = jnp.maximum(out_d[:, :N, :k] + qn[:, :N], 0.0)
    idx_sorted = out_i[:, :N, :k]
    # Map key indices back to the original order, then unsort the query rows.
    idx_orig = jnp.take_along_axis(
        perm_k[:, :, None], jnp.minimum(idx_sorted, M - 1), axis=1)
    # NOTE a scatter-based inverse (inv[perm[i]] = i) was measured SLOWER than
    # this argsort on device (2.36 vs 1.61 ms at N=14336; tie at 57344) —
    # XLA's i32 sort is fixed-cost dominated at these sizes (PERFLOG round 4).
    inv_q = jnp.argsort(perm_q, axis=-1)                           # (B, N).
    d2 = jnp.take_along_axis(d2, inv_q[..., None], axis=1)
    idx = jnp.take_along_axis(idx_orig, inv_q[..., None], axis=1)
    return (jnp.sqrt(d2) if euclidean else d2), idx.astype(jnp.int32)


def _nn1_bidir_kernel(q_ref, qn_ref, k_ref, kn_ref, out_a_ref, out_b_ref,
                      *, block_k, num_blocks):
    '''
    One pass over the (T, M) distance tile producing BOTH reductions:
      out_a[i] = min_j (|b_j|^2 - 2 a_i.b_j)   (caller adds |a_i|^2)
      out_b[j] = min_i (|a_i|^2 - 2 a_i.b_j)   (caller adds |b_j|^2)
    qn/kn carry +inf at masked/padded points, which excludes them as *keys* of
    the opposite direction. out_b is min-accumulated across query tiles
    (sequential grid, initialized at the first tile).
    :param q_ref (1, T, 3) f32; qn_ref (1, T, 1) f32 (|a|^2, +inf masked);
        k_ref (1, 3, M_pad) f32 channel-major; kn_ref (1, 1, M_pad) f32;
        out_a (1, T) f32; out_b (1, M_pad) f32.
    '''
    (_, T, _) = q_ref.shape
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        out_b_ref[0] = jnp.full_like(out_b_ref[0], jnp.inf)

    q = q_ref[0]                                                   # (T, 3).
    qn = qn_ref[0]                                                 # (T, 1).
    run_a = jnp.full((T, 1), jnp.inf, jnp.float32)

    def body(b, run_a):
        off = b * block_k
        kblk = k_ref[0, :, pl.ds(off, block_k)]                    # (3, BK).
        kn = kn_ref[0, :, pl.ds(off, block_k)]                     # (1, BK).
        prod = jax.lax.dot_general(
            q, kblk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                   # (T, BK).
        e = -2.0 * prod
        run_a = jnp.minimum(run_a, jnp.min(e + kn, axis=1, keepdims=True))
        col_min = jnp.min(e + qn, axis=0)                          # (BK,).
        cur = out_b_ref[0, pl.ds(off, block_k)]
        out_b_ref[0, pl.ds(off, block_k)] = jnp.minimum(cur, col_min)
        return run_a

    run_a = jax.lax.fori_loop(0, num_blocks, body, run_a)
    out_a_ref[0] = run_a[:, 0]


@functools.partial(jax.jit, static_argnames=('tile_n', 'block_k', 'interpret'))
def _nn1_bidir_call(q, qn, keys, kn, tile_n, block_k, interpret):
    (B, N_pad, _) = q.shape
    (_, _, M_pad) = keys.shape
    num_blocks = M_pad // block_k
    kern = functools.partial(_nn1_bidir_kernel, block_k=block_k,
                             num_blocks=num_blocks)
    out_a, out_b = pl.pallas_call(
        kern,
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, M_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_n), lambda b, t: (b, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_pad), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, M_pad), jnp.float32),
        ),
        interpret=interpret,
    )(q, qn, keys, kn)
    return out_a, out_b


def nn1_bidir_pallas(a, b, *, a_mask=None, b_mask=None, tile_n=256,
                     block_k=4096):
    '''
    Bidirectional exact 1-NN distances in a single pass: for each a-point the
    Euclidean distance to the nearest valid b-point, and for each b-point the
    distance to the nearest valid a-point — the (N, M) distance tile is
    computed once and reduced along both axes (two separate kNN calls would
    build it twice). Used by the sampler's dynamic-region ('moving') masks,
    which need exactly this pair (geometry.py:697-728 semantics, both frames).
    :param a (B, N, 3); b (B, M, 3).
    :param a_mask (B, N) bool or None: invalid a-points are excluded as
        nearest-neighbor *keys* of the b->a direction.
    :param b_mask (B, M) bool or None: likewise for the a->b direction.
    :return (dist_a (B, N), dist_b (B, M)) f32 Euclidean distances.
    '''
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    (B, N, _) = a.shape
    (_, M, _) = b.shape

    tile_n = min(tile_n, max(_LANES, 1 << (N - 1).bit_length()))
    N_pad = -(-N // tile_n) * tile_n
    block_k = min(block_k, max(_LANES, 1 << (M - 1).bit_length()))
    M_pad = -(-M // block_k) * block_k

    a_p = jnp.pad(a, ((0, 0), (0, N_pad - N), (0, 0)))
    b_p = jnp.transpose(jnp.pad(b, ((0, 0), (0, M_pad - M), (0, 0))), (0, 2, 1))
    qn_true = jnp.sum(jnp.square(a_p), axis=-1)                    # (B, N_pad).
    kn_true = jnp.sum(jnp.square(b_p), axis=1)                     # (B, M_pad).

    a_play = jnp.arange(N_pad) < N
    if a_mask is not None:
        a_play = a_play[None] & jnp.pad(jnp.asarray(a_mask),
                                        ((0, 0), (0, N_pad - N)))
    b_play = jnp.arange(M_pad) < M
    if b_mask is not None:
        b_play = b_play[None] & jnp.pad(jnp.asarray(b_mask),
                                        ((0, 0), (0, M_pad - M)))
    qn = jnp.where(a_play, qn_true, jnp.inf)[..., None]            # (B, N_pad, 1).
    kn = jnp.where(b_play, kn_true, jnp.inf)[:, None, :]           # (B, 1, M_pad).

    interpret = jax.default_backend() != 'tpu'
    out_a, out_b = _nn1_bidir_call(a_p, qn, b_p, kn, int(tile_n), int(block_k),
                                   interpret)
    d_a = jnp.sqrt(jnp.maximum(out_a + qn_true, 0.0))[:, :N]
    d_b = jnp.sqrt(jnp.maximum(out_b + kn_true, 0.0))[:, :M]
    return d_a, d_b


def knn_pallas(query, keys, k, *, key_mask=None, tile_n=256, block_k=4096,
               euclidean=True):
    '''
    Exact kNN via the Pallas kernel.
    :param query (B, N, 3) array; keys (B, M, 3); k <= 32.
    :param key_mask (B, M) bool or None: invalid keys are never returned.
    :return (dists (B, N, k), idx (B, N, k)) ascending by distance.
    '''
    assert k <= 32, f'kernel supports k <= 32, got {k}'
    query = jnp.asarray(query, jnp.float32)
    keys = jnp.asarray(keys, jnp.float32)
    (B, N, _) = query.shape
    (_, M, _) = keys.shape

    tile_n = min(tile_n, max(_LANES, 1 << (N - 1).bit_length()))
    N_pad = -(-N // tile_n) * tile_n
    block_k = min(block_k, max(_LANES, 1 << (M - 1).bit_length()))
    M_pad = -(-M // block_k) * block_k

    q_p = jnp.pad(query, ((0, 0), (0, N_pad - N), (0, 0)))
    k_p = jnp.pad(keys, ((0, 0), (0, M_pad - M), (0, 0)))
    k_p = jnp.transpose(k_p, (0, 2, 1))                             # (B, 3, M_pad).
    kn = jnp.sum(jnp.square(k_p), axis=1)                           # (B, M_pad).
    in_play = jnp.arange(M_pad) < M
    if key_mask is not None:
        in_play = in_play[None] & jnp.pad(jnp.asarray(key_mask),
                                          ((0, 0), (0, M_pad - M)))
    kn = jnp.where(in_play, kn, jnp.inf)[:, None, :]                # (B, 1, M_pad).

    interpret = jax.default_backend() != 'tpu'
    out_d, out_i = _knn_pallas_call(q_p, k_p, kn, int(k), int(tile_n),
                                    int(block_k), interpret)
    d2 = out_d[:, :N, :k] + jnp.sum(jnp.square(query), axis=-1)[..., None]
    d2 = jnp.maximum(d2, 0.0)
    idx = out_i[:, :N, :k]
    return (jnp.sqrt(d2) if euclidean else d2), idx
