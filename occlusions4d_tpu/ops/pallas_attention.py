'''
Fused kNN vector cross-attention Pallas kernel (the decoder's hot op).

XLA executes one VectorAttention block over 32768 queries x 531 abstract keys in
~29 ms: the (N, K, D) neighbor tensors (k, v, positional encodings, the 2D-wide
gamma hidden layer) round-trip through HBM between every op, and the kNN top_k is
its own pass. This kernel runs the whole block per query tile without leaving VMEM:

  1. distance tile (T, M) via one MXU matmul, exact top-K extraction on-core
     (same algorithm as ops/pallas_knn.py);
  2. neighbor gather expressed as a one-hot (T*K, M) matmul against the fused
     [feats2 | pos2] value matrix - MXU work instead of HBM gathers. Features
     are gathered RAW (E wide) and the bias-free to_k/to_v projections applied
     per gathered row: gathering commutes with the linear maps, so the dot
     products are identical while the gather matmul shrinks from 2D+3 to E+3
     columns (2.4x fewer MACs at the cv1 abstract-cloud size);
  3. theta (pos) and gamma (attn) MLPs as (T*K, *) matmuls;
  4. per-channel softmax over the K axis and the weighted (v + theta) reduction.

Semantics match models.layers.VectorAttention exactly (same formulas, same
neighbor ordering); parity is asserted by tests/test_pallas_ops.py. Restricted to
cross-attention with a key set small enough to hold projected in VMEM
(M <= ~4096 - the decoder's abstract clouds; the encoder's self-attention over
14336 keys keeps the XLA path).

The matmul dtype is selectable: f32 (default, 3-pass MXU, bitwise-close to the
XLA path) or bf16 (single-pass, ~3x faster, ~1e-2 relative error - the same
trade the reference makes with fp16 autocast, /root/reference/train.py:81).
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_knn_vector_attention', 'fused_knn_interp', 'knn_extract',
           'knn_gather_rows']

_LANES = 128
_BIG_I = 2 ** 30

# Sweep tunables (numerics-neutral): the in-kernel neighbor group size used
# when a caller passes group=None, and an override for the projection-placement
# heuristic (None = shape rule below; True/False forces premul on/off). Module
# globals so step-level A/B sweeps can retune them without replumbing call
# sites; both only affect scheduling, never outputs.
DEFAULT_ATTN_GROUP = 4
FORCE_PREMUL = None
# Override for the attention-backward query-tile rule (None = tile_n at
# k <= 16, else tile_n / 2). Changes Mosaic scheduling (per-tile VMEM
# residency); per-query grads are tile-independent, but WEIGHT grads sum
# per-tile partials, so retunes can shift dW by last-ulp rounding — A/B at
# the step level (loss trajectory), not bitwise.
BWD_TILE_OVERRIDE = None


def _mm(a, b, cd):
    # Mosaic's default f32 dot executes as a single bf16 MXU pass; request the
    # 3-pass decomposition when true f32 fidelity is asked for. Operands already
    # in the compute dtype (pre-cast on the host side) skip the VPU cast.
    return _mm2(a, b, ((1,), (0,)), cd)


def _mm2(a, b, dims, cd):
    '''dot_general with both operands cast to the compute dtype, f32 accumulate.
    `dims` selects the contraction axes (transpose matmuls in the backward).'''
    prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
            else jax.lax.Precision.DEFAULT)
    a = a if a.dtype == cd else a.astype(cd)
    b = b if b.dtype == cd else b.astype(cd)
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _attn_kernel(qpos_ref, qproj_ref, kpos_ref, fv_ref, kn_ref, wk_ref, wv_ref,
                 wp1_ref, bp1_ref, wp2_ref, bp2_ref,
                 wa1_ref, ba1_ref, wa2_ref, ba2_ref, *refs,
                 k, dim, feat, group, compute_dtype, premul, use_idx=False):
    '''
    Block shapes (leading 1 from the (B, tiles) grid):
      qpos (1, T, 3) f32; qproj (1, T, D); kpos (1, M, 3) f32;
      fv (1, M, E+3): [feats2 | pos2] (raw key-side features, pre-projection);
      kn (1, 1, M) f32 (+inf masked); wk/wv (E, D) key/value projections
      (applied per gathered row: the one-hot gather then costs K*T*M*(E+3)
      instead of K*T*M*(2D+3) MXU MACs - a 2.4x cut at the cv1 abstract-cloud
      size, and exactly the same dot products since gathering commutes with the
      linear projections); theta (wp1 (3,P), bp1 (1,P), wp2 (P,D), bp2 (1,D))
      and gamma (wa1 (D,H), ba1 (1,H), wa2 (H,D), ba2 (1,D)) MLP weights;
      out (1, T, D).

    Neighbors are extracted one at a time (serial argmin over the running
    distance row), but the gather + projection + theta/gamma matmuls are
    batched over `group` neighbors at once by stacking their one-hot rows along
    the sublane axis ((G*T, M) @ (M, E+3) etc.) - fewer, larger MXU ops for the
    same FLOPs. Stacking is along axis 0, never across the lane dimension (a
    (T*k, ...) lane reshape is what Mosaic cannot lower).

    use_idx: refs gains a leading ki block (1, T, LANES) i32 of precomputed
    neighbor indices (knn_extract output; the decoder runs THREE extractions
    over the same (query, abstract) pair per decode - interp + two attention
    layers, each K serial argmin passes over (T, M) - so sharing one producer
    removes ~2/3 of that VPU work). The one-hots, and hence every downstream
    float, are bit-identical to the in-kernel extraction.
    '''
    ki_ref = refs[0] if use_idx else None
    out_ref = refs[-1]
    (_, T, _) = qpos_ref.shape
    (_, M, _) = kpos_ref.shape
    cd = compute_dtype
    qpos = qpos_ref[0]                                             # (T, 3) f32.
    qproj = qproj_ref[0]                                           # (T, D).
    col = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.float32(dim))

    if use_idx:
        ki = ki_ref[0]                                             # (T, LANES).
    else:
        # Exact kNN ranking in f32 (one MXU matmul).
        prod = jax.lax.dot_general(
            qpos, kpos_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                   # (T, M).
        d = kn_ref[0] - 2.0 * prod

    group = max(1, min(group, k))
    if group > 1:
        qpos_g = jnp.concatenate([qpos] * group, axis=0)           # (G*T, 3).
        qproj_g = jnp.concatenate([qproj] * group, axis=0)         # (G*T, D).
    else:
        qpos_g, qproj_g = qpos, qproj

    # Online softmax over the K candidates (three running (T, D) buffers instead
    # of 2K stored per-neighbor tensors, which would exceed VMEM at T=128).
    run_mx = jnp.full((T, dim), -jnp.inf, jnp.float32)
    run_den = jnp.zeros((T, dim), jnp.float32)
    run_acc = jnp.zeros((T, dim), jnp.float32)
    for j0 in range(0, k, group):
        g_sz = min(group, k - j0)
        onehots = []
        for _j in range(g_sz):
            if use_idx:
                onehots.append(col == ki[:, j0 + _j:j0 + _j + 1])
                continue
            m = jnp.min(d, axis=1, keepdims=True)
            idx = jnp.min(jnp.where(d <= m, col, _BIG_I), axis=1,
                          keepdims=True)                           # (T, 1).
            d = jnp.where(col == idx, jnp.inf, d)
            onehots.append(col == idx)
        onehot = (onehots[0] if g_sz == 1
                  else jnp.concatenate(onehots, axis=0))           # (G*T, M).
        g = _mm(onehot, fv_ref[0], cd)                             # (G*T, C).
        if premul:
            # fv = [k_all | v_all | pos2]: projections applied before the
            # gather (cheaper when the key set is small, see the wrapper).
            k_g = g[:, :dim]
            v_g = g[:, dim:2 * dim]
            p_g = g[:, 2 * dim:2 * dim + 3]
        else:
            # fv = [feats2 | pos2]: project per gathered row.
            f_g = g[:, :feat]
            p_g = g[:, feat:feat + 3]
            k_g = _mm(f_g, wk_ref[:], cd)                          # (G*T, D).
            v_g = _mm(f_g, wv_ref[:], cd)                          # (G*T, D).
        qp = qpos_g[:g_sz * T]
        qj = qproj_g[:g_sz * T]

        pe = _mm(qp - p_g, wp1_ref[:], cd) + bp1_ref[:]
        pe = _mm(jnp.maximum(pe, 0.0), wp2_ref[:], cd) + bp2_ref[:]  # (G*T, D).

        h = _mm(qj - k_g + pe, wa1_ref[:], cd) + ba1_ref[:]
        lg_g = (_mm(jnp.maximum(h, 0.0), wa2_ref[:], cd) + ba2_ref[:]) * inv_sqrt_d

        vpe = v_g + pe
        for gi in range(g_sz):
            sl = slice(gi * T, (gi + 1) * T)
            lg = lg_g[sl]
            new_mx = jnp.maximum(run_mx, lg)
            scale = jnp.exp(run_mx - new_mx)
            e = jnp.exp(lg - new_mx)
            run_den = run_den * scale + e
            run_acc = run_acc * scale + e * vpe[sl]
            run_mx = new_mx

    out_ref[0] = run_acc / run_den                                 # (T, D).


@functools.partial(jax.jit, static_argnames=('k', 'dim', 'feat', 'tile_n',
                                              'group', 'compute_dtype',
                                              'interpret', 'premul', 'use_idx'))
def _attn_call(qpos, qproj, kpos, fv, kn, ki, wk, wv, wp1, bp1, wp2, bp2, wa1,
               ba1, wa2, ba2, k, dim, feat, tile_n, group, compute_dtype,
               interpret, premul, use_idx):
    (B, N_pad, _) = qpos.shape
    (_, M_pad, _) = kpos.shape
    C = fv.shape[-1]
    kern = functools.partial(_attn_kernel, k=k, dim=dim, feat=feat, group=group,
                             compute_dtype=compute_dtype, premul=premul,
                             use_idx=use_idx)
    grid = (B, N_pad // tile_n)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M_pad, 3), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M_pad, C), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, M_pad), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        w_spec(wk.shape), w_spec(wv.shape),
        w_spec(wp1.shape), w_spec(bp1.shape), w_spec(wp2.shape),
        w_spec(bp2.shape), w_spec(wa1.shape), w_spec(ba1.shape),
        w_spec(wa2.shape), w_spec(ba2.shape),
    ]
    operands = [qpos, qproj, kpos, fv, kn, wk, wv, wp1, bp1, wp2, bp2, wa1,
                ba1, wa2, ba2]
    if use_idx:
        in_specs.append(pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(ki)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N_pad, dim), jnp.float32),
        # The constant key/weight blocks are double-buffered by the pipeline and
        # push past the default 16 MB scoped-vmem budget at tile_n=128.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out


def _attn_bwd_kernel(qpos_ref, qproj_ref, kpos_ref, fv_ref, kn_ref,
                     wk_ref, wv_ref, wp1_ref, bp1_ref, wp2_ref, bp2_ref,
                     wa1_ref, ba1_ref, wa2_ref, ba2_ref, g_ref, *refs,
                     k, dim, feat, compute_dtype, premul, use_idx=False):
    '''
    Backward of _attn_kernel (flash-attention-style: recompute forward per query
    tile, then chain gradients without materializing (N, K, D) tensors in HBM).

    Gradient surface matches the module path's autodiff exactly where gradients
    are live: d(q_proj), d(feats2) (chained through the in-kernel key/value
    projections and scattered to keys via the transposed one-hot matmul), the
    to_k/to_v projection weights, and the theta/gamma MLP weights. Positions
    carry no gradient (the module stop-gradients the kNN graph and coordinate
    deltas, models/layers.py:89-93), so dqpos/dkpos are identically zero and
    not output.

    All K neighbors are processed in one pass ((K*T, .) row stacks): unlike the
    forward's online softmax, the backward needs every neighbor's logits at once,
    and the full-K tensors fit VMEM at the decode shapes (~25 MB bf16 at K=14,
    T=128). Accumulator outputs (df, weight grads) are revisited across grid
    steps ('arbitrary' sequential grid), initialized on the first visit.

    use_idx: refs gains a leading ki block of precomputed neighbor indices
    (see _attn_kernel) - the forward recompute skips the K serial argmin
    passes; identical one-hots, identical floats.
    '''
    ki_ref = refs[0] if use_idx else None
    (dqproj_ref, df_ref, dwk_ref, dwv_ref, dwp1_ref, dbp1_ref, dwp2_ref,
     dbp2_ref, dwa1_ref, dba1_ref, dwa2_ref, dba2_ref) = refs[-12:]
    (_, T, _) = qpos_ref.shape
    (_, M, _) = kpos_ref.shape
    cd = compute_dtype
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init_df():
        df_ref[0] = jnp.zeros_like(df_ref[0])

    @pl.when(jnp.logical_and(b_idx == 0, t_idx == 0))
    def _init_weight_grads():
        dwk_ref[:] = jnp.zeros_like(dwk_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwp1_ref[:] = jnp.zeros_like(dwp1_ref)
        dbp1_ref[:] = jnp.zeros_like(dbp1_ref)
        dwp2_ref[:] = jnp.zeros_like(dwp2_ref)
        dbp2_ref[:] = jnp.zeros_like(dbp2_ref)
        dwa1_ref[:] = jnp.zeros_like(dwa1_ref)
        dba1_ref[:] = jnp.zeros_like(dba1_ref)
        dwa2_ref[:] = jnp.zeros_like(dwa2_ref)
        dba2_ref[:] = jnp.zeros_like(dba2_ref)

    qpos = qpos_ref[0]                                             # (T, 3) f32.
    qproj = qproj_ref[0]                                           # (T, D).
    col = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.float32(dim))

    # ---- Recompute forward (full-K row stacks, k-major along axis 0) ----
    if use_idx:
        ki = ki_ref[0]                                             # (T, LANES).
        onehots = [(col == ki[:, j:j + 1]).astype(cd) for j in range(k)]
    else:
        prod = jax.lax.dot_general(
            qpos, kpos_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                   # (T, M).
        d = kn_ref[0] - 2.0 * prod
        onehots = []
        for _j in range(k):
            m = jnp.min(d, axis=1, keepdims=True)
            idx = jnp.min(jnp.where(d <= m, col, _BIG_I), axis=1, keepdims=True)
            d = jnp.where(col == idx, jnp.inf, d)
            onehots.append((col == idx).astype(cd))
    G = jnp.concatenate(onehots, axis=0)                           # (K*T, M).

    def tile_k(x):  # (T, C) -> (K*T, C).
        return jnp.concatenate([x] * k, axis=0)

    qpos_g = tile_k(qpos)
    qproj_g = tile_k(qproj)
    g_all = _mm(G, fv_ref[0], cd)                                  # (K*T, C).
    if premul:
        k_g = g_all[:, :dim]
        v_g = g_all[:, dim:2 * dim]
        p_g = g_all[:, 2 * dim:2 * dim + 3]
        f_g = None
    else:
        f_g = g_all[:, :feat]
        p_g = g_all[:, feat:feat + 3]
        k_g = _mm(f_g, wk_ref[:], cd)                              # (K*T, D).
        v_g = _mm(f_g, wv_ref[:], cd)                              # (K*T, D).

    rel = qpos_g - p_g                                             # (K*T, 3).
    ph_pre = _mm(rel, wp1_ref[:], cd) + bp1_ref[:]
    ph = jnp.maximum(ph_pre, 0.0)                                  # (K*T, P).
    pe = _mm(ph, wp2_ref[:], cd) + bp2_ref[:]                      # (K*T, D).

    hpre = qproj_g - k_g + pe                                      # (K*T, D).
    h1 = _mm(hpre, wa1_ref[:], cd) + ba1_ref[:]                    # (K*T, H).
    h1r = jnp.maximum(h1, 0.0)
    lg = (_mm(h1r, wa2_ref[:], cd) + ba2_ref[:]) * inv_sqrt_d      # (K*T, D) f32.

    # Plain (non-online) softmax over the K axis, per channel.
    mx = lg[:T]
    for j in range(1, k):
        mx = jnp.maximum(mx, lg[j * T:(j + 1) * T])
    e = jnp.exp(lg - tile_k(mx))                                   # (K*T, D).
    den = e[:T]
    for j in range(1, k):
        den = den + e[j * T:(j + 1) * T]
    a = e / tile_k(den)                                            # (K*T, D) f32.

    # ---- Chain gradients ----
    g_out = g_ref[0].astype(jnp.float32)                           # (T, D).
    g_g = tile_k(g_out)
    dvpe = a * g_g                                                 # d(v + pe).
    da = g_g * (v_g.astype(jnp.float32) + pe.astype(jnp.float32))
    s = (a * da)[:T]
    for j in range(1, k):
        s = s + (a * da)[j * T:(j + 1) * T]
    dmlp = a * (da - tile_k(s)) * inv_sqrt_d                       # (K*T, D).

    dwa2_ref[:] += _mm2(h1r, dmlp, ((0,), (0,)), cd)               # (H, D).
    dba2_ref[:] += jnp.sum(dmlp, axis=0, keepdims=True)
    dh1 = _mm2(dmlp, wa2_ref[:], ((1,), (1,)), cd)                 # (K*T, H).
    dh1 = jnp.where(h1 > 0, dh1, 0.0)

    dwa1_ref[:] += _mm2(hpre, dh1, ((0,), (0,)), cd)               # (D, H).
    dba1_ref[:] += jnp.sum(dh1, axis=0, keepdims=True)
    dhpre = _mm2(dh1, wa1_ref[:], ((1,), (1,)), cd)                # (K*T, D).

    dq = dhpre[:T]
    for j in range(1, k):
        dq = dq + dhpre[j * T:(j + 1) * T]
    dqproj_ref[0] = dq                                             # (T, D) f32.

    dpe = dhpre + dvpe                                             # (K*T, D).
    dwp2_ref[:] += _mm2(ph, dpe, ((0,), (0,)), cd)                 # (P, D).
    dbp2_ref[:] += jnp.sum(dpe, axis=0, keepdims=True)
    dph = _mm2(dpe, wp2_ref[:], ((1,), (1,)), cd)                  # (K*T, P).
    dph = jnp.where(ph_pre > 0, dph, 0.0)
    dwp1_ref[:] += _mm2(rel, dph, ((0,), (0,)), cd)                # (3, P).
    dbp1_ref[:] += jnp.sum(dph, axis=0, keepdims=True)

    # Key/value grads: dk rows = -dhpre (from q - k + pe), dv rows = dvpe.
    dk_g = -dhpre                                                  # (K*T, D).
    dv_g = dvpe                                                    # (K*T, D).
    if premul:
        # Scatter projected-space grads; the wrapper's outer to_k/to_v matmuls
        # chain them to dfeats/dW via XLA autodiff.
        rows = jnp.concatenate([dk_g, dv_g], axis=-1)              # (K*T, 2D).
        df_ref[0] += _mm2(G, rows, ((0,), (0,)), cd)               # (M, 2D).
    else:
        # Chain through the in-kernel projections (dW accumulate; df rows via
        # W^T), then scatter feature grads through the transposed one-hot.
        dwk_ref[:] += _mm2(f_g, dk_g, ((0,), (0,)), cd)            # (E, D).
        dwv_ref[:] += _mm2(f_g, dv_g, ((0,), (0,)), cd)            # (E, D).
        df_rows = (_mm2(dk_g, wk_ref[:], ((1,), (1,)), cd)
                   + _mm2(dv_g, wv_ref[:], ((1,), (1,)), cd))      # (K*T, E).
        df_ref[0] += _mm2(G, df_rows, ((0,), (0,)), cd)            # (M, E).


@functools.partial(jax.jit, static_argnames=('k', 'dim', 'feat', 'tile_n',
                                              'compute_dtype', 'interpret',
                                              'premul', 'use_idx'))
def _attn_bwd_call(qpos, qproj, kpos, fv, kn, ki, wk, wv, wp1, bp1, wp2, bp2,
                   wa1, ba1, wa2, ba2, g, k, dim, feat, tile_n, compute_dtype,
                   interpret, premul, use_idx):
    (B, N_pad, _) = qpos.shape
    (_, M_pad, _) = kpos.shape
    C = fv.shape[-1]
    df_w = 2 * dim if premul else feat   # premul scatters [dk | dv] rows.
    (P,) = (wp1.shape[1],)
    H = wa1.shape[1]
    kern = functools.partial(_attn_bwd_kernel, k=k, dim=dim, feat=feat,
                             compute_dtype=compute_dtype, premul=premul,
                             use_idx=use_idx)
    grid = (B, N_pad // tile_n)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M_pad, 3), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M_pad, C), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, M_pad), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        w_spec(wk.shape), w_spec(wv.shape),
        w_spec(wp1.shape), w_spec(bp1.shape), w_spec(wp2.shape),
        w_spec(bp2.shape), w_spec(wa1.shape), w_spec(ba1.shape),
        w_spec(wa2.shape), w_spec(ba2.shape),
        pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qpos, qproj, kpos, fv, kn, wk, wv, wp1, bp1, wp2, bp2, wa1,
                ba1, wa2, ba2, g]
    if use_idx:
        in_specs.append(pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(ki)

    f32 = jnp.float32
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_pad, df_w), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec(wk.shape), w_spec(wv.shape),
            w_spec((3, P)), w_spec((1, P)), w_spec((P, dim)), w_spec((1, dim)),
            w_spec((dim, H)), w_spec((1, H)), w_spec((H, dim)), w_spec((1, dim)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N_pad, dim), f32),
            jax.ShapeDtypeStruct((B, M_pad, df_w), f32),
            jax.ShapeDtypeStruct(wk.shape, f32),
            jax.ShapeDtypeStruct(wv.shape, f32),
            jax.ShapeDtypeStruct((3, P), f32),
            jax.ShapeDtypeStruct((1, P), f32),
            jax.ShapeDtypeStruct((P, dim), f32),
            jax.ShapeDtypeStruct((1, dim), f32),
            jax.ShapeDtypeStruct((dim, H), f32),
            jax.ShapeDtypeStruct((1, H), f32),
            jax.ShapeDtypeStruct((H, dim), f32),
            jax.ShapeDtypeStruct((1, dim), f32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19, 20, 21))
def _attn_flat(qpos, qproj, kpos, fv, kn, ki, wk, wv, wp1, bp1, wp2, bp2, wa1,
               ba1, wa2, ba2, k, dim, feat, tile_n, group, opts):
    '''Differentiable fused attention over the padded/flattened operands.
    Forward is the online-softmax kernel; backward is _attn_bwd_kernel. The
    gradient surface (qproj, fv's feature columns, to_k/to_v weights, MLP
    weights; zero for positions/kn/ki) matches the module path's autodiff
    semantics. opts = (compute_dtype, interpret, premul, use_idx); with
    premul=True, fv carries pre-projected [k_all | v_all | pos2], wk/wv are
    unused (1, 1) dummies, and the k/v gradients come back through fv's
    columns (the wrapper's outer matmuls chain them onward via XLA autodiff).
    With use_idx, ki carries knn_extract indices consumed by both kernels;
    otherwise it is a dummy.'''
    compute_dtype, interpret, premul, use_idx = opts
    return _attn_call(qpos, qproj, kpos, fv, kn, ki, wk, wv, wp1, bp1, wp2,
                      bp2, wa1, ba1, wa2, ba2, k, dim, feat, tile_n, group,
                      compute_dtype, interpret, premul, use_idx)


def _attn_flat_fwd(qpos, qproj, kpos, fv, kn, ki, wk, wv, wp1, bp1, wp2, bp2,
                   wa1, ba1, wa2, ba2, k, dim, feat, tile_n, group, opts):
    compute_dtype, interpret, premul, use_idx = opts
    out = _attn_call(qpos, qproj, kpos, fv, kn, ki, wk, wv, wp1, bp1, wp2, bp2,
                     wa1, ba1, wa2, ba2, k, dim, feat, tile_n, group,
                     compute_dtype, interpret, premul, use_idx)
    res = (qpos, qproj, kpos, fv, kn, ki, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1,
           wa2, ba2)
    return out, res


def _int_ct(x):
    '''Cotangent for an integer operand (jax requires float0 tangents).'''
    import numpy as _np
    return _np.zeros(x.shape, jax.dtypes.float0)


def _attn_flat_bwd(k, dim, feat, tile_n, group, opts, res, g):
    (qpos, qproj, kpos, fv, kn, ki, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2,
     ba2) = res
    compute_dtype, interpret, premul, use_idx = opts
    # Backward tiles full-K rows in VMEM; shrink the tile at large K to fit.
    bwd_tile = tile_n if k <= 16 else max(tile_n // 2, _LANES)
    if BWD_TILE_OVERRIDE:
        bwd_tile = max(int(BWD_TILE_OVERRIDE), _LANES)
    bwd_tile = min(bwd_tile, qpos.shape[1])
    (dqproj, df, dwk, dwv, dwp1, dbp1, dwp2, dbp2, dwa1, dba1, dwa2, dba2) = \
        _attn_bwd_call(qpos, qproj, kpos, fv, kn, ki, wk, wv, wp1, bp1, wp2,
                       bp2, wa1, ba1, wa2, ba2, jnp.asarray(g, jnp.float32), k,
                       dim, feat, bwd_tile, compute_dtype, interpret, premul,
                       use_idx)
    # fv's trailing pos2 columns carry no gradient.
    dfv = jnp.concatenate(
        [df, jnp.zeros(fv.shape[:2] + (3,), df.dtype)], axis=-1)
    zeros = lambda x: jnp.zeros(x.shape, x.dtype)
    return (zeros(qpos), dqproj.astype(qproj.dtype), zeros(kpos),
            dfv.astype(fv.dtype), zeros(kn), _int_ct(ki),
            dwk.astype(wk.dtype), dwv.astype(wv.dtype),
            dwp1.astype(wp1.dtype), dbp1.astype(bp1.dtype),
            dwp2.astype(wp2.dtype), dbp2.astype(bp2.dtype),
            dwa1.astype(wa1.dtype), dba1.astype(ba1.dtype),
            dwa2.astype(wa2.dtype), dba2.astype(ba2.dtype))


_attn_flat.defvjp(_attn_flat_fwd, _attn_flat_bwd)


def _interp_kernel(qpos_ref, kpos_ref, feats_ref, kn_ref, *refs,
                   k, group, eps, compute_dtype, use_idx=False):
    '''
    kNN + inverse-distance feature interpolation in one pass (the decoder's
    conditioning step, implicit.py:328-339 semantics): for each query, find the
    k nearest keys, weight their features by 1/(dist+eps), L1-normalize.
    Same extraction/gather structure as _attn_kernel; the j-th neighbor's
    distance falls out of the argmin for free, so weights cost nothing extra.
    Block shapes: qpos (1, T, 3) f32; kpos (1, M, 3) f32; feats (1, M, E);
    kn (1, 1, M) f32 (+inf masked); out (1, T, E) f32.

    use_idx: refs gains leading ki (1, T, LANES) i32 + kd (1, T, LANES) f32
    blocks of precomputed neighbor indices and squared Euclidean distances
    (knn_extract output, shared with the attention layers); the extraction is
    skipped and the weights come from kd - identical floats (kd stores the
    same m + qn the extraction produces).
    '''
    ki_ref = refs[0] if use_idx else None
    kd_ref = refs[1] if use_idx else None
    out_ref = refs[-1]
    (_, T, _) = qpos_ref.shape
    (_, M, _) = kpos_ref.shape
    E = feats_ref.shape[-1]
    cd = compute_dtype
    qpos = qpos_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)

    if use_idx:
        ki = ki_ref[0]                                             # (T, LANES).
        kd = kd_ref[0]                                             # (T, LANES).
    else:
        prod = jax.lax.dot_general(
            qpos, kpos_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                   # (T, M).
        qn = jnp.sum(jnp.square(qpos), axis=-1, keepdims=True)     # (T, 1).
        d = kn_ref[0] - 2.0 * prod

    group = max(1, min(group, k))
    acc = jnp.zeros((T, E), jnp.float32)
    den = jnp.zeros((T, 1), jnp.float32)
    for j0 in range(0, k, group):
        g_sz = min(group, k - j0)
        onehots, ws = [], []
        for _j in range(g_sz):
            if use_idx:
                j = j0 + _j
                onehots.append(col == ki[:, j:j + 1])
                ws.append(1.0 / (jnp.sqrt(jnp.maximum(kd[:, j:j + 1], 0.0))
                                 + eps))
                continue
            m = jnp.min(d, axis=1, keepdims=True)                  # (T, 1).
            idx = jnp.min(jnp.where(d <= m, col, _BIG_I), axis=1,
                          keepdims=True)
            d = jnp.where(col == idx, jnp.inf, d)
            onehots.append(col == idx)
            # Euclidean distance: the key norm in `m` lacks the query norm term.
            ws.append(1.0 / (jnp.sqrt(jnp.maximum(m + qn, 0.0)) + eps))
        onehot = (onehots[0] if g_sz == 1
                  else jnp.concatenate(onehots, axis=0))           # (G*T, M).
        g = _mm(onehot, feats_ref[0], cd)                          # (G*T, E).
        for gi in range(g_sz):
            acc = acc + ws[gi] * g[gi * T:(gi + 1) * T]
            den = den + ws[gi]
    out_ref[0] = acc / den


@functools.partial(jax.jit, static_argnames=('k', 'tile_n', 'group', 'eps',
                                              'compute_dtype', 'interpret',
                                              'use_idx'))
def _interp_call(qpos, kpos, feats, kn, ki, kd, k, tile_n, group, eps,
                 compute_dtype, interpret, use_idx):
    (B, N_pad, _) = qpos.shape
    (_, M_pad, _) = kpos.shape
    E = feats.shape[-1]
    kern = functools.partial(_interp_kernel, k=k, group=group, eps=eps,
                             compute_dtype=compute_dtype, use_idx=use_idx)
    in_specs = [
        pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M_pad, 3), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M_pad, E), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, M_pad), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qpos, kpos, feats, kn]
    if use_idx:
        in_specs += [pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [ki, kd]
    out = pl.pallas_call(
        kern,
        grid=(B, N_pad // tile_n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_n, E), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N_pad, E), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out


def _interp_bwd_kernel(qpos_ref, kpos_ref, feats_ref, kn_ref, g_ref, *refs,
                       k, eps, compute_dtype, use_idx=False):
    '''Backward of _interp_kernel w.r.t. the key features only: the inverse-
    distance weights are functions of (stop-gradient) positions, matching the
    module path (models/implicit.py:218-224, kNN inputs stop-gradient there).
    dfeats_j += sum_n [j in kNN(n)] * (w_nj / den_n) * g_n, scattered through
    the transposed one-hot matmul. Accumulated across query tiles.
    use_idx: leading ki/kd blocks replace the extraction (see _interp_kernel).'''
    ki_ref = refs[0] if use_idx else None
    kd_ref = refs[1] if use_idx else None
    dfeats_ref = refs[-1]
    (_, T, _) = qpos_ref.shape
    (_, M, _) = kpos_ref.shape
    cd = compute_dtype
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    qpos = qpos_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    if use_idx:
        ki, kd = ki_ref[0], kd_ref[0]
        onehots = [(col == ki[:, j:j + 1]).astype(cd) for j in range(k)]
        ws = [1.0 / (jnp.sqrt(jnp.maximum(kd[:, j:j + 1], 0.0)) + eps)
              for j in range(k)]
    else:
        prod = jax.lax.dot_general(
            qpos, kpos_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        qn = jnp.sum(jnp.square(qpos), axis=-1, keepdims=True)
        d = kn_ref[0] - 2.0 * prod

        onehots, ws = [], []
        for _j in range(k):
            m = jnp.min(d, axis=1, keepdims=True)
            idx = jnp.min(jnp.where(d <= m, col, _BIG_I), axis=1, keepdims=True)
            d = jnp.where(col == idx, jnp.inf, d)
            onehots.append((col == idx).astype(cd))
            ws.append(1.0 / (jnp.sqrt(jnp.maximum(m + qn, 0.0)) + eps))  # (T, 1).
    den = ws[0]
    for j in range(1, k):
        den = den + ws[j]

    g = g_ref[0].astype(jnp.float32)                                   # (T, E).
    G = jnp.concatenate(onehots, axis=0)                               # (K*T, M).
    rows = jnp.concatenate([(w / den) * g for w in ws], axis=0)        # (K*T, E).
    dfeats_ref[0] += jax.lax.dot_general(
        G, rows.astype(cd), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                            # (M, E).


@functools.partial(jax.jit, static_argnames=('k', 'tile_n', 'eps',
                                              'compute_dtype', 'interpret',
                                              'use_idx'))
def _interp_bwd_call(qpos, kpos, feats, kn, ki, kd, g, k, tile_n, eps,
                     compute_dtype, interpret, use_idx):
    (B, N_pad, _) = qpos.shape
    (_, M_pad, _) = kpos.shape
    E = feats.shape[-1]
    kern = functools.partial(_interp_bwd_kernel, k=k, eps=eps,
                             compute_dtype=compute_dtype, use_idx=use_idx)
    in_specs = [
        pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M_pad, 3), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M_pad, E), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, M_pad), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n, E), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qpos, kpos, feats, kn, g]
    if use_idx:
        in_specs += [pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [ki, kd]
    out = pl.pallas_call(
        kern,
        grid=(B, N_pad // tile_n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, M_pad, E), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M_pad, E), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _interp_flat(qpos, kpos, feats, kn, ki, kd, k, tile_n, group, eps_cd,
                 interpret):
    eps, compute_dtype, use_idx = eps_cd
    return _interp_call(qpos, kpos, feats, kn, ki, kd, k, tile_n, group, eps,
                        compute_dtype, interpret, use_idx)


def _interp_flat_fwd(qpos, kpos, feats, kn, ki, kd, k, tile_n, group, eps_cd,
                     interpret):
    eps, compute_dtype, use_idx = eps_cd
    out = _interp_call(qpos, kpos, feats, kn, ki, kd, k, tile_n, group, eps,
                       compute_dtype, interpret, use_idx)
    return out, (qpos, kpos, feats, kn, ki, kd)


def _interp_flat_bwd(k, tile_n, group, eps_cd, interpret, res, g):
    (qpos, kpos, feats, kn, ki, kd) = res
    eps, compute_dtype, use_idx = eps_cd
    dfeats = _interp_bwd_call(qpos, kpos, feats, kn, ki, kd,
                              jnp.asarray(g, jnp.float32), k, tile_n, eps,
                              compute_dtype, interpret, use_idx)
    zeros = lambda x: jnp.zeros(x.shape, x.dtype)
    return (zeros(qpos), zeros(kpos), dfeats.astype(feats.dtype), zeros(kn),
            _int_ct(ki), zeros(kd))


_interp_flat.defvjp(_interp_flat_fwd, _interp_flat_bwd)


# --------------------------------------------------------------------------
# Shared neighbor-row gather (producer/consumer split of the one-hot gather).
#
# The decoder's three fused ops (interp + two attention layers) gather the
# SAME rows of the SAME raw [feats2 | pos2] value matrix (they share one
# knn_extract, and the bias-free to_k/to_v projections are applied after the
# gather), and their backward kernels re-gather and then scatter through the
# transposed one-hot a second time. At the scale-out abstract-cloud size
# (M_pad 2176) those one-hot matmuls are the decoder's dominant MXU cost:
# K*T*M*(E+3) MACs per gather/scatter, x3 forward + x5 backward-equivalent.
#
# knn_gather_rows materializes the gathered rows ONCE as g (B, K, N_pad, C)
# and the g-consuming kernel variants below read neighbor rows from g instead
# of gathering: the forward pays ONE gather, the backward pays ZERO (g is a
# residual) plus ONE scatter in the producer's VJP (cotangents from all
# consumers are summed by autodiff before the scatter). Bit-identity: the
# producer runs the exact _mm(onehot, fv, cd) the consumers ran in-kernel, so
# every downstream float is unchanged; only the gradient's scatter summation
# ORDER differs (one fused scatter instead of three accumulated ones), which
# is f32-associativity-level noise.
#
# The trade is MXU MACs for HBM traffic (g is written once and read by each
# consumer + their backwards), so it only pays above an abstract-cloud size
# threshold - see SHARED_GATHER_MIN_M in models/fused.py.
# --------------------------------------------------------------------------


def _gather_kernel(fv_ref, ki_ref, g_ref, *, k, group, compute_dtype):
    '''One-hot gather producer: g[0, j] = fv[ki[:, j]] for j < k.
    Blocks: fv (1, M, C) cd; ki (1, T, LANES) i32; g (1, k, T, C) g-dtype.
    _gather_call pins g_dtype = float32 unconditionally (even in bf16 mode,
    where the store would be lossless — the f32 accumulator holds exact bf16
    values): consumers re-cast g rows to their compute dtype, and an f32 store
    keeps the producer's VJP scatter accumulation exact. Any storage-dtype
    retune must revisit both.'''
    (_, T, _) = ki_ref.shape
    (_, M, _) = fv_ref.shape
    cd = compute_dtype
    ki = ki_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    for j0 in range(0, k, group):
        g_sz = min(group, k - j0)
        onehots = [col == ki[:, j0 + i:j0 + i + 1] for i in range(g_sz)]
        onehot = (onehots[0] if g_sz == 1
                  else jnp.concatenate(onehots, axis=0))            # (G*T, M).
        rows = _mm(onehot, fv_ref[0], cd)                           # (G*T, C).
        for i in range(g_sz):
            g_ref[0, j0 + i] = rows[i * T:(i + 1) * T].astype(g_ref.dtype)


def _scatter_kernel(ki_ref, dg_ref, dfv_ref, *, k, compute_dtype):
    '''Producer backward: dfv += sum_j onehot_j^T @ dg[0, j] (the transposed
    one-hot scatter the consumer backwards used to run each). Accumulated
    across query tiles (sequential grid).'''
    (_, T, _) = ki_ref.shape
    (_, M, _) = dfv_ref.shape
    cd = compute_dtype
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        dfv_ref[0] = jnp.zeros_like(dfv_ref[0])

    ki = ki_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    G = jnp.concatenate([(col == ki[:, j:j + 1]).astype(cd)
                         for j in range(k)], axis=0)                # (K*T, M).
    rows = jnp.concatenate([dg_ref[0, j] for j in range(k)], axis=0)
    dfv_ref[0] += _mm2(G, rows, ((0,), (0,)), cd)                   # (M, C).


@functools.partial(jax.jit, static_argnames=('k', 'tile_n', 'group',
                                              'compute_dtype', 'interpret'))
def _gather_call(fv, ki, k, tile_n, group, compute_dtype, interpret):
    (B, M_pad, C) = fv.shape
    (_, N_pad, _) = ki.shape
    # f32 storage in BOTH compute modes: the consumers' in-kernel gathers
    # produced f32 accumulators (of cd-typed values), so f32 rows make every
    # consumer bit-identical, and the f32 dg cotangents skip a lossy bf16
    # round-trip on the gradient sum.
    g_dtype = jnp.float32
    out = pl.pallas_call(
        functools.partial(_gather_kernel, k=k, group=group,
                          compute_dtype=compute_dtype),
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, M_pad, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, tile_n, C), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, k, N_pad, C), g_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(fv, ki)
    return out


@functools.partial(jax.jit, static_argnames=('m_pad', 'k', 'tile_n',
                                              'compute_dtype', 'interpret'))
def _scatter_call(ki, dg, m_pad, k, tile_n, compute_dtype, interpret):
    (B, _, N_pad, C) = dg.shape
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, k=k, compute_dtype=compute_dtype),
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_n, C), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m_pad, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(ki, dg)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _gather_flat(fv, ki, k, tile_n, group, opts):
    compute_dtype, interpret = opts
    return _gather_call(fv, ki, k, tile_n, group, compute_dtype, interpret)


def _gather_flat_fwd(fv, ki, k, tile_n, group, opts):
    compute_dtype, interpret = opts
    out = _gather_call(fv, ki, k, tile_n, group, compute_dtype, interpret)
    # The backward needs only ki and fv's shape/dtype; a zero-width proxy
    # keeps the residual tree light (fv itself stays alive at the caller).
    return out, (jnp.zeros((fv.shape[0], fv.shape[1], 0), fv.dtype), ki)


def _gather_flat_bwd(k, tile_n, group, opts, res, dg):
    fv_proxy, ki = res
    compute_dtype, interpret = opts
    dfv = _scatter_call(ki, jnp.asarray(dg, jnp.float32), fv_proxy.shape[1],
                        k, tile_n, compute_dtype, interpret)
    return (dfv.astype(fv_proxy.dtype), _int_ct(ki))


_gather_flat.defvjp(_gather_flat_fwd, _gather_flat_bwd)


def _attn_g_kernel(qpos_ref, qproj_ref, g_in_ref, wk_ref, wv_ref,
                   wp1_ref, bp1_ref, wp2_ref, bp2_ref,
                   wa1_ref, ba1_ref, wa2_ref, ba2_ref, out_ref,
                   *, k, dim, feat, group, compute_dtype):
    '''_attn_kernel over pre-gathered neighbor rows: g_in (1, K>=k, T, C) from
    knn_gather_rows replaces kpos/fv/kn/ki and the in-kernel one-hot gather
    (the first k rows are this layer's neighbors - the shared extraction is
    the greedy ascending sequence, so a k-prefix is exactly what the in-kernel
    extraction would have produced). Identical floats downstream.'''
    (_, T, _) = qpos_ref.shape
    cd = compute_dtype
    qpos = qpos_ref[0]                                             # (T, 3) f32.
    qproj = qproj_ref[0]                                           # (T, D).
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.float32(dim))

    group = max(1, min(group, k))
    if group > 1:
        qpos_g = jnp.concatenate([qpos] * group, axis=0)           # (G*T, 3).
        qproj_g = jnp.concatenate([qproj] * group, axis=0)         # (G*T, D).
    else:
        qpos_g, qproj_g = qpos, qproj

    run_mx = jnp.full((T, dim), -jnp.inf, jnp.float32)
    run_den = jnp.zeros((T, dim), jnp.float32)
    run_acc = jnp.zeros((T, dim), jnp.float32)
    for j0 in range(0, k, group):
        g_sz = min(group, k - j0)
        rows = [g_in_ref[0, j0 + i] for i in range(g_sz)]
        g = (rows[0] if g_sz == 1
             else jnp.concatenate(rows, axis=0))                   # (G*T, C).
        f_g = g[:, :feat]
        p_g = g[:, feat:feat + 3].astype(jnp.float32)
        k_g = _mm(f_g, wk_ref[:], cd)                              # (G*T, D).
        v_g = _mm(f_g, wv_ref[:], cd)                              # (G*T, D).
        qp = qpos_g[:g_sz * T]
        qj = qproj_g[:g_sz * T]

        pe = _mm(qp - p_g, wp1_ref[:], cd) + bp1_ref[:]
        pe = _mm(jnp.maximum(pe, 0.0), wp2_ref[:], cd) + bp2_ref[:]  # (G*T, D).

        h = _mm(qj - k_g + pe, wa1_ref[:], cd) + ba1_ref[:]
        lg_g = (_mm(jnp.maximum(h, 0.0), wa2_ref[:], cd) + ba2_ref[:]) * inv_sqrt_d

        vpe = v_g + pe
        for gi in range(g_sz):
            sl = slice(gi * T, (gi + 1) * T)
            lg = lg_g[sl]
            new_mx = jnp.maximum(run_mx, lg)
            scale = jnp.exp(run_mx - new_mx)
            e = jnp.exp(lg - new_mx)
            run_den = run_den * scale + e
            run_acc = run_acc * scale + e * vpe[sl]
            run_mx = new_mx

    out_ref[0] = run_acc / run_den                                 # (T, D).


@functools.partial(jax.jit, static_argnames=('k', 'dim', 'feat', 'tile_n',
                                              'group', 'compute_dtype',
                                              'interpret'))
def _attn_g_call(qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2, wa1,
                 ba1, wa2, ba2, k, dim, feat, tile_n, group, compute_dtype,
                 interpret):
    (B, N_pad, _) = qpos.shape
    (_, K_ext, _, C) = g_in.shape
    kern = functools.partial(_attn_g_kernel, k=k, dim=dim, feat=feat,
                             group=group, compute_dtype=compute_dtype)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_n, C), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            w_spec(wk.shape), w_spec(wv.shape),
            w_spec(wp1.shape), w_spec(bp1.shape), w_spec(wp2.shape),
            w_spec(bp2.shape), w_spec(wa1.shape), w_spec(ba1.shape),
            w_spec(wa2.shape), w_spec(ba2.shape),
        ],
        out_specs=pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N_pad, dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2)
    return out


def _attn_g_bwd_kernel(qpos_ref, qproj_ref, g_in_ref, wk_ref, wv_ref,
                       wp1_ref, bp1_ref, wp2_ref, bp2_ref,
                       wa1_ref, ba1_ref, wa2_ref, ba2_ref, g_ref,
                       dqproj_ref, dg_ref, dwk_ref, dwv_ref, dwp1_ref,
                       dbp1_ref, dwp2_ref, dbp2_ref, dwa1_ref, dba1_ref,
                       dwa2_ref, dba2_ref,
                       *, k, k_ext, dim, feat, compute_dtype):
    '''Backward of _attn_g_kernel: the forward recompute reads the gathered
    rows from g_in (no re-gather matmul), and the neighbor-row gradients are
    WRITTEN as dg rows (1, K_ext, T, C) instead of being scattered to the key
    axis here - the producer's VJP runs one fused scatter over the summed
    consumer cotangents. Rows >= k and the pos2 columns are zero (positions
    are stop-gradient, matching the module path). Weight grads accumulate
    across grid steps as in _attn_bwd_kernel.'''
    (_, T, _) = qpos_ref.shape
    cd = compute_dtype
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    @pl.when(jnp.logical_and(b_idx == 0, t_idx == 0))
    def _init_weight_grads():
        dwk_ref[:] = jnp.zeros_like(dwk_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwp1_ref[:] = jnp.zeros_like(dwp1_ref)
        dbp1_ref[:] = jnp.zeros_like(dbp1_ref)
        dwp2_ref[:] = jnp.zeros_like(dwp2_ref)
        dbp2_ref[:] = jnp.zeros_like(dbp2_ref)
        dwa1_ref[:] = jnp.zeros_like(dwa1_ref)
        dba1_ref[:] = jnp.zeros_like(dba1_ref)
        dwa2_ref[:] = jnp.zeros_like(dwa2_ref)
        dba2_ref[:] = jnp.zeros_like(dba2_ref)

    qpos = qpos_ref[0]                                             # (T, 3) f32.
    qproj = qproj_ref[0]                                           # (T, D).
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.float32(dim))

    def tile_k(x):  # (T, C) -> (K*T, C).
        return jnp.concatenate([x] * k, axis=0)

    qpos_g = tile_k(qpos)
    qproj_g = tile_k(qproj)
    # ---- Recompute forward from the materialized gathered rows ----
    g_all = jnp.concatenate([g_in_ref[0, j] for j in range(k)], axis=0)
    f_g = g_all[:, :feat]
    p_g = g_all[:, feat:feat + 3].astype(jnp.float32)
    k_g = _mm(f_g, wk_ref[:], cd)                                  # (K*T, D).
    v_g = _mm(f_g, wv_ref[:], cd)                                  # (K*T, D).

    rel = qpos_g - p_g                                             # (K*T, 3).
    ph_pre = _mm(rel, wp1_ref[:], cd) + bp1_ref[:]
    ph = jnp.maximum(ph_pre, 0.0)                                  # (K*T, P).
    pe = _mm(ph, wp2_ref[:], cd) + bp2_ref[:]                      # (K*T, D).

    hpre = qproj_g - k_g + pe                                      # (K*T, D).
    h1 = _mm(hpre, wa1_ref[:], cd) + ba1_ref[:]                    # (K*T, H).
    h1r = jnp.maximum(h1, 0.0)
    lg = (_mm(h1r, wa2_ref[:], cd) + ba2_ref[:]) * inv_sqrt_d      # (K*T, D) f32.

    mx = lg[:T]
    for j in range(1, k):
        mx = jnp.maximum(mx, lg[j * T:(j + 1) * T])
    e = jnp.exp(lg - tile_k(mx))                                   # (K*T, D).
    den = e[:T]
    for j in range(1, k):
        den = den + e[j * T:(j + 1) * T]
    a = e / tile_k(den)                                            # (K*T, D) f32.

    # ---- Chain gradients ----
    g_out = g_ref[0].astype(jnp.float32)                           # (T, D).
    g_g = tile_k(g_out)
    dvpe = a * g_g                                                 # d(v + pe).
    da = g_g * (v_g.astype(jnp.float32) + pe.astype(jnp.float32))
    s = (a * da)[:T]
    for j in range(1, k):
        s = s + (a * da)[j * T:(j + 1) * T]
    dmlp = a * (da - tile_k(s)) * inv_sqrt_d                       # (K*T, D).

    dwa2_ref[:] += _mm2(h1r, dmlp, ((0,), (0,)), cd)               # (H, D).
    dba2_ref[:] += jnp.sum(dmlp, axis=0, keepdims=True)
    dh1 = _mm2(dmlp, wa2_ref[:], ((1,), (1,)), cd)                 # (K*T, H).
    dh1 = jnp.where(h1 > 0, dh1, 0.0)

    dwa1_ref[:] += _mm2(hpre, dh1, ((0,), (0,)), cd)               # (D, H).
    dba1_ref[:] += jnp.sum(dh1, axis=0, keepdims=True)
    dhpre = _mm2(dh1, wa1_ref[:], ((1,), (1,)), cd)                # (K*T, D).

    dq = dhpre[:T]
    for j in range(1, k):
        dq = dq + dhpre[j * T:(j + 1) * T]
    dqproj_ref[0] = dq                                             # (T, D) f32.

    dpe = dhpre + dvpe                                             # (K*T, D).
    dwp2_ref[:] += _mm2(ph, dpe, ((0,), (0,)), cd)                 # (P, D).
    dbp2_ref[:] += jnp.sum(dpe, axis=0, keepdims=True)
    dph = _mm2(dpe, wp2_ref[:], ((1,), (1,)), cd)                  # (K*T, P).
    dph = jnp.where(ph_pre > 0, dph, 0.0)
    dwp1_ref[:] += _mm2(rel, dph, ((0,), (0,)), cd)                # (3, P).
    dbp1_ref[:] += jnp.sum(dph, axis=0, keepdims=True)

    dk_g = -dhpre                                                  # (K*T, D).
    dv_g = dvpe                                                    # (K*T, D).
    dwk_ref[:] += _mm2(f_g, dk_g, ((0,), (0,)), cd)                # (E, D).
    dwv_ref[:] += _mm2(f_g, dv_g, ((0,), (0,)), cd)                # (E, D).
    df_rows = (_mm2(dk_g, wk_ref[:], ((1,), (1,)), cd)
               + _mm2(dv_g, wv_ref[:], ((1,), (1,)), cd))          # (K*T, E).
    zero_row = jnp.zeros((T, dg_ref.shape[-1]), jnp.float32)
    pos_pad = jnp.zeros((T, dg_ref.shape[-1] - feat), jnp.float32)
    for j in range(k_ext):
        if j < k:
            dg_ref[0, j] = jnp.concatenate(
                [df_rows[j * T:(j + 1) * T], pos_pad], axis=-1)
        else:
            dg_ref[0, j] = zero_row


@functools.partial(jax.jit, static_argnames=('k', 'dim', 'feat', 'tile_n',
                                              'compute_dtype', 'interpret'))
def _attn_g_bwd_call(qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2,
                     wa1, ba1, wa2, ba2, g, k, dim, feat, tile_n,
                     compute_dtype, interpret):
    (B, N_pad, _) = qpos.shape
    (_, K_ext, _, C) = g_in.shape
    (P,) = (wp1.shape[1],)
    H = wa1.shape[1]
    kern = functools.partial(_attn_g_bwd_kernel, k=k, k_ext=K_ext, dim=dim,
                             feat=feat, compute_dtype=compute_dtype)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        kern,
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_n, C), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            w_spec(wk.shape), w_spec(wv.shape),
            w_spec(wp1.shape), w_spec(bp1.shape), w_spec(wp2.shape),
            w_spec(bp2.shape), w_spec(wa1.shape), w_spec(ba1.shape),
            w_spec(wa2.shape), w_spec(ba2.shape),
            pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_ext, tile_n, C), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            w_spec(wk.shape), w_spec(wv.shape),
            w_spec((3, P)), w_spec((1, P)), w_spec((P, dim)), w_spec((1, dim)),
            w_spec((dim, H)), w_spec((1, H)), w_spec((H, dim)), w_spec((1, dim)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N_pad, dim), f32),
            jax.ShapeDtypeStruct((B, K_ext, N_pad, C), f32),
            jax.ShapeDtypeStruct(wk.shape, f32),
            jax.ShapeDtypeStruct(wv.shape, f32),
            jax.ShapeDtypeStruct((3, P), f32),
            jax.ShapeDtypeStruct((1, P), f32),
            jax.ShapeDtypeStruct((P, dim), f32),
            jax.ShapeDtypeStruct((1, dim), f32),
            jax.ShapeDtypeStruct((dim, H), f32),
            jax.ShapeDtypeStruct((1, H), f32),
            jax.ShapeDtypeStruct((H, dim), f32),
            jax.ShapeDtypeStruct((1, dim), f32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2, g)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18))
def _attn_flat_g(qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1,
                 wa2, ba2, k, dim, feat, tile_n, group, opts):
    '''Differentiable fused attention over pre-gathered neighbor rows (the
    knn_gather_rows producer). Gradient surface: qproj, the gathered rows'
    feature columns (as dg, scattered to the key axis by the producer's VJP),
    and the projection/MLP weights; zero for positions.'''
    compute_dtype, interpret = opts
    return _attn_g_call(qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2, wa1,
                        ba1, wa2, ba2, k, dim, feat, tile_n, group,
                        compute_dtype, interpret)


def _attn_flat_g_fwd(qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1,
                     wa2, ba2, k, dim, feat, tile_n, group, opts):
    compute_dtype, interpret = opts
    out = _attn_g_call(qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2, wa1,
                       ba1, wa2, ba2, k, dim, feat, tile_n, group,
                       compute_dtype, interpret)
    res = (qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2)
    return out, res


def _attn_flat_g_bwd(k, dim, feat, tile_n, group, opts, res, g):
    (qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2) = res
    compute_dtype, interpret = opts
    bwd_tile = tile_n if k <= 16 else max(tile_n // 2, _LANES)
    if BWD_TILE_OVERRIDE:
        bwd_tile = max(int(BWD_TILE_OVERRIDE), _LANES)
    bwd_tile = min(bwd_tile, qpos.shape[1])
    (dqproj, dg, dwk, dwv, dwp1, dbp1, dwp2, dbp2, dwa1, dba1, dwa2, dba2) = \
        _attn_g_bwd_call(qpos, qproj, g_in, wk, wv, wp1, bp1, wp2, bp2,
                         wa1, ba1, wa2, ba2, jnp.asarray(g, jnp.float32), k,
                         dim, feat, bwd_tile, compute_dtype, interpret)
    zeros = lambda x: jnp.zeros(x.shape, x.dtype)
    return (zeros(qpos), dqproj.astype(qproj.dtype), dg.astype(g_in.dtype),
            dwk.astype(wk.dtype), dwv.astype(wv.dtype),
            dwp1.astype(wp1.dtype), dbp1.astype(bp1.dtype),
            dwp2.astype(wp2.dtype), dbp2.astype(bp2.dtype),
            dwa1.astype(wa1.dtype), dba1.astype(ba1.dtype),
            dwa2.astype(wa2.dtype), dba2.astype(ba2.dtype))


_attn_flat_g.defvjp(_attn_flat_g_fwd, _attn_flat_g_bwd)


def _interp_g_kernel(kd_ref, g_in_ref, out_ref, *, k, feat, compute_dtype,
                     eps):
    '''_interp_kernel over pre-gathered rows: g_in (1, K>=k, T, C) with
    [feats | pos] columns; weights from the shared extraction's squared
    distances kd (identical floats to the in-kernel extraction).'''
    (_, T, _) = kd_ref.shape
    kd = kd_ref[0]
    acc = jnp.zeros((T, feat), jnp.float32)
    den = jnp.zeros((T, 1), jnp.float32)
    for j in range(k):
        w = 1.0 / (jnp.sqrt(jnp.maximum(kd[:, j:j + 1], 0.0)) + eps)
        acc = acc + w * g_in_ref[0, j, :, :feat].astype(jnp.float32)
        den = den + w
    out_ref[0] = acc / den


@functools.partial(jax.jit, static_argnames=('k', 'feat', 'tile_n', 'eps',
                                              'compute_dtype', 'interpret'))
def _interp_g_call(kd, g_in, k, feat, tile_n, eps, compute_dtype, interpret):
    (B, N_pad, _) = kd.shape
    C = g_in.shape[-1]
    out = pl.pallas_call(
        functools.partial(_interp_g_kernel, k=k, feat=feat, eps=eps,
                          compute_dtype=compute_dtype),
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_n, C), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, feat), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N_pad, feat), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(kd, g_in)
    return out


def _interp_g_bwd_kernel(kd_ref, g_ref, dg_ref, *, k, k_ext, feat, eps):
    '''Backward of _interp_g_kernel w.r.t. the gathered rows: dg[0, j] rows =
    (w_j / den) * g for j < k on the feature columns; pos columns and rows
    >= k are zero. The producer's VJP scatters dg to the key axis.'''
    (_, T, _) = kd_ref.shape
    kd = kd_ref[0]
    ws = [1.0 / (jnp.sqrt(jnp.maximum(kd[:, j:j + 1], 0.0)) + eps)
          for j in range(k)]
    den = ws[0]
    for j in range(1, k):
        den = den + ws[j]
    g = g_ref[0].astype(jnp.float32)                               # (T, feat).
    C = dg_ref.shape[-1]
    pos_pad = jnp.zeros((T, C - feat), jnp.float32)
    zero_row = jnp.zeros((T, C), jnp.float32)
    for j in range(k_ext):
        if j < k:
            dg_ref[0, j] = jnp.concatenate([(ws[j] / den) * g, pos_pad],
                                           axis=-1)
        else:
            dg_ref[0, j] = zero_row


@functools.partial(jax.jit, static_argnames=('k', 'k_ext', 'c', 'feat',
                                              'tile_n', 'eps', 'interpret'))
def _interp_g_bwd_call(kd, g, k, k_ext, c, feat, tile_n, eps, interpret):
    (B, N_pad, _) = kd.shape
    K_ext, C = k_ext, c
    out = pl.pallas_call(
        functools.partial(_interp_g_bwd_kernel, k=k, k_ext=K_ext, feat=feat,
                          eps=eps),
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, feat), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K_ext, tile_n, C), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K_ext, N_pad, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(kd, g)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _interp_flat_g(kd, g_in, k, feat, tile_n, eps_cd):
    eps, compute_dtype, interpret = eps_cd
    return _interp_g_call(kd, g_in, k, feat, tile_n, eps, compute_dtype,
                          interpret)


def _interp_flat_g_fwd(kd, g_in, k, feat, tile_n, eps_cd):
    eps, compute_dtype, interpret = eps_cd
    out = _interp_g_call(kd, g_in, k, feat, tile_n, eps, compute_dtype,
                         interpret)
    return out, (kd, jnp.zeros((0,) + g_in.shape[1:2], g_in.dtype))


def _interp_flat_g_bwd(k, feat, tile_n, eps_cd, res, g):
    kd, g_proxy = res
    eps, compute_dtype, interpret = eps_cd
    dg = _interp_g_bwd_call(kd, jnp.asarray(g, jnp.float32), k,
                            int(g_proxy.shape[1]), feat + 3, feat, tile_n,
                            eps, interpret)
    return (jnp.zeros(kd.shape, kd.dtype), dg.astype(g_proxy.dtype))


_interp_flat_g.defvjp(_interp_flat_g_fwd, _interp_flat_g_bwd)


def _knnidx_kernel(qpos_ref, kpos_ref, kn_ref, ki_ref, kd_ref, *, k):
    '''Shared-extraction producer: the same serial argmin loop the consumer
    kernels run, emitting (index, squared Euclidean distance) per neighbor so
    interp + both attention layers (+ their backward recomputes) can skip
    their own extractions. Same floats, same tie-breaks. Outputs are (T,
    LANES) blocks; lanes >= k carry 0 / +inf filler.'''
    (_, T, _) = qpos_ref.shape
    (_, M, _) = kpos_ref.shape
    qpos = qpos_ref[0]                                             # (T, 3) f32.
    col = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, _LANES), 1)
    prod = jax.lax.dot_general(
        qpos, kpos_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                       # (T, M).
    qn = jnp.sum(jnp.square(qpos), axis=-1, keepdims=True)         # (T, 1).
    d = kn_ref[0] - 2.0 * prod

    ki = jnp.zeros((T, _LANES), jnp.int32)
    kd = jnp.full((T, _LANES), jnp.inf, jnp.float32)
    for j in range(k):
        m = jnp.min(d, axis=1, keepdims=True)                      # (T, 1).
        idx = jnp.min(jnp.where(d <= m, col, _BIG_I), axis=1, keepdims=True)
        d = jnp.where(col == idx, jnp.inf, d)
        ki = jnp.where(lane == j, idx, ki)
        kd = jnp.where(lane == j, m + qn, kd)
    ki_ref[0] = ki
    kd_ref[0] = kd


@functools.partial(jax.jit, static_argnames=('k', 'tile_n', 'interpret'))
def _knnidx_call(qpos, kpos, kn, k, tile_n, interpret):
    (B, N_pad, _) = qpos.shape
    (_, M_pad, _) = kpos.shape
    outs = pl.pallas_call(
        functools.partial(_knnidx_kernel, k=k),
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_pad, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile_n, _LANES), lambda b, t: (b, t, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, N_pad, _LANES), jnp.int32),
                   jax.ShapeDtypeStruct((B, N_pad, _LANES), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(qpos, kpos, kn)
    return outs


def knn_extract(q_pos, pos2, k, *, key_mask=None, tile_n=128):
    '''
    Shared exact-kNN extraction for the fused decoder kernels. The decoder
    otherwise runs THREE identical serial extractions over the same
    (query, abstract) pair per decode - fused_knn_interp plus two
    fused_knn_vector_attention layers, and their backward kernels recompute a
    fourth and fifth - each K argmin passes over the (tile, M) distance rows.
    Run this once and hand the result to the consumers via their knn=
    argument: the one-hots and weights are bit-identical to the in-kernel
    extraction (same loop, same tie-breaks, same floats).
    :param q_pos (B, N, 3); pos2 (B, M, 3); key_mask (B, M) bool or None.
    :return (ki (B, N_pad, 128) i32, kd (B, N_pad, 128) f32): neighbor
        indices into pos2 rows and squared Euclidean distances, ascending,
        PADDED to the kernel tile grid (pass to consumers whose q_pos/pos2/
        key_mask match; lanes >= k are filler).
    '''
    assert k <= 32
    # The producer has no autodiff rule and none is needed (the consumers
    # stop-gradient their kNN graphs too): cut tangents at the INPUTS so the
    # pallas_call stays a primal-only computation under jax.grad.
    q_pos = jax.lax.stop_gradient(q_pos)
    pos2 = jax.lax.stop_gradient(pos2)
    (B, N, _) = q_pos.shape
    (_, M, _) = pos2.shape
    tile_n = min(tile_n, max(_LANES, 1 << (N - 1).bit_length()))
    N_pad = -(-N // tile_n) * tile_n
    M_pad = -(-M // _LANES) * _LANES
    q_pos_p = jnp.pad(q_pos.astype(jnp.float32),
                      ((0, 0), (0, N_pad - N), (0, 0)))
    kpos_p = jnp.pad(pos2.astype(jnp.float32),
                     ((0, 0), (0, M_pad - M), (0, 0)))
    kn = jnp.sum(jnp.square(kpos_p), axis=-1)                      # (B, M_pad).
    in_play = jnp.arange(M_pad) < M
    if key_mask is not None:
        in_play = in_play[None] & jnp.pad(jnp.asarray(key_mask),
                                          ((0, 0), (0, M_pad - M)))
    kn = jnp.where(in_play, kn, jnp.inf)[:, None, :]
    interpret = jax.default_backend() != 'tpu'
    return _knnidx_call(q_pos_p, kpos_p, kn, int(k), int(tile_n), interpret)


def knn_gather_rows(pos2, feats2, knn, k, *, tile_n=128, group=4,
                    compute_dtype=jnp.float32):
    '''
    Materialize the kNN-gathered raw value rows g[b, j, n] = [feats2 | pos2]
    [b, ki[b, n, j]] ONCE for all fused-decoder consumers (interp + both
    attention layers pass it via gathered=), replacing three in-kernel one-hot
    gather matmuls (and their backwards' re-gathers and per-op scatters) with
    one gather + one scatter. Bit-identical consumer outputs: the producer
    runs the exact _mm(onehot, fv, cd) the consumers ran in-kernel.
    Differentiable w.r.t. feats2 (the VJP scatters the summed consumer
    cotangents through the transposed one-hot); positions are stop-gradient.
    :param pos2 (B, M, 3); feats2 (B, M, E); knn: knn_extract result whose
        N_pad/tile grid the consumers share; k: rows to gather (>= every
        consumer's k).
    :return g (B, k, N_pad, E+3) float32.
    '''
    assert k <= 32
    (B, M, E) = feats2.shape
    ki = knn[0]
    (_, N_pad, _) = ki.shape
    M_pad = -(-M // _LANES) * _LANES
    fv = jnp.concatenate([feats2.astype(jnp.float32),
                          pos2.astype(jnp.float32)], axis=-1)
    fv = jnp.pad(fv.astype(compute_dtype), ((0, 0), (0, M_pad - M), (0, 0)))
    interpret = jax.default_backend() != 'tpu'
    return _gather_flat(fv, ki, int(k), int(tile_n), int(group),
                        (compute_dtype, interpret))


def fused_knn_interp(q_pos, pos2, feats, k, *, eps=1e-4, key_mask=None,
                     tile_n=128, group=4, compute_dtype=jnp.float32,
                     knn=None, gathered=None):
    '''
    Fused kNN + inverse-distance interpolation: out_n = sum_j w_j f_j / sum_j w_j
    with w_j = 1 / (||q_n - p_j|| + eps) over the k nearest keys. Equivalent to
    knn + inverse_distance_weights + gather + einsum (ops/interpolate.py), in a
    single VMEM pass.
    :param q_pos (B, N, 3); pos2 (B, M, 3); feats (B, M, E); key_mask (B, M) or
        None.
    :param knn: optional knn_extract(q_pos, pos2, k'>=k, key_mask) result -
        skips the in-kernel extraction (bit-identical output).
    :param gathered: optional knn_gather_rows(pos2, feats, knn, k'>=k) result
        (requires knn for the distances) - reads pre-gathered rows instead of
        one-hot gathering; bit-identical output, gradients flow through the
        producer's fused scatter.
    :return (B, N, E) float32.
    '''
    assert k <= 32
    (B, N, _) = q_pos.shape
    (_, M, E) = feats.shape
    tile_n = min(tile_n, max(_LANES, 1 << (N - 1).bit_length()))
    N_pad = -(-N // tile_n) * tile_n
    M_pad = -(-M // _LANES) * _LANES

    if gathered is not None:
        assert knn is not None, 'gathered consumption needs knn distances'
        ki, kd = knn
        assert gathered.shape == (B, gathered.shape[1], N_pad, E + 3)
        assert gathered.shape[1] >= k
        interpret = jax.default_backend() != 'tpu'
        out = _interp_flat_g(kd, gathered, int(k), int(E), int(tile_n),
                             (float(eps), compute_dtype, interpret))
        return out[:, :N]

    q_pos_p = jnp.pad(q_pos.astype(jnp.float32),
                      ((0, 0), (0, N_pad - N), (0, 0)))
    kpos_p = jnp.pad(pos2.astype(jnp.float32),
                     ((0, 0), (0, M_pad - M), (0, 0)))
    feats_p = jnp.pad(feats.astype(compute_dtype),
                      ((0, 0), (0, M_pad - M), (0, 0)))
    kn = jnp.sum(jnp.square(kpos_p), axis=-1)                      # (B, M_pad).
    in_play = jnp.arange(M_pad) < M
    if key_mask is not None:
        in_play = in_play[None] & jnp.pad(jnp.asarray(key_mask),
                                          ((0, 0), (0, M_pad - M)))
    kn = jnp.where(in_play, kn, jnp.inf)[:, None, :]

    use_idx = knn is not None
    if use_idx:
        ki, kd = knn
        assert ki.shape == (B, N_pad, _LANES), (ki.shape, (B, N_pad, _LANES))
    else:
        ki = jnp.zeros((B, 1, _LANES), jnp.int32)
        kd = jnp.zeros((B, 1, _LANES), jnp.float32)

    interpret = jax.default_backend() != 'tpu'
    out = _interp_flat(q_pos_p, kpos_p, feats_p, kn, ki, kd, int(k),
                       int(tile_n), int(group),
                       (float(eps), compute_dtype, use_idx), interpret)
    return out[:, :N]


def fused_knn_vector_attention(q_proj, q_pos, feats2, pos2, params, k,
                               *, key_mask=None, tile_n=128, group=None,
                               compute_dtype=jnp.float32, knn=None,
                               gathered=None):
    '''
    One fused vector cross-attention block.
    :param q_proj (B, N, D): projected query features (to_q applied).
    :param q_pos (B, N, 3): query coordinates.
    :param feats2 (B, M, E): RAW key-side features - the to_k/to_v projections
        are applied in-kernel per gathered row, which makes the one-hot MXU
        gather E+3 wide instead of 2D+3 (the projections commute with the
        gather, so the dot products are identical).
    :param pos2 (B, M, 3): key coordinates.
    :param params: dict with to_k/to_v (bias-free) and pos_mlp_0/pos_mlp_2/
        attn_mlp_0/attn_mlp_2, each {'kernel', ['bias']} (flax layout).
    :param k (int): neighbors, k <= 32.
    :param key_mask (B, M) bool or None.
    :param group (int or None): neighbors per batched gather/MLP pass inside
        the kernel (None = 4, the measured sweet spot at the decode shapes;
        identical numerics at any value).
    :param compute_dtype: jnp.float32 (parity) or jnp.bfloat16 (fast).
    :param knn: optional knn_extract(q_pos, pos2, k, key_mask) result - skips
        the in-kernel extraction in BOTH the forward and the custom-VJP
        backward (bit-identical output/gradients).
    :param gathered: optional knn_gather_rows(pos2, feats2, knn, k'>=k) result
        - the kernels read pre-gathered neighbor rows instead of one-hot
        gathering from the key axis (bit-identical output; the neighbor-row
        gradients flow back through the producer's single fused scatter).
        feats2/pos2/key_mask are then used for shape checks only.
    :return (B, N, D) float32.
    '''
    assert k <= 32
    if group is None:
        group = DEFAULT_ATTN_GROUP
    (B, N, dim) = q_proj.shape
    (_, M, feat) = feats2.shape
    tile_n = min(tile_n, max(_LANES, 1 << (N - 1).bit_length()))
    N_pad = -(-N // tile_n) * tile_n
    M_pad = -(-M // _LANES) * _LANES

    if gathered is not None:
        assert gathered.shape[0] == B and gathered.shape[1] >= k
        assert gathered.shape[2] == N_pad, (gathered.shape, N_pad)
        assert gathered.shape[3] == feat + 3, (gathered.shape, feat)
        pad_q = ((0, 0), (0, N_pad - N), (0, 0))
        q_pos_p = jnp.pad(q_pos.astype(jnp.float32), pad_q)
        q_proj_p = jnp.pad(q_proj.astype(jnp.float32), pad_q)

        def wb_g(name, bias=True):
            p = params[name]
            w = jnp.asarray(p['kernel'], jnp.float32).astype(compute_dtype)
            if not bias:
                return w
            return w, jnp.asarray(p['bias'], jnp.float32)[None, :]

        wk = wb_g('to_k', bias=False)
        wv = wb_g('to_v', bias=False)
        wp1, bp1 = wb_g('pos_mlp_0')
        wp2, bp2 = wb_g('pos_mlp_2')
        wa1, ba1 = wb_g('attn_mlp_0')
        wa2, ba2 = wb_g('attn_mlp_2')
        interpret = jax.default_backend() != 'tpu'
        out = _attn_flat_g(q_pos_p, q_proj_p, gathered, wk, wv, wp1, bp1,
                           wp2, bp2, wa1, ba1, wa2, ba2, int(k), int(dim),
                           int(feat), int(tile_n), int(group),
                           (compute_dtype, interpret))
        return out[:, :N]

    # Projection placement (static, by shape): gathering raw features and
    # projecting per gathered row saves MXU work when the key set is large
    # (gather cost K*T*M*(E+3) + proj 2*K*T*E*D vs K*T*M*(2D+3)), but at small
    # M the extra per-group matmuls cost more than the wider gather (measured:
    # premul wins at the gv1 M=531 decode, in-kernel wins at cv1 M=2124).
    premul = (M_pad * (2 * dim - feat) < 4 * feat * dim
              if FORCE_PREMUL is None else bool(FORCE_PREMUL))

    pad_q = ((0, 0), (0, N_pad - N), (0, 0))
    q_pos_p = jnp.pad(q_pos.astype(jnp.float32), pad_q)
    q_proj_p = jnp.pad(q_proj.astype(jnp.float32), pad_q)
    kpos_p = jnp.pad(pos2.astype(jnp.float32), ((0, 0), (0, M_pad - M), (0, 0)))
    if premul:
        k_all = feats2 @ params['to_k']['kernel']
        v_all = feats2 @ params['to_v']['kernel']
        fv = jnp.concatenate([k_all.astype(jnp.float32),
                              v_all.astype(jnp.float32),
                              pos2.astype(jnp.float32)], axis=-1)
    else:
        fv = jnp.concatenate([feats2.astype(jnp.float32),
                              pos2.astype(jnp.float32)], axis=-1)
    # Pre-cast the gathered value matrix to the compute dtype: the kernel's
    # one-hot gather consumes it directly, so this removes per-group VPU casts
    # and halves the block's VMEM footprint/fetch in bf16 mode.
    fv = jnp.pad(fv.astype(compute_dtype), ((0, 0), (0, M_pad - M), (0, 0)))
    kn = jnp.sum(jnp.square(kpos_p), axis=-1)                       # (B, M_pad).
    in_play = jnp.arange(M_pad) < M
    if key_mask is not None:
        in_play = in_play[None] & jnp.pad(jnp.asarray(key_mask),
                                          ((0, 0), (0, M_pad - M)))
    kn = jnp.where(in_play, kn, jnp.inf)[:, None, :]

    def wb(name, bias=True):
        p = params[name]
        w = jnp.asarray(p['kernel'], jnp.float32).astype(compute_dtype)
        if not bias:
            return w
        b = jnp.asarray(p['bias'], jnp.float32)[None, :]
        return w, b

    if premul:  # In-kernel projections unused; keep operands tiny.
        wk = wv = jnp.zeros((1, 1), compute_dtype)
    else:
        wk = wb('to_k', bias=False)
        wv = wb('to_v', bias=False)
    wp1, bp1 = wb('pos_mlp_0')
    wp2, bp2 = wb('pos_mlp_2')
    wa1, ba1 = wb('attn_mlp_0')
    wa2, ba2 = wb('attn_mlp_2')

    use_idx = knn is not None
    if use_idx:
        ki = knn[0]
        assert ki.shape == (B, N_pad, _LANES), (ki.shape, (B, N_pad, _LANES))
    else:
        ki = jnp.zeros((B, 1, _LANES), jnp.int32)

    interpret = jax.default_backend() != 'tpu'
    out = _attn_flat(q_pos_p, q_proj_p, kpos_p, fv, kn, ki, wk, wv, wp1, bp1,
                     wp2, bp2, wa1, ba1, wa2, ba2, int(k), int(dim), int(feat),
                     int(tile_n), int(group),
                     (compute_dtype, interpret, bool(premul), use_idx))
    return out[:, :N]
