'''
Fused gathered kNN vector self-attention Pallas kernel (the encoder's hot op).

The encoder's PointTransformer self-attention (models/layers.py::VectorAttention,
semantics of /root/reference/model/point_transformer_layer.py:148-183) is, on the
XLA path, a chain of ~10 per-neighbor (N, K, D)-shaped tensors (gathered keys and
values, theta positional encodings, the 2D-wide gamma hidden layer, softmax
activations) that each round-trip through HBM. At the scale-out shapes
(N=57344, K=16) that is gigabytes of traffic per block per direction.

The decoder's fused cross-attention kernel (ops/pallas_attention.py) cannot be
reused: it holds the whole projected key set in VMEM and gathers with one-hot
matmuls, which caps the key set at ~4096 — the encoder attends over the full
input cloud (14336–57344 keys).

Split the work instead:
  * kNN graph + neighbor gather stay in XLA: the extraction already runs in the
    Hilbert-sorted bbox-pruned Pallas kernel (ops/pallas_knn.py), and
    take_along_axis / its scatter-add transpose are the two ops XLA already does
    well. Only the RAW (E-wide) neighbor features are gathered — the to_k/to_v
    projections commute with the gather and are applied in-kernel, so one
    gathered tensor replaces the XLA path's two projected ones (and one
    scatter-add replaces two in the backward).
  * everything downstream fuses into this kernel, per query tile, without
    leaving VMEM: to_k/to_v projections, theta (pos) MLP, gamma (attn) MLP,
    per-channel softmax over the K axis, and the weighted (v + theta) sum.

The backward is a custom VJP in the same style as the decoder kernel:
recompute the forward per tile, chain gradients to d(q_proj), d(gathered
features) (scattered to the feature table by XLA through take_along_axis's
transpose), and the six weight groups. Positions/coordinate deltas carry no
gradient (the module stop-gradients the kNN graph, models/layers.py:89-93).

Rows are n-major: gathered inputs arrive flattened as (B, N*K, E) and the
kernel views tiles as (T*K, E) row stacks for the MXU matmuls and (T, K, D)
for the softmax reduction — reshapes that never touch the lane (last) axis.
Requires K to be a multiple of 8 (f32 sublane tile; K=16 in every shipped
config). Numerics per compute_dtype match ops/pallas_attention.py: f32 runs
3-pass (HIGHEST) MXU matmuls, bf16 single-pass (the production train dtype).
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import _mm, _mm2

__all__ = ['fused_gathered_attention']

_LANES = 128


def _fwd_kernel(q_ref, gf_ref, rel_ref, wk_ref, wv_ref, wp1_ref, bp1_ref,
                wp2_ref, bp2_ref, wa1_ref, ba1_ref, wa2_ref, ba2_ref, out_ref,
                *, k, dim, compute_dtype):
    '''
    Block shapes (leading 1 from the (B, tiles) grid):
      q (1, T, D): projected queries (to_q applied in XLA);
      gf (1, T*K, E): raw gathered neighbor features, n-major rows (row n*K+j
        is query n's j-th neighbor);
      rel (1, T*K, 3) f32: coordinate deltas pos_q - pos_neighbor;
      weights: to_k/to_v (E, D) bias-free, theta (wp1 (3,P), bp1 (1,P),
        wp2 (P,D), bp2 (1,D)), gamma (wa1 (D,H), ba1 (1,H), wa2 (H,D),
        ba2 (1,D));
      out (1, T, D) f32.
    '''
    (_, T, _) = q_ref.shape
    cd = compute_dtype
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.float32(dim))

    gf = gf_ref[0]                                                 # (T*K, E).
    rel = rel_ref[0]                                               # (T*K, 3).
    k_g = _mm(gf, wk_ref[:], cd)                                   # (T*K, D).
    v_g = _mm(gf, wv_ref[:], cd)                                   # (T*K, D).

    pe = _mm(rel, wp1_ref[:], cd) + bp1_ref[:]
    pe = _mm(jnp.maximum(pe, 0.0), wp2_ref[:], cd) + bp2_ref[:]    # (T*K, D).

    q = q_ref[0].astype(jnp.float32)                               # (T, D).
    q_rep = jnp.broadcast_to(q[:, None, :], (T, k, dim)).reshape(T * k, dim)
    h = _mm(q_rep - k_g + pe, wa1_ref[:], cd) + ba1_ref[:]         # (T*K, H).
    lg = (_mm(jnp.maximum(h, 0.0), wa2_ref[:], cd) + ba2_ref[:]) * inv_sqrt_d

    lg3 = lg.reshape(T, k, dim)                                    # f32.
    mx = jnp.max(lg3, axis=1, keepdims=True)
    e = jnp.exp(lg3 - mx)
    den = jnp.sum(e, axis=1, keepdims=True)
    vpe3 = (v_g + pe).reshape(T, k, dim)
    out_ref[0] = jnp.sum(e * vpe3, axis=1) / den[:, 0]             # (T, D).


@functools.partial(jax.jit, static_argnames=('k', 'dim', 'tile_n',
                                              'compute_dtype', 'interpret'))
def _fwd_call(q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2,
              k, dim, tile_n, compute_dtype, interpret):
    (B, N_pad, _) = q.shape
    E = gf.shape[-1]
    kern = functools.partial(_fwd_kernel, k=k, dim=dim,
                             compute_dtype=compute_dtype)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n * k, E), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n * k, 3), lambda b, t: (b, t, 0),
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
    )(q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2)
    return out


def _bwd_kernel(q_ref, gf_ref, rel_ref, wk_ref, wv_ref, wp1_ref, bp1_ref,
                wp2_ref, bp2_ref, wa1_ref, ba1_ref, wa2_ref, ba2_ref, g_ref,
                dq_ref, dgf_ref, dwk_ref, dwv_ref, dwp1_ref, dbp1_ref,
                dwp2_ref, dbp2_ref, dwa1_ref, dba1_ref, dwa2_ref, dba2_ref,
                *, k, dim, compute_dtype):
    '''Backward: recompute the forward per tile, then chain gradients. dq/dgf
    are per-tile blocks (no accumulation); the ten weight grads accumulate
    across the sequential grid, initialized on the first visit.'''
    (_, T, _) = q_ref.shape
    cd = compute_dtype
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.float32(dim))
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

    # ---- Recompute forward ----
    gf = gf_ref[0]                                                 # (T*K, E).
    rel = rel_ref[0]                                               # (T*K, 3).
    k_g = _mm(gf, wk_ref[:], cd)
    v_g = _mm(gf, wv_ref[:], cd)

    ph_pre = _mm(rel, wp1_ref[:], cd) + bp1_ref[:]
    ph = jnp.maximum(ph_pre, 0.0)                                  # (T*K, P).
    pe = _mm(ph, wp2_ref[:], cd) + bp2_ref[:]                      # (T*K, D).

    q = q_ref[0].astype(jnp.float32)
    q_rep = jnp.broadcast_to(q[:, None, :], (T, k, dim)).reshape(T * k, dim)
    hpre = q_rep - k_g + pe                                        # (T*K, D).
    h1 = _mm(hpre, wa1_ref[:], cd) + ba1_ref[:]                    # (T*K, H).
    h1r = jnp.maximum(h1, 0.0)
    lg = (_mm(h1r, wa2_ref[:], cd) + ba2_ref[:]) * inv_sqrt_d      # (T*K, D).

    lg3 = lg.reshape(T, k, dim)
    mx = jnp.max(lg3, axis=1, keepdims=True)
    e = jnp.exp(lg3 - mx)
    den = jnp.sum(e, axis=1, keepdims=True)
    a3 = e / den                                                   # (T, K, D).

    # ---- Chain gradients ----
    g3 = g_ref[0].astype(jnp.float32)[:, None, :]                  # (T, 1, D).
    vpe3 = (v_g + pe).astype(jnp.float32).reshape(T, k, dim)
    dvpe3 = a3 * g3                                                # d(v + pe).
    da3 = g3 * vpe3
    s = jnp.sum(a3 * da3, axis=1, keepdims=True)                   # (T, 1, D).
    dmlp = (a3 * (da3 - s) * inv_sqrt_d).reshape(T * k, dim)

    dwa2_ref[:] += _mm2(h1r, dmlp, ((0,), (0,)), cd)               # (H, D).
    dba2_ref[:] += jnp.sum(dmlp, axis=0, keepdims=True)
    dh1 = _mm2(dmlp, wa2_ref[:], ((1,), (1,)), cd)                 # (T*K, H).
    dh1 = jnp.where(h1 > 0, dh1, 0.0)

    dwa1_ref[:] += _mm2(hpre, dh1, ((0,), (0,)), cd)               # (D, H).
    dba1_ref[:] += jnp.sum(dh1, axis=0, keepdims=True)
    dhpre = _mm2(dh1, wa1_ref[:], ((1,), (1,)), cd)                # (T*K, D).

    dq_ref[0] = jnp.sum(dhpre.reshape(T, k, dim), axis=1)          # (T, D).

    dvpe = dvpe3.reshape(T * k, dim)
    dpe = dhpre + dvpe                                             # (T*K, D).
    dwp2_ref[:] += _mm2(ph, dpe, ((0,), (0,)), cd)                 # (P, D).
    dbp2_ref[:] += jnp.sum(dpe, axis=0, keepdims=True)
    dph = _mm2(dpe, wp2_ref[:], ((1,), (1,)), cd)                  # (T*K, P).
    dph = jnp.where(ph_pre > 0, dph, 0.0)
    dwp1_ref[:] += _mm2(rel, dph, ((0,), (0,)), cd)                # (3, P).
    dbp1_ref[:] += jnp.sum(dph, axis=0, keepdims=True)

    dk_g = -dhpre                                                  # (T*K, D).
    dwk_ref[:] += _mm2(gf, dk_g, ((0,), (0,)), cd)                 # (E, D).
    dwv_ref[:] += _mm2(gf, dvpe, ((0,), (0,)), cd)                 # (E, D).
    dgf_ref[0] = (_mm2(dk_g, wk_ref[:], ((1,), (1,)), cd)
                  + _mm2(dvpe, wv_ref[:], ((1,), (1,)), cd))       # (T*K, E).


@functools.partial(jax.jit, static_argnames=('k', 'dim', 'tile_n',
                                              'compute_dtype', 'interpret'))
def _bwd_call(q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2, g,
              k, dim, tile_n, compute_dtype, interpret):
    (B, N_pad, _) = q.shape
    E = gf.shape[-1]
    (_, P) = wp1.shape
    H = wa1.shape[1]
    kern = functools.partial(_bwd_kernel, k=k, dim=dim,
                             compute_dtype=compute_dtype)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        kern,
        grid=(B, N_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, dim), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n * k, E), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n * k, 3), lambda b, t: (b, t, 0),
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
            pl.BlockSpec((1, tile_n * k, E), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            w_spec(wk.shape), w_spec(wv.shape),
            w_spec((3, P)), w_spec((1, P)), w_spec((P, dim)), w_spec((1, dim)),
            w_spec((dim, H)), w_spec((1, H)), w_spec((H, dim)), w_spec((1, dim)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N_pad, dim), f32),
            jax.ShapeDtypeStruct((B, N_pad * k, E), f32),
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
    )(q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2, g)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def _sattn_flat(q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2,
                k, dim, tile_n, opts):
    '''Differentiable fused attention over padded/flattened operands. Gradients
    flow to q, gf, and the weights; rel (stop-gradient coordinate deltas,
    models/layers.py:89-93) gets zeros. opts = (compute_dtype, interpret).'''
    compute_dtype, interpret = opts
    return _fwd_call(q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2,
                     ba2, k, dim, tile_n, compute_dtype, interpret)


def _sattn_flat_fwd(q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2,
                    ba2, k, dim, tile_n, opts):
    compute_dtype, interpret = opts
    out = _fwd_call(q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2,
                    ba2, k, dim, tile_n, compute_dtype, interpret)
    return out, (q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2)


def _sattn_flat_bwd(k, dim, tile_n, opts, res, g):
    (q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2) = res
    compute_dtype, interpret = opts
    (dq, dgf, dwk, dwv, dwp1, dbp1, dwp2, dbp2, dwa1, dba1, dwa2, dba2) = \
        _bwd_call(q, gf, rel, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1, wa2, ba2,
                  jnp.asarray(g, jnp.float32), k, dim, tile_n, compute_dtype,
                  interpret)
    return (dq.astype(q.dtype), dgf.astype(gf.dtype),
            jnp.zeros(rel.shape, rel.dtype),
            dwk.astype(wk.dtype), dwv.astype(wv.dtype),
            dwp1.astype(wp1.dtype), dbp1.astype(bp1.dtype),
            dwp2.astype(wp2.dtype), dbp2.astype(bp2.dtype),
            dwa1.astype(wa1.dtype), dba1.astype(ba1.dtype),
            dwa2.astype(wa2.dtype), dba2.astype(ba2.dtype))


_sattn_flat.defvjp(_sattn_flat_fwd, _sattn_flat_bwd)


def fused_gathered_attention(q_proj, gathered_feats, rel, params, k,
                             *, tile_n=128, compute_dtype=jnp.float32,
                             interpret=None):
    '''
    One fused vector attention block over pre-gathered neighbors.

    :param q_proj (B, N, D): projected query features (to_q applied).
    :param gathered_feats (B, N, K, E): RAW neighbor features (take_along_axis
        on the key-side features; differentiable — the scatter-add transpose is
        XLA's). The to_k/to_v projections are applied in-kernel per row.
    :param rel (B, N, K, 3): coordinate deltas pos_q - pos_neighbor
        (non-differentiable, like the module path's stop-gradient positions).
    :param params: dict with to_k/to_v (bias-free) and pos_mlp_0/pos_mlp_2/
        attn_mlp_0/attn_mlp_2, each {'kernel', ['bias']} (flax layout).
    :param k (int): neighbors; must be a multiple of 8 (sublane tile).
    :param compute_dtype: jnp.float32 (3-pass MXU parity) or jnp.bfloat16.
    :return (B, N, D) float32.
    '''
    (B, N, dim) = q_proj.shape
    (_, _, K, E) = gathered_feats.shape
    assert K == k and k % 8 == 0, (k, K)
    tile_n = min(tile_n, max(8, 1 << (N - 1).bit_length()))
    N_pad = -(-N // tile_n) * tile_n

    pad_q = ((0, 0), (0, N_pad - N), (0, 0))
    pad_g = ((0, 0), (0, N_pad - N), (0, 0), (0, 0))
    q_p = jnp.pad(q_proj.astype(jnp.float32), pad_q)
    gf_p = jnp.pad(gathered_feats.astype(compute_dtype), pad_g)
    gf_p = gf_p.reshape(B, N_pad * k, E)
    rel_p = jnp.pad(rel.astype(jnp.float32), pad_g).reshape(B, N_pad * k, 3)

    def wb(name, bias=True):
        p = params[name]
        w = jnp.asarray(p['kernel'], jnp.float32).astype(compute_dtype)
        if not bias:
            return w
        b = jnp.asarray(p['bias'], jnp.float32)[None, :]
        return w, b

    wk = wb('to_k', bias=False)
    wv = wb('to_v', bias=False)
    wp1, bp1 = wb('pos_mlp_0')
    wp2, bp2 = wb('pos_mlp_2')
    wa1, ba1 = wb('attn_mlp_0')
    wa2, ba2 = wb('attn_mlp_2')

    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    out = _sattn_flat(q_p, gf_p, rel_p, wk, wv, wp1, bp1, wp2, bp2, wa1, ba1,
                      wa2, ba2, int(k), int(dim), int(tile_n),
                      (compute_dtype, bool(interpret)))
    return out[:, :N]
