'''Pallas kernel parity tests (run in interpreter mode on the CPU test platform;
the same kernels compile via Mosaic on real TPU).'''

import jax.numpy as jnp
import numpy as np
import pytest

from occlusions4d_tpu.ops.fps import fps_batched
from occlusions4d_tpu.ops.pallas_fps import fps_pallas_batched


@pytest.fixture
def rng():
    return np.random.RandomState(17)


def test_fps_pallas_matches_xla(rng):
    xyz = jnp.asarray(rng.rand(2, 300, 3).astype(np.float32))
    a = fps_pallas_batched(xyz, 64)
    b = fps_batched(xyz, 64, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fps_pallas_start_idx_and_mask(rng):
    xyz = jnp.asarray(rng.rand(2, 200, 3).astype(np.float32))
    valid = jnp.asarray(rng.rand(2, 200) > 0.4)
    # Start indices must point at valid entries (the random_start_indices contract).
    start = jnp.asarray([int(np.flatnonzero(np.asarray(valid)[b])[0])
                         for b in range(2)], jnp.int32)
    a = fps_pallas_batched(xyz, 32, valid=valid, start_idx=start)
    b = fps_batched(xyz, 32, valid=valid, start_idx=start, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Masked-out points are never selected.
    sel = np.asarray(a)
    v = np.asarray(valid)
    for bi in range(2):
        assert v[bi][sel[bi]].all()


def test_fps_pallas_unsorted_first_is_start(rng):
    xyz = jnp.asarray(rng.rand(1, 150, 3).astype(np.float32))
    out = fps_pallas_batched(xyz, 16, start_idx=jnp.asarray([5], jnp.int32),
                             sort_result=False)
    assert int(out[0, 0]) == 5


def test_fps_pallas_n_out_one(rng):
    xyz = jnp.asarray(rng.rand(1, 130, 3).astype(np.float32))
    out = fps_pallas_batched(xyz, 1, start_idx=jnp.asarray([9], jnp.int32))
    assert out.shape == (1, 1) and int(out[0, 0]) == 9


def test_fps_pallas_non_multiple_of_128(rng):
    # N and n_out both off the lane boundary.
    xyz = jnp.asarray(rng.rand(1, 391, 3).astype(np.float32))
    a = fps_pallas_batched(xyz, 137)
    b = fps_batched(xyz, 137, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_attention_matches_module(rng):
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.models.layers import VectorAttention
    from occlusions4d_tpu.ops.pallas_attention import fused_knn_vector_attention

    N, M, D, D2, K = 200, 90, 64, 48, 8
    x = jnp.asarray(rng.rand(1, N, D).astype(np.float32))
    pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 2 - 1)
    x2 = jnp.asarray(rng.rand(1, M, D2).astype(np.float32))
    pos2 = jnp.asarray(rng.rand(1, M, 3).astype(np.float32) * 2 - 1)
    mod = VectorAttention(dim=D, num_neighbors=K, dim2=D2)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x, pos, x2=x2,
                                  pos2=pos2)
    p = variables['params']
    args = (x @ p['to_q']['kernel'], pos, x2, pos2, p, K)

    apply = jax.jit(mod.apply)  # jit: eager apply is dispatch-bound on CPU.
    ref = np.asarray(apply(variables, x, pos, x2=x2, pos2=pos2))
    out = np.asarray(fused_knn_vector_attention(*args))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    mask = jnp.asarray(rng.rand(1, M) > 0.4)
    ref_m = np.asarray(apply(variables, x, pos, x2=x2, pos2=pos2,
                             key_mask=mask))
    out_m = np.asarray(fused_knn_vector_attention(*args, key_mask=mask))
    np.testing.assert_allclose(out_m, ref_m, atol=2e-5, rtol=1e-4)


def test_fused_field_matches_module(rng):
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.models.implicit import LocalImplicitField
    from occlusions4d_tpu.models.fused import fused_field_apply, supports_fused

    N, M, E, Dg = 150, 80, 32, 16
    q = jnp.asarray(rng.rand(1, N, 4).astype(np.float32) * 2 - 1)
    abstract = jnp.asarray(rng.rand(1, M, 3 + E).astype(np.float32))
    fg = jnp.asarray(rng.rand(1, Dg).astype(np.float32))
    dec = LocalImplicitField(d_in=4, d_hidden=48, d_out=6, d_latent=48,
                             n_blocks=4, pos_encoding_freqs=8,
                             num_local_features=4, local_mode='attention',
                             d_latent_local=E, cross_attn_neighbors=6,
                             cross_attn_layers=2, cr_attn_type='cc')
    assert supports_fused(dec)
    variables = jax.jit(dec.init)(jax.random.PRNGKey(1), q[:, :16], abstract, fg)
    ref, ref_pen = jax.jit(dec.apply)(variables, q, abstract, fg)
    out, out_pen = jax.jit(
        lambda v, qq, ab, f: fused_field_apply(dec, v, qq, ab, f))(
            variables, q, abstract, fg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_pen), np.asarray(ref_pen),
                               atol=3e-5, rtol=1e-4)


def test_fused_knn_interp_matches_ops(rng):
    import jax.numpy as jnp
    from occlusions4d_tpu.ops.interpolate import knn_interpolate
    from occlusions4d_tpu.ops.pallas_attention import fused_knn_interp

    N, M, E, K = 210, 77, 24, 8
    q_pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 2 - 1)
    pos2 = jnp.asarray(rng.rand(1, M, 3).astype(np.float32) * 2 - 1)
    feats = jnp.asarray(rng.rand(1, M, E).astype(np.float32))

    ref = np.asarray(knn_interpolate(feats, pos2, q_pos, K, eps=1e-4))
    for group in (1, 3, 8):
        out = np.asarray(fused_knn_interp(q_pos, pos2, feats, K, eps=1e-4,
                                          group=group))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    mask = jnp.asarray(rng.rand(1, M) > 0.4)
    ref_m = np.asarray(knn_interpolate(feats, pos2, q_pos, K, eps=1e-4,
                                       key_mask=mask))
    out_m = np.asarray(fused_knn_interp(q_pos, pos2, feats, K, eps=1e-4,
                                        key_mask=mask))
    np.testing.assert_allclose(out_m, ref_m, atol=2e-5, rtol=1e-4)


def test_fused_kernels_bf16_close_to_f32(rng):
    '''bf16 compute mode (the TPU fast path) must stay within MXU-grade error
    of the exact-f32 kernel output.'''
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.ops.pallas_attention import (fused_knn_interp,
                                                       fused_knn_vector_attention)

    N, M, D, E, K = 200, 90, 64, 24, 8
    q_proj = jnp.asarray(rng.rand(1, N, D).astype(np.float32) - 0.5)
    q_pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 2 - 1)
    feats2 = jnp.asarray(rng.rand(1, M, D).astype(np.float32) - 0.5)
    pos2 = jnp.asarray(rng.rand(1, M, 3).astype(np.float32) * 2 - 1)
    params = {}
    for name, (di, do) in dict(pos_mlp_0=(3, 32), pos_mlp_2=(32, D),
                               attn_mlp_0=(D, 2 * D),
                               attn_mlp_2=(2 * D, D)).items():
        params[name] = dict(
            kernel=jnp.asarray(rng.randn(di, do).astype(np.float32) * 0.1),
            bias=jnp.asarray(rng.randn(do).astype(np.float32) * 0.01))
    for name in ('to_k', 'to_v'):
        params[name] = dict(
            kernel=jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.1))

    a32 = np.asarray(fused_knn_vector_attention(
        q_proj, q_pos, feats2, pos2, params, K))
    a16 = np.asarray(fused_knn_vector_attention(
        q_proj, q_pos, feats2, pos2, params, K,
        compute_dtype=jnp.bfloat16))
    rel = np.abs(a16 - a32).max() / (np.abs(a32).max() + 1e-9)
    assert rel < 3e-2, rel

    feats = jnp.asarray(rng.rand(1, M, E).astype(np.float32))
    i32 = np.asarray(fused_knn_interp(q_pos, pos2, feats, K))
    i16 = np.asarray(fused_knn_interp(q_pos, pos2, feats, K,
                                      compute_dtype=jnp.bfloat16))
    rel = np.abs(i16 - i32).max() / (np.abs(i32).max() + 1e-9)
    assert rel < 3e-2, rel


def test_fused_attention_grads_match_module(rng):
    '''Custom-VJP backward kernel: gradients through fused_knn_vector_attention
    match jax autodiff through the module path for every live input (x, x2 via
    to_q/k/v, theta/gamma MLP weights). Positions are stop-gradient in both.'''
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.models.layers import VectorAttention
    from occlusions4d_tpu.ops.pallas_attention import fused_knn_vector_attention

    N, M, D, D2, K = 96, 50, 32, 24, 6
    x = jnp.asarray(rng.rand(1, N, D).astype(np.float32) - 0.5)
    pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 2 - 1)
    x2 = jnp.asarray(rng.rand(1, M, D2).astype(np.float32) - 0.5)
    pos2 = jnp.asarray(rng.rand(1, M, 3).astype(np.float32) * 2 - 1)
    mod = VectorAttention(dim=D, num_neighbors=K, dim2=D2)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x, pos, x2=x2,
                                  pos2=pos2)
    w = jnp.asarray(rng.randn(1, N, D).astype(np.float32))

    def loss_mod(x, x2, p):
        out = mod.apply({'params': p}, x, pos, x2=x2, pos2=pos2)
        return jnp.mean(out * w)

    def loss_fused(x, x2, p):
        out = fused_knn_vector_attention(
            x @ p['to_q']['kernel'], pos, x2, pos2, p, K)
        return jnp.mean(out * w)

    p = variables['params']
    gm = jax.jit(jax.grad(loss_mod, argnums=(0, 1, 2)))(x, x2, p)
    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, x2, p)
    flat_m, tree_m = jax.tree_util.tree_flatten(gm)
    flat_f, tree_f = jax.tree_util.tree_flatten(gf)
    assert tree_m == tree_f
    for a, b, path in zip(flat_m, flat_f,
                          jax.tree_util.tree_leaves_with_path(gm)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-6, rtol=2e-4,
                                   err_msg=str(path[0]))


def test_fused_interp_grads_match_ops(rng):
    '''Interp backward kernel: d(features) matches autodiff through
    knn_interpolate (weights are stop-gradient functions of positions).'''
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.ops.interpolate import knn_interpolate
    from occlusions4d_tpu.ops.pallas_attention import fused_knn_interp

    N, M, E, K = 130, 60, 24, 8
    q_pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 2 - 1)
    pos2 = jnp.asarray(rng.rand(1, M, 3).astype(np.float32) * 2 - 1)
    feats = jnp.asarray(rng.rand(1, M, E).astype(np.float32))
    w = jnp.asarray(rng.randn(1, N, E).astype(np.float32))

    g_ref = jax.jit(jax.grad(lambda f: jnp.mean(
        knn_interpolate(f, jax.lax.stop_gradient(pos2),
                        jax.lax.stop_gradient(q_pos), K, eps=1e-4) * w)))(feats)
    g_fus = jax.jit(jax.grad(lambda f: jnp.mean(
        fused_knn_interp(q_pos, pos2, f, K, eps=1e-4) * w)))(feats)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               atol=5e-6, rtol=2e-4)


def test_fused_field_grads_match_module(rng):
    '''End-to-end decoder gradients: fused_field_apply (all kernels through the
    custom VJPs) matches the flax module's autodiff w.r.t. the full parameter
    tree, the abstract features, and the global embedding.'''
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.models.implicit import LocalImplicitField
    from occlusions4d_tpu.models.fused import fused_field_apply, supports_fused

    N, M, E, Dg = 120, 64, 32, 16
    q = jnp.asarray(rng.rand(1, N, 4).astype(np.float32) * 2 - 1)
    abstract = jnp.asarray(rng.rand(1, M, 3 + E).astype(np.float32))
    fg = jnp.asarray(rng.rand(1, Dg).astype(np.float32))
    dec = LocalImplicitField(d_in=4, d_hidden=48, d_out=6, d_latent=48,
                             n_blocks=4, pos_encoding_freqs=8,
                             num_local_features=4, local_mode='attention',
                             d_latent_local=E, cross_attn_neighbors=6,
                             cross_attn_layers=2, cr_attn_type='cc')
    assert supports_fused(dec)
    variables = jax.jit(dec.init)(jax.random.PRNGKey(1), q[:, :16], abstract, fg)
    w = jnp.asarray(rng.randn(1, N, 6).astype(np.float32))

    def loss_mod(v, ab, f):
        return jnp.mean(dec.apply(v, q, ab, f)[0] * w)

    def loss_fused(v, ab, f):
        return jnp.mean(fused_field_apply(dec, v, q, ab, f)[0] * w)

    gm = jax.jit(jax.grad(loss_mod, argnums=(0, 1, 2)))(variables, abstract, fg)
    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(variables, abstract, fg)
    # Abstract positions are stop-gradient in both paths.
    np.testing.assert_array_equal(np.asarray(gm[1][..., :3]), 0.0)
    np.testing.assert_array_equal(np.asarray(gf[1][..., :3]), 0.0)
    flat_m = jax.tree_util.tree_leaves_with_path((gm[0], gm[1], gm[2]))
    flat_f = jax.tree_util.tree_leaves((gf[0], gf[1], gf[2]))
    assert len(flat_m) == len(flat_f)
    for (path, a), b in zip(flat_m, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=5e-4, err_msg=str(path))


def test_fused_attention_premul_mode_matches_module(rng):
    '''Shapes chosen so the wrapper picks the pre-projected (premul) gather
    (M_pad * (2D - E) < 4*E*D): output and gradient parity with the module.'''
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.models.layers import VectorAttention
    from occlusions4d_tpu.ops.pallas_attention import fused_knn_vector_attention

    N, M, D, D2, K = 96, 40, 32, 56, 6
    x = jnp.asarray(rng.rand(1, N, D).astype(np.float32) - 0.5)
    pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 2 - 1)
    x2 = jnp.asarray(rng.rand(1, M, D2).astype(np.float32) - 0.5)
    pos2 = jnp.asarray(rng.rand(1, M, 3).astype(np.float32) * 2 - 1)
    mod = VectorAttention(dim=D, num_neighbors=K, dim2=D2)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x, pos, x2=x2,
                                  pos2=pos2)
    p = variables['params']
    M_pad = 128
    assert M_pad * (2 * D - D2) < 4 * D2 * D  # premul branch is the one taken.

    ref = np.asarray(jax.jit(mod.apply)(variables, x, pos, x2=x2, pos2=pos2))
    out = np.asarray(fused_knn_vector_attention(
        x @ p['to_q']['kernel'], pos, x2, pos2, p, K))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    w = jnp.asarray(rng.randn(1, N, D).astype(np.float32))

    def loss_mod(x, x2, p):
        return jnp.mean(mod.apply({'params': p}, x, pos, x2=x2, pos2=pos2) * w)

    def loss_fused(x, x2, p):
        return jnp.mean(fused_knn_vector_attention(
            x @ p['to_q']['kernel'], pos, x2, pos2, p, K) * w)

    gm = jax.jit(jax.grad(loss_mod, argnums=(0, 1, 2)))(x, x2, p)
    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, x2, p)
    for a, b in zip(jax.tree_util.tree_leaves(gm), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-6, rtol=2e-4)


def test_fused_field_highest_matches_module_highest(rng):
    '''The parity-grade eval path (--eval_precision highest) routes through the
    fused kernels at compute_dtype=f32 under a HIGHEST default-matmul context;
    it must agree with the module+HIGHEST oracle to float32 round-off (VERDICT
    r2 item 5; reference f32 eval, /root/reference/eval/inference.py:203-246).'''
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.models.implicit import LocalImplicitField
    from occlusions4d_tpu.models.fused import fused_field_apply, supports_fused

    N, M, E, Dg = 150, 80, 32, 16
    q = jnp.asarray(rng.rand(1, N, 4).astype(np.float32) * 2 - 1)
    abstract = jnp.asarray(rng.rand(1, M, 3 + E).astype(np.float32))
    fg = jnp.asarray(rng.rand(1, Dg).astype(np.float32))
    dec = LocalImplicitField(d_in=4, d_hidden=48, d_out=6, d_latent=48,
                             n_blocks=4, pos_encoding_freqs=8,
                             num_local_features=4, local_mode='attention',
                             d_latent_local=E, cross_attn_neighbors=6,
                             cross_attn_layers=2, cr_attn_type='cc')
    assert supports_fused(dec)
    variables = jax.jit(dec.init)(jax.random.PRNGKey(1), q[:, :16], abstract, fg)
    with jax.default_matmul_precision('highest'):
        # jit traces under the active precision context (captured at trace time).
        ref, ref_pen = jax.jit(dec.apply)(variables, q, abstract, fg)
        out, out_pen = jax.jit(
            lambda v, qq, ab, f: fused_field_apply(
                dec, v, qq, ab, f, compute_dtype=jnp.float32))(
                    variables, q, abstract, fg)
    # f32 round-off only (online-softmax vs standard accumulation order);
    # measured max |diff| ~9e-6 over 7200 outputs.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pen), np.asarray(ref_pen),
                               atol=2e-5, rtol=2e-5)


def test_fused_self_attention_matches_module(rng):
    '''Fused gathered self-attention (ops/pallas_self_attention.py, the encoder
    hot path) vs the XLA module chain: same params (the VectorAttention pytree
    layout is shared by both paths), forward and full gradient surface
    (input features + every weight group; positions are stop-gradient on both
    paths, models/layers.py:89-93).'''
    import jax
    from occlusions4d_tpu.models.layers import VectorAttention

    B, N, D, K = 2, 50, 24, 8
    x = jnp.asarray(rng.rand(B, N, D).astype(np.float32))
    pos = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 2 - 1)

    mod_off = VectorAttention(dim=D, num_neighbors=K, fused='off')
    mod_on = VectorAttention(dim=D, num_neighbors=K, fused='on')
    v = jax.jit(mod_off.init)(jax.random.PRNGKey(0), x, pos)
    ref = jax.jit(mod_off.apply)(v, x, pos)
    out = jax.jit(mod_on.apply)(v, x, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)

    def loss(mod):
        def f(vv, xx):
            return jnp.sum(jnp.sin(mod.apply(vv, xx, pos) * 3.0))
        return f
    g_ref = jax.jit(jax.grad(loss(mod_off), argnums=(0, 1)))(v, x)
    g_out = jax.jit(jax.grad(loss(mod_on), argnums=(0, 1)))(v, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_out)):
        # f32 accumulation-order roundoff only (grid-accumulated weight grads).
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


def test_fused_self_attention_ragged_tile(rng):
    '''N not a multiple of the tile: padded rows must not leak into outputs.'''
    import jax
    from occlusions4d_tpu.models.layers import VectorAttention

    B, N, D, K = 1, 37, 16, 8
    x = jnp.asarray(rng.rand(B, N, D).astype(np.float32))
    pos = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    mod_off = VectorAttention(dim=D, num_neighbors=K, fused='off')
    mod_on = VectorAttention(dim=D, num_neighbors=K, fused='on')
    v = mod_off.init(jax.random.PRNGKey(3), x, pos)
    np.testing.assert_allclose(np.asarray(mod_on.apply(v, x, pos)),
                               np.asarray(mod_off.apply(v, x, pos)),
                               atol=2e-6, rtol=2e-6)


def test_knn_extract_shared_extraction_bit_identical(rng):
    '''knn_extract feeds interp + attention (fwd AND custom-VJP bwd) via knn=;
    the one-hots/weights are the same floats as the in-kernel extraction, so
    outputs and gradients must be BIT-identical, and the indices must match a
    numpy ordering oracle.'''
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.models.layers import VectorAttention
    from occlusions4d_tpu.ops.pallas_attention import (
        fused_knn_interp, fused_knn_vector_attention, knn_extract)

    N, M, D, D2, K, Ki = 300, 90, 64, 48, 10, 6
    x = jnp.asarray(rng.rand(1, N, D).astype(np.float32))
    pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 2 - 1)
    x2 = jnp.asarray(rng.rand(1, M, D2).astype(np.float32))
    pos2 = jnp.asarray(rng.rand(1, M, 3).astype(np.float32) * 2 - 1)
    mask = jnp.asarray(rng.rand(1, M) > 0.3)
    mod = VectorAttention(dim=D, num_neighbors=K, dim2=D2)
    variables = mod.init(jax.random.PRNGKey(0), x, pos, x2=x2, pos2=pos2)
    p = variables['params']
    q_proj = x @ p['to_q']['kernel']

    knn = knn_extract(pos, pos2, K, key_mask=mask)
    (ki, kd) = knn

    # Index oracle: ascending true squared distance over unmasked keys.
    d2 = np.sum((np.asarray(pos)[0][:, None] - np.asarray(pos2)[0][None]) ** 2,
                axis=-1)
    d2[:, ~np.asarray(mask)[0]] = np.inf
    order = np.argsort(d2, axis=1, kind='stable')[:, :K]
    np.testing.assert_array_equal(np.asarray(ki)[0, :N, :K], order)
    np.testing.assert_allclose(
        np.asarray(kd)[0, :N, :K],
        np.take_along_axis(d2, order, axis=1), rtol=1e-5, atol=1e-6)

    # Forward: bitwise equality with vs without the shared extraction, in the
    # f32 parity mode AND the bf16 fast mode (extraction is f32 either way).
    args = (q_proj, pos, x2, pos2, p, K)
    for cd in (jnp.float32, jnp.bfloat16):
        out0 = np.asarray(fused_knn_vector_attention(*args, key_mask=mask,
                                                     compute_dtype=cd))
        out1 = np.asarray(fused_knn_vector_attention(*args, key_mask=mask,
                                                     compute_dtype=cd, knn=knn))
        np.testing.assert_array_equal(out0, out1)

    feats = jnp.asarray(rng.rand(1, M, 24).astype(np.float32))
    i0 = np.asarray(fused_knn_interp(pos, pos2, feats, Ki, key_mask=mask))
    i1 = np.asarray(fused_knn_interp(pos, pos2, feats, Ki, key_mask=mask,
                                     knn=knn))
    np.testing.assert_array_equal(i0, i1)

    # Gradients (the bwd kernels skip their extraction too): bitwise.
    def loss_attn(feats2, use):
        y = fused_knn_vector_attention(q_proj, pos, feats2, pos2, p, K,
                                       key_mask=mask, knn=knn if use else None)
        return jnp.sum(y ** 2)

    # NOTE: these four grads stay EAGER on purpose. The bit-identity claim is
    # defined over per-kernel dispatch boundaries (each jitted kernel runs as
    # its own executable); an outer jit inlines both arms into one XLA graph
    # where the glue ops can be fused/reassociated differently per arm
    # (measured: ~1e-5 drift on the interp grad under jit at opt level 0).
    g0 = np.asarray(jax.grad(lambda f: loss_attn(f, False))(x2))
    g1 = np.asarray(jax.grad(lambda f: loss_attn(f, True))(x2))
    np.testing.assert_array_equal(g0, g1)

    def loss_interp(f, use):
        y = fused_knn_interp(pos, pos2, f, Ki, key_mask=mask,
                             knn=knn if use else None)
        return jnp.sum(y ** 2)

    gi0 = np.asarray(jax.grad(lambda f: loss_interp(f, False))(feats))
    gi1 = np.asarray(jax.grad(lambda f: loss_interp(f, True))(feats))
    np.testing.assert_array_equal(gi0, gi1)


def test_shared_gather_bit_identical_fwd_and_grads(rng):
    '''knn_gather_rows materializes the decoder's neighbor rows once; the
    gathered=-consuming kernel variants must be BIT-identical on the forward
    (the producer runs the exact one-hot gather the consumers ran in-kernel)
    and match gradients up to the single-fused-scatter summation order
    (weights and q_proj grads stay bitwise; the key-feature grads differ only
    at f32-associativity level). Also pins fused_field_apply end-to-end across
    the SHARED_GATHER_MIN_M threshold.'''
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.ops import pallas_attention as pa

    B, N, M, E, D, P, H = 2, 300, 1100, 24, 32, 16, 64
    k_attn, k_interp = 6, 4
    q_pos = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    q_proj = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    pos2 = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    feats2 = jnp.asarray(rng.randn(B, M, E).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, M) > 0.1)
    w = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
    params = dict(
        to_k=dict(kernel=w(E, D)), to_v=dict(kernel=w(E, D)),
        pos_mlp_0=dict(kernel=w(3, P), bias=w(P)),
        pos_mlp_2=dict(kernel=w(P, D), bias=w(D)),
        attn_mlp_0=dict(kernel=w(D, H), bias=w(H)),
        attn_mlp_2=dict(kernel=w(H, D), bias=w(D)))

    k_ext = max(k_attn, k_interp)
    knn = pa.knn_extract(q_pos, pos2, k_ext, key_mask=mask)
    g = pa.knn_gather_rows(pos2, feats2, knn, k_ext)
    assert g.shape[:2] == (B, k_ext) and g.shape[-1] == E + 3

    # Forward bit-identity in raw-gather mode (premul would compute different,
    # parity-level-equal floats; the shared path is raw by construction). The
    # producer must be built at the consumers' compute dtype (the per-op path
    # pre-casts its value matrix, so the gathered rows hold cd-rounded values).
    premul0, pa.FORCE_PREMUL = pa.FORCE_PREMUL, False
    try:
        for cd in (jnp.float32, jnp.bfloat16):
            g_cd = pa.knn_gather_rows(pos2, feats2, knn, k_ext,
                                      compute_dtype=cd)
            a0 = np.asarray(pa.fused_knn_vector_attention(
                q_proj, q_pos, feats2, pos2, params, k_attn, key_mask=mask,
                compute_dtype=cd, knn=knn))
            a1 = np.asarray(pa.fused_knn_vector_attention(
                q_proj, q_pos, feats2, pos2, params, k_attn, key_mask=mask,
                compute_dtype=cd, knn=knn, gathered=g_cd))
            np.testing.assert_array_equal(a0, a1)
        i0 = np.asarray(pa.fused_knn_interp(q_pos, pos2, feats2, k_interp,
                                            key_mask=mask, knn=knn))
        i1 = np.asarray(pa.fused_knn_interp(q_pos, pos2, feats2, k_interp,
                                            key_mask=mask, knn=knn, gathered=g))
        np.testing.assert_array_equal(i0, i1)

        # Gradients through a two-layer + interp composite (the fused decoder
        # shape): one shared scatter vs three accumulated ones.
        def loss(feats2, q_proj, params, shared):
            knn = pa.knn_extract(q_pos, pos2, k_ext, key_mask=mask)
            g = (pa.knn_gather_rows(pos2, feats2, knn, k_ext)
                 if shared else None)
            a = pa.fused_knn_vector_attention(
                q_proj, q_pos, feats2, pos2, params, k_attn, key_mask=mask,
                knn=knn, gathered=g)
            b = pa.fused_knn_vector_attention(
                a * 0.5 + q_proj, q_pos, feats2, pos2, params, k_attn,
                key_mask=mask, knn=knn, gathered=g)
            i = pa.fused_knn_interp(q_pos, pos2, feats2, k_interp,
                                    key_mask=mask, knn=knn, gathered=g)
            return jnp.sum(jnp.sin(b)) + jnp.sum(i * i)

        jloss = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                        static_argnums=(3,))
        g0 = jloss(feats2, q_proj, params, False)
        g1 = jloss(feats2, q_proj, params, True)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-6, atol=1e-6)
    finally:
        pa.FORCE_PREMUL = premul0


def test_fused_field_shared_gather_threshold(rng):
    '''fused_field_apply output is invariant to SHARED_GATHER_MIN_M (the
    shared-gather fast path is numerics-neutral end-to-end, gradients
    included at tolerance).'''
    import jax
    import jax.numpy as jnp
    from occlusions4d_tpu.models import fused
    from occlusions4d_tpu.models.implicit import LocalImplicitField

    decoder = LocalImplicitField(
        d_in=4, d_hidden=48, d_out=5, d_latent=48, n_blocks=5,
        pos_encoding_freqs=2, num_local_features=4, local_mode='attention',
        d_latent_local=12, cross_attn_neighbors=6, cross_attn_layers=2,
        cr_attn_type='cc')
    B, N, M = 1, 200, 64
    q = jnp.asarray(rng.rand(B, N, 4).astype(np.float32) * 2 - 1)
    abstract = jnp.asarray(rng.rand(B, M, 3 + 12).astype(np.float32))
    fg = jnp.asarray(rng.rand(B, 48).astype(np.float32))
    variables = jax.jit(decoder.init)(jax.random.PRNGKey(0), q, abstract, fg)

    def run(min_m):
        old, fused.SHARED_GATHER_MIN_M = fused.SHARED_GATHER_MIN_M, min_m
        try:
            def loss(v):
                out, _ = fused.fused_field_apply(decoder, v, q, abstract, fg)
                return jnp.sum(out ** 2)
            # Trace inside the flag window (the global is read at trace time).
            l, grads = jax.jit(jax.value_and_grad(loss))(variables)
            return l, grads
        finally:
            fused.SHARED_GATHER_MIN_M = old

    l0, g0 = run(10 ** 9)   # per-op gathers.
    l1, g1 = run(1)         # shared gather (M=64 is above threshold 1).
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)
