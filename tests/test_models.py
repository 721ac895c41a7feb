'''Model stack tests: shapes at reference configuration + numpy math oracles.'''

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occlusions4d_tpu import models


def _f(x):
    return np.asarray(x, np.float64)


def test_positional_encode_matches_reference_layout():
    pts = np.random.RandomState(0).randn(5, 4).astype(np.float32)
    out = np.asarray(models.positional_encode(jnp.asarray(pts), 0.1, 8))
    assert out.shape == (5, 4 * (2 * 8 + 1))
    np.testing.assert_allclose(out[:, :4], pts, rtol=1e-6)
    # Channel order: points, then (sin, cos) per power.
    for p in range(8):
        omega = 0.1 * (2 ** p) * 2 * np.pi
        np.testing.assert_allclose(out[:, 4 + 8 * p:8 + 8 * p], np.sin(pts * omega),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out[:, 8 + 8 * p:12 + 8 * p], np.cos(pts * omega),
                                   rtol=1e-4, atol=1e-5)


def test_vector_attention_matches_numpy_oracle():
    '''Oracle: direct transcription of the vector-attention equations.'''
    rng = np.random.RandomState(1)
    B, N, D, K = 1, 20, 8, 4
    x = rng.randn(B, N, D).astype(np.float32)
    pos = rng.randn(B, N, 3).astype(np.float32)

    mod = models.VectorAttention(dim=D, num_neighbors=K)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pos))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(pos)))

    p = flax.traverse_util.flatten_dict(params['params'], sep='/')
    W_q = _f(p['to_q/kernel'])
    W_k = _f(p['to_k/kernel'])
    W_v = _f(p['to_v/kernel'])

    def mlp2(v, w0, b0, w2, b2):
        h = np.maximum(v @ w0 + b0, 0.0)
        return h @ w2 + b2

    # Brute-force kNN (sorted ascending, self included).
    d = np.linalg.norm(pos[0][:, None] - pos[0][None], axis=-1)
    idx = np.argsort(d, axis=-1)[:, :K]                             # (N, K).

    q = _f(x[0]) @ W_q                                              # (N, D).
    k = (_f(x[0]) @ W_k)[idx]                                       # (N, K, D).
    v = (_f(x[0]) @ W_v)[idx]                                       # (N, K, D).
    rel = pos[0][:, None] - pos[0][idx]                             # (N, K, 3).
    pe = mlp2(_f(rel), _f(p['pos_mlp_0/kernel']), _f(p['pos_mlp_0/bias']),
              _f(p['pos_mlp_2/kernel']), _f(p['pos_mlp_2/bias']))
    a = mlp2(q[:, None] - k + pe, _f(p['attn_mlp_0/kernel']), _f(p['attn_mlp_0/bias']),
             _f(p['attn_mlp_2/kernel']), _f(p['attn_mlp_2/bias']))
    a = a / np.sqrt(D)
    a = np.exp(a - a.max(axis=1, keepdims=True))
    attn = a / a.sum(axis=1, keepdims=True)                         # softmax over K.
    expect = (attn * (v + pe)).sum(axis=1)                          # (N, D).

    np.testing.assert_allclose(out[0], expect, rtol=1e-4, atol=1e-5)


def test_pt_block_residual():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 30, 16).astype(np.float32)
    pos = rng.randn(2, 30, 3).astype(np.float32)
    mod = models.PointTransformerBlock(d_in=16, d_hidden=16, d_out=16, num_neighbors=5)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pos))
    z, p_out = mod.apply(params, jnp.asarray(x), jnp.asarray(pos))
    assert z.shape == (2, 30, 16)
    np.testing.assert_array_equal(np.asarray(p_out), pos)


def test_down_transition_matches_numpy_oracle():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 24, 6).astype(np.float32)
    pos = rng.randn(1, 24, 3).astype(np.float32)
    mod = models.DownTransition(d_in=6, d_out=12, factor=3, knn_k=4,
                                fps_random_start=False)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pos))
    z, p_sub = mod.apply(params, jnp.asarray(x), jnp.asarray(pos))
    assert z.shape == (1, 8, 12) and p_sub.shape == (1, 8, 3)

    p = flax.traverse_util.flatten_dict(params['params'], sep='/')
    # FPS oracle (deterministic start at 0), sorted.
    sel, min_d = [0], np.full(24, np.inf)
    for _ in range(7):
        dd = np.sum((pos[0] - pos[0][sel[-1]]) ** 2, axis=-1)
        min_d = np.minimum(min_d, dd)
        sel.append(int(np.argmax(min_d)))
    sel = np.array(sorted(sel))
    np.testing.assert_array_equal(np.asarray(p_sub[0]), pos[0][sel])

    y = np.maximum(_f(x[0]) @ _f(p['mlp_0/kernel']) + _f(p['mlp_0/bias']), 0.0)
    d = np.linalg.norm(pos[0][sel][:, None] - pos[0][None], axis=-1)
    nbr = np.argsort(d, axis=-1)[:, :4]
    expect = y[nbr].max(axis=1)
    np.testing.assert_allclose(np.asarray(z[0]), expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('abstract_levels,expect_m,expect_e', [(1, 24, 16), (2, 24 + 72, 16)])
def test_encoder_shapes_pyramid(abstract_levels, expect_m, expect_e):
    '''Mini version of gv1/cv1: d_feat=2? No - use d_feat=2^? Use small dims.
    n_input=216, factor=3 -> 216 -> 72 -> 24; down_blocks=2 -> final dim 4*d_feat.'''
    rng = np.random.RandomState(4)
    d_feat = 4
    pcl = rng.randn(2, 216, 8).astype(np.float32)
    mod = models.PointEncoder(
        n_input=216, d_in=8, d_feat=d_feat, down_blocks=2, transition_factor=3,
        pt_num_neighbors=6, down_neighbors=4, abstract_levels=abstract_levels,
        global_dim=10, fps_random_start=False, pt_norm_type='layer')
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(pcl))
    pcl_out, x_global, layer_coords = mod.apply(params, jnp.asarray(pcl))
    # Final level: 24 points with 3 + 16 channels (dim = 4 * 2^2 = 16).
    assert pcl_out.shape == (2, expect_m, 3 + expect_e)
    assert x_global.shape == (2, 10)
    assert layer_coords is None
    if abstract_levels == 2:
        out = np.asarray(pcl_out)
        # Level tags in the last channel: 1.0 for the mid level, 2.0 for the deepest.
        np.testing.assert_allclose(out[:, :72, -1], 1.0)
        np.testing.assert_allclose(out[:, 72:, -1], 2.0)


def test_encoder_intermediate_coords():
    rng = np.random.RandomState(5)
    pcl = rng.randn(1, 81, 8).astype(np.float32)
    mod = models.PointEncoder(n_input=81, d_in=8, d_feat=4, down_blocks=2,
                              transition_factor=3, pt_num_neighbors=4,
                              down_neighbors=4, global_dim=8, fps_random_start=False)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(pcl))
    _, _, layer_coords = mod.apply(params, jnp.asarray(pcl), True)
    sizes = [c.shape[1] for c in layer_coords]
    # pcl, pre_mlp, PT, Down, PT, Down, center = 81, 81, 81, 27, 27, 9, 9.
    assert sizes == [81, 81, 81, 27, 27, 9, 9]


def test_resnetfc_global_vs_local_features():
    rng = np.random.RandomState(6)
    pts = rng.randn(2, 10, 4).astype(np.float32)
    mod = models.ResnetFC(d_in=4, d_hidden=16, d_out=5, d_latent=8, n_blocks=3,
                          pos_encoding_freqs=8)
    feats_g = rng.randn(2, 8).astype(np.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(feats_g))
    out, penult = mod.apply(params, jnp.asarray(pts), jnp.asarray(feats_g))
    assert out.shape == (2, 10, 5) and penult.shape == (2, 10, 16)
    # Per-point features accepted with identical params.
    feats_l = np.repeat(feats_g[:, None], 10, axis=1)
    out2, _ = mod.apply(params, jnp.asarray(pts), jnp.asarray(feats_l))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-6)


def _decoder_fixture(local_mode='attention', n_blocks=6, layers=2):
    rng = np.random.RandomState(7)
    B, N, M, D_g, E = 2, 40, 12, 10, 6
    q = rng.randn(B, N, 4).astype(np.float32)
    abstract = rng.randn(B, M, 3 + E).astype(np.float32)
    fg = rng.randn(B, D_g).astype(np.float32)
    mod = models.LocalImplicitField(
        d_in=4, d_hidden=D_g + E, d_out=7, d_latent=D_g + E, n_blocks=n_blocks,
        pos_encoding_freqs=8, num_local_features=4, local_mode=local_mode,
        d_latent_local=E, cross_attn_neighbors=5, cross_attn_layers=layers,
        cr_attn_type='cc')
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(abstract),
                      jnp.asarray(fg))
    return mod, params, q, abstract, fg


def test_implicit_field_shapes_and_attention_placement():
    mod, params, q, abstract, fg = _decoder_fixture()
    out, penult = mod.apply(params, jnp.asarray(q), jnp.asarray(abstract),
                            jnp.asarray(fg))
    assert out.shape == (2, 40, 7) and penult.shape == (2, 40, 16)
    # gv1 config: 6 blocks, 2 cross-attn layers -> attention after blocks 2 and 4.
    assert mod.use_pt_inds == {2: 0, 4: 1}
    # Params contain exactly 2 pt blocks.
    names = set(params['params'].keys())
    assert 'pt_blocks_0' in names and 'pt_blocks_1' in names and 'pt_blocks_2' not in names


def test_implicit_field_feature_mode():
    mod, params, q, abstract, fg = _decoder_fixture(local_mode='feature')
    out, _ = mod.apply(params, jnp.asarray(q), jnp.asarray(abstract), jnp.asarray(fg))
    assert out.shape == (2, 40, 7)


def test_implicit_field_local_interp_oracle():
    '''Check the inverse-distance local feature interpolation against numpy.'''
    rng = np.random.RandomState(8)
    q = rng.randn(1, 5, 4).astype(np.float32)
    abstract = rng.randn(1, 9, 3 + 6).astype(np.float32)
    d = np.linalg.norm(q[0, :, None, :3] - abstract[0, None, :, :3], axis=-1)
    idx = np.argsort(d, axis=-1)[:, :4]
    dist = np.take_along_axis(d, idx, axis=-1)
    w = 1.0 / (dist + 1e-4)
    w = w / w.sum(-1, keepdims=True)
    expect = np.einsum('nk,nke->ne', w, abstract[0, :, 3:][idx])

    from occlusions4d_tpu.ops import knn, gather_neighbors, inverse_distance_weights
    dd, ii = knn(jnp.asarray(q[..., :3]), jnp.asarray(abstract[..., :3]), 4)
    ww = inverse_distance_weights(dd, 1e-4)
    got = np.einsum('bnk,bnke->bne', np.asarray(ww),
                    np.asarray(gather_neighbors(jnp.asarray(abstract[..., 3:]), ii)))
    np.testing.assert_allclose(got[0], expect, rtol=1e-4, atol=1e-5)


def test_encoder_fps_randomness_controlled_by_rng():
    rng = np.random.RandomState(9)
    pcl = rng.randn(1, 81, 8).astype(np.float32)
    mod = models.PointEncoder(n_input=81, d_in=8, d_feat=4, down_blocks=1,
                              transition_factor=3, pt_num_neighbors=4,
                              down_neighbors=4, global_dim=8, fps_random_start=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(pcl))
    out1, _, _ = mod.apply(params, jnp.asarray(pcl), rngs={'fps': jax.random.PRNGKey(1)})
    out2, _, _ = mod.apply(params, jnp.asarray(pcl), rngs={'fps': jax.random.PRNGKey(2)})
    out3, _, _ = mod.apply(params, jnp.asarray(pcl), rngs={'fps': jax.random.PRNGKey(1)})
    # Different fps rng -> different abstract cloud; same rng -> identical.
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out3))
    # Without the rng collection, deterministic start (inference mode).
    out4, _, _ = mod.apply(params, jnp.asarray(pcl))
    out5, _, _ = mod.apply(params, jnp.asarray(pcl))
    np.testing.assert_array_equal(np.asarray(out4), np.asarray(out5))
