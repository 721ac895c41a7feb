'''
Fused-kernel fast path for the implicit decoder.

`fused_field_apply` is a pure-function re-expression of
LocalImplicitField.__call__ (attention mode) over the module's own parameter
tree, with every cross-attention block executed by the fused Pallas kernel
(ops/pallas_attention.py) instead of the kNN + gather + MLP + softmax XLA chain.
Used by the inference engine on TPU; the flax module remains the canonical
definition (and the training path). Parity is asserted by
tests/test_pallas_ops.py::test_fused_field_matches_module.
'''

import jax
import jax.numpy as jnp

from ..ops.pallas_attention import (fused_knn_interp,
                                    fused_knn_vector_attention, knn_extract,
                                    knn_gather_rows)
from .implicit import BASE_FREQUENCY, positional_encode

__all__ = ['fused_field_apply', 'supports_fused']

# Abstract-cloud size (keys) above which the decoder's three neighbor gathers
# (interp + two attention layers; one-hot MXU matmuls of K*T*M*(E+3) MACs
# each, re-run + scattered again in their backwards) are materialized ONCE by
# knn_gather_rows and consumed from HBM. Below it the per-op gathers are
# cheaper than the extra HBM round-trips (gv1's M=531 cloud); above it the
# gather matmuls dominate the decoder (cv1/57k's M~2124). Module global so
# step-level A/B sweeps can retune. Retuning is bit-identical only where the
# per-op path would itself run raw (non-premul) gathers — the shared producer
# always gathers raw [feats|pos] rows, so for shapes where the per-op path
# selects premul (M below its premul crossover, or feat > 2*dim) the two paths
# differ at float-associativity level.
SHARED_GATHER_MIN_M = 1024


def supports_fused(decoder):
    '''The fused path covers the shipped decoder configuration.'''
    return (decoder.local_mode == 'attention' and decoder.num_local_features > 0
            and decoder.cross_attn_neighbors <= 32
            and decoder.num_local_features <= 32
            and all(c == 'c' for c in
                    decoder.cr_attn_type[:decoder.cross_attn_layers]))


def _dense(x, p, act=False):
    y = x @ p['kernel'] + p.get('bias', 0.0)
    return jnp.maximum(y, 0.0) if act else y


def _resnet_block(x, p, act):
    net = _dense(act(x), p['fc_0'])
    dx = _dense(act(net), p['fc_1'])
    xs = _dense(x, p['shortcut']) if 'shortcut' in p else x
    return xs + dx


def fused_field_apply(decoder, variables, points_query, pcl_abstract,
                      features_global, abstract_mask=None,
                      compute_dtype=jnp.float32):
    '''
    :param decoder: LocalImplicitField module (for static config).
    :param variables: its variables dict ({'params': ...}).
    :param points_query (B, N, 4); pcl_abstract (B, M, 3+E);
        features_global (B, D); abstract_mask (B, M) bool or None.
    :return (output (B, N, d_out), penult (B, N, d_hidden)); float32.
    '''
    assert supports_fused(decoder), 'configuration not covered by the fused path'
    p = variables['params']
    bb = p['backbone']
    act = (jax.nn.relu if decoder.activation == 'relu' else jax.nn.silu)

    pts_abs = pcl_abstract[..., :3]
    feats_abs = pcl_abstract[..., 3:]
    (B, N, _) = points_query.shape
    q_xyz = points_query[..., :3]

    # One shared exact-kNN extraction feeds the interp conditioning AND both
    # cross-attention layers (forward + custom-VJP backward): without it each
    # kernel re-runs the identical K-step serial argmin over the same
    # (query, abstract) distance rows - the decoder's main non-MXU cost.
    # Extracted at max(k_attn, k_interp): each consumer reads its own-k PREFIX
    # of the greedy ascending sequence, which is exactly what its in-kernel
    # extraction would produce.
    k_ext = max(decoder.cross_attn_neighbors if decoder.use_pt_inds else 0,
                decoder.num_local_features)
    knn = knn_extract(q_xyz, pts_abs, k_ext, key_mask=abstract_mask)

    # Above the SHARED_GATHER_MIN_M key-count threshold, gather the raw
    # neighbor rows once and let every consumer (and its backward) read them
    # instead of re-running the one-hot gather matmul (bit-identical floats;
    # see knn_gather_rows).
    gathered = None
    if SHARED_GATHER_MIN_M and pts_abs.shape[1] >= SHARED_GATHER_MIN_M:
        gathered = knn_gather_rows(pts_abs, feats_abs, knn, k_ext,
                                   compute_dtype=compute_dtype)

    # Local feature interpolation (implicit.py:328-339 semantics), one fused
    # kNN + inverse-distance-weighting pass.
    features_local = fused_knn_interp(
        q_xyz, pts_abs, feats_abs, decoder.num_local_features,
        eps=1e-4, key_mask=abstract_mask, compute_dtype=compute_dtype,
        knn=knn, gathered=gathered)
    fg = jnp.broadcast_to(features_global[:, None, :],
                          (B, N, features_global.shape[-1]))
    features_query = jnp.concatenate([fg, features_local], axis=-1)

    # Backbone with interleaved fused cross-attention.
    enc = points_query
    if decoder.pos_encoding_freqs > 0:
        enc = positional_encode(enc, BASE_FREQUENCY, decoder.pos_encoding_freqs)
    x = _dense(enc, bb['lin_in'])
    use_pt = decoder.use_pt_inds
    for i in range(decoder.n_blocks):
        x = x + _dense(features_query, bb[f'lin_z_{i}'])
        x = _resnet_block(x, bb[f'blocks_{i}'], act)
        if i in use_pt:
            blk = p[f'pt_blocks_{use_pt[i]}']
            att = blk['layer2']
            y = _dense(x, blk['layer1'])
            q_proj = y @ att['to_q']['kernel']
            # Raw abstract features go in; to_k/to_v are applied in-kernel
            # after the neighbor gather (cheaper gather, identical math).
            y = fused_knn_vector_attention(
                q_proj, q_xyz, feats_abs, pts_abs, att,
                decoder.cross_attn_neighbors, key_mask=abstract_mask,
                compute_dtype=compute_dtype, knn=knn, gathered=gathered)
            y = _dense(y, blk['layer3'])
            x = x + y
    penult = x
    return _dense(act(x), bb['lin_out']), penult
