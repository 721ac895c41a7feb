'''
Point-transformer building blocks (flax).

Re-designs of the reference layers for TPU:
  * VectorAttention <-> PointTransformerLayer
    (/root/reference/model/point_transformer_layer.py:116-183): same math (theta/gamma
    MLPs, per-channel softmax over K, sum over neighbors), but the kNN graph build is
    the blockwise streaming kernel from ops.knn instead of a dense (N, M) argsort.
  * PointTransformerBlock (/root/reference/model/modules.py:18-67).
  * DownTransition (/root/reference/model/modules.py:70-163): FPS + kNN + MLP +
    local max-pool, expressed as fixed-shape gathers and a segment max.
  * UpTransition (/root/reference/model/modules.py:166-289): skip variant only; the
    non-skip branch is dead code in the reference (references undefined points_res).

All modules are batched (B, N, D); the reference's per-GPU DataParallel scatter is
replaced by whole-batch XLA execution (shard the batch axis with pjit for multi-chip).

Parameter naming mirrors the torch attribute paths (e.g. `pos_mlp_0` for
`pos_mlp.0.weight`) so checkpoint import is a mechanical key map.
'''

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import knn, fps_batched, gather_neighbors, random_start_indices

__all__ = ['VectorAttention', 'PointTransformerBlock', 'DownTransition', 'UpTransition',
           'NormLayer']


class NormLayer(nn.Module):
    '''none / batch / layer normalization selector (modules.py:93-111).

    BatchNorm matches torch BatchNorm1d(eps=1e-3) over the flattened (B*N) axis;
    requires a `batch_stats` collection and `train` flag when used.
    '''
    norm_type: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        if self.norm_type == 'none':
            return x
        if self.norm_type == 'layer':
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm')(x)
        if self.norm_type == 'batch':
            shape = x.shape
            x2 = x.reshape((-1, shape[-1]))
            x2 = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                              momentum=0.9, dtype=self.dtype, name='norm')(x2)
            return x2.reshape(shape)
        raise ValueError(self.norm_type)


class VectorAttention(nn.Module):
    '''
    Vector self/cross attention over k nearest neighbors.

    attn = softmax_K(gamma(q - k + theta(dp)) / sqrt(dim)); out = sum_K attn * (v + theta)
    where theta is the positional MLP over coordinate differences
    (point_transformer_layer.py:148-183).

    Weights are declared as {'kernel', ['bias']} pytree params under the same
    names nn.Dense submodules would create (to_q/to_k/to_v bias-free,
    pos_mlp_0/pos_mlp_2/attn_mlp_0/attn_mlp_2 with bias), so the checkpoint
    layout and the torch key map are unchanged while both execution paths — the
    XLA chain and the fused Pallas kernel (ops/pallas_self_attention.py, the
    self-attention hot path at encoder scale) — share the same parameters.
    '''
    dim: int
    pos_mlp_hidden_dim: int = 32
    attn_mlp_hidden_mult: int = 2
    num_neighbors: int = 16
    dim2: Optional[int] = None  # key/value input width for cross attention.
    dtype: jnp.dtype = jnp.float32
    knn_block_size: int = 4096
    # Self-attention execution path. 'auto' resolves to the XLA chain: the
    # fused Pallas kernel (ops/pallas_self_attention.py) MEASURED SLOWER at
    # every shipped train shape (gv1 +0.7 ms, 57k +7.7 ms, cv1 +10.5 ms —
    # PERFLOG.md "experiments that lost": XLA already fuses the MLP chain into
    # the gather, and the kernel's padded (N*K, E) operand materialization
    # costs more than the chain it removes). 'on' forces the kernel (interpret
    # mode off-TPU — exercised by tests, kept for larger-K/dim regimes);
    # 'off' forces the XLA chain (required under checkify).
    fused: str = 'auto'

    @nn.compact
    def __call__(self, x, pos, x2=None, pos2=None, key_mask=None):
        '''
        :param x (B, N, D): query point features.
        :param pos (B, N, 3): query coordinates.
        :param x2 (B, M, D2), pos2 (B, M, 3): key/value features+coordinates
            (cross attention); None for self attention.
        :param key_mask (B, M) bool: optional validity of the key set.
        :return (B, N, D).
        '''
        self_attention = x2 is None
        if self_attention:
            x2, pos2 = x, pos
        dt = self.dtype

        kernel_init = nn.initializers.lecun_normal()

        def dense_p(name, din, dout, bias=True):
            if bias:
                return self.param(name, lambda rng: {
                    'kernel': kernel_init(rng, (din, dout), jnp.float32),
                    'bias': jnp.zeros((dout,), jnp.float32)})
            return self.param(name, lambda rng: {
                'kernel': kernel_init(rng, (din, dout), jnp.float32)})

        def apply_dense(p, v):
            y = v.astype(dt) @ p['kernel'].astype(dt)
            if 'bias' in p:
                y = y + p['bias'].astype(dt)
            return y

        p_to_q = dense_p('to_q', x.shape[-1], self.dim, bias=False)
        p_to_k = dense_p('to_k', x2.shape[-1], self.dim, bias=False)
        p_to_v = dense_p('to_v', x2.shape[-1], self.dim, bias=False)
        p_pos0 = dense_p('pos_mlp_0', 3, self.pos_mlp_hidden_dim)
        p_pos2 = dense_p('pos_mlp_2', self.pos_mlp_hidden_dim, self.dim)
        p_attn0 = dense_p('attn_mlp_0', self.dim,
                          self.dim * self.attn_mlp_hidden_mult)
        p_attn2 = dense_p('attn_mlp_2', self.dim * self.attn_mlp_hidden_mult,
                          self.dim)

        # kNN graph build (stop_gradient: a data-dependent gather pattern, like the
        # reference's non-differentiable argsort). For self-attention, pass the
        # SAME array object as query and key set: the spatial kNN path keys its
        # one-sort reuse on object identity (ops/knn.py), and two stop_gradient
        # calls would produce distinct objects and a second Morton sort.
        pos = jax.lax.stop_gradient(pos)
        pos2_sg = pos if self_attention else jax.lax.stop_gradient(pos2)
        _, knn_idx = knn(pos, pos2_sg, self.num_neighbors, key_mask=key_mask,
                         block_size=self.knn_block_size)              # (B, N, K).
        knn_xyz = gather_neighbors(pos2_sg[..., :3], knn_idx)          # (B, N, K, 3).

        use_fused = (self.fused == 'on' and self_attention
                     and key_mask is None and self.num_neighbors % 8 == 0)
        if use_fused:
            from ..ops.pallas_self_attention import fused_gathered_attention
            q = apply_dense(p_to_q, x)                                 # (B, N, D).
            gf = gather_neighbors(x2, knn_idx)                         # (B, N, K, E).
            rel = pos[..., None, :] - knn_xyz                          # (B, N, K, 3).
            cd = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
            params = {'to_k': p_to_k, 'to_v': p_to_v,
                      'pos_mlp_0': p_pos0, 'pos_mlp_2': p_pos2,
                      'attn_mlp_0': p_attn0, 'attn_mlp_2': p_attn2}
            out = fused_gathered_attention(q, gf, rel, params,
                                           self.num_neighbors,
                                           compute_dtype=cd)
            return out.astype(dt)

        q = apply_dense(p_to_q, x)                                     # (B, N, D).
        k_all = apply_dense(p_to_k, x2)                                # (B, M, D).
        v_all = apply_dense(p_to_v, x2)                                # (B, M, D).
        k = gather_neighbors(k_all, knn_idx)                           # (B, N, K, D).
        v = gather_neighbors(v_all, knn_idx)                           # (B, N, K, D).

        # Positional encoding MLP theta over coordinate deltas.
        rel = (pos[..., None, :] - knn_xyz).astype(dt)                 # (B, N, K, 3).
        pe = apply_dense(p_pos2, nn.relu(apply_dense(p_pos0, rel)))    # (B, N, K, D).

        # Attention MLP gamma, softmax over the K axis per channel.
        a = q[..., None, :] - k + pe                                   # (B, N, K, D).
        a = apply_dense(p_attn2, nn.relu(apply_dense(p_attn0, a)))
        attn = jax.nn.softmax(a / jnp.sqrt(jnp.asarray(self.dim, dt)), axis=-2)

        return jnp.einsum('bnkd,bnkd->bnd', attn, v + pe)


class PointTransformerBlock(nn.Module):
    '''Linear -> vector attention -> linear, with residual (modules.py:18-67).'''
    d_in: int
    d_hidden: int
    d_out: int
    num_neighbors: int = 16
    d_hidden_abstract: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    knn_block_size: int = 4096
    fused: str = 'auto'

    @nn.compact
    def __call__(self, x, p, x2=None, p2=None, key_mask=None):
        y = nn.Dense(self.d_hidden, dtype=self.dtype, name='layer1')(x)
        y = VectorAttention(
            dim=self.d_hidden, pos_mlp_hidden_dim=32, attn_mlp_hidden_mult=2,
            num_neighbors=self.num_neighbors, dim2=self.d_hidden_abstract,
            dtype=self.dtype, knn_block_size=self.knn_block_size,
            fused=self.fused, name='layer2')(y, p, x2=x2, pos2=p2,
                                             key_mask=key_mask)
        y = nn.Dense(self.d_out, dtype=self.dtype, name='layer3')(y)
        return (x + y, p)


class DownTransition(nn.Module):
    '''
    FPS subsample by 1/factor + per-point MLP + local max-pool over the knn_k nearest
    original points of each subsampled point (modules.py:70-163).

    `N_new = ceil(N / factor)`; indices are sorted so subsampled order follows input
    order (modules.py:135). Training uses a random FPS start per example via the 'fps'
    rng collection; inference is deterministic (start index 0), matching
    `fps_random_start` (inference.py:58-59).
    '''
    d_in: int
    d_out: int
    factor: int = 2
    knn_k: int = 8
    norm_type: str = 'none'
    fps_random_start: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, p, train=False):
        (B, N, _) = x.shape
        n_new = -(-N // self.factor)

        p_sg = jax.lax.stop_gradient(p)
        if self.fps_random_start and self.has_rng('fps'):
            starts = random_start_indices(self.make_rng('fps'), B, N)
        else:
            starts = None
        sub_idx = fps_batched(p_sg, n_new, start_idx=starts)           # (B, n_new).
        p_sub = jnp.take_along_axis(p_sg, sub_idx[..., None], axis=1)  # (B, n_new, 3).

        _, nbr_idx = knn(p_sub, p_sg, self.knn_k)                      # (B, n_new, K).

        y = nn.Dense(self.d_out, dtype=self.dtype, name='mlp_0')(x)    # (B, N, d_out).
        y = NormLayer(self.norm_type, dtype=self.dtype, name='mlp_1')(y, train=train)
        y = nn.relu(y)

        z = gather_neighbors(y, nbr_idx)                               # (B, n_new, K, D).
        z = jnp.max(z, axis=-2)                                        # (B, n_new, D).
        return (z, p_sub)


class UpTransition(nn.Module):
    '''
    Skip-connected upsampling: mlp1(x1) interpolated onto p2 + mlp2(x2)
    (modules.py:256-278). Dead in the shipped configs (enable_decoder=False,
    /root/reference/train.py:223) but part of the public model surface.
    '''
    d_in: int
    d_out: int
    factor: int = 2
    knn_k: int = 3
    norm_type: str = 'none'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, p1, x2, p2, train=False):
        from ..ops import knn_interpolate
        y1 = nn.Dense(self.d_out, dtype=self.dtype, name='mlp1_0')(x1)
        y1 = NormLayer(self.norm_type, dtype=self.dtype, name='mlp1_1')(y1, train=train)
        y1 = nn.relu(y1)
        y2 = nn.Dense(self.d_out, dtype=self.dtype, name='mlp2_0')(x2)
        y2 = NormLayer(self.norm_type, dtype=self.dtype, name='mlp2_1')(y2, train=train)
        y2 = nn.relu(y2)
        y1_super = knn_interpolate(y1, p1, p2, k=self.knn_k, eps=1e-7)
        return (y1_super + y2, p2)
