'''
Implicit 4D neural field decoder: f(x, y, z, t | abstract pcl, global emb) ->
(density, color..., mark_track, segmentation...).

Capability-parity redesign of /root/reference/model/implicit.py:
  * positional_encode (implicit.py:20-43), base frequency 0.1, F powers of two;
  * ResnetBlockFC / ResnetFC pixelNeRF-style backbone (implicit.py:68-208);
  * LocalImplicitField <-> LocalPclResnetFC (implicit.py:211-445): kNN interpolation of
    abstract features (K=num_local_features, inverse-distance eps=1e-4), global+local
    conditioning injected per block, and cross-attention PT blocks from query points
    (xyz only, time dropped) to abstract points at block indices
    int((i+1)*n_blocks/(layers+1)).

The reference decoder asserts B == 1 and leans on DataParallel for batching
(implicit.py:317); here everything is natively batched (B, N, ...) so one jitted call
covers the whole (possibly sharded) batch, and the query axis can additionally be
sharded across chips for dense grid evaluation.
'''

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import knn, gather_neighbors, inverse_distance_weights
from .layers import PointTransformerBlock

__all__ = ['positional_encode', 'ResnetBlockFC', 'ResnetFC', 'LocalImplicitField',
           'BASE_FREQUENCY']

BASE_FREQUENCY = 0.1  # implicit.py:184,406 (hard-coded in the reference).


def positional_encode(points, base_frequency, num_powers):
    '''
    Fourier features: cat([p, sin(p*w_0), cos(p*w_0), ..., sin(p*w_{F-1}), cos(...)])
    with w_f = base * 2^f * 2*pi. Matches implicit.py:20-43 channel order exactly.
    :param points (..., C).
    :return (..., C * (2 * num_powers + 1)).
    '''
    terms = [points]
    for p in range(num_powers):
        omega = base_frequency * (2.0 ** p) * 2.0 * jnp.pi
        terms.append(jnp.sin(points * omega))
        terms.append(jnp.cos(points * omega))
    return jnp.concatenate(terms, axis=-1)


def _activation(name):
    if name == 'relu':
        return nn.relu
    if name == 'swish':
        return nn.silu  # x * sigmoid(x), exact match of implicit.py:46-55.
    raise ValueError(f'Unknown activation: {name}')


class ResnetBlockFC(nn.Module):
    '''act -> fc_0 -> act -> fc_1, residual (shortcut linear when d_in != d_out);
    implicit.py:68-101.'''
    d_in: int = 64
    d_hidden: int = 256
    d_out: int = 64
    activation: str = 'relu'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        net = nn.Dense(self.d_hidden, dtype=self.dtype, name='fc_0')(act(x))
        dx = nn.Dense(self.d_out, dtype=self.dtype, name='fc_1')(act(net))
        if self.d_in == self.d_out:
            xs = x
        else:
            xs = nn.Dense(self.d_out, use_bias=False, dtype=self.dtype,
                          name='shortcut')(x)
        return xs + dx


class ResnetFC(nn.Module):
    '''Continuous-representation MLP backbone with per-block latent injection
    (implicit.py:104-208). `features` may be (B, D) global or (B, N, D) per-point.'''
    d_in: int = 4
    d_hidden: int = 256
    d_out: int = 64
    d_latent: int = 256
    n_blocks: int = 5
    pos_encoding_freqs: int = 0
    activation: str = 'relu'
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.d_in > 0:
            self.lin_in = nn.Dense(self.d_hidden, dtype=self.dtype)
        self.lin_out = nn.Dense(self.d_out, dtype=self.dtype)
        self.blocks = [ResnetBlockFC(self.d_hidden, self.d_hidden, self.d_hidden,
                                     self.activation, self.dtype,
                                     name=f'blocks_{i}')
                       for i in range(self.n_blocks)]
        if self.d_latent > 0:
            self.lin_z = [nn.Dense(self.d_hidden, dtype=self.dtype, name=f'lin_z_{i}')
                          for i in range(self.n_blocks)]

    def encode_points(self, points):
        points = points.astype(self.dtype)
        if self.pos_encoding_freqs > 0:
            points = positional_encode(points, BASE_FREQUENCY, self.pos_encoding_freqs)
        return self.lin_in(points)

    def __call__(self, points, features):
        '''
        :param points (B, N, d_in) with (x, y, z, t).
        :param features (B, D) or (B, N, D).
        :return (output (B, N, d_out), penult (B, N, d_hidden)).
        '''
        act = _activation(self.activation)
        x = self.encode_points(points)
        features = features.astype(self.dtype)
        for i in range(self.n_blocks):
            if self.d_latent > 0:
                z = self.lin_z[i](features)
                if z.ndim == 2:
                    z = z[:, None, :]
                x = x + z
            x = self.blocks[i](x)
        penult = x
        return self.lin_out(act(x)), penult


class LocalImplicitField(nn.Module):
    '''
    The 4D neural field with local conditioning + cross attention
    (LocalPclResnetFC, implicit.py:211-445).

    local_mode:
      'attention' - kNN-interpolated local features + interleaved cross-attention
                    PT blocks from queries to abstract points (the shipped config);
      'feature'   - kNN interpolation only;
      'none'      - global embedding only.
    '''
    d_in: int = 4
    d_hidden: int = 256
    d_out: int = 64
    d_latent: int = 256
    n_blocks: int = 5
    pos_encoding_freqs: int = 0
    activation: str = 'relu'
    num_local_features: int = 0
    local_mode: str = 'attention'
    d_latent_local: int = 64
    cross_attn_neighbors: int = 12
    cross_attn_layers: int = 1
    cr_attn_type: str = 'cccccccccc'
    dtype: jnp.dtype = jnp.float32
    knn_block_size: int = 4096

    @property
    def use_pt_inds(self):
        '''Block index -> attention layer index map (implicit.py:265-269).'''
        out = {}
        for pt_idx in range(self.cross_attn_layers):
            at = int((pt_idx + 1) * self.n_blocks / (self.cross_attn_layers + 1))
            out[at] = pt_idx
        return out

    def setup(self):
        self.backbone = ResnetFC(
            d_in=self.d_in, d_hidden=self.d_hidden, d_out=self.d_out,
            d_latent=self.d_latent, n_blocks=self.n_blocks,
            pos_encoding_freqs=self.pos_encoding_freqs, activation=self.activation,
            dtype=self.dtype)
        if self.local_mode == 'attention':
            blocks = []
            for pt_idx in range(self.cross_attn_layers):
                kind = self.cr_attn_type[pt_idx]
                if kind == 'c':
                    blocks.append(PointTransformerBlock(
                        d_in=self.d_latent, d_hidden=self.d_latent,
                        d_out=self.d_latent, num_neighbors=self.cross_attn_neighbors,
                        d_hidden_abstract=self.d_latent_local, dtype=self.dtype,
                        knn_block_size=self.knn_block_size, name=f'pt_blocks_{pt_idx}'))
                elif kind == 's':
                    raise NotImplementedError(
                        'Self-attention CR layers are obsolete in the reference '
                        '(implicit.py:252-253).')
                else:
                    raise ValueError(kind)
            self.pt_blocks = blocks

    def __call__(self, points_query, pcl_abstract, features_global,
                 features_abstract=None, abstract_mask=None):
        '''
        :param points_query (B, N, 4) with (x, y, z, t).
        :param pcl_abstract (B, M, 3 + E) fused coords+features, or (B, M, 3) coords
            when features_abstract is given separately (implicit.py:286-290).
        :param features_global (B, D).
        :param features_abstract (B, M, E) or None.
        :param abstract_mask (B, M) bool or None: validity of abstract points.
        :return (output (B, N, d_out), penult (B, N, d_hidden)).
        '''
        if pcl_abstract is not None and features_abstract is None:
            points_abstract = pcl_abstract[..., :3]
            features_abstract = pcl_abstract[..., 3:]
        else:
            points_abstract = pcl_abstract

        if self.num_local_features <= 0:
            return self.backbone(points_query, features_global)

        if self.local_mode not in ('feature', 'attention'):
            raise ValueError(self.local_mode)

        (B, N, _) = points_query.shape
        q_xyz = points_query[..., :3]

        # Local feature interpolation: K nearest abstract points, inverse-distance
        # weights with eps=1e-4, L1-normalized (implicit.py:328-339).
        dists, idx = knn(jax.lax.stop_gradient(q_xyz),
                         jax.lax.stop_gradient(points_abstract),
                         self.num_local_features, key_mask=abstract_mask,
                         block_size=self.knn_block_size)
        w = inverse_distance_weights(dists.astype(self.dtype), 1e-4)   # (B, N, K).
        sel = gather_neighbors(features_abstract, idx)                 # (B, N, K, E).
        features_local = jnp.einsum('bnk,bnke->bne', w, sel.astype(self.dtype))

        fg = jnp.broadcast_to(features_global[:, None, :].astype(self.dtype),
                              (B, N, features_global.shape[-1]))
        features_query = jnp.concatenate([fg, features_local], axis=-1)  # (B, N, D+E).

        if self.local_mode == 'feature':
            return self.backbone(points_query, features_query)

        # Attention mode: backbone blocks with interleaved cross attention
        # (implicit.py:380-445). Time channel is dropped for attention coords.
        act = _activation(self.activation)
        bb = self.backbone
        x = bb.encode_points(points_query)
        use_pt = self.use_pt_inds
        for i in range(self.n_blocks):
            x = x + bb.lin_z[i](features_query)
            x = bb.blocks[i](x)
            if i in use_pt:
                x, _ = self.pt_blocks[use_pt[i]](
                    x, q_xyz, x2=features_abstract.astype(self.dtype),
                    p2=points_abstract, key_mask=abstract_mask)
        penult = x
        return bb.lin_out(act(x)), penult
