'''
Point-transformer encoder: decorated input point-cloud video -> abstract point cloud
(downsampled coordinates fused with per-point features) + global scene embedding.

Capability-parity redesign of PointCompletionNetV3 (/root/reference/model/model.py:12-233)
with the live configuration paths:
  * pre-MLP -> down_blocks x [PT block + DownTransition] -> center PT block,
  * global embedding = MLP(mean over points) taken at the center block,
  * abstract_levels > 1: per-level skip MLPs over post-DownTransition features whose
    last channel is overwritten with the 1-based level index, concatenated with the
    final level along the point axis (model.py:114-122, 202-207, 224-228),
  * optional decoder path (enable_decoder) with UpTransitions + post-MLP.

Static shapes: with n_input fixed, the point pyramid (e.g. 14336 -> 4779 -> 1593 -> 531
for factor 3) is fully static, so one XLA compilation covers every batch.
'''

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import PointTransformerBlock, DownTransition, UpTransition

__all__ = ['PointEncoder']


class PointEncoder(nn.Module):
    '''Constructor args mirror PointCompletionNetV3 (model.py:18-22) minus torch-isms
    (mixed_precision is expressed as `dtype`).'''
    n_input: int = 4096
    n_output: int = 1024
    d_in: int = 6
    d_out: int = 6
    d_feat: int = 32
    down_blocks: int = 3
    up_blocks: int = 2
    transition_factor: int = 4
    pt_num_neighbors: int = 16
    pt_norm_type: str = 'none'
    down_neighbors: int = 8
    abstract_levels: int = 1
    skip_connections: bool = False
    enable_decoder: bool = False
    output_featurized: bool = True
    output_global_emb: bool = True
    global_dim: int = 512
    fps_random_start: bool = True
    dtype: jnp.dtype = jnp.float32
    knn_block_size: int = 4096
    # Self-attention execution path for the PT blocks ('auto'|'on'|'off',
    # models/layers.py::VectorAttention.fused; 'auto' = the XLA chain, which
    # measured faster than the Pallas kernel at all shipped shapes). Not part
    # of the persisted encoder_args — a runtime choice, not an architecture knob.
    fused_attention: str = 'auto'

    @nn.compact
    def __call__(self, pcl, return_intermediate=False, train=False):
        '''
        :param pcl (B, N, d_in): decorated points, (x, y, z, R, G, B, t, mark_track).
        :param return_intermediate (bool, static): also return per-layer coordinates.
        :return (pcl_out, x_global, layer_coords).
            pcl_out (B, M_total, 3 + E): abstract point cloud (coords + features fused);
                M_total includes earlier levels when abstract_levels > 1.
            x_global (B, global_dim).
            layer_coords: list of (B, *, 3) or None.
        '''
        if self.enable_decoder:
            assert self.output_featurized
        if self.abstract_levels > 1:
            assert not self.skip_connections

        layer_coords = [] if return_intermediate else None
        pos0 = pcl[..., :3]
        if return_intermediate:
            layer_coords.append(pos0)

        x = nn.Dense(self.d_feat, dtype=self.dtype, name='pre_mlp_0')(pcl.astype(self.dtype))
        x = nn.relu(x)
        x = nn.Dense(self.d_feat, dtype=self.dtype, name='pre_mlp_2')(x)
        if return_intermediate:
            layer_coords.append(pos0)

        pos = pos0
        dim = self.d_feat
        skip_data = []          # Internal skips for the (optional) decoder.
        abstract_skips = []     # External multi-level abstract outputs.
        blk = 0

        def pt_block(d, name=None, **kw):
            return PointTransformerBlock(
                d_in=d, d_hidden=d, d_out=d, num_neighbors=self.pt_num_neighbors,
                dtype=self.dtype, knn_block_size=self.knn_block_size,
                fused=self.fused_attention, name=name or f'blocks_{kw.pop("idx")}')

        # Down path.
        for _ in range(self.down_blocks):
            x, pos = pt_block(dim, idx=blk)(x, pos)
            blk += 1
            if return_intermediate:
                layer_coords.append(pos)
            if self.skip_connections:
                skip_data.append((x, pos))

            x, pos = DownTransition(
                d_in=dim, d_out=dim * 2, factor=self.transition_factor,
                knn_k=self.down_neighbors, norm_type=self.pt_norm_type,
                fps_random_start=self.fps_random_start, dtype=self.dtype,
                name=f'blocks_{blk}')(x, pos, train=train)
            blk += 1
            dim *= 2
            if return_intermediate:
                layer_coords.append(pos)

            # External abstract skips capture features just after each DownTransition
            # whose width matches a skip MLP (model.py:202-207).
            if self.abstract_levels > 1:
                for j in range(self.abstract_levels - 1):
                    final_dim = self.d_feat * (2 ** self.down_blocks)
                    cur_dim = final_dim // int(2 ** (self.abstract_levels - 1 - j))
                    if cur_dim == dim:
                        y = nn.Dense(final_dim, dtype=self.dtype,
                                     name=f'abstract_skip_mlps_{j}')(x)
                        y = y.at[..., -1].set(jnp.asarray(j + 1.0, self.dtype))
                        abstract_skips.append(
                            jnp.concatenate([pos.astype(self.dtype), y], axis=-1))

        # Center block + global embedding.
        x, pos = pt_block(dim, idx=blk)(x, pos)
        blk += 1
        if return_intermediate:
            layer_coords.append(pos)

        x_global = None
        if self.output_global_emb:
            g = jnp.mean(x, axis=1)
            g = nn.Dense(self.global_dim, dtype=self.dtype, name='global_mlp_0')(g)
            g = nn.relu(g)
            x_global = nn.Dense(self.global_dim, dtype=self.dtype, name='global_mlp_2')(g)

        # Optional decoder path (dead in shipped configs; kept for parity).
        if self.enable_decoder:
            for _ in range(self.up_blocks):
                assert self.skip_connections, \
                    'Non-skip UpTransition is dead code in the reference.'
                x2, p2 = skip_data.pop(-1)
                x, pos = UpTransition(
                    d_in=dim, d_out=dim // 2, factor=self.transition_factor, knn_k=3,
                    norm_type=self.pt_norm_type, dtype=self.dtype,
                    name=f'blocks_{blk}')(x, pos, x2, p2, train=train)
                blk += 1
                x, pos = pt_block(dim // 2, idx=blk)(x, pos)
                blk += 1
                dim //= 2
                if return_intermediate:
                    layer_coords.append(pos)
            y = nn.Dense(dim, dtype=self.dtype, name='post_mlp_0')(x)
            y = nn.relu(y)
            y = nn.Dense(self.d_out - 3, dtype=self.dtype, name='post_mlp_2')(y)
            pcl_out = jnp.concatenate([pos0.astype(self.dtype), y], axis=-1)
            if return_intermediate:
                layer_coords.append(pos0)

        elif self.output_featurized:
            pcl_out = jnp.concatenate([pos.astype(self.dtype), x], axis=-1)
            if self.abstract_levels > 1:
                # Last feature channel of every level holds the 1-based level index;
                # the deepest level gets `abstract_levels` (model.py:224-228).
                pcl_out = pcl_out.at[..., -1].set(
                    jnp.asarray(float(self.abstract_levels), self.dtype))
                assert len(abstract_skips) == self.abstract_levels - 1
                pcl_out = jnp.concatenate(abstract_skips + [pcl_out], axis=1)
        else:
            pcl_out = None

        return (pcl_out, x_global, layer_coords)
