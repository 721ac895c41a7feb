'''
Model construction from config: replicates the network-assembly logic of the reference
train driver (/root/reference/train.py:189-279) — head width computation per color
mode, latent dimension plumbing between encoder and decoder, and sampler parameters.
'''

import jax.numpy as jnp

from .encoder import PointEncoder
from .implicit import LocalImplicitField

__all__ = ['color_channels', 'decoder_out_channels', 'build_encoder_args',
           'build_decoder_args', 'build_models', 'build_sampler_args', 'track_idx']

# Per-color-mode output channel counts Q (train.py:231-238).
_COLOR_Q = {'rgb': 3, 'rgb_nosigmoid': 3, 'hsv': 14, 'bins': 9}


def color_channels(color_mode):
    return _COLOR_Q[color_mode]


def track_idx(color_mode):
    '''Index of mark_track in the decoder output (utils/utils.py:204-224):
    1 (density) + Q channels.'''
    return 1 + _COLOR_Q[color_mode]


def decoder_out_channels(color_mode, segmentation_lw, semantic_classes):
    '''density (1) + color (Q) + mark_track (1) + segmentation? (train.py:228-243).'''
    d_out = 1 + _COLOR_Q[color_mode] + 1
    if segmentation_lw > 0.0:
        d_out += semantic_classes
    return d_out


def build_encoder_args(cfg, data_kind):
    '''Mirrors pcl_args construction (train.py:209-224). d_in = 8:
    (x, y, z, R, G, B, t, mark_track) for both datasets.'''
    return dict(
        n_input=cfg.n_points, n_output=cfg.n_points, d_in=8, d_out=1,
        d_feat=cfg.pt_feat_dim, down_blocks=cfg.up_down_blocks,
        up_blocks=cfg.up_down_blocks, transition_factor=cfg.transition_factor,
        pt_num_neighbors=cfg.pt_num_neighbors, pt_norm_type=cfg.pt_norm_type,
        down_neighbors=cfg.down_neighbors, abstract_levels=cfg.abstract_levels,
        skip_connections=False, enable_decoder=False,
        output_featurized=(cfg.local_implicit_mode != 'none'),
        output_global_emb=True, global_dim=cfg.global_size, fps_random_start=True)


def build_decoder_args(cfg):
    '''Mirrors implicit_args construction (train.py:227-264).'''
    d_out = decoder_out_channels(cfg.color_mode, cfg.segmentation_lw,
                                 cfg.semantic_classes)
    local_mode = cfg.local_implicit_mode
    if local_mode == 'none':
        num_local_features = 0
        d_latent_local = 0
        d_hidden = cfg.global_size
        d_latent = cfg.global_size
    else:
        num_local_features = cfg.num_cr_local_feats
        d_latent_local = int(cfg.pt_feat_dim * (2 ** cfg.up_down_blocks))
        d_hidden = cfg.global_size + d_latent_local
        d_latent = cfg.global_size + d_latent_local
    return dict(
        d_in=4, d_hidden=d_hidden, d_out=d_out, d_latent=d_latent,
        n_blocks=cfg.implicit_mlp_blocks,
        pos_encoding_freqs=8 if cfg.positional_encoding else 0,
        activation=cfg.activation, num_local_features=num_local_features,
        local_mode=local_mode, d_latent_local=d_latent_local,
        cross_attn_neighbors=cfg.cross_attn_neighbors,
        cross_attn_layers=cfg.cross_attn_layers, cr_attn_type=cfg.cr_attn_type)


def build_models(cfg, data_kind, dtype=None, fps_random_start=None,
                 encoder_args=None, decoder_args=None, fused_attention=None):
    '''
    :return (encoder, decoder, encoder_args, decoder_args): flax module definitions
        plus the constructor kwarg dicts (stored in checkpoints for test-time rebuild,
        train.py:345-347).

    `fused_attention` ('auto'|'on'|'off') selects the encoder's self-attention
    execution path (models/layers.py). It is deliberately NOT merged into the
    persisted encoder_args: it changes how the same parameters are computed
    with, not the architecture, so checkpoints stay path-agnostic.
    '''
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    encoder_args = dict(encoder_args or build_encoder_args(cfg, data_kind))
    decoder_args = dict(decoder_args or build_decoder_args(cfg))
    if fps_random_start is not None:
        encoder_args['fps_random_start'] = fps_random_start
    extra = {} if fused_attention is None else dict(fused_attention=fused_attention)
    encoder = PointEncoder(dtype=dtype, **encoder_args, **extra)
    decoder = LocalImplicitField(dtype=dtype, **decoder_args)
    return encoder, decoder, encoder_args, decoder_args


def build_sampler_args(cfg, data_kind):
    '''Mirrors sampler_args construction (train.py:270-278).'''
    return dict(
        min_z=cfg.min_z, cube_bounds=cfg.cr_cube_bounds,
        point_occupancy_radius=cfg.point_occupancy_radius,
        num_solid=cfg.num_cr_solid,
        num_air=int(cfg.num_cr_solid * cfg.air_sampling_ratio),
        predict_segmentation=cfg.segmentation_lw > 0.0,
        semantic_classes=cfg.semantic_classes,
        predict_tracking=cfg.tracking_lw > 0.0, data_kind=data_kind,
        point_sample_bias=cfg.point_sample_bias, cube_mode=cfg.cube_mode)
