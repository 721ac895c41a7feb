'''
Objective functions for the 4D neural field (parity with /root/reference/loss.py).

Every boolean-indexed masked mean in the reference becomes a mask-weighted mean
(identical value, static shapes). Loss surface:
  * density: BCE-with-logits on channel 0 over ALL query points (loss.py:50-64);
  * color:  masked (solid & color-available) per mode:
      rgb / rgb_nosigmoid - L1 on channels 1:4 (loss.py:79-83);
      hsv  - 12-bin hue CE (only where saturated+bright, and only if >= 16 such
             points) / 2 + sat & val L1, all / 3 (loss.py:85-115);
      bins - 9-way CE / 3 with black/gray/white folding (loss.py:117-149);
  * segmentation: CE on the last `semantic_classes` channels, mask segm >= 0
    (loss.py:156-173);
  * tracking: BCE on the color-mode-dependent track channel, mask solid & track >= 0
    (loss.py:175-194).

Per-example semantics: the reference averages each loss per (example, frame) slice and
then means over slices (loss.py:196-253); we vmap the per-slice computation over
(B, T) and mean, which is numerically identical.
'''

import dataclasses

import jax
import jax.numpy as jnp
import optax

from .models.factory import color_channels, track_idx
from .utils.colors import hue_bin_targets, color_bin_targets

__all__ = ['LossConfig', 'per_slice_losses', 'per_example_losses', 'total_loss']


@dataclasses.dataclass(frozen=True)
class LossConfig:
    color_mode: str = 'rgb'
    semantic_classes: int = 13
    density_lw: float = 1.0
    color_lw: float = 0.0
    segmentation_lw: float = 0.0
    tracking_lw: float = 0.0


def _masked_mean(values, mask):
    '''Mean over mask; 0 when the mask is empty (the reference would NaN there, but
    only in configurations that never occur with valid data).'''
    mask = mask.astype(values.dtype)
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(values * mask) / jnp.maximum(denom, 1.0), 0.0)


def _density_loss(output, target):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(output[..., 0], target[..., 0]))


def _color_loss(output, target, cfg: LossConfig):
    solid = target[..., 0] >= 0.1
    color_avail = target[..., 1] >= 0.0
    mask = solid & color_avail
    rgb_t = jnp.clip(target[..., 1:4], 0.0, 1.0)  # clip guards -1 fills under mask.

    if cfg.color_mode in ('rgb', 'rgb_nosigmoid'):
        l1 = jnp.abs(output[..., 1:4] - target[..., 1:4])
        return _masked_mean(jnp.mean(l1, axis=-1), mask)

    if cfg.color_mode == 'hsv':
        num_classes = 12
        hue_t, sat_t, val_t = hue_bin_targets(rgb_t, num_classes)
        # Hue is only supervised where saturated and bright enough (loss.py:103).
        hue_mask = mask & (sat_t >= 0.2) & (val_t >= 0.2)
        hue_logits = output[..., 1:1 + num_classes]
        ce = optax.softmax_cross_entropy_with_integer_labels(hue_logits, hue_t)
        loss_hue = _masked_mean(ce, hue_mask) / 2.0
        # Skip hue entirely when fewer than 16 supervisable points (loss.py:105-111).
        loss_hue = jnp.where(jnp.sum(hue_mask) >= 16, loss_hue, 0.0)
        loss_sat = _masked_mean(jnp.abs(output[..., 1 + num_classes] - sat_t), mask)
        loss_val = _masked_mean(jnp.abs(output[..., 2 + num_classes] - val_t), mask)
        return (loss_hue + loss_sat + loss_val) / 3.0

    if cfg.color_mode == 'bins':
        bins_t = color_bin_targets(rgb_t)
        logits = output[..., 1:10]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, bins_t)
        return _masked_mean(ce, mask) / 3.0

    raise ValueError(cfg.color_mode)


def _segm_loss(output, target, cfg: LossConfig):
    segm_t = target[..., -1].astype(jnp.int32)
    mask = segm_t >= 0
    logits = output[..., -cfg.semantic_classes:]
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.clip(segm_t, 0, cfg.semantic_classes - 1))
    return _masked_mean(ce, mask)


def _track_loss(output, target, cfg: LossConfig):
    t_idx = track_idx(cfg.color_mode)
    solid = target[..., 0] >= 0.1
    avail = target[..., 4] >= 0.0
    mask = solid & avail
    bce = optax.sigmoid_binary_cross_entropy(output[..., t_idx],
                                             jnp.clip(target[..., 4], 0.0, 1.0))
    return _masked_mean(bce, mask)


def per_slice_losses(output, target, cfg: LossConfig):
    '''
    Losses for one (example, frame) slice.
    :param output (N, C): raw decoder output post squash/clamp (density stays logit).
    :param target (N, 6): (density, R, G, B, mark_track, segm).
    :return dict of scalar losses (None-semantics handled by weights in total_loss).

    Zero-weight terms are never computed (static branch), exactly like the
    reference's `[] if lw > 0 else None` gating (loss.py:215-219). This is not
    just an optimization: with segmentation off the decoder has NO segm
    channels, so `output[..., -semantic_classes:]` would read density/color
    channels as logits — and a garbage CE can go NaN, which poisons
    `total_loss` through 0 * NaN and trips the train step's finite-grad skip.
    '''
    z = jnp.zeros((), jnp.float32)
    return dict(
        dens=_density_loss(output, target) if cfg.density_lw > 0 else z,
        rgb=_color_loss(output, target, cfg) if cfg.color_lw > 0 else z,
        segm=_segm_loss(output, target, cfg) if cfg.segmentation_lw > 0 else z,
        track=_track_loss(output, target, cfg) if cfg.tracking_lw > 0 else z,
    )


def per_example_losses(output, target, cfg: LossConfig, frame_weight=None):
    '''
    :param output (B, T, N, C), target (B, T, N, 6).
    :param frame_weight (B, T) bool/float or None: per-(example, frame) validity.
        Degenerate frames (sampler ok=False, i.e. < 256 valid target points) get
        weight 0 so they cannot update the weights -- the mask-based equivalent of
        the reference's hard error on such frames
        (/root/reference/utils/geometry.py:688-689) that train.py absorbs by
        skipping the step (train.py:87-94).
    :return dict of scalar losses, each the (weighted) mean over (B, T) slice
        losses (matching loss.py:219-253 stacking semantics).
    '''
    fn = lambda o, t: per_slice_losses(o, t, cfg)
    sliced = jax.vmap(jax.vmap(fn))(output, target)
    if frame_weight is None:
        return {k: jnp.mean(v) for k, v in sliced.items()}
    w = frame_weight.astype(output.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return {k: jnp.sum(v * w) / denom for k, v in sliced.items()}


def total_loss(losses, cfg: LossConfig):
    '''Lambda-weighted sum (loss.py:277-278).'''
    return (losses['rgb'] * cfg.color_lw + losses['dens'] * cfg.density_lw
            + losses['segm'] * cfg.segmentation_lw + losses['track'] * cfg.tracking_lw)
