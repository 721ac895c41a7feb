'''
Color-space helpers for the color prediction heads.

Parity targets:
  * rgb_to_hsv (/root/reference/utils/utils.py:169-191): hue in degrees [0, 360),
    branchless min/argmin formulation (verified equivalent to matplotlib's by the
    reference author, utils.py:194-197).
  * hue / bins target construction used by the losses (/root/reference/loss.py:85-149).
  * model_hsv_to_rgb / model_bins_to_rgb visualization decoders (utils.py:227-260).
'''

import jax.numpy as jnp
import numpy as np

__all__ = ['rgb_to_hsv', 'hue_bin_targets', 'color_bin_targets', 'model_hsv_to_rgb',
           'model_bins_to_rgb', 'BIN_RGB_COLORS']

BIN_RGB_COLORS = np.array([(255, 0, 0), (255, 255, 0), (0, 255, 0),
                           (0, 255, 255), (0, 0, 255), (255, 0, 255),
                           (26, 26, 26), (102, 102, 102), (204, 204, 204)],
                          np.float32) / 255.0


def rgb_to_hsv(rgb, epsilon=1e-10):
    '''
    :param rgb (..., 3) array in [0, 1].
    :return (..., 3) array with (hue degrees [0, 360), saturation, value).
    '''
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    max_rgb = jnp.max(rgb, axis=-1)
    argmin_rgb = jnp.argmin(rgb, axis=-1)
    min_rgb = jnp.min(rgb, axis=-1)
    max_min = max_rgb - min_rgb + epsilon

    h1 = 60.0 * (g - r) / max_min + 60.0    # when b is min.
    h2 = 60.0 * (b - g) / max_min + 180.0   # when r is min.
    h3 = 60.0 * (r - b) / max_min + 300.0   # when g is min.
    h = jnp.choose(argmin_rgb, [h2, h3, h1], mode='clip')
    s = max_min / (max_rgb + epsilon)
    return jnp.stack([h, s, max_rgb], axis=-1)


def hue_bin_targets(rgb, num_classes=12):
    '''
    Hue classification targets for the 'hsv' color mode (loss.py:92-99).
    :return (hue_bin int (...,), sat (...,), val (...,)).
    '''
    hsv = rgb_to_hsv(rgb)
    hue = jnp.round(hsv[..., 0] / 360.0 * num_classes).astype(jnp.int32)
    hue = jnp.where(hue == num_classes, 0, hue)
    return hue, hsv[..., 1], hsv[..., 2]


def color_bin_targets(rgb):
    '''
    9-way color bin targets for the 'bins' mode: 6 saturated hues + black/gray/white
    (loss.py:117-147).
    :return (...,) int32 in [0, 9).
    '''
    num_sat = 6
    hsv = rgb_to_hsv(rgb)
    hue = jnp.round(hsv[..., 0] / 360.0 * num_sat).astype(jnp.int32)
    hue = jnp.where(hue == num_sat, 0, hue)
    sat, val = hsv[..., 1], hsv[..., 2]
    bland = (sat < 0.3) | (val < 0.3)
    black = (val < 0.2) & bland
    gray = (0.2 <= val) & (val < 0.6) & bland
    white = (0.6 <= val) & bland
    bins = hue
    bins = jnp.where(black, num_sat, bins)
    bins = jnp.where(gray, num_sat + 1, bins)
    bins = jnp.where(white, num_sat + 2, bins)
    return bins


def model_hsv_to_rgb(model_hsv):
    '''Visualization decoder for the hsv head (utils.py:227-244). numpy in/out.'''
    import matplotlib.colors
    model_hsv = np.asarray(model_hsv)
    num_classes = 12
    hue = model_hsv[..., :num_classes].argmax(axis=-1).astype(np.float32) / num_classes
    sat = np.sqrt(model_hsv[..., -2])
    val = model_hsv[..., -1]
    return matplotlib.colors.hsv_to_rgb(np.stack([hue, sat, val], axis=-1))


def model_bins_to_rgb(model_bins):
    '''Visualization decoder for the bins head (utils.py:247-260). numpy in/out.'''
    model_bins = np.asarray(model_bins)
    preds = model_bins[..., :9].argmax(axis=-1).astype(np.int32)
    return BIN_RGB_COLORS[preds]
