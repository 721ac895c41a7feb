'''
Scene cuboid definitions and mask-based point filters.

The reference compacts point clouds with boolean indexing
(/root/reference/utils/geometry.py:149-260), which produces dynamic shapes. On TPU we
keep shapes static: every filter returns a validity mask; downstream consumers either
weight by the mask or repack via ops.select.take_valid.

Cuboid tables reproduce:
  * GREATER bounds + curving-floor fix (geometry.py:149-172),
  * CARLA input cuboids, cube_mode 1-4 (geometry.py:191-221),
  * CARLA output cuboids with padding (geometry.py:224-260),
  * blind-sampling cuboids, which cut at x > 0 for CARLA (geometry.py:1215-1241).
'''

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ['Cuboid', 'greater_bounds', 'carla_input_bounds', 'carla_output_bounds',
           'blind_sample_bounds', 'cuboid_mask', 'greater_floor_mask']


class Cuboid(NamedTuple):
    x_min: float
    x_max: float
    y_min: float
    y_max: float
    z_min: float
    z_max: float

    @property
    def volume(self):
        return ((self.x_max - self.x_min) * (self.y_max - self.y_min)
                * (self.z_max - self.z_min))

    def pad(self, p, pad_z_max=False):
        '''Expand in 5 directions (x/y both ways + z down); z_max fixed unless asked.'''
        return Cuboid(self.x_min - p, self.x_max + p, self.y_min - p, self.y_max + p,
                      self.z_min, self.z_max + (p if pad_z_max else 0.0))


def greater_bounds(other_bounds, min_z):
    '''GREATER symmetric cube (geometry.py:414-417 caller; 149-163 filter).'''
    b = float(other_bounds)
    return Cuboid(-b, b, -b, b, float(min_z), b)


# CARLA asymmetric road cuboids, keyed by cube_mode. Coefficients on `other_bounds`
# mirror geometry.py:191-221 (input, x_min allows backward context) and
# geometry.py:224-260 (output, x_min = 0).
_CARLA_INPUT = {
    1: (-0.5, 2.0, -1.0, 1.0, 0.5),
    2: (-0.6, 2.4, -0.8, 0.8, 0.6),
    3: (-0.7, 2.2, -1.0, 1.0, 0.5),
    4: (-0.7, 2.5, -1.0, 1.0, 0.5),
}
_CARLA_OUTPUT = {
    1: (0.0, 2.0, -1.0, 1.0, 0.5),
    2: (0.0, 2.4, -0.8, 0.8, 0.4),
    3: (0.0, 2.2, -1.0, 1.0, 0.4),
    4: (0.0, 2.5, -1.0, 1.0, 0.4),
}


def carla_input_bounds(other_bounds, min_z, cube_mode=4):
    cx0, cx1, cy0, cy1, cz1 = _CARLA_INPUT[int(cube_mode)]
    b = float(other_bounds)
    return Cuboid(b * cx0, b * cx1, b * cy0, b * cy1, float(min_z), b * cz1)


def carla_output_bounds(other_bounds, min_z, cube_mode=4, padding=0.0):
    '''Output cube; padding expands x/y in 4 directions only (geometry.py:236-258).'''
    cx0, cx1, cy0, cy1, cz1 = _CARLA_OUTPUT[int(cube_mode)]
    b, p = float(other_bounds), float(padding)
    return Cuboid(b * cx0 - p, b * cx1 + p, b * cy0 - p, b * cy1 + p,
                  float(min_z), b * cz1)


def blind_sample_bounds(data_kind, cube_bounds, min_z, cube_mode=4):
    '''Cuboid in which blind (unsupervised) query points are drawn
    (geometry.py:1215-1241): GREATER uses the symmetric cube; CARLA uses the output
    cuboid (x > 0).'''
    if data_kind == 'greater':
        return greater_bounds(cube_bounds, min_z)
    elif data_kind == 'carla':
        return carla_output_bounds(cube_bounds, min_z, cube_mode=cube_mode)
    raise ValueError(data_kind)


def cuboid_mask(pcl, cuboid: Cuboid):
    '''
    :param pcl (..., C>=3) array with leading (x, y, z).
    :return (...) bool mask, True where inside the (closed) cuboid.
    '''
    x, y, z = pcl[..., 0], pcl[..., 1], pcl[..., 2]
    m = (cuboid.x_min <= x) & (x <= cuboid.x_max)
    m &= (cuboid.y_min <= y) & (y <= cuboid.y_max)
    m &= (cuboid.z_min <= z) & (z <= cuboid.z_max)
    return m


def greater_floor_mask(pcl):
    '''Removes the curving floor in GREATER scenes (geometry.py:164-167).'''
    xp = jnp if not isinstance(pcl, np.ndarray) else np
    inv_pyramid = xp.maximum(xp.abs(pcl[..., 0]), xp.abs(pcl[..., 1]))
    return pcl[..., 2] > (inv_pyramid - 4.5) / 3.5
