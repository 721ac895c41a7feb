'''
Point sampling primitives: uniform 3-ball jitter and blind (unsupervised) query
generation over scene cuboids, in both device (jax.random) and host (numpy) flavors.

Host flavor is needed because the eval driver's grid mode computes a data-dependent
actual sample count (/root/reference/utils/geometry.py:1257-1275) that must be resolved
before tracing.
'''

import jax
import jax.numpy as jnp
import numpy as np

from .bounds import Cuboid, blind_sample_bounds

__all__ = ['sample_uniform_3ball', 'sample_blind_random', 'grid_points_numpy',
           'blind_points_numpy', 'blind_points_device']


def sample_uniform_3ball(key, num_points, max_radius, min_radius=0.0):
    '''
    Uniformly distributed points in a spherical shell [min_radius, max_radius].
    Mirrors /root/reference/utils/geometry.py:562-575: gaussian direction, cbrt-uniform
    radius scaled into the shell. (Note: like the reference, the cbrt law is that of a
    full ball, linearly remapped when min_radius > 0.)
    :return (num_points, 3) float32.
    '''
    k1, k2 = jax.random.split(key)
    direction = jax.random.normal(k1, (num_points, 3), jnp.float32)
    direction = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12)
    radius = jnp.cbrt(jax.random.uniform(k2, (num_points,), jnp.float32))
    radius = radius * (max_radius - min_radius) + min_radius
    return direction * radius[:, None]


def sample_blind_random(key, num_sample, cuboid: Cuboid):
    '''
    Uniform random 3D points within a cuboid (device-side, jittable). Equivalent of
    `sample_implicit_points_blind_torch` (/root/reference/utils/geometry.py:1108-1161).
    :return (num_sample, 3) float32.
    '''
    u = jax.random.uniform(key, (num_sample, 3), jnp.float32)
    lo = jnp.array([cuboid.x_min, cuboid.y_min, cuboid.z_min], jnp.float32)
    hi = jnp.array([cuboid.x_max, cuboid.y_max, cuboid.z_max], jnp.float32)
    return u * (hi - lo) + lo


def grid_points_numpy(num_sample, cuboid: Cuboid):
    '''
    Near-isotropic grid of query points within a cuboid; the actual count may deviate
    from the request. Reproduces the spacing algorithm of
    /root/reference/utils/geometry.py:1257-1275 exactly (x-major order, z fastest).
    :return (P, 3) float32 numpy array.
    '''
    per_cubic = num_sample / cuboid.volume
    per_unit = np.cbrt(per_cubic)
    nx = int(np.ceil(per_unit * (cuboid.x_max - cuboid.x_min)))
    ny = int(np.ceil(per_unit * (cuboid.y_max - cuboid.y_min)))
    nz = int(np.ceil(per_unit * (cuboid.z_max - cuboid.z_min)))
    sx = (cuboid.x_max - cuboid.x_min) / nx
    sy = (cuboid.y_max - cuboid.y_min) / ny
    sz = (cuboid.z_max - cuboid.z_min) / nz
    px = (np.arange(nx, dtype=np.float32) + 0.5) * sx + cuboid.x_min
    py = (np.arange(ny, dtype=np.float32) + 0.5) * sy + cuboid.y_min
    pz = (np.arange(nz, dtype=np.float32) + 0.5) * sz + cuboid.z_min
    px = np.repeat(px, ny * nz)
    py = np.tile(np.repeat(py, nz), nx)
    pz = np.tile(pz, nx * ny)
    return np.stack([px, py, pz], axis=-1)


def blind_points_numpy(num_sample, min_z, cube_bounds, time_idx, data_kind,
                       cube_mode, point_sample_mode, rng=None):
    '''
    Host-side blind 4D query generation for evaluation; equivalent of
    `sample_implicit_points_blind_numpy` (/root/reference/utils/geometry.py:1199-1283).
    :return (P, 4) float32 numpy array with (x, y, z, t).
    '''
    cuboid = blind_sample_bounds(data_kind, cube_bounds, min_z, cube_mode)
    if point_sample_mode == 'random':
        rng = np.random if rng is None else rng
        u = rng.rand(num_sample, 3).astype(np.float32)
        lo = np.array([cuboid.x_min, cuboid.y_min, cuboid.z_min], np.float32)
        hi = np.array([cuboid.x_max, cuboid.y_max, cuboid.z_max], np.float32)
        xyz = u * (hi - lo) + lo
    elif point_sample_mode == 'grid':
        xyz = grid_points_numpy(num_sample, cuboid)
    else:
        raise ValueError(point_sample_mode)
    t = np.full((xyz.shape[0], 1), float(time_idx), np.float32)
    return np.concatenate([xyz, t], axis=-1)


def blind_points_device(num_sample, min_z, cube_bounds, time_idx, data_kind,
                        cube_mode, point_sample_mode, key=None):
    '''
    Device-side blind query generation: same points as blind_points_numpy ('grid'
    mode is bit-identical by construction) but materialized directly in HBM,
    avoiding the host->device transfer of the full query set (which costs ~100x the
    compute on a tunneled TPU). Grid dimensions are host-computed from static
    scalars, so the result shape stays static.
    :return (P, 4) float32 jax array with (x, y, z, t).
    '''
    cuboid = blind_sample_bounds(data_kind, cube_bounds, min_z, cube_mode)
    if point_sample_mode == 'random':
        assert key is not None, 'random mode needs a PRNG key'
        xyz = sample_blind_random(key, num_sample, cuboid)
    elif point_sample_mode == 'grid':
        per_unit = np.cbrt(num_sample / cuboid.volume)
        nx = int(np.ceil(per_unit * (cuboid.x_max - cuboid.x_min)))
        ny = int(np.ceil(per_unit * (cuboid.y_max - cuboid.y_min)))
        nz = int(np.ceil(per_unit * (cuboid.z_max - cuboid.z_min)))
        px = ((jnp.arange(nx, dtype=jnp.float32) + 0.5)
              * ((cuboid.x_max - cuboid.x_min) / nx) + cuboid.x_min)
        py = ((jnp.arange(ny, dtype=jnp.float32) + 0.5)
              * ((cuboid.y_max - cuboid.y_min) / ny) + cuboid.y_min)
        pz = ((jnp.arange(nz, dtype=jnp.float32) + 0.5)
              * ((cuboid.z_max - cuboid.z_min) / nz) + cuboid.z_min)
        gx, gy, gz = jnp.meshgrid(px, py, pz, indexing='ij')  # x-major, z fastest.
        xyz = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
    else:
        raise ValueError(point_sample_mode)
    t = jnp.full((xyz.shape[0], 1), jnp.float32(time_idx))
    return jnp.concatenate([xyz, t], axis=-1)
