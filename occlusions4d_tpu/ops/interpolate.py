'''
kNN feature interpolation (inverse-distance weighting).

Covers both of the reference's interpolation users:
  * decoder local conditioning with eps=1e-4 and L1-normalized weights
    (/root/reference/model/implicit.py:337-339),
  * UpTransition trilinear interpolation with eps=1e-7
    (/root/reference/utils/geometry.py:506-559).
'''

import jax.numpy as jnp

from .knn import knn, gather_neighbors

__all__ = ['inverse_distance_weights', 'knn_interpolate']


def inverse_distance_weights(dists, eps):
    '''
    :param dists (..., K) Euclidean distances.
    :return (..., K) weights, L1-normalized over K.
    '''
    w = 1.0 / (dists + eps)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def knn_interpolate(features, points, points_query, k, *, eps=1e-7, key_mask=None):
    '''
    Interpolate per-point features onto query locations by inverse-distance weighting
    over the k nearest source points.
    :param features (..., N, D) array.
    :param points (..., N, 3) array: source coordinates.
    :param points_query (..., M, 3) array: destination coordinates.
    :return (..., M, D) array.
    '''
    dists, idx = knn(points_query, points, k, key_mask=key_mask)
    w = inverse_distance_weights(dists, eps)                          # (..., M, K).
    nbr = gather_neighbors(features, idx)                             # (..., M, K, D).
    return jnp.einsum('...mk,...mkd->...md', w, nbr)
