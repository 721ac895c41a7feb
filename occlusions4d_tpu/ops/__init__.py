'''Geometry kernel library: blockwise kNN, FPS, cuboid masks, selection, sampling.'''

from .knn import (knn, pairwise_sqdist, gather_neighbors, nn1_min_dist,
                  nn1_bidirectional)
from .fps import fps, fps_batched, random_start_indices
from .bounds import (Cuboid, greater_bounds, carla_input_bounds, carla_output_bounds,
                     blind_sample_bounds, cuboid_mask, greater_floor_mask)
from .select import take_valid, masked_choice, valid_first_order
from .sampling import (sample_uniform_3ball, sample_blind_random, grid_points_numpy,
                       blind_points_numpy, blind_points_device)
from .interpolate import inverse_distance_weights, knn_interpolate
