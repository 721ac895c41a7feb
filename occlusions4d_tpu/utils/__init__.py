'''Logging, color spaces, and misc host-side helpers.'''

from .colors import (rgb_to_hsv, hue_bin_targets, color_bin_targets, model_hsv_to_rgb,
                     model_bins_to_rgb, BIN_RGB_COLORS)
from .misc import (accumulate_pcl_time, merge_pcl_views, elitist_shuffle,
                   multi_track_merge, get_data_kind, find_mask_ranges)
from .logvis import Logger, StepLogger
