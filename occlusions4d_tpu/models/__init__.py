'''Model stack: point-transformer encoder + implicit 4D-field decoder (flax).'''

from .layers import (VectorAttention, PointTransformerBlock, DownTransition,
                     UpTransition, NormLayer)
from .encoder import PointEncoder
from .implicit import (positional_encode, ResnetBlockFC, ResnetFC, LocalImplicitField,
                       BASE_FREQUENCY)
from .factory import (build_models, build_encoder_args, build_decoder_args,
                      build_sampler_args, decoder_out_channels, color_channels,
                      track_idx)
