'''Train-time guided implicit point sampling.'''

from .guided import SamplerConfig, GuidedPointSampler
