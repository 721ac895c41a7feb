'''
occlusions4d_tpu: a TPU-native (JAX / XLA / Pallas / pjit) framework for dynamic scene
completion with 4D neural fields, providing the full capability surface of the
"Revealing Occlusions with 4D Neural Fields" (CVPR 2022) reference stack.

Design stance (not a port):
  * Device plane: fixed-shape, functionally pure JAX. All dynamic-shape machinery in the
    reference (boolean-mask filtering, rejection loops, per-scene variable point counts)
    becomes fixed-capacity buffers + validity masks.
  * Host plane: dataset decoding, clip selection, padding to capacity, prefetch.
  * Orchestration: dataclass config tree, orbax/pickle checkpoints plus a .pth reader
    for parity against the reference's released checkpoints.

Subpackages:
  ops        geometry kernel library (blockwise kNN, FPS, cuboid masks, point sampling)
  models     point-transformer encoder + implicit 4D-field decoder (flax)
  sampler    guided implicit point sampler (train-time supervision)
  parallel   device mesh / sharding / pjit helpers
  data       GREATER + CARLA-4D loaders, synthetic fixtures, prefetch pipeline
  evaluate   inference engine + test driver
  utils      logging, color spaces, misc helpers
'''

__version__ = '0.1.0'
