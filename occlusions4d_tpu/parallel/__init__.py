'''Device mesh / sharding / pjit helpers.'''

from .mesh import (make_mesh, batch_sharding, replicated, shard_batch, P,
                   local_device_count)
