from .distributed import init_distributed
from .mesh import (batch_sharding, make_mesh, replicate_tree, replicated,
                   shard_batch)
from .spatial import spatial_sharded, spatial_shardings
