from .sharded import (create_sharded_state, default_halo_capacity,  # noqa: F401
                      gather_states, key_bounds, make_mesh,
                      make_sharded_insert, morton_split, scratch_config)
from .sharded_map import ShardedTSDFMap  # noqa: F401
