from .sharded import (create_sharded_state, gather_states, key_bounds,  # noqa: F401
                      make_mesh, make_sharded_insert)
