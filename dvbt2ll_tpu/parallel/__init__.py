"""Multi-chip sharding layer (mesh construction, sharded transmitters)."""
from .sharding import (ShardedTransmitter, grids_symbol_sharded, halo_windows,
                       make_mesh)

__all__ = ["ShardedTransmitter", "grids_symbol_sharded", "halo_windows",
           "make_mesh"]
