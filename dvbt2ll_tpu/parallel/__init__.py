"""Multi-chip sharding layer (mesh construction, sharded transmitters)."""
from .multimux import MultiMuxTransmitter, MuxChannel
from .sharding import (ShardedTransmitter, grids_symbol_sharded, halo_windows,
                       make_mesh)

__all__ = ["MultiMuxTransmitter", "MuxChannel", "ShardedTransmitter",
           "grids_symbol_sharded", "halo_windows", "make_mesh"]
