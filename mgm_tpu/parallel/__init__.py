from .shard import make_mesh, sharded_solve, solve_tiled
from .halo import halo_aggregate
