"""shard_map compatibility shim.

jax >= 0.8 promotes shard_map to `jax.shard_map` (the experimental
import warns and will be removed) and renames `check_rep` to
`check_vma`.  Every caller in this package imports from here and uses
the old `check_rep=` keyword, which is translated as needed.
"""
from __future__ import annotations

import jax

if hasattr(jax, "shard_map"):
    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_rep)
else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # noqa: F401
