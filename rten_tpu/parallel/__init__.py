"""Sharding / multi-chip layer.

The reference is single-process CPU with rayon threads (SURVEY.md §2.3);
its "comm layer" is empty. This package is the green-field TPU design:
a ``(data, model)`` device mesh, NamedSharding rules for transformer
parameters and KV caches (tensor-parallel over heads on ICI, data-parallel
over batch), and XLA-collective building blocks. Single-chip execution is
the degenerate 1×1 mesh.
"""

from .mesh import make_mesh, mesh_shape
from .sharding import (cache_shardings, param_shardings, shard_cache,
                       shard_params, replicated, sequence_parallel)
from .distributed import (batch_sharding, batch_spec, initialize_multihost,
                          make_hybrid_mesh)
from .pipeline import PipelinedLM, stacked_layer_shardings

__all__ = ["make_mesh", "mesh_shape", "param_shardings", "cache_shardings",
           "shard_params", "shard_cache", "replicated", "make_hybrid_mesh",
           "initialize_multihost", "batch_spec", "batch_sharding",
           "PipelinedLM", "stacked_layer_shardings", "sequence_parallel"]
