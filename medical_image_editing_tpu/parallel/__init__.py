"""Device mesh construction and data-parallel wrappers.

The reference's parallelism is data-parallel DDP over NCCL
(`run_vqwnet.py:112-127`); here DP is a 1-D `jax.sharding.Mesh` over the
`data` axis with XLA collectives riding ICI (SURVEY.md §2.8)."""

from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    create_mesh,
    data_parallel,
    initialize_distributed,
    replicate,
    shard_batch,
)
