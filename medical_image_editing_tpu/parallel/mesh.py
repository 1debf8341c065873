"""1-D data-parallel mesh helpers.

TPU-native equivalents of the reference's distributed runtime (SURVEY.md §2.8):

| reference (NCCL/DDP)                         | here                                  |
|----------------------------------------------|---------------------------------------|
| DDP gradient all-reduce                      | `lax.pmean(grads, DATA_AXIS)` in step |
| VQ EMA `all_reduce(stats)/world_size`        | `lax.pmean` inside `vq_apply`         |
| k-means init `all_gather` + rank-0 broadcast | `lax.all_gather` + replicated compute |
| `sync_batchnorm=True`                        | `nn.BatchNorm(axis_name=DATA_AXIS)`   |

The per-device step function is written once with `axis_name=DATA_AXIS` and
wrapped with `jax.shard_map`: state replicated, batch sharded on its leading
axis, outputs replicated (guaranteed by the pmean'd grads/stats).
"""

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
# Model/spatial-parallel axis: images (H) or volumes (depth) sharded across
# chips, with XLA GSPMD inserting conv halo exchanges. The reference has no
# such axis (SURVEY.md §2.8: DP only) — this is new TPU-native design used by
# the volumetric trainer and the latency-oriented spatial edit path.
SPATIAL_AXIS = "spatial"


def create_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _mesh_is_local(mesh: Mesh) -> bool:
    pidx = jax.process_index()
    return all(d.process_index == pidx for d in mesh.devices.flat)


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh.

    Works on multi-controller (multi-process) meshes too: every process must
    hold the same host-local values (guaranteed when state is built from the
    same seeds, the reference's seed-exchange invariant); global arrays are
    assembled from the local copies since `device_put` cannot target
    non-addressable shardings.
    """
    sharding = NamedSharding(mesh, P())
    if _mesh_is_local(mesh):
        return jax.device_put(tree, sharding)

    def put(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            data = np.asarray(jax.device_get(jax.random.key_data(x)))
            g = jax.make_array_from_process_local_data(sharding, data, data.shape)
            return jax.jit(jax.random.wrap_key_data, out_shardings=sharding)(g)
        data = np.asarray(jax.device_get(x))
        return jax.make_array_from_process_local_data(sharding, data, data.shape)

    return jax.tree.map(put, tree)


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Shard a batch pytree along its leading axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def data_parallel(
    step_fn: Callable,
    mesh: Mesh,
    *,
    n_state_args: int = 1,
    axis: str = DATA_AXIS,
    donate_state: bool = False,
) -> Callable:
    """Wrap a per-device step into a jitted data-parallel step.

    `step_fn(state..., batch...)` must already use `axis` for its collectives
    (grad pmean, VQ stats, batch stats). The first `n_state_args` arguments are
    replicated; the rest are sharded along their leading axis. All outputs are
    replicated.

    `donate_state=True` donates the state arguments' buffers to their updated
    outputs (same replicated sharding in and out, so XLA can reuse the HBM in
    place — saves a copy of every parameter/optimizer buffer per step). The
    caller must not touch the passed-in state after the call; pass the state
    through `train.state.unshare_buffers` once before the first donating call.
    """

    def wrapped(*args):
        def spec_for(i, arg):
            if i < n_state_args:
                return P()
            leaves = jax.tree.leaves(arg)
            # scalars (e.g. a scheduled drop_prob) are replicated
            if all(getattr(l, "ndim", 0) == 0 for l in leaves):
                return P()
            return P(axis)

        in_specs = tuple(spec_for(i, a) for i, a in enumerate(args))
        mapped = jax.shard_map(
            step_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(),
            check_vma=False,
        )
        return mapped(*args)

    donate = tuple(range(n_state_args)) if donate_state else ()
    return jax.jit(wrapped, donate_argnums=donate)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bootstrap: `jax.distributed.initialize` wrapper.

    TPU-native replacement for the reference's torch.distributed/NCCL process
    group setup (SURVEY.md §2.8 backend row). On a single host this is a no-op;
    on TPU pods JAX auto-detects the coordinator from the environment when no
    arguments are given. Call once before any jax computation.
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        try:
            if jax.process_count() > 1:
                return  # already initialized by the runtime
        except RuntimeError:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
