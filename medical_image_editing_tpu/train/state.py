"""Train state pytree and optimizer construction.

Behavioral spec: the reference's Lightning module state — encoder/decoder/
discriminator parameters, three Adam optimizers (`src/trainers/base.py:164-183`),
VQ buffers (`vq_module.py:154-157`) and the global step/epoch — flattened into
one functional pytree, checkpointable with Orbax as a whole (SURVEY.md §5
checkpoint/resume).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    epoch: jax.Array
    rng: jax.Array

    enc_vars: Any          # {'params': ..., optional 'batch_stats': ...}
    dec_vars: Any
    dis_vars: Any          # {} until the GAN stage

    vq: Any                # ops.vq.VQState

    enc_opt: Any
    dec_opt: Any
    dis_opt: Any


def per_device_keys(axis_name: Optional[str], *keys):
    """Decorrelate data-consuming PRNG keys across shard_map devices.

    `state.rng` is replicated under `parallel.data_parallel`, so a plain
    `split` hands every device the SAME keys — each device would then draw
    identical augmentations/dropout/CutMix boxes for its local shard,
    shrinking the global batch's randomness diversity from B to B/n_devices.
    Folding in `axis_index` gives each device an independent stream while the
    carried `state.rng` stays replicated (the torch-DDP equivalent: each
    rank's DataLoader draws its own augmentations). No-op when `axis_name` is
    None (single device) — numerics there are unchanged.
    """
    if axis_name is None:
        return keys
    idx = jax.lax.axis_index(axis_name)
    return tuple(jax.random.fold_in(k, idx) for k in keys)


def unshare_buffers(tree):
    """Return a copy of `tree` whose leaves own distinct device buffers.

    Freshly-initialized variable trees can alias ONE device buffer across
    leaves (XLA caches identical constants — e.g. the zero biases of equal
    shape coming out of one jitted `init`). Donating an aliased pair via
    `donate_argnums` deletes the shared buffer on its first use and raises
    "Array has been deleted" on the second. A jitted per-leaf arithmetic copy
    breaks the aliasing: each output depends on a distinct input, so XLA
    cannot constant-CSE them. Call once on the state before entering a
    donating train loop (the loop's own outputs are always distinct).
    """

    def copy(x):
        if not isinstance(x, jax.Array):
            return x
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(jax.random.key_data(x) ^ jnp.zeros((), jnp.uint32))
        if x.dtype == jnp.bool_:
            return jnp.logical_or(x, jnp.zeros((), jnp.bool_))
        return x + jnp.zeros((), x.dtype)

    return jax.jit(lambda t: jax.tree.map(copy, t))(tree)


def optimizer_layout() -> str:
    """The optimizer-state pytree layout the current environment produces:
    "flat" under MEDIMG_FLAT_OPT=1 (optax.flatten), else "nested". Recorded
    in checkpoint sidecars so a restore with the flag flipped fails with a
    clear message instead of an Orbax structure mismatch (ADVICE r4)."""
    import os

    return "flat" if os.environ.get("MEDIMG_FLAT_OPT", "0") == "1" else "nested"


def make_optimizer(lr: float, b1: float = 0.9, b2: float = 0.999, weight_decay: float = 0.0):
    """torch.optim.Adam parity: weight decay added to the gradient *before*
    the moment updates (spec: `base.py:164-183`).

    MEDIMG_FLAT_OPT=1 wraps the chain in `optax.flatten`: Adam then runs on
    ONE raveled parameter vector instead of ~100 per-leaf updates. Adam is
    purely elementwise, so the math is bit-identical; the point is TPU lane
    occupancy — the round-4 profiler trace shows ~14.5 ms/step of bf16[32]
    per-channel update fusions that a single lane-dense vector collapses
    into a few large ops (measured in tools/bench_flat_opt.py; PERF.md).
    NB the optimizer *state layout* changes (flat vectors), so checkpoints
    written with the flag on/off are not interchangeable — the layout is
    recorded in an `optimizer_layout.json` sidecar at save time and
    restores fail with an actionable message on mismatch (ADVICE r4;
    utils/checkpoint._check_layout_sidecar).
    """
    import os

    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8))
    txs.append(optax.scale(-lr))
    tx = optax.chain(*txs)
    if os.environ.get("MEDIMG_FLAT_OPT", "0") == "1":
        tx = optax.flatten(tx)
    return tx


def make_optimizer_from_config(optim_cfg):
    from ..utils.config import getattr_else_none as g

    return make_optimizer(
        lr=float(optim_cfg.lr),
        b1=float(g(optim_cfg, "b1", 0.9)),
        b2=float(g(optim_cfg, "b2", 0.999)),
        weight_decay=float(g(optim_cfg, "weight_decay", 0.0) or 0.0),
    )


def create_train_state(
    rng,
    enc_vars,
    dec_vars,
    vq_state,
    enc_tx,
    dec_tx,
    dis_vars=None,
    dis_tx: Optional[Any] = None,
) -> TrainState:
    dis_vars = dis_vars if dis_vars is not None else {}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        rng=rng,
        enc_vars=enc_vars,
        dec_vars=dec_vars,
        dis_vars=dis_vars,
        vq=vq_state,
        enc_opt=enc_tx.init(enc_vars["params"]),
        dec_opt=dec_tx.init(dec_vars["params"]),
        dis_opt=dis_tx.init(dis_vars["params"]) if (dis_tx and dis_vars) else (),
    )
