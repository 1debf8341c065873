"""Spatially-partitioned 3-D training step (stretch, BASELINE config #5).

Mesh: ('data', 'spatial') — volumes sharded over 'data' on the batch axis and
over 'spatial' on the DEPTH axis. The step annotates activations with
`with_sharding_constraint` and compiles under plain `jax.jit` over the mesh;
XLA's SPMD partitioner inserts the halo exchanges the 3-D convolutions need
across depth shards (no hand-written collectives). Gradients reduce over BOTH
axes automatically (the loss is a global mean under GSPMD).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.volumetric import (
    VolumetricUNetDecoder,
    VolumetricUNetEncoder,
    volumetric_forward,
)


def create_volumetric_mesh(devices, data: int, spatial: int) -> Mesh:
    import numpy as np

    assert data * spatial == len(devices), (data, spatial, len(devices))
    return Mesh(np.asarray(devices).reshape(data, spatial), ("data", "spatial"))


def make_volumetric_train_step(
    encoder: VolumetricUNetEncoder,
    decoder: VolumetricUNetDecoder,
    enc_tx: optax.GradientTransformation,
    dec_tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    momentum: float = 0.99,
    w_commit: float = 1.0,
):
    """Minimal 3-D objective: reconstruction MSE + commit loss (the volumetric
    analogue of the first-stage recon path; the dual-view equivariance loss
    lifts identically if needed)."""

    vol_spec = P("data", "spatial") if mesh is not None else None

    def constrain(x):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, vol_spec))

    def step(enc_vars, dec_vars, vq_state, enc_opt, dec_opt, volume):
        volume = constrain(volume)

        def loss_fn(ep, dp):
            recon, commit, ids, new_vq = volumetric_forward(
                encoder,
                decoder,
                {"params": ep},
                {"params": dp},
                vq_state,
                volume,
                momentum=momentum,
                train=True,
            )
            recon = constrain(recon)
            l_recon = jnp.mean((recon - volume.astype(jnp.float32)) ** 2)
            total = l_recon + w_commit * commit
            return total, {"vq": new_vq, "recon": l_recon, "commit": commit}

        (total, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            enc_vars["params"], dec_vars["params"]
        )
        enc_g, dec_g = grads
        enc_updates, enc_opt = enc_tx.update(enc_g, enc_opt, enc_vars["params"])
        dec_updates, dec_opt = dec_tx.update(dec_g, dec_opt, dec_vars["params"])
        enc_vars = {"params": optax.apply_updates(enc_vars["params"], enc_updates)}
        dec_vars = {"params": optax.apply_updates(dec_vars["params"], dec_updates)}
        metrics = {"total": total, "recon": aux["recon"], "commit": aux["commit"]}
        return enc_vars, dec_vars, aux["vq"], enc_opt, dec_opt, metrics

    if mesh is None:
        return jax.jit(step)
    # GSPMD: jit over the mesh; inputs placed by the caller
    return jax.jit(step)


def init_volumetric(key, *, filters=(8, 16, 32, 64), dict_size: int = 10,
                    volume_shape=(1, 16, 16, 16, 1), lr: float = 1e-4,
                    dtype=None, use_remat: bool = False):
    """Build encoder/decoder/vq + optimizers for the 3-D model.

    `dtype=jnp.bfloat16` + `use_remat=True` is the 128³-on-one-chip memory
    plan (PERF.md): bf16 halves every activation, per-block remat drops the
    intra-block ones entirely."""
    from ..ops.vq import vq_init
    from .state import make_optimizer

    enc = VolumetricUNetEncoder(filters=filters, dtype=dtype, use_remat=use_remat)
    dec = VolumetricUNetDecoder(out_channels=volume_shape[-1], filters=filters,
                                dtype=dtype, use_remat=use_remat)
    k0, k1, k2 = jax.random.split(key, 3)
    x0 = jnp.zeros(volume_shape, jnp.float32)
    enc_vars = enc.init(k0, x0, train=False)
    feats = enc.apply(enc_vars, x0, train=False)
    dec_vars = dec.init(k1, feats, train=False)
    vq = vq_init(k2, dict_size, filters[0])
    enc_tx, dec_tx = make_optimizer(lr), make_optimizer(lr)
    return enc, dec, enc_vars, dec_vars, vq, enc_tx, dec_tx
