"""Worker for the two-process `jax.distributed` integration test.

Launched by tests/test_distributed_multiprocess.py with a pinned environment
(JAX_PLATFORMS=cpu, --xla_force_host_platform_device_count=2, axon
sitecustomize disabled), this builds the tiny first-stage trainer, joins a
2-process / 4-global-device mesh via `parallel.initialize_distributed` (the
reference's torch.distributed/NCCL bootstrap, `run_vqwnet.py:112-127`), runs
two data-parallel steps on a process-sharded global batch, and dumps the
replicated results for the parent to compare.

Not a pytest file (no `test_` prefix): invoked as
    python distributed_worker.py <process_id> <coordinator_port> <out.npz>
"""

import sys

import numpy as np


def build(axis_name, optimizer="sgd"):
    import jax
    import jax.numpy as jnp

    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.train import (
        create_train_state,
        make_first_stage_step,
        make_optimizer,
    )
    from medical_image_editing_tpu.train.first_stage import FirstStageLossConfig

    FILTERS = (4, 8, 16, 32, 64)
    DICT = 5
    AUG = {
        "modules": ["RandomHorizontalFlip", "RandomAffine", "RandomGaussianNoise"],
        "RandomHorizontalFlip": {"p": 0.5},
        "RandomAffine": {"degrees": 5.0, "translate": [0.02, 0.02], "p": 0.8},
        "RandomGaussianNoise": {"std": 0.03, "p": 0.5},
    }
    enc = EncoderWithVQ(
        filters=FILTERS, dict_size=DICT, momentum=0.9, axis_name=axis_name
    )
    dec = UNetDecoder(
        out_channels=1, filters=FILTERS, dropped_skip_layers=(),
        axis_name=axis_name,
    )
    x = jnp.zeros((1, 32, 32, 1))
    # derive every init key through init_seed with a PER-RANK seed_list: the
    # CLI's real path. Pins the invariant that the returned jax key is
    # identical on every process (process 0's seed broadcast — the DDP
    # rank-0 param broadcast equivalent); with the old per-process fold_in,
    # the cross-process digest identity check below would fail.
    from medical_image_editing_tpu.utils.seed import init_seed

    key, _ = init_seed([111, 222])
    k0, k1, k2, k3 = jax.random.split(key, 4)
    enc_vars, vq = enc.init(k0, x)
    q, *_ = enc(enc_vars, vq, x, train=False)
    dec_vars = dec.init({"params": k1, "dropblock": k2}, q, train=False)
    # SGD by default: the topology-transparency check compares parameter
    # updates between 2-process and 1-process runs. Updates linear in the
    # gradients keep cross-process reduction-order noise *relative* (~1e-5);
    # Adam's m/(sqrt(v)+eps) turns near-zero cancellation-dominated gradients
    # (bias grads over large spatial sums) into full +/-lr steps whose sign
    # flips under benign reduction reordering. Adam data-parallelism itself is
    # covered by the single-process 8-device tests.
    if optimizer == "adam":
        enc_tx, dec_tx = make_optimizer(1e-3), make_optimizer(1e-3)
    else:
        import optax

        enc_tx, dec_tx = optax.sgd(1e-5), optax.sgd(1e-5)
    state = create_train_state(k3, enc_vars, dec_vars, vq, enc_tx, dec_tx)
    step = make_first_stage_step(
        enc, dec, enc_tx, dec_tx,
        loss_cfg=FirstStageLossConfig(margin=0.5), aug_cfg=AUG, dict_size=DICT,
        axis_name=axis_name,
    )
    return state, step


def global_batch():
    """Deterministic global batch every process can reconstruct."""
    return np.random.default_rng(7).uniform(-1, 1, (4, 32, 32, 1)).astype(np.float32)


def digest(state):
    """Flat per-leaf sums over everything the step updates — any divergence
    between replicas shows up here. Used for the *exact* cross-process
    identity check (replicas must agree bit-for-bit)."""
    import jax

    leaves = jax.tree_util.tree_leaves(
        (state.enc_vars, state.dec_vars, state.vq, state.enc_opt, state.dec_opt)
    )
    return np.asarray(
        [float(np.asarray(l, dtype=np.float64).sum()) for l in leaves if hasattr(l, "dtype")]
    )


def flat_params(state):
    """Concatenated model params + VQ buffers, for the topology-transparency
    check vs a single-process run. Optimizer moments are excluded: they scale
    with the (large) raw gradients, where f32 reduction-order noise between
    gloo ring all-reduce and single-process XLA reduction is visible."""
    import jax

    leaves = jax.tree_util.tree_leaves((state.enc_vars, state.dec_vars, state.vq))
    return np.concatenate(
        [np.asarray(l, np.float64).ravel() for l in leaves if hasattr(l, "dtype")]
    )


def run_distributed(process_id: int, port: int, out_path: str):
    import jax

    from medical_image_editing_tpu.parallel import (
        DATA_AXIS,
        create_mesh,
        data_parallel,
        initialize_distributed,
        replicate,
    )

    initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    from jax.sharding import NamedSharding, PartitionSpec as P

    state, step = build(DATA_AXIS)
    mesh = create_mesh()
    state = replicate(mesh, state)

    batch = global_batch()
    # per-process dataset sharding: each process feeds only its contiguous
    # row block (rows are laid out on devices in mesh order).
    lo = process_id * 2
    image = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), batch[lo : lo + 2], batch.shape
    )

    flat0 = flat_params(jax.device_get(state))
    pstep = data_parallel(step, mesh, n_state_args=1)
    state, metrics1 = pstep(state, image, 0.0)
    digest1 = digest(jax.device_get(state))
    state, metrics2 = pstep(state, image, 0.0)

    np.savez(
        out_path,
        digest1=digest1,
        digest=digest(jax.device_get(state)),
        flat0=flat0,
        flat=flat_params(jax.device_get(state)),
        total1=float(metrics1["total"]),
        total2=float(metrics2["total"]),
        recon2=float(metrics2["recon"]),
        cross2=float(metrics2["cross"]),
        step=int(np.asarray(state.step)),
    )
    print(f"worker {process_id}: ok", flush=True)


if __name__ == "__main__":
    run_distributed(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
