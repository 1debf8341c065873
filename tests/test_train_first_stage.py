"""Integration tests: first-stage training step, single-device and
data-parallel on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.models import UNetDecoder
from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
from medical_image_editing_tpu.parallel import DATA_AXIS, create_mesh, data_parallel
from medical_image_editing_tpu.train import (
    TrainState,
    create_train_state,
    make_first_stage_step,
    make_optimizer,
)
from medical_image_editing_tpu.train.first_stage import (
    FirstStageLossConfig,
    init_codebook_step,
)

FILTERS = (4, 8, 16, 32, 64)
DICT = 5
AUG = {
    "modules": ["RandomHorizontalFlip", "RandomAffine", "RandomGaussianNoise"],
    "RandomHorizontalFlip": {"p": 0.5},
    "RandomAffine": {"degrees": 5.0, "translate": [0.02, 0.02], "p": 0.8},
    "RandomGaussianNoise": {"std": 0.03, "p": 0.5},
}


def _build(axis_name=None, use_dropblock=False):
    enc = EncoderWithVQ(filters=FILTERS, dict_size=DICT, momentum=0.9, axis_name=axis_name)
    dec = UNetDecoder(
        out_channels=1,
        filters=FILTERS,
        dropped_skip_layers=(),
        use_dropblock=use_dropblock,
        block_size=3,
        axis_name=axis_name,
    )
    x = jnp.zeros((1, 32, 32, 1))
    enc_vars, vq = enc.init(jax.random.key(0), x)
    q, *_ = enc(enc_vars, vq, x, train=False)
    dec_vars = dec.init(
        {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q, train=False
    )
    enc_tx = make_optimizer(1e-3)
    dec_tx = make_optimizer(1e-3)
    state = create_train_state(
        jax.random.key(3), enc_vars, dec_vars, vq, enc_tx, dec_tx
    )
    step = make_first_stage_step(
        enc, dec, enc_tx, dec_tx,
        loss_cfg=FirstStageLossConfig(margin=0.5),
        aug_cfg=AUG,
        dict_size=DICT,
        axis_name=axis_name,
    )
    return enc, dec, state, step


@pytest.mark.slow
def test_first_stage_step_runs_and_learns(rng):
    enc, dec, state, step = _build()
    image = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    jit_step = jax.jit(step)
    new_state, metrics = jit_step(state, image, 0.0)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1
    # params actually moved
    p0 = jax.tree.leaves(state.enc_vars["params"])[0]
    p1 = jax.tree.leaves(new_state.enc_vars["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # VQ EMA advanced
    assert not np.allclose(
        np.asarray(state.vq.cluster_size), np.asarray(new_state.vq.cluster_size)
    )
    # a few more steps decrease total loss (very loose: just stays finite)
    s = new_state
    for _ in range(2):
        s, m = jit_step(s, image, 0.0)
    assert np.isfinite(float(m["total"]))


def test_codebook_init_step(rng):
    enc, dec, state, _ = _build()
    image = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    init_fn = jax.jit(init_codebook_step(enc, num_iters=5))
    new_state = init_fn(state, image)
    assert not np.allclose(np.asarray(new_state.vq.embed), np.asarray(state.vq.embed))


def test_per_device_keys_decorrelate_across_mesh():
    """Under shard_map the replicated state.rng must yield a DIFFERENT stream
    per device (otherwise every device draws the same augmentations for its
    local shard — global randomness diversity B/n instead of B)."""
    from jax.sharding import PartitionSpec as P

    from medical_image_editing_tpu.train.state import per_device_keys

    mesh = create_mesh(jax.devices("cpu")[:8])
    base = jax.random.key(0)

    def f(k):
        (k1,) = per_device_keys(DATA_AXIS, k)
        return jax.random.key_data(k1)[None]

    out = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P(), out_specs=P(DATA_AXIS),
                      check_vma=False)
    )(base)
    assert len(np.unique(np.asarray(out), axis=0)) == 8
    # single-device: exact passthrough (numerics unchanged)
    (same,) = per_device_keys(None, base)
    assert same is base


@pytest.mark.slow
def test_first_stage_data_parallel_matches_replicated_semantics(rng):
    """The shard_map'd step must produce identical (replicated) state on all
    devices and run end to end on the 8-device mesh."""
    devices = jax.devices("cpu")[:8]
    mesh = create_mesh(devices)
    enc, dec, state, step = _build(axis_name=DATA_AXIS)

    dp_step = data_parallel(step, mesh, n_state_args=1)

    from medical_image_editing_tpu.parallel import replicate, shard_batch

    state = replicate(mesh, state)
    image = shard_batch(
        mesh, jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32))
    )
    drop = replicate(mesh, jnp.float32(0.0))

    new_state, metrics = dp_step(state, image, drop)
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1
    # second step to ensure the compiled path is stable
    new_state2, m2 = dp_step(new_state, image, drop)
    assert int(new_state2.step) == 2
    assert np.isfinite(float(m2["total"]))


@pytest.mark.slow
def test_first_stage_with_dropblock(rng):
    enc, dec, state, step = _build(use_dropblock=True)
    image = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    new_state, metrics = jax.jit(step)(state, image, 0.3)
    assert np.isfinite(float(metrics["total"]))


def test_first_stage_decoder_stats_chain_both_views(rng):
    """The decoder's batch_stats update from the view-1 decode must feed the
    view-2 decode and both must survive into the new state — torch BN buffers
    update in place between the two decodes (`single_window_trainer.py:68-159`).
    A counting 'batch_stats' variable ends at 2 iff the updates chain."""
    from flax import linen as nn

    class CountingDecoder(nn.Module):
        @nn.compact
        def __call__(self, x, train=True, drop_prob=0.0):
            cnt = self.variable(
                "batch_stats", "count", lambda: jnp.zeros((), jnp.float32)
            )
            if train:
                cnt.value = cnt.value + 1.0
            return jnp.tanh(nn.Conv(1, (1, 1))(x))

    enc = EncoderWithVQ(filters=FILTERS, dict_size=DICT, momentum=0.9)
    dec = CountingDecoder()
    x = jnp.zeros((1, 16, 16, 1))
    enc_vars, vq = enc.init(jax.random.key(0), x)
    q, *_ = enc(enc_vars, vq, x, train=False)
    dec_vars = dec.init(jax.random.key(1), q, train=False)
    assert float(dec_vars["batch_stats"]["count"]) == 0.0

    enc_tx = make_optimizer(1e-3)
    dec_tx = make_optimizer(1e-3)
    state = create_train_state(
        jax.random.key(3), enc_vars, dec_vars, vq, enc_tx, dec_tx
    )
    step = make_first_stage_step(
        enc, dec, enc_tx, dec_tx,
        loss_cfg=FirstStageLossConfig(margin=0.5),
        aug_cfg=AUG, dict_size=DICT,
    )
    image = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32))
    new_state, _ = step(state, image, 0.0)
    assert float(new_state.dec_vars["batch_stats"]["count"]) == 2.0
