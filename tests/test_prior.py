"""Autoregressive VQ-id prior (minGPT trainer + scan sampler).

The reference vendors minGPT but never wires a trainer (SURVEY.md §2.3);
train/prior.py completes the taming-style pipeline. These tests pin the LM
step (teacher forcing, shift, masking via causal attention), overfitting
dynamics, and the KV-cache scan sampler end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medical_image_editing_tpu.models.mingpt import GPT, GPTConfig
from medical_image_editing_tpu.train.prior import (
    create_prior_state,
    ids_to_sequence,
    make_prior_sampler,
    make_prior_train_step,
)

DICT = 6  # code ids 0..5, sos token 6
GRID = (4, 4)


def _gpt():
    cfg = GPTConfig(
        vocab_size=DICT + 1,
        block_size=GRID[0] * GRID[1],
        n_layer=2,
        n_head=2,
        n_embed=32,
        emb_pdrop=0.0,
        res_pdrop=0.0,
        att_pdrop=0.0,
    )
    return GPT(cfg)


def test_ids_to_sequence_layout():
    ids = jnp.arange(16, dtype=jnp.int32).reshape(1, 4, 4) % DICT
    seq = ids_to_sequence(ids, sos_token=DICT)
    assert seq.shape == (1, 17)
    assert int(seq[0, 0]) == DICT
    np.testing.assert_array_equal(
        np.asarray(seq[0, 1:]), np.arange(16) % DICT
    )


def test_prior_overfits_fixed_grid():
    gpt = _gpt()
    tx = optax.adam(3e-3)
    state = create_prior_state(jax.random.key(0), gpt, tx, batch=2)
    step = jax.jit(make_prior_train_step(gpt, tx, sos_token=DICT))

    rng = np.random.default_rng(3)
    # one fixed grid replicated over the batch: the prior conditions only on
    # the token prefix, so distinct grids per row would make the first tokens
    # inherently ambiguous and cap the achievable accuracy
    one = rng.integers(0, DICT, (1,) + GRID)
    ids = jnp.asarray(np.repeat(one, 2, axis=0), jnp.int32)

    state, m0 = step(state, ids)
    losses = [float(m0["loss"])]
    for _ in range(150):
        state, m = step(state, ids)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.05, losses[-1]
    assert losses[-1] < losses[0] / 10
    assert float(m["acc"]) == 1.0
    assert int(state.step) == 151

    # the overfit model reproduces the memorized grid greedily: sampling with
    # a very low temperature recovers it exactly
    sample = jax.jit(
        make_prior_sampler(gpt, sos_token=DICT, grid_hw=GRID, temperature=1e-4),
        static_argnums=2,
    )
    out = sample(state.variables, jax.random.key(1), 2)
    assert out.shape == (2,) + GRID
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ids))


def test_sampler_shapes_range_and_determinism():
    gpt = _gpt()
    tx = optax.adam(1e-3)
    state = create_prior_state(jax.random.key(0), gpt, tx, batch=1)
    sample = jax.jit(
        make_prior_sampler(gpt, sos_token=DICT, grid_hw=GRID, top_k=3),
        static_argnums=2,
    )
    a = sample(state.variables, jax.random.key(7), 3)
    b = sample(state.variables, jax.random.key(7), 3)
    c = sample(state.variables, jax.random.key(8), 3)
    assert a.shape == (3,) + GRID and a.dtype == jnp.int32
    assert int(jnp.min(a)) >= 0 and int(jnp.max(a)) < DICT  # never sos
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_prior_end_to_end_with_vqwnet():
    """ids from the real encoder -> one LM step -> sample -> decode."""
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import (
        EncoderWithVQ,
        get_embed_from_ids,
    )

    enc = EncoderWithVQ(filters=(4, 8, 16, 32, 64), dict_size=DICT, momentum=0.9)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 16, 16, 1)), jnp.float32
    )
    enc_vars, vq = enc.init(jax.random.key(0), x)
    _, _, ids, vq, _ = enc(enc_vars, vq, x, train=False)
    assert ids.shape == (2, 16, 16)

    cfg = GPTConfig(
        vocab_size=DICT + 1, block_size=256, n_layer=1, n_head=2, n_embed=32,
        emb_pdrop=0.0, res_pdrop=0.0, att_pdrop=0.0,
    )
    gpt = GPT(cfg)
    tx = optax.adam(1e-3)
    state = create_prior_state(jax.random.key(1), gpt, tx, batch=2)
    step = jax.jit(make_prior_train_step(gpt, tx, sos_token=DICT))
    state, m = step(state, ids)
    assert np.isfinite(float(m["loss"]))

    sample = jax.jit(
        make_prior_sampler(gpt, sos_token=DICT, grid_hw=(16, 16)),
        static_argnums=2,
    )
    new_ids = sample(state.variables, jax.random.key(2), 1)
    embed = get_embed_from_ids(vq, new_ids)
    assert embed.shape == (1, 16, 16, 4)

    dec = UNetDecoder(out_channels=1, filters=(4, 8, 16, 32, 64),
                      dropped_skip_layers=(), use_pixel_shuffle=False)
    dec_vars = dec.init(
        {"params": jax.random.key(3), "dropblock": jax.random.key(4)},
        embed, train=False,
    )
    img = dec.apply(dec_vars, embed, False, 0.0)
    assert img.shape == (1, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(img)))


@pytest.mark.slow
def test_train_prior_cli_end_to_end(tmp_path):
    """CLI smoke: synthetic dataset → id extraction → LM steps → sample →
    decode → PNG + ids + prior checkpoint on disk. The id grid is
    full-resolution (the UNet encoder upsamples back before VQ), so 64²
    images mean 4096-token sequences — the scan sampler generates all of
    them in one compiled program."""
    import json
    import os

    from medical_image_editing_tpu.cli import train_prior

    cfg = {
        "dataset": {
            "dataset_name": "SyntheticSliceDataset",
            "root_dir_path": str(tmp_path), "batch_size": 2,
            "num_workers": 0, "image_size": [64, 64],
        },
        "model": {"vqmodel": {
            "in_channels": 1, "enc_filters": [4, 8, 16, 32, 64],
            "dec_filters": [4, 8, 16, 32, 64], "dict_size": 5,
            "momentum": 0.99, "dec_use_styled_up_block": True,
        }},
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "prior_out"
    rc = train_prior.main([
        "-c", str(cfg_path), "--steps", "3", "--sample", "2",
        "--n-layer", "1", "--n-head", "2", "--n-embd", "16",
        "--log-every", "1", "--out", str(out),
    ])
    assert rc == 0
    assert os.path.isdir(out / "prior_ckpt")
    assert (out / "samples.png").stat().st_size > 0
    ids = np.load(out / "sample_ids.npy")
    assert ids.shape == (2, 64, 64)  # VQ grid is full resolution
    assert ids.min() >= 0 and ids.max() < 5


def test_sampler_bf16_cache_matches_f32_logits():
    """bfloat16 KV cache: decode logits stay close to the f32-cache path and
    the scan sampler produces valid grids."""
    from medical_image_editing_tpu.models.mingpt import forward_with_past

    gpt = _gpt()
    variables = gpt.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, gpt.config.block_size), jnp.int32), False,
    )
    tok = jnp.asarray([[DICT]], jnp.int32)
    c32 = gpt.init_cache(1, dtype=jnp.float32)
    c16 = gpt.init_cache(1, dtype=jnp.bfloat16)
    l32, c32 = forward_with_past(gpt, variables, tok, c32, 0)
    l16, c16 = forward_with_past(gpt, variables, tok, c16, 0)
    assert c16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(l32), np.asarray(l16),
                               rtol=2e-2, atol=2e-2)
    sampler = jax.jit(
        make_prior_sampler(gpt, sos_token=DICT, grid_hw=GRID,
                           cache_dtype=jnp.bfloat16),
        static_argnums=(2,),
    )
    ids = np.asarray(sampler(variables, jax.random.key(1), 2))
    assert ids.shape == (2, *GRID)
    assert ids.min() >= 0 and ids.max() < DICT
