"""Autoregressive prior over VQ code sequences (minGPT second stage).

The reference vendors taming's minGPT (`src/networks/mingpt.py`) but never
wires a trainer for it; this module completes the capability the taming
pipeline implies: train a causal transformer on the VQ-WNet/VQGAN id grids,
then sample novel id grids and decode them to images
(`get_embed_from_ids`/`generate_from_ids`).

TPU-first:
  * training is one jitted step — teacher-forced next-token cross-entropy
    over the flattened (row-major) id grid, grads `pmean`'d over the data
    axis when `axis_name` is set (same DP contract as every other step);
  * sampling is a `lax.scan` over the single-token KV-cache decode
    (`forward_with_past`) — static shapes, one compile, no per-token Python.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.mingpt import GPT, forward_with_past
from .state import per_device_keys


class PriorTrainState(NamedTuple):
    step: jax.Array
    rng: jax.Array
    variables: dict
    opt_state: optax.OptState


def create_prior_state(rng, gpt: GPT, tx: optax.GradientTransformation,
                       batch: int = 1) -> PriorTrainState:
    k0, k1 = jax.random.split(rng)
    idx = jnp.zeros((batch, gpt.config.block_size), jnp.int32)
    variables = gpt.init({"params": k0, "dropout": k1}, idx, True)
    return PriorTrainState(
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        variables=variables,
        opt_state=tx.init(variables["params"]),
    )


def ids_to_sequence(ids, sos_token: int):
    """(B,H,W) id grid -> (B, 1+H*W) int32 sequence with a start token.

    Row-major raster order, matching taming's `indices.view(B, -1)`."""
    b = ids.shape[0]
    flat = ids.reshape(b, -1).astype(jnp.int32)
    sos = jnp.full((b, 1), sos_token, jnp.int32)
    return jnp.concatenate([sos, flat], axis=1)


def make_prior_train_step(
    gpt: GPT,
    tx: optax.GradientTransformation,
    *,
    sos_token: int,
    axis_name: Optional[str] = None,
):
    """Teacher-forced LM step over id grids.

    step(state, ids (B,H,W)) -> (state', metrics). The input to the
    transformer is `[sos, ids[:-1]]`, the target is `ids` — standard
    next-token shift. `sos_token` should be `dict_size` (one past the last
    code id) with `vocab_size = dict_size + 1`.
    """

    def step_fn(state: PriorTrainState, ids):
        rng, k_drop = jax.random.split(state.rng)
        (k_drop,) = per_device_keys(axis_name, k_drop)
        seq = ids_to_sequence(ids, sos_token)
        inp, tgt = seq[:, :-1], seq[:, 1:]

        def loss_fn(params):
            variables = {**state.variables, "params": params}
            logits = gpt.apply(
                variables, inp, True, rngs={"dropout": k_drop}
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            loss = jnp.mean(nll)
            acc = jnp.mean(jnp.argmax(logits, axis=-1) == tgt)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.variables["params"]
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(
            grads, state.opt_state, state.variables["params"]
        )
        params = optax.apply_updates(state.variables["params"], updates)
        metrics = {"loss": loss, "acc": acc}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        new_state = PriorTrainState(
            step=state.step + 1,
            rng=rng,
            variables={**state.variables, "params": params},
            opt_state=opt_state,
        )
        return new_state, metrics

    return step_fn


def make_prior_sampler(
    gpt: GPT,
    *,
    sos_token: int,
    grid_hw,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    cache_dtype=None,
):
    """Build a jittable sampler: (variables, key, batch ids) -> (B,H,W) ids.

    `lax.scan` over the KV-cache decode — the whole H*W-token generation is
    one compiled program. Sampled ids are clipped into [0, sos_token) so the
    decoder never sees the start token (it can be produced early in training
    when the model is uncalibrated). `cache_dtype=jnp.bfloat16` halves the
    KV-cache HBM footprint (the decode's dominant allocation at large
    batch×block_size).
    """
    h, w = grid_hw
    n_tokens = h * w
    vocab = gpt.config.vocab_size
    assert n_tokens + 1 <= gpt.config.block_size + 1, (
        f"grid {h}x{w} needs block_size >= {n_tokens}, "
        f"got {gpt.config.block_size}"
    )

    def sample(variables, key, batch: int):
        caches = gpt.init_cache(batch, dtype=cache_dtype or jnp.float32)
        tok0 = jnp.full((batch, 1), sos_token, jnp.int32)

        def body(carry, i):
            tok, caches, key = carry
            logits, caches = forward_with_past(gpt, variables, tok, caches, i)
            logits = logits[:, 0, :].astype(jnp.float32) / temperature
            if top_k is not None and top_k < vocab:
                kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
                logits = jnp.where(logits < kth, -jnp.inf, logits)
            key, k = jax.random.split(key)
            nxt = jax.random.categorical(k, logits, axis=-1)[:, None]
            nxt = jnp.clip(nxt, 0, sos_token - 1).astype(jnp.int32)
            return (nxt, caches, key), nxt[:, 0]

        (_, _, _), toks = jax.lax.scan(
            body, (tok0, caches, key), jnp.arange(n_tokens)
        )
        return jnp.transpose(toks).reshape(batch, h, w)

    return sample
