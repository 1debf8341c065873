"""minGPT: causal transformer over VQ code sequences, with KV-cache decoding.

Behavioral spec: reference `src/networks/mingpt.py` (vendored taming
minGPT) — GPTConfig (vocab_size, block_size, n_layer/n_head/n_embed,
embd/resid/attn dropout, optional n_unmasked prefix), CausalSelfAttention with
a lower-triangular mask, pre-LN Blocks with GELU MLPs, learned positional
embeddings, and `forward_with_past` incremental decoding with a KV cache
(`:195-224`). Like the reference, nothing wires this to a trainer — it is the
scaffolding for an autoregressive prior over VQ ids.

TPU-first: the KV cache is a PREALLOCATED (n_layer, 2, B, n_head, block_size,
head_dim) array updated with `lax.dynamic_update_slice` at a position index —
static shapes, so the single-token decode step compiles once and can be
`lax.scan`ned, instead of the reference's per-step `torch.cat` growth.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GPTConfig(NamedTuple):
    """Spec: `mingpt.py:15-31` (GPT1Config defaults)."""

    vocab_size: int
    block_size: int
    n_layer: int = 12
    n_head: int = 12
    n_embed: int = 768
    emb_pdrop: float = 0.1
    res_pdrop: float = 0.1
    att_pdrop: float = 0.1
    n_unmasked: int = 0


class CausalSelfAttention(nn.Module):
    config: GPTConfig

    @nn.compact
    def __call__(self, x, train: bool = True, cache=None, pos: Optional[int] = None):
        """x: (B,T,C). With `cache` (2,B,nh,block,hd) and scalar `pos`, runs
        single-token incremental attention and returns (y, new_cache)."""
        cfg = self.config
        b, t, c = x.shape
        nh = cfg.n_head
        hd = c // nh

        def heads(name):
            h = nn.Dense(c, name=name)(x)
            return h.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)  # (B,nh,T,hd)

        q, k, v = heads("q"), heads("k"), heads("v")

        if cache is not None:
            # incremental: t == 1, write k/v at `pos`, attend over cache.
            # k/v adopt the cache dtype — a bfloat16 cache halves the decode's
            # HBM footprint (the standard inference-serving trade)
            k_cache = jax.lax.dynamic_update_slice(
                cache[0], k.astype(cache.dtype), (0, 0, pos, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                cache[1], v.astype(cache.dtype), (0, 0, pos, 0)
            )
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache) / jnp.sqrt(hd)
            col = jax.lax.broadcasted_iota(jnp.int32, att.shape, 3)
            att = jnp.where(col <= pos, att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, v_cache)
            new_cache = jnp.stack([k_cache, v_cache])
        else:
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
            row = jax.lax.broadcasted_iota(jnp.int32, att.shape, 2)
            col = jax.lax.broadcasted_iota(jnp.int32, att.shape, 3)
            causal = col <= row
            if cfg.n_unmasked > 0:  # spec `:54-56`
                causal = causal | ((row < cfg.n_unmasked) & (col < cfg.n_unmasked))
            att = jnp.where(causal, att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1)
            att = nn.Dropout(cfg.att_pdrop, deterministic=not train)(att)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
            new_cache = None

        y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
        y = nn.Dense(c, name="proj")(y)
        y = nn.Dropout(cfg.res_pdrop, deterministic=not train)(y)
        return y, new_cache


class Block(nn.Module):
    """Pre-LN transformer block with 4× GELU MLP. Spec: taming minGPT Block."""

    config: GPTConfig

    @nn.compact
    def __call__(self, x, train: bool = True, cache=None, pos=None):
        # epsilon=1e-5: torch nn.LayerNorm default (flax defaults to 1e-6)
        attn_out, new_cache = CausalSelfAttention(self.config, name="attn")(
            nn.LayerNorm(epsilon=1e-5)(x), train, cache, pos
        )
        x = x + attn_out
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.Dense(4 * self.config.n_embed)(h)
        # exact erf GELU: torch nn.GELU() default (`mingpt.py:102`); flax's
        # default is the tanh approximation, which diverges at ~1e-3
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.config.n_embed)(h)
        h = nn.Dropout(self.config.res_pdrop, deterministic=not train)(h)
        return x + h, new_cache


class GPT(nn.Module):
    """Spec: `mingpt.py` GPT — token + learned positional embeddings, blocks,
    final LN, untied linear head."""

    config: GPTConfig

    @nn.compact
    def __call__(self, idx, train: bool = True, caches=None, pos=None):
        cfg = self.config
        b, t = idx.shape
        tok = nn.Embed(cfg.vocab_size, cfg.n_embed, name="tok_emb")(idx)
        pos_emb = self.param(
            "pos_emb", nn.initializers.zeros, (1, cfg.block_size, cfg.n_embed)
        )
        if caches is not None:
            pe = jax.lax.dynamic_slice(pos_emb, (0, pos, 0), (1, t, cfg.n_embed))
        else:
            pe = pos_emb[:, :t]
        x = nn.Dropout(cfg.emb_pdrop, deterministic=not train)(tok + pe)

        new_caches = []
        for i in range(cfg.n_layer):
            cache = caches[i] if caches is not None else None
            x, nc = Block(cfg, name=f"block_{i}")(x, train, cache, pos)
            new_caches.append(nc)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_f")(x)
        logits = nn.Dense(cfg.vocab_size, use_bias=False, name="head")(x)
        if caches is not None:
            return logits, jnp.stack(new_caches)
        return logits

    def init_cache(self, batch: int, dtype=jnp.float32):
        cfg = self.config
        hd = cfg.n_embed // cfg.n_head
        return jnp.zeros(
            (cfg.n_layer, 2, batch, cfg.n_head, cfg.block_size, hd), dtype
        )


def forward_with_past(gpt: GPT, variables, idx_t, caches, pos: int):
    """One decode step with the KV cache. Spec: `mingpt.py:195-224`
    (`forward_with_past`), reshaped for static-shape caches.

    idx_t: (B,1) current token; caches: from `GPT.init_cache` or a previous
    step; pos: current position. Returns (logits (B,1,V), new_caches).
    """
    return gpt.apply(variables, idx_t, False, caches, pos)
