"""Tests for the legacy model family (VQWNet/StyledVQWNet/VQVNet/UNet/minGPT)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.models import (
    GPT,
    GPTConfig,
    StyledVQWNet,
    UNet,
    VQVNet,
    VQWNet,
)
from medical_image_editing_tpu.models.mingpt import forward_with_past
from medical_image_editing_tpu.ops.vq import vq_init

FILTERS = (4, 8, 16, 32, 64)


def test_vqwnet_forward_and_generate(rng):
    m = VQWNet(out_channels=1, filters=FILTERS)
    vq = vq_init(jax.random.key(9), 6, FILTERS[0])
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    vars_ = m.init({"params": jax.random.key(0), "dropblock": jax.random.key(1)},
                   x, vq, train=False)
    out = m.apply(vars_, x, vq, False)
    assert out["recon"].shape == (1, 32, 32, 1)
    assert out["ids"].min() >= 1
    assert float(out["commit_loss"]) > 0
    gen = m.apply(vars_, out["ids"] - 1, vq, method=m.generate_images_from_ids)
    assert gen["recon"].shape == (1, 32, 32, 1)


def test_vqwnet_freeze_first_half_stops_vq_update(rng):
    m = VQWNet(out_channels=1, filters=FILTERS, freeze_first_half=True)
    vq = vq_init(jax.random.key(9), 6, FILTERS[0])
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    vars_ = m.init({"params": jax.random.key(0), "dropblock": jax.random.key(1)},
                   x, vq, train=False)
    out = m.apply(vars_, x, vq, True, rngs={"dropblock": jax.random.key(2)})
    np.testing.assert_array_equal(
        np.asarray(out["vq_state"].cluster_size), np.asarray(vq.cluster_size))


def test_styled_vqwnet(rng):
    m = StyledVQWNet(out_channels=1, filters=FILTERS)
    vq = vq_init(jax.random.key(9), 6, FILTERS[0])
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    vars_ = m.init({"params": jax.random.key(0), "dropblock": jax.random.key(1)},
                   x, vq, train=False)
    out, _ = m.apply(vars_, x, vq, True, mutable=["batch_stats"],
                     rngs={"dropblock": jax.random.key(2)})
    assert out["recon"].shape == (1, 32, 32, 1)
    # the reference's generate_images_from_ids is broken for the styled
    # variant; ours works:
    gen = m.apply(vars_, out["ids"] - 1, vq, method=m.generate_images_from_ids)
    assert gen["recon"].shape == (1, 32, 32, 1)


def test_vqvnet(rng):
    m = VQVNet(out_channels=8, filters=FILTERS)
    vq = vq_init(jax.random.key(9), 4, 8)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    vars_ = m.init(jax.random.key(0), x, vq, train=False)
    out = m.apply(vars_, x, vq, False)
    assert out["embed"].shape == (1, 32, 32, 8)
    assert out["ids"].shape == (1, 32, 32)
    assert "recon" not in out


def test_unet_vanilla(rng):
    m = UNet(out_channels=3, filters=FILTERS, nearest=True)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    vars_ = m.init(jax.random.key(0), x, train=False)
    out, _ = m.apply(vars_, x, True, mutable=["batch_stats"])
    assert out.shape == (1, 32, 32, 3)


@pytest.mark.slow
def test_gpt_causality(rng):
    cfg = GPTConfig(vocab_size=10, block_size=16, n_layer=2, n_head=2, n_embed=16,
                    emb_pdrop=0.0, res_pdrop=0.0, att_pdrop=0.0)
    m = GPT(cfg)
    idx = jnp.asarray(rng.integers(0, 10, (1, 8)))
    vars_ = m.init(jax.random.key(0), idx, train=False)
    logits = m.apply(vars_, idx, False)
    assert logits.shape == (1, 8, 10)
    # causality: changing a future token must not change past logits
    idx2 = idx.at[0, 5].set((int(idx[0, 5]) + 1) % 10)
    logits2 = m.apply(vars_, idx2, False)
    np.testing.assert_allclose(np.asarray(logits[:, :5]), np.asarray(logits2[:, :5]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(logits[:, 5:]), np.asarray(logits2[:, 5:]))


def test_gpt_kv_cache_matches_full_forward(rng):
    cfg = GPTConfig(vocab_size=10, block_size=8, n_layer=2, n_head=2, n_embed=16,
                    emb_pdrop=0.0, res_pdrop=0.0, att_pdrop=0.0)
    m = GPT(cfg)
    idx = jnp.asarray(rng.integers(0, 10, (1, 6)))
    vars_ = m.init(jax.random.key(0), idx, train=False)
    full = np.asarray(m.apply(vars_, idx, False))

    caches = m.init_cache(batch=1)
    step_logits = []
    for t in range(6):
        logits, caches = forward_with_past(m, vars_, idx[:, t : t + 1], caches, t)
        step_logits.append(np.asarray(logits)[:, 0])
    inc = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(inc, full, atol=1e-4)


def test_hist_modes(rng):
    from medical_image_editing_tpu.utils.hist import (
        get_first_mode, get_largest_mode, get_last_mode, smooth_hist,
    )

    # bimodal data: peaks near 10 and 50
    data = np.concatenate([
        rng.normal(10, 1.0, 3000), rng.normal(50, 1.5, 1500)
    ]).astype(np.float64)
    grid, pdf = smooth_hist(data)
    assert grid.shape == (80,) and pdf.shape == (80,)
    assert abs(get_largest_mode(data) - 10) < 3
    assert abs(get_first_mode(data) - 10) < 3
    assert abs(get_last_mode(data) - 50) < 5


def test_gpt_torch_transplant_forward_parity(rng):
    """Weight-transplant logits parity vs the reference's own torch minGPT
    (`mingpt.py:122-194`) — pins q/k/v head layout, pre-LN block order, exact
    erf GELU (torch nn.GELU default; flax's default tanh approximation
    diverges at ~1e-3), final LN, and the untied bias-free head. The torch
    `forward_with_past` is unrunnable as shipped (`:219` appends `present` to
    itself, so `torch.stack([])` raises) — our KV-cache path is instead
    pinned against our full forward above."""
    torch = pytest.importorskip("torch")
    import parity_helpers as ph

    ref = ph.import_ref_module("mingpt")
    V, BLK, L, H, C = 11, 16, 2, 2, 16
    tm = ref.GPT(vocab_size=V, block_size=BLK, n_layer=L, n_head=H,
                 n_embed=C).eval()

    cfg = GPTConfig(vocab_size=V, block_size=BLK, n_layer=L, n_head=H,
                    n_embed=C, emb_pdrop=0.0, res_pdrop=0.0, att_pdrop=0.0)
    jm = GPT(cfg)

    def _lin(mod):
        p = {"kernel": jnp.asarray(np.array(mod.weight.detach().numpy().T, copy=True))}
        if mod.bias is not None:
            p["bias"] = jnp.asarray(np.array(mod.bias.detach().numpy(), copy=True))
        return p

    def _ln(mod):
        return {
            "scale": jnp.asarray(np.array(mod.weight.detach().numpy(), copy=True)),
            "bias": jnp.asarray(np.array(mod.bias.detach().numpy(), copy=True)),
        }

    params = {
        "tok_emb": {"embedding": jnp.asarray(
            np.array(tm.tok_embed.weight.detach().numpy(), copy=True))},
        "pos_emb": jnp.asarray(np.array(tm.pos_embed.detach().numpy(), copy=True)),
        "ln_f": _ln(tm.ln_f),
        "head": {"kernel": jnp.asarray(
            np.array(tm.head.weight.detach().numpy().T, copy=True))},
    }
    for i, blk in enumerate(tm.blocks):
        params[f"block_{i}"] = {
            "LayerNorm_0": _ln(blk.ln1),
            "LayerNorm_1": _ln(blk.ln2),
            "attn": {
                "q": _lin(blk.att.q), "k": _lin(blk.att.k), "v": _lin(blk.att.v),
                "proj": _lin(blk.att.proj),
            },
            "Dense_0": _lin(blk.mlp[0]),
            "Dense_1": _lin(blk.mlp[2]),
        }

    idx = rng.integers(0, V, (2, 9)).astype(np.int64)
    with torch.no_grad():
        logits_t = tm(torch.from_numpy(idx)).numpy()
    # this host's XLA-CPU runs default-precision matmuls in reduced precision
    with jax.default_matmul_precision("highest"):
        logits_j = jm.apply(
            {"params": params}, jnp.asarray(idx.astype(np.int32)), False
        )
        np.testing.assert_allclose(
            np.asarray(logits_j), logits_t, rtol=1e-4, atol=1e-5
        )

        # the KV-cache decode agrees with the (now torch-pinned) full forward
        caches = jm.init_cache(batch=2)
        for t in range(9):
            step, caches = forward_with_past(
                jm, {"params": params},
                jnp.asarray(idx[:, t:t+1].astype(np.int32)), caches, t,
            )
            np.testing.assert_allclose(
                np.asarray(step)[:, 0], logits_t[:, t], rtol=1e-4, atol=1e-5
            )
