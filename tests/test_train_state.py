"""Optimizer construction seams (`train/state.py::make_optimizer`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32)),
                 "bias": jnp.asarray(rng.normal(size=(16,)).astype(np.float32))},
        "dense": {"kernel": jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))},
    }


@pytest.mark.parametrize("weight_decay", [0.0, 1e-3])
def test_flat_opt_bitwise_equal(monkeypatch, weight_decay):
    """MEDIMG_FLAT_OPT=1 (optax.flatten over the Adam chain) must be
    *bit-identical* to the per-leaf path: Adam (and the torch-style
    pre-moment weight decay) is purely elementwise, so flattening changes
    only the fusion structure, never the values. This is what licenses the
    flag as a pure perf seam (PERF.md "Flat-parameter Adam" — a measured
    rejection on the flagship step, kept for larger-param families)."""
    from medical_image_editing_tpu.train.state import make_optimizer

    params = _params()
    grads = jax.tree.map(lambda p: jnp.sin(p * 3.0) * 0.1, params)

    monkeypatch.setenv("MEDIMG_FLAT_OPT", "0")
    tx_leaf = make_optimizer(1e-3, weight_decay=weight_decay)
    monkeypatch.setenv("MEDIMG_FLAT_OPT", "1")
    tx_flat = make_optimizer(1e-3, weight_decay=weight_decay)

    p_leaf, s_leaf = dict(params), tx_leaf.init(params)
    p_flat, s_flat = dict(params), tx_flat.init(params)
    import optax

    for _ in range(5):
        u, s_leaf = tx_leaf.update(grads, s_leaf, p_leaf)
        p_leaf = optax.apply_updates(p_leaf, u)
        u, s_flat = tx_flat.update(grads, s_flat, p_flat)
        p_flat = optax.apply_updates(p_flat, u)

    flat_leaves = jax.tree.leaves(p_leaf)
    for a, b in zip(flat_leaves, jax.tree.leaves(p_flat)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the updates actually moved the params
    assert not np.array_equal(np.asarray(flat_leaves[0]),
                              np.asarray(jax.tree.leaves(params)[0]))
