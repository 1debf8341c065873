"""Numerical parity against the reference's own torch modules.

Loads the *standalone* reference files (torch-only imports) directly from
/root/reference, transplants their randomly-initialized weights into our flax
modules (OIHW→HWIO, NCHW→NHWC) and checks the outputs match — the bit-level
basis for the BASELINE "recon PSNR/SSIM within 0.1 dB" parity claim. Skipped
when the reference checkout is absent.

Nothing from the reference is copied; its modules are imported read-only at
test time as the golden implementation.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/src/networks"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _load(name, fname):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_blocks():
    torch = pytest.importorskip("torch")
    return _load("ref_blocks", "blocks.py"), torch


def _t2j_conv(w):
    """torch conv weight OIHW → flax HWIO."""
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_double_conv_parity(torch_blocks, rng):
    ref, torch = torch_blocks
    from medical_image_editing_tpu.models import DoubleConv

    tmod = ref.DoubleConv(3, 8).eval()
    x = rng.normal(size=(2, 12, 12, 3)).astype(np.float32)

    jmod = DoubleConv(8)
    variables = jmod.init(jax.random.key(0), jnp.asarray(x))
    convs = [m for m in tmod.double_conv if isinstance(m, torch.nn.Conv2d)]
    params = {
        "Conv_0": {"kernel": _t2j_conv(convs[0].weight),
                   "bias": jnp.asarray(convs[0].bias.detach().numpy())},
        "Conv_1": {"kernel": _t2j_conv(convs[1].weight),
                   "bias": jnp.asarray(convs[1].bias.detach().numpy())},
    }
    out_j = np.asarray(jmod.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(_nchw(x))).numpy()
    np.testing.assert_allclose(out_j, _nhwc(out_t), rtol=1e-4, atol=1e-5)


def test_res_block_parity(torch_blocks, rng):
    ref, torch = torch_blocks
    from medical_image_editing_tpu.models import ResBlock

    tmod = ref.ResBlock(3, 8).eval()
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)

    jmod = ResBlock(8)
    convs = [m for m in tmod.double_conv.double_conv if isinstance(m, torch.nn.Conv2d)]
    sc = tmod.downsample[0]
    params = {
        "Conv_0": {"kernel": _t2j_conv(sc.weight)},
        "DoubleConv_0": {
            "Conv_0": {"kernel": _t2j_conv(convs[0].weight),
                       "bias": jnp.asarray(convs[0].bias.detach().numpy())},
            "Conv_1": {"kernel": _t2j_conv(convs[1].weight),
                       "bias": jnp.asarray(convs[1].bias.detach().numpy())},
        },
    }
    pooled_j, skip_j = jmod.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        pooled_t, skip_t = tmod(torch.from_numpy(_nchw(x)))
    np.testing.assert_allclose(np.asarray(pooled_j), _nhwc(pooled_t.numpy()),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(skip_j), _nhwc(skip_t.numpy()),
                               rtol=1e-4, atol=1e-5)


def test_instance_norm_matches_torch(torch_blocks, rng):
    ref, torch = torch_blocks
    from medical_image_editing_tpu.models import instance_norm

    x = rng.normal(2.0, 3.0, (2, 9, 9, 5)).astype(np.float32)
    with torch.no_grad():
        out_t = torch.nn.InstanceNorm2d(5)(torch.from_numpy(_nchw(x))).numpy()
    out_j = np.asarray(instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(out_j, _nhwc(out_t), rtol=1e-4, atol=1e-5)


def test_styled_denorm_parity(torch_blocks, rng):
    ref, torch = torch_blocks
    from medical_image_editing_tpu.models import StyledDenorm

    tmod = ref.StyledDenorm(6, 4).train()  # batch stats from the batch
    x = rng.normal(size=(4, 8, 8, 6)).astype(np.float32)
    style = rng.normal(size=(4, 8, 8, 4)).astype(np.float32)

    jmod = StyledDenorm(6)
    variables = jmod.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(style), True)
    shared = tmod.mlp_shared[0]
    params = {
        "Conv_0": {"kernel": _t2j_conv(shared.weight),
                   "bias": jnp.asarray(shared.bias.detach().numpy())},
        "Conv_1": {"kernel": _t2j_conv(tmod.mlp_gamma.weight),
                   "bias": jnp.asarray(tmod.mlp_gamma.bias.detach().numpy())},
        "Conv_2": {"kernel": _t2j_conv(tmod.mlp_beta.weight),
                   "bias": jnp.asarray(tmod.mlp_beta.bias.detach().numpy())},
    }
    out_j, _ = jmod.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), jnp.asarray(style), True, mutable=["batch_stats"],
    )
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(_nchw(x)), torch.from_numpy(_nchw(style))).numpy()
    np.testing.assert_allclose(np.asarray(out_j), _nhwc(out_t), rtol=1e-3, atol=1e-4)


def test_aspp_parity(rng):
    torch = pytest.importorskip("torch")
    ref_aspp = _load("ref_aspp", "aspp.py")
    from medical_image_editing_tpu.models import ASPP

    tmod = ref_aspp.ASPP(6, 8, [2, 6, 12, 18]).eval()
    x = rng.normal(size=(1, 24, 24, 6)).astype(np.float32)

    jmod = ASPP(8, rates=(2, 6, 12, 18))
    params = {}
    for i, stage in enumerate(tmod.stages.children()):
        conv = stage.conv
        params[f"Conv_{i}"] = {"kernel": _t2j_conv(conv.weight)}
    out_j = np.asarray(jmod.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(_nchw(x))).numpy()
    np.testing.assert_allclose(out_j, _nhwc(out_t), rtol=1e-4, atol=1e-5)


def test_vq_semantics_vs_torch_reference(rng):
    """The VQ forward math vs a torch reimplementation of the reference's
    `VQModule._quantize` torch-backend semantics (vq_module.py:45-62,159-200).
    (The reference file itself imports utils/ so its numbers are recomputed
    here with torch ops following the cited lines.)"""
    torch = pytest.importorskip("torch")
    from medical_image_editing_tpu.ops.vq import VQState, vq_apply

    k, c, momentum, eps = 10, 16, 0.99, 1e-5
    embed = rng.normal(size=(k, c)).astype(np.float32)
    cluster_size = rng.uniform(0, 2, (k,)).astype(np.float32)
    embed_avg = rng.normal(size=(k, c)).astype(np.float32)
    x = rng.normal(size=(2, 8, 8, c)).astype(np.float32)

    # torch path (NCHW), following vq_module.py
    t_embed = torch.from_numpy(embed.copy())
    t_cs = torch.from_numpy(cluster_size.copy())
    t_avg = torch.from_numpy(embed_avg.copy().T)  # reference stores (C,K)
    t_in = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    flatten = t_in.transpose(1, -1).reshape(-1, c)
    scores = t_embed.mm(flatten.t()) * 2
    scores -= t_embed.pow(2).sum(1, keepdim=True)
    scores -= flatten.pow(2).sum(1).unsqueeze_(0)
    ids_t = scores.topk(1, dim=0)[1].t().view(-1)
    onehot = torch.nn.functional.one_hot(ids_t, k).float()
    t_cs.mul_(momentum).add_(onehot.sum(0), alpha=1 - momentum)
    t_avg.mul_(momentum).add_(flatten.t() @ onehot, alpha=1 - momentum)
    n = t_cs.sum()
    smoothed = n * (t_cs + eps) / (n + k * eps)
    new_embed_t = (t_avg.t() / smoothed.unsqueeze(1)).numpy()

    state = VQState(jnp.asarray(embed), jnp.asarray(cluster_size), jnp.asarray(embed_avg))
    _, _, ids_j, new_state = vq_apply(state, jnp.asarray(x), momentum=momentum, eps=eps)

    # NB torch flattens NCHW via transpose(1,-1) → (B,W,H,C) scan order; ids
    # sets must match regardless of scan order, and the EMA results are
    # order-invariant:
    np.testing.assert_allclose(np.asarray(new_state.embed), new_embed_t,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.sort(np.asarray(ids_j).ravel()), np.sort(ids_t.numpy()))
