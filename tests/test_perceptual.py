"""Tests for the VGG/LPIPS-style perceptual losses (random-feature fallback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.ops.perceptual import (
    make_lpips_loss,
    make_perceptual_loss,
    make_vgg_loss,
)


@pytest.mark.parametrize("factory", [lambda: make_vgg_loss("22"),
                                     lambda: make_vgg_loss("54"),
                                     make_lpips_loss])
@pytest.mark.slow
def test_perceptual_zero_for_identical(factory, rng):
    with pytest.warns(UserWarning):
        loss = factory()
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-8)
    y = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    assert float(loss(x, y)) > 0


def test_perceptual_gradient_reaches_pred_only(rng):
    with pytest.warns(UserWarning):
        loss = make_vgg_loss("22")
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32))
    gx = jax.grad(lambda p: loss(p, y))(x)
    assert float(jnp.sum(jnp.abs(gx))) > 0
    gy = jax.grad(lambda t: loss(x, t))(y)
    np.testing.assert_allclose(np.asarray(gy), 0.0)  # target stop-gradient


def test_make_perceptual_loss_dispatch():
    with pytest.warns(UserWarning):
        assert make_perceptual_loss("vgg") is not None
    with pytest.warns(UserWarning):
        assert make_perceptual_loss("lpips") is not None
    with pytest.raises(ValueError):
        make_perceptual_loss("nope")


def test_perceptual_three_channel_input(rng):
    with pytest.warns(UserWarning):
        loss = make_vgg_loss("22")
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    assert np.isfinite(float(loss(x, x * 0.5)))


# ---------------------------------------------------------------------------
# Weight-transplant parity vs the torch formulas (VERDICT r1 item 3).
# torchvision/lpips aren't in this environment, so the torch side is built
# layer-by-layer to the reference formulas (`perceptual_loss.py`,
# `lpips_loss.py` + lpips v0.1 semantics) with random weights; the npz
# transplant must then reproduce the torch loss values exactly.
# ---------------------------------------------------------------------------


def _torch_vgg19_features(n_modules, gen):
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    seq = nn.Sequential(*layers[:n_modules])
    import torch

    with torch.no_grad():
        for m in seq:
            if isinstance(m, nn.Conv2d):
                m.weight.copy_(torch.from_numpy(
                    gen.normal(0, 0.05, m.weight.shape).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(
                    gen.normal(0, 0.05, m.bias.shape).astype(np.float32)))
    return seq


def test_vgg_npz_transplant_parity_torch(tmp_path, monkeypatch, rng):
    """VGGLoss value parity: torch reference formula (expand→vgg→MSE, raw
    [-1,1] inputs, `perceptual_loss.py:44-57`) vs the JAX stack with the same
    weights loaded through MEDIMG_VGG19_NPZ."""
    import torch

    seq = _torch_vgg19_features(8, rng)  # conv_index '22'
    # export with torchvision state_dict key layout (features.{i}.weight)
    arrs = {}
    for i, m in enumerate(seq):
        if hasattr(m, "weight"):
            arrs[f"features.{i}.weight"] = m.weight.detach().numpy()
            arrs[f"features.{i}.bias"] = m.bias.detach().numpy()
    npz = tmp_path / "vgg19.npz"
    np.savez(npz, **arrs)
    monkeypatch.setenv("MEDIMG_VGG19_NPZ", str(npz))

    loss = make_vgg_loss("22")
    assert loss.pretrained

    x = rng.uniform(-1, 1, (2, 1, 32, 32)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        sr = torch.from_numpy(x).expand(2, 3, 32, 32)
        hr = torch.from_numpy(y).expand(2, 3, 32, 32)
        want = torch.nn.functional.mse_loss(seq(sr), seq(hr)).item()

    got = float(loss(jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(y.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_lpips_alex_npz_transplant_parity_torch(tmp_path, monkeypatch, rng):
    """LPIPS(alex) value parity: torch implementation of lpips v0.1 semantics
    (scaling layer → alexnet relu1-5 → unit-normalize → lin heads → spatial
    mean → sum, `lpips_loss.py` + lpips package) vs the JAX stack with the
    same weights via MEDIMG_LPIPS_NPZ (lpips state_dict npz schema)."""
    import torch
    import torch.nn as nn

    specs = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
             (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
    convs = []
    with torch.no_grad():
        for (ic, oc, k, s, p) in specs:
            c = nn.Conv2d(ic, oc, k, stride=s, padding=p)
            c.weight.copy_(torch.from_numpy(
                rng.normal(0, 0.05, c.weight.shape).astype(np.float32)))
            c.bias.copy_(torch.from_numpy(
                rng.normal(0, 0.05, c.bias.shape).astype(np.float32)))
            convs.append(c)
        lins = [torch.from_numpy(rng.uniform(0, 1, (1, oc, 1, 1)).astype(np.float32))
                for (_, oc, _, _, _) in specs]

    # npz in the lpips state_dict layout (slice s, local module index i)
    arrs = {}
    slice_local = [(1, 0), (2, 1), (3, 1), (4, 1), (5, 1)]
    for c, (s, i) in zip(convs, slice_local):
        arrs[f"net.slice{s}.{i}.weight"] = c.weight.detach().numpy()
        arrs[f"net.slice{s}.{i}.bias"] = c.bias.detach().numpy()
    for i, lw in enumerate(lins):
        arrs[f"lin{i}.model.1.weight"] = lw.numpy()
    npz = tmp_path / "lpips_alex.npz"
    np.savez(npz, **arrs)
    monkeypatch.setenv("MEDIMG_LPIPS_NPZ", str(npz))

    loss = make_lpips_loss()
    assert loss.pretrained

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def torch_feats(x):
        feats, h = [], (x - shift) / scale
        for j, c in enumerate(convs):
            if j in (1, 2):  # maxpool before conv2 and conv3
                h = torch.nn.functional.max_pool2d(h, 3, 2)
            h = torch.relu(c(h))
            feats.append(h)
        return feats

    def torch_lpips(x, y):
        fx, fy = torch_feats(x), torch_feats(y)
        total = 0.0
        for lw, a, b in zip(lins, fx, fy):
            a = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            b = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (a - b) ** 2
            total = total + (d * lw).sum(1, keepdim=True).mean()
        return float(total)

    x = rng.uniform(-1, 1, (2, 1, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch_lpips(torch.from_numpy(x).expand(2, 3, 64, 64),
                           torch.from_numpy(y).expand(2, 3, 64, 64))

    got = float(loss(jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(y.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-5)
