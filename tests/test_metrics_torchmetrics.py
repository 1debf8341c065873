"""Pin ops/metrics.py to torchmetrics 0.6.2 semantics (VERDICT r2 weak #4).

torchmetrics itself is not installable in this zero-egress container, so the
pin has three layers, strongest available first:

1. If `MEDIMG_METRICS_GOLDEN_NPZ` points to an npz produced by
   `tools/generate_metric_goldens.py` on a machine WITH torchmetrics 0.6.2
   (same channel as the VGG weights plan), assert ours against the real
   library's outputs.
2. Always: a line-by-line torch transcription of torchmetrics 0.6.2's
   `_ssim_compute` / `_psnr_compute` / `MeanSquaredError` (sources cited
   below) executed in-env, compared with our JAX implementations on the
   same inputs.
3. Always: hardcoded golden values generated from (2) at authoring time —
   catches silent drift of EITHER side.

Transcription notes (torchmetrics v0.6.2):
  * SSIM (`torchmetrics/functional/ssim.py`): separable gaussian kernel
    from `torch.arange((1-k)/2, (1+k)/2)`; inputs reflect-padded by
    (k-1)//2, conv2d with NO conv padding, then the ssim map cropped by the
    same margin — which is exactly the set of fully-interior windows, i.e.
    our VALID-window conv on the unpadded input; `data_range=None` →
    max(preds.max-preds.min, target.max-target.min);
    reduction='elementwise_mean'.
  * PSNR (`torchmetrics/functional/psnr.py`): with `data_range=None` and
    `dim=None` the metric tracks min/max of TARGET only;
    psnr = (2·ln(range) − ln(mse)) · 10/ln(10).
  * MeanSquaredError: sum of squared error / n elements (the reference
    aliases this as "NMSE", `src/trainers/base.py:75`).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from medical_image_editing_tpu.ops.metrics import nmse, psnr, ssim  # noqa: E402


def _tm_gaussian_kernel(channel, kernel_size, sigma, dtype):
    def gauss(k, s):
        dist = torch.arange(start=(1 - k) / 2, end=(1 + k) / 2, step=1, dtype=dtype)
        g = torch.exp(-torch.pow(dist / s, 2) / 2)
        return (g / g.sum()).unsqueeze(dim=0)

    gx = gauss(kernel_size[0], sigma[0])
    gy = gauss(kernel_size[1], sigma[1])
    kernel = torch.matmul(gx.t(), gy)
    return kernel.expand(channel, 1, kernel_size[0], kernel_size[1])


def tm_ssim(preds, target, kernel_size=(11, 11), sigma=(1.5, 1.5),
            data_range=None, k1=0.01, k2=0.03):
    """Transcription of torchmetrics 0.6.2 `_ssim_compute` (see module doc)."""
    if data_range is None:
        data_range = max(preds.max() - preds.min(), target.max() - target.min())
    c1 = pow(k1 * data_range, 2)
    c2 = pow(k2 * data_range, 2)
    channel = preds.size(1)
    kernel = _tm_gaussian_kernel(channel, kernel_size, sigma, preds.dtype)
    pad_h = (kernel_size[0] - 1) // 2
    pad_w = (kernel_size[1] - 1) // 2
    preds_p = TF.pad(preds, (pad_w, pad_w, pad_h, pad_h), mode="reflect")
    target_p = TF.pad(target, (pad_w, pad_w, pad_h, pad_h), mode="reflect")
    input_list = torch.cat(
        (preds_p, target_p, preds_p * preds_p, target_p * target_p,
         preds_p * target_p))
    outputs = TF.conv2d(input_list, kernel, groups=channel)
    b = preds.size(0)
    ol = [outputs[x * b:(x + 1) * b] for x in range(5)]
    mu_pred_sq = ol[0].pow(2)
    mu_target_sq = ol[1].pow(2)
    mu_pred_target = ol[0] * ol[1]
    sigma_pred_sq = ol[2] - mu_pred_sq
    sigma_target_sq = ol[3] - mu_target_sq
    sigma_pred_target = ol[4] - mu_pred_target
    upper = 2 * sigma_pred_target + c2
    lower = sigma_pred_sq + sigma_target_sq + c2
    ssim_idx = ((2 * mu_pred_target + c1) * upper) / (
        (mu_pred_sq + mu_target_sq + c1) * lower)
    ssim_idx = ssim_idx[..., pad_h:-pad_h, pad_w:-pad_w]
    return ssim_idx.mean()


def tm_psnr(preds, target, base=10.0):
    """Transcription of torchmetrics 0.6.2 `_psnr_compute` with
    data_range=None, dim=None (target-only min/max)."""
    data_range = target.max() - target.min()
    sse = torch.sum((preds - target) ** 2)
    n = torch.tensor(target.numel(), dtype=preds.dtype)
    psnr_base_e = 2 * torch.log(data_range) - torch.log(sse / n)
    return psnr_base_e * (10 / torch.log(torch.tensor(base)))


def _fixed_inputs():
    """Deterministic structured inputs — smooth target + noisy pred, the
    regime the test-time metrics actually see."""
    rng = np.random.default_rng(12345)
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    base = np.stack([0.8 * np.sin(3 * yy + i) * np.cos(2 * xx - i)
                     for i in range(2)])[:, None]  # (2,1,32,32)
    noise = 0.1 * rng.standard_normal(base.shape)
    target = np.clip(base, -1, 1).astype(np.float32)
    pred = np.clip(base + noise, -1, 1).astype(np.float32)
    return pred, target


# Generated once from the transcription above on these fixed inputs (under
# the suite's 8-virtual-device CPU env). The tight pin is the same-process
# transcription test; this one is a drift tripwire, so its tolerance covers
# backend conv-reassociation noise (measured 0.4% on SSIM between XLA:CPU
# flag sets).
GOLDEN = {"nmse": 0.01021239, "psnr": 22.53984451, "ssim": 0.52039635}


def _ours(pred_nchw, target_nchw):
    p = jnp.asarray(pred_nchw.transpose(0, 2, 3, 1))
    t = jnp.asarray(target_nchw.transpose(0, 2, 3, 1))
    return {
        "nmse": float(nmse(p, t)),
        "psnr": float(psnr(p, t)),
        "ssim": float(ssim(p, t)),
    }


def test_metrics_match_torchmetrics_transcription():
    pred, target = _fixed_inputs()
    ours = _ours(pred, target)
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
    want = {
        "nmse": float(torch.mean((tp - tt) ** 2)),
        "psnr": float(tm_psnr(tp, tt)),
        "ssim": float(tm_ssim(tp, tt)),
    }
    for k in want:
        assert ours[k] == pytest.approx(want[k], rel=1e-5), (k, ours[k], want[k])


def test_metrics_match_vendored_goldens():
    pred, target = _fixed_inputs()
    ours = _ours(pred, target)
    for k, v in GOLDEN.items():
        assert ours[k] == pytest.approx(v, rel=1e-2), (k, ours[k], v)


def test_ssim_transcription_random_battery(rng):
    """Many shapes/ranges: our VALID-window SSIM == reflect-pad-then-crop."""
    for shape, scale in [((1, 1, 24, 24), 1.0), ((3, 1, 40, 28), 2.0),
                         ((2, 3, 32, 32), 255.0)]:
        t = (rng.uniform(0, 1, shape) * scale).astype(np.float32)
        p = np.clip(t + rng.normal(0, 0.05 * scale, shape), 0, scale).astype(
            np.float32)
        ours = float(ssim(jnp.asarray(p.transpose(0, 2, 3, 1)),
                          jnp.asarray(t.transpose(0, 2, 3, 1))))
        want = float(tm_ssim(torch.from_numpy(p), torch.from_numpy(t)))
        assert ours == pytest.approx(want, rel=1e-4), (shape, ours, want)
        wp = float(tm_psnr(torch.from_numpy(p), torch.from_numpy(t)))
        op = float(psnr(jnp.asarray(p.transpose(0, 2, 3, 1)),
                        jnp.asarray(t.transpose(0, 2, 3, 1))))
        assert op == pytest.approx(wp, rel=1e-5)


def test_metrics_match_real_torchmetrics_npz():
    """Layer 1: real-library goldens, when the artifact channel exists."""
    path = os.environ.get("MEDIMG_METRICS_GOLDEN_NPZ")
    if not path or not os.path.exists(path):
        pytest.skip("MEDIMG_METRICS_GOLDEN_NPZ not provided (zero-egress env)")
    data = np.load(path)
    ours = _ours(data["pred"], data["target"])
    for k in ("nmse", "psnr", "ssim"):
        assert ours[k] == pytest.approx(float(data[k]), rel=1e-4)
