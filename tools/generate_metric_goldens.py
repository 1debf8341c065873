"""Generate real-torchmetrics golden values for ops/metrics.py parity.

Run this on any machine WITH `torchmetrics==0.6.2` installed (the version the
reference pins — this zero-egress container cannot install it), then ship the
npz in via the same artifact channel as the VGG weights and set
`MEDIMG_METRICS_GOLDEN_NPZ=/path/to/metric_goldens.npz`;
tests/test_metrics_torchmetrics.py::test_metrics_match_real_torchmetrics_npz
then asserts our JAX metrics against the real library.

Usage: python tools/generate_metric_goldens.py [out.npz]
"""

import sys

import numpy as np


def fixed_inputs():
    # MUST stay identical to tests/test_metrics_torchmetrics.py::_fixed_inputs
    rng = np.random.default_rng(12345)
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    base = np.stack([0.8 * np.sin(3 * yy + i) * np.cos(2 * xx - i)
                     for i in range(2)])[:, None]
    noise = 0.1 * rng.standard_normal(base.shape)
    target = np.clip(base, -1, 1).astype(np.float32)
    pred = np.clip(base + noise, -1, 1).astype(np.float32)
    return pred, target


def main():
    import torch
    import torchmetrics

    assert torchmetrics.__version__.startswith("0.6"), (
        f"need torchmetrics 0.6.x (reference pin), got {torchmetrics.__version__}")

    pred, target = fixed_inputs()
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)

    m_nmse = torchmetrics.MeanSquaredError()
    m_ssim = torchmetrics.StructuralSimilarityIndexMeasure()
    m_psnr = torchmetrics.PeakSignalNoiseRatio()
    out = sys.argv[1] if len(sys.argv) > 1 else "metric_goldens.npz"
    np.savez(
        out,
        pred=pred,
        target=target,
        nmse=float(m_nmse(tp, tt)),
        ssim=float(m_ssim(tp, tt)),
        psnr=float(m_psnr(tp, tt)),
        torchmetrics_version=torchmetrics.__version__,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
