"""Measure the twin protocol's VQ-flip noise floor (round-5 evidence).

Question: how much does ONE twin run's held-out PSNR delta move under a
perturbation that is mathematically NOTHING — a pure float-summation
reorder of the identical two-pass InstanceNorm statistics (mean-of-means /
axis-by-axis instead of one fused (H,W) reduce)?

Measured answers (this tool, 2026-08-21, recorded in PERF.md):
  80 steps @48²  → PSNR delta 0.154 dB   (trajectory median 2e-6, max 1.7e-5)
  300 steps @64² → PSNR delta 0.306 dB   (trajectory median 2.4e-5)

Interpretation: the encoder's discrete VQ assignments sit near decision
boundaries at these operating points; ±1 ulp in a statistic flips ids,
trains a slightly different codebook, and moves a SINGLE held-out PSNR by
tenths of a dB even though the loss trajectories track to 1e-5. Any
single-run parity bound tighter than ~0.5 dB therefore rejects legitimate
implementations at coin-flip rates — which is why the ≤0.1 dB BASELINE
claim is measured by the seed-averaged protocol (tools/twin_seed_mean.py)
and the slow-tier test bounds single-run PSNR only at gross-divergence
level (tests/test_twin_training.py).

Run: python tools/twin_noise_floor.py [--steps 300]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from medical_image_editing_tpu.models import blocks as B

    def twopass_reordered(x, eps=1e-5):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(jnp.mean(xf, axis=1, keepdims=True), axis=2,
                        keepdims=True)
        d = xf - mean
        var = jnp.mean(jnp.mean(d * d, axis=1, keepdims=True), axis=2,
                       keepdims=True)
        return (d * jax.lax.rsqrt(var + eps)).astype(x.dtype)

    B._IN_IMPLS["twopass"] = twopass_reordered
    os.environ["MEDIMG_IN_IMPL"] = "twopass"

    from twin_training import run_twin

    res = run_twin(steps=args.steps, size=args.size, quiet=True)
    res.pop("curves", None)
    print(json.dumps({"perturbation": "pure summation reorder (mean-of-means)",
                      "traj": res["trajectory"],
                      "deltas": res["deltas"]}, indent=1))


if __name__ == "__main__":
    main()
