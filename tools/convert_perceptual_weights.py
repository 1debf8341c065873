"""Offline converter: torchvision VGG19 / lpips(alex) weights → the npz
files consumed by `medical_image_editing_tpu.ops.perceptual`.

Run this ONCE on any machine with internet access (it needs `torchvision`
and/or `lpips`, which download their pretrained checkpoints on first use),
then ship the npz files to the training host and point the framework at
them:

    python tools/convert_perceptual_weights.py --vgg19 vgg19.npz --lpips lpips_alex.npz

    export MEDIMG_VGG19_NPZ=/path/to/vgg19.npz     # VGGLoss parity
    export MEDIMG_LPIPS_NPZ=/path/to/lpips_alex.npz  # LPIPSLoss parity

Reference spec: `src/functions/perceptual_loss.py:21-24` (torchvision VGG19
ImageNet features) and `src/functions/lpips_loss.py:8` (lpips.LPIPS
net='alex'). The consuming-side schema and parity tests live in
`ops/perceptual.py` and `tests/test_perceptual_parity.py` — the npz written
here is exactly what those tests construct synthetically, so a converted
file is covered by the same transplant-parity guarantees.

This environment has zero egress and neither package installed, so the
script is a documented escape hatch, not part of the test surface; without
the npz files the framework falls back to seeded random features and says
so loudly at train time (`perceptual_fallback` metric).
"""

import argparse
import sys

import numpy as np


def convert_vgg19(out_path: str) -> None:
    import torchvision

    try:  # modern torchvision
        weights = torchvision.models.VGG19_Weights.IMAGENET1K_V1
        model = torchvision.models.vgg19(weights=weights)
    except AttributeError:  # <0.13 fallback
        model = torchvision.models.vgg19(pretrained=True)
    state = model.features.state_dict()
    np.savez(out_path, **{k: v.numpy() for k, v in state.items()})
    print(f"wrote {out_path}: {len(state)} arrays "
          f"(keys features.{{i}}.weight/bias, OIHW)")


def convert_lpips_alex(out_path: str) -> None:
    import lpips

    model = lpips.LPIPS(net="alex")
    state = model.state_dict()
    np.savez(out_path, **{k: v.numpy() for k, v in state.items()})
    print(f"wrote {out_path}: {len(state)} arrays "
          f"(keys net.slice{{s}}.{{i}}.weight/bias + lin{{i}}.model.1.weight)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--vgg19", metavar="OUT_NPZ", help="write VGG19 features npz")
    p.add_argument("--lpips", metavar="OUT_NPZ", help="write LPIPS(alex) npz")
    args = p.parse_args(argv)
    if not args.vgg19 and not args.lpips:
        p.error("nothing to do: pass --vgg19 and/or --lpips")
    if args.vgg19:
        convert_vgg19(args.vgg19)
    if args.lpips:
        convert_lpips_alex(args.lpips)


if __name__ == "__main__":
    sys.exit(main())
