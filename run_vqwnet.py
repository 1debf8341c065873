#!/usr/bin/env python
"""CLI surface parity: `python run_vqwnet.py -c config.json [-m train|test] [-w] [-v]`
(reference: src/run_vqwnet.py). Delegates to medical_image_editing_tpu.cli."""
from medical_image_editing_tpu.cli.run_vqwnet import main

if __name__ == "__main__":
    raise SystemExit(main())
