#!/usr/bin/env python
"""CLI surface parity: `python run_recon.py` file-watching edit server
(reference: src/run_recon.py). Delegates to medical_image_editing_tpu.cli."""
from medical_image_editing_tpu.cli.run_recon import main

if __name__ == "__main__":
    raise SystemExit(main())
