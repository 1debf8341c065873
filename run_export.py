#!/usr/bin/env python
"""AOT-export the serving edit path as a portable StableHLO artifact.
Beyond-reference serving capability; see medical_image_editing_tpu/cli/export_model.py."""
from medical_image_editing_tpu.cli.export_model import main

if __name__ == "__main__":
    raise SystemExit(main())
