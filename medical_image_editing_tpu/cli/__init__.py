"""CLI entry points mirroring the reference surface:
`run_vqwnet.py -c config.json [-m train|test] [-w] [-v]` and `run_recon.py`."""
