#!/usr/bin/env python
"""CLI shim: see targetvae_tpu/cli/clustering_dsprites.py (mirrors the reference clustering_dsprites.py flags)."""
from targetvae_tpu.cli.clustering_dsprites import main

if __name__ == "__main__":
    main()
