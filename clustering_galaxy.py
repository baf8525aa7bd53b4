#!/usr/bin/env python
"""CLI shim: see targetvae_tpu/cli/clustering_galaxy.py (mirrors the reference clustering_galaxy.py flags)."""
from targetvae_tpu.cli.clustering_galaxy import main

if __name__ == "__main__":
    main()
