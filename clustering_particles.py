#!/usr/bin/env python
"""CLI shim: see targetvae_tpu/cli/clustering_particles.py (mirrors the reference clustering_particles.py flags)."""
from targetvae_tpu.cli.clustering_particles import main

if __name__ == "__main__":
    main()
