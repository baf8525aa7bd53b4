#!/usr/bin/env python
"""CLI shim: see targetvae_tpu/cli/train_particles.py (mirrors the reference train_particles.py flags)."""
from targetvae_tpu.cli.train_particles import main

if __name__ == "__main__":
    main()
