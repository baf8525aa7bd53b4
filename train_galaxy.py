#!/usr/bin/env python
"""CLI shim: see targetvae_tpu/cli/train_galaxy.py (mirrors the reference train_galaxy.py flags)."""
from targetvae_tpu.cli.train_galaxy import main

if __name__ == "__main__":
    main()
