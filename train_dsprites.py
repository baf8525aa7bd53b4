#!/usr/bin/env python
"""CLI shim: see targetvae_tpu/cli/train_dsprites.py (mirrors the reference train_dsprites.py flags)."""
from targetvae_tpu.cli.train_dsprites import main

if __name__ == "__main__":
    main()
