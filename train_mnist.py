#!/usr/bin/env python
"""CLI shim: see targetvae_tpu/cli/train_mnist.py (mirrors the reference train_mnist.py flags)."""
from targetvae_tpu.cli.train_mnist import main

if __name__ == "__main__":
    main()
