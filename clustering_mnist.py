#!/usr/bin/env python
"""CLI shim: see targetvae_tpu/cli/clustering_mnist.py (mirrors the reference clustering_mnist.py flags)."""
from targetvae_tpu.cli.clustering_mnist import main

if __name__ == "__main__":
    main()
