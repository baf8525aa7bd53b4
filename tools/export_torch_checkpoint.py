#!/usr/bin/env python
"""Export a targetvae_tpu run to reference-loadable pickled .sav modules.

Usage:
  python tools/export_torch_checkpoint.py RUN_DIR            # both roles
  python tools/export_torch_checkpoint.py RUN/inference.sav  # encoder only

Writes inference_torch.sav / generator_torch.sav next to the inputs (or to
--out-dir). The files torch.load in the reference environment and run with
the reference's own forward code — see utils/torch_export.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("target", help="run dir or checkpoint path")
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args(argv)

    from targetvae_tpu.utils.torch_export import export_checkpoint

    for path in export_checkpoint(args.target, args.out_dir):
        print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
