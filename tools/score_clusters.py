#!/usr/bin/env python
"""Hungarian-score saved cluster assignments against an external label file.

The galaxy pipeline has no ground-truth labels in the reference contract
(clustering_galaxy.py colors its z-scatter by cluster id only), so
cli/clustering_galaxy.py persists `cluster_assignments.npy`; this scores
that artifact against any label array (e.g. the synthetic generator's
galaxy_labels_{train,test}.npy) for QUALITY.md.

Usage:
  python tools/score_clusters.py RUN_DIR/cluster_assignments.npy \
      labels_train.npy [labels_test.npy ...]
Labels are concatenated in the order given (must match the image order the
clustering CLI used: train then test).
"""

from __future__ import annotations

import sys

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from targetvae_tpu.cli.clustering_common import cluster_acc  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    pred = np.load(argv[0])
    labels = np.concatenate([np.load(p) for p in argv[1:]])
    if len(pred) != len(labels):
        print(f"length mismatch: {len(pred)} assignments vs {len(labels)} "
              f"labels", file=sys.stderr)
        return 2
    _, acc = cluster_acc(labels, pred)
    print(f"clustering accuracy (Hungarian, {int(labels.max()) + 1} classes): "
          f"{acc:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
