"""Cluster Galaxy Zoo latents (reference clustering_galaxy.py; it has no
usable label path — its y_labels at :272 is undefined — so figures are colored
by cluster assignment, as intended by its z-scatter plot)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from .common import select_device
from .clustering_common import (embed_dataset, load_encoder, run_clustering,
                                save_tsne, write_results)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "Clustering the latent representations of galaxy-zoo")
    parser.add_argument("--train-path",
                        default="data/galaxy_zoo/galaxy_zoo_train.npy")
    parser.add_argument("--test-path",
                        default="data/galaxy_zoo/galaxy_zoo_test.npy")
    parser.add_argument("-z", "--z-dim", type=int, default=2)
    parser.add_argument("--path-to-encoder",
                        help="path to the saved encoder model")
    parser.add_argument("--t-inf", default="attention",
                        choices=["unimodal", "attention"])
    parser.add_argument("--r-inf", default="attention+offsets",
                        choices=["unimodal", "attention", "attention+offsets"])
    parser.add_argument("--clustering", default="agglomerative",
                        choices=["agglomerative", "k-means"])
    parser.add_argument("--n-clusters", default=10, type=int)
    parser.add_argument("--in-channels", type=int, default=3)
    parser.add_argument("--activation", choices=["tanh", "leakyrelu"],
                        default="leakyrelu")
    parser.add_argument("--minibatch-size", type=int, default=100)
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="embedding compute dtype: bfloat16 engages the "
                             "fused TPU serving tier (3.3x f32 throughput "
                             "at the EMPIAR shape); float32 bit-matches the "
                             "reference protocol")
    parser.add_argument("-d", "--device", type=int, default=0)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    select_device(args.device)

    images = np.concatenate([np.load(args.train_path),
                             np.load(args.test_path)]).astype(np.float32) / 255.0
    if images.ndim == 3:
        images = images[..., None]

    model, params = load_encoder(args.path_to_encoder)
    path_prefix = os.path.dirname(os.path.abspath(args.path_to_encoder))

    z_values, _, _ = embed_dataset(model, params, images, args.minibatch_size,
                                   args.compute_dtype)
    cluster = run_clustering(z_values, args.clustering, args.n_clusters)

    # galaxy zoo ships no labels (the reference colors its z-scatter by
    # cluster id only, clustering_galaxy.py:303-310); persist the
    # assignments + embeddings so external label sets can score them, the
    # same artifact clustering_particles.py writes
    np.save(os.path.join(path_prefix, "cluster_assignments.npy"), cluster)
    np.save(os.path.join(path_prefix, "z_values.npy"), z_values)

    save_tsne(os.path.join(path_prefix, "tsne.jpg"), z_values, cluster)

    if args.z_dim == 2 and z_values.shape[1] >= 2:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib import colors
        plt.figure(figsize=(10, 10))
        cmap = plt.cm.rainbow
        norm = colors.BoundaryNorm(np.arange(0, 11, 1), cmap.N)
        plt.scatter(z_values[:, 0], z_values[:, 1], c=cluster, cmap=cmap,
                    norm=norm, s=0.1)
        plt.savefig(os.path.join(path_prefix, "z_vals.jpg"))
        plt.close()

    write_results(os.path.join(path_prefix, "results.txt"),
                  args.path_to_encoder)
    print("# done", file=sys.stderr)


if __name__ == "__main__":
    main()
