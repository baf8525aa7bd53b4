"""Shared clustering/evaluation pipeline.

Replicates the reference clustering scripts' flow (clustering_mnist.py:218-416):
batched latent extraction (argmax posterior cell, no sampling), KMeans or
Ward-agglomerative clustering, Hungarian-matching accuracy, circular/Pearson
pose correlations, t-SNE + confusion-matrix figures, results.txt — with the
reference's undefined-variable bugs fixed (clustering_dsprites.py:332,
clustering_galaxy.py:272, clustering_particles.py:37).
"""

from __future__ import annotations

import sys
from typing import Optional, Tuple

import numpy as np

from ..models import TargetVAE
from ..train.checkpoint import load_checkpoint


def load_encoder(path_to_encoder: str) -> Tuple[TargetVAE, dict]:
    """Load an inference.sav checkpoint -> (model, params).

    Accepts both this framework's msgpack checkpoints and the reference's
    pickled-torch-module .sav files (utils/torch_import.py), so models
    trained with the PyTorch reference cluster here unchanged."""
    from ..utils.torch_import import is_torch_checkpoint, model_from_savs

    if is_torch_checkpoint(path_to_encoder):
        print(f"# {path_to_encoder}: reference torch checkpoint, importing",
              file=sys.stderr)
        cfg, params = model_from_savs(path_to_encoder)
        return TargetVAE(cfg), params
    params, cfg, _ = load_checkpoint(path_to_encoder)
    return TargetVAE(cfg), params


def embed_dataset(model: TargetVAE, params: dict, images: np.ndarray,
                  minibatch_size: int = 100, compute_dtype=None,
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (z_values (N, 2*zd), rot_pred (N, 1), tr_pred (N, 2)).

    compute_dtype: None (f32, bit-matches the reference protocol) or
    'bfloat16' — the serving tier, 3.3x the f32 throughput at the EMPIAR
    shape on a v5e (tools/bench_embed.py: 2791 vs 845 img/s); exposed on the
    clustering CLIs as --compute-dtype."""
    import jax
    import jax.numpy as jnp

    if compute_dtype in ("bfloat16", jnp.bfloat16):
        compute_dtype = jnp.bfloat16
    elif compute_dtype in (None, "float32"):
        compute_dtype = None
    else:
        raise ValueError(f"unsupported compute_dtype {compute_dtype!r}")
    embed = jax.jit(lambda p, y: model.embed(p, y,
                                             compute_dtype=compute_dtype))
    zs, rots, trs = [], [], []
    n = len(images)
    b = minibatch_size
    for i in range(0, n - n % b, b):
        out = embed(params, jnp.asarray(images[i:i + b]))
        zs.append(np.asarray(out["z_content"]))
        rots.append(np.asarray(out["theta_mu"]))
        trs.append(np.asarray(out["dx"]))
    if n % b:
        out = embed(params, jnp.asarray(images[n - n % b:]))
        zs.append(np.asarray(out["z_content"]))
        rots.append(np.asarray(out["theta_mu"]))
        trs.append(np.asarray(out["dx"]))
    return np.concatenate(zs), np.concatenate(rots), np.concatenate(trs)


def cluster_acc(y_true: np.ndarray, y_pred: np.ndarray):
    """Hungarian-matching clustering accuracy (clustering_mnist.py:170-190)."""
    from scipy.optimize import linear_sum_assignment
    y_true = y_true.astype(np.int64)
    y_pred = y_pred.astype(np.int64)
    D = int(max(y_pred.max(), y_true.max())) + 1
    w = np.zeros((D, D), dtype=np.int64)
    np.add.at(w, (y_true, y_pred), 1)
    mapping = linear_sum_assignment(w.max() - w)
    total = w[mapping[0], mapping[1]].sum()
    return mapping, total / y_pred.shape[0]


def circular_corrcoef(a: np.ndarray, b: np.ndarray) -> float:
    """Fisher-Lee circular correlation (astropy.stats.circcorrcoef formula;
    astropy is not a dependency here)."""
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    abar = np.arctan2(np.sin(a).sum(), np.cos(a).sum())
    bbar = np.arctan2(np.sin(b).sum(), np.cos(b).sum())
    sa = np.sin(a - abar)
    sb = np.sin(b - bbar)
    return float((sa * sb).sum() / np.sqrt((sa ** 2).sum() * (sb ** 2).sum()))


def measure_correlations(path_to_transformations: str, r_pred: np.ndarray,
                         t_pred: np.ndarray):
    """Circular corr for rotation + Pearson for x/y translation
    (clustering_mnist.py:194-213)."""
    t = np.load(path_to_transformations)
    rot_val = t[:, 0].reshape(-1, 1)
    t_val = t[:, 1:3]
    r_corr = circular_corrcoef(rot_val, np.asarray(r_pred))
    x_corr = np.corrcoef(t_val[:, 0], np.asarray(t_pred)[:, 0])[0][1]
    y_corr = np.corrcoef(t_val[:, 1], np.asarray(t_pred)[:, 1])[0][1]
    return r_corr, [x_corr, y_corr]


def run_clustering(z_values: np.ndarray, method: str, n_clusters: int
                   ) -> np.ndarray:
    from sklearn.cluster import AgglomerativeClustering, KMeans
    if method == "agglomerative":
        ac = AgglomerativeClustering(n_clusters=n_clusters, linkage="ward",
                                     compute_full_tree=True)
        return ac.fit_predict(z_values)
    km = KMeans(n_clusters=n_clusters, n_init=100).fit(z_values)
    return km.predict(z_values)


def save_tsne(path: str, z_values: np.ndarray,
              labels: Optional[np.ndarray] = None) -> None:
    print("# saving tsne figure ... ", file=sys.stderr)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import colors
    from sklearn.manifold import TSNE

    tsne = TSNE(2, learning_rate=200.0, init="random").fit_transform(z_values)
    plt.figure(figsize=(10, 10))
    if labels is not None:
        cmap = plt.cm.rainbow
        norm = colors.BoundaryNorm(np.arange(0, 11, 1), cmap.N)
        plt.scatter(tsne[:, 0], tsne[:, 1], c=labels, cmap=cmap, norm=norm, s=2)
        plt.colorbar()
    else:
        plt.scatter(tsne[:, 0], tsne[:, 1], s=2)
    plt.savefig(path)
    plt.close()


def save_confusion_matrix(path: str, labels: np.ndarray, cluster: np.ndarray,
                          mapping) -> None:
    print("# saving confusion matrix ... ", file=sys.stderr)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import confusion_matrix

    plt.figure(figsize=(10, 10))
    cm = confusion_matrix(labels, cluster)
    try:
        import seaborn as sns
        sns.set()
        ax = sns.heatmap(cm[:, np.array(mapping[1])], annot=True, fmt="d",
                         cmap="Blues", xticklabels=np.arange(cm.shape[1]))
        ax.set(xlabel="clusters", ylabel="true_labels")
    except ImportError:  # pragma: no cover
        plt.imshow(cm[:, np.array(mapping[1])], cmap="Blues")
        plt.xlabel("clusters")
        plt.ylabel("true_labels")
    plt.savefig(path)
    plt.close()


def write_results(path: str, encoder_path: str, acc=None, rot_corr=None,
                  tr_corr=None) -> None:
    with open(path, "w") as f:
        f.write(f"using the encoder model from {encoder_path}\n\n")
        if acc is not None:
            f.write(f"The accuracy for clustering is {acc} \n")
        if rot_corr is not None:
            f.write(f"The circular correlation for the rotation is "
                    f"{rot_corr}\n")
        if tr_corr is not None:
            f.write(f"The Pearson correlation for the x and y values in the "
                    f"translation is {tr_corr}\n")
