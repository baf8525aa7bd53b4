"""Test utilities: load the PyTorch reference as a golden oracle and copy
torch module weights into targetvae_tpu param pytrees.

The reference at /root/reference is used read-only, as test fixtures/golden
values — the framework itself never imports it.
"""

from __future__ import annotations

import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"


def import_reference_models():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.models as ref_models  # noqa
    return ref_models


def import_reference_module(name):
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib
    import types
    # torchvision is not installed here; the reference only uses it for MNIST
    # download inside main(), which the tests never call
    if "torchvision" not in sys.modules:
        stub = types.ModuleType("torchvision")
        stub.datasets = types.ModuleType("torchvision.datasets")
        sys.modules["torchvision"] = stub
    return importlib.import_module(name)


def _np(t):
    return t.detach().cpu().numpy()


def from_torch_linear(mod) -> dict:
    p = {"w": _np(mod.weight).T.copy()}
    if mod.bias is not None:
        p["b"] = _np(mod.bias).copy()
    return p


def from_torch_conv1x1(mod) -> dict:
    """Conv2d/Conv3d with 1x1(x1) kernels -> linear params over channels."""
    w = _np(mod.weight)
    w = w.reshape(w.shape[0], w.shape[1])  # (out, in)
    return {"w": w.T.copy(), "b": _np(mod.bias).copy()}


def from_torch_conv2d(mod) -> dict:
    return {"w": _np(mod.weight).copy(), "b": _np(mod.bias).copy()}


def from_torch_groupconv(mod) -> dict:
    return {"w": _np(mod.weight).copy(), "b": _np(mod.bias).copy()}


def generator_params_from_torch(gen) -> dict:
    """Map a reference SpatialGenerator to generator_init's param layout."""
    import torch.nn as nn
    p = {}
    if getattr(gen, "fourier_expansion", False):
        p["fourier"] = {
            "w": _np(gen.embed_latent.weight).T.copy(),
            "b": _np(gen.embed_latent.bias).copy(),
        }
    p["coord_linear"] = from_torch_linear(gen.coord_linear)
    if hasattr(gen, "latent_linear"):
        p["latent_linear"] = {"w": _np(gen.latent_linear.weight).T.copy()}
    hidden = []
    for layer in list(gen.layers)[:-1]:
        if isinstance(layer, nn.Linear):
            hidden.append(from_torch_linear(layer))
        elif hasattr(layer, "linear"):  # ResidLinear
            hidden.append(from_torch_linear(layer.linear))
    p["hidden"] = hidden
    p["out"] = from_torch_linear(list(gen.layers)[-1])
    return p


def encoder_params_from_torch(enc, mode: str) -> dict:
    import torch.nn as nn
    if mode == "A":
        layers = [from_torch_linear(m) for m in enc.layers
                  if isinstance(m, nn.Linear)]
        return {"layers": layers}
    p = {}
    if mode == "B":
        if enc.groupconv == 0:
            p["conv1"] = from_torch_conv2d(enc.conv1)
        else:
            p["conv1"] = from_torch_groupconv(enc.conv1)
            p["fc_r"] = from_torch_linear(enc.fc_r)
    else:
        p["conv1"] = from_torch_groupconv(enc.conv1)
    p["conv2"] = from_torch_conv1x1(enc.conv2)
    p["conv_a"] = from_torch_conv1x1(enc.conv_a)
    p["conv_r"] = from_torch_conv1x1(enc.conv_r)
    p["conv_z"] = from_torch_conv1x1(enc.conv_z)
    return p


def to_bhwc(y_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(y_nchw, (0, 2, 3, 1))
