#!/usr/bin/env python
"""Measure the PyTorch reference's training-step throughput for the flagship
config (MNIST-U P8 attention+offsets, batch 100) and cache the result in
BASELINE_MEASURED.json. Runs the reference's own code from /root/reference
(eval_minibatch + Adam step) on whatever hardware torch has (CPU here).
"""

import importlib.util
import json
import os
import sys
import time
import types

import numpy as np

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(steps: int = 4):
    import torch
    sys.path.insert(0, REFERENCE)
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    import src.models as models
    spec = importlib.util.spec_from_file_location(
        "ref_train_mnist", os.path.join(REFERENCE, "train_mnist.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    image_dim, z_dim, R = 50, 2, 8
    gen = models.SpatialGenerator(z_dim, 512, num_layers=2,
                                  fourier_expansion=True, sigma=2.0 / 49)
    enc = models.InferenceNetwork_AttentionTranslation_AttentionRotation(
        image_dim, 1, z_dim, kernels_num=128, kernels_size=28, padding=8,
        groupconv=R, rot_refinement=True, theta_prior=np.pi,
        normal_prior_over_r=False)
    xg = np.linspace(-1, 1, image_dim)
    yg = np.linspace(1, -1, image_dim)
    x0, x1 = np.meshgrid(xg, yg)
    x_coord = torch.from_numpy(np.stack([x0.ravel(), x1.ravel()], 1)).float()
    y = torch.rand(100, 1, image_dim, image_dim)
    opt = torch.optim.Adam(list(gen.parameters()) + list(enc.parameters()),
                           lr=2e-4)
    times = []
    for i in range(steps):
        t0 = time.time()
        elbo, _, _ = ref.eval_minibatch(
            x_coord, y, gen, enc, "attention", "attention+offsets", 0,
            torch.device("cpu"), np.pi, R, image_dim)
        (-elbo).backward()
        opt.step()
        opt.zero_grad()
        times.append(time.time() - t0)
        print(f"# step {i}: {times[-1]:.2f}s", file=sys.stderr)
    dt = min(times)
    result = {
        "pytorch_reference_cpu_images_per_sec": round(100 / dt, 3),
        "step_seconds": round(dt, 3),
        "config": "MNIST-U P8 attention+offsets fourier, batch 100, "
                  "host CPU (torch has no accelerator here)",
        "protocol": "min over {} full train steps of the reference "
                    "eval_minibatch + Adam".format(steps),
    }
    with open(os.path.join(REPO, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
