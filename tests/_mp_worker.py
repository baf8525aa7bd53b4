"""Worker for the two-process jax.distributed smoke test (test_distributed.py).

Each process: 4 virtual CPU devices -> 8-device global ('data','model') mesh
across 2 processes; HostDataPipeline(multihost=True) assembles global DP
batches from process-local rows; one jitted train step runs with
compiler-inserted cross-process gradient psums over the DCN analog (gloo).

Usage: python tests/_mp_worker.py <coordinator_port> <process_id>
"""

import os
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np

    from targetvae_tpu.data.pipeline import HostDataPipeline
    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.parallel.distributed import global_mesh, initialize
    from targetvae_tpu.parallel.mesh import batch_sharding
    from targetvae_tpu.parallel.pjit import shard_state
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.utils.config import (EncoderConfig, GeneratorConfig,
                                            LikelihoodConfig, ModelConfig,
                                            TrainConfig)

    initialize(coordinator_address=f"localhost:{port}", num_processes=2,
               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    mesh = global_mesh()                       # data=8 across both processes

    # deterministic dataset, identical on both hosts (as a shared filesystem
    # would provide); each host gathers only its own rows. 40 rows at batch
    # 16 leaves a ragged 8-row tail: multihost streaming must zero-weight
    # pad it (NOT drop it — reference drop_last=False) with an even row
    # split across the two processes
    rng = np.random.RandomState(0)
    images = rng.rand(40, 12, 12, 1).astype(np.float32)
    pipe = HostDataPipeline(images, batch_size=16, seed=0,
                            sharding=batch_sharding(mesh), multihost=True)

    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32, num_layers=1,
                        fourier_expansion=False),
        EncoderConfig(image_dim=12, z_dim=2, kernels_num=8, kernels_size=7,
                      padding=3, groupconv=4),
        LikelihoodConfig()))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, dp=8))
    trainer.attach_mesh(mesh)
    state = shard_state(mesh, trainer.init_state(0))

    import jax.numpy as jnp  # noqa: F401

    step = jax.jit(trainer._step_impl)
    n_steps = 0
    n_reals = []
    for y, _, w, n_real in pipe.epoch(0):
        assert int(y.shape[0]) == 16        # fixed global batch, tail padded
        # every process holds exactly its addressable half of the weights
        w_local = np.concatenate(
            [np.asarray(s.data).ravel() for s in w.addressable_shards])
        assert w_local.shape == (8,), w_local.shape
        if n_real == 8:                     # the padded tail batch
            # global w = [1/8 x 8, 0 x 8]; this process owns a contiguous
            # half of it (rows 0-7 or 8-15)
            assert (np.allclose(w_local, 1.0 / 8)
                    or np.allclose(w_local, 0.0)
                    or (np.allclose(w_local[:4], 1.0 / 8)
                        and np.allclose(w_local[4:], 0.0))), w_local
        n_reals.append(n_real)
        state, metrics = step(state, y, None, w)
        n_steps += 1
    metrics = jax.device_get(metrics)
    assert n_steps == 3, n_steps                   # 40 rows / batch 16
    assert n_reals == [16, 16, 8], n_reals         # tail processed, not dropped
    assert np.all(np.isfinite(metrics)), metrics
    assert int(jax.device_get(state.step)) == 3

    print(f"MP_OK pid={pid} steps={n_steps} elbo={float(metrics[0]):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
