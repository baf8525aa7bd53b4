"""Two-process jax.distributed smoke test (DCN analog on CPU).

Exercises parallel/distributed.initialize + global_mesh and the
HostDataPipeline(multihost=True) row-ownership path end-to-end for one DP
epoch, with real cross-process collectives (gloo). No hardware needed: two
subprocesses x 4 virtual CPU devices = one 8-device global mesh.
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_dp_epoch():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(port), str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=_REPO)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MP_OK pid={pid} steps=3" in out, out[-3000:]
    # both processes computed the same replicated metrics
    elbo0 = [ln for ln in outs[0].splitlines() if "MP_OK" in ln][0].split("=")[-1]
    elbo1 = [ln for ln in outs[1].splitlines() if "MP_OK" in ln][0].split("=")[-1]
    assert elbo0 == elbo1, (elbo0, elbo1)
