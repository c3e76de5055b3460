"""Multi-host bootstrap test: 2 processes x 4 CPU devices == 1 process x 8.

Verifies the jax.distributed bootstrap (parallel/bootstrap.py), the
multi-process global-batch placement (parallel/mesh.py _put_global), and
that the data-parallel training step produces identical parameters under
both launch shapes — the invariant the reference gets from DDP
(ref: train_net.py:93-98, trainer.py:14-18).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_worker(out, n_procs, n_local_dev, timeout=600):
    base_env = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "NB_COORDINATOR",
                             "NB_NUM_PROCESSES", "NB_PROCESS_ID")}
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_dev}")
    base_env["PYTHONPATH"] = REPO

    if n_procs == 1:
        procs_env = [dict(base_env)]
    else:
        coord = f"localhost:{_free_port()}"
        procs_env = []
        for pid in range(n_procs):
            env = dict(base_env)
            env.update(NB_COORDINATOR=coord,
                       NB_NUM_PROCESSES=str(n_procs),
                       NB_PROCESS_ID=str(pid))
            procs_env.append(env)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for env in procs_env
    ]
    outputs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text[-3000:]}"
    return outputs


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    single = str(tmp_path / "single.npz")
    multi = str(tmp_path / "multi.npz")

    _run_worker(single, n_procs=1, n_local_dev=8)
    _run_worker(multi, n_procs=2, n_local_dev=4)

    a = np.load(single)
    b = np.load(multi)
    assert a["n_steps"] == b["n_steps"]  # aligned host step counts
    keys = sorted(k for k in a.files if k.startswith("p"))
    assert keys == sorted(k for k in b.files if k.startswith("p"))
    # What "matches" can mean here, and why. Both launch shapes are
    # bitwise-DETERMINISTIC run-to-run (verified by running each twice),
    # but the cross-process grad all-reduce sums in a different order than
    # the single-process XLA collective, so gradients differ by f32
    # rounding (~1e-7 relative). Adam turns a rounding-level sign flip of
    # a near-zero gradient coordinate into a full ±lr step on that
    # coordinate — its update is scale-invariant (m/sqrt(v)) — so a
    # handful of dead-gradient params can drift by up to
    # 2 * n_steps * lr while the two runs remain numerically equivalent
    # (the reference's DDP vs single-GPU runs diverge identically).
    # Principled bound: almost all elements tight, none beyond the
    # worst-case Adam drift, and the LOSS trajectories track closely.
    n_steps = int(a["n_steps"])
    lr = 5e-4  # must match mp_worker's optimizer
    worst_adam_drift = 2.0 * n_steps * lr
    n_loose = n_total = 0
    for k in keys:
        diff = np.abs(a[k] - b[k])
        tol = 1e-4 + 1e-4 * np.abs(b[k])
        n_loose += int(np.sum(diff > tol))
        n_total += diff.size
        assert diff.max() <= worst_adam_drift, (
            f"param leaf {k}: max divergence {diff.max():.2e} exceeds the "
            f"worst-case Adam drift bound {worst_adam_drift:.2e}")
    # sign flips land wherever gradients are near zero, so the quantile is
    # over the whole param vector, not per leaf
    assert n_loose <= 1e-3 * n_total, (
        f"{n_loose}/{n_total} elements beyond rtol/atol=1e-4 "
        f"(expected <=0.1% reduce-order sign flips)")
    np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-4,
                               err_msg="loss trajectories diverged")
