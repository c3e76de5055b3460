"""Multi-host process-group bootstrap.

TPU-native replacement for the reference's NCCL env:// init at entry
(ref: train_net.py:93-98: torch.distributed.init_process_group("nccl")
driven by RANK/WORLD_SIZE env vars). Here the JAX distributed runtime is
initialized once per host process before any device is touched; after
that, every host sees the global device set and jitted computations run
SPMD over the full mesh.

Launch modes:
  * TPU pods / GKE: the runtime discovers the cluster itself —
    ``jax.distributed.initialize()`` with no arguments.
  * Explicit (CI, CPU emulation, bare-metal): set
    ``NB_COORDINATOR=host:port  NB_NUM_PROCESSES=N  NB_PROCESS_ID=i``.

Data model under multi-host (parallel/mesh.py): every host loads the SAME
global batch deterministically (epoch-seeded) and materializes only its
addressable ray shards; grads/params are replicated so per-host outputs
stay bitwise aligned (tests/test_multiprocess.py asserts this).
"""
from __future__ import annotations

import os

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed if launched multi-process.

    Returns True when running as part of a multi-process group. Must be
    called before the first jax device query (train_net.py does). Safe to
    call twice and in single-process runs (no-op).
    """
    global _initialized
    if _initialized:
        return True

    coord = os.environ.get("NB_COORDINATOR")
    auto = os.environ.get("NB_DIST_AUTO", "") in ("1", "true")
    if coord is None and not auto:
        return False

    import jax

    if coord is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["NB_NUM_PROCESSES"]),
            process_id=int(os.environ["NB_PROCESS_ID"]),
        )
    else:  # pod auto-detection
        jax.distributed.initialize()
    _initialized = True
    return True
