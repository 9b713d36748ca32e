"""Multi-host wiring: jax.distributed initialization + global-array
helpers.

The reference has no distributed runtime (SURVEY.md §2); the TPU-native
scaling path is single-controller JAX over a multi-host mesh:

1. every process calls :func:`initialize_distributed` first (TPU pods
   autodetect coordinator/process ranks from the runtime; explicit
   ``LMT_COORDINATOR``/``LMT_NUM_PROCS``/``LMT_PROC_ID`` env vars cover
   GPU/CPU clusters and manual launches),
2. meshes are built over ``jax.devices()`` (the GLOBAL device list), so
   the shardings in `parallel.mesh` are process-count agnostic,
3. host-local numpy values become global sharded arrays via
   :func:`host_to_global` (each process materializes only its shard).

`tools/launch_multihost.py` is the corresponding launch entry point.
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed (idempotent). Returns True when running
    multi-process after the call.

    Resolution order: explicit args > ``LMT_COORDINATOR`` /
    ``LMT_NUM_PROCS`` / ``LMT_PROC_ID`` env vars > runtime autodetection
    (TPU pods / Slurm, via ``jax.distributed.initialize()`` with no
    args). Single-host runs (nothing configured, autodetection finds no
    cluster) are a silent no-op.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get("LMT_COORDINATOR")
    if num_processes is None and os.environ.get("LMT_NUM_PROCS"):
        num_processes = int(os.environ["LMT_NUM_PROCS"])
    if process_id is None and os.environ.get("LMT_PROC_ID"):
        process_id = int(os.environ["LMT_PROC_ID"])

    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif num_processes is not None or process_id is not None:
        raise ValueError(
            "LMT_NUM_PROCS/LMT_PROC_ID set without LMT_COORDINATOR"
        )
    else:
        # autodetect (TPU pod runtime / Slurm); on a plain single host the
        # runtime finds no coordinator and raises — single-host mode
        try:
            jax.distributed.initialize()
        except Exception:
            pass
    _INITIALIZED = True
    return jax.process_count() > 1


def host_to_global(value, sharding):
    """A global jax.Array with `sharding` from a host-replicated numpy /
    jax value (every process passes the SAME full value; each
    materializes only its addressable shards). Works single-process too.
    """
    import numpy as np

    value = np.asarray(value)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )
