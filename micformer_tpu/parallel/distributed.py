"""Multi-host initialization — the torch.distributed/NCCL slot (SURVEY §5).

The reference's DDP path calls dist.init_process_group('nccl', 'env://')
per rank (nnUNetTrainerV2_DDP.py:67). The JAX equivalent is a single
jax.distributed.initialize() per host process; after it, jax.devices() spans
the full pod and every Mesh/NamedSharding in this framework works unchanged —
collectives ride ICI within a slice and DCN across slices based on the mesh's
device order (make_mesh keeps jax.devices() order, which JAX arranges
ICI-contiguous).
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Idempotent multi-host init; no-op on single-host (the common case here).

    Env fallbacks mirror the torch 'env://' convention:
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID (or the JAX-standard
    auto-detection on TPU pods, where no arguments are needed).
    """
    # NB: must not touch jax.process_count()/jax.devices() here — any backend
    # query initializes XLA, after which jax.distributed.initialize refuses
    # to run ("must be called before any JAX calls").
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()  # TPU-pod auto-detection
        except Exception:
            pass  # single host — nothing to do
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None else int(os.environ.get("PROCESS_ID", "0")),
    )
