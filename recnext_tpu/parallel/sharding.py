"""Device mesh + sharding rules — the TPU-native replacement for the reference's
DDP/NCCL layer (SURVEY.md §2.6: utils.py:202-224, main.py:310-313).

Design: a 2-D ("data", "fsdp") mesh.
* batch is sharded over "data" — gradient psum falls out of jit (DDP all-reduce).
* parameters / optimizer state / EMA are optionally sharded over "fsdp" on their
  largest divisible axis (ZeRO-style), with XLA inserting all-gathers on use.
* BatchNorm batch statistics are computed on the *global* batch under jit, so
  cross-replica SyncBN (reference detection/recnext.py:210, moganet_train.py:698-701)
  falls out for free — no explicit collective code anywhere.

Multi-host: `jax.distributed.initialize()` replaces the reference's torchrun/SLURM
rank discovery; `jax.process_index() == 0` replaces utils.is_main_process.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str = "", num_processes: int = 0,
                     process_id: int = -1) -> bool:
    """Multi-host bring-up: jax.distributed.initialize — the TPU-native replacement
    for the reference's torchrun/SLURM rank discovery + dist.init_process_group
    (utils.py:202-224). Must run before the first JAX backend use in the process.

    Explicit args take precedence; otherwise standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — also what
    jax.distributed.initialize() itself auto-detects on Cloud TPU/SLURM). Returns
    True if a multi-process runtime was initialized.
    """
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS", "")
    if num_processes <= 0:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id < 0:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "-1") or -1)
    if not coordinator or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def put_batch(batch: Any, sharding: NamedSharding) -> Any:
    """Place a host batch onto the mesh. Single-process: plain device_put. Multi-
    process: each process holds only its LOCAL shard (loader already strided by
    process_index), assembled into one global jax.Array with
    jax.make_array_from_process_local_data — the multi-host counterpart of the
    reference's per-rank DataLoader + DDP implicit global batch."""
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch)


def make_mesh(
    n_devices: Optional[int] = None,
    fsdp: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """("data", "fsdp") mesh over the first n_devices. fsdp=1 -> pure data parallel."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"device(s) are visible ({[str(d) for d in devs]}); to simulate, "
                "set JAX_PLATFORMS=cpu "
                "XLA_FLAGS=--xla_force_host_platform_device_count=<n> before jax "
                "initializes"
            )
        devs = devs[:n_devices]
    n = len(devs)
    if n % fsdp != 0:
        raise ValueError(f"{n} devices not divisible by fsdp={fsdp}")
    arr = np.asarray(devs).reshape(n // fsdp, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over data; under fsdp>1 also over fsdp so the
    global batch splits across every chip."""
    if mesh.shape["fsdp"] > 1:
        return NamedSharding(mesh, P(("data", "fsdp")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape, fsdp_size: int, min_size: int) -> P:
    if fsdp_size <= 1 or not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: shape[i], reverse=True)
    for i in order:
        if shape[i] % fsdp_size == 0 and shape[i] >= min_size:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def state_sharding(tree: Any, mesh: Mesh, *, min_size: int = 256) -> Any:
    """Sharding pytree for params/opt-state/EMA: each leaf sharded over "fsdp" on its
    largest divisible axis (>= min_size elements along it), else replicated."""
    fsdp_size = mesh.shape["fsdp"]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, _fsdp_spec(shape, fsdp_size, min_size))

    return jax.tree.map(rule, tree)
