"""Multi-chip batch-parallel inference — the serving-side counterpart of the
data-parallel train step: params replicated (or fsdp-sharded), batch split over the
mesh, one jitted apply. Replaces nothing in the reference (it serves per-GPU) but is
the deployment path for the published fused models on a TPU pod slice.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from recnext_tpu.parallel.sharding import batch_sharding, make_mesh, replicated, state_sharding


def make_sharded_inference(
    model,
    variables: Any,
    mesh=None,
    *,
    fsdp_params: bool = False,
    apply_fn: Optional[Callable[[Any, jnp.ndarray], jnp.ndarray]] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns fn(images_nhwc) -> logits with the batch sharded across the mesh.

    The global batch must be divisible by the mesh size. With fsdp_params=True,
    parameters are ZeRO-sharded over the "fsdp" axis (XLA all-gathers on use) —
    useful when a large model must fit many small chips.

    `apply_fn(variables, x)` overrides the forward — e.g. the lane-packed
    executor for fused m/a-family serving (models/packed_infer.packed_apply;
    pick a packing group that divides the PER-CHIP batch so the pack stays
    shard-local)."""
    mesh = mesh or make_mesh()
    v_sh = state_sharding(variables, mesh) if fsdp_params else jax.tree.map(
        lambda _: replicated(mesh), variables)
    b_sh = batch_sharding(mesh)
    v = jax.device_put(variables, v_sh)
    if apply_fn is None:
        apply_fn = lambda vv, x: model.apply(vv, x, training=False)

    @jax.jit
    def fwd(x):
        return apply_fn(v, x)

    def infer(x):
        return fwd(jax.device_put(x, b_sh))

    return infer
