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
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns fn(images_nhwc) -> logits with the batch sharded across the mesh.

    The global batch must be divisible by the mesh size. With fsdp_params=True,
    parameters are ZeRO-sharded over the "fsdp" axis (XLA all-gathers on use) —
    useful when a large model must fit many small chips."""
    mesh = mesh or make_mesh()
    v_sh = state_sharding(variables, mesh) if fsdp_params else jax.tree.map(
        lambda _: replicated(mesh), variables)
    b_sh = batch_sharding(mesh)
    v = jax.device_put(variables, v_sh)

    @jax.jit
    def fwd(x):
        return model.apply(v, x, training=False)

    def infer(x):
        return fwd(jax.device_put(x, b_sh))

    return infer
