"""End-to-end user journey, runnable offline on CPU or TPU:

create a model -> run it -> extract the feature pyramid -> BN-fuse -> verify fused
parity -> publish the fused artifact -> reload and serve it -> export StableHLO.

  JAX_PLATFORMS=cpu python examples/quickstart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.utils.platform import honor_env_platform

honor_env_platform()

from recnext_tpu import create_model, fuse_params
from recnext_tpu.export import export_stablehlo, load_published, publish_fused

NAME = "recnext_m0"

model = create_model(NAME)
x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(np.float32))
variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

logits = model.apply(variables, x, training=False)
print(f"{NAME}: logits {logits.shape}")

feats = model.apply(variables, x, method=model.features)
print("feature pyramid:", [tuple(f.shape) for f in feats])

fused_model = create_model(NAME, fused=True)
fused_vars = fuse_params(jax.device_get(variables))
fused_logits = fused_model.apply(fused_vars, x, training=False)
# relative check: random-init logits at 224^2 have huge magnitude
rel = float(jnp.abs(fused_logits - logits).max() / (jnp.abs(logits).max() + 1e-9))
print(f"fused parity max relative diff = {rel:.2e}")
assert rel < 1e-4

with tempfile.TemporaryDirectory() as d:
    path = publish_fused(NAME, jax.device_get(variables), d)
    print("published:", path.name)
    restored = load_published(NAME, d)
    served = fused_model.apply(restored, x, training=False)
    np.testing.assert_array_equal(np.asarray(served), np.asarray(fused_logits))
    blob = export_stablehlo(NAME, restored, batch=2, dtype=jnp.float32)
    print(f"stablehlo artifact: {len(blob)/1e6:.1f} MB")

    # lane-packed serving executor (m/a families): numerically exact, measured
    # +8-69% per variant on v5e (PERF.md round 2; policy MEASURED_GROUPS)
    from recnext_tpu.models.registry import get_config
    from recnext_tpu.models.packed_infer import packed_apply

    packed_logits = packed_apply(restored, get_config(NAME), x, group=2)
    rel = float(jnp.abs(packed_logits - fused_logits).max()
                / (jnp.abs(fused_logits).max() + 1e-9))
    print(f"packed executor parity max relative diff = {rel:.2e}")
    assert rel < 1e-4

    # reverse export: the same weights as a reference-loadable torch .pth
    # (self-verified by round-tripping through the forward converters)
    from recnext_tpu.convert import (flax_to_torch, load_torch_checkpoint,
                                     save_torch_checkpoint)

    pth = os.path.join(d, f"{NAME}.pth")
    save_torch_checkpoint(flax_to_torch(jax.device_get(variables)), pth)
    back = load_torch_checkpoint(pth)
    back_logits = model.apply(back, x, training=False)
    np.testing.assert_array_equal(np.asarray(back_logits), np.asarray(logits))
    print(f"reverse torch export round-trip OK: {os.path.basename(pth)}")

print("quickstart OK")
