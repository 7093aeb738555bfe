"""recnext_tpu — a TPU-native JAX/Flax/Pallas framework with the capabilities of RecNeXt.

Built from scratch for TPU: NHWC layouts, XLA-fusable functional ops, Pallas kernels
for the hot paths (fused RecConv pyramid, linear attention), pjit/shard_map data
parallelism over a device mesh, grain input pipeline, orbax checkpointing.

Reference capability map: /root/reference (suous/RecNeXt) — see SURVEY.md.
"""

__version__ = "0.1.0"


def __getattr__(name):
    if name in ("create_model", "list_models", "get_config"):
        from recnext_tpu.models import registry

        return getattr(registry, name)
    raise AttributeError(name)
