"""recnext_tpu — TPU-native RecNeXt framework (models, ops, training, export).

Public API:
    create_model, list_models          model registry (timm-style names)
    fuse_params                        BN fusion as a pure parameter transform
    torch_to_flax, load_torch_checkpoint   reference-checkpoint import
    publish_fused, load_published, export_stablehlo   publishing/export
"""

__version__ = "0.1.0"

from recnext_tpu.models.registry import create_model, get_config, list_models  # noqa: F401


def __getattr__(name):  # lazy heavy imports
    if name == "fuse_params":
        from recnext_tpu.fusion import fuse_params

        return fuse_params
    if name in ("torch_to_flax", "load_torch_checkpoint", "mlla_torch_to_flax"):
        import recnext_tpu.convert as m

        return getattr(m, name)
    if name in ("publish_fused", "load_published", "export_stablehlo"):
        import recnext_tpu.export as m

        return getattr(m, name)
    raise AttributeError(name)
