"""Model publishing and export — the TPU-native counterpart of the reference's
publish/export pipeline (/root/reference/publish.py:13-53 extract-or-fuse+script,
/root/reference/export_coreml.py:18-44 trace+convert, segmentation/tools/pytorch2onnx).

* `publish_fused`    — BN-fuse and save inference params (msgpack via flax
  serialization): the `*_fused.pt` counterpart.
* `load_published`   — restore them for the fused=True model.
* `export_stablehlo` — `jax.export` the jitted fused forward to portable StableHLO
  bytes: the TorchScript/ONNX/CoreML counterpart (StableHLO is the interchange format
  TPU serving stacks consume).
* `import_torch_and_publish` — one-shot: reference .pth -> converted -> fused -> saved.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from recnext_tpu.fusion import fuse_params
from recnext_tpu.models.registry import create_model, get_config


def publish_fused(model_name: str, variables: Dict[str, Any], out_path: str) -> Path:
    """Fuse train/eval variables and write <out>/<model>_fused.msgpack + meta.json."""
    from flax import serialization

    fused = fuse_params(variables)
    out = Path(out_path)
    out.mkdir(parents=True, exist_ok=True)
    blob = serialization.to_bytes(fused)
    f = out / f"{model_name}_fused.msgpack"
    f.write_bytes(blob)
    cfg = get_config(model_name)
    (out / f"{model_name}_meta.json").write_text(json.dumps({
        "model": model_name, "family": cfg.family, "embed_dim": cfg.embed_dim,
        "depth": cfg.depth, "num_classes": cfg.num_classes, "fused": True,
    }, indent=2))
    return f


def resolve_published_path(model_name: str, path: str) -> Path:
    """Resolve an archive dir (or direct file path) to the published msgpack,
    falling back to the newest sha-stamped artifact (publish_model.py role)."""
    p = Path(path)
    if p.is_dir():
        f = p / f"{model_name}_fused.msgpack"
        if not f.exists():
            # newest by mtime — the sha8 infix is content-derived, so a
            # lexicographic sort would pick an arbitrary (possibly stale) one
            stamped = sorted(p.glob(f"{model_name}_fused-*.msgpack"),
                             key=lambda q: q.stat().st_mtime)
            if stamped:
                f = stamped[-1]
        p = f
    return p


def load_published(model_name: str, path: str) -> Dict[str, Any]:
    """Restore published fused params for create_model(model_name, fused=True)."""
    from flax import serialization

    model = create_model(model_name, fused=True)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), x)
    p = resolve_published_path(model_name, path)
    return serialization.from_bytes(template, p.read_bytes())


def export_stablehlo(
    model_name: str,
    variables: Optional[Dict[str, Any]] = None,
    *,
    batch: int = 1,
    input_size: int = 0,
    dtype=jnp.bfloat16,
    fused: bool = True,
    out_path: Optional[str] = None,
) -> bytes:
    """Serialize the jitted forward to StableHLO bytes (jax.export).
    input_size 0 = the family's native resolution (224; 256 for the MLLA
    grafts, which have no BN-fused form — `fused` is ignored there)."""
    from jax import export as jexport

    if model_name.startswith("mlla"):
        from recnext_tpu.models.mlla import create_mlla

        model = create_mlla(model_name, dtype=dtype)
        input_size = input_size or model.cfg.img_size
        x = jnp.zeros((batch, input_size, input_size, 3), dtype)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), x[:1])

        def fwd(xx):
            return model.apply(jax.tree.map(jnp.asarray, variables), xx,
                               training=False)

        exported = jexport.export(jax.jit(fwd))(
            jax.ShapeDtypeStruct(x.shape, x.dtype))
        blob = exported.serialize()
        if out_path:
            Path(out_path).write_bytes(blob)
        return blob

    input_size = input_size or 224
    model = create_model(model_name, fused=fused, dtype=dtype)
    x = jnp.zeros((batch, input_size, input_size, 3), dtype)
    if variables is None:
        base = create_model(model_name, fused=False, dtype=dtype)
        variables = base.init(jax.random.PRNGKey(0), x[:1])
        if fused:
            variables = fuse_params(variables)

    def fwd(xx):
        return model.apply(jax.tree.map(jnp.asarray, variables), xx, training=False)

    exported = jexport.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(x.shape, x.dtype))
    blob = exported.serialize()
    if out_path:
        Path(out_path).write_bytes(blob)
    return blob


def sha_stamp(artifact: Path) -> Path:
    """Content-address a published artifact: rename to <stem>-<sha8><suffix> and
    record the full digest in the sibling meta.json (the
    /root/reference/segmentation/tools/publish_model.py:17-28 role)."""
    import hashlib

    digest = hashlib.sha256(artifact.read_bytes()).hexdigest()
    stamped = artifact.with_name(f"{artifact.stem}-{digest[:8]}{artifact.suffix}")
    artifact.rename(stamped)
    meta = artifact.parent / f"{artifact.stem.replace('_fused', '')}_meta.json"
    if meta.exists():
        m = json.loads(meta.read_text())
        m.update(sha256=digest, artifact=stamped.name)
        meta.write_text(json.dumps(m, indent=2))
    return stamped


def import_torch_and_publish(model_name: str, torch_ckpt: str, out_path: str) -> Path:
    """Reference .pth checkpoint -> flax -> fused -> published artifact."""
    from recnext_tpu.convert import load_torch_checkpoint

    variables = load_torch_checkpoint(torch_ckpt)
    return publish_fused(model_name, variables, out_path)


def main():
    import argparse

    # honor an explicit JAX_PLATFORMS over the site hook's pin (validate.py pattern)
    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    p = argparse.ArgumentParser("publish / export a model")
    p.add_argument("--model", required=True)
    p.add_argument("--torch-ckpt", default="", help=".pth to import (else random init)")
    p.add_argument("--ckpt", default="", help="orbax train-state dir to export")
    p.add_argument("--ema", action="store_true", help="export the EMA weights from --ckpt")
    p.add_argument("--out", default="published")
    p.add_argument("--stablehlo", action="store_true")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--sha-stamp", action="store_true",
                   help="content-address the artifact (publish_model.py role)")
    p.add_argument("--to-torch", default="",
                   help="also write a reference-loadable .pth (reverse conversion; "
                        "published-fused layout, or training layout with --torch-unfused)")
    p.add_argument("--torch-unfused", action="store_true",
                   help=".pth in the unfused training layout instead of published-fused")
    args = p.parse_args()

    if args.torch_ckpt:
        from recnext_tpu.convert import load_torch_checkpoint

        variables = load_torch_checkpoint(args.torch_ckpt)
    elif args.ckpt:
        import orbax.checkpoint as ocp

        p = Path(args.ckpt).resolve()
        if (p / "default").is_dir():  # CheckpointManager step dir (train CLI layout)
            p = p / "default"
        restored = ocp.StandardCheckpointer().restore(p)
        key = "ema_params" if args.ema else "params"
        variables = {"params": restored[key],
                     "batch_stats": restored["ema_batch_stats" if args.ema
                                             else "batch_stats"]}
    elif args.model.startswith("mlla"):
        from recnext_tpu.models.mlla import create_mlla

        model = create_mlla(args.model)
        x = jnp.zeros((1, model.cfg.img_size, model.cfg.img_size, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    else:
        model = create_model(args.model)
        x = jnp.zeros((1, 224, 224, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)

    if args.model.startswith("mlla"):
        # the MLLA grafts are LayerNorm-based: no BN-fused published artifact;
        # the deployables are the StableHLO blob and/or the reference-loadable
        # torch .pth (convert.mlla_flax_to_torch)
        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        if args.to_torch:
            from recnext_tpu.convert import mlla_flax_to_torch, save_torch_checkpoint

            save_torch_checkpoint(mlla_flax_to_torch(variables), args.to_torch)
            print(f"exported torch checkpoint {args.to_torch} (mlla layout)")
        if args.stablehlo:
            out = out_dir / f"{args.model}_b{args.batch}.stablehlo"
            export_stablehlo(args.model, variables, batch=args.batch,
                             out_path=str(out))
            print(f"exported {out}")
        if not (args.to_torch or args.stablehlo):
            raise SystemExit("mlla models have no fused published artifact; "
                             "pass --stablehlo and/or --to-torch")
        return

    f = publish_fused(args.model, variables, args.out)
    if args.sha_stamp:
        f = sha_stamp(f)
    print(f"published {f}")
    if args.to_torch:
        from recnext_tpu.convert import (flax_fused_to_torch, flax_to_torch,
                                         save_torch_checkpoint)

        family = get_config(args.model).family
        state = (flax_to_torch(variables) if args.torch_unfused
                 else flax_fused_to_torch(fuse_params(variables), family=family))
        save_torch_checkpoint(state, args.to_torch)
        print(f"exported torch checkpoint {args.to_torch} "
              f"({'unfused' if args.torch_unfused else 'published-fused'} layout)")
    if args.stablehlo:
        out = Path(args.out) / f"{args.model}_b{args.batch}.stablehlo"
        export_stablehlo(args.model, load_published(args.model, args.out),
                         batch=args.batch, out_path=str(out))
        print(f"exported {out}")


if __name__ == "__main__":
    main()
