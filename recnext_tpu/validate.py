"""Standalone validation CLI — the moganet_valid.py counterpart
(/root/reference/moganet_valid.py:130-368): evaluate any checkpoint (orbax train
state, published fused msgpack, or reference .pth) on a dataset, with crop-pct
control and CSV results output. Also covers fuse_eval.py's role (fused-parity eval,
/root/reference/fuse_eval.py:33-55) via --fused.

  python -m recnext_tpu.validate --model recnext_m0 --checkpoint pub_dir --fused \
      --data-set IMNET --data-path /data/imagenet --crop-pct 0.9
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("RecNext TPU validation")
    p.add_argument("--model", required=True)
    p.add_argument("--model-kwargs", default="",
                   help="comma-separated RecNextConfig overrides matching the "
                        "trained ablation config, e.g. recconv_kernel_size=3")
    p.add_argument("--checkpoint", default="", help="orbax dir / published dir / .pth")
    p.add_argument("--fused", action="store_true", help="evaluate the BN-fused model")
    p.add_argument("--packed", action="store_true",
                   help="with --fused on an m/a-family model: run the lane-packed "
                        "executor (numerically exact, measured faster; PERF.md)")
    p.add_argument("--ema", action="store_true", help="evaluate the EMA weights")
    p.add_argument("--data-set", default="IMNET",
                   choices=["IMNET", "CIFAR", "FOLDER", "FAKE",
                            "IMNETEE", "FLOWERS", "INAT", "INAT19"])
    p.add_argument("--data-path", default="")
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--crop-pct", type=float, default=224 / 256)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--dtype", default="float32", choices=["bfloat16", "float32"])
    p.add_argument("--results-file", default="", help="append a CSV row here")
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--compile-cache", default="",
                   help="persistent XLA compilation cache dir (or env "
                        "RECNEXT_COMPILE_CACHE)")
    p.add_argument("--native-loader", action="store_true",
                   help="C++ decode+resize fast path (PIL-parity antialiased "
                        "bicubic, ImageFolder only — see PARITY.md)")
    p.add_argument("--real-labels", default="",
                   help="JSON of reassessed labels ('Are we done with ImageNet'): "
                        "either the original real.json list (ImageNet val order) or "
                        "a {basename: [labels]} dict; top-1/5 are replaced by "
                        "real-label accuracy (moganet_valid.py:124,215-216)")
    p.add_argument("--valid-labels", default="",
                   help="file with one class index per line: restrict the output "
                        "space to this subset before scoring "
                        "(moganet_valid.py:126,207-210)")
    p.add_argument("--test-pool", action="store_true",
                   help="test-time pooling at input sizes > 224 (requires --fused): "
                        "window-avg-pool the final feature map at the native 7x7 "
                        "pool size, apply the classifier per position, then "
                        "0.5*(avg+max) over positions; crop-pct forced to 1.0 "
                        "(timm apply_test_time_pool, moganet_valid.py:183-185)")
    return p.parse_args(argv)


class RealLabels:
    """Reassessed-label scorer (timm RealLabelsImagenet counterpart,
    /root/reference/moganet_valid.py:28,215-216,286-288): a prediction is correct
    if any of its top-k classes is in the sample's reassessed label set; samples
    with an empty set are skipped. Accepts the original real.json (a list in
    ImageNet val order, filenames ILSVRC2012_val_%08d.JPEG) or {basename: [labels]}."""

    def __init__(self, filenames, real_json: str, topk=(1, 5)):
        with open(real_json) as f:
            data = json.load(f)
        if isinstance(data, list):
            data = {f"ILSVRC2012_val_{i + 1:08d}.JPEG": v for i, v in enumerate(data)}
        self._labels = data
        self._filenames = [os.path.basename(str(f)) for f in filenames]
        self._topk = topk
        self._correct = {k: 0 for k in topk}
        self._scored = 0
        self._idx = 0

    def add_results(self, logits: np.ndarray, col_map=None):
        """`col_map` maps logit-column indices back to original class ids when
        the logits were sliced to a --valid-labels subset; real.json labels are
        always in the original class space."""
        maxk = max(self._topk)
        preds = np.argsort(logits, axis=-1)[:, : -maxk - 1 : -1]
        if col_map is not None:
            preds = np.asarray(col_map)[preds]
        for pred in preds:
            labels = self._labels.get(self._filenames[self._idx])
            if labels:
                self._scored += 1
                for k in self._topk:
                    if any(int(p) in labels for p in pred[:k]):
                        self._correct[k] += 1
            self._idx += 1

    def accuracy(self, k: int) -> float:
        return 100.0 * self._correct[k] / max(self._scored, 1)


def load_variables(args, model, fused_model):
    from recnext_tpu.fusion import fuse_params

    ckpt = args.checkpoint
    x0 = jnp.zeros((1, args.input_size, args.input_size, 3), jnp.float32)
    if not ckpt:
        variables = model.init(jax.random.PRNGKey(0), x0)
        return (fuse_params(variables) if args.fused else variables)
    if ckpt.endswith((".pth", ".pt")):
        if args.model.startswith("mlla"):
            import torch

            from recnext_tpu.convert import mlla_torch_to_flax

            state = torch.load(ckpt, map_location="cpu", weights_only=False)
            return mlla_torch_to_flax(state.get("model", state))
        from recnext_tpu.convert import load_torch_checkpoint

        variables = load_torch_checkpoint(ckpt)
        return fuse_params(variables) if args.fused else variables
    p = Path(ckpt)
    if (p / f"{args.model}_fused.msgpack").exists() or p.suffix == ".msgpack":
        from recnext_tpu.export import load_published

        assert args.fused, "published artifacts are fused; pass --fused"
        return load_published(args.model, str(p))
    # orbax train-state checkpoint
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(p.resolve())
    key = "ema_params" if args.ema else "params"
    variables = {"params": restored[key],
                 "batch_stats": restored["ema_batch_stats" if args.ema else "batch_stats"]}
    return fuse_params(variables) if args.fused else variables


def main(argv=None):
    args = parse_args(argv)
    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from recnext_tpu.data.datasets import build_dataset
    from recnext_tpu.data.loader import eval_loader
    from recnext_tpu.data.transforms import EvalTransform
    from recnext_tpu.models.registry import create_model
    from recnext_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(args.compile_cache or None)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    ds, nb_classes = build_dataset(False, args.data_set, args.data_path, args.input_size)
    from recnext_tpu.models.registry import parse_kv_overrides

    mkw = parse_kv_overrides(args.model_kwargs)
    if args.model.startswith("mlla"):
        # the MLLA graft family is LayerNorm-based: no BN-fusion or lane-packed
        # path; checkpoints come from the trainer (orbax) or the reference's
        # torch .pth via mlla_torch_to_flax
        if args.fused or args.packed or args.test_pool:
            raise SystemExit("mlla models have no fused/packed/test-pool path")
        from recnext_tpu.models.mlla import create_mlla

        model = create_mlla(args.model, num_classes=nb_classes, dtype=dtype, **mkw)
        fused_model = None
    else:
        model = create_model(args.model, num_classes=nb_classes, dtype=dtype, **mkw)
        fused_model = create_model(args.model, num_classes=nb_classes, fused=True,
                                   dtype=dtype, **mkw)
    variables = load_variables(args, model, fused_model)
    net = fused_model if args.fused else model

    # test-time pooling activates only above the native train resolution, like
    # timm's apply_test_time_pool(use_test_size=True); when active, crop_pct=1.0
    test_pool = False
    if args.test_pool:
        if args.packed:
            raise SystemExit("--test-pool is incompatible with --packed")
        if not args.fused:
            raise SystemExit("--test-pool requires --fused (single-linear head)")
        if args.input_size > 224:
            test_pool = True
            args.crop_pct = 1.0
        else:
            print(f"test-pool inactive: input {args.input_size} <= native 224")

    if args.packed:
        from recnext_tpu.models.packed_infer import packed_apply
        from recnext_tpu.models.registry import get_config

        cfg = get_config(args.model, num_classes=nb_classes, **mkw)
        if not args.fused or cfg.family not in ("m", "a"):
            raise SystemExit("--packed requires --fused and an m/a-family model")

        @jax.jit
        def fwd(x):
            # default_groups reads the (static) batch from the trace, so the
            # ragged final batch just retraces with its own packing factors
            return packed_apply(variables, cfg, x)
    elif test_pool:
        import flax.linen as fnn

        pool = 224 // 32  # the model's native final feature size
        head = variables["params"]["head"]["head"]["linear"]

        @jax.jit
        def fwd(x):
            feats = net.apply(variables, x, training=False,
                              method=net.forward_features).astype(jnp.float32)
            pooled = fnn.avg_pool(feats, (pool, pool), strides=(1, 1),
                                  padding="VALID")
            logits = jnp.einsum("bhwc,cn->bhwn", pooled,
                                head["kernel"].astype(jnp.float32)) + head["bias"]
            # timm adaptive_avgmax_pool2d over the positional logits
            return 0.5 * (logits.mean(axis=(1, 2)) + logits.max(axis=(1, 2)))
    else:
        @jax.jit
        def fwd(x):
            return net.apply(variables, x, training=False)

    valid_cols = None
    if args.valid_labels:
        with open(args.valid_labels) as f:
            valid_cols = np.asarray(sorted({int(line) for line in f if line.strip()}))

    real = None
    if args.real_labels:
        samples = getattr(ds, "samples", None)
        if samples is None:
            raise SystemExit(f"--real-labels needs a dataset with file names "
                             f"(got {args.data_set})")
        from recnext_tpu.data.loader import distributed_eval_indices

        order = distributed_eval_indices(len(ds), 0, 1)
        real = RealLabels([samples[int(i)][0] for i in order], args.real_labels)

    c1 = c5 = n = 0
    t0 = time.time()
    loader = eval_loader(ds, EvalTransform(args.input_size, args.crop_pct),
                         batch_size=args.batch_size, native=args.native_loader)
    for i, batch in enumerate(iter(loader)):
        if args.max_batches and i >= args.max_batches:
            break
        logits = np.asarray(fwd(jnp.asarray(batch["image"], dtype)))
        if valid_cols is not None:
            logits = logits[:, valid_cols]
        if real is not None:
            real.add_results(logits, col_map=valid_cols)
        top5 = np.argsort(logits, axis=-1)[:, -5:]
        labels = batch["label"]
        c1 += int((top5[:, -1] == labels).sum())
        c5 += int((top5 == labels[:, None]).any(axis=-1).sum())
        n += len(labels)
    dt = time.time() - t0
    top1 = 100 * c1 / max(n, 1)
    top5_acc = 100 * c5 / max(n, 1)
    if real is not None:
        # real-labels mode replaces the top-k values (moganet_valid.py:286-288)
        top1, top5_acc = real.accuracy(1), real.accuracy(5)
    result = {"model": args.model, "top1": round(top1, 3),
              "top5": round(top5_acc, 3), "img_size": args.input_size,
              "crop_pct": args.crop_pct, "count": n,
              "images_per_sec": round(n / max(dt, 1e-9), 1),
              "fused": args.fused, "ema": args.ema, "packed": args.packed,
              "test_pool": test_pool, "real_labels": real is not None}
    print(json.dumps(result))
    if args.results_file:
        path = Path(args.results_file)
        fieldnames = list(result.keys())
        need_header = not path.exists() or path.stat().st_size == 0
        if not need_header:
            # appending to a file from an older schema: honor ITS header so the
            # CSV stays rectangular (new fields are dropped for that file)
            with open(path, newline="") as f:
                header = f.readline().strip()
            if header:
                fieldnames = header.split(",")
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames, extrasaction="ignore")
            if need_header:
                w.writeheader()
            w.writerow(result)
    return result


if __name__ == "__main__":
    main()
