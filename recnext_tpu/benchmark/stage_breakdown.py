"""Per-stage device-time breakdown of a fused model — tells future optimization
rounds where the remaining time goes (PERF.md estimates ~2.5x slack over the compute
bound; this attributes it).

  python -m recnext_tpu.benchmark.stage_breakdown --model recnext_m1 --batch 256
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.benchmark.micro import timeit


def main(argv=None):

    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="recnext_m1")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    from recnext_tpu.fusion import fuse_params
    from recnext_tpu.models.registry import create_model, get_config

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = get_config(args.model)
    model = create_model(args.model, fused=True, dtype=dtype)
    base = create_model(args.model, dtype=dtype)
    shapes = jax.eval_shape(base.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), dtype))
    variables = fuse_params(jax.tree.map(lambda s: np.ones(s.shape, s.dtype), shapes))
    variables = jax.device_put(variables)

    stem_stride = 4 if cfg.family != "l" else 8
    h = 224 // stem_stride
    results = {}

    # stem
    x_in = jnp.ones((args.batch, 224, 224, 3), dtype)
    f_stem = jax.jit(lambda x: model.apply(
        variables, x, training=False,
        method=lambda m, xx, training: m.stem(xx, training=training)))
    # stems change spatial dims; chain via a resize back for the timer
    def stem_chained(x):
        y = f_stem(x)
        return x + 0.0 * jnp.sum(y).astype(x.dtype)

    results["stem"] = timeit(jax.jit(stem_chained), x_in, chain_idx=0)

    # per stage: time blocks at their INPUT shape (the downsample, included for
    # i>0, halves it internally)
    dims = cfg.embed_dim
    for i in range(4):
        in_hw = h // (2 ** max(i - 1, 0))
        cin = dims[i - 1] if i > 0 else dims[0]
        x = jnp.ones((args.batch, in_hw, in_hw, cin), dtype)

        def stage_fn(xx, i=i):
            def run(m, inp, training):
                ds = m.downsamples[i]
                out = ds(inp, training=training) if ds is not None else inp
                for blk in m.stage_blocks[i]:
                    out = blk(out, training=training)
                return out

            return model.apply(variables, xx, training=False, method=run)

        def chained(xx, f=jax.jit(stage_fn)):
            return xx + 0.0 * jnp.sum(f(xx)).astype(xx.dtype)

        results[f"stage{i}"] = timeit(jax.jit(chained), x, chain_idx=0)

    total = sum(results.values())
    print(json.dumps({k: round(v, 3) for k, v in results.items()}
                     | {"sum_ms": round(total, 3),
                        "note": "includes ~0.6ms/section scan-timer floor"}))
    return results


if __name__ == "__main__":
    main()
