"""FLOP crossover analysis of the two linear-attention forms.

Counterpart of /root/reference/mlla/flops_attn.py:55-84: over the reference's five
(dim, heads, resolution) combos, verify that the kv-first O(n*d^2) form and the
qk-first O(n^2*d) form (a) agree numerically and (b) cross over in FLOPs exactly
where theory says — kv-first is cheaper when seq_len > head_dim, qk-first when
seq_len < head_dim. FLOPs come from XLA's compiled cost analysis (what actually
executes) instead of fvcore graph counting.

  JAX_PLATFORMS=cpu python -m recnext_tpu.benchmark.flops_attn
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.benchmark.flops import count_flops
from recnext_tpu.ops.attention import (
    feature_map,
    linear_attention_kv_first,
    linear_attention_qk_first,
)

# dim, num_heads, resolution — /root/reference/mlla/flops_attn.py:55-61
COMBOS = [
    (16, 2, 32),
    (64, 4, 16),
    (1024, 8, 8),
    (1024, 16, 8),
    (2048, 4, 4),
]


def analyze(dim: int, num_heads: int, resolution: int, seed: int = 0) -> dict:
    head_dim = dim // num_heads
    n = resolution * resolution
    rng = np.random.default_rng(seed)
    # The reference derives q,k from one grouped 1x1 conv; the conv/pe FLOPs are
    # identical between the two forms, so only the attention core is compared.
    q = feature_map(jnp.asarray(rng.standard_normal((num_heads, n, head_dim)), jnp.float32))
    k = feature_map(jnp.asarray(rng.standard_normal((num_heads, n, head_dim)), jnp.float32))
    v = jnp.asarray(rng.standard_normal((num_heads, n, head_dim)), jnp.float32)

    out1 = np.asarray(linear_attention_kv_first(q, k, v))
    out2 = np.asarray(linear_attention_qk_first(q, k, v))
    flops1 = count_flops(linear_attention_kv_first, q, k, v)
    flops2 = count_flops(linear_attention_qk_first, q, k, v)
    return {
        "dim": dim, "num_heads": num_heads, "seq_len": n, "head_dim": head_dim,
        "kv_first_gflops": flops1 / 1e9, "qk_first_gflops": flops2 / 1e9,
        "allclose_1e-4": bool(np.allclose(out1, out2, atol=1e-4)),
        "kv_first_cheaper": bool(flops1 <= flops2),
    }


def main(argv=None):

    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    ok = True
    for dim, num_heads, resolution in COMBOS:
        rec = analyze(dim, num_heads, resolution)
        # crossover assertion, /root/reference/mlla/flops_attn.py:80-84
        expected = rec["seq_len"] > rec["head_dim"]
        rec["crossover_ok"] = rec["kv_first_cheaper"] == expected
        ok &= rec["crossover_ok"] and rec["allclose_1e-4"]
        print(json.dumps(rec))
    if not ok:
        raise SystemExit("crossover or numeric-equivalence assertion failed")


if __name__ == "__main__":
    main()
