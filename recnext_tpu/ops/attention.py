"""Linear-attention cores (ELU+1 feature map, mean-normalized), head-batched.

Behavioural spec (reference: /root/reference/model/recattn.py:8-51 and
/root/reference/lsnet/model/recattn.py:37-112): with q,k = elu(qk_proj(x))+1 and v=x,

* kv-first (O(n d^2)):  out = q @ ((k*s)^T (v*s)) / (q @ mean_n(k) + 1e-6)
* qk-first (O(n^2 d)):  A = q k^T;  out = (A / (mean_row(A)+1e-6) * s) @ (v * s)

The two are mathematically identical (the reference asserts allclose at 1e-4,
/root/reference/lsnet/model/recattn.py:480-501); the repo picks kv-first for large n
and qk-first for tiny n. We expose both; the mean-normalizer is computed in fp32
because the 1/(q.mean(k)+1e-6) term is documented as bf16-unstable
(/root/reference/README.md:676).

Tensors are (batch*heads, n, d) — a shape that keeps n on sublanes and d on lanes so
both einsums map straight onto the MXU. The fused Pallas kernel (elu+1 + both matmuls
+ fp32 normalizer in one dispatch) lives in recnext_tpu/ops/pallas/linear_attention.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_attention_kv_first(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """q, k: (B, n, d); v: (B, n, dv) -> (B, n, dv). B folds batch*heads."""
    n = q.shape[-2]
    s = float(n) ** -0.5
    kv = jnp.einsum("bnd,bne->bde", k * s, v * s, preferred_element_type=jnp.float32)
    k_mean = jnp.mean(k.astype(jnp.float32), axis=-2)  # (B, d)
    denom = jnp.einsum("bnd,bd->bn", q.astype(jnp.float32), k_mean) + eps
    num = jnp.einsum("bnd,bde->bne", q, kv.astype(q.dtype), preferred_element_type=jnp.float32)
    return (num / denom[..., None]).astype(v.dtype)


def linear_attention_qk_first(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Quadratic-in-n form, preferable when n is tiny (stage-3 feature maps)."""
    n = q.shape[-2]
    s = float(n) ** -0.5
    a = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    a = a / (jnp.mean(a, axis=-1, keepdims=True) + eps)
    out = jnp.einsum("bnm,bme->bne", (a * s).astype(v.dtype), v * s,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def feature_map(x: jnp.ndarray, kind: str = "elu") -> jnp.ndarray:
    """Positive feature maps for linear attention. The reference's kernel ablation
    ("Promising refinement", /root/reference/lsnet/README.md; profile variants
    /root/reference/lsnet/model/profile.py:9-17): elu(x)+1, softplus(beta=3.5), relu."""
    import jax

    if kind == "elu":
        return jax.nn.elu(x) + 1.0
    if kind == "softplus":
        beta = 3.5
        return jax.nn.softplus(x * beta) / beta
    if kind == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"unknown feature map {kind!r}")


def softmax_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Scaled-dot-product baseline (the reference's `Attention` comparison class,
    /root/reference/lsnet/model/profile.py:9-17). q,k: (B,n,d); v: (B,n,dv)."""
    import jax

    d = q.shape[-1]
    a = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    a = jax.nn.softmax(a / (float(d) ** 0.5), axis=-1)
    out = jnp.einsum("bnm,bme->bne", a.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)
