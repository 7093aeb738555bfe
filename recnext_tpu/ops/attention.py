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


def linear_attention_blockdiag(
    qk: jnp.ndarray, v: jnp.ndarray, num_heads: int, eps: float = 1e-6,
    groups: int = 1, fused_denom: bool = False,
) -> jnp.ndarray:
    """kv-first linear attention computed ENTIRELY in the NHWC channel layout:
    the per-head einsums become one dense (C, C) contraction under a
    block-diagonal head mask, and the head split/merge (two 6-D transposes in
    the head-batched form, models/mixers.py:_split_qk_nhwc/_merge_heads_nhwc)
    disappears. The masked entries are EXACT zeros computed then discarded —
    every surviving fp32 product is the same one the head-batched form sums,
    so the result matches to reduction-order (<=ulp) and the extra MXU work is
    num_heads x a trivially small contraction (n<=784, C<=640 at the A-family
    shapes). Candidate from the round-5 a-family campaign (VERDICT r4 item 1).

    qk: (B, H, W, 2C) AFTER the feature map; v: (B, H, W, C).
    `groups` g > 1 = the lane-packed layout, channels = g x [2, nh, hd]
    (models/packed_infer.py): the q/k split is then per packed image, and the
    head mask covers g*num_heads contiguous hd-blocks.

    fused_denom: compute sum_n(k) as an extra kv COLUMN (one einsum emits both
    the numerator operand and the normalizer) instead of the separate fp32
    mean/einsum pair; the normalizer column stays fp32 (the 1/(q·mean k + eps)
    term is documented bf16-unstable, /root/reference/README.md:676).
    """
    b, h, w, c2 = qk.shape
    c = c2 // 2
    n = h * w
    nh = num_heads * groups
    hd = c // nh
    if groups == 1:
        q = qk[..., :c].reshape(b, n, c)
        k = qk[..., c:].reshape(b, n, c)
    else:
        qkg = qk.reshape(b, n, groups, 2, c // groups)
        q = qkg[:, :, :, 0].reshape(b, n, c)
        k = qkg[:, :, :, 1].reshape(b, n, c)
    vv = v.reshape(b, n, c)
    s = float(n) ** -0.5
    mask = jnp.kron(jnp.eye(nh, dtype=jnp.float32),
                    jnp.ones((hd, hd), jnp.float32))
    if fused_denom:
        # one kv matmul emits both operands: an extra all-ones v column makes
        # column c of kv equal s·sum_n(k) — the normalizer's k-statistic rides
        # the same MXU contraction instead of a separate reduction
        ones = jnp.ones((b, n, 1), vv.dtype)
        kv1 = jnp.einsum("bnc,bnd->bcd", k * s, jnp.concatenate([vv * s, ones], -1),
                         preferred_element_type=jnp.float32)
        kv = kv1[..., :c] * mask
        k_mean = kv1[..., c] / (s * n)  # (b, c): fp32 mean_n k
    else:
        kv = jnp.einsum("bnc,bnd->bcd", k * s, vv * s,
                        preferred_element_type=jnp.float32) * mask
        k_mean = jnp.mean(k.astype(jnp.float32), axis=1)  # (b, c)
    # q · mean(k) per head block, elementwise + per-block sum (no einsum, no
    # head transpose); fp32 throughout (bf16 normalizer is documented unstable)
    prod = q.astype(jnp.float32) * k_mean[:, None, :]
    denom = prod.reshape(b, n, nh, hd).sum(-1)  # (b, n, nh)
    num = jnp.einsum("bnc,bcd->bnd", q, kv.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    denom = jnp.repeat(denom + eps, hd, axis=-1)
    out = (num / denom).astype(v.dtype)
    if groups == 1:
        return out.reshape(b, h, w, c)
    # merge back to the packed channel order (g, nh_per_img, hd) — already is
    return out.reshape(b, h, w, c)


def linear_attention_blockdiag_rope(
    q: jnp.ndarray, k: jnp.ndarray, q_r: jnp.ndarray, k_r: jnp.ndarray,
    v: jnp.ndarray, num_heads: int, eps: float = 1e-6,
) -> jnp.ndarray:
    """MLLA rope form of the channel-layout blockdiag linear attention
    (mlla_recattn.py:49-79 semantics: the RoPE-rotated q,k enter the NUMERATOR
    only; the denominator uses the un-rotated pair). Same head-masked dense
    (C,C) kv-first reduction as linear_attention_blockdiag — the head
    split/merge transposes disappear; masked entries are exact zeros so the
    result is reduction-order-equal to the head-batched form.

    All inputs (B, n, C); q_r/k_r arrive fp32 from apply_rope, and the whole
    rope attention stays fp32 to match the head-batched path's dtypes."""
    b, n, c = q.shape
    nh, hd = num_heads, c // num_heads
    s = float(n) ** -0.5
    mask = jnp.kron(jnp.eye(nh, dtype=jnp.float32),
                    jnp.ones((hd, hd), jnp.float32))
    kv = jnp.einsum("bnc,bnd->bcd", k_r * s, v.astype(jnp.float32) * s,
                    preferred_element_type=jnp.float32) * mask
    num = jnp.einsum("bnc,bcd->bnd", q_r, kv,
                     preferred_element_type=jnp.float32)
    k_mean = jnp.mean(k.astype(jnp.float32), axis=1)  # (b, c)
    prod = q.astype(jnp.float32) * k_mean[:, None, :]
    denom = prod.reshape(b, n, nh, hd).sum(-1) + eps  # (b, n, nh)
    out = num / jnp.repeat(denom, hd, axis=-1)
    return out.astype(v.dtype)


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
