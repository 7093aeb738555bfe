"""Train state pytree: params + BN stats + optimizer state + EMA.

Replaces the reference checkpoint dict {model, optimizer, lr_scheduler, epoch,
model_ema, scaler} (/root/reference/main.py:419-447). No loss scaler: we train in
bf16 compute with fp32 params, which the reference itself recommends over fp16 for
RecConv stability (/root/reference/README.md:676, engine.py:46-47).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    ema_batch_stats: Any = None

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation, ema: bool = True):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if ema else None,
            ema_batch_stats=jax.tree.map(jnp.copy, batch_stats) if ema else None,
        )

    def variables(self, ema: bool = False):
        if ema:
            return {"params": self.ema_params, "batch_stats": self.ema_batch_stats}
        return {"params": self.params, "batch_stats": self.batch_stats}


def ema_update(old: Any, new: Any, decay: float) -> Any:
    """timm ModelEma rule: e = decay*e + (1-decay)*v (utils.py:155-162, decay 0.99996)."""
    if old is None:
        return None
    return jax.tree.map(lambda e, v: e * decay + v.astype(e.dtype) * (1.0 - decay), old, new)
