import sys, time
import jax, jax.numpy as jnp
import numpy as np
from recnext_tpu.models.registry import create_model
from recnext_tpu.train.optim import cosine_schedule, make_optimizer
from recnext_tpu.train.state import TrainState
from recnext_tpu.train.step import make_train_step

remat = sys.argv[1] == "remat" if len(sys.argv) > 1 else False
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
model = create_model("recnext_a5", dtype=jnp.bfloat16, attn_impl="blockdiag")
x0 = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
variables = jax.tree.map(lambda s: (np.ones(s.shape, s.dtype) * 0.01), shapes)
tx = make_optimizer(cosine_schedule(1e-3, 1000))
state = jax.device_put(TrainState.create(variables, tx))
step = jax.jit(make_train_step(model, tx, num_classes=1000, mixup=True, remat=remat),
               donate_argnums=(0,))
batch_data = {"image": jax.device_put(jnp.ones((batch, 224, 224, 3), jnp.bfloat16)),
              "label": jax.device_put(jnp.zeros((batch,), jnp.int32))}
t0 = time.time()
state, _ = step(state, batch_data, jax.random.PRNGKey(0))
jax.block_until_ready(state.params)
print(f"COMPILE_OK remat={remat} batch={batch} in {time.time()-t0:.0f}s")
