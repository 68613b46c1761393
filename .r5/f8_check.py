import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax, jax.numpy as jnp
from nerfacc_tpu.ops.table_grad import hash_lookup_combine3

n_rows, F, N = 1024, 16, 512
table = jax.random.normal(jax.random.PRNGKey(0), (n_rows, 128), jnp.float32) * 0.1
idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, n_rows, jnp.int32)
wx, wy, wz = (jax.random.uniform(jax.random.PRNGKey(i), (N,)) for i in (2,3,4))

def loss(t):
    out = hash_lookup_combine3(t, idx, wx, wy, wz, compute_dtype=jnp.bfloat16, interpret=True)
    return jnp.sum(out * jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) * 1e-4)

os.environ["NERFACC_FACTOR_PACK"] = "u10"
g_u10 = jax.grad(loss)(table)
jax.clear_caches()
os.environ["NERFACC_FACTOR_PACK"] = "u10f8"
g_f8 = jax.grad(loss)(table)
a, b = np.asarray(g_u10), np.asarray(g_f8)
denom = np.abs(a).max()
print("max |u10|:", denom, "max abs diff:", np.abs(a-b).max(), "rel:", np.abs(a-b).max()/denom)
nz = np.abs(a) > 0
print("nonzero cells:", int(nz.sum()), "corr:", np.corrcoef(a[nz], b[nz])[0,1])
