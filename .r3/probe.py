import time, sys
t0 = time.time()
import jax
print("import jax ok", time.time()-t0, flush=True)
try:
    devs = jax.devices()
    print("devices:", devs, flush=True)
    import jax.numpy as jnp
    x = jnp.ones((256, 256))
    y = (x @ x).block_until_ready()
    print("matmul ok, sum=", float(y.sum()), "elapsed", time.time()-t0, flush=True)
except Exception as e:
    print("TPU probe FAILED:", repr(e), flush=True)
    sys.exit(1)
