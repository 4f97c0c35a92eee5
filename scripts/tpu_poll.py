"""Ping the accelerator: one tiny dispatch, print aliveness + latency.

The shared TPU worker behind the tunnel occasionally dies/restarts;
dispatches then hang rather than error.  Run under `timeout`."""
import sys, time
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
v = float(jnp.sum(x))
print(f"TPU ALIVE after {time.time()-t0:.1f}s (sum={v})", flush=True)
