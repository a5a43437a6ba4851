"""Does a long-running (innocent) device program kill the worker?

Runs a dependent matmul chain sized to take ~T seconds in ONE jit call.
Usage: python scripts/probe_watchdog.py N_ITERS
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
n = int(sys.argv[1])

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def chain(x, n):
    def body(i, a):
        return a @ a * 1e-6 + 1.0
    return jax.lax.fori_loop(0, n, body, x)


x = jnp.ones((8192, 8192), jnp.bfloat16)
# calibrate with a short run
t0 = time.perf_counter()
r = np.asarray(chain(x, jnp.asarray(16)))[:2, :2]
t1 = time.perf_counter()
print(f"16 iters: {t1-t0:.2f}s (incl compile)", flush=True)
t0 = time.perf_counter()
r = np.asarray(chain(x, jnp.asarray(64)))[:2, :2]
t1 = time.perf_counter()
per = (t1 - t0) / 64
print(f"64 iters: {t1-t0:.2f}s -> {per*1000:.2f} ms/iter", flush=True)

t0 = time.perf_counter()
try:
    r = np.asarray(chain(x, jnp.asarray(n)))[:2, :2]
    print(f"{n} iters: PASS {time.perf_counter()-t0:.2f}s", flush=True)
except Exception as e:
    print(f"{n} iters: DIED after {time.perf_counter()-t0:.2f}s: "
          f"{type(e).__name__}", flush=True)
