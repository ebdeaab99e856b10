import time, numpy as np, jax
warm = jax.device_put(np.zeros(4096, np.uint8)); np.asarray(warm[:1])
buf = np.zeros(1<<19, np.uint8)
t0=time.monotonic(); dev=jax.device_put(buf); np.asarray(dev[:1])
print(int((time.monotonic()-t0)*1e3))
