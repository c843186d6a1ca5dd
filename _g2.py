import time
import jax, jax.numpy as jnp, numpy as np
H, W = 1080, 1920
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W, 3))
imgf = img.reshape(-1, 3)
py = jax.random.randint(key, (H, W), 0, H)
px = jax.random.randint(key, (H, W), 0, W)
flat = (py * W + px).reshape(-1)

def timeit(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)

timeit("take mode=clip", jax.jit(lambda f: jnp.take(imgf, f, axis=0, mode='clip')), flat)
timeit("take mode=fill", jax.jit(lambda f: jnp.take(imgf, f, axis=0, mode='fill')), flat)
timeit("take unique&sorted hint", jax.jit(lambda f: jax.lax.gather(imgf, f[:,None],
    jax.lax.GatherDimensionNumbers(offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)),
    (1,3), mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)), flat)
# sorted indices (best case): how fast CAN it go?
timeit("take sorted indices", jax.jit(lambda f: jnp.take(imgf, f, axis=0, mode='clip')), jnp.sort(flat))
# identity gather
timeit("take identity", jax.jit(lambda f: jnp.take(imgf, f, axis=0, mode='clip')), jnp.arange(H*W))
