import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
a32 = jnp.asarray(rng.integers(0, 1<<32, (2*1024*1024,), np.uint32))
body = lambda v: v * jnp.uint32(2654435761) + jnp.uint32(7)

for iters in (16, 128, 512):
    f = jax.jit(lambda a, n=iters: jnp.sum(jax.lax.fori_loop(0, n, lambda i, v: body(v), a)))
    s = f(a32); _ = np.asarray(s)
    t = time.time(); s = f(a32); _ = np.asarray(s)
    print(f"fori {iters}: {(time.time()-t)/iters*1e6:.1f} us/iter")

def unrolled(a):
    v = a
    for _ in range(128): v = body(v)
    return jnp.sum(v)
g = jax.jit(unrolled)
s = g(a32); _ = np.asarray(s)
t = time.time(); s = g(a32); _ = np.asarray(s)
print(f"unrolled 128: {(time.time()-t)/128*1e6:.1f} us/iter")

# scan instead of fori?
def scanned(a):
    v, _ = jax.lax.scan(lambda v, x: (body(v), None), a, None, length=128)
    return jnp.sum(v)
h = jax.jit(scanned)
s = h(a32); _ = np.asarray(s)
t = time.time(); s = h(a32); _ = np.asarray(s)
print(f"scan 128: {(time.time()-t)/128*1e6:.1f} us/iter")
