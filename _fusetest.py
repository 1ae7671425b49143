import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 1<<32, (2*1024*1024,), np.uint32))  # 8MB

def chain(a):
    x = a
    for i in range(20):
        x = x * jnp.uint32(2654435761) + jnp.uint32(i)
    return x

def loop(a):
    return jax.lax.fori_loop(0, 64, lambda i, v: chain(v), a)

f = jax.jit(loop)
o = f(a); _ = np.asarray(o)[0]
t = time.time(); o = f(a); _ = np.asarray(o)[0]
dt = (time.time()-t)/64
print(f"20-op u32 chain on 8MB: {dt*1e6:.0f} us/iter")
print(f"implied passes: {dt/ (16e6/0.8e12):.1f}")
# single op baseline
def one(a):
    return jax.lax.fori_loop(0, 64, lambda i, v: v * jnp.uint32(3) + jnp.uint32(1), a)
g = jax.jit(one)
o = g(a); _ = np.asarray(o)[0]
t = time.time(); o = g(a); _ = np.asarray(o)[0]
print(f"1-op: {(time.time()-t)/64*1e6:.0f} us/iter")
