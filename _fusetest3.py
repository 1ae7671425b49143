import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
def run(name, arr, body, iters=64):
    f = jax.jit(lambda a: jnp.sum(jax.lax.fori_loop(0, iters, lambda i, v: body(v), a), dtype=jnp.uint32 if a.dtype==jnp.uint32 else None))
    s = f(arr); _ = float(np.asarray(s))
    t = time.time(); s = f(arr); _ = float(np.asarray(s))
    print(f"{name}: {(time.time()-t)/iters*1e6:.0f} us/iter")
a32 = jnp.asarray(rng.integers(0, 1<<32, (2*1024*1024,), np.uint32))
af = jnp.asarray(rng.random((2*1024*1024,), np.float32))
run("u32 mul+add 8MB", a32, lambda v: v * jnp.uint32(3) + jnp.uint32(1))
run("f32 mul+add 8MB", af, lambda v: v * 3.0 + 1.0)
a32big = jnp.asarray(rng.integers(0, 1<<32, (16*1024*1024,), np.uint32))
run("u32 mul+add 64MB", a32big, lambda v: v * jnp.uint32(3) + jnp.uint32(1))
def chain(v):
    for i in range(20): v = v * jnp.uint32(2654435761) + jnp.uint32(i)
    return v
run("u32 20-chain 8MB", a32, chain)
