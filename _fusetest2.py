import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
def run(name, arr, body):
    f = jax.jit(lambda a: jax.lax.fori_loop(0, 64, lambda i, v: body(v), a))
    o = f(arr); _ = np.asarray(o).ravel()[0]
    t = time.time(); o = f(arr); _ = np.asarray(o).ravel()[0]
    print(f"{name}: {(time.time()-t)/64*1e6:.0f} us/iter")
a32 = jnp.asarray(rng.integers(0, 1<<32, (2*1024*1024,), np.uint32))
af = jnp.asarray(rng.random((2*1024*1024,), np.float32))
run("u32 mul+add 8MB", a32, lambda v: v * jnp.uint32(3) + jnp.uint32(1))
run("u32 add 8MB", a32, lambda v: v + jnp.uint32(1))
run("f32 mul+add 8MB", af, lambda v: v * 3.0 + 1.0)
a32big = jnp.asarray(rng.integers(0, 1<<32, (16*1024*1024,), np.uint32))
run("u32 mul+add 64MB", a32big, lambda v: v * jnp.uint32(3) + jnp.uint32(1))
run("i32 mul 8MB", a32.astype(jnp.int32), lambda v: v * jnp.int32(3) + jnp.int32(1))
