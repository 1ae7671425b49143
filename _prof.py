import time, numpy as np, jax, jax.numpy as jnp
from iyokan_tpu import params as P
from iyokan_tpu.crypto import polymul, ops
p = P.CGGI128
G = 1024
tabs = polymul.tables(p.N, polymul.PRIMES1)
rng = np.random.default_rng(0)
acc = jnp.asarray(rng.integers(0, 1<<32, (G,2,p.N), np.uint32))
digits = jnp.asarray(rng.integers(-32, 32, (G, 6, p.N), np.int32))
dn0 = jnp.asarray(rng.integers(-9216, 9216, (G, 6, p.N), np.int32))
bk = jnp.asarray(rng.integers(-9216, 9216, (6, 2, 8, p.N), np.int32))
r = jnp.asarray(rng.integers(0, 2048, (G,), np.int32))
STEPS = 64  # loop count to amortize

def timeit(f, *a):
    o = jax.jit(f)(*a); jax.block_until_ready(o); _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
    t = time.time()
    o = jax.jit(f)(*a); jax.block_until_ready(o); _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
    return (time.time()-t) / STEPS

def loop(body):
    def f(x, *a):
        return jax.lax.fori_loop(0, STEPS, lambda i, v: body(v, *a), x)
    return f

# (a) rot + decompose only
def rot_dec(acc, r):
    rot = ops.rot_poly(acc, jnp.broadcast_to(r[:, None], (G, 2)), p.N)
    d = ops.decompose1(rot - acc, p)
    return acc + d[:, :2, :].astype(jnp.uint32)
print(f"rot+decomp: {timeit(loop(rot_dec), acc, r)*1e3:.2f} ms/step")

# (b) fwd NTT of digits (both primes)
def fwd(digits):
    outs = [polymul._fwd(digits, p.N, tab, True) for tab in tabs]
    return (digits + outs[0] + outs[1])
print(f"fwd ntt x2: {timeit(loop(fwd), digits)*1e3:.2f} ms/step")

# (c) pointwise 8 sets + sum
def pw(dn0, bk):
    tot = None
    for l in range(4):
        for pi, tab in enumerate(tabs):
            g = bk[:, :, pi*4+l, :]
            prod = dn0[:, :, None, :] * g
            s = polymul.center_reduce(prod.sum(axis=1, dtype=jnp.int32), tab.p)
            tot = s if tot is None else tot + s
    return dn0 + tot[:, :, :]
print(f"pointwise x8: {timeit(loop(pw), dn0, bk)*1e3:.2f} ms/step")

# (d) inverse NTT x16
def inv(dn0):
    s = dn0[:, :2, :]
    outs = []
    for l in range(4):
        for pi, tab in enumerate(tabs):
            outs.append(polymul._inv(s, p.N, tab))
    return dn0 + sum(outs)[:, :, :]
print(f"inv ntt x8(2pol): {timeit(loop(inv), dn0)*1e3:.2f} ms/step")
