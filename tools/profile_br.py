"""Per-stage microbenchmark of the blind-rotation inner loop on device.

Each stage of one CMUX step is timed alone inside a fori_loop of the same
trip count as production (n=635 for cggi128), so per-call dispatch overhead
is amortized identically.  Synchronization uses an on-device reduction plus
a tiny transfer (block_until_ready does not block through the axon tunnel).

Usage: python tools/profile_br.py [G] [steps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iyokan_tpu.crypto import ops, polymul
from iyokan_tpu.crypto.ops import u32
from iyokan_tpu.params import CGGI128


def sync(x):
    return float(jnp.asarray(x).ravel()[0:1].sum())


def timeit(fn, *args, reps=2):
    out = fn(*args)
    sync(out)  # compile + warm
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = CGGI128
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else p.n
    be = polymul.get_backend()
    rng = np.random.default_rng(0)
    RR = 2 * p.l

    acc = jnp.asarray(rng.integers(0, 1 << 32, (G, 2, p.N), dtype=np.uint64)
                      .astype(np.uint32))
    abar = jnp.asarray(rng.integers(0, 2 * p.N, (G, p.n)).astype(np.uint32))
    digits = jnp.asarray(
        rng.integers(-p.Bg // 2, p.Bg // 2, (G, RR, p.N)).astype(np.int32))
    bk = jnp.asarray(rng.integers(0, 1 << 32, (steps, RR, 2, p.N),
                                  dtype=np.uint64).astype(np.uint32))
    bkp = jax.jit(lambda b: be.prep1(b, p))(bk)
    tabs = polymul.tables(p.N, polymul.PRIMES1)

    def loop(body):
        def f(*args):
            def b(i, carry):
                return body(i, carry, *args[1:])
            return jax.lax.fori_loop(0, steps, b, args[0])
        return jax.jit(f)

    # 1. rotate + subtract + decompose
    def rd_body(i, a, ab):
        d = ops.decompose1(
            ops.rot_poly(a, jnp.broadcast_to(ab[:, i % p.n][:, None],
                                             a.shape[:-1]), p.N) - a, p)
        return a.at[0, 0, 0].add(d.sum(dtype=jnp.int32).astype(u32))
    rot_dec = loop(rd_body)
    t = timeit(rot_dec, acc, abar)
    print(f"rot+decompose : {t*1e3:8.1f} ms  ({t/steps*1e6:6.0f} us/step)")

    # 2. forward digit NTT (all primes)
    def fwd_body(i, d):
        outs = [polymul.fwd_digits(d, p.N, polymul.PRIMES1, pi, tab)
                for pi, tab in enumerate(tabs)]
        dep = sum(o.sum(dtype=jnp.int32) for o in outs)
        return d.at[0, 0, 0].add(dep)
    t = timeit(loop(fwd_body), digits)
    print(f"fwd digit NTT : {t*1e3:8.1f} ms  ({t/steps*1e6:6.0f} us/step)")

    # 3. pointwise j-sum (all primes), on precomputed dn
    dn = jax.jit(lambda d: jnp.stack(
        [polymul.fwd_digits(d, p.N, polymul.PRIMES1, pi, tab)
         for pi, tab in enumerate(tabs)], axis=0))(digits)  # [P, G, RR, N]

    def pw_body(i, dnv, bkpv):
        g = jax.lax.dynamic_index_in_dim(bkpv, i % steps, axis=0,
                                         keepdims=False)
        outs = []
        for pi, tab in enumerate(tabs):
            prod = dnv[pi][..., :, None, :] * g[..., :, :, pi, :]
            chunk = polymul._pointwise_chunk(tab.p)
            s = None
            for j0 in range(0, RR, chunk):
                part = prod[..., j0:j0 + chunk, :, :].sum(
                    axis=-3, dtype=jnp.int32)
                s = part if s is None else s + part
                s = polymul.center_reduce(s, tab.p)
            outs.append(s)
        dep = sum(o.sum(dtype=jnp.int32) for o in outs)
        return dnv.at[0, 0, 0, 0].add(dep)
    t = timeit(loop(pw_body), dn, bkp)
    print(f"pointwise     : {t*1e3:8.1f} ms  ({t/steps*1e6:6.0f} us/step)")

    # 4. inverse NTT (all primes) on [G, 2, N] residues
    sres = jax.jit(lambda: jnp.stack(
        [jnp.asarray(rng.integers(-(tab.p // 2), tab.p // 2 + 1,
                                  (G, 2, p.N)).astype(np.int32))
         for tab in tabs], axis=0))()

    def inv_body(i, sv):
        outs = [polymul._inv_dispatch(sv[pi], p.N, polymul.PRIMES1, pi, tab)
                for pi, tab in enumerate(tabs)]
        dep = sum(o.sum(dtype=jnp.int32) for o in outs)
        return sv.at[0, 0, 0, 0].add(dep)
    t = timeit(loop(inv_body), sres)
    print(f"inverse NTT   : {t*1e3:8.1f} ms  ({t/steps*1e6:6.0f} us/step)")

    # 5. garner CRT
    def gar_body(i, sv):
        z = polymul.garner_mod32([sv[pi] for pi in range(len(tabs))],
                                 tuple(t_.p for t_ in tabs))
        return sv.at[0, 0, 0, 0].add(z.sum().astype(jnp.int32))
    t = timeit(loop(gar_body), sres)
    print(f"garner CRT    : {t*1e3:8.1f} ms  ({t/steps*1e6:6.0f} us/step)")

    # 6. whole external product chain for reference
    def ep_body(i, a, d, bkpv):
        g = jax.lax.dynamic_index_in_dim(bkpv, i % steps, axis=0,
                                         keepdims=False)
        return a + be.extprod1(d, g, p)
    t = timeit(loop(ep_body), acc, digits, bkp)
    print(f"extprod chain : {t*1e3:8.1f} ms  ({t/steps*1e6:6.0f} us/step)")

    # 7. full blind rotation end to end
    tlwe = jnp.asarray(rng.integers(0, 1 << 32, (G, p.n + 1),
                                    dtype=np.uint64).astype(np.uint32))
    testv = jnp.full((p.N,), p.mu, u32)
    br = jax.jit(lambda t0, b: ops.blind_rotate(t0, b, testv, p))
    t = timeit(br, tlwe, bkp)
    print(f"blind rotate  : {t*1e3:8.1f} ms  ({t/p.n*1e6:6.0f} us/step)")


if __name__ == "__main__":
    main()
