"""v3 fused blind-rotation kernel (ops/pallas_br3.py), interpret mode.

v3 rotates after decomposition (twiddle form), so outputs are not
bit-identical to the XLA path; correctness is asserted at the decrypt level
(truth tables) and at the phase level (noise within the step budget).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iyokan_tpu import gates
from iyokan_tpu.crypto import host, ops
from iyokan_tpu.crypto import polymul as pm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("IYOKAN_PALLAS_INTERPRET", "1")


@pytest.fixture()
def mxu_bk(toy, toy_ek, monkeypatch):
    """The v3 kernel consumes the MXUBackend prep1 key layout (PRIMES1,
    4-step slot order) -- on CPU the default backend is crt64, so prep the
    bootstrapping key explicitly with the int8-exact MXU configuration."""
    monkeypatch.setenv("IYOKAN_MM_DTYPE", "int8")
    pm._mm_dtypes.cache_clear()
    pm._use_full_fwd.cache_clear()
    be = pm.MXUBackend()
    bk = jax.jit(lambda b: be.prep1(b, toy))(jnp.asarray(toy_ek.bk))
    yield bk
    pm._mm_dtypes.cache_clear()
    pm._use_full_fwd.cache_clear()


@pytest.fixture()
def mxu_bku(toy, toy_ek, monkeypatch):
    """2-bit unrolled key ([n/2, 3*2l, 2, P, N]) in the MXU prep1 layout."""
    monkeypatch.setenv("IYOKAN_MM_DTYPE", "int8")
    pm._mm_dtypes.cache_clear()
    pm._use_full_fwd.cache_clear()
    be = pm.MXUBackend()
    p = toy
    bku = toy_ek.bku.reshape(toy_ek.bku.shape[0], 6 * p.l, 2, p.N)
    bk = jax.jit(lambda b: be.prep1(b, p))(jnp.asarray(bku))
    yield bk
    pm._mm_dtypes.cache_clear()
    pm._use_full_fwd.cache_clear()


@pytest.mark.parametrize("tw12", ["", "vpu"])
def test_br3_unrolled_truth_tables(toy, toy_sk, toy_dk, mxu_bku, rng,
                                   monkeypatch, tw12):
    """The M=3 kernel path (2-bit unrolled key, shared decomposition,
    three twiddle rows per step) bootstraps correctly -- with the a1+a2
    twiddle row fetched by one-hot matmul or derived on the VPU."""
    from iyokan_tpu.ops.pallas_br3 import blind_rotate_pallas3

    monkeypatch.setenv("IYOKAN_BR3_TW12", tw12)

    p = toy
    combos = [(0, 0), (0, 1), (1, 0), (1, 1)]
    kinds = [gates.NAND, gates.XOR]
    rows_a, rows_b, cas, cbs, ks = [], [], [], [], []
    for kind in kinds:
        ca, cb, k = gates.GATE_LIN[kind]
        for (a, b) in combos:
            rows_a.append(a); rows_b.append(b)
            cas.append(ca); cbs.append(cb); ks.append(k)
    A = jnp.asarray(host.encrypt_bits(toy_sk, np.array(rows_a), rng))
    B = jnp.asarray(host.encrypt_bits(toy_sk, np.array(rows_b), rng))

    pre = ops.gate_linear(A, B, jnp.asarray(cas, jnp.int32),
                          jnp.asarray(cbs, jnp.int32),
                          jnp.asarray(ks, jnp.int32), p)
    testv = jnp.full((p.N,), jnp.uint32(p.mu))
    acc = blind_rotate_pallas3(pre, mxu_bku, testv, p, block_g=8)
    t1 = ops.sample_extract(acc, 0)
    out = ops.keyswitch_10(t1, toy_dk.ksk_mat, p)

    ph = host.tlwe0_phase(toy_sk, np.asarray(out))
    got = (ph < (1 << 31)).astype(int)
    plain = {
        gates.NAND: lambda a, b: 1 - (a & b),
        gates.XOR: lambda a, b: a ^ b,
    }
    i = 0
    for kind in kinds:
        for (a, b) in combos:
            want = plain[kind](a, b)
            assert got[i] == want, (
                f"{gates.NAMES[kind]}({a},{b}) = {got[i]}, want {want}"
            )
            i += 1


def test_br3_gate_bootstrap_truth_tables(toy, toy_sk, toy_dk, mxu_bk, rng):
    from iyokan_tpu.ops.pallas_br3 import blind_rotate_pallas3

    p = toy
    combos = [(0, 0), (0, 1), (1, 0), (1, 1)]
    kinds = [gates.NAND, gates.XOR, gates.OR, gates.ANDNOT]
    rows_a, rows_b, cas, cbs, ks = [], [], [], [], []
    for kind in kinds:
        ca, cb, k = gates.GATE_LIN[kind]
        for (a, b) in combos:
            rows_a.append(a); rows_b.append(b)
            cas.append(ca); cbs.append(cb); ks.append(k)
    A = jnp.asarray(host.encrypt_bits(toy_sk, np.array(rows_a), rng))
    B = jnp.asarray(host.encrypt_bits(toy_sk, np.array(rows_b), rng))

    pre = ops.gate_linear(A, B, jnp.asarray(cas, jnp.int32),
                          jnp.asarray(cbs, jnp.int32),
                          jnp.asarray(ks, jnp.int32), p)
    testv = jnp.full((p.N,), jnp.uint32(p.mu))
    acc = blind_rotate_pallas3(pre, mxu_bk, testv, p, block_g=8)
    t1 = ops.sample_extract(acc, 0)
    out = ops.keyswitch_10(t1, toy_dk.ksk_mat, p)

    ph = host.tlwe0_phase(toy_sk, np.asarray(out))
    got = (ph < (1 << 31)).astype(int)
    plain = {
        gates.NAND: lambda a, b: 1 - (a & b),
        gates.XOR: lambda a, b: a ^ b,
        gates.OR: lambda a, b: a | b,
        gates.ANDNOT: lambda a, b: a & (1 - b),
    }
    i = 0
    for kind in kinds:
        for (a, b) in combos:
            want = plain[kind](a, b)
            assert got[i] == want, (
                f"{gates.NAMES[kind]}({a},{b}) = {got[i]}, want {want}"
            )
            i += 1


def test_br3_phase_noise(toy, toy_sk, toy_dk, mxu_bk, rng):
    """Phase error after the v3 rotation stays well inside the 1/16 budget
    (the decompose-first trick doubles per-step variance, ~sqrt(2) sigma)."""
    from iyokan_tpu.ops.pallas_br3 import blind_rotate_pallas3

    p = toy
    bits = rng.integers(0, 2, 16, dtype=np.uint8)
    ct = jnp.asarray(host.encrypt_bits(toy_sk, bits, rng))
    testv = jnp.full((p.N,), jnp.uint32(p.mu))
    acc = blind_rotate_pallas3(ct, mxu_bk, testv, p, block_g=8)
    ph = host.trlwe1_phase(toy_sk, np.asarray(acc))[:, 0].astype(np.int64)
    # phase should be near +-mu: error = distance from the ideal point
    ideal = np.where(bits == 1, p.mu, (1 << 32) - p.mu).astype(np.int64)
    err = np.abs(((ph - ideal + (1 << 31)) % (1 << 32)) - (1 << 31))
    assert err.max() < (1 << 32) / 16.0
