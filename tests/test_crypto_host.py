import numpy as np

from iyokan_tpu.crypto import host


def test_polymul_bin_u32_matches_reference(toy, rng):
    N = toy.N
    a = rng.integers(0, 1 << 32, (2, N), dtype=np.uint32)
    s = rng.integers(0, 2, N, dtype=np.uint8)
    want = host.negacyclic_conv_i64(a.astype(np.int64), s.astype(np.int64))
    got = host.polymul_bin_u32(a, s)
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_polymul_bin_u64_matches_reference(toy, rng):
    N = toy.N2
    a = rng.integers(0, 1 << 63, (2, N), dtype=np.uint64)
    s = rng.integers(0, 2, N, dtype=np.uint8)
    # reference via python ints (object) to avoid overflow
    aa = a.astype(object)
    want = np.zeros((2, N), dtype=object)
    for r in range(2):
        for i in range(N):
            if s[i]:
                for k in range(N):
                    j = (i + k) % N
                    sgn = 1 if i + k < N else -1
                    want[r, j] += sgn * int(aa[r, k])
    want = (want % (1 << 64)).astype(np.uint64)
    got = host.polymul_bin_u64(a, s)
    np.testing.assert_array_equal(got, want)


def test_tlwe_roundtrip(toy_sk, rng):
    bits = rng.integers(0, 2, 64, dtype=np.uint8)
    ct = host.encrypt_bits(toy_sk, bits, rng)
    dec = host.decrypt_bits(toy_sk, ct)
    np.testing.assert_array_equal(dec, bits)


def test_trivial_tlwe(toy, toy_sk):
    bits = np.array([0, 1, 1, 0], np.uint8)
    ct = host.trivial_tlwe0(toy, bits)
    np.testing.assert_array_equal(host.decrypt_bits(toy_sk, ct), bits)


def test_trlwe_roundtrip(toy, toy_sk, rng):
    msg = rng.integers(0, 2, (3, toy.N), dtype=np.uint8)
    mu = np.uint32(toy.mu)
    poly = np.where(msg, mu, np.uint32(0) - mu)
    ct = host.trlwe1_encrypt(toy_sk, poly, toy.alpha1, rng)
    ph = host.trlwe1_phase(toy_sk, ct)
    np.testing.assert_array_equal((ph < (1 << 31)).astype(np.uint8), msg)


def test_rom_ram_packing(toy_sk, rng):
    bits = rng.integers(0, 2, 1000, dtype=np.uint8)
    rom = host.encrypt_rom(toy_sk, bits, rng)
    np.testing.assert_array_equal(host.decrypt_rom(toy_sk, rom)[: bits.size], bits)
    ram = host.encrypt_ram(toy_sk, bits[:100], rng)
    np.testing.assert_array_equal(host.decrypt_ram(toy_sk, ram), bits[:100])


def test_trgsw_phase_structure(toy, toy_sk, rng):
    """TRGSW(m) rows decrypt to m*g_j (part b) and -m*s1*g_j (part a)."""
    for m in (0, 1):
        rows = host.trgsw1_encrypt(toy_sk, m, rng)
        ph = host.trlwe1_phase(toy_sk, rows)  # [2l, N]
        for j in range(toy.l):
            g = np.uint32(1 << (32 - (j + 1) * toy.Bgbit))
            # b-part row: message m*g_j in coeff 0
            err = (ph[toy.l + j, 0] - m * g).astype(np.int32)
            assert abs(int(err)) < 1 << 12
            # a-part row: message -m*g_j*s1
            want = (np.uint32(0) - m * g) * toy_sk.s1.astype(np.uint32)
            err = (ph[j] - want).astype(np.int32)
            assert np.abs(err).max() < 1 << 12
