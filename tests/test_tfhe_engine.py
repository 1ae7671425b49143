"""Encrypted end-to-end runs with toy parameters, checked against the plain
engine / reference goldens after decryption (the reference's test strategy:
encrypted variants assert on decrypted outputs, SURVEY.md section 4)."""

import os

import numpy as np
import pytest

from iyokan_tpu import packet as packet_mod
from iyokan_tpu.circuit.blueprint import Blueprint
from iyokan_tpu.engine.driver import Frontend

from .fixtures import fixture, normalize

DATA = os.path.join(os.path.dirname(__file__), "data")


def run_tfhe(bp_path, req_plain, ncycles, sk, ek):
    bp = Blueprint(bp_path)
    req = req_plain.encrypt(sk, seed=7)
    fe = Frontend("tfhe", bp, req, eval_key=ek)
    fe.go(ncycles)
    return fe.make_result_packet().decrypt(sk)


def run_plain(bp_path, req_plain, ncycles):
    bp = Blueprint(bp_path)
    fe = Frontend("plain", bp, req_plain)
    fe.go(ncycles)
    return fe.make_result_packet()


def test_tfhe_adder(toy_sk, toy_ek):
    req = packet_mod.PlainPacket.from_toml_file(fixture("in/test04.in"))
    got = run_tfhe(fixture("config-toml/addr-4bit.toml"), req, 1,
                   toy_sk, toy_ek)
    want = packet_mod.PlainPacket.from_toml_file(fixture("out/test04.out"))
    assert normalize(got) == normalize(want)


def test_tfhe_counter_with_reset(toy_sk, toy_ek):
    req = packet_mod.PlainPacket.from_toml_file(fixture("in/test13.in"))
    got = run_tfhe(fixture("config-toml/counter-4bit.toml"), req, 3,
                   toy_sk, toy_ek)
    want = packet_mod.PlainPacket.from_toml_file(fixture("out/test13.out"))
    assert normalize(got) == normalize(want)


def test_tfhe_cmux_rom(toy_sk, toy_ek):
    rom_bits = np.random.default_rng(3).integers(0, 2, 8 * 8, dtype=np.uint8)
    req = packet_mod.PlainPacket(
        rom={"rom": rom_bits},
        bits={"addr": np.array([1, 0, 1], np.uint8)},  # addr 5
    )
    bp_path = os.path.join(DATA, "tiny-rom.toml")
    got = run_tfhe(bp_path, req, 1, toy_sk, toy_ek)
    want = run_plain(bp_path, req, 1)
    np.testing.assert_array_equal(got.bits["rdata"], want.bits["rdata"])
    np.testing.assert_array_equal(got.bits["rdata"], rom_bits[5 * 8:(5 + 1) * 8])


def test_tfhe_cmux_ram(toy_sk, toy_ek):
    """Write 0b1011 to address 2 on cycle 1, read it back on cycle 2."""
    ram_bits = np.zeros(4 * 4, np.uint8)
    ram_bits[3 * 4 : 4 * 4] = [1, 1, 1, 1]  # address 3 preloaded with 0xf
    # cycle streams: width-majored circular inputs
    req = packet_mod.PlainPacket(
        ram={"ramA": ram_bits},
        bits={
            "addr": np.array([0, 1, 1, 1], np.uint8),   # cyc0: 2, cyc1: 3
            "wren": np.array([1, 0], np.uint8),          # write on cycle 0
            "wdata": np.array([1, 1, 0, 1, 0, 0, 0, 0], np.uint8),  # 0b1011
        },
    )
    bp_path = os.path.join(DATA, "tiny-ram.toml")
    got = run_tfhe(bp_path, req, 2, toy_sk, toy_ek)
    want = run_plain(bp_path, req, 2)
    assert normalize(got) == normalize(want)
    # cycle 1 reads address 3 = 0xf (preload); RAM now holds 1101 at addr 2
    np.testing.assert_array_equal(got.bits["rdata"], [1, 1, 1, 1])
    np.testing.assert_array_equal(got.ram["ramA"][2 * 4 : 3 * 4], [1, 1, 0, 1])


def test_settle_stage_breakdown(toy_sk, toy_ek):
    """settle(stages=...) accumulates per-category seconds (the breakdown
    tools/run_diamond_tfhe.py reports) without changing results."""
    bp = Blueprint(os.path.join(DATA, "tiny-ram.toml"))
    req = packet_mod.PlainPacket(
        bits={"addr": np.array([0, 1], np.uint8),
              "wren": np.array([0], np.uint8),
              "wdata": np.array([0, 0, 0, 0], np.uint8)},
    ).encrypt(toy_sk, seed=7)
    fe = Frontend("tfhe", bp, req, eval_key=toy_ek)
    stages = {}
    vals, rams = fe.engine.settle(fe.vals, fe.rams, fe.roms, stages=stages)
    assert "ram_write" in stages and "ram_read" in stages
    assert all(v >= 0 for v in stages.values())
    # the instrumented sweep computes the same values as the plain sweep
    vals2, _ = fe.engine.settle(fe.vals, fe.rams, fe.roms)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(vals2))


def test_whole_cycle_fusion_matches(toy_sk, toy_ek, monkeypatch):
    """IYOKAN_FUSE_LEVELS=all: the entire sweep + RAM write runs as ONE
    jitted call (TFHEEngine._cycle_fn) and produces the same results as
    the per-level path on a circuit exercising gates + CMUX RAM."""
    monkeypatch.setenv("IYOKAN_FUSE_LEVELS", "all")
    ram_bits = np.zeros(4 * 4, np.uint8)
    ram_bits[3 * 4 : 4 * 4] = [1, 1, 1, 1]
    req = packet_mod.PlainPacket(
        ram={"ramA": ram_bits},
        bits={
            "addr": np.array([0, 1, 1, 1], np.uint8),
            "wren": np.array([1, 0], np.uint8),
            "wdata": np.array([1, 1, 0, 1, 0, 0, 0, 0], np.uint8),
        },
    )
    bp_path = os.path.join(DATA, "tiny-ram.toml")
    got = run_tfhe(bp_path, req, 2, toy_sk, toy_ek)
    want = run_plain(bp_path, req, 2)
    assert normalize(got) == normalize(want)
    np.testing.assert_array_equal(got.bits["rdata"], [1, 1, 1, 1])
    np.testing.assert_array_equal(got.ram["ramA"][2 * 4 : 3 * 4], [1, 1, 0, 1])


def test_whole_cycle_fusion_rom(toy_sk, toy_ek, monkeypatch):
    monkeypatch.setenv("IYOKAN_FUSE_LEVELS", "all")
    rom_bits = np.random.default_rng(3).integers(0, 2, 8 * 8, dtype=np.uint8)
    req = packet_mod.PlainPacket(
        rom={"rom": rom_bits},
        bits={"addr": np.array([1, 0, 1], np.uint8)},
    )
    bp_path = os.path.join(DATA, "tiny-rom.toml")
    got = run_tfhe(bp_path, req, 1, toy_sk, toy_ek)
    np.testing.assert_array_equal(got.bits["rdata"], rom_bits[5 * 8:6 * 8])


def test_multi_cycle_scan_counter(toy_sk, toy_ek, monkeypatch):
    """With whole-cycle fusion on, cycles past the first run inside one
    lax.scan dispatch (driver scan path + engine.run_cycles); results
    match the plain engine over a multi-cycle run with DFF state."""
    monkeypatch.setenv("IYOKAN_FUSE_LEVELS", "all")
    monkeypatch.setenv("IYOKAN_SCAN_CHUNK", "2")
    req = packet_mod.PlainPacket.from_toml_file(fixture("in/test13.in"))
    bp_path = fixture("config-toml/counter-4bit.toml")
    got = run_tfhe(bp_path, req, 3, toy_sk, toy_ek)
    want = run_plain(bp_path, req, 3)
    assert normalize(got) == normalize(want)


def test_multi_cycle_scan_ram_and_inputs(toy_sk, toy_ek, monkeypatch):
    """Scan path with circular inputs changing per cycle and RAM state
    carried through the scan (write cycle 0, read cycles 1-2)."""
    monkeypatch.setenv("IYOKAN_FUSE_LEVELS", "all")
    monkeypatch.setenv("IYOKAN_SCAN_CHUNK", "2")
    ram_bits = np.zeros(4 * 4, np.uint8)
    ram_bits[3 * 4 : 4 * 4] = [1, 1, 1, 1]
    req = packet_mod.PlainPacket(
        ram={"ramA": ram_bits},
        bits={
            "addr": np.array([0, 1, 1, 1, 0, 1], np.uint8),  # 2, 3, 2
            "wren": np.array([1, 0, 0], np.uint8),
            "wdata": np.array([1, 1, 0, 1] + [0] * 8, np.uint8),
        },
    )
    bp_path = os.path.join(DATA, "tiny-ram.toml")
    got = run_tfhe(bp_path, req, 3, toy_sk, toy_ek)
    want = run_plain(bp_path, req, 3)
    assert normalize(got) == normalize(want)
    # cycle 2 reads back address 2 = the value written on cycle 0
    np.testing.assert_array_equal(got.bits["rdata"], [1, 1, 0, 1])


def test_periodic_ram_refresh_matches(toy_sk, toy_ek, monkeypatch):
    """IYOKAN_RAM_REFRESH_PERIOD > 1 skips the full-store refresh
    bootstrap on non-period cycles (the single most expensive stage of a
    RAM cycle) and keeps the CMUX-tree output as the store; decrypted
    results are identical to the legacy period-1 schedule.  4 cycles at
    period 3 exercises skip, refresh, and skip-after-refresh cycles."""
    ram_bits = np.zeros(4 * 4, np.uint8)
    ram_bits[3 * 4 : 4 * 4] = [1, 1, 1, 1]
    req = packet_mod.PlainPacket(
        ram={"ramA": ram_bits},
        bits={
            "addr": np.array([0, 1, 1, 1, 0, 1, 1, 0], np.uint8),
            "wren": np.array([1, 0, 0, 1], np.uint8),
            "wdata": np.array([1, 1, 0, 1] + [0] * 8 + [0, 1, 1, 0],
                              np.uint8),
        },
    )
    bp_path = os.path.join(DATA, "tiny-ram.toml")
    outs = []
    for period in ("1", "3"):
        monkeypatch.setenv("IYOKAN_RAM_REFRESH_PERIOD", period)
        got = run_tfhe(bp_path, req, 4, toy_sk, toy_ek)
        outs.append((normalize(got), got.ram["ramA"].tolist()))
    assert outs[0] == outs[1]


def test_periodic_ram_refresh_scan_path(toy_sk, toy_ek, monkeypatch):
    """The scan path threads the per-cycle refresh schedule through
    lax.scan as a traced flag (lax.cond in the body); a mixed
    skip/refresh span decrypts identically to period 1."""
    monkeypatch.setenv("IYOKAN_FUSE_LEVELS", "all")
    monkeypatch.setenv("IYOKAN_SCAN_CHUNK", "2")
    ram_bits = np.zeros(4 * 4, np.uint8)
    ram_bits[3 * 4 : 4 * 4] = [1, 1, 1, 1]
    req = packet_mod.PlainPacket(
        ram={"ramA": ram_bits},
        bits={
            "addr": np.array([0, 1, 1, 1, 0, 1], np.uint8),  # 2, 3, 2
            "wren": np.array([1, 0, 0], np.uint8),
            "wdata": np.array([1, 1, 0, 1] + [0] * 8, np.uint8),
        },
    )
    bp_path = os.path.join(DATA, "tiny-ram.toml")
    monkeypatch.setenv("IYOKAN_RAM_REFRESH_PERIOD", "2")
    got = run_tfhe(bp_path, req, 3, toy_sk, toy_ek)
    want = run_plain(bp_path, req, 3)
    assert normalize(got) == normalize(want)
    np.testing.assert_array_equal(got.bits["rdata"], [1, 1, 0, 1])


def test_chunked_bootstrap_matches(toy_sk, toy_ek, monkeypatch):
    """A tiny IYOKAN_BOOT_CHUNK forces every level's bootstrap through
    the power-of-two chunk decomposition (engine/tfhe.py
    _chunked_bootstrap); the decrypted run must match the golden
    exactly -- chunked dispatches are a pure reassociation."""
    monkeypatch.setenv("IYOKAN_BOOT_CHUNK", "16")
    req = packet_mod.PlainPacket.from_toml_file(fixture("in/test04.in"))
    got = run_tfhe(fixture("config-toml/addr-4bit.toml"), req, 1,
                   toy_sk, toy_ek)
    want = packet_mod.PlainPacket.from_toml_file(fixture("out/test04.out"))
    assert normalize(got) == normalize(want)
