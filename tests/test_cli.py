"""CLI-level integration tests, mirroring the preface + chained-run tests of
the reference driver (test.rb:120-223, :487-513)."""

import os

import numpy as np
import pytest

from iyokan_tpu import packet as packet_mod
from iyokan_tpu.cli import iyokan_cli, packet_cli

from .fixtures import fixture, normalize


def _p2t(path) -> packet_mod.PlainPacket:
    return packet_mod.PlainPacket.load(path)


def test_toml2packet_roundtrip(tmp_path):
    pkt = tmp_path / "pkt"
    packet_cli.main(["toml2packet", "--in", fixture("in/test03.in"),
                     "--out", str(pkt)])
    got = _p2t(str(pkt))
    assert got.num_cycles == -1
    np.testing.assert_array_equal(got.bits["hoge"], [1, 0, 1])
    np.testing.assert_array_equal(got.bits["piyo"], [0, 0, 0])
    # packet -> toml -> packet is stable
    back = packet_mod.PlainPacket.from_toml(got.to_toml())
    assert normalize(back) == normalize(got)


def test_enc_dec_roundtrip(tmp_path, toy_sk):
    skf = tmp_path / "sk"
    toy_sk.save(str(skf))
    pkt = tmp_path / "pkt"
    packet_cli.main(["toml2packet", "--in", fixture("in/test00.in"),
                     "--out", str(pkt)])
    orig = _p2t(str(pkt))
    packet_cli.main(["enc", "--key", str(skf), "--in", str(pkt),
                     "--out", str(pkt)])
    packet_cli.main(["dec", "--key", str(skf), "--in", str(pkt),
                     "--out", str(pkt)])
    got = _p2t(str(pkt))
    assert normalize(got) == normalize(orig)


def test_convert_plain(tmp_path):
    """test.rb:170-193: field remapping between packets."""
    p0, p1, p2 = (str(tmp_path / f"p{i}") for i in range(3))
    packet_cli.main(["toml2packet", "--in", fixture("in/test00.in"), "--out", p0])
    packet_cli.main(["toml2packet", "--in", fixture("out/test08.out"), "--out", p1])
    packet_cli.main(["toml2packet", "--in", fixture("in/test03.in"), "--out", p2])
    packet_cli.main([
        "convert-plain", "-i", "a", p0, "-i", "b", p1, "-i", "c", p2,
        "--out", p2,
        "rom.foo = a.rom", "ram.bar = a.ramB", "bits.baz = b.rdata",
        "ram.hoge = b.target", "bits.piyo = c.hoge",
    ])
    got = _p2t(p2)
    want = packet_mod.PlainPacket.from_toml_file(fixture("in/test17.in"))
    got.num_cycles = want.num_cycles  # convert does not carry cycles
    assert normalize(got) == normalize(want)


def test_convert_tfhe(tmp_path, toy_sk):
    """test.rb:196-223: encrypted-packet field remapping."""
    skf = str(tmp_path / "sk")
    toy_sk.save(skf)
    p0, p1, p2 = (str(tmp_path / f"p{i}") for i in range(3))
    packet_cli.main(["toml2packet", "--in", fixture("in/test00.in"), "--out", p0])
    packet_cli.main(["toml2packet", "--in", fixture("out/test08.out"), "--out", p1])
    packet_cli.main(["toml2packet", "--in", fixture("in/test03.in"), "--out", p2])
    for p in (p0, p1, p2):
        packet_cli.main(["enc", "--key", skf, "--in", p, "--out", p])
    packet_cli.main([
        "convert", "-i", "a", p0, "-i", "b", p1, "-i", "c", p2,
        "--out", p2,
        "rom.foo = a.rom", "ram.bar = a.ramB", "bits.baz = b.rdata",
        "ram.hoge = b.target", "bits.piyo = c.hoge",
    ])
    packet_cli.main(["dec", "--key", skf, "--in", p2, "--out", p2])
    got = _p2t(p2)
    want = packet_mod.PlainPacket.from_toml_file(fixture("in/test17.in"))
    got.num_cycles = want.num_cycles
    # ROM entries decrypt with TRLWE padding to a polynomial multiple
    got.rom = {k: v[: len(want.rom[k])] for k, v in got.rom.items()}
    assert normalize(got) == normalize(want)


def test_plain_cli_run_and_chain(tmp_path):
    """plain-addr-addr-4bit-20 (test.rb:487-513): run, remap outputs to
    inputs, run again."""
    req, res = str(tmp_path / "req"), str(tmp_path / "res")
    packet_cli.main(["toml2packet", "--in", fixture("in/test20.in"),
                     "--out", req])
    iyokan_cli.main(["plain", "--blueprint",
                     fixture("config-toml/addr-4bit.toml"),
                     "-i", req, "-o", res, "-c", "1", "--quiet"])
    packet_cli.main(["convert-plain", "-o", req, "-i", "a", res,
                     "bits.A = a.out", "bits.B = a.out"])
    iyokan_cli.main(["plain", "--blueprint",
                     fixture("config-toml/addr-4bit.toml"),
                     "-i", req, "-o", res, "-c", "1", "--quiet"])
    got = _p2t(res)
    want = packet_mod.PlainPacket.from_toml_file(fixture("out/test20.out"))
    assert normalize(got) == normalize(want)


def test_dump_prefix(tmp_path):
    """cahp-diamond-dump-prefix-00 (test.rb:474-485): --dump-prefix packets."""
    req, res = str(tmp_path / "req"), str(tmp_path / "res")
    prefix = str(tmp_path / "dump")
    packet_cli.main(["toml2packet", "--in", fixture("in/test00.in"),
                     "--out", req])
    iyokan_cli.main(["plain", "--blueprint",
                     fixture("config-toml/cahp-diamond.toml"),
                     "-i", req, "-o", res, "-c", "8", "--quiet",
                     "--dump-prefix", prefix])
    dump7 = _p2t(prefix + "-7")
    assert dump7.num_cycles == 7
    np.testing.assert_array_equal(dump7.bits["finflag"], [0])
    assert list(dump7.bits["reg_x0"][:8]) == [0, 1, 0, 1, 0, 1, 0, 0]  # 42


def test_time_csv_and_progress(tmp_path, caplog):
    """--dump-time-csv-prefix emits real per-level seconds and
    --show-combinational-progress logs periodic gate-count lines
    (reference src/iyokan.hpp:128-278, src/iyokan_plain.cpp:42-46)."""
    import logging

    req, res = str(tmp_path / "req"), str(tmp_path / "res")
    prefix = str(tmp_path / "t")
    packet_cli.main(["toml2packet", "--in", fixture("in/test00.in"),
                     "--out", req])
    with caplog.at_level(logging.INFO, logger="iyokan"):
        iyokan_cli.main(["plain", "--blueprint",
                         fixture("config-toml/cahp-diamond.toml"),
                         "-i", req, "-o", res, "-c", "2",
                         "--dump-time-csv-prefix", prefix,
                         "--show-combinational-progress"])
    with open(prefix + "-1.csv") as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "cycle,level,bootstraps,seconds"
    body = [ln.split(",") for ln in lines[1:] if "total" not in ln]
    assert body and all(float(row[3]) >= 0.0 for row in body)  # real seconds
    assert any("gates evaluated" in r.message for r in caplog.records)
    # the chosen execution mode is logged once at go() start
    assert any("execution mode: plain" in r.getMessage()
               for r in caplog.records)


def test_execution_mode_logged(tmp_path, caplog, monkeypatch):
    """go() names the execution mode it actually chose, including WHY the
    multi-cycle scan degraded to per-cycle dispatch when an observation
    flag forces the slow path (round-3 verdict item 7)."""
    import logging

    req, res = str(tmp_path / "req"), str(tmp_path / "res")
    packet_cli.main(["toml2packet", "--in", fixture("in/test13.in"),
                     "--out", req])
    sk, ek = str(tmp_path / "sk"), str(tmp_path / "ek")
    packet_cli.main(["genkey", "--type", "tfhepp", "--params", "toy",
                     "--out", sk, "--seed", "0"])
    packet_cli.main(["genevalkey", "--in", sk, "--out", ek, "--seed", "1"])
    packet_cli.main(["enc", "--key", sk, "--in", req, "--out", req])
    monkeypatch.setenv("IYOKAN_FUSE_LEVELS", "all")
    with caplog.at_level(logging.INFO, logger="iyokan"):
        iyokan_cli.main(["tfhe", "--blueprint",
                         fixture("config-toml/counter-4bit.toml"),
                         "--evalkey", ek, "-i", req, "-o", res, "-c", "2",
                         "--dump-time-csv-prefix", str(tmp_path / "t")])
    msgs = [r.getMessage() for r in caplog.records]
    assert any("execution mode: whole-cycle fusion, per-cycle dispatch"
               in m and "--dump-time-csv-prefix" in m for m in msgs), msgs


def test_snapshot_resume(tmp_path):
    """Run diamond 4 cycles + snapshot, resume 4 more; equals one 8-cycle
    run (reference snapshot/resume, src/main.cpp:242-260)."""
    req, res1, res2 = (str(tmp_path / n) for n in ("req", "res1", "res2"))
    snap = str(tmp_path / "snap")
    packet_cli.main(["toml2packet", "--in", fixture("in/test00.in"),
                     "--out", req])
    iyokan_cli.main(["plain", "--blueprint",
                     fixture("config-toml/cahp-diamond.toml"),
                     "-i", req, "-o", res1, "-c", "4", "--quiet",
                     "--snapshot", snap])
    iyokan_cli.main(["plain", "--resume", snap, "-o", res2, "-c", "4",
                     "--quiet"])
    got = _p2t(res2)
    want = packet_mod.PlainPacket.from_toml_file(
        fixture("out/test00-diamond.out")
    )
    assert normalize(got) == normalize(want)
