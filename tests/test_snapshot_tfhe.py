"""Snapshot/resume in TFHE mode (reference cereal whole-frontend snapshots,
src/iyokan_tfhepp.cpp:568-572; here: state dict = wire ciphertexts + RAM
stores + cycle counter)."""

import numpy as np

from iyokan_tpu import packet as packet_mod
from iyokan_tpu.cli import iyokan_cli, packet_cli
from iyokan_tpu.circuit.blueprint import Blueprint
from iyokan_tpu.engine.driver import Frontend

from .fixtures import fixture, normalize


def test_tfhe_snapshot_resume_cli(tmp_path, toy_sk, toy_ek):
    skf, ekf = str(tmp_path / "sk"), str(tmp_path / "ek")
    toy_sk.save(skf)
    toy_ek.save(ekf)

    req, res1, res2 = (str(tmp_path / x) for x in ("req", "res1", "res2"))
    snap = str(tmp_path / "snap")
    packet_cli.main(["toml2packet", "--in", fixture("in/test13.in"),
                     "--out", req])
    packet_cli.main(["enc", "--key", skf, "--in", req, "--out", req])

    bp = fixture("config-toml/counter-4bit.toml")
    iyokan_cli.main(["tfhe", "--blueprint", bp, "--evalkey", ekf,
                     "-i", req, "-o", res1, "-c", "2", "--quiet",
                     "--snapshot", snap])
    iyokan_cli.main(["tfhe", "--resume", snap, "--evalkey", ekf,
                     "-o", res2, "-c", "1", "--quiet"])
    packet_cli.main(["dec", "--key", skf, "--in", res2, "--out", res2])

    got = packet_mod.PlainPacket.load(res2)
    want = packet_mod.PlainPacket.from_toml_file(fixture("out/test13.out"))
    assert normalize(got) == normalize(want)
