"""Snapshot/resume in TFHE mode (reference cereal whole-frontend snapshots,
src/iyokan_tfhepp.cpp:568-572; here: state dict = wire ciphertexts + RAM
stores + cycle counter)."""

import os

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


def test_tfhe_resume_wrong_key_rejected(tmp_path, toy, toy_sk, toy_ek):
    """Resuming against a different eval key must fail fast, not produce
    silent garbage (the reference serializes the whole frontend incl. the
    key context, src/iyokan_plain.cpp:557-561)."""
    import pytest

    from iyokan_tpu.crypto import host

    skf, ekf = str(tmp_path / "sk"), str(tmp_path / "ek")
    toy_sk.save(skf)
    toy_ek.save(ekf)

    req, res = str(tmp_path / "req"), str(tmp_path / "res")
    snap = str(tmp_path / "snap")
    packet_cli.main(["toml2packet", "--in", fixture("in/test13.in"),
                     "--out", req])
    packet_cli.main(["enc", "--key", skf, "--in", req, "--out", req])
    bp = fixture("config-toml/counter-4bit.toml")
    iyokan_cli.main(["tfhe", "--blueprint", bp, "--evalkey", ekf,
                     "-i", req, "-o", res, "-c", "1", "--quiet",
                     "--snapshot", snap])

    sk2 = host.keygen(toy, seed=777)
    ek2 = host.genevalkey(sk2, seed=778)
    ekf2 = str(tmp_path / "ek2")
    ek2.save(ekf2)
    with pytest.raises(SystemExit, match="eval key differs"):
        iyokan_cli.main(["tfhe", "--resume", snap, "--evalkey", ekf2,
                         "-o", res, "-c", "1", "--quiet"])


def test_resume_changed_blueprint_rejected(tmp_path):
    import shutil

    import pytest

    req, res = str(tmp_path / "req"), str(tmp_path / "res")
    snap = str(tmp_path / "snap")
    packet_cli.main(["toml2packet", "--in", fixture("in/test13.in"),
                     "--out", req])
    # blueprint file paths resolve relative to the blueprint, so mirror the
    # fixture layout in tmp (config-toml/ + sibling yosys-json/)
    (tmp_path / "config-toml").mkdir()
    (tmp_path / "yosys-json").symlink_to(
        os.path.dirname(fixture("yosys-json/counter-4bit-yosys.json"))
    )
    bp = str(tmp_path / "config-toml" / "bp.toml")
    shutil.copy(fixture("config-toml/counter-4bit.toml"), bp)
    iyokan_cli.main(["plain", "--blueprint", bp, "-i", req, "-o", res,
                     "-c", "1", "--quiet", "--snapshot", snap])
    with open(bp, "a") as f:
        f.write("\n# edited after snapshot\n")
    with pytest.raises(SystemExit, match="blueprint has changed"):
        iyokan_cli.main(["plain", "--resume", snap, "-o", res, "-c", "1",
                         "--quiet"])
