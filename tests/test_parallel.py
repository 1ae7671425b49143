"""Multi-device sharded execution on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from iyokan_tpu import packet as packet_mod
from iyokan_tpu.circuit.blueprint import Blueprint
from iyokan_tpu.engine.driver import Frontend
from iyokan_tpu.parallel import mesh as mesh_mod

from .fixtures import fixture, normalize


@pytest.fixture
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = mesh_mod.make_mesh(8)
    mesh_mod.set_mesh(mesh)
    yield mesh
    mesh_mod.set_mesh(None)


def test_sharded_adder_matches_golden(mesh8, toy_sk, toy_ek):
    req = packet_mod.PlainPacket.from_toml_file(fixture("in/test04.in"))
    bp = Blueprint(fixture("config-toml/addr-4bit.toml"))
    fe = Frontend("tfhe", bp, req.encrypt(toy_sk, seed=5), eval_key=toy_ek)
    fe.go(1)
    got = fe.make_result_packet().decrypt(toy_sk)
    want = packet_mod.PlainPacket.from_toml_file(fixture("out/test04.out"))
    assert normalize(got) == normalize(want)


def test_sharded_ram_cycle(mesh8, toy_sk, toy_ek):
    """CMUX RAM read/write with the write fan-out sharded over the mesh."""
    import os

    req = packet_mod.PlainPacket(
        ram={"ramA": np.zeros(16, np.uint8)},
        bits={
            "addr": np.array([0, 1], np.uint8),
            "wren": np.array([1], np.uint8),
            "wdata": np.array([1, 0, 1, 1], np.uint8),
        },
    )
    bp = Blueprint(os.path.join(os.path.dirname(__file__),
                                "data/tiny-ram.toml"))
    fe = Frontend("tfhe", bp, req.encrypt(toy_sk, seed=6), eval_key=toy_ek)
    fe.go(1)
    res = fe.make_result_packet().decrypt(toy_sk)
    np.testing.assert_array_equal(res.ram["ramA"][2 * 4 : 3 * 4], [1, 0, 1, 1])
