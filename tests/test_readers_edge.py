"""Reader/blueprint edge cases the reference handles explicitly."""

import io

import pytest

from iyokan_tpu.circuit import yosys
from iyokan_tpu.circuit.blueprint import Blueprint, _parse_ports
from iyokan_tpu.circuit.netlist import Design


def test_yosys_sdff_rejected():
    """$_SDFF_PP0_/1_ rejected with dfflegalize guidance
    (reference src/iyokan.hpp:2279-2302)."""
    src = """
    {"modules": {"m": {"ports": {}, "cells": {
        "c1": {"type": "$_SDFF_PP0_",
               "connections": {"D": [2], "Q": [3], "R": [4], "C": [5]}}
    }}}}
    """
    with pytest.raises(ValueError, match="dfflegalize"):
        yosys.read(Design(), io.StringIO(src))


def test_yosys_constant_output_bits():
    """Output bits driven by constants become CONSTONE/CONSTZERO
    (reference src/iyokan.hpp:2170-2193)."""
    src = """
    {"modules": {"m": {"ports": {
        "out": {"direction": "output", "bits": ["1", "0", 2]},
        "in":  {"direction": "input", "bits": [2]},
        "clock": {"direction": "input", "bits": [9]}
    }, "cells": {}}}}
    """
    d = Design()
    yosys.read(d, io.StringIO(src))
    # out[0] <- CONSTONE, out[1] <- CONSTZERO, out[2] <- in
    from iyokan_tpu import gates as G

    n0 = d.get("", "output", "out", 0)
    n1 = d.get("", "output", "out", 1)
    assert d.kinds[d.ins[n0][0]] == G.CONSTONE
    assert d.kinds[d.ins[n1][0]] == G.CONSTZERO


def test_yosys_constant_input_rejected():
    src = """
    {"modules": {"m": {"ports": {
        "in": {"direction": "input", "bits": ["1"]}
    }, "cells": {}}}}
    """
    with pytest.raises(ValueError, match="constant driver"):
        yosys.read(Design(), io.StringIO(src))


def test_port_string_parsing():
    ports = _parse_ports("core/io_romData[0:3]", "input")
    assert len(ports) == 4
    assert ports[2].node_name == "core"
    assert ports[2].port_name == "io_romData"
    assert ports[2].port_bit == 2
    single = _parse_ports("@finflag", "output")
    assert len(single) == 1 and single[0].node_name == ""


def test_blueprint_tognd(tmp_path):
    """TOGND records @port widths without creating edges
    (reference src/iyokan.hpp:1809-1825)."""
    f = tmp_path / "bp.toml"
    f.write_text(
        """
[connect]
TOGND = ["@unused[0:6]"]
"""
    )
    bp = Blueprint(str(f))
    assert bp.at_port_widths["unused"] == 7
    assert bp.edges == []


def test_blueprint_rejects_at_to_at(tmp_path):
    f = tmp_path / "bp.toml"
    f.write_text('[connect]\n"@a" = "@b"\n')
    with pytest.raises(ValueError, match="invalid connect"):
        Blueprint(str(f))


def test_iyokanl1_ram_cells_width_inferred():
    """Reference-style pre-minimized RAM netlists (mux-ram-*.min.json,
    reference src/iyokan.hpp:2595-2628) load as [[file]] entries: the RAM
    data width is inferred from the cells (max ramBit + 1)."""
    import json
    import os

    from iyokan_tpu.circuit import iyokanl1

    path = "/root/reference/src/mux-ram-8-8-8.min.json"
    if not os.path.exists(path):
        pytest.skip("reference blob not present")
    d = Design()
    with d.instance("ram"), open(path) as f:
        iyokanl1.read(d, f)
    # 2^8 addresses x 8 bits of registered RAM DFF cells
    for idx in (0, 123, 2047):
        assert d.maybe_get("ram", "ram", "ramdata", idx) is not None
    assert d.maybe_get("ram", "ram", "ramdata", 2048) is None
    d.check_valid()


def test_iyokanl1_tiny_ram_width():
    """Width inference on a hand-built 2-cell RAM netlist."""
    import io as _io
    import json

    from iyokan_tpu.circuit import iyokanl1

    net = {
        "cells": [
            {"type": "RAM", "id": 1, "ramAddress": 0, "ramBit": 0,
             "input": {"D": 2}, "output": [3]},
            {"type": "RAM", "id": 2, "ramAddress": 0, "ramBit": 2,
             "input": {"D": 1}, "output": []},
        ],
        "ports": [
            {"type": "output", "id": 3, "portName": "q", "portBit": 0,
             "bits": [1]},
        ],
    }
    d = Design()
    with d.instance("x"):
        iyokanl1.read(d, _io.StringIO(json.dumps(net)))
    # width inferred as 3 -> cell (addr 0, bit 2) registers at index 2
    assert d.maybe_get("x", "ram", "ramdata", 0) is not None
    assert d.maybe_get("x", "ram", "ramdata", 2) is not None
    assert d.maybe_get("x", "ram", "ramdata", 1) is None
