"""Helpers for running the reference test fixtures (blueprints, request
packets, golden outputs under /root/reference/test are reusable data)."""

import os

import numpy as np

from iyokan_tpu import packet as packet_mod
from iyokan_tpu.circuit.blueprint import Blueprint
from iyokan_tpu.engine.driver import Frontend

REF_TEST = "/root/reference/test"


def fixture(p):
    return os.path.join(REF_TEST, p)


def normalize(pkt: packet_mod.PlainPacket) -> dict:
    """test.rb's toml2packet normalization (test.rb:34-50): bytes resized to
    ceil(size/8), keyed by name."""
    def norm(d):
        out = {}
        for name, bits in d.items():
            byts = packet_mod.bytes_from_bits(bits)
            want_len = -(-len(bits) // 8)
            byts = byts + [0] * (want_len - len(byts))
            out[name] = {"size": len(bits), "bytes": byts}
        return out

    return {
        "cycles": pkt.num_cycles if pkt.num_cycles is not None else -1,
        "ram": norm(pkt.ram),
        "rom": norm(pkt.rom),
        "bits": norm(pkt.bits),
    }


def run_plain(blueprint_toml, in_toml, ncycles=-1, skip_reset=False):
    bp = Blueprint(fixture(blueprint_toml))
    req = packet_mod.PlainPacket.from_toml_file(fixture(in_toml))
    fe = Frontend("plain", bp, req)
    fe.go(ncycles, skip_reset=skip_reset)
    return fe.make_result_packet()


def assert_plain_golden(blueprint_toml, in_toml, out_toml, ncycles=-1):
    res = run_plain(blueprint_toml, in_toml, ncycles)
    want = packet_mod.PlainPacket.from_toml_file(fixture(out_toml))
    got_n, want_n = normalize(res), normalize(want)
    assert got_n == want_n, _diff(got_n, want_n)


def _diff(got, want):
    lines = []
    for key in ("cycles",):
        if got[key] != want[key]:
            lines.append(f"cycles: got {got[key]}, want {want[key]}")
    for sec in ("ram", "rom", "bits"):
        gk, wk = set(got[sec]), set(want[sec])
        if gk != wk:
            lines.append(f"{sec} keys: got {sorted(gk)}, want {sorted(wk)}")
        for name in gk & wk:
            if got[sec][name] != want[sec][name]:
                lines.append(
                    f"{sec}[{name}]: got {got[sec][name]}, "
                    f"want {want[sec][name]}"
                )
    return "mismatch:\n" + "\n".join(lines[:10])
