"""Plain-bit levelized executor.

The functional-reference backend: identical circuit semantics to the TFHE
engine, computed on raw bits (the role of the reference's plain backend,
src/iyokan_plain.hpp).  State is a single uint8 value array indexed by node
id plus one store per built-in CMUX memory; each cycle is a jitted sweep over
the precompiled levels.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.compile import Compiled

State = Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]  # (vals, ram stores)


def _pack_addr(vals: jnp.ndarray, addr_nodes) -> jnp.ndarray:
    bits = vals[np.asarray(addr_nodes, np.int32)]
    weights = jnp.asarray(
        (1 << np.arange(len(addr_nodes))).astype(np.int32)
    )
    return jnp.sum(bits.astype(jnp.int32) * weights)


class PlainEngine:
    def __init__(self, compiled: Compiled):
        self.c = compiled
        self.d = compiled.design
        self._settle = jax.jit(self._settle_impl)
        self._tick = jax.jit(self._tick_impl)

    # ------------------------------------------------------------------ #
    def init_vals(self) -> jnp.ndarray:
        vals = jnp.zeros(self.c.num_nodes, jnp.uint8)
        if len(self.c.const_nodes):
            vals = vals.at[self.c.const_nodes].set(
                self.c.const_vals.astype(np.uint8)
            )
        return vals

    def set_nodes(self, vals, nodes, bits) -> jnp.ndarray:
        idx = np.asarray(nodes, np.int32)
        return vals.at[idx].set(
            jnp.asarray(np.asarray(bits).astype(np.uint8))
        )

    # plain engine: "constant bits" and external values are the same thing
    set_const_bits = set_nodes

    def read_nodes(self, vals, nodes) -> np.ndarray:
        arr = np.asarray(vals)
        idx = np.array([0 if n is None else n for n in nodes], np.int32)
        out = arr[idx]
        missing = np.array([n is None for n in nodes], bool)
        out[missing] = 0
        return out

    def make_rom_store(self, name, addr_width, data_width, data):
        shape = (1 << addr_width, data_width)
        if data is None:
            return jnp.zeros(shape, jnp.uint8)
        data = np.asarray(data, np.uint8)
        if data.size != shape[0] * shape[1]:
            raise ValueError("invalid request packet: wrong length of ROM")
        return jnp.asarray(data.reshape(shape))

    def make_ram_store(self, name, addr_width, data_width, data):
        shape = (1 << addr_width, data_width)
        if data is None:
            return jnp.zeros(shape, jnp.uint8)
        data = np.asarray(data, np.uint8)
        if data.size != shape[0] * shape[1]:
            raise ValueError("invalid request packet: wrong length of RAM")
        return jnp.asarray(data.reshape(shape))

    def read_ram_store(self, store) -> np.ndarray:
        return np.asarray(store).reshape(-1)

    def block_until_ready(self, vals):
        vals.block_until_ready()

    def _tick_impl(self, vals: jnp.ndarray) -> jnp.ndarray:
        """All DFFs latch input -> output simultaneously
        (reference TaskDFF::tick, src/iyokan.hpp:1395-1402)."""
        if len(self.c.tick_dst) == 0:
            return vals
        return vals.at[self.c.tick_dst].set(vals[self.c.tick_src])

    def tick(self, vals):
        return self._tick(vals)

    # ------------------------------------------------------------------ #
    def _settle_impl(self, vals, rams, roms):
        for plan in self.c.levels:
            vals = self._level_impl(vals, rams, roms, plan)
        return vals, self._ram_writes_impl(vals, rams)

    def _level_impl(self, vals, rams, roms, plan):
        one = jnp.uint8(1)
        outs = []
        ids = []
        if len(plan.bin_out):
            a = vals[plan.bin_a]
            b = vals[plan.bin_b]
            stack = jnp.stack(
                [
                    a & b, one - (a & b), a & (one - b), a | b,
                    one - (a | b), a | (one - b), a ^ b, one - (a ^ b),
                ],
                axis=0,
            )
            res = jnp.take_along_axis(
                stack, plan.bin_kind[None, :].astype(jnp.int32), axis=0
            )[0]
            outs.append(res)
            ids.append(plan.bin_out)
        if len(plan.mux_out):
            a = vals[plan.mux_a]
            b = vals[plan.mux_b]
            s = vals[plan.mux_s]
            outs.append(jnp.where(s == 0, a, b))
            ids.append(plan.mux_out)
        if len(plan.not_out):
            outs.append(one - vals[plan.not_src])
            ids.append(plan.not_out)
        if len(plan.copy_out):
            outs.append(vals[plan.copy_src])
            ids.append(plan.copy_out)
        for name in plan.rom_reads:
            inst = self.d.rom_insts[name]
            addr = _pack_addr(vals, inst.addr_nodes)
            word = jax.lax.dynamic_index_in_dim(
                roms[name], addr, keepdims=False
            )
            outs.append(word)
            ids.append(np.asarray(inst.read_nodes, np.int32))
        for name in plan.ram_reads:
            inst = self.d.ram_insts[name]
            addr = _pack_addr(vals, inst.addr_nodes)
            word = jax.lax.dynamic_index_in_dim(
                rams[name], addr, keepdims=False
            )
            outs.append(word)
            ids.append(np.asarray(inst.read_nodes, np.int32))
        if outs:
            vals = vals.at[np.concatenate(ids)].set(
                jnp.concatenate(outs)
            )
        return vals

    def _ram_writes_impl(self, vals, rams):
        # end-of-settle RAM writes (read-before-write by construction)
        new_rams = {}
        for name, inst in self.d.ram_insts.items():
            ram = rams[name]
            addr = _pack_addr(vals, inst.addr_nodes)
            wren = vals[inst.wren_node]
            wdata = vals[np.asarray(inst.wdata_nodes, np.int32)]
            cur = jax.lax.dynamic_index_in_dim(ram, addr, keepdims=False)
            new_word = jnp.where(wren != 0, wdata, cur)
            new_rams[name] = jax.lax.dynamic_update_index_in_dim(
                ram, new_word, addr, axis=0
            )
        return new_rams

    def settle(self, vals, rams, roms, timer=None, progress=None):
        """timer: list collecting per-level seconds (opt-in profiling path:
        one jit per level instead of the fused sweep -- the reference's
        ProgressGraphMaker is likewise allocated only when a dump flag is
        set, src/iyokan_plain.cpp:458-461).  progress: callable(n_done)."""
        if timer is None and progress is None:
            return self._settle(vals, rams, roms)
        import time

        for lv, plan in enumerate(self.c.levels):
            t0 = time.time()
            vals = self._level_fn(lv)(vals, rams, roms)
            np.asarray(vals[0])  # force execution for honest timing
            if timer is not None:
                timer.append(time.time() - t0)
            if progress is not None:
                progress(plan.n_gates)
        new_rams = self._ram_write_fn()(vals, rams)
        return vals, new_rams

    def _level_fn(self, lv):
        key = ("level", lv)
        if not hasattr(self, "_prof_fns"):
            self._prof_fns = {}
        if key not in self._prof_fns:
            plan = self.c.levels[lv]
            self._prof_fns[key] = jax.jit(
                lambda vals, rams, roms, _p=plan:
                self._level_impl(vals, rams, roms, _p)
            )
        return self._prof_fns[key]

    def _ram_write_fn(self):
        if not hasattr(self, "_prof_fns"):
            self._prof_fns = {}
        if "ramw" not in self._prof_fns:
            self._prof_fns["ramw"] = jax.jit(self._ram_writes_impl)
        return self._prof_fns["ramw"]
