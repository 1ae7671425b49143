"""Plain-mode end-to-end runs over the reference's own test fixtures,
compared against its golden outputs (the test.rb registry, test.rb:385-548)."""

import pytest

from .fixtures import assert_plain_golden


def test_const_4bit_22():
    assert_plain_golden("config-toml/const-4bit.toml", "in/test22.in",
                        "out/test22.out", ncycles=1)


def test_addr_4bit_04():
    assert_plain_golden("config-toml/addr-4bit.toml", "in/test04.in",
                        "out/test04.out", ncycles=1)


def test_pass_addr_pass_4bit_04():
    assert_plain_golden("config-toml/pass-addr-pass-4bit.toml", "in/test04.in",
                        "out/test04.out", ncycles=1)


def test_addr_register_4bit_16():
    assert_plain_golden("config-toml/addr-register-4bit.toml", "in/test16.in",
                        "out/test16.out", ncycles=3)


def test_counter_4bit_13():
    assert_plain_golden("config-toml/counter-4bit.toml", "in/test13.in",
                        "out/test13.out", ncycles=3)


def test_div_8bit_05():
    assert_plain_golden("config-toml/div-8bit.toml", "in/test05.in",
                        "out/test05.out", ncycles=1)


def test_dff_reset_23():
    assert_plain_golden("config-toml/dff-reset.toml", "in/test23.in",
                        "out/test23.out", ncycles=1)


def test_rom_4_8_15():
    assert_plain_golden("config-toml/rom-4-8.toml", "in/test15.in",
                        "out/test15.out", ncycles=1)


def test_rom_7_32_12():
    assert_plain_golden("config-toml/rom-7-32.toml", "in/test12.in",
                        "out/test12.out", ncycles=1)


def test_ram_addr8bit_06():
    assert_plain_golden("config-toml/ram-addr8bit.toml", "in/test06.in",
                        "out/test06.out", ncycles=16)


def test_mux_ram_addr8bit_06():
    assert_plain_golden("config-toml/mux-ram-addr8bit.toml", "in/test06.in",
                        "out/test06.out", ncycles=16)


def test_ram_8_16_16_08():
    assert_plain_golden("config-toml/ram-8-16-16.toml", "in/test08.in",
                        "out/test08.out", ncycles=8)


def test_cahp_diamond_00():
    # plain mode runs to @finflag (ncycles = -1), reference golden at 8 cycles
    assert_plain_golden("config-toml/cahp-diamond.toml", "in/test00.in",
                        "out/test00-diamond.out")


def test_cahp_ruby_iyokanl1_09():
    assert_plain_golden("config-toml/cahp-ruby-iyokanl1.toml", "in/test09.in",
                        "out/test09-ruby.out")


@pytest.mark.slow
def test_cahp_diamond_mux_00():
    assert_plain_golden("config-toml/cahp-diamond-mux.toml", "in/test00.in",
                        "out/test00-diamond.out")


@pytest.mark.slow
def test_cahp_diamond_01_long():
    # (emerald's netlist is a missing large blob in the reference snapshot;
    # diamond exercises the same 346-cycle program, test.rb:405-406)
    assert_plain_golden("config-toml/cahp-diamond.toml", "in/test01.in",
                        "out/test01-diamond.out", ncycles=346)
