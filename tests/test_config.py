"""Parameter registry / paramfile parser tests."""

import pytest

from shenqi_tpu.utils.config import (ParameterSet, ParamError, REQUIRED,
                                     OPTIONAL, build_output_list)


def make_ps():
    ps = ParameterSet()
    ps.declare_string("InitCondFile", REQUIRED, None, "IC path")
    ps.declare_double("Omega0", REQUIRED, None, "matter density")
    ps.declare_double("TimeMax", OPTIONAL, 1.0, "end time")
    ps.declare_int("HydroOn", OPTIONAL, 1, "enable hydro")
    ps.declare_string("OutputList", OPTIONAL, "", "output times")
    ps.declare_enum("ShortRangeForceWindowType",
                    {"exact": 0, "erfc": 1}, OPTIONAL, "exact", "window")
    return ps


GOOD = """
# comment line
InitCondFile = IC/IC   # trailing comment
Omega0 = 0.288
HydroOn = 0
OutputList = 0.5,0.2,1.0
"""


def test_parse_good():
    ps = make_ps()
    ps.parse_string(GOOD)
    assert ps.get_string("InitCondFile") == "IC/IC"
    assert ps.get_double("Omega0") == pytest.approx(0.288)
    assert ps.get_int("HydroOn") == 0
    assert ps.get_double("TimeMax") == 1.0  # default
    assert ps.get_enum("ShortRangeForceWindowType") == 0
    assert ps.is_set("Omega0")
    assert not ps.is_set("TimeMax")


def test_missing_required():
    ps = make_ps()
    with pytest.raises(ParamError, match="missing required"):
        ps.parse_string("Omega0 = 0.3")


def test_unknown_key_strict():
    ps = make_ps()
    with pytest.raises(ParamError, match="unknown parameter"):
        ps.parse_string(GOOD + "\nBogusKey = 1")
    # non-strict mode ignores unknown keys
    ps2 = make_ps()
    ps2.parse_string(GOOD + "\nBogusKey = 1", strict=False)
    assert ps2.get_double("Omega0") == pytest.approx(0.288)


def test_enum_values():
    ps = make_ps()
    ps.parse_string(GOOD + "\nShortRangeForceWindowType = erfc")
    assert ps.get_enum("ShortRangeForceWindowType") == 1
    with pytest.raises(ParamError, match="unknown enum"):
        ps.parse_string(GOOD + "\nShortRangeForceWindowType = bogus")


def test_output_list():
    assert build_output_list("0.5,0.2,1.0") == [0.2, 0.5, 1.0]
    assert build_output_list("") == []
    with pytest.raises(ParamError):
        build_output_list("-0.5")


def test_reference_paramfile_parses():
    """The actual dm-small reference paramfile should parse (non-strict)."""
    ps = make_ps()
    ps.parse_file("/root/reference/examples/dm-small/paramfile.gadget",
                  strict=False)
    assert ps.get_double("Omega0") == pytest.approx(0.288)
    assert ps.get_string("InitCondFile") == "IC/IC"
