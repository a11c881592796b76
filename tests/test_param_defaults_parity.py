"""Default-value parity with the reference parameter table.

The star-small example (and most reference paramfiles) leave the
physics knobs at their defaults, so OUR defaults must equal the
reference's (gadget/params.cpp) or runs silently diverge.  Round 5
found the SPH kernel default differing (cubic vs the reference's
quintic, params.cpp:43) — a systematic density-estimator difference
upstream of the eEOS and a prime candidate for the observed 5x
SF-onset excess at a=0.125.  This test pins every shared OPTIONAL
default that shapes the star-small physics to the reference value.
"""

from shenqi_tpu.cli.params import gadget_params


# (name, reference default, params.cpp line)
EXPECTED = [
    # SPH density estimator
    ("DensityKernelType", "quintic", 43),        # enum default string
    ("DensityResolutionEta", 1.0, 118),
    ("MaxNumNgbDeviation", 0.5, 121),
    ("DensityIndependentSphOn", 1, 116),
    ("MinGasTemp", 5.0, 170),
    ("InitGasTemp", -1.0, 169),
    # gravity / timestepping
    ("SplitGravityTimestepsOn", 1, None),
    ("ErrTolIntAccuracy", 0.02, None),
    ("CourantFac", 0.15, None),
    ("MaxSizeTimestep", 0.1, None),
    # black holes
    ("BlackHoleAccretionFactor", 100.0, None),
    ("BlackHoleEddingtonFactor", 2.1, None),
    ("BlackHoleFeedbackFactor", 0.05, None),
    ("BlackHoleNgbFactor", 2.0, 194),
    ("SeedBlackHoleMass", 2e-5, 190),
    ("BH_DynFrictionMethod", 1, 214),
    ("BH_DRAG", 1, 217),
    ("WriteBlackHoleDetails", 1, None),
    # star formation (eEOS)
    ("CritOverDensity", 57.7, None),
    ("CritPhysDensity", 0.0, None),
    ("FactorSN", 0.1, None),
    ("FactorEVP", 1000.0, None),
    ("TempSupernova", 1e8, None),
    ("TempClouds", 1000.0, None),
    ("MaxSfrTimescale", 1.5, None),
    ("Generations", 4, None),
    # helium / excursion-set reionization
    ("QSOMaxMass", 1000.0, 300),
    ("QSOMinMass", 100.0, 301),
    ("EscapeFractionNorm", 0.2, None),
    ("EscapeFractionScaling", 0.5, None),
    ("ReionSFRTimescale", 0.1, None),
    ("ReionRBubbleMax", 20340.0, None),
    ("ReionRBubbleMin", 406.8, None),
]


def test_reference_param_names_accepted():
    """The parser is strict (unknown key = error), so every parameter
    name the reference declares must be declared here too or real
    reference paramfiles fail to parse.  These names were undeclared
    until the round-5 compatibility pass."""
    ps = gadget_params()
    ps.parse_string("\n".join([
        "InitCondFile = IC", "Omega0 = 0.3", "BlackHoleOn = 0",
        "StarformationOn = 0", "CoolingOn = 0", "WindOn = 0",
        "MetalReturnOn = 0",
        # formerly-unknown reference names
        "GravitySoftening = 0.05",
        "FOFPrimaryLinkTypes = 2",
        "FOFSecondaryLinkTypes = 49",
        "BlackHoleKineticOn = 0",
        "HeliumHeatOn = 0",
        "MetalsSn1aN0 = 1.3e-3",
        "QSOHeIIIReionFinishFrac = 0.995",
        "BoostSFDenseGas = 1",
        "MaxWindFreeTravelTime = 60",
        "ExcursionSetZStart = 25",
        "TreeGravOn = 1",
        "MinGasHsmlFractional = 0.1",
    ]), strict=True)
    assert ps.is_set("GravitySoftening")
    assert ps.get_double("GravitySoftening") == 0.05


def test_defaults_match_reference():
    ps = gadget_params()
    bad = []
    for name, want, _line in EXPECTED:
        if name == "DensityKernelType":
            # enum: check via the default string's mapped behavior
            got = ps.get_enum(name)
            want_v = 1  # our enum table maps quintic -> 1
        else:
            try:
                got = ps.get_double(name)
            except (KeyError, TypeError, ValueError):
                got = ps.get_int(name)
            want_v = want
        if isinstance(want_v, float) or isinstance(got, float):
            ok = abs(float(got) - float(want_v)) < 1e-12 * max(
                1.0, abs(float(want_v)))
        else:
            ok = got == want_v
        if not ok:
            bad.append((name, want_v, got))
    assert not bad, f"defaults diverge from reference: {bad}"
