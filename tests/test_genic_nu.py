"""Neutrino particle species in genic (genic/main.cpp:87-98,200-231).

Checks the compute_mass split (CDM excludes Omega_nu whenever MNu>0),
the Fermi-Dirac thermal velocities with the (1+z)-scaled cap, and the
FractionNuInParticles header.
"""

import numpy as np
import pytest

from shenqi_tpu.cli.genic_main import run_genic
from shenqi_tpu.io.snapshot import read_snapshot

PARAM = """
OutputDir = {out}/IC
FileBase = IC
Ngrid = 12
NgridNu = 6
BoxSize = 300000
Omega0 = 0.288
OmegaLambda = 0.712
OmegaBaryon = 0.0472
ProduceGas = 0
HubbleParam = 0.7
Redshift = 99
MNue = 0.133333333333
MNum = 0.133333333333
MNut = 0.133333333333
FileWithInputSpectrum = /root/reference/examples/neutrinos/class_pk_nu_99.dat
FileWithTransferFunction = /root/reference/examples/neutrinos/class_tk_nu_99.dat
DifferentTransferFunctions = 1
UsePeculiarVelocity = 1
Seed = 181170
UnitaryAmplitude = 1
"""


@pytest.mark.slow
def test_genic_neutrino_species(tmp_path):
    p = tmp_path / "p.genic"
    p.write_text(PARAM.format(out=str(tmp_path)))
    path = run_genic(str(p))
    hdr, blocks = read_snapshot(path)
    assert sorted(blocks) == [1, 2]
    assert len(blocks[2]["Position"]) == 6 ** 3

    # mass split: Mnu_particles/Mcdm = nufrac*Omega_nu/(Omega0-Onu)
    from shenqi_tpu.cosmology import Cosmology
    from shenqi_tpu.utils.units import default_units
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712,
                   OmegaBaryon=0.0472, HubbleParam=0.7, RadiationOn=1,
                   MNu=(0.133333333333,) * 3)
    cp.init(0.01, default_units())
    onu = cp.ONu.get_omega_nu(1.0)
    nufrac = float(np.asarray(
        hdr.extra["FractionNuInParticles"])[0]) \
        if "FractionNuInParticles" in hdr.extra else 1.0
    got = (hdr.MassTable[2] * 6 ** 3) / (hdr.MassTable[1] * 12 ** 3)
    want = nufrac * onu / (0.288 - onu)
    assert got == pytest.approx(want, rel=1e-3)
    assert 0.99 < nufrac <= 1.0

    # thermal velocities ~0.1c at z=99 for 0.13 eV, capped at
    # 5000*(1+z) km/s
    v = np.linalg.norm(blocks[2]["Velocity"], axis=1)
    assert np.median(v) > 3e4                 # >0.1c in km/s
    assert v.max() <= 5000 * 100 * 1.001
    # DM thermal-free velocities are far smaller
    v1 = np.linalg.norm(blocks[1]["Velocity"], axis=1)
    assert np.median(v1) < 300
