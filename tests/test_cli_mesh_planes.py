"""--mesh run with WritePlaneOn: lensing potential planes written
INSIDE the distributed loop (run.cpp:743-750, plane.cpp), matching the
single-device loop's FITS output bit-for-bit on the count grid (the
deposit is integer-exact; the host FFT half is the same f64 code)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from shenqi_tpu.cli.genic_main import run_genic
from shenqi_tpu.cli.gadget_main import run_gadget
from shenqi_tpu.physics.plane import read_fits_plane

GENIC_PARAM = """
OutputDir = {out}/IC
FileBase = IC
Ngrid = 16
BoxSize = 40000
Omega0 = 0.288
OmegaLambda = 0.712
OmegaBaryon = 0.0472
ProduceGas = 0
HubbleParam = 0.7
Redshift = 9
FileWithInputSpectrum = /root/reference/examples/dm-small/class_pk_9.dat
DifferentTransferFunctions = 0
UsePeculiarVelocity = 1
Seed = 181170
UnitaryAmplitude = 1
"""

GADGET_PARAM = """
InitCondFile = {out}/IC/IC
OutputDir = {outdir}
OutputList = 0.3
TimeMax = 0.3
Omega0 = 0.288
MassiveNuLinRespOn = 0
HydroOn = 0
CoolingOn = 0
StarformationOn = 0
DensityIndependentSphOn = 0
SnapshotWithFOF = 1
FOFHaloMinLength = 8
PartAllocFactor = 2.0
BlackHoleOn = 0
MetalReturnOn = 0
WindOn = 0
Nmesh = 32
WritePlaneOn = 1
PlaneResolution = 64
PlaneThickness = 20000
PlaneCutPoints = 10000,30000
PlaneNormals = 0,2
"""


def test_mesh_planes_match_single(tmp_path):
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))

    p1 = tmp_path / "single.gadget"
    p1.write_text(GADGET_PARAM.format(out=out,
                                      outdir=f"{out}/single"))
    run_gadget(str(p1))

    p2 = tmp_path / "mesh.gadget"
    p2.write_text(GADGET_PARAM.format(out=out, outdir=f"{out}/mesh"))
    run_gadget(str(p2), mesh_devices=8)

    names = [f"snap0_potentialPlane{ci}_normal{nm}.fits"
             for ci in (0, 1) for nm in (0, 2)]
    checked = 0
    for nm in names:
        f1 = os.path.join(out, "single", nm)
        f2 = os.path.join(out, "mesh", nm)
        assert os.path.exists(f2), f"mesh run did not write {nm}"
        if not os.path.exists(f1):
            continue
        h1, d1 = read_fits_plane(f1)
        h2, d2 = read_fits_plane(f2)
        assert d1.shape == d2.shape == (64, 64)
        # same deposit (integer-exact) + same host FFT half; the two
        # trajectories are independently evolved (single vs mesh), so
        # allow the trajectory-level tolerance the FOF e2e test uses
        scale = np.abs(d1).max() + 1e-300
        assert np.abs(d2 - d1).max() < 5e-2 * scale, nm
        assert int(h1["NPART"]) > 0
        checked += 1
    assert checked >= 2
