"""End-to-end --mesh run with FOF snapshot output: the distributed
catalog reduction (fof/slab.compile_groups_slab_distributed) feeds the
PIG writer; parity vs the single-device run's catalog."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from shenqi_tpu.cli.genic_main import run_genic
from shenqi_tpu.cli.gadget_main import run_gadget
from shenqi_tpu.io.fofio import load_fof

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
"""


def test_mesh_fof_catalog_matches_single(tmp_path):
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))

    p1 = tmp_path / "p1.gadget"
    p1.write_text(GADGET_PARAM.format(out=out, outdir=out + "/single"))
    run_gadget(str(p1))
    p8 = tmp_path / "p8.gadget"
    p8.write_text(GADGET_PARAM.format(out=out, outdir=out + "/mesh8"))
    run_gadget(str(p8), mesh_devices=8)

    c1 = load_fof(os.path.join(out, "single", "PIG_000"))
    c8 = load_fof(os.path.join(out, "mesh8", "PIG_000"))
    m1 = np.sort(np.asarray(c1["Mass"]))
    m8 = np.sort(np.asarray(c8["Mass"]))
    assert len(m1) == len(m8) and len(m1) > 0
    np.testing.assert_allclose(m8, m1, rtol=5e-3)
    l1 = np.sort(np.asarray(c1["LengthByType"]).sum(axis=1))
    l8 = np.sort(np.asarray(c8["LengthByType"]).sum(axis=1))
    # group memberships agree up to rare boundary-force knife edges
    assert np.mean(l1 != l8) < 0.1


def test_mesh_procgrid_4x2_matches_mesh8(tmp_path):
    """--mesh 4x2 (2-D PM processor grid on the flat domain axis,
    petapm.cpp:217-255) runs the FULL product loop and tracks the
    --mesh 8 run: same planned snapshot, near-identical positions."""
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from shenqi_tpu.io.snapshot import read_snapshot
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))

    p8 = tmp_path / "p8.gadget"
    p8.write_text(GADGET_PARAM.format(out=out, outdir=out + "/mesh8"))
    run_gadget(str(p8), mesh_devices=8)
    p42 = tmp_path / "p42.gadget"
    p42.write_text(GADGET_PARAM.format(out=out,
                                       outdir=out + "/mesh4x2"))
    run_gadget(str(p42), mesh_devices=8, procgrid=(4, 2))

    h8, b8 = read_snapshot(os.path.join(out, "mesh8", "PART_000"))
    h42, b42 = read_snapshot(os.path.join(out, "mesh4x2",
                                          "PART_000"))
    assert h8.Time == pytest.approx(h42.Time, rel=1e-9)
    i8 = np.argsort(np.asarray(b8[1]["ID"]))
    i42 = np.argsort(np.asarray(b42[1]["ID"]))
    p_8 = np.asarray(b8[1]["Position"])[i8]
    p_42 = np.asarray(b42[1]["Position"])[i42]
    box = h8.BoxSize
    d = p_8 - p_42
    d -= box * np.round(d / box)
    disp = np.linalg.norm(d, axis=1)
    sep = box / 16
    # same trajectory to a tiny fraction of the mean separation (the
    # PM forces differ only by FFT layout summation order)
    assert np.median(disp) < 1e-3 * sep
    assert disp.max() < 3e-2 * sep
