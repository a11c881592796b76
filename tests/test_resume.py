"""Resume equivalence: run A->C straight vs run A->B, checkpoint,
resume B->C (RestartFlag 1).  The final states must agree to the
precision of the snapshot round-trip (positions are exact fixed-point
reconstructions; velocities go through one f32 /atime *atime trip).
"""

import os

import numpy as np
import pytest

from shenqi_tpu.cli.genic_main import run_genic
from shenqi_tpu.cli.gadget_main import run_gadget
from shenqi_tpu.io.snapshot import read_snapshot

GENIC_PARAM = """
OutputDir = {out}/IC
FileBase = IC
Ngrid = 12
BoxSize = 64000
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

GADGET_COMMON = """
InitCondFile = {out}/IC/IC
OutputDir = {outdir}
Omega0 = 0.288
MassiveNuLinRespOn = 0
HydroOn = 0
CoolingOn = 0
StarformationOn = 0
DensityIndependentSphOn = 0
SnapshotWithFOF = 0
PartAllocFactor = 2.0
BlackHoleOn = 0
MetalReturnOn = 0
WindOn = 0
Nmesh = 24
RandomParticleOffset = 0
OutputList = 0.112,0.125
TimeMax = {tmax}
"""


@pytest.mark.slow
def test_resume_matches_straight_run(tmp_path):
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))

    # straight run to a=0.125
    pa = tmp_path / "pa.gadget"
    pa.write_text(GADGET_COMMON.format(out=out,
                                       outdir=out + "/runA",
                                       tmax="0.125"))
    run_gadget(str(pa))
    hdrA, blkA = read_snapshot(os.path.join(out, "runA", "PART_001"))

    # stop at the intermediate snapshot, then resume (RestartFlag 1
    # picks up LastSnapNum)
    pb1 = tmp_path / "pb1.gadget"
    pb1.write_text(GADGET_COMMON.format(out=out,
                                        outdir=out + "/runB",
                                        tmax="0.112"))
    run_gadget(str(pb1))
    assert os.path.isdir(os.path.join(out, "runB", "PART_000"))
    pb2 = tmp_path / "pb2.gadget"
    pb2.write_text(GADGET_COMMON.format(out=out,
                                        outdir=out + "/runB",
                                        tmax="0.125"))
    run_gadget(str(pb2), restart_flag=1)
    hdrB, blkB = read_snapshot(os.path.join(out, "runB", "PART_001"))

    assert hdrA.Time == pytest.approx(hdrB.Time, rel=1e-9)
    ia = np.argsort(np.asarray(blkA[1]["ID"]))
    ib = np.argsort(np.asarray(blkB[1]["ID"]))
    posA = np.asarray(blkA[1]["Position"])[ia]
    posB = np.asarray(blkB[1]["Position"])[ib]
    velA = np.asarray(blkA[1]["Velocity"])[ia]
    velB = np.asarray(blkB[1]["Velocity"])[ib]
    box = 64000.0
    dpos = np.abs(posA - posB)
    dpos = np.minimum(dpos, box - dpos)   # periodic
    # one f32 round-trip of velocities perturbs the post-resume
    # trajectory at the 1e-7 level; integrated over a few steps this
    # stays far below a softening length (~570 kpc/h here)
    assert np.max(dpos) < 1e-3 * box
    vscale = np.max(np.abs(velA)) + 1e-12
    assert np.max(np.abs(velA - velB)) < 2e-3 * vscale
