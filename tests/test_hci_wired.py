"""HCI wired into the run loops (hci.cpp polled at run.cpp:408).

The reference's test_hci drives the manager with override_now; here we
additionally certify the PRODUCT wiring: a `stop` file in the output
dir makes a real run checkpoint and exit cleanly, a `checkpoint` file
dumps and continues, and the dump is a valid RestartFlag-1 resume
point.  Uses the tiny dm-only CLI pipeline from test_cli.py.
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

GADGET_PARAM = """
InitCondFile = {out}/IC/IC
OutputDir = {out}/output
OutputList = 0.2
TimeMax = 0.2
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
"""


def _setup(tmp_path):
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))
    pp = tmp_path / "paramfile.gadget"
    pp.write_text(GADGET_PARAM.format(out=out))
    outdir = tmp_path / "output"
    outdir.mkdir(exist_ok=True)
    return pp, outdir


@pytest.mark.slow
def test_hci_stop_checkpoints_and_resumes(tmp_path):
    pp, outdir = _setup(tmp_path)
    # stop requested before the run starts: the first PM step polls
    # it (run.cpp:408), dumps a checkpoint, and breaks the loop
    (outdir / "stop").touch()
    sim = run_gadget(str(pp))
    assert sim.hci_exit == "stop"
    assert not (outdir / "stop").exists()       # consumed
    assert sim.atime() < 0.19                   # stopped early
    snap = outdir / "PART_000"
    assert snap.is_dir()
    hdr, blocks = read_snapshot(str(snap))
    assert hdr.Time == pytest.approx(sim.atime(), rel=1e-6)
    with open(outdir / "LastSnapNum.txt") as f:
        assert int(f.read()) == 0

    # the checkpoint is a valid resume point: RestartFlag 1 run
    # continues to TimeMax and writes the planned snapshot
    sim2 = run_gadget(str(pp), restart_flag=1)
    assert sim2.hci_exit == ""
    assert sim2.atime() == pytest.approx(0.2, rel=1e-3)
    snaps = sorted(d for d in os.listdir(outdir)
                   if d.startswith("PART_"))
    assert len(snaps) == 2                      # checkpoint + planned
    hdr2, _ = read_snapshot(str(outdir / snaps[-1]))
    assert hdr2.Time == pytest.approx(0.2, rel=1e-3)


@pytest.mark.slow
def test_hci_checkpoint_continues(tmp_path):
    pp, outdir = _setup(tmp_path)
    # `checkpoint` = dump and CONTINUE (hci.cpp:155-165)
    (outdir / "checkpoint").touch()
    sim = run_gadget(str(pp))
    assert sim.hci_exit == ""                   # ran to TimeMax
    assert sim.atime() == pytest.approx(0.2, rel=1e-3)
    snaps = sorted(d for d in os.listdir(outdir)
                   if d.startswith("PART_"))
    # unplanned early dump + the planned one at a=0.2
    assert len(snaps) == 2
    hdr0, _ = read_snapshot(str(outdir / snaps[0]))
    hdr1, _ = read_snapshot(str(outdir / snaps[1]))
    assert hdr0.Time < 0.19
    assert hdr1.Time == pytest.approx(0.2, rel=1e-3)


@pytest.mark.slow
def test_hci_terminate_immediate(tmp_path):
    pp, outdir = _setup(tmp_path)
    (outdir / "terminate").touch()
    sim = run_gadget(str(pp))
    assert sim.hci_exit == "terminate"
    # no checkpoint written (hci.cpp HCI_TERMINATE has no snapshot)
    assert not [d for d in os.listdir(outdir)
                if d.startswith("PART_")]
