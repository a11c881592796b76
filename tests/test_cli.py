"""End-to-end CLI test: genic paramfile -> IC -> gadget run -> outputs.

The miniature of the reference CI pipeline (run MP-GenIC, run MP-Gadget,
check outputs exist and parse)."""

import os
import numpy as np
import pytest

from shenqi_tpu.cli.genic_main import run_genic
from shenqi_tpu.cli.gadget_main import run_gadget
from shenqi_tpu.io.snapshot import read_snapshot
from shenqi_tpu.io.fofio import load_fof

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
OutputList = 0.125
TimeMax = 0.125
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


@pytest.mark.slow
def test_genic_gadget_pipeline(tmp_path):
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    icpath = run_genic(str(gp))
    assert os.path.isdir(icpath)

    hdr, blocks = read_snapshot(icpath)
    assert hdr.Time == pytest.approx(0.1)
    assert len(blocks[1]["Position"]) == 12 ** 3
    # velocities are z=9-scale peculiar: tens to hundreds of km/s
    v = np.linalg.norm(blocks[1]["Velocity"], axis=1)
    assert 1 < np.median(v) < 1000

    pp = tmp_path / "paramfile.gadget"
    pp.write_text(GADGET_PARAM.format(out=out))
    sim = run_gadget(str(pp))
    # one snapshot written at a=0.125
    snap = os.path.join(out, "output", "PART_000")
    assert os.path.isdir(snap)
    hdr2, blocks2 = read_snapshot(snap)
    assert hdr2.Time == pytest.approx(0.125, rel=1e-3)
    assert len(blocks2[1]["Position"]) == 12 ** 3
    # IDs preserved
    assert set(np.asarray(blocks2[1]["ID"])) == set(
        np.asarray(blocks[1]["ID"]))
    # power spectrum file written
    psfile = os.path.join(out, "output", "powerspectrum-0.1250.txt")
    assert os.path.exists(psfile)
    dat = np.loadtxt(psfile)
    assert dat.shape[1] == 4
    assert (dat[:, 1] > 0).all()
    # LastSnapNum bookkeeping
    with open(os.path.join(out, "output", "LastSnapNum.txt")) as f:
        assert int(f.read()) == 0

    # FOF postprocessing mode (RestartFlag 3)
    groups = run_gadget(str(pp), restart_flag=3, snapnum=0)
    pig = os.path.join(out, "output", "PIG_000")
    assert os.path.isdir(pig)
    cat = load_fof(pig)
    assert "Mass" in cat


GENIC_GAS = GENIC_PARAM.replace("ProduceGas = 0", "ProduceGas = 1"
                                ).replace("Ngrid = 12", "Ngrid = 8")

GADGET_GAS = GADGET_PARAM.replace("HydroOn = 0", "HydroOn = 1"
                                  ).replace("Nmesh = 24", "Nmesh = 16")


@pytest.mark.slow
def test_gas_pipeline(tmp_path):
    """genic ProduceGas=1 -> gadget HydroOn=1: the hydro example mini."""
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_GAS.format(out=out))
    icpath = run_genic(str(gp))
    hdr, blocks = read_snapshot(icpath)
    assert 0 in blocks and 1 in blocks
    assert len(blocks[0]["Position"]) == 8 ** 3

    pp = tmp_path / "paramfile.gadget"
    pp.write_text(GADGET_GAS.format(out=out))
    sim = run_gadget(str(pp))
    assert sim.gas is not None
    snap = os.path.join(out, "output", "PART_000")
    hdr2, blocks2 = read_snapshot(snap)
    assert hdr2.TotNumPart[0] == 8 ** 3
    assert hdr2.TotNumPart[1] == 8 ** 3
    g = blocks2[0]
    for name in ["SmoothingLength", "Density", "InternalEnergy",
                 "ElectronAbundance"]:
        assert name in g, name
        assert np.isfinite(np.asarray(g[name])).all()
    assert (np.asarray(g["Density"]) > 0).all()
    assert (np.asarray(g["InternalEnergy"]) > 0).all()


@pytest.mark.slow
def test_snapshot_with_fof_and_stats(tmp_path):
    """SnapshotWithFOF writes PIG_* alongside snapshots; stats files
    are produced per step."""
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))
    pp = tmp_path / "paramfile.gadget"
    pp.write_text(GADGET_PARAM.format(out=out)
                  + "\nSnapshotWithFOF = 1\nFOFSaveParticles = 1\n")
    run_gadget(str(pp))
    pig = os.path.join(out, "output", "PIG_000")
    assert os.path.isdir(pig)
    cat = load_fof(pig)
    assert "Mass" in cat
    # member particle blocks exist
    from shenqi_tpu.io.bigfile import BigFile
    bf = BigFile(pig)
    assert "1/GroupID" in bf
    gid = bf["1/GroupID"].read()
    if len(gid):
        assert (np.diff(gid) >= 0).all()  # group-contiguous ordering
    # stats files
    for fn in ["energy.txt", "cpu.txt"]:
        p = os.path.join(out, "output", fn)
        assert os.path.exists(p)
        assert len(open(p).read()) > 0


@pytest.mark.slow
def test_runtests_flag99(tmp_path):
    """RestartFlag 99: the built-in gravity accuracy test passes on a
    clustered snapshot (runtests.cpp analog; the reference runs this on
    a developed snapshot, not a lattice, because lattice short-range
    forces are pure cancellation noise)."""
    from shenqi_tpu.io.snapshot import SnapshotHeader, write_snapshot
    out = str(tmp_path)
    box = 64000.0
    rng = np.random.RandomState(5)
    n = 1200
    # clustered: gaussian blobs around random centers
    ncl = 12
    centers = rng.uniform(0, box, (ncl, 3))
    pos = (centers[rng.randint(ncl, size=n)]
           + rng.normal(0, box / 40, (n, 3))) % box
    hdr = SnapshotHeader(
        TotNumPart=np.array([0, n, 0, 0, 0, 0], np.uint64),
        MassTable=np.array([0, 10.0, 0, 0, 0, 0]),
        Time=0.5, BoxSize=box, Omega0=0.288, OmegaLambda=0.712,
        OmegaBaryon=0.0472, HubbleParam=0.7)
    icdir = os.path.join(out, "IC")
    os.makedirs(icdir, exist_ok=True)
    write_snapshot(os.path.join(icdir, "IC"), hdr, {1: {
        "Position": pos,
        "Velocity": np.zeros((n, 3), np.float32),
        "ID": np.arange(1, n + 1, dtype=np.uint64)}})
    pp = tmp_path / "paramfile.gadget"
    pp.write_text(GADGET_PARAM.format(out=out))
    res = run_gadget(str(pp), restart_flag=99)
    m, mx = res["open_vs_pair"]
    assert mx < 0.1
    m2, _ = res["tree_vs_open"]
    assert m2 < 0.05


@pytest.mark.slow
def test_genic_different_transfer(tmp_path):
    """DifferentTransferFunctions: baryon and CDM displacement fields
    differ (baryon transfer is suppressed below the CDM one at high k)
    while total mass and layout stay correct."""
    out = str(tmp_path)
    base = GENIC_PARAM.format(out=out).replace("Ngrid = 12",
                                               "Ngrid = 8")
    base = base.replace("ProduceGas = 0", "ProduceGas = 1")
    base = base.replace(
        "DifferentTransferFunctions = 0",
        "DifferentTransferFunctions = 1\n"
        "FileWithTransferFunction = "
        "/root/reference/examples/class_tk_99.dat\n"
        "FileWithInputSpectrum = "
        "/root/reference/examples/class_pk_99.dat")
    base = base.replace("Redshift = 9", "Redshift = 99")
    gp = tmp_path / "paramfile.genic"
    gp.write_text(base)
    icpath = run_genic(str(gp))
    hdr, blocks = read_snapshot(icpath)
    assert len(blocks[0]["Position"]) == 8 ** 3
    assert len(blocks[1]["Position"]) == 8 ** 3
    # species fields must differ (distinct transfer functions) but
    # remain the same order of magnitude
    v0 = np.linalg.norm(blocks[0]["Velocity"], axis=1)
    v1 = np.linalg.norm(blocks[1]["Velocity"], axis=1)
    assert not np.allclose(v0, v1)
    assert 0.3 < np.median(v0) / np.median(v1) < 3.0


def test_runpower_flag4(tmp_path):
    """RestartFlag 4 (runpower, gadget/main.cpp:106-119): power
    spectrum of a snapshot, no evolution."""
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))
    pp = tmp_path / "paramfile.gadget"
    pp.write_text(GADGET_PARAM.format(out=out))
    fn = run_gadget(str(pp), restart_flag=4)
    assert os.path.exists(fn)
    dat = np.loadtxt(fn)
    assert dat.shape[1] == 4 and (dat[:, 1] > 0).all()


def test_random_particle_offset_roundtrip(tmp_path):
    """The internal box shift (run.cpp:426-428) must be exactly
    subtracted in outputs: snapshots with and without the shift agree
    bit-for-bit in fixed point."""
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))
    pp = tmp_path / "paramfile.gadget"
    pp.write_text(GADGET_PARAM.format(out=out)
                  + "\nRandomParticleOffset = 8\n")
    p2 = tmp_path / "paramfile2.gadget"
    p2.write_text(GADGET_PARAM.format(out=out).replace(
        "output", "output2") + "\nRandomParticleOffset = 0\n")
    run_gadget(str(pp))
    run_gadget(str(p2))
    h1, b1 = read_snapshot(os.path.join(out, "output", "PART_000"))
    h2, b2 = read_snapshot(os.path.join(out, "output2", "PART_000"))
    o1 = np.argsort(b1[1]["ID"])
    o2 = np.argsort(b2[1]["ID"])
    d = b1[1]["Position"][o1] - b2[1]["Position"][o2]
    box = h1.BoxSize
    d = (d + box / 2) % box - box / 2
    # identical dynamics to fixed-point output resolution: the offset
    # only decorrelates tree OPENINGS; on this tiny test the walks
    # make identical accept decisions, so positions match to rounding
    assert np.abs(d).max() < 5e-4 * box


def test_neutrino_linear_response_run(tmp_path):
    """MassiveNuLinRespOn: the PM potential carries the delta_nu
    response, the history is saved with snapshots and restored on
    resume (neutrinos_lra.cpp + petaio_save_neutrinos analogs)."""
    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))
    pp = tmp_path / "paramfile.gadget"
    pp.write_text(GADGET_PARAM.format(out=out)
                  + "\nMassiveNuLinRespOn = 1\nMNue = 0.3\n")
    sim = run_gadget(str(pp))
    nt = sim.nu_table
    assert nt.delta_tot is not None
    assert nt.delta_tot.shape[1] >= 2, "history must accumulate"
    # particles carry only Omega_cb, so the response RAISES the
    # potential (1 + f_nu*delta_nu/delta_cdm >= 1), by LESS at small
    # scales where neutrinos free-stream -> relative suppression
    fac = nt.potential_factor(0.125, nt.delta_tot[:, -1])
    assert (fac >= 1.0 - 1e-9).all()
    assert fac[-1] < fac[0] - 1e-6, "no free-streaming suppression"
    onu = sim.CP.ONu.get_omega_nu_nopart(0.125) * 0.125 ** 3
    expect0 = 1 + onu / (sim.CP.Omega0
                         - sim.CP.ONu.get_omega_nu(1.0))
    assert abs(fac[0] - expect0) < 0.3 * (expect0 - 1)
    from shenqi_tpu.io.bigfile import BigFile
    snap = os.path.join(out, "output", "PART_000")
    assert "Neutrino/Deltas" in BigFile(snap)
    # resume restores the history
    sim2 = run_gadget(str(pp), restart_flag=1, max_steps=1)
    assert sim2.nu_table.delta_tot.shape[1] >= nt.delta_tot.shape[1]
