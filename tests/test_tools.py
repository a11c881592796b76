"""Analysis tools smoke tests (tools/ directory analogs)."""

import os
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _write_snap(path, n=500, seed=0, box=20000.0, jitter=0.0):
    from shenqi_tpu.io.snapshot import SnapshotHeader, write_snapshot
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0, box, (n, 3))
    vel = rng.normal(0, 50, (n, 3)).astype(np.float32)
    if jitter:
        pos = (pos + jitter) % box
    hdr = SnapshotHeader(
        TotNumPart=np.array([0, n, 0, 0, 0, 0], np.uint64),
        MassTable=np.array([0, 5.0, 0, 0, 0, 0]),
        Time=0.5, BoxSize=box, Omega0=0.3, OmegaLambda=0.7)
    write_snapshot(path, hdr, {1: {
        "Position": pos, "Velocity": vel,
        "ID": rng.permutation(n).astype(np.uint64) + 1}})
    return pos, vel


def _run(tool, *args):
    return subprocess.run(
        [sys.executable, os.path.join(TOOLS, tool), *map(str, args)],
        capture_output=True, text=True)


def test_compare_snap(tmp_path):
    a = str(tmp_path / "A")
    b = str(tmp_path / "B")
    _write_snap(a, seed=3)
    _write_snap(b, seed=3)
    r = _run("compare_snap.py", a, b, "--boxsize", 20000.0)
    assert r.returncode == 0, r.stderr
    assert "Position: max rel 0" in r.stdout
    # different snapshot fails
    _write_snap(str(tmp_path / "C"), seed=4)
    r2 = _run("compare_snap.py", a, str(tmp_path / "C"))
    assert r2.returncode != 0


def test_hmf_from_fof(tmp_path):
    import jax.numpy as jnp
    from shenqi_tpu.core.particles import float_to_ipos
    from shenqi_tpu.fof.fof import fof
    from shenqi_tpu.io.fofio import save_fof
    from shenqi_tpu.io.snapshot import SnapshotHeader
    box = 20000.0
    rng = np.random.RandomState(1)
    # a few dense clumps
    ncl, per = 6, 60
    centers = rng.uniform(0, box, (ncl, 3))
    pos = (centers.repeat(per, 0)
           + rng.normal(0, 30, (ncl * per, 3))) % box
    n = len(pos)
    sep = box / n ** (1 / 3)
    groups = fof(jnp.asarray(float_to_ipos(pos, box)),
                 np.zeros((n, 3), np.float32),
                 np.full(n, 2.0, np.float32),
                 np.ones(n, np.int8), np.ones(n, bool), box, sep,
                 linking_length=0.2, min_length=32)
    assert groups.ngroups >= ncl - 1
    hdr = SnapshotHeader(
        TotNumPart=np.array([0, n, 0, 0, 0, 0], np.uint64),
        MassTable=np.zeros(6), Time=0.5, BoxSize=box, Omega0=0.3,
        OmegaLambda=0.7)
    pig = str(tmp_path / "PIG_000")
    save_fof(pig, groups, hdr, 0.5)
    r = _run("hmffromfof.py", pig, "--bins", 10)
    assert r.returncode == 0, r.stderr
    rows = [l for l in r.stdout.splitlines() if not l.startswith("#")]
    tot = sum(int(l.split()[2]) for l in rows)
    assert tot == groups.ngroups


def test_read_bh_detail(tmp_path):
    from shenqi_tpu.utils.stats import bh_details
    fn = tmp_path / "det.bin"
    with open(fn, "wb") as f:
        for t in (0.4, 0.5):
            bh_details(f, t, np.array([11, 12], np.uint64),
                       np.array([1e-4, 2e-4], np.float32),
                       np.array([1e-6, 1e-6], np.float32),
                       np.array([0.1, 0.1], np.float32),
                       np.zeros((2, 3), np.float32),
                       np.zeros((2, 3), np.float32),
                       np.array([True, True]))
    out = tmp_path / "d.npz"
    r = _run("readBHdetail.py", str(fn), "--id", 11, "--npz", str(out))
    assert r.returncode == 0, r.stderr
    d = np.load(out)
    assert list(d["Time"]) == [0.4, 0.5]
    assert (d["ID"] == 11).all()


def test_convert_hdf5(tmp_path):
    h5py = pytest.importorskip("h5py")
    snap = str(tmp_path / "S")
    pos, vel = _write_snap(snap, n=200)
    out = str(tmp_path / "s.hdf5")
    r = _run("convert_bigfile_gadget_hdf5.py", snap, out)
    assert r.returncode == 0, r.stderr
    with h5py.File(out) as h5:
        assert h5["Header"].attrs["BoxSize"] == 20000.0
        assert h5["PartType1/Coordinates"].shape == (200, 3)
        assert h5["Header"].attrs["Redshift"] == pytest.approx(1.0)


def test_rebin_powerspectrum(tmp_path):
    k = np.logspace(-2, 0, 200)
    p = k ** -1.5
    n = np.full(200, 10)
    fn = tmp_path / "powerspectrum-0.5.txt"
    np.savetxt(fn, np.c_[k, p, n])
    r = _run("rebin_powerspectrum.py", str(fn), "--bins", 10)
    assert r.returncode == 0, r.stderr
    rows = np.array([[float(x) for x in l.split()]
                     for l in r.stdout.splitlines()])
    assert 5 <= len(rows) <= 10
    assert int(rows[:, 2].sum()) == 2000
    # rebinned spectrum follows the power law
    slope = np.polyfit(np.log(rows[:, 0]), np.log(rows[:, 1]), 1)[0]
    assert slope == pytest.approx(-1.5, abs=0.05)
