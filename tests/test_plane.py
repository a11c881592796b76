"""Lensing potential plane tests (plane.cpp / lenstools.cpp analogs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.physics.plane import (PlaneParams,
                                      cut_plane_gaussian_grid,
                                      write_fits_plane,
                                      read_fits_plane, write_planes,
                                      omega_source)

BOX = 50000.0
RES = 64


def _cosmo():
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, RadiationOn=0, CMBTemperature=0.0)
    cp.init(TimeBegin=0.1, units=default_units())
    return cp


def test_uniform_density_gives_flat_potential():
    """A uniform particle lattice has zero density fluctuation ->
    potential identically ~0 (the DC mode is dropped)."""
    cp = _cosmo()
    n_side = 32
    g = (np.arange(n_side) + 0.5) * (BOX / n_side)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    active = np.ones(len(pos), bool)
    # resolution matches the lattice so every plane cell is identical
    pot, n_plane = cut_plane_gaussian_grid(
        pos, active, len(pos), 1e5, BOX, cp, 0.5, normal=2,
        center=BOX / 2, thickness=BOX, resolution=n_side)
    # all particles land on the plane
    assert int(n_plane) == len(pos)
    assert np.abs(np.asarray(pot)).max() < 1e-16


def test_overdensity_creates_potential_well():
    """A clustered slab produces a negative potential at the cluster
    (attractive well) and the lensing deflection points inward."""
    cp = _cosmo()
    rng = np.random.RandomState(0)
    nbg = 20000
    pos = rng.uniform(0, BOX, (nbg, 3)).astype(np.float64)
    # add a compact cluster at the plane center
    ncl = 4000
    cl = np.full((ncl, 3), BOX / 2) + rng.normal(0, 1500, (ncl, 3))
    pos = np.vstack([pos, cl % BOX])
    active = np.ones(len(pos), bool)
    chi = 3e5
    pot, n_plane = cut_plane_gaussian_grid(
        pos, active, len(pos), chi, BOX, cp, 0.5, normal=2,
        center=BOX / 2, thickness=BOX, resolution=RES)
    pot = np.asarray(pot)
    c = RES // 2
    # potential minimum at the cluster, higher far away
    assert pot[c, c] < pot[5, 5]
    assert pot[c, c] == pot.min() or \
        np.linalg.norm(np.subtract(np.unravel_index(pot.argmin(),
                                                    pot.shape),
                                   (c, c))) < 6
    # slab selection: half thickness drops background particles
    _, n_half = cut_plane_gaussian_grid(
        pos, active, len(pos), chi, BOX, cp, 0.5, normal=2,
        center=BOX / 2, thickness=BOX / 2, resolution=RES)
    assert int(n_half) < int(n_plane)


def test_omega_source_excludes_lin_resp_nu():
    cp = _cosmo()
    assert omega_source(cp, 0.5) == cp.Omega0


def test_fits_roundtrip(tmp_path):
    cp = _cosmo()
    data = np.arange(RES * RES, dtype=np.float64).reshape(RES, RES)
    data /= data.max()
    fn = str(tmp_path / "plane.fits")
    write_fits_plane(fn, data, cp, redshift=1.0,
                     comoving_distance=2e5, boxsize=BOX,
                     n_particles=12345,
                     unit_length_in_cm=3.085678e21)
    hdr, back = read_fits_plane(fn)
    assert hdr["SIMPLE"] == "T"
    assert int(hdr["NPART"]) == 12345
    assert float(hdr["Z"]) == pytest.approx(1.0)
    assert float(hdr["OMEGA_M"]) == pytest.approx(0.3)
    assert float(hdr["SIDE"]) == pytest.approx(50.0, rel=1e-6)
    assert np.abs(back - data).max() < 1e-6   # float32 storage
    # file is record-aligned (valid FITS structure)
    import os
    assert os.path.getsize(fn) % 2880 == 0

    # double output
    fn2 = str(tmp_path / "plane64.fits")
    write_fits_plane(fn2, data, cp, 1.0, 2e5, BOX, 1,
                     3.085678e21, double_out=True)
    _, back2 = read_fits_plane(fn2)
    assert np.array_equal(back2, data)


def test_write_planes_driver(tmp_path):
    cp = _cosmo()
    rng = np.random.RandomState(1)
    pos = rng.uniform(0, BOX, (5000, 3))
    par = PlaneParams(Resolution=32, Thickness=BOX / 2,
                      Normals=[0, 2])
    files = write_planes(3, 0.5, cp, pos, np.ones(5000, bool), BOX,
                         str(tmp_path), 1e5, 3.085678e21, par)
    # 2 cut points x 2 normals
    assert len(files) == 4
    for f in files:
        hdr, data = read_fits_plane(f)
        assert data.shape == (32, 32)
        assert np.isfinite(data).all()
