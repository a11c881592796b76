"""PM gravity tests: CIC invariants + force vs independent f64 k-sum."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos, POS_SCALE
from shenqi_tpu.ops.cic import cic_deposit, cic_readout
from shenqi_tpu.gravity.pm import (PMConfig, pm_forces, measure_power,
                                   finalize_power)


BOX = 100.0
G = 43007.1  # internal units value (arbitrary for tests)


def test_cic_mass_conservation():
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, BOX, (500, 3))
    mass = rng.uniform(0.5, 2.0, 500).astype(np.float32)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    mesh = cic_deposit(ipos, jnp.asarray(mass), 16)
    assert float(mesh.sum()) == pytest.approx(mass.sum(), rel=1e-5)


def test_cic_grid_points_exact():
    """Particles exactly at grid points deposit into single cells."""
    n = 8
    idx = np.array([[1, 2, 3], [4, 5, 6], [0, 0, 0]])
    pos = idx * (BOX / n)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    mesh = np.asarray(cic_deposit(ipos, jnp.ones(3, jnp.float32), n))
    for i in idx:
        assert mesh[tuple(i)] == pytest.approx(1.0, abs=1e-5)
    assert mesh.sum() == pytest.approx(3.0, rel=1e-6)


def test_cic_readout_linear_field():
    """CIC readout of a (periodic-safe) linear-in-x field is exact away
    from the wrap: use a field linear in cell index along x."""
    n = 16
    mesh = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32)[:, None, None],
                            (n, n, n))
    rng = np.random.RandomState(1)
    # keep positions away from the x wraparound cell
    pos = rng.uniform(0, BOX, (200, 3))
    pos[:, 0] = rng.uniform(0, BOX * (n - 1.5) / n, 200)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    got = np.asarray(cic_readout(mesh, ipos))
    expected = pos[:, 0] / (BOX / n)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-4)


def _numpy_cic_deposit(pos, mass, n, box):
    mesh = np.zeros((n, n, n))
    x = pos / (box / n)
    i0 = np.floor(x).astype(int)
    f = x - i0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (mass
                     * (f[:, 0] if dx else 1 - f[:, 0])
                     * (f[:, 1] if dy else 1 - f[:, 1])
                     * (f[:, 2] if dz else 1 - f[:, 2]))
                np.add.at(mesh, ((i0[:, 0] + dx) % n, (i0[:, 1] + dy) % n,
                                 (i0[:, 2] + dz) % n), w)
    return mesh


def _numpy_cic_readout(mesh, pos, box):
    n = mesh.shape[0]
    x = pos / (box / n)
    i0 = np.floor(x).astype(int)
    f = x - i0
    out = np.zeros(len(pos))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = ((f[:, 0] if dx else 1 - f[:, 0])
                     * (f[:, 1] if dy else 1 - f[:, 1])
                     * (f[:, 2] if dz else 1 - f[:, 2]))
                out += w * mesh[(i0[:, 0] + dx) % n, (i0[:, 1] + dy) % n,
                                (i0[:, 2] + dz) % n]
    return out


def _direct_pm_force(pos, mass, nmesh, box, g, asmth):
    """Independent float64 implementation of the whole PM pipeline
    (CIC deposit, deconvolution^2, FFT transfers, CIC readout)."""
    n = nmesh
    mesh = _numpy_cic_deposit(pos, mass, n, box)
    rho_k = np.fft.rfftn(mesh)
    kx = np.fft.fftfreq(n, 1.0 / n)[:, None, None]
    ky = np.fft.fftfreq(n, 1.0 / n)[None, :, None]
    kz = np.arange(n // 2 + 1)[None, None, :]
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    asmth2 = (2 * np.pi * asmth / n) ** 2

    def sinc(x):
        return np.sinc(x / np.pi)  # np.sinc is sin(pi x)/(pi x)

    invw = 1.0
    for kj in (kx, ky, kz):
        invw = invw / sinc(kj * np.pi / n) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        fac = -g / (np.pi * box) * np.exp(-k2 * asmth2) / k2 * invw ** 2
    fac[0, 0, 0] = 0.0
    pot_k = rho_k * fac

    def diff_kernel(w):
        return (8 * np.sin(w) - np.sin(2 * w)) / 6.0

    forces = []
    axes = [0, 1, 2]
    for kj in (kx, ky, kz):
        ffac = -diff_kernel(kj * (2 * np.pi / n)) * (n / box)
        fmesh = np.fft.irfftn(1j * ffac * pot_k, s=(n, n, n),
                              axes=axes) * n ** 3
        forces.append(_numpy_cic_readout(fmesh, pos, box))
    return np.stack(forces, axis=-1)


def test_pm_force_matches_independent_f64():
    """The jitted f32 PM pipeline vs an independent numpy f64 one."""
    n = 32
    rng = np.random.RandomState(3)
    pos = rng.uniform(0, BOX, (50, 3))
    mass = rng.uniform(0.5, 2.0, 50)

    expected = _direct_pm_force(pos, mass, n, BOX, G, 1.5)

    cfg = PMConfig(nmesh=n, boxsize=BOX, G=G, asmth=1.5)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    accel, pot, ps = pm_forces(ipos, jnp.asarray(mass, dtype=jnp.float32),
                               cfg)
    got = np.asarray(accel)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, atol=5e-5 * scale)


def test_pm_momentum_conservation():
    rng = np.random.RandomState(4)
    pos = rng.uniform(0, BOX, (300, 3))
    mass = rng.uniform(0.5, 2.0, 300).astype(np.float32)
    cfg = PMConfig(nmesh=32, boxsize=BOX, G=G)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    accel, _, _ = pm_forces(ipos, jnp.asarray(mass), cfg)
    ptot = np.asarray(accel * mass[:, None]).sum(axis=0)
    # compare against typical force magnitude
    typ = np.abs(np.asarray(accel) * mass[:, None]).sum(axis=0)
    assert np.all(np.abs(ptot) < 1e-3 * typ)


def test_power_spectrum_plane_wave_mesh():
    """Exact check of the P(k) binning/normalization on a synthetic mesh:
    mesh = (m0/ncells)(1 + A cos(2 pi kmode x / n)) has a single excited
    mode with |rho_k| = m0 A/2 and Norm = m0^2."""
    n = 32
    kmode, A, m0 = 4, 0.05, 7.0
    x = np.arange(n)
    mesh = np.broadcast_to(
        (1 + A * np.cos(2 * np.pi * kmode * x / n))[:, None, None],
        (n, n, n)) * (m0 / n ** 3)
    cfg = PMConfig(nmesh=n, boxsize=BOX, G=G)
    rho_k = jnp.fft.rfftn(jnp.asarray(mesh, jnp.float32))
    # pass unit window: this synthetic mesh was not CIC-deposited
    ps = measure_power(rho_k, cfg, invwindow=jnp.ones_like(rho_k.real))
    kk, power, nmodes = finalize_power(ps, cfg, BOX)
    kphys = 2 * np.pi * kmode / BOX
    kbin = np.argmin(np.abs(kk - kphys))
    # two hermitian copies live at +-kmode; w=2 covers it in one entry
    expected_P = (A / 2) ** 2 * BOX ** 3 * 2 / nmodes[kbin]
    assert power[kbin] == pytest.approx(expected_P, rel=1e-4)
    # kbin's mean |k| is averaged over all modes in the log bin, so it
    # only loosely brackets the excited mode
    assert kk[kbin] == pytest.approx(kphys, rel=0.2)
    # all other bins are zero
    others = np.delete(power, kbin)
    assert np.all(others < 1e-8 * power[kbin])


def test_power_spectrum_plane_wave_particles():
    """Physics sanity: a Zel'dovich plane wave of particles produces the
    right P(k) after CIC + deconvolution (loose tol: lattice aliasing)."""
    n = 32
    npart_side = 32
    grid = (np.arange(npart_side) + 0.5) * BOX / npart_side
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)
    kmode = 4
    kphys = 2 * np.pi * kmode / BOX
    A = 0.02
    pos[:, 0] += (A / kphys) * np.sin(kphys * pos[:, 0])
    mass = np.ones(len(pos), np.float32)

    cfg = PMConfig(nmesh=n, boxsize=BOX, G=G)
    ipos = jnp.asarray(float_to_ipos(pos % BOX, BOX))
    mesh = cic_deposit(ipos, jnp.asarray(mass), n)
    rho_k = jnp.fft.rfftn(mesh)
    ps = measure_power(rho_k, cfg)
    kk, power, nmodes = finalize_power(ps, cfg, BOX)
    kbin = np.argmin(np.abs(kk - kphys))
    expected_total = (A / 2) ** 2 * BOX ** 3
    got_total = power[kbin] * nmodes[kbin] / 2
    assert got_total == pytest.approx(expected_total, rel=0.1)
    others = power[(kk < 0.8 * kphys)]
    assert np.all(others < 1e-2 * power[kbin])
