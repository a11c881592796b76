"""Initial-conditions generator: Gaussian field + Zel'dovich displacement.

The MP-GenIC analog (libgenic/zeldovich.cpp, glass.cpp, main.cpp), built
TPU-first: the Gaussian random field is a white-noise real mesh FFT'd once
(automatically hermitian), transfer functions are dense elementwise mesh
ops, displacements/velocities come back through irfftn + CIC readout.

Math (identical to the reference displacement transfer,
libgenic/zeldovich.cpp:293-315):
  disp_j(k) = i * (kint_j / kint^2) / (2 pi) / sqrt(L) * Delta(k) * g(k)
with Delta = sqrt(P(k)) in internal units, g a unit complex Gaussian, and
an unnormalized inverse FFT.  Velocity = a H(a) f(a) * disp (peculiar),
or with scale-dependent growth from the velocity transfer functions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.particles import float_to_ipos, POS_SCALE
from ..cosmology.background import Cosmology
from ..cosmology.power import InputPower, DELTA_TOT
from ..ops.cic import cic_readout


def setup_grid(ngrid: int, boxsize: float, id_offset: int = 1,
               shift_frac: float = 0.0):
    """Particles on a regular lattice with deterministic IDs.

    Matches the reference grid pre-IC (libgenic/zeldovich.cpp IDGenerator):
    index (i,j,k) -> id = offset + i*ng^2 + j*ng + k, position at cell
    corner plus optional fractional shift (used to offset gas vs DM).
    """
    ng = ngrid
    idx = np.arange(ng)
    X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
    pos = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float64)
    pos = ((pos + shift_frac) * (boxsize / ng)) % boxsize
    ids = (id_offset + X.ravel() * ng * ng + Y.ravel() * ng
           + Z.ravel()).astype(np.uint64)
    return pos, ids


def gaussian_field(seed: int, nmesh: int, unitary: bool = False,
                   invert_phase: bool = False,
                   scheme: str = "gadget") -> jax.Array:
    """Unit-variance hermitian complex Gaussian modes g_k [n,n,n//2+1].

    scheme='gadget' (default) reproduces the reference's
    pmic_fill_gaussian_gadget phases EXACTLY (genic/gadget_field.py) —
    the same seed yields the same realization as MP-GenIC, making the
    reference CI examples' pinned outputs (halo masses, star counts)
    directly comparable.

    scheme='fast' generates rfftn(white noise)/n^{3/2} with jax.random:
    exactly hermitian, each mode <|g|^2> = 1, much faster for very
    large meshes, but a different realization per seed.

    `unitary` fixes |g|=1 keeping the phase (variance suppression);
    `invert_phase` flips the sign (paired simulations).
    """
    if scheme == "gadget":
        from .gadget_field import gadget_gaussian_field
        # stays a HOST array: complex device transfers are
        # unimplemented on the axon TPU backend; displacement_fields
        # ships real/imag planes separately and assembles under jit
        return gadget_gaussian_field(seed, nmesh, unitary=unitary,
                                     invert_phase=invert_phase
                                     ).astype(np.complex64)
    key = jax.random.PRNGKey(seed)
    white = jax.random.normal(key, (nmesh, nmesh, nmesh), jnp.float32)
    g = jnp.fft.rfftn(white) / nmesh ** 1.5
    if unitary:
        amp = jnp.abs(g)
        g = g / jnp.where(amp > 0, amp, 1.0)
    if invert_phase:
        g = -g
    return g


def _mesh_to_k(nmesh: int):
    """Integer wavenumbers with the reference's MESH2K convention
    (petapm.cpp:159-162): i <= N/2 -> i, else i - N.  Note the
    Nyquist index N/2 maps to +N/2, NOT numpy fftfreq's -N/2 — the
    sign enters the displacement kernel kaxis/k^2 and flips the
    Nyquist-plane displacements, i.e. a different realization."""
    i = np.arange(nmesh)
    return np.where(i <= nmesh // 2, i, i - nmesh).astype(np.float64)


def _mode_tables(nmesh: int):
    k1 = _mesh_to_k(nmesh)
    kx = k1[:, None, None]
    ky = k1[None, :, None]
    kz = np.arange(nmesh // 2 + 1, dtype=np.float64)[None, None, :]
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    return (kx, ky, kz), k2


@dataclass
class ZeldovichResult:
    pos: np.ndarray        # [N,3] displaced positions (internal units)
    vel: np.ndarray        # [N,3] velocities (convention per use_peculiar)
    disp: np.ndarray       # [N,3] raw displacements
    max_disp: float


def displacement_fields(g_k, power: InputPower, CP: Cosmology,
                        pos_lattice: np.ndarray, boxsize: float,
                        time_ic: float, ttype: int = DELTA_TOT,
                        use_peculiar: bool = True) -> ZeldovichResult:
    """Compute Zel'dovich displacements and velocities at lattice points."""
    nmesh = g_k.shape[0]
    (kx, ky, kz), k2 = _mode_tables(nmesh)

    # sqrt(P) per mode (host f64 -> f32 mesh table)
    kmag_internal = np.sqrt(k2) * (2 * np.pi / boxsize)
    delta = power.delta_spec(kmag_internal, ttype)
    if power.scale_dep_velocity:
        growth = power.dlog_growth(kmag_internal, ttype)
    else:
        growth = None

    k2_safe = np.where(k2 > 0, k2, 1.0)
    base = 1.0 / (2 * np.pi) / np.sqrt(boxsize) / k2_safe
    base = np.where(k2 > 0, base, 0.0)

    ipos = jnp.asarray(float_to_ipos(pos_lattice, boxsize))

    # complex values must never exist EAGERLY on the axon TPU backend
    # (transfers and op-by-op complex math are UNIMPLEMENTED there):
    # ship two real planes and assemble the complex field under jit
    g_np = np.asarray(g_k)
    g_re = jnp.asarray(np.ascontiguousarray(g_np.real), jnp.float32)
    g_im = jnp.asarray(np.ascontiguousarray(g_np.imag), jnp.float32)

    @jax.jit
    def solve_axis(fac, g_re, g_im, ipos):
        field_k = (1j * fac) * (g_re + 1j * g_im)
        # unnormalized inverse FFT (reference/FFTW convention)
        mesh = jnp.fft.irfftn(field_k, s=(nmesh, nmesh, nmesh)) * nmesh ** 3
        return cic_readout(mesh.astype(jnp.float32), ipos)

    def solve_axis_host(kaxis_int, amp_table):
        fac = jnp.asarray((base * kaxis_int * amp_table), jnp.float32)
        return solve_axis(fac, g_re, g_im, ipos)

    disp = np.stack([np.asarray(solve_axis_host(kj, delta))
                     for kj in (kx, ky, kz)], axis=-1)
    if growth is not None:
        vel = np.stack([np.asarray(solve_axis_host(kj, growth))
                        for kj in (kx, ky, kz)], axis=-1)
    else:
        vel = disp.copy()

    hubble_a = CP.hubble_function(time_ic)
    vel_prefac = time_ic * hubble_a
    if not use_peculiar:
        vel_prefac /= np.sqrt(time_ic)
    if growth is None:
        vel_prefac *= CP.F_Omega(time_ic)
    vel = vel * vel_prefac

    pos = (pos_lattice + disp) % boxsize
    return ZeldovichResult(pos=pos, vel=vel, disp=disp,
                           max_disp=float(np.abs(disp).max()))


def generate_dm_ics(ngrid: int, boxsize: float, seed: int,
                    power: InputPower, CP: Cosmology, time_ic: float,
                    unitary: bool = False, invert_phase: bool = False,
                    nmesh: Optional[int] = None,
                    use_peculiar: bool = True):
    """One-species (DM) IC: returns (pos, vel, ids, mass_per_particle).

    mass = Omega0 * rhocrit * box^3 / ngrid^3 (total matter in DM).
    """
    nmesh = nmesh or ngrid
    pos_lattice, ids = setup_grid(ngrid, boxsize)
    g_k = gaussian_field(seed, nmesh, unitary, invert_phase)
    res = displacement_fields(g_k, power, CP, pos_lattice, boxsize,
                              time_ic, use_peculiar=use_peculiar)
    mass = (CP.Omega0 * CP.RhoCrit * boxsize ** 3) / ngrid ** 3
    return res.pos, res.vel, ids, mass
