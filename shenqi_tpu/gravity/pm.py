"""Long-range particle-mesh gravity via FFT (the gravpm/petapm analog).

Pipeline (math identical to the reference long-range solver,
libgadget/gravpm.cpp:379-487):
  1. CIC-deposit masses onto an Nmesh^3 grid
  2. r2c FFT
  3. potential transfer: value *= -G/(pi L) * exp(-k2 asmth2)/k2 * W_cic^-4
     (two CIC deconvolutions: one for deposit, one for readout)
  4. measure total-matter P(k) in the same pass (single deconvolution)
  5. c2r per component: force_j via i * diff_kernel(w_j) * (Nmesh/L)
     with diff_kernel(w) = (8 sin w - sin 2w)/6 (4-point finite difference)
  6. CIC readout of potential + 3 force components

Instead of the reference's region/pencil machinery (a consequence of MPI),
the mesh is a plain sharded jnp array: under pjit/shard_map XLA inserts
the transpose collectives that heFFTe did by hand.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cic import cic_deposit, cic_readout


class PMConfig(NamedTuple):
    nmesh: int
    boxsize: float      # internal length units
    G: float            # gravitational constant, internal units
    asmth: float = 1.5  # long/short-range split scale in mesh cells
    nbins_power: int = 0  # power spectrum bins (0 -> nmesh)


class PowerSpectrum(NamedTuple):
    """Binned P(k) measured from the density mesh."""
    k: jax.Array        # [nbins] mean |k| per bin (integer grid units)
    power: jax.Array    # [nbins] sum of w |delta_k|^2 / W^2
    nmodes: jax.Array   # [nbins]
    norm: jax.Array     # scalar: |mode 0|^2 = (sum of mass)^2


def _kpos_1d(n: int, half: bool = False):
    """Integer wavenumbers along one axis: [0..n/2, -(n/2-1)..-1]."""
    if half:
        return jnp.arange(n // 2 + 1, dtype=jnp.float32)
    k = jnp.arange(n, dtype=jnp.float32)
    return jnp.where(k <= n // 2, k, k - n)


def _sinc_unnormed(x):
    """sin(x)/x, safe at 0."""
    return jnp.where(jnp.abs(x) < 1e-5, 1.0, jnp.sin(x) / jnp.where(
        jnp.abs(x) < 1e-5, 1.0, x))


def _cic_invwindow(cfg: PMConfig):
    """Per-mode 1/W_cic for the rfft layout; W = prod sinc^2(pi k/N)."""
    n = cfg.nmesh
    kx = _kpos_1d(n)[:, None, None]
    ky = _kpos_1d(n)[None, :, None]
    kz = _kpos_1d(n, half=True)[None, None, :]
    f = 1.0
    for kj in (kx, ky, kz):
        s = _sinc_unnormed(kj * (np.pi / n))
        f = f / (s * s)
    return f  # broadcasting produces [n, n, n//2+1]


def _k2_int(cfg: PMConfig):
    n = cfg.nmesh
    kx = _kpos_1d(n)[:, None, None]
    ky = _kpos_1d(n)[None, :, None]
    kz = _kpos_1d(n, half=True)[None, None, :]
    return kx * kx + ky * ky + kz * kz


def measure_power(rho_k, cfg: PMConfig, invwindow=None) -> PowerSpectrum:
    """Bin |rho_k|^2 into log-k2 bins (powerspectrum_add_mode math).

    Bins: kint = floor(binsperunit * log(k2)/2),
    binsperunit = (nbins-1)/log(sqrt(3) N/2); hermitian weight 2 except
    on the kz=0 and kz=N/2 planes.
    """
    n = cfg.nmesh
    nbins = cfg.nbins_power or n
    if invwindow is None:
        invwindow = _cic_invwindow(cfg)
    k2 = _k2_int(cfg)
    m = rho_k.real ** 2 + rho_k.imag ** 2
    kz = _kpos_1d(n, half=True)[None, None, :]
    w = jnp.where((kz == 0) | (kz == n // 2), 1.0, 2.0)
    w = jnp.broadcast_to(w, m.shape)
    keff = jnp.sqrt(k2)
    binsperunit = (nbins - 1) / np.log(np.sqrt(3.) * n / 2.)
    kint = jnp.floor(binsperunit * 0.5 * jnp.log(
        jnp.where(k2 > 0, k2, 1.0))).astype(jnp.int32)
    kint = jnp.where(k2 > 0, kint, nbins)  # k=0 -> overflow bin
    kint = jnp.clip(kint, 0, nbins)

    flat = kint.ravel()
    power = jax.ops.segment_sum((w * m * invwindow * invwindow).ravel(),
                                flat, num_segments=nbins + 1)[:nbins]
    nmodes = jax.ops.segment_sum(w.ravel(), flat,
                                 num_segments=nbins + 1)[:nbins]
    ksum = jax.ops.segment_sum((w * keff).ravel(), flat,
                               num_segments=nbins + 1)[:nbins]
    norm = m[0, 0, 0]
    kmean = jnp.where(nmodes > 0, ksum / jnp.maximum(nmodes, 1), 0.0)
    return PowerSpectrum(k=kmean, power=power, nmodes=nmodes, norm=norm)


def finalize_power(ps: PowerSpectrum, cfg: PMConfig, boxsize_mpc: float):
    """Host-side: convert to (k [h/Mpc], P [(Mpc/h)^3]) like the reference
    powerspectrum_sum (libgadget/powerspectrum.cpp:72-88)."""
    k = np.asarray(ps.k, dtype=np.float64)
    power = np.asarray(ps.power, dtype=np.float64)
    nmodes = np.asarray(ps.nmodes, dtype=np.float64)
    norm = float(ps.norm)
    sel = nmodes > 0
    k = k[sel]
    power = power[sel] / nmodes[sel] / norm * boxsize_mpc ** 3
    kk = k * 2 * np.pi / boxsize_mpc
    return kk, power, nmodes[sel]


@partial(jax.jit, static_argnames=("cfg",))
def measure_cdm_power(ipos, mass, cfg: PMConfig, mask=None):
    """Deposit + one FFT + binning only: the CDM (particle) power the
    neutrino linear response is sourced by (measure_power_spectrum,
    gravpm.cpp:360, taken BEFORE the nu factor multiplies the modes)."""
    n = cfg.nmesh
    mesh = cic_deposit(ipos, mass, n, mask=mask)
    rho_k = jnp.fft.rfftn(mesh.astype(jnp.float32))
    return measure_power(rho_k, cfg, _cic_invwindow(cfg))


@partial(jax.jit, static_argnames=("cfg", "want_potential"))
def pm_forces(ipos, mass, cfg: PMConfig, mask=None,
              want_potential: bool = True, nu_factor=None):
    """Full PM force solve (jitted: PMConfig is a hashable NamedTuple;
    eager complex ops are unsupported on the axon TPU backend).

    Args:
      ipos: [N,3] uint32 fixed-point positions
      mass: [N] float32
      cfg: PMConfig
      mask: [N] bool — dead particles neither deposit nor read out
      nu_factor: optional [n,n,n//2+1] multiplier on the density
        (massive-neutrino linear response: 1 + f_nu delta_nu/delta_cdm)

    Returns:
      (accel [N,3] f32, potential [N] f32 or None, PowerSpectrum)
    """
    n = cfg.nmesh
    mesh = cic_deposit(ipos, mass, n, mask=mask)
    rho_k = jnp.fft.rfftn(mesh.astype(jnp.float32))

    invwindow = _cic_invwindow(cfg)
    if nu_factor is not None:
        rho_k = rho_k * nu_factor
    ps = measure_power(rho_k, cfg, invwindow)

    k2 = _k2_int(cfg)
    asmth2 = (2 * np.pi * cfg.asmth / n) ** 2
    pot_factor = -cfg.G / (np.pi * cfg.boxsize)
    # fold the unnormalized-inverse-FFT convention (reference/FFTW) into
    # the transfer: jnp.fft.irfftn divides by N^3, the reference does not.
    fac = (pot_factor * n ** 3) * jnp.exp(-k2 * asmth2) \
        / jnp.where(k2 > 0, k2, 1.0) * invwindow * invwindow
    fac = jnp.where(k2 > 0, fac, 0.0)  # remove mean
    pot_k = rho_k * fac

    kx = _kpos_1d(n)[:, None, None]
    ky = _kpos_1d(n)[None, :, None]
    kz = _kpos_1d(n, half=True)[None, None, :]

    def diff_kernel(w):
        return (8.0 * jnp.sin(w) - jnp.sin(2.0 * w)) / 6.0

    accel = []
    for kj in (kx, ky, kz):
        # force_j = ifft( i * (-diff_kernel(w_j) * N/L) * pot_k )
        ffac = -diff_kernel(kj * (2 * np.pi / n)) * (n / cfg.boxsize)
        force_k = (1j * ffac) * pot_k
        fmesh = jnp.fft.irfftn(force_k, s=(n, n, n))
        accel.append(cic_readout(fmesh, ipos, mask=mask))
    accel = jnp.stack(accel, axis=-1)

    potential = None
    if want_potential:
        pmesh = jnp.fft.irfftn(pot_k, s=(n, n, n))
        potential = cic_readout(pmesh, ipos, mask=mask)
    return accel, potential, ps
