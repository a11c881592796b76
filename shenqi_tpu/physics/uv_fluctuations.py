"""Fluctuating UV background + metal cooling tables
(cooling_uvfluc.cpp analog).

Two independent optional tables:

  * Zreion_Table (Battaglia & Trac 2010 model, bigfile): the
    reionization redshift on a uniform spatial grid.  Particles whose
    z_reion is below the current redshift have not been reionized yet
    and see NO ionizing background (cooling_uvfluc.cpp:143-166).
    Periodic trilinear interpolation, fully vectorized.

  * MetalCool file (bigfile, cloudy + UVB - H - He net rate at solar
    metallicity): NetCoolingRate on a (redshift, log10 nH, log10 T)
    grid, scaled linearly by the particle metallicity
    (cooling_uvfluc.cpp:271-335).  Clamped trilinear interpolation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ZreionTable:
    """Spatial reionization-redshift grid with periodic trilinear
    lookup."""

    table: jnp.ndarray      # [Ns, Ns, Ns]
    nside: int
    boxsize: float          # internal units
    median_redshift: float

    @classmethod
    def load(cls, path: str, boxsize: float,
             unit_length_in_cm: float) -> "ZreionTable":
        """Read the UV fluctuation bigfile (Zreion_Table block with
        Nmesh/BoxSize/Redshift attrs; BoxSize is in Mpc/h)."""
        from ..io.bigfile import BigFile
        from ..utils.constants import CM_PER_MPC
        bf = BigFile(path)
        blk = bf["Zreion_Table"]
        nside = int(blk.attrs.raw("Nmesh")[0])
        table_box_mpc = float(blk.attrs.raw("BoxSize")[0])
        zreion = float(blk.attrs.raw("Redshift")[0])
        box_mpc = boxsize * unit_length_in_cm / CM_PER_MPC
        if abs(table_box_mpc - box_mpc) > 1e-5 * box_mpc:
            raise ValueError(
                f"UV fluctuation table box {table_box_mpc} Mpc/h does "
                f"not match simulation box {box_mpc} Mpc/h")
        data = blk.read().reshape(nside, nside, nside)
        return cls(table=jnp.asarray(data, jnp.float32), nside=nside,
                   boxsize=boxsize, median_redshift=zreion)

    def zreion(self, pos):
        """Periodic trilinear interpolation at positions [N, 3]
        (internal length units)."""
        ns = self.nside
        x = jnp.asarray(pos) / self.boxsize * ns
        i0 = jnp.floor(x).astype(jnp.int32)
        f = x - i0

        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    ii = jnp.stack([(i0[:, 0] + dx) % ns,
                                    (i0[:, 1] + dy) % ns,
                                    (i0[:, 2] + dz) % ns], -1)
                    w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                         * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                         * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                    out = out + w * self.table[ii[:, 0], ii[:, 1],
                                               ii[:, 2]]
        return out


def local_uvbg(global_uvbg, zreion, redshift):
    """Per-particle UVBG: particles not yet reionized (z_reion below
    the current redshift) see zero photoionization/heating but keep
    the self-shielding density (cooling_uvfluc.cpp:143-166).

    zreion: [N] from ZreionTable.zreion.  Returns a UVBG whose rate
    fields are arrays broadcastable against per-particle quantities.
    """
    ionized = zreion >= redshift
    on = ionized.astype(jnp.float32)
    return type(global_uvbg)(
        gJH0=global_uvbg.gJH0 * on, gJHe0=global_uvbg.gJHe0 * on,
        gJHep=global_uvbg.gJHep * on, epsH0=global_uvbg.epsH0 * on,
        epsHe0=global_uvbg.epsHe0 * on,
        epsHep=global_uvbg.epsHep * on,
        self_shield_dens=global_uvbg.self_shield_dens
        * jnp.ones_like(on),
        zreion=zreion)


@dataclass(frozen=True)
class J21Coeffs:
    """Photo rates per unit J21 as a function of the UV spectral
    slope alpha (the J21CoeffFile table, same column layout as
    TREECOOL but keyed by alpha; cooling_rates.cpp:274-286)."""

    alpha: np.ndarray
    rates: np.ndarray      # [Na, 6] log10 of Gamma_HI..Eps_HeII

    @classmethod
    def load(cls, path: str) -> "J21Coeffs":
        data = np.loadtxt(path)
        return cls(alpha=data[:, 0],
                   rates=np.log10(np.maximum(data[:, 1:7], 1e-300)))

    def at(self, alpha_uv: float):
        return [10.0 ** np.interp(alpha_uv, self.alpha,
                                  self.rates[:, i]) for i in range(6)]


def uvbg_from_j21(global_uvbg, j21, zreion, redshift, alpha_uv,
                  coeffs: J21Coeffs, fbar=0.17):
    """Per-particle UVBG from the excursion-set J21
    (cooling_uvfluc.cpp get_local_UVBG_from_J21): rates scale
    linearly with J21; HeII rates are zero (HeIII handled by the QSO
    lightup model); self-shielding density follows Rahmati 2012 with
    the local gJH0."""
    gH0, gHe0, _gHep, eH0, eHe0, _eHep = coeffs.at(alpha_uv)
    ev = 1.60218e-12
    j = jnp.asarray(j21, jnp.float32)
    gJH0 = gH0 * j
    # Rahmati 2012 eq. 13 with the local photoionization rate
    g12 = jnp.maximum(gJH0, 1e-300) / 1e-12
    greyopac = float(np.interp(np.clip(redshift, 0, 5),
                               [0., 1, 2, 3, 4, 5],
                               [2.59e-18, 2.37e-18, 2.27e-18,
                                2.15e-18, 2.02e-18, 1.94e-18]))
    ssdens = (6.73e-3 * (greyopac / 2.49e-18) ** (-2. / 3)
              * g12 ** (2. / 3) * (fbar / 0.17) ** (-1. / 3))
    ssdens = jnp.where(gJH0 > 0, ssdens, 1e10)
    return type(global_uvbg)(
        gJH0=gJH0, gJHe0=gHe0 * j, gJHep=jnp.zeros_like(j),
        epsH0=eH0 * j * ev, epsHe0=eHe0 * j * ev,
        epsHep=jnp.zeros_like(j),
        self_shield_dens=ssdens, zreion=zreion)


@dataclass(frozen=True)
class MetalCoolingTable:
    """Cloudy net metal cooling at solar Z on a (z, log nH, log T)
    grid; scale by metallicity at evaluation."""

    redshift_bins: np.ndarray
    lognh_bins: np.ndarray
    logt_bins: np.ndarray
    rate: jnp.ndarray        # [Nz, Nnh, Nt]

    @classmethod
    def load(cls, path: str) -> "MetalCoolingTable":
        from ..io.bigfile import BigFile
        bf = BigFile(path)
        tab = bf["MetallicityInSolar_bins"].read()
        if tab.size != 1 or tab[0] != 0.0:
            raise ValueError("MetalCool file is wrongly tabulated")
        zb = np.asarray(bf["Redshift_bins"].read(), np.float64)
        nb = np.asarray(bf["HydrogenNumberDensity_bins"].read(),
                        np.float64)
        tb = np.asarray(bf["Temperature_bins"].read(), np.float64)
        rate = np.asarray(bf["NetCoolingRate"].read(), np.float64)
        rate = rate.reshape(len(zb), len(nb), len(tb))
        return cls(redshift_bins=zb, lognh_bins=nb, logt_bins=tb,
                   rate=jnp.asarray(rate, jnp.float32))

    def _axis_index(self, bins, x):
        """Fractional index on a (possibly non-uniform) axis, clamped
        to the table range (reference InterpNLinear clamps)."""
        b = jnp.asarray(bins, jnp.float32)
        i = jnp.searchsorted(b, x, side="right") - 1
        i = jnp.clip(i, 0, len(bins) - 2)
        f = (x - b[i]) / jnp.maximum(b[i + 1] - b[i], 1e-35)
        return i, jnp.clip(f, 0.0, 1.0)

    def eval(self, redshift, temp, nh_cgs):
        """Net cooling at solar metallicity, erg/s/g per unit Z
        (multiply by the particle metallicity like
        cooling_rates.cpp:1154)."""
        iz, fz = self._axis_index(self.redshift_bins,
                                  jnp.asarray(redshift, jnp.float32)
                                  * jnp.ones_like(jnp.asarray(
                                      temp, jnp.float32)))
        inh, fnh = self._axis_index(self.lognh_bins,
                                    jnp.log10(jnp.maximum(nh_cgs,
                                                          1e-35)))
        it, ft = self._axis_index(self.logt_bins,
                                  jnp.log10(jnp.maximum(temp, 1.0)))
        out = 0.0
        for dz_ in (0, 1):
            for dn in (0, 1):
                for dt in (0, 1):
                    w = (jnp.where(dz_, fz, 1 - fz)
                         * jnp.where(dn, fnh, 1 - fnh)
                         * jnp.where(dt, ft, 1 - ft))
                    out = out + w * self.rate[iz + dz_, inh + dn,
                                              it + dt]
        return out
