"""Primordial cooling/heating rate network (cooling_rates.cpp analog).

Katz, Weinberg & Hernquist 1996 H/He network with the Sherwood
calibration (Bolton et al 2016): Verner & Ferland 96 recombination,
Voronov 97 collisional ionization, Cen 92 collisional excitation with
the softened high-T correction, Spitzer free-free, inverse Compton, and
Rahmati 2012 self-shielding.  The UV background comes from a TREECOOL
table (same file format as the reference).

All rate evaluations are vectorized jnp (device, float32); the UVB
interpolation at the current redshift is host-side (one scalar set per
step).  The reference tabulates rates vs temperature for speed; here the
fits are cheap enough to evaluate inline on the VPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import (BOLEVK, BOLTZMANN, PROTONMASS,
                               GAMMA_MINUS1, EV_IN_ERGS, THOMPSON,
                               RAD_CONST, ELECTRONMASS, LIGHTCGS,
                               HYDROGEN_MASSFRAC, GRAVITY, HUBBLE)


# All cooling/heating rates are carried in units of 1e-24 erg cm^3/s so
# that f32 intermediates stay near unity (raw cgs values ~1e-24 produce
# ~1e-27 intermediates, which XLA's reassociations mishandle in f32).
LAMSCALE = 1e24


class UVBG(NamedTuple):
    """Photoionization (1/s) + photoheating (erg/s) rates at fixed z."""
    gJH0: float = 0.0
    gJHe0: float = 0.0
    gJHep: float = 0.0
    epsH0: float = 0.0
    epsHe0: float = 0.0
    epsHep: float = 0.0
    self_shield_dens: float = 1e10
    zreion: float = 8.0


@dataclass
class CoolingParams:
    CMBTemperature: float = 2.7255
    MinGasTemp: float = 5.0
    PhotoIonizeFactor: float = 1.0
    SelfShieldingOn: bool = True
    PhotoIonizationOn: bool = True
    UVRedshiftThreshold: float = -1.0
    fBar: float = 0.17
    recomb: str = "Verner96"       # or 'Cen92'
    cooling: str = "Sherwood"      # or 'KWH92'
    HeliumHeatOn: bool = False
    HeliumHeatThresh: float = 10.0
    HeliumHeatAmp: float = 1.0
    HeliumHeatExp: float = 0.0
    rho_crit_baryon: float = 0.0


class TreeCool:
    """TREECOOL table: log10(1+z) -> photoionization/heating rates."""

    def __init__(self, path: str, photo_factor: float = 1.0):
        data = np.loadtxt(path)
        self.log1z = data[:, 0]
        self.rates = np.log10(np.maximum(data[:, 1:7], 1e-300))
        self.photo_factor = photo_factor

    def uvbg(self, redshift: float, params: CoolingParams,
             gray_opac_z=None) -> UVBG:
        log1z = np.log10(1 + redshift)
        if log1z >= self.log1z[-1]:
            return UVBG()
        if params.UVRedshiftThreshold >= 0 and \
                redshift > params.UVRedshiftThreshold:
            return UVBG()
        vals = [10.0 ** np.interp(log1z, self.log1z, self.rates[:, i])
                * self.photo_factor for i in range(6)]
        zreion = 10 ** self.log1z[-1] - 1
        if params.UVRedshiftThreshold >= 0:
            zreion = params.UVRedshiftThreshold
        uv = UVBG(gJH0=vals[0], gJHe0=vals[1], gJHep=vals[2],
                  epsH0=vals[3], epsHe0=vals[4], epsHep=vals[5],
                  zreion=zreion)
        ssdens = self_shield_dens(redshift, uv, params)
        return uv._replace(self_shield_dens=ssdens)


# Gray opacity for the FG2009 UVB (cooling_rates.cpp:967-969)
_GRAYOPAC_Z = np.array([0., 1, 2, 3, 4, 5])
_GRAYOPAC = np.array([2.59e-18, 2.37e-18, 2.27e-18, 2.15e-18, 2.02e-18,
                      1.94e-18])


def self_shield_dens(redshift: float, uvbg: UVBG,
                     params: CoolingParams) -> float:
    """Rahmati 2012 eq. 13 critical density (atoms/cm^3)."""
    if uvbg.gJH0 == 0:
        return 1e10
    g12 = uvbg.gJH0 / 1e-12
    greyopac = np.interp(np.clip(redshift, 0, 5), _GRAYOPAC_Z, _GRAYOPAC)
    return (6.73e-3 * (greyopac / 2.49e-18) ** (-2. / 3)
            * g12 ** (2. / 3) * (params.fBar / 0.17) ** (-1. / 3))


# ---------------- device-side rate fits ----------------

def _verner96(temp, aa, bb, t0, t1):
    s0 = jnp.sqrt(temp / t0)
    s1 = jnp.sqrt(temp / t1)
    return aa / (s0 * (1 + s0) ** (1 - bb) * (1 + s1) ** (1 + bb))


def recomb_alphaHp(temp):
    return _verner96(temp, 7.982e-11, 0.748, 3.148, 7.036e5)


def recomb_alphaHep(temp):
    low = _verner96(temp, 3.294e-11, 0.6910, 1.554e1, 3.676e7)
    high = _verner96(temp, 9.356e-10, 0.7892, 4.266e-2, 4.677e6)
    lower, upper = 6e5, 8e5
    interp = (low * (upper - temp) + high * (temp - lower)) / 2e5
    return jnp.where(temp < lower, low,
                     jnp.where(temp > upper, high, interp))


def recomb_alphad(temp):
    """Dielectronic recombination (Meiksin-corrected Black 1981)."""
    t = jnp.maximum(temp, 1.0)
    return (1.23e-3 / t ** 1.5 * jnp.exp(-4.72e5 / t)
            * (1 + 0.3 * jnp.exp(-9.4e4 / t)))


def recomb_alphaHepd(temp):
    return recomb_alphad(temp) + recomb_alphaHep(temp)


def recomb_alphaHepp(temp):
    return _verner96(temp, 1.891e-10, 0.7524, 9.370, 2.774e6)


def _voronov97(temp, dE, PP, AA, XX, KK):
    uu = dE / (BOLEVK * jnp.maximum(temp, 1.0))
    return (AA * (1 + PP * jnp.sqrt(uu)) / (XX + uu) * uu ** KK
            * jnp.exp(-jnp.minimum(uu, 70.0)))


def recomb_GammaeH0(temp):
    return _voronov97(temp, 13.6, 0, 0.291e-07, 0.232, 0.39)


def recomb_GammaeHe0(temp):
    return _voronov97(temp, 24.6, 0, 0.175e-07, 0.180, 0.35)


def recomb_GammaeHep(temp):
    return _voronov97(temp, 54.4, 1, 0.205e-08, 0.265, 0.25)


def _t5(temp):
    """Sherwood high-T correction (t0=5e7; KWH92 would use 1e5)."""
    return 1 + jnp.sqrt(temp / 5e7)


def cool_CollisionalH0(temp):
    """Rate * LAMSCALE (all cool_* return scaled rates)."""
    excite = (7.5e-19 * LAMSCALE) \
        * jnp.exp(-jnp.minimum(118348.0 / temp, 70.)) / _t5(temp)
    ionize = (13.5984 * EV_IN_ERGS * LAMSCALE) * recomb_GammaeH0(temp)
    return excite + ionize


def cool_CollisionalHe0(temp):
    excite = ((9.1e-27 * LAMSCALE) * temp ** (-0.1687)
              * jnp.exp(-jnp.minimum(473638.0 / temp, 70.)) / _t5(temp))
    ionize = (24.5874 * EV_IN_ERGS * LAMSCALE) * recomb_GammaeHe0(temp)
    return excite + ionize


def cool_CollisionalHeP(temp):
    excite = ((5.54e-17 * LAMSCALE) * temp ** (-0.397)
              * jnp.exp(-jnp.minimum(473638.0 / temp, 70.)) / _t5(temp))
    ionize = (54.417760 * EV_IN_ERGS * LAMSCALE) \
        * recomb_GammaeHep(temp)
    return excite + ionize


def cool_RecombHp(temp):
    return (0.75 * BOLTZMANN * LAMSCALE) * temp * recomb_alphaHp(temp)


def cool_RecombHeP(temp):
    return ((0.75 * BOLTZMANN * LAMSCALE) * temp
            * recomb_alphaHep(temp)
            + (6.526e-11 * LAMSCALE) * recomb_alphad(temp))


def cool_RecombHePP(temp):
    return (0.75 * BOLTZMANN * LAMSCALE) * temp \
        * recomb_alphaHepp(temp)


def cool_FreeFree1(temp):
    """Free-free with the Spitzer 78 gaunt factor (zz=1)."""
    gff = 1.1 + 0.34 * jnp.exp(-(5.5 - jnp.log10(temp)) ** 2 / 3.0)
    return (1.426e-27 * LAMSCALE) * jnp.sqrt(temp) * gff


def cool_InverseCompton(temp, redshift, tcmb0):
    tcmb = tcmb0 * (1 + redshift)
    return (4 * THOMPSON * RAD_CONST / (ELECTRONMASS * LIGHTCGS)
            * tcmb ** 4 * BOLTZMANN * LAMSCALE * (temp - tcmb))


# ---------------- ionization equilibrium ----------------

def get_temp_from_u(nebynh, u_cgs, helium, min_temp):
    """T(K) from specific internal energy (erg/g) and ne/nH."""
    hy_mass = 1 - helium
    mu_u = 4 / (hy_mass * (3 + 4 * nebynh) + 1) * u_cgs
    temp = GAMMA_MINUS1 * PROTONMASS / BOLTZMANN * mu_u
    return jnp.maximum(temp, min_temp)


def self_shield_corr(nh, logt, ssdens, enabled: bool):
    """Rahmati 2012 eq. 14 photoionization suppression."""
    if not enabled:
        return jnp.ones_like(nh)
    t4 = jnp.exp(0.17 * (logt - np.log(1e4)))
    nssh = 1.003 * ssdens * t4
    corr = (0.98 * (1 + (nh / nssh) ** 1.64) ** (-2.28)
            + 0.02 * (1 + nh / nssh) ** (-0.84))
    return jnp.where(nh < ssdens * 0.01, 1.0, corr)


def _species(nh, logt, ne, uvbg: UVBG, photofac):
    """(nH0, nHp, nHe0/nh, nHep/nh, nHepp/nh shapes per KWH 33-37)."""
    temp = jnp.exp(logt)
    aHp = recomb_alphaHp(temp)
    gH0 = recomb_GammaeH0(temp)
    ne_safe = jnp.maximum(ne, 1e-50)
    photorate = jnp.where(uvbg.gJH0 > 0,
                          uvbg.gJH0 / ne_safe * photofac, 0.0)
    nH0 = aHp / (aHp + gH0 + photorate)
    nHp = jnp.maximum(1.0 - nH0, 0.0)

    aHep = recomb_alphaHepd(temp)
    aHepp = recomb_alphaHepp(temp)
    gHe0 = recomb_GammaeHe0(temp) + jnp.where(
        uvbg.gJHe0 > 0, uvbg.gJHe0 / ne_safe * photofac, 0.0)
    gHep = recomb_GammaeHep(temp) + jnp.where(
        uvbg.gJHep > 0, uvbg.gJHep / ne_safe * photofac, 0.0)
    has_ion = gHe0 > 1e-50
    gHe0_s = jnp.where(has_ion, gHe0, 1.0)
    nHep = jnp.where(has_ion,
                     nh / (1 + aHep / gHe0_s + gHep / aHepp), 0.0)
    nHe0 = jnp.where(has_ion, nHep * aHep / gHe0_s, nh)
    nHepp = jnp.where(has_ion, nHep * gHep / aHepp, 0.0)
    return nH0, nHp, nHe0, nHep, nHepp


def get_equilib_ne(nh_total, u_cgs, helium, uvbg: UVBG,
                   params: CoolingParams, ne_init=None, niter: int = 40):
    """Equilibrium ne (cgs cm^-3) via damped fixed-point iteration.

    nh_total: total hydrogen number density (cm^-3) = rho(1-Y)/mp.
    Returns (ne, logt).
    """
    nh = nh_total
    yy = helium / 4 / (1 - helium)
    ne0 = (jnp.ones_like(nh) * nh if ne_init is None
           else jnp.maximum(ne_init, 0.0))

    def body(i, ne):
        nebynh = ne / nh
        logt = jnp.log(get_temp_from_u(nebynh, u_cgs, helium,
                                       params.MinGasTemp))
        photofac = self_shield_corr(nh, logt, uvbg.self_shield_dens,
                                    params.SelfShieldingOn)
        nH0, nHp, nHe0, nHep, nHepp = _species(nh, logt, ne, uvbg,
                                               photofac)
        ne_new = nh * nHp + yy * nHep + 2 * yy * nHepp
        # mild damping for robust convergence of the whole array
        return 0.5 * (ne + ne_new)

    ne = jax.lax.fori_loop(0, niter, body, ne0)
    # one undamped polish
    ne = body(0, ne) * 2 - ne
    ne = jnp.maximum(ne, 0.0)
    logt = jnp.log(get_temp_from_u(ne / nh, u_cgs, helium,
                                   params.MinGasTemp))
    return ne, logt


def get_heatingcooling_rate(rho_cgs, u_cgs, helium, redshift,
                            uvbg: UVBG, params: CoolingParams,
                            ne_init=None, metallicity=None,
                            metal_cool=None, extra_heat=0.0):
    """Net heating - cooling in erg/s/g (reference return convention).

    rho_cgs: physical density in g/cm^3 (converted internally to
    protons/cm^3 like the reference caller).
    metallicity + metal_cool (a MetalCoolingTable): subtract the
    cloudy net metal cooling scaled by Z (cooling_rates.cpp:1154).
    extra_heat: additional uniform heating in erg/s/g (the
    long-mean-free-path HeII term, cooling.cpp:46-50).
    Returns (lambda_net, ne/nh).
    """
    density = rho_cgs / PROTONMASS   # protons/cm^3
    nh = density * (1 - helium)
    ne, logt = get_equilib_ne(nh, u_cgs, helium, uvbg, params,
                              ne_init=ne_init)
    nebynh = ne / nh
    temp = get_temp_from_u(nebynh, u_cgs, helium, params.MinGasTemp)
    photofac = self_shield_corr(nh, logt, uvbg.self_shield_dens,
                                params.SelfShieldingOn)
    yy = helium / 4 / (1 - helium)
    nH0, nHp, nHe0, nHep, nHepp = _species(nh, logt, ne, uvbg, photofac)
    nHe0 = nHe0 * yy / nh
    nHep = nHep * yy / nh
    nHepp = nHepp * yy / nh

    lam_collis = nebynh * (cool_CollisionalH0(temp) * nH0
                           + cool_CollisionalHe0(temp) * nHe0
                           + cool_CollisionalHeP(temp) * nHep)
    lam_recomb = nebynh * (cool_RecombHp(temp) * nHp
                           + cool_RecombHeP(temp) * nHep
                           + cool_RecombHePP(temp) * nHepp)
    cff = cool_FreeFree1(temp)
    lam_ff = nebynh * (cff * (nHp + nHep) + 4 * cff * nHepp)
    lam_cmptn = nebynh * cool_InverseCompton(
        temp, redshift, params.CMBTemperature) / nh
    lam = lam_collis + lam_recomb + lam_ff + lam_cmptn

    heat = (nH0 * (uvbg.epsH0 * LAMSCALE)
            + nHe0 * (uvbg.epsHe0 * LAMSCALE)
            + nHep * (uvbg.epsHep * LAMSCALE)) / nh
    lambda_net = heat - lam
    # (scaled) erg/s cm^3 per proton -> erg/s/g; the scale constant is
    # computed in python f64 so no f32 intermediate leaves [1e-10, 1e10]
    conv = (1 - helium) ** 2 / (LAMSCALE * PROTONMASS)
    out = lambda_net * conv * density
    if metal_cool is not None and metallicity is not None:
        out = out - metallicity * metal_cool.eval(redshift, temp, nh)
    return out + extra_heat, nebynh


def get_neutral_fraction(rho_cgs, u_cgs, helium, uvbg: UVBG,
                         params: CoolingParams, ne_init=None):
    """nH0/nH (the reference get_neutral_fraction_phys_cgs)."""
    density = rho_cgs / PROTONMASS
    nh = density * (1 - helium)
    ne, logt = get_equilib_ne(nh, u_cgs, helium, uvbg, params,
                              ne_init=ne_init)
    photofac = self_shield_corr(nh, logt, uvbg.self_shield_dens,
                                params.SelfShieldingOn)
    nH0, *_ = _species(nh, logt, ne, uvbg, photofac)
    return nH0


BISECT_ITERS = 50
BRACKET_ITERS = 45


def do_cooling(u_old_cgs, rho_cgs, dt_s, helium, redshift, uvbg: UVBG,
               params: CoolingParams, min_egyspec_cgs=0.0, ne_init=None,
               metallicity=None, metal_cool=None, extra_heat=0.0):
    """Implicit cooling update: solve u = u_old + LambdaNet(u) dt.

    Vectorized version of the reference bisection (cooling.cpp:57-135):
    geometric bracket growth by 1.1x, then fixed-count bisection.
    metallicity/metal_cool/extra_heat are forwarded to the rate (metal
    cooling + HeII long-MFP heating).
    Returns (u_new_cgs, ne/nh at the solution).
    """
    u_old = jnp.maximum(u_old_cgs, min_egyspec_cgs)

    def lamdt(u, ne):
        ln, nebynh = get_heatingcooling_rate(
            rho_cgs, u, helium, redshift, uvbg, params, ne_init=ne,
            metallicity=metallicity, metal_cool=metal_cool,
            extra_heat=extra_heat)
        return ln * dt_s, nebynh

    ne = (jnp.ones_like(u_old) if ne_init is None else ne_init)
    f0, ne = lamdt(u_old, ne)
    heating = (u_old - u_old - f0) < 0   # -f0 < 0 means heating

    def bracket_body(i, carry):
        lo, hi, ne = carry
        f_hi, ne = lamdt(hi, ne)
        f_lo, ne2 = lamdt(lo, ne)
        need_up = heating & (hi - u_old - f_hi < 0)
        need_dn = (~heating) & (lo - u_old - f_lo > 0) \
            & (hi > min_egyspec_cgs)
        lo = jnp.where(need_up, hi, jnp.where(need_dn, lo / 1.1, lo))
        hi = jnp.where(need_up, hi * 1.1, jnp.where(need_dn,
                                                    lo * 1.1, hi))
        return lo, hi, ne2

    lo = jnp.where(heating, u_old, u_old / 1.1)
    hi = jnp.where(heating, u_old * 1.1, u_old)
    lo, hi, ne = jax.lax.fori_loop(0, BRACKET_ITERS, bracket_body,
                                   (lo, hi, ne))
    lo = jnp.maximum(lo, min_egyspec_cgs * 0.1 + 1e-30)

    def bisect_body(i, carry):
        lo, hi, ne = carry
        u = 0.5 * (lo + hi)
        f, ne = lamdt(u, ne)
        above = (u - u_old - f) > 0
        hi = jnp.where(above, u, hi)
        lo = jnp.where(above, lo, u)
        return lo, hi, ne

    lo, hi, ne = jax.lax.fori_loop(0, BISECT_ITERS, bisect_body,
                                   (lo, hi, ne))
    u = jnp.maximum(0.5 * (lo + hi), min_egyspec_cgs)
    return u, ne
