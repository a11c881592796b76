"""Run statistics outputs: energy.txt, sfr.txt (stats.cpp analog)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .constants import GAMMA_MINUS1


def energy_statistics(fd, atime, particles, sph=None, boxsize=None):
    """Append one line to energy.txt: time, total internal energy,
    potential energy, kinetic energy (stats.cpp energy_statistics
    layout)."""
    mask = np.asarray(particles.mask)
    mass = np.asarray(particles.mass)[mask]
    vel = np.asarray(particles.vel)[mask]
    pot = np.asarray(particles.potential)[mask]
    # kinetic energy: internal velocity v = a^2 dx/dt; canonical KE
    # convention of the reference: 0.5 m (v/a)^2 * a... report raw
    ekin = 0.5 * float((mass * (vel ** 2).sum(axis=1)).sum()) / atime**2
    epot = 0.5 * float((mass * pot).sum())
    eint = 0.0
    if sph is not None:
        ptype = np.asarray(particles.ptype)[mask]
        # internal energy sum over gas: A rho^(gamma-1)/(gamma-1) m
        dens = np.asarray(sph.density)
        entr = np.asarray(sph.entropy)
        gasmask = np.asarray(particles.mask) & (
            np.asarray(particles.ptype) == 0)
        if gasmask.any():
            sl = slice(0, len(dens))
            gm = gasmask[sl]
            with np.errstate(invalid="ignore"):
                u = (entr[gm] * np.maximum(dens[gm], 1e-35)
                     ** GAMMA_MINUS1 / GAMMA_MINUS1)
            eint = float((np.asarray(particles.mass)[sl][gm]
                          * np.nan_to_num(u)).sum())
    fd.write(f"{atime:g} {eint:g} {epot:g} {ekin:g}\n")
    fd.flush()


def sfr_statistics(fd, atime, total_sm, totsfrrate,
                   rate_in_msunperyear, total_sum_mass_stars,
                   avg_dtime, total_sum_part, tot_newstars):
    """Append one line to sfr.txt in the reference's 8-column layout
    (sfr_eff.cpp write_sfr_txt / examples/star-small/check_results.py
    column list): scale factor, expected stellar mass formed (internal
    units), instantaneous SFR of active particles [Msun/yr], expected
    SFR from total_sm [Msun/yr], actual spawned stellar mass this step
    (internal units), mean active-particle timestep, number of
    star-forming particles, number of new stars this step."""
    fd.write(f"{atime:g} {total_sm:g} {totsfrrate:g} "
             f"{rate_in_msunperyear:g} {total_sum_mass_stars:g} "
             f"{avg_dtime:g} {int(total_sum_part)} "
             f"{int(tot_newstars)}\n")
    fd.flush()


def blackhole_statistics(fd, atime, bh_mass, bh_mdot, alive, units):
    """Append one line to blackholes.txt: time, N_bh, total subgrid
    mass, total Mdot (internal), Mdot in Msun/yr, mean Eddington ratio
    (bhinfo.cpp write_blackhole_txt layout)."""
    from .constants import (GRAVITY, LIGHTCGS, PROTONMASS, THOMPSON,
                            SOLAR_MASS, SEC_PER_YEAR)
    m = np.asarray(bh_mass)
    md = np.asarray(bh_mdot)
    sel = np.asarray(alive) & (m > 0)
    nbh = int(sel.sum())
    mtot = float(m[sel].sum())
    mdot = float(md[sel].sum())
    medd = float((md[sel] / np.maximum(m[sel], 1e-35)).sum())
    mdot_msun_yr = mdot * (units.UnitMass_in_g / SOLAR_MASS) \
        / (units.UnitTime_in_s / SEC_PER_YEAR)
    medd /= ((4 * np.pi * GRAVITY * LIGHTCGS * PROTONMASS
              / (0.1 * LIGHTCGS ** 2 * THOMPSON))
             * units.UnitTime_in_s)
    fd.write(f"{atime:g} {nbh} {mtot:g} {mdot:g} {mdot_msun_yr:g} "
             f"{medd:g}\n")
    fd.flush()


def bh_details(fd, atime, ids, bh_mass, bh_mdot, density, pos, vel,
               alive):
    """Append per-BH binary detail records (bhinfo.cpp
    collect_BH_info analog, simplified fixed layout:
    [u8 id, f8 time, f4 mass, f4 mdot, f4 density, 3f4 pos, 3f4 vel])."""
    sel = np.asarray(alive) & (np.asarray(bh_mass) > 0)
    idx = np.nonzero(sel)[0]
    if idx.size == 0:
        return 0
    rec = np.zeros(idx.size, dtype=[
        ("ID", "<u8"), ("Time", "<f8"), ("Mass", "<f4"),
        ("Mdot", "<f4"), ("Density", "<f4"), ("Pos", "<f4", 3),
        ("Vel", "<f4", 3)])
    rec["ID"] = np.asarray(ids)[idx]
    rec["Time"] = atime
    rec["Mass"] = np.asarray(bh_mass)[idx]
    rec["Mdot"] = np.asarray(bh_mdot)[idx]
    rec["Density"] = np.asarray(density)[idx]
    rec["Pos"] = np.asarray(pos)[idx]
    rec["Vel"] = np.asarray(vel)[idx]
    rec.tofile(fd)
    fd.flush()
    return idx.size
