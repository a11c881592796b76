"""Run statistics outputs: energy.txt, sfr.txt (stats.cpp analog)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .constants import GAMMA_MINUS1


def _energy_reduce(mask, mass, vel, pot, ptype, dens, entr, atime):
    """Device-side energy sums (one host pull of 3 scalars instead
    of ~7 full-array pulls per step over the axon tunnel)."""
    import jax.numpy as jnp
    m = jnp.where(mask, mass, 0.0)
    ekin = 0.5 * jnp.sum(m * jnp.sum(vel ** 2, axis=1)) / atime ** 2
    epot = 0.5 * jnp.sum(m * pot)
    eint = jnp.float32(0.0)
    if dens is not None:
        ngg = dens.shape[0]
        gm = mask[:ngg] & (ptype[:ngg] == 0)
        u = jnp.nan_to_num(entr * jnp.maximum(dens, 1e-35)
                           ** GAMMA_MINUS1 / GAMMA_MINUS1)
        eint = jnp.sum(jnp.where(gm, mass[:ngg] * u, 0.0))
    return jnp.stack([eint, epot, ekin])


_energy_reduce_jit = None


def energy_statistics_fast(fd, atime, particles, sph=None):
    """energy.txt line via a single jitted device reduction."""
    import jax
    global _energy_reduce_jit
    if _energy_reduce_jit is None:
        _energy_reduce_jit = jax.jit(_energy_reduce,
                                     static_argnames=())
    dens = sph.density if sph is not None else None
    entr = sph.entropy if sph is not None else None
    if dens is None:
        # no-gas trace: reuse the same program shape with dummies
        vals = _energy_reduce_jit(
            particles.mask, particles.mass, particles.vel,
            particles.potential, particles.ptype, None, None, atime)
    else:
        vals = _energy_reduce_jit(
            particles.mask, particles.mass, particles.vel,
            particles.potential, particles.ptype, dens, entr, atime)
    eint, epot, ekin = [float(x) for x in np.asarray(vals)]
    fd.write(f"{atime:g} {np.nan_to_num(eint):g} {epot:g} "
             f"{ekin:g}\n")
    fd.flush()


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


_KBH = 64
_bh_gather_jit = None


def _bh_gather(mask, ptype, bh_mass, bh_mdot, dens_g, ipos, vel,
               id_lo, id_hi, boxsize):
    """Gather all alive-BH rows into a fixed 64-lane bucket on
    device: one small host pull replaces the ~8 full-array pulls the
    per-step blackholes.txt/BHDetails writers used to make."""
    import jax.numpy as jnp
    from ..core.particles import ipos_to_float
    n = mask.shape[0]
    alive = mask & (ptype == 5) & (bh_mass > 0)
    nbh = jnp.sum(alive)
    idx = jnp.nonzero(alive, size=_KBH, fill_value=n)[0]
    c = jnp.minimum(idx, n - 1)
    lane = jnp.arange(_KBH) < nbh
    dens = jnp.zeros((n,), dens_g.dtype).at[:dens_g.shape[0]] \
        .set(dens_g)
    pos = ipos_to_float(ipos[c], boxsize)
    return (nbh,
            jnp.where(lane, bh_mass[c], 0.0),
            jnp.where(lane, bh_mdot[c], 0.0),
            jnp.where(lane, dens[c], 0.0),
            jnp.where(lane[:, None], pos, 0.0),
            jnp.where(lane[:, None], vel[c], 0.0),
            jnp.where(lane, id_lo[c], 0),
            jnp.where(lane, id_hi[c], 0))


def bh_statistics_fast(fd_bh, fd_bhdet, atime, particles, gas,
                       boxsize, units):
    """blackholes.txt + BHDetails records from one device gather."""
    import jax
    global _bh_gather_jit
    if _bh_gather_jit is None:
        _bh_gather_jit = jax.jit(_bh_gather, static_argnames=())
    p = particles
    out = jax.device_get(_bh_gather_jit(
        p.mask, p.ptype, gas.bh_mass, gas.bh_mdot, gas.density,
        p.ipos, p.vel, p.id_lo, p.id_hi, boxsize))
    nbh = int(out[0])
    if nbh == 0:
        return 0
    m, md, dens, pos, vel, idlo, idhi = [np.asarray(x)[:nbh]
                                         for x in out[1:]]
    from .constants import (GRAVITY, LIGHTCGS, PROTONMASS, THOMPSON,
                            SOLAR_MASS, SEC_PER_YEAR)
    mtot = float(m.sum())
    mdot = float(md.sum())
    medd = float((md / np.maximum(m, 1e-35)).sum())
    mdot_msun_yr = mdot * (units.UnitMass_in_g / SOLAR_MASS) \
        / (units.UnitTime_in_s / SEC_PER_YEAR)
    medd /= ((4 * np.pi * GRAVITY * LIGHTCGS * PROTONMASS
              / (0.1 * LIGHTCGS ** 2 * THOMPSON))
             * units.UnitTime_in_s)
    if fd_bh is not None:
        fd_bh.write(f"{atime:g} {nbh} {mtot:g} {mdot:g} "
                    f"{mdot_msun_yr:g} {medd:g}\n")
        fd_bh.flush()
    if fd_bhdet is not None:
        rec = np.zeros(nbh, dtype=[
            ("ID", "<u8"), ("Time", "<f8"), ("Mass", "<f4"),
            ("Mdot", "<f4"), ("Density", "<f4"), ("Pos", "<f4", 3),
            ("Vel", "<f4", 3)])
        rec["ID"] = (idhi.astype(np.uint64) << np.uint64(32)) \
            | idlo.astype(np.uint64)
        rec["Time"] = atime
        rec["Mass"] = m
        rec["Mdot"] = md
        rec["Density"] = dens
        rec["Pos"] = pos
        rec["Vel"] = vel
        rec.tofile(fd_bhdet)
        fd_bhdet.flush()
    return nbh


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
