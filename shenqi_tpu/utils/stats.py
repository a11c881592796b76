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


def sfr_statistics(fd, atime, total_sm, total_sfr, dtime):
    """Append one line to sfr.txt: scale factor, expected mass formed,
    total SFR (Msun/yr), actual mass formed (sfr.txt layout)."""
    fd.write(f"{atime:g} {total_sm:g} {total_sfr:g} {dtime:g}\n")
    fd.flush()
