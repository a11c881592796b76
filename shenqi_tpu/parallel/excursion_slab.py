"""Distributed excursion-set reionization (uvbg.cpp on the slab mesh).

The single-device pass (physics/excursion.calculate_uvbg) deposits
three UVBGdim^3 grids (total mass, escaping stellar mass, escaping
SFR), runs the Rmax->Rmin filter ladder in k-space, and reads J21
back at particle positions.  Here the same dataflow runs distributed:

  * ONE route_rows layout exchange ships rows to their uniform
    UVBG-slab owner (cost-balanced domains only; uniform slab
    ownership is resolution-independent, so un-balanced runs deposit
    in place) — all three source grids share the routing;
  * three slab CIC deposits + ring halo reductions (the
    petapm.cpp:79-87 region exchange, as in parallel/pfft.py);
  * the filter ladder is ELEMENTWISE on the k-pencil (one r2c per
    grid, two c2r per radius rung) — the TPU-friendly part;
  * the J21 particle readout (max over the 8 CIC corner cells,
    uvbg.cpp:461-472) borrows halo planes back and routes the routed
    rows' J21 home.

Reference: libgadget/uvbg.cpp find_HII_bubbles + UVBG readout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.particles import POS_SCALE
from ..physics.excursion import (ExcursionSetParams, _filter_k,
                                 _r_to_m, radius_ladder)
from ..utils.constants import (HYDROGEN_MASSFRAC, PLANCK, PROTONMASS,
                               SEC_PER_YEAR, SOLAR_MASS)
from .domain import route_back, route_rows
from .pfft import pfft_c2r, pfft_r2c, pencil_kvec


class ExcursionConsts(NamedTuple):
    """Host-precomputed STATIC constants for the excursion pass —
    everything epoch-independent, so the jitted shard_map program is
    compiled once and reused every PM step.  The two epoch-dependent
    scalars ((1+z)^2 and the SFR normalisation) ride in as traced
    arguments to calculate_uvbg_slab."""
    n: int                  # UVBGdim
    radii: tuple            # descending R ladder
    rtoms: tuple            # _r_to_m per rung
    j21_base: tuple         # j21_const per rung WITHOUT the (1+z)^2
    filter_type: int
    use_particle_sfr: bool
    reion_eff: float
    deltax_conv: float
    pixvol: float
    boxsize: float


def excursion_consts(par: ExcursionSetParams, CP, units,
                     boxsize) -> ExcursionConsts:
    """Static part of calculate_uvbg's constant block."""
    n = par.UVBGdim
    y_he = 1.0 - HYDROGEN_MASSFRAC
    baryon_frac = CP.OmegaBaryon / CP.Omega0
    reion_eff = (1.0 / baryon_frac * par.ReionNionPhotPerBary
                 / (1.0 - 0.75 * y_he))
    tot_cells = float(n) ** 3
    pixvol = (boxsize / n) ** 3
    deltax_conv = tot_cells / (CP.RhoCrit * CP.Omega0 * boxsize ** 3)
    radii = radius_ladder(par, boxsize)

    def j21_base(R):
        return (1.0 / (4 * np.pi) * par.AlphaUV
                * PLANCK * 1e21 * R * units.UnitLength_in_cm
                * par.ReionNionPhotPerBary / PROTONMASS
                * units.UnitMass_in_g / units.UnitLength_in_cm ** 3
                / units.UnitTime_in_s)

    return ExcursionConsts(
        n=n, radii=tuple(radii),
        rtoms=tuple(_r_to_m(R, par, CP.Omega0, CP.RhoCrit)
                    for R in radii),
        j21_base=tuple(j21_base(R) for R in radii),
        filter_type=par.ReionFilterType,
        use_particle_sfr=bool(par.ReionUseParticleSFR),
        reion_eff=reion_eff, deltax_conv=deltax_conv, pixvol=pixvol,
        boxsize=boxsize)


def excursion_epoch_scalars(par: ExcursionSetParams, CP, units,
                            atime):
    """(zsq, sfr_norm) for this epoch: the dynamic arguments."""
    redshift = 1.0 / atime - 1.0
    zsq = (1.0 + redshift) ** 2
    if par.ReionUseParticleSFR:
        sfr_norm = (1.0 / (units.UnitMass_in_g / SOLAR_MASS)
                    * (units.UnitTime_in_s / SEC_PER_YEAR))
    else:
        hubble_time = 1.0 / (float(CP.hubble_function(atime))
                             * CP.HubbleParam)
        sfr_norm = 1.0 / (par.ReionSFRTimescale * hubble_time)
    return np.float32(zsq), np.float32(sfr_norm)


def _deposit3_slab(ipos, m_all, m_star, m_sfr, n, ndev, axis_name,
                   halo, mask, cuts_in, route_kcap):
    """Three slab CIC deposits sharing ONE layout routing.

    Returns (slab_mass, slab_star, slab_sfr, ipos_dep, dep_mask,
    stay, route_state, n_lost)."""
    from ..ops.cic import cic_deposit_slab

    nloc = n // ndev
    me = jax.lax.axis_index(axis_name)
    x0 = (me * nloc).astype(jnp.int32)
    n_lost = jnp.zeros((), jnp.int32)
    route_state = None
    stay = None
    ipos_dep = ipos
    cols = {"ma": m_all, "ms": m_star, "mf": m_sfr}
    dep_mask = mask
    if cuts_in is not None and ndev > 1:
        l = int(np.log2(ndev))
        udest = (ipos[:, 0] >> jnp.uint32(32 - l)).astype(jnp.int32)
        stay = mask & (udest == me)
        kcap = route_kcap or ipos.shape[0]
        recv, rvalid, route_state, n_lost = route_rows(
            dict(cols, ipos=ipos), udest, mask, ndev, kcap,
            axis_name)
        ipos_dep = jnp.concatenate([ipos, recv["ipos"]])
        cols = {k: jnp.concatenate([v, recv[k]])
                for k, v in cols.items()}
        dep_mask = jnp.concatenate([stay, rvalid])

    to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    to_right = [(i, (i + 1) % ndev) for i in range(ndev)]

    def dep(m):
        buf = cic_deposit_slab(ipos_dep, m, n, nloc, halo, x0,
                               mask=dep_mask)
        if ndev > 1:
            from_right = jax.lax.ppermute(buf[:halo], axis_name,
                                          to_left)
            from_left = jax.lax.ppermute(buf[nloc + halo:],
                                         axis_name, to_right)
            slab = buf[halo: halo + nloc]
            slab = slab.at[:halo].add(from_left)
            slab = slab.at[nloc - halo:].add(from_right)
        else:
            slab = buf[halo: halo + nloc]
            slab = slab.at[:halo].add(buf[nloc + halo:])
            slab = slab.at[nloc - halo:].add(buf[:halo])
        return slab

    return (dep(cols["ma"]), dep(cols["ms"]), dep(cols["mf"]),
            ipos_dep, dep_mask, stay, route_state, n_lost)


def calculate_uvbg_slab(ipos, mass, ptyp, sfr, fesc, zsq, sfr_norm,
                        cst: ExcursionConsts, ndev: int,
                        axis_name: str = "dp", halo: int = 2,
                        mask=None, cuts_in=None, route_kcap: int = 0):
    """One distributed find_HII_bubbles pass (shard_map body).

    ipos [C,3] uint32, mass/sfr/fesc [C] f32, ptyp [C] i32 — this
    device's rows.  Returns (j21_rows [C], vol_xhi, mass_xhi,
    n_lost): per-ROW J21 in the caller's layout, global neutral
    fractions (replicated scalars).
    """
    n = cst.n
    nloc = n // ndev
    if mask is None:
        mask = mass > 0
    is_gas = mask & (ptyp == 0)
    is_star = mask & (ptyp == 4)
    m_all = jnp.where(mask, mass, 0.0)
    m_star = jnp.where(is_star, mass * fesc, 0.0)
    m_sfr = jnp.where(is_gas, sfr * fesc, 0.0) \
        if cst.use_particle_sfr else jnp.zeros_like(sfr)

    (g_mass, g_star, g_sfr, ipos_dep, dep_mask, stay, route_state,
     n_lost) = _deposit3_slab(ipos, m_all, m_star, m_sfr, n, ndev,
                              axis_name, halo, mask, cuts_in,
                              route_kcap)

    mass_k = pfft_r2c(g_mass, axis_name)
    star_k = pfft_r2c(g_star, axis_name)
    sfr_k = pfft_r2c(g_sfr, axis_name) if cst.use_particle_sfr \
        else None

    kx, ky, kz = pencil_kvec(n, axis_name)
    k_mag = jnp.sqrt(kx * kx + ky * ky + kz * kz) * jnp.float32(
        2 * np.pi / cst.boxsize)

    j21 = jnp.zeros((nloc, n, n), jnp.float32)
    xhi = jnp.ones((nloc, n, n), jnp.float32)
    last_i = len(cst.radii) - 1
    for i, R in enumerate(cst.radii):
        filt = _filter_k(k_mag, jnp.float32(R), cst.filter_type)
        m_real = jnp.maximum(pfft_c2r(mass_k * filt, n, axis_name),
                             0.0)
        s_real = jnp.maximum(pfft_c2r(star_k * filt, n, axis_name),
                             0.0)
        dom = jnp.maximum(m_real * cst.deltax_conv, 1e-35)
        fcoll = (s_real / (cst.rtoms[i] * dom)
                 * (4.0 / 3.0) * np.pi * R ** 3 / cst.pixvol)
        if cst.use_particle_sfr:
            f_real = jnp.maximum(pfft_c2r(sfr_k * filt, n,
                                          axis_name), 0.0)
            sfr_density = f_real / cst.pixvol * sfr_norm
        else:
            sfr_density = s_real * sfr_norm / cst.pixvol
        j21_aux = sfr_density * (zsq * jnp.float32(cst.j21_base[i]))
        ionized = fcoll > 1.0 / cst.reion_eff
        j21 = jnp.where(ionized & (xhi > 1e-6), j21_aux, j21)
        xhi = jnp.where(ionized, 0.0, xhi)
        if i == last_i:
            xhi = jnp.where(~ionized & (xhi > 1e-6),
                            jnp.clip(1.0 - fcoll * cst.reion_eff,
                                     0.0, 1.0), xhi)

    # global neutral fractions (uvbg.cpp:425-458)
    dom = g_mass * cst.deltax_conv
    vol_xhi = jax.lax.psum(jnp.sum(xhi), axis_name) / float(n) ** 3
    mass_xhi = (jax.lax.psum(jnp.sum(xhi * dom), axis_name)
                / jnp.maximum(jax.lax.psum(jnp.sum(dom), axis_name),
                              1e-35))

    # particle readout: MAX J21 over the 8 CIC corner cells
    # (uvbg.cpp:461-472) on the halo-extended slab
    to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
    if ndev > 1:
        lo_ext = jax.lax.ppermute(j21[nloc - halo:], axis_name,
                                  to_right)
        hi_ext = jax.lax.ppermute(j21[:halo], axis_name, to_left)
    else:
        lo_ext = j21[nloc - halo:]
        hi_ext = j21[:halo]
    ext = jnp.concatenate([lo_ext, j21, hi_ext])

    me = jax.lax.axis_index(axis_name)
    x0 = (me * nloc).astype(jnp.int32)
    cellf = jnp.asarray(ipos_dep, jnp.float32) * jnp.float32(
        n / POS_SCALE)
    i0 = jnp.floor(cellf).astype(jnp.int32)
    j21p = jnp.zeros(ipos_dep.shape[0], jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ii = i0[:, 0] + dx - x0 + halo
                ii = jnp.clip(ii, 0, ext.shape[0] - 1)
                jj = (i0[:, 1] + dy) % n
                kk = (i0[:, 2] + dz) % n
                j21p = jnp.maximum(j21p, ext[ii, jj, kk])
    j21p = jnp.where(dep_mask, j21p, 0.0)

    if route_state is not None:
        C = ipos.shape[0]
        back = route_back(j21p[C:], route_state, axis_name)
        j21p = jnp.where(stay, j21p[:C], back)
    return j21p, vol_xhi, mass_xhi, n_lost
