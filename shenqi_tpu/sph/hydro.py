"""SPH hydro accelerations (hydra2.cpp / hydratree2.hpp analog).

Physics identical to the reference hydro walk
(libgadget/hydratree2.hpp:230-380):
  * symmetric kernel: pairs interact if r < max(H_i, H_j)
  * pressure-entropy or density-entropy EOM with grad-h correction terms
  * Monaghan artificial viscosity with Balsara switch (Gadget-2 eq 13-14)
    and the viscosity limiter against the particle timestep
  * signal velocity tracking (for the Courant condition)
  * DtEntropy from the viscous dissipation, converted to entropy rate
    with GAMMA_MINUS1 / (hubble a^2 rho^{gamma-1})

All comoving-coordinate factors (fac_mu, fac_vsic_fix, hubble_a2) match
the reference HydroPriv.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tree import Octree
from ..ops.treewalk import run_walk
from ..utils.constants import GAMMA, GAMMA_MINUS1
from .kernels import KernelSpec, CUBIC, dwk as kern_dwk


class HydroParams(NamedTuple):
    """STATIC hydro configuration.  Time-dependent comoving factors
    (fac_mu/fac_vsic_fix/hubble_a2, the reference HydroPriv fields)
    are deliberately NOT here: they change every step, and as part of
    a jit-static argument they would force a recompile per step.
    They ride in as dynamic per-target columns via
    `hydro_time_factors` instead."""
    boxsize: float
    atime: float = 1.0     # retained for backward compat; NOT used by
    hubble: float = 0.1    # the walks when tf overrides are given

    art_bulk_visc_const: float = 0.75
    density_contrast_limit: float = 2.0
    density_independent_sph: bool = True

    @property
    def fac_mu(self):
        return self.atime ** (3 * (GAMMA - 1) / 2) / self.atime

    @property
    def fac_vsic_fix(self):
        return self.hubble * self.atime ** (3 * GAMMA_MINUS1)

    @property
    def hubble_a2(self):
        return self.hubble * self.atime ** 2

    def static_key(self):
        """The recompile-relevant subset."""
        return self._replace(atime=1.0, hubble=0.1)


def hydro_time_factors(atime, hubble):
    """Dynamic (traced) comoving factors for the hydro walk."""
    atime = jnp.float32(atime)
    hubble = jnp.float32(hubble)
    return {
        "fac_mu": atime ** (3 * (GAMMA - 1) / 2) / atime,
        "fac_vsic_fix": hubble * atime ** (3 * GAMMA_MINUS1),
        "hubble_a2": hubble * atime ** 2,
    }


class HydroResult(NamedTuple):
    accel: jax.Array          # [T,3] comoving hydro acceleration
    dt_entropy: jax.Array     # [T] entropy change rate
    max_signal_vel: jax.Array # [T]


def pressure_predict(eomdensity, entvar):
    p = entvar * eomdensity
    return jnp.where(p > 0, jnp.exp(GAMMA * jnp.log(jnp.maximum(
        p, 1e-35))), 0.0)


def _hydro_accum(spec: KernelSpec, par: HydroParams):
    def accumulate(carry, extra, tpos, src, dist, r2, live):
        acc, dts, maxvsig = carry
        H_i = extra["hsml"]
        H_j = src["hsml"]
        inside = live & (r2 > 0) & ((r2 < H_i * H_i) | (r2 < H_j * H_j)) \
            & (src["mass"] > 0) & (~src["decoupled"])
        w = jnp.where(inside, 1.0, 0.0)
        # sanitize padded/masked lanes BEFORE any division: a NaN times
        # zero weight is still NaN
        H_j = jnp.where(inside, H_j, 1.0)

        # j-side predicted state
        density_j = src["density"]
        eomdensity_j = src["eomdensity"]
        entvar_j = src["entvar"]
        press_j = src["pressure"]
        p_over_rho2_j = press_j / jnp.maximum(eomdensity_j, 1e-35) ** 2
        cs_j = jnp.sqrt(GAMMA * press_j
                        / jnp.maximum(eomdensity_j, 1e-35))

        cs_i = extra["soundspeed"]
        p_over_rho2_i = extra["p_over_rho2"]

        vsig_pair = cs_i + cs_j
        maxvsig = jnp.maximum(maxvsig, jnp.max(
            jnp.where(inside, vsig_pair, 0.0)))

        dv = extra["vel"][None, :] - src["vel"]
        vdotr = jnp.sum(dist * dv, axis=-1)
        vdotr2 = vdotr + extra["hubble_a2"] * r2
        r = jnp.sqrt(jnp.maximum(r2, 1e-35))

        dwk_i = kern_dwk(spec, jnp.minimum(r / H_i, 1.0), H_i)
        dwk_j = kern_dwk(spec, jnp.minimum(r / H_j, 1.0), H_j)

        # artificial viscosity (Gadget-2 eq 13-14) where approaching
        approach = vdotr2 < 0
        mu_ij = extra["fac_mu"] * vdotr2 / r
        rho_ij = 0.5 * (extra["density"] + density_j)
        vsig_visc = cs_i + cs_j - 3 * mu_ij
        maxvsig = jnp.maximum(maxvsig, jnp.max(
            jnp.where(inside & approach, vsig_visc, 0.0)))
        f2 = jnp.abs(src["divvel"]) / (
            jnp.abs(src["divvel"]) + src["curlvel"]
            + 0.0001 * cs_j / extra["fac_mu"] / jnp.maximum(H_j, 1e-35))
        visc = (0.25 * par.art_bulk_visc_const * vsig_visc * (-mu_ij)
                / jnp.maximum(rho_ij, 1e-35) * (extra["f1"] + f2))
        # viscosity limiter against the timestep
        dloga = 2 * jnp.maximum(extra["dloga"], src["dloga"])
        denom = (0.5 * (extra["mass"] + src["mass"])
                 * (dwk_i + dwk_j) * r * dloga)
        visc_lim = 0.5 * extra["fac_vsic_fix"] * vdotr2 / jnp.where(
            jnp.abs(denom) > 0, denom, 1.0)
        apply_lim = (dloga > 0) & ((dwk_i + dwk_j) < 0) \
            & (extra["mass"] + src["mass"] > 0)
        visc = jnp.where(apply_lim, jnp.minimum(visc, visc_lim), visc)
        visc = jnp.where(approach, visc, 0.0)

        hfc_visc = 0.5 * src["mass"] * visc * (dwk_i + dwk_j) / r
        hfc = hfc_visc
        if par.density_independent_sph:
            rr1 = jnp.zeros_like(r)
            rr2 = jnp.zeros_like(r)
            entvar_i = extra["entvar"]
            hfc = hfc + src["mass"] * (
                dwk_i * p_over_rho2_i * entvar_j
                / jnp.maximum(entvar_i, 1e-35)
                + dwk_j * p_over_rho2_j * entvar_i
                / jnp.maximum(entvar_j, 1e-35)) / r
            if par.density_contrast_limit >= 0:
                rr1 = extra["egyrho"] / jnp.maximum(extra["density"],
                                                    1e-35)
                rr2 = eomdensity_j / jnp.maximum(density_j, 1e-35)
                if par.density_contrast_limit > 0:
                    rr1 = jnp.minimum(rr1, par.density_contrast_limit)
                    rr2 = jnp.minimum(rr2, par.density_contrast_limit)
        else:
            rr1 = jnp.ones_like(r)
            rr2 = jnp.ones_like(r)
        hfc = hfc + src["mass"] * (
            p_over_rho2_i * extra["dhsml"] * dwk_i * rr1
            + p_over_rho2_j * src["dhsml_egy"] * dwk_j * rr2) / r

        hfc = jnp.where(inside, hfc, 0.0)
        hfc_visc = jnp.where(inside, hfc_visc, 0.0)
        acc = acc - jnp.sum(hfc[:, None] * dist, axis=0)
        dts = dts + jnp.sum(0.5 * hfc_visc * vdotr2)
        return acc, dts, maxvsig

    return accumulate


@partial(jax.jit, static_argnames=("spec", "par"))
def hydro_walk(tree: Octree, payload, targets, par: HydroParams,
               spec: KernelSpec = CUBIC, tf=None) -> HydroResult:
    """Hydro force walk.

    payload (tree-sorted): ipos, mass, hsml, vel, density, eomdensity,
      entvar, pressure, divvel, curlvel, dhsml_egy, dloga, decoupled.
    targets: dict of per-target arrays: ipos, vel, hsml, mass, density,
      egyrho (EOM density), entvar, pressure, f1 (Balsara), dhsml
      (DhsmlDensityFactor for the i-side grad-h), dloga.
    """
    t = targets["ipos"].shape[0]
    carry0 = (jnp.zeros((t, 3), jnp.float32), jnp.zeros(t, jnp.float32),
              jnp.zeros(t, jnp.float32))
    extra = _hydro_extra(targets, par, t, tf)
    # symmetric walk: search radius is own hsml; node hmax covers j side
    out = run_walk(tree, payload, targets["ipos"], targets["hsml"],
                   extra, carry0,
                   _hydro_accum_cached(spec, par.static_key()),
                   par.boxsize, symmetric=True)
    acc, dts, maxvsig = out
    # entropy rate conversion (hydratree2.hpp:140)
    hub_a2 = (tf or {}).get("hubble_a2", par.hubble_a2)
    dts = dts * GAMMA_MINUS1 / (hub_a2 * jnp.maximum(
        targets["density"], 1e-35) ** GAMMA_MINUS1)
    return HydroResult(accel=acc, dt_entropy=dts, max_signal_vel=maxvsig)


def hydro_walk_dense(payload, targets, par: HydroParams,
                     spec: KernelSpec = CUBIC, tf=None) -> HydroResult:
    """hydro_walk against EVERY source (run_walk_dense oracle):
    identical physics — the accumulator applies the symmetric
    max(H_i,H_j) radius cut itself — with HBM-bounded staging.  Used
    for the overflow tails the blocked/stencil engines flag, where the
    vmapped tree walk's batched gathers OOM (ops/treewalk.py)."""
    from ..ops.treewalk import run_walk_dense
    t = targets["ipos"].shape[0]
    carry0 = (jnp.zeros((t, 3), jnp.float32),
              jnp.zeros(t, jnp.float32), jnp.zeros(t, jnp.float32))
    extra = _hydro_extra(targets, par, t, tf)
    out = run_walk_dense(payload, targets["ipos"], extra, carry0,
                         _hydro_accum_cached(spec, par.static_key()),
                         par.boxsize)
    acc, dts, maxvsig = out
    hub_a2 = (tf or {}).get("hubble_a2", par.hubble_a2)
    dts = dts * GAMMA_MINUS1 / (hub_a2 * jnp.maximum(
        targets["density"], 1e-35) ** GAMMA_MINUS1)
    return HydroResult(accel=acc, dt_entropy=dts, max_signal_vel=maxvsig)


_HYDRO_ACCUM_CACHE = {}


def _hydro_accum_cached(spec, par_static):
    key = (spec, par_static)
    accum = _HYDRO_ACCUM_CACHE.get(key)
    if accum is None:
        accum = _hydro_accum(spec, par_static)
        _HYDRO_ACCUM_CACHE[key] = accum
    return accum


def _hydro_extra(targets, par, t, tf=None):
    """Targets + derived columns + time factors broadcast to [T].

    The time factors are DATA, not static config, so distinct times
    share one compiled walk (tf from hydro_time_factors; falls back to
    par's legacy atime/hubble properties)."""
    press = targets["pressure"]
    egyrho = jnp.maximum(targets["egyrho"], 1e-35)
    extra = dict(targets)
    extra["soundspeed"] = jnp.sqrt(GAMMA * press / egyrho)
    extra["p_over_rho2"] = press / (egyrho * egyrho)
    if tf is None:
        tf = {"fac_mu": jnp.float32(par.fac_mu),
              "fac_vsic_fix": jnp.float32(par.fac_vsic_fix),
              "hubble_a2": jnp.float32(par.hubble_a2)}
    for k, v in tf.items():
        extra[k] = jnp.broadcast_to(jnp.float32(v), (t,))
    return extra


def hydro_walk_blocked(tree: Octree, payload, targets,
                       par: HydroParams, spec: KernelSpec = CUBIC,
                       ncrit: int = 32, block: int = 64,
                       maxl: int = 64, nb: int = None,
                       level: int = None, tf=None):
    """Blocked-engine hydro force (production TPU path; see
    ops/treewalk.run_walk_blocked).  Same physics as hydro_walk.
    Returns (HydroResult, info dict with overflow flags)."""
    from ..ops.treewalk import run_walk_blocked
    from ..ops.blockwalk import auto_block_level

    t = targets["ipos"].shape[0]
    if nb is None:
        nb = max(2 * ((t + block - 1) // block), 8)
        nb = 1 << (nb - 1).bit_length()
    if level is None:
        level = auto_block_level(t, block)
    carry0 = (jnp.zeros((t, 3), jnp.float32),
              jnp.zeros(t, jnp.float32), jnp.zeros(t, jnp.float32))
    extra = _hydro_extra(targets, par, t, tf)
    accum = _hydro_accum_cached(spec, par.static_key())
    out, info = run_walk_blocked(
        tree, payload, targets["ipos"], targets["hsml"], extra,
        carry0, accum, par.boxsize, symmetric=True, block=block,
        maxl=maxl, ncrit=ncrit, level=level, nb=nb)
    acc, dts, maxvsig = out
    hub_a2 = (tf or {}).get("hubble_a2", par.hubble_a2)
    dts = dts * GAMMA_MINUS1 / (hub_a2 * jnp.maximum(
        targets["density"], 1e-35) ** GAMMA_MINUS1)
    return (HydroResult(accel=acc, dt_entropy=dts,
                        max_signal_vel=maxvsig), info)


def balsara_f1(divvel, curlvel, soundspeed, hsml, fac_mu):
    """Balsara viscosity switch for the target side."""
    return jnp.abs(divvel) / (jnp.abs(divvel) + curlvel
                              + 0.0001 * soundspeed / fac_mu
                              / jnp.maximum(hsml, 1e-35))
