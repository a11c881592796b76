"""Local DM velocity dispersion around gas (veldisp2.cpp analog).

Computes the 1-D dark-matter velocity dispersion within an adaptive
radius around each (star-forming) gas particle, used by the
sigma-dependent wind models (OFJT10/VS08): the wind speed is
WindSpeedFactor * sigma_DM and the mass loading sigma0^2/sigma^2.

The reference iterates the DM radius until it encloses the target
weighted neighbor number (vdispeffdmradius, veldisp2.cpp:216); here the
same hsml-style bisection drives a kernel-weighted walk over the DM
tree, accumulating sum(m), sum(m v), sum(m v^2).
Run once per PM step (run.cpp:662-663).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tree import Octree, build_octree
from ..ops.treewalk import run_walk
from ..sph.kernels import CUBIC, wk as kern_wk, volume, desnumngb
from ..sph.density import HsmlState, update_hsml


def _veldisp_accum(carry, extra, tpos, src, dist, r2, live):
    ngb, msum, vsum, v2sum = carry
    H = extra["radius"]
    inside = live & (r2 < H * H) & src["alive"]
    w = jnp.where(inside, 1.0, 0.0)
    u = jnp.minimum(jnp.sqrt(r2) / jnp.maximum(H, 1e-35), 1.0)
    wk = kern_wk(CUBIC, u, jnp.maximum(H, 1e-35))
    m = src["mass"]
    ngb = ngb + jnp.sum(w * wk) * volume(H)
    msum = msum + jnp.sum(w * m)
    vsum = vsum + jnp.sum((w * m)[:, None] * src["vel"], axis=0)
    v2sum = v2sum + jnp.sum(w * m * jnp.sum(src["vel"] ** 2, axis=-1))
    return ngb, msum, vsum, v2sum


@partial(jax.jit)
def _veldisp_walk(tree: Octree, payload, target_ipos, radius, boxsize):
    t = target_ipos.shape[0]
    z = lambda *s: jnp.zeros(s, jnp.float32)
    carry0 = (z(t), z(t), z(t, 3), z(t))
    extra = {"radius": radius}
    return run_walk(tree, payload, target_ipos, radius, extra, carry0,
                    _veldisp_accum, boxsize, symmetric=False)


def _veldisp_walk_blocked(tree, payload, target_ipos, radius, boxsize,
                          ncrit, caps):
    """Blocked engine (production TPU path); caps dict is mutated to
    grow maxl/nb across the bisection loop."""
    from ..ops.treewalk import run_walk_blocked, TreeTooShallow

    t = target_ipos.shape[0]
    z = lambda *s: jnp.zeros(s, jnp.float32)
    carry0 = (z(t), z(t), z(t, 3), z(t))
    extra = {"radius": radius}
    if not caps.get("nb"):
        nb0 = max(2 * ((t + 63) // 64), 8)
        caps["nb"] = 1 << (nb0 - 1).bit_length()
    while True:
        out, info = run_walk_blocked(
            tree, payload, target_ipos, radius, extra, carry0,
            _veldisp_accum, boxsize, symmetric=False, ncrit=ncrit,
            maxl=caps["maxl"], nb=caps["nb"])
        if bool(info["leaf_truncated"]):
            raise TreeTooShallow("veldisp: leaf > ncrit")
        grew = False
        if bool(info["list_overflow"]):
            if caps["maxl"] >= 16384:
                raise RuntimeError("veldisp list cap overflow")
            caps["maxl"] *= 2
            grew = True
        if bool(info["block_overflow"]):
            nb0 = caps.get("nb") or max(2 * ((t + 63) // 64), 8)
            caps["nb"] = (1 << (nb0 - 1).bit_length()) * 2
            grew = True
        if not grew:
            return out


def dm_velocity_dispersion(dm_ipos, dm_vel, dm_mass, dm_alive,
                           gas_ipos, radius0, boxsize, atime,
                           nlevels=6, ncrit=32, target_ngb=40.0,
                           maxiter=20, engine="blocked"):
    """1-D physical velocity dispersion of DM around each gas target.

    radius0: initial search radii (e.g. 2x gas hsml).
    Returns (sigma_1d [T] physical internal units, radius [T],
    density [T] comoving mean DM density inside the radius — used by
    BH dynamical friction).
    """
    from ..ops.treewalk import TreeTooShallow

    while True:
        tree = build_octree(dm_ipos, dm_mass, dm_alive, boxsize,
                            nlevels=nlevels, ncrit=ncrit)
        order = tree.order
        payload = {"ipos": tree.ipos_s, "mass": tree.mass_s,
                   "vel": dm_vel[order], "alive": dm_alive[order]}
        t = gas_ipos.shape[0]
        state = HsmlState(hsml=jnp.asarray(radius0, jnp.float32),
                          left=jnp.zeros(t, jnp.float32),
                          right=jnp.full(t, boxsize, jnp.float32),
                          done=jnp.zeros(t, bool))
        caps = {"maxl": 64}

        def walk(rad):
            if engine == "blocked":
                return _veldisp_walk_blocked(tree, payload, gas_ipos,
                                             rad, boxsize, ncrit, caps)
            return _veldisp_walk(tree, payload, gas_ipos, rad, boxsize)

        try:
            out = None
            for _ in range(maxiter):
                out = walk(state.hsml)
                ngb = out[0]
                # density bisection with a rough dNgb/dR (3 Ngb/R)
                state = update_hsml(
                    state, ngb, -3.0 * ngb / jnp.maximum(
                        state.hsml, 1e-35), ngb, target_ngb, 2.0,
                    boxsize)
                if bool(jnp.all(state.done)):
                    break
            out = walk(state.hsml)
            break
        except TreeTooShallow:
            if nlevels >= 20:
                raise
            nlevels += 1
    ngb, msum, vsum, v2sum = out
    msafe = jnp.maximum(msum, 1e-35)
    vmean = vsum / msafe[:, None]
    v2mean = v2sum / msafe
    var3d = jnp.maximum(v2mean - jnp.sum(vmean ** 2, axis=-1), 0.0)
    # internal velocity v = a^2 dx/dt; peculiar v_pec = v/a
    sigma_1d = jnp.sqrt(var3d / 3.0) / atime
    vol = 4.0 / 3.0 * jnp.pi * jnp.maximum(state.hsml, 1e-35) ** 3
    return sigma_1d, state.hsml, msum / vol
