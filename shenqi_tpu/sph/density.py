"""SPH density with adaptive smoothing lengths (density2.cpp analog).

Physics identical to the reference density walk
(libgadget/densitytree2.hpp:362-425):
  per neighbor j within H_i:   u = r/H,  wk, dwk from the spline kernel
    Ngb      += wk * V(H)
    Rho      += m_j wk
    DhsmlRho += m_j dW/dH
    EgyRho   += m_j A_j^{1/gamma} wk        (pressure-entropy SPH)
    DhsmlEgy += m_j A_j^{1/gamma} dW/dH
    Div      += -m_j dwk/r (dist . dv)      (dist: j->i, dv = v_i - v_j)
    Rot      += m_j dwk/r (dv x dist)
    GradRho  += m_j dwk/r dist

and the adaptive-H loop (densitytree2.hpp:177-283 density_check_neighbours)
as a masked fixpoint: bisection bounds per particle, geometric-mean
updates, kernel-gradient bracket expansion.

The TPU shape: one vectorized walk over ALL unconverged particles per
iteration (the analog of the redo-queue in do_hsml_loop).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tree import Octree, build_octree
from ..ops.treewalk import run_walk
from ..core.particles import POS_SCALE
from .kernels import (KernelSpec, CUBIC, wk as kern_wk, dwk as kern_dwk,
                      dW_dH, volume, desnumngb, NUMDIMS)

MAXITER = 60


class DensityResult(NamedTuple):
    ngb: jax.Array          # kernel-weighted neighbor number
    rho: jax.Array
    dhsml_rho: jax.Array    # sum m dW/dH (raw)
    egy_rho: jax.Array
    dhsml_egy: jax.Array
    div: jax.Array
    rot: jax.Array          # [T,3]
    grad_rho: jax.Array     # [T,3]


def _density_accum(spec: KernelSpec):
    def accumulate(carry, extra, tpos, src, dist, r2, live):
        (ngb, rho, dh, egy, dhe, div, rot, grad) = carry
        H = extra["hsml"]
        vel_i = extra["vel"]
        inside = live & (r2 < H * H) & (src["mass"] > 0)
        w = jnp.where(inside, 1.0, 0.0)
        r = jnp.sqrt(r2)
        u = jnp.minimum(r / H, 1.0)
        wkv = kern_wk(spec, u, H)
        dwkv = kern_dwk(spec, u, H)
        dWdH = -(NUMDIMS * wkv / H + u * dwkv)
        m = src["mass"]
        ngb = ngb + jnp.sum(w * wkv) * volume(H)
        rho = rho + jnp.sum(w * m * wkv)
        dh = dh + jnp.sum(w * m * dWdH)
        # sanitize BEFORE weighting: excluded (dead/non-gas) rows can
        # carry non-finite entvar, and 0 * NaN = NaN
        entv = jnp.where(inside, src["entvar"], 0.0)
        egy = egy + jnp.sum(w * m * entv * wkv)
        dhe = dhe + jnp.sum(w * m * entv * dWdH)
        # velocity derivatives (skip r == 0)
        rpos = r > 0
        fac = jnp.where(rpos, m * dwkv / jnp.maximum(r, 1e-30), 0.0) * w
        # sanitize the j-side velocity BEFORE differencing: excluded
        # (dead) rows can carry non-finite predictions and
        # fac=0 * NaN = NaN
        v_j = jnp.where(inside[..., None], src["vel"], 0.0)
        dv = vel_i[None, :] - v_j
        div = div - jnp.sum(fac * jnp.sum(dist * dv, axis=-1))
        cx = dv[:, 1] * dist[:, 2] - dv[:, 2] * dist[:, 1]
        cy = dv[:, 2] * dist[:, 0] - dv[:, 0] * dist[:, 2]
        cz = dv[:, 0] * dist[:, 1] - dv[:, 1] * dist[:, 0]
        rot = rot + jnp.stack([jnp.sum(fac * cx), jnp.sum(fac * cy),
                               jnp.sum(fac * cz)])
        grad = grad + jnp.sum(fac[:, None] * dist, axis=0)
        return (ngb, rho, dh, egy, dhe, div, rot, grad)

    return accumulate


# accumulate closures must be cached: run_walk_blocked jits on the
# callable's identity, and a fresh closure per call would retrace
_ACCUM_CACHE = {}


def _density_accum_cached(spec: KernelSpec):
    fn = _ACCUM_CACHE.get(spec)
    if fn is None:
        fn = _density_accum(spec)
        _ACCUM_CACHE[spec] = fn
    return fn


@partial(jax.jit, static_argnames=("spec",))
def density_walk(tree: Octree, payload, target_ipos, target_vel,
                 hsml, boxsize, spec: KernelSpec = CUBIC):
    """One density evaluation at given smoothing lengths."""
    t = target_ipos.shape[0]
    z = lambda *s: jnp.zeros(s, jnp.float32)
    carry0 = (z(t), z(t), z(t), z(t), z(t), z(t), z(t, 3), z(t, 3))
    extra = {"hsml": hsml, "vel": target_vel}
    out = run_walk(tree, payload, target_ipos, hsml, extra, carry0,
                   _density_accum(spec), boxsize, symmetric=False)
    return DensityResult(*out)


def density_walk_dense(payload, target_ipos, target_vel, hsml,
                       boxsize, spec: KernelSpec = CUBIC):
    """density_walk against EVERY source (run_walk_dense oracle):
    identical physics — the accumulator masks by radius — with
    HBM-bounded staging.  Used for the overflow tails the blocked and
    stencil engines flag; the vmapped tree walk's batched gathers OOM
    there (see ops/treewalk.run_walk_dense)."""
    from ..ops.treewalk import run_walk_dense
    t = target_ipos.shape[0]
    z = lambda *s: jnp.zeros(s, jnp.float32)
    carry0 = (z(t), z(t), z(t), z(t), z(t), z(t), z(t, 3), z(t, 3))
    extra = {"hsml": hsml, "vel": target_vel}
    out = run_walk_dense(payload, target_ipos, extra, carry0,
                         _density_accum_cached(spec), boxsize)
    return DensityResult(*out)


def density_walk_blocked(tree: Octree, payload, target_ipos,
                         target_vel, hsml, boxsize,
                         spec: KernelSpec = CUBIC, ncrit: int = 32,
                         block: int = 64, maxl: int = 64,
                         nb: int = None, level: int = None):
    """Blocked-engine density evaluation (production TPU path).

    Same physics as density_walk; one traversal per Morton block of
    targets + dense masked evaluation (ops/treewalk.run_walk_blocked).
    Returns (DensityResult, info) — info carries overflow flags the
    hsml loop checks to grow maxl/nb and retry.
    """
    from ..ops.treewalk import run_walk_blocked
    from ..ops.blockwalk import auto_block_level

    t = target_ipos.shape[0]
    if nb is None:
        nb = max(2 * ((t + block - 1) // block), 8)
        nb = 1 << (nb - 1).bit_length()
    if level is None:
        level = auto_block_level(t, block)
    z = lambda *s: jnp.zeros(s, jnp.float32)
    carry0 = (z(t), z(t), z(t), z(t), z(t), z(t), z(t, 3), z(t, 3))
    extra = {"hsml": hsml, "vel": target_vel}
    out, info = run_walk_blocked(
        tree, payload, target_ipos, hsml, extra, carry0,
        _density_accum_cached(spec), boxsize, symmetric=False,
        block=block, maxl=maxl, ncrit=ncrit, level=level, nb=nb)
    return DensityResult(*out), info


class HsmlState(NamedTuple):
    hsml: jax.Array
    left: jax.Array
    right: jax.Array
    done: jax.Array


def update_hsml(state: HsmlState, ngb, dhsml_rho, rho, des_numngb,
                ngb_deviation, boxsize) -> HsmlState:
    """Vectorized density_check_neighbours (densitytree2.hpp:196-283)."""
    hsml, left, right, done = state
    out_of_range = (ngb < des_numngb - ngb_deviation) | \
                   (ngb > des_numngb + ngb_deviation)
    need_update = out_of_range & (~done)

    # degenerate bracket: accept Right
    tight = (right - left) < 1e-5 * right
    hsml_tight = right

    left_n = jnp.where(need_update & (ngb < des_numngb), hsml, left)
    right_n = jnp.where(need_update & (ngb >= des_numngb), hsml, right)

    # geometric-mean bisection when bracketed
    bracketed = (right_n < boxsize) & (left_n > 0)
    hsml_bis = jnp.cbrt(0.5 * (left_n ** 3 + right_n ** 3))

    # kernel-gradient guess when not bracketed
    densfac_raw = dhsml_rho * hsml / (NUMDIMS * jnp.maximum(rho, 1e-35))
    densfac = 1.0 / (1.0 + densfac_raw)
    fac = jnp.where(ngb > 0,
                    1.0 - (ngb - des_numngb) / (NUMDIMS
                                                * jnp.maximum(ngb, 1e-35))
                    * densfac, 1.26)
    fac = jnp.where((right_n > 0.99 * boxsize) & (left_n > 0)
                    & ((densfac <= 0)
                       | (jnp.abs(ngb - des_numngb) >= 0.5 * des_numngb)
                       | (fac > 1.26)),
                    1.26, fac)
    fac = jnp.where((right_n < 0.99 * boxsize) & (left_n == 0)
                    & ((densfac <= 0) | (fac < 1.0 / 3)),
                    1.0 / 3, fac)
    hsml_grow = hsml * fac

    hsml_new = jnp.where(bracketed | (hsml * 1.26 > 0.99 * boxsize),
                         hsml_bis, hsml_grow)
    hsml_new = jnp.where(tight, hsml_tight, hsml_new)
    hsml_out = jnp.where(need_update & (~tight), hsml_new,
                         jnp.where(need_update & tight, hsml_tight,
                                   hsml))
    done_out = done | (~out_of_range) | tight
    return HsmlState(hsml=hsml_out, left=left_n, right=right_n,
                     done=done_out)


@dataclass
class DensityOutput:
    hsml: np.ndarray
    numngb: np.ndarray
    density: np.ndarray
    dhsml_density_factor: np.ndarray
    egy_wt_density: np.ndarray
    dhsml_egy_density_factor: np.ndarray
    div_vel: np.ndarray
    curl_vel: np.ndarray
    grad_rho: np.ndarray
    dt_hsml: np.ndarray
    niter: int
    # targets whose bisection hit the hmax_allowed bracket ceiling
    # (deviation from the reference's boxsize bracket, observable so
    # void particles converging under-neighboured are not silent)
    n_hmax_capped: int = 0


def density(tree: Octree, payload, target_ipos, target_vel,
            target_entvar, hsml0, boxsize, spec: KernelSpec = CUBIC,
            eta: float = 1.0, ngb_deviation: float = 2.0,
            do_egy_density: bool = True,
            maxiter: int = MAXITER, engine: str = "blocked",
            ncrit: int = 32, caps: dict = None) -> DensityOutput:
    """Full adaptive-H density loop (do_hsml_loop analog, host-driven).

    payload must hold sorted (tree order) arrays: ipos, mass, vel,
    entvar (A^{1/gamma} predictions; pass ones when not using
    pressure-entropy SPH).

    engine='blocked' (default) is the TPU-native schedule; 'walk' is
    the per-particle reference-semantics oracle (cross-checked in
    tests/test_density.py, unusable at production sizes on TPU).
    """
    des = float(desnumngb(spec, eta))
    t = target_ipos.shape[0]
    # bracket ceiling: with right = boxsize a single void particle's
    # probing radius makes its whole target block's interaction list
    # cover the tree (the block engine pays max-radius per block) —
    # physical smoothing lengths sit at a few mean separations
    sep = boxsize / max(t, 1) ** (1.0 / 3.0)
    hmax_allowed = min(boxsize / 2.0,
                       max(8.0 * sep, 2.0 * float(np.max(hsml0))))
    state = HsmlState(hsml=jnp.asarray(hsml0, jnp.float32),
                      left=jnp.zeros(t, jnp.float32),
                      right=jnp.full(t, hmax_allowed, jnp.float32),
                      done=jnp.zeros(t, bool))
    if caps is None:
        caps = {}
    caps.setdefault("maxl", 64)

    # the interaction-list cap is bounded: compiling a walk beyond
    # maxl~2048 at 256k targets exceeds the chip's HBM at COMPILE
    # time (measured 17.5G/15.75G), and shrinking blocks explodes the
    # block count.  Targets whose block STILL overflows at the cap
    # (void particles probing box-scale radii into dense regions) are
    # re-done with the per-particle oracle walk — exactly the
    # reference's per-particle cost model for exactly the pathological
    # cases, while the 99.9% common case stays on the dense engine.
    MAXL_CAP = 2048

    def _oracle_patch(res, t_ipos, t_vel, hsml, tovf):
        sel_all = np.nonzero(np.asarray(tovf))[0]
        tsub = t_ipos.shape[0]
        out = list(res)
        # the vmapped oracle stages a [targets, sources] slab on TPU:
        # keep chunks small
        OCH = 256
        for c0 in range(0, len(sel_all), OCH):
            sel = sel_all[c0:c0 + OCH]
            nov = len(sel)
            nbkt = max(16, 1 << (nov - 1).bit_length())
            sel_p = np.full(nbkt, tsub, dtype=np.int64)
            sel_p[:nov] = sel
            selj = jnp.asarray(sel_p)
            gidx = jnp.minimum(selj, tsub - 1)
            lane = jnp.asarray(np.arange(nbkt) < nov)
            sub = density_walk_dense(payload, t_ipos[gidx],
                                     t_vel[gidx],
                                     jnp.where(lane, hsml[gidx], 0.0),
                                     boxsize, spec)
            for k in range(len(out)):
                out[k] = out[k].at[selj].set(sub[k], mode="drop")
        return DensityResult(*out)

    if engine == "stencil":
        # grid-stencil neighbour enumeration (stencil_density.py):
        # no octree traversal at all; the tree is kept only for the
        # per-particle oracle patch of cover-overflow targets
        from .stencil_density import build_grid_sph, \
            stencil_density_walk
        n_src = payload["ipos"].shape[0]
        sep_src = boxsize / max(n_src, 1) ** (1.0 / 3.0)
        kst = int(np.clip(round(np.log2(boxsize / (2.4 * sep_src))),
                          1, 10))
        grid = build_grid_sph(payload["ipos"], payload["mass"],
                              payload["vel"], payload["entvar"], kst)

    def walk(t_ipos, t_vel, hsml, nsub):
        if engine == "stencil":
            res, cover, n_cover = stencil_density_walk(
                grid, t_ipos, t_vel, hsml, boxsize, kst, spec=spec,
                tier_cache=caps)
            if n_cover:
                res = _oracle_patch(list(res), t_ipos, t_vel, hsml,
                                    cover)
            return res
        if engine != "blocked":
            return density_walk(tree, payload, t_ipos, t_vel, hsml,
                                boxsize, spec)
        while True:
            res, info = density_walk_blocked(
                tree, payload, t_ipos, t_vel, hsml,
                boxsize, spec, ncrit=ncrit, maxl=caps["maxl"],
                nb=caps.get(("nb", nsub)))
            if bool(info["leaf_truncated"]):
                from ..ops.treewalk import TreeTooShallow
                raise TreeTooShallow(
                    "density: leaf > ncrit; rebuild a deeper octree")
            grew = False
            if bool(info["list_overflow"]):
                if caps["maxl"] < MAXL_CAP:
                    caps["maxl"] *= 2
                    grew = True
                else:
                    res = _oracle_patch(res, t_ipos, t_vel, hsml,
                                        info["target_overflow"])
            if bool(info["block_overflow"]):
                key = ("nb", nsub)
                nb0 = caps.get(key) or max(
                    2 * ((nsub + 63) // 64), 8)
                caps[key] = (1 << (nb0 - 1).bit_length()) * 2
                grew = True
            if not grew:
                return res

    # iteration 1: all targets; later iterations walk only the
    # particles whose hsml changed (the reference re-queues only
    # unconverged particles, do_hsml_loop/density_check_neighbours —
    # re-walking everything made SPH ~94% of a full-physics step).
    # Subset sizes are pow2-bucketed so distinct counts share
    # compiles; each particle's stored result always corresponds to
    # its latest hsml, so no final full recompute is needed.
    # SHENQI_DENSITY_SUBSET=0 falls back to full walks every
    # iteration (the subset path intermittently kills the axon TPU
    # worker inside full runs even though every isolated repro of it
    # passes — suspected async/donation interaction; see round-2 log)
    import os
    use_subset = os.environ.get("SHENQI_DENSITY_SUBSET", "1") != "0"
    res = walk(target_ipos, target_vel, state.hsml, t)
    res_arrays = list(res)
    it = 0
    for it in range(maxiter):
        hsml_prev = state.hsml
        state = update_hsml(state, res_arrays[0], res_arrays[2],
                            res_arrays[1], des, ngb_deviation,
                            boxsize)
        state = state._replace(hsml=jnp.minimum(state.hsml,
                                                hmax_allowed))
        changed = np.asarray(state.hsml != hsml_prev)
        nch = int(changed.sum())
        if nch == 0:
            break
        if engine not in ("blocked", "stencil") or not use_subset \
                or nch > t // 2:
            res = walk(target_ipos, target_vel, state.hsml, t)
            res_arrays = list(res)
            continue
        sel = np.nonzero(changed)[0]
        nbkt = max(64, 1 << (nch - 1).bit_length())
        # pad with the out-of-range index t: gathers clip (walk input
        # is inert, radius 0) and scatters DROP, so padded lanes can
        # never collide with a real row's fresh result
        sel_p = np.full(nbkt, t, dtype=np.int64)
        sel_p[:nch] = sel
        selj = jnp.asarray(sel_p)
        lane = jnp.asarray(np.arange(nbkt) < nch)
        sub = walk(target_ipos[jnp.minimum(selj, t - 1)],
                   target_vel[jnp.minimum(selj, t - 1)],
                   jnp.where(lane, state.hsml[jnp.minimum(selj,
                                                          t - 1)],
                             0.0), nbkt)
        for k in range(len(res_arrays)):
            res_arrays[k] = res_arrays[k].at[selj].set(
                sub[k], mode="drop")
    res = DensityResult(*res_arrays)

    hsml = state.hsml
    rho = jnp.maximum(res.rho, 1e-35)
    dhsml_fac = res.dhsml_rho * hsml / (NUMDIMS * rho)
    dhsml_fac = 1.0 / (1.0 + dhsml_fac)
    div_vel = res.div / rho
    curl_vel = jnp.linalg.norm(res.rot, axis=-1) / rho
    dt_hsml = (1.0 / NUMDIMS) * div_vel * hsml

    if do_egy_density:
        egy_rho = jnp.maximum(res.egy_rho, 1e-35)
        dhsml_egy = res.dhsml_egy * hsml / (NUMDIMS * egy_rho)
        dhsml_egy = -dhsml_egy * dhsml_fac
        egy_wt_density = egy_rho / jnp.maximum(target_entvar, 1e-35)
    else:
        dhsml_egy = dhsml_fac
        egy_wt_density = rho

    n_capped = int(jnp.sum(hsml >= jnp.float32(hmax_allowed) * 0.999))
    if n_capped:
        print(f"density: {n_capped} targets at the hmax bracket "
              f"ceiling {hmax_allowed:g} (may be under-neighboured)")
    return DensityOutput(
        hsml=hsml, numngb=res.ngb, density=res.rho,
        dhsml_density_factor=dhsml_fac,
        egy_wt_density=egy_wt_density,
        dhsml_egy_density_factor=dhsml_egy,
        div_vel=div_vel, curl_vel=curl_vel, grad_rho=res.grad_rho,
        dt_hsml=dt_hsml, niter=it + 1, n_hmax_capped=n_capped)


def make_gas_payload(tree: Octree, vel, entvar, extra=None):
    """Sort per-particle gas fields into tree order for the walk."""
    order = tree.order
    payload = {"ipos": tree.ipos_s, "mass": tree.mass_s,
               "vel": vel[order], "entvar": entvar[order]}
    if extra:
        for k, v in extra.items():
            payload[k] = v[order]
    return payload
