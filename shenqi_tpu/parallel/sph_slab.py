"""Distributed SPH density + hydro over the slab domain.

The reference runs every SPH stage distributed (density2.cpp,
hydra2.cpp over MPI ranks with treewalk export/import).  The TPU-slab
analog: ghost rows within the kernel support arrive from the slab
neighbours via the ppermute halo ring (domain.halo_exchange), then the
ENTIRE blocked neighbour walk (ops/treewalk.run_walk_blocked — the
same engine as single-device) runs device-locally on
[local + ghosts].  Per-device memory and work are O(N/D + halo).

The host drives the adaptive-hsml bisection exactly like
sph/density.density does on one device; each pass is one jitted
shard_map call.  The halo width is a static cap checked at runtime:
if any smoothing length outgrows it the pass flags `width_exceeded`
and the caller rebuilds with a wider halo.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:                          # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.tree import build_octree
from ..ops.blockwalk import auto_block_level
from ..core.particles import POS_SCALE
from ..sph.kernels import KernelSpec, CUBIC
from ..sph.density import DensityResult, _density_accum_cached
from ..sph.hydro import (HydroParams, _hydro_accum_cached,
                         _hydro_extra)
from .domain import halo_exchange


def _combined_tree(fields, ghost_names, width_fp, ndev, gcap,
                   nlevels, ncrit, boxsize, with_hmax=False,
                   axis_name="dp", cuts_in=None):
    """Halo exchange + octree over [local + ghosts].

    cuts_in: cost-balanced slab cut positions — MUST be passed when
    the domain runs balanced cuts, or the ghost strips follow the
    wrong (uniform) geometry (halo_exchange routes to the general
    bucketed all_to_all in that case)."""
    from ..ops.morton import morton_key

    ship = {k: fields[k] for k in ghost_names}
    ghosts, n_lost = halo_exchange(ship, width_fp, ndev, gcap,
                                   axis_name, cuts_in=cuts_in)
    comb = {k: jnp.concatenate([fields[k], ghosts[k]])
            for k in ghost_names}
    alive = comb["mass"] > 0
    ipos = comb["ipos"]
    keys = morton_key(ipos)
    imax = jnp.argmax(jnp.where(alive, keys, 0))
    ipos = jnp.where(alive[:, None], ipos, ipos[imax])
    comb["ipos"] = ipos
    tree = build_octree(ipos, comb["mass"], alive, boxsize,
                        nlevels=nlevels, ncrit=ncrit,
                        hsml=comb["hsml"] if with_hmax else None)
    return tree, comb, alive, n_lost


def make_density_pass(mesh, boxsize: float, width_fp: int,
                      spec: KernelSpec = CUBIC, nlevels: int = 8,
                      ncrit: int = 32, block: int = 64,
                      maxl: int = 128, gcap: int = None,
                      nb: int = None, with_cuts: bool = False):
    """Jitted shard_map density pass over 'dp'-sharded gas fields.

    fn(fields, hsml) -> (DensityResult arrays [D*C], info); fields
    must hold ipos/mass/vel/entvar (mass 0 = dead/non-gas row).
    """
    from ..ops.treewalk import run_walk_blocked

    ndev = mesh.devices.size

    field_specs = {"ipos": P("dp", None), "mass": P("dp"),
                   "vel": P("dp", None), "entvar": P("dp")}
    res_specs = DensityResult(*([P("dp")] * 6 + [P("dp", None)] * 2))
    info_specs = {k: P() for k in
                  ("halo_lost", "list_overflow", "block_overflow",
                   "leaf_truncated", "width_exceeded")}

    d_in = (field_specs, P("dp")) + ((P(),) if with_cuts else ())

    @partial(shard_map, mesh=mesh, in_specs=d_in,
             out_specs=(res_specs, info_specs), check_vma=False)
    def one_pass(fields, hsml, *cuts):
        C = fields["ipos"].shape[0]
        g = gcap if gcap is not None else C
        f = dict(fields)
        f["hsml"] = hsml
        tree, comb, alive, n_lost = _combined_tree(
            f, ("ipos", "mass", "vel", "entvar", "hsml"), width_fp,
            ndev, g, nlevels, ncrit, boxsize,
            cuts_in=cuts[0] if cuts else None)
        order = tree.order
        payload = {"ipos": tree.ipos_s, "mass": tree.mass_s,
                   "vel": comb["vel"][order],
                   "entvar": comb["entvar"][order]}
        t = C
        nbl = nb
        if nbl is None:
            nbl = max(2 * ((t + block - 1) // block), 8)
            nbl = 1 << (nbl - 1).bit_length()
        level = auto_block_level(t, block)
        z = lambda *s: jnp.zeros(s, jnp.float32)
        carry0 = (z(t), z(t), z(t), z(t), z(t), z(t), z(t, 3),
                  z(t, 3))
        extra = {"hsml": hsml, "vel": fields["vel"]}
        out, winfo = run_walk_blocked(
            tree, payload, fields["ipos"], hsml, extra, carry0,
            _density_accum_cached(spec), boxsize, symmetric=False,
            block=block, maxl=maxl, ncrit=ncrit, level=level, nb=nbl)
        width_len = jnp.float32(width_fp / 2.0 ** 32 * boxsize)
        info = {
            "halo_lost": n_lost,
            "list_overflow": jax.lax.psum(
                winfo["list_overflow"].astype(jnp.int32), "dp"),
            "block_overflow": jax.lax.psum(
                winfo["block_overflow"].astype(jnp.int32), "dp"),
            "leaf_truncated": jax.lax.psum(
                winfo["leaf_truncated"].astype(jnp.int32), "dp"),
            "width_exceeded": jax.lax.psum(jnp.sum(
                ((fields["mass"] > 0) & (hsml > width_len))
                .astype(jnp.int32)), "dp"),
        }
        return DensityResult(*out), info

    return jax.jit(one_pass)


def make_hydro_pass(mesh, par: HydroParams, width_fp: int,
                    spec: KernelSpec = CUBIC, nlevels: int = 8,
                    ncrit: int = 32, block: int = 64,
                    maxl: int = 128, gcap: int = None,
                    nb: int = None, with_cuts: bool = False):
    """Jitted shard_map hydro-force pass (symmetric walk).

    fn(fields, tf) -> ((accel [D*C,3], dt_entropy_raw [D*C],
    maxvsig [D*C]), info).  fields: ipos/mass/vel/hsml plus the hydro
    payload columns density/eomdensity/entvar/pressure/divvel/curlvel/
    dhsml_egy/dloga/decoupled and target-side f1/egyrho/dhsml.
    tf: hydro_time_factors dict (dynamic scalars).
    NOTE: dt_entropy is returned RAW (before the
    GAMMA_MINUS1/(hubble a^2 rho^..) conversion) — apply it outside.
    """
    from ..ops.treewalk import run_walk_blocked

    ndev = mesh.devices.size
    ghost_names = ("ipos", "mass", "vel", "hsml", "density",
                   "eomdensity", "entvar", "pressure", "divvel",
                   "curlvel", "dhsml_egy", "dloga", "decoupled")

    field_specs = {k: P("dp", None) if k in ("ipos", "vel")
                   else P("dp") for k in ghost_names}
    for k in ("f1", "egyrho", "dhsml"):
        field_specs[k] = P("dp")
    tf_specs = {k: P() for k in ("fac_mu", "fac_vsic_fix",
                                 "hubble_a2")}
    out_specs = (P("dp", None), P("dp"), P("dp"))
    info_specs = {k: P() for k in
                  ("halo_lost", "list_overflow", "block_overflow",
                   "leaf_truncated", "width_exceeded")}

    h_in = (field_specs, tf_specs) + ((P(),) if with_cuts else ())

    @partial(shard_map, mesh=mesh, in_specs=h_in,
             out_specs=(out_specs, info_specs), check_vma=False)
    def one_pass(fields, tf, *cuts):
        C = fields["ipos"].shape[0]
        g = gcap if gcap is not None else C
        tree, comb, alive, n_lost = _combined_tree(
            fields, ghost_names, width_fp, ndev, g, nlevels, ncrit,
            boxsize=par.boxsize, with_hmax=True,
            cuts_in=cuts[0] if cuts else None)
        order = tree.order
        payload = {"ipos": tree.ipos_s, "mass": tree.mass_s}
        for k in ghost_names[2:]:
            payload[k] = comb[k][order]

        targets = {
            "ipos": fields["ipos"], "vel": fields["vel"],
            "hsml": fields["hsml"], "mass": fields["mass"],
            "density": fields["density"],
            "egyrho": fields["egyrho"], "entvar": fields["entvar"],
            "pressure": fields["pressure"], "f1": fields["f1"],
            "dhsml": fields["dhsml"], "dloga": fields["dloga"],
        }
        extra = _hydro_extra(targets, par, C, tf)
        t = C
        nbl = nb
        if nbl is None:
            nbl = max(2 * ((t + block - 1) // block), 8)
            nbl = 1 << (nbl - 1).bit_length()
        level = auto_block_level(t, block)
        carry0 = (jnp.zeros((t, 3), jnp.float32),
                  jnp.zeros(t, jnp.float32),
                  jnp.zeros(t, jnp.float32))
        out, winfo = run_walk_blocked(
            tree, payload, fields["ipos"], fields["hsml"], extra,
            carry0, _hydro_accum_cached(spec, par.static_key()),
            par.boxsize, symmetric=True, block=block, maxl=maxl,
            ncrit=ncrit, level=level, nb=nbl)
        width_len = jnp.float32(width_fp / 2.0 ** 32 * par.boxsize)
        info = {
            "halo_lost": n_lost,
            "list_overflow": jax.lax.psum(
                winfo["list_overflow"].astype(jnp.int32), "dp"),
            "block_overflow": jax.lax.psum(
                winfo["block_overflow"].astype(jnp.int32), "dp"),
            "leaf_truncated": jax.lax.psum(
                winfo["leaf_truncated"].astype(jnp.int32), "dp"),
            "width_exceeded": jax.lax.psum(jnp.sum(
                ((fields["mass"] > 0) & (fields["hsml"] > width_len))
                .astype(jnp.int32)), "dp"),
        }
        return out, info

    return jax.jit(one_pass)


def make_stencil_density_pass(mesh, boxsize: float, width_fp: int,
                              spec: KernelSpec, kst: int,
                              TBC: int, pcaps: tuple, sub: int = 32,
                              W: int = 7, gcap: int = None,
                              with_cuts: bool = False):
    """Jitted shard_map GRID-STENCIL density pass (production SPH
    engine, sph/stencil_density.py, distributed).

    One fused device program per call: halo exchange + pair-packed
    grid build + cell-anchored classification + static-cap tier evals
    + scatter — no host sync inside shard_map (the single-device
    engine's TBC regrow loop cannot run under shard_map).  Cap
    sufficiency returns as a pmax'd `st_diag` [c1..c4, n_cover,
    tb_total]; the host driver regrows TBC/pcaps and falls back to
    the octree walk pass when n_cover > 0 (void probes outgrowing the
    W^3 window — the single-device cover->oracle protocol, whole-pass
    here).
    """
    from ..sph.stencil_density import (build_grid_sph, _sph_count,
                                       _sph_eval)
    from ..gravity.shortrange_refined import _next_pow2, tier_bounds

    ndev = mesh.devices.size
    CAND = _next_pow2(W ** 3) if W ** 3 & (W ** 3 - 1) else W ** 3

    field_specs = {"ipos": P("dp", None), "mass": P("dp"),
                   "vel": P("dp", None), "entvar": P("dp")}
    res_specs = DensityResult(*([P("dp")] * 6 + [P("dp", None)] * 2))
    info_specs = {"halo_lost": P(), "width_exceeded": P(),
                  "st_diag": P()}
    d_in = (field_specs, P("dp")) + ((P(),) if with_cuts else ())

    @partial(shard_map, mesh=mesh, in_specs=d_in,
             out_specs=(res_specs, info_specs), check_vma=False)
    def one_pass(fields, hsml, *cuts):
        C = fields["ipos"].shape[0]
        g = gcap if gcap is not None else C
        ship = {k: fields[k] for k in ("ipos", "mass", "vel",
                                       "entvar")}
        ghosts, n_lost = halo_exchange(
            ship, width_fp, ndev, g, "dp",
            cuts_in=cuts[0] if cuts else None)
        comb = {k: jnp.concatenate([fields[k], ghosts[k]])
                for k in ship}
        grid = build_grid_sph(comb["ipos"], comb["mass"],
                              comb["vel"], comb["entvar"], kst)

        box = float(boxsize)
        T = ((C + sub - 1) // sub) * sub
        tgt_hsml = jnp.where(fields["mass"] > 0, hsml, 0.0)
        (tgt_idx, tgt_valid, pst, pcn, order_s, cover,
         diag) = _sph_count(grid, fields["ipos"], tgt_hsml, box,
                            kst, sub, W, CAND, T, TBC)

        nbs = TBC
        z = lambda *s: jnp.zeros((nbs, sub) + s, jnp.float32)
        accs = [z(), z(), z(), z(), z(), z(), z(3), z(3)]
        lo = 0
        for b, pcap in zip(tier_bounds(nbs), pcaps):
            nsel = b - lo
            if nsel <= 0:
                lo = b
                continue
            sel = jnp.sort(order_s[lo:b])
            out = _sph_eval(grid[3], fields["ipos"], fields["vel"],
                            tgt_hsml, tgt_idx, tgt_valid, pst, pcn,
                            sel, box, spec, sub, pcap, nsel)
            for i in range(8):
                accs[i] = accs[i].at[sel].set(out[i])
            lo = b

        flat_idx = jnp.where(tgt_valid & ~cover[:, None], tgt_idx, C
                             ).reshape(-1)
        res = []
        for a in accs:
            if a.ndim == 2:
                res.append(jnp.zeros((C + 1,), jnp.float32).at[
                    flat_idx].set(a.reshape(-1))[:C])
            else:
                res.append(jnp.zeros((C + 1, 3), jnp.float32).at[
                    flat_idx].set(a.reshape(-1, 3))[:C])

        width_len = jnp.float32(width_fp / 2.0 ** 32 * boxsize)
        info = {
            "halo_lost": n_lost,
            "width_exceeded": jax.lax.psum(jnp.sum(
                ((fields["mass"] > 0) & (hsml > width_len))
                .astype(jnp.int32)), "dp"),
            "st_diag": jax.lax.pmax(diag, "dp"),
        }
        return DensityResult(*res), info

    return jax.jit(one_pass)


# pass-builder cache: rebuilding the shard_map closure per bisection
# iteration would retrace every call
_PASS_CACHE = {}


def make_stencil_hydro_pass(mesh, par: HydroParams, width_fp: int,
                            spec: KernelSpec, kst: int,
                            TBC: int, pcaps: tuple, lcap: int,
                            sub: int = 32, W: int = 7,
                            gcap: int = None,
                            with_cuts: bool = False):
    """Jitted shard_map GRID-STENCIL hydro pass (production SPH
    engine, sph/stencil_hydro.py, distributed).

    Same fused protocol as make_stencil_density_pass: halo exchange +
    single-row packed source grid + cell-anchored classification +
    static-cap tier evals + the dense long-reach pass — one device
    program, no host sync inside shard_map.  Cap sufficiency returns
    as a pmax'd `st_diag` [c1..c4, n_cover, tb_total, n_long]; the
    host driver (hydro_slab) regrows TBC/pcaps/lcap and falls back to
    the octree pass for cover overflow.  dt_entropy is returned RAW
    (make_hydro_pass convention) — the caller applies the
    GAMMA_MINUS1/(hubble a^2 rho^gm1) conversion.
    """
    from ..sph.stencil_hydro import (build_grid_hydro, _hydro_count,
                                     _hydro_eval, _hydro_long_eval)
    from ..sph.hydro import _hydro_extra
    from ..gravity.shortrange_refined import _next_pow2, tier_bounds

    ndev = mesh.devices.size
    CAND = _next_pow2(W ** 3) if W ** 3 & (W ** 3 - 1) else W ** 3
    boxsize = float(par.boxsize)
    cell = boxsize / (1 << kst)
    hcut = 2.0 * cell
    par_static = par.static_key()

    ghost_names = ("ipos", "mass", "vel", "hsml", "density",
                   "eomdensity", "entvar", "pressure", "divvel",
                   "curlvel", "dhsml_egy", "dloga", "decoupled")
    field_specs = {k: P("dp", None) if k in ("ipos", "vel")
                   else P("dp") for k in ghost_names}
    for k in ("f1", "egyrho", "dhsml"):
        field_specs[k] = P("dp")
    tf_specs = {k: P() for k in ("fac_mu", "fac_vsic_fix",
                                 "hubble_a2")}
    out_specs = (P("dp", None), P("dp"), P("dp"))
    info_specs = {"halo_lost": P(), "width_exceeded": P(),
                  "st_diag": P()}
    h_in = (field_specs, tf_specs) + ((P(),) if with_cuts else ())

    @partial(shard_map, mesh=mesh, in_specs=h_in,
             out_specs=(out_specs, info_specs), check_vma=False)
    def one_pass(fields, tf, *cuts):
        C = fields["ipos"].shape[0]
        g = gcap if gcap is not None else C
        ship = {k: fields[k] for k in ghost_names}
        ghosts, n_lost = halo_exchange(
            ship, width_fp, ndev, g, "dp",
            cuts_in=cuts[0] if cuts else None)
        comb = {k: jnp.concatenate([fields[k], ghosts[k]])
                for k in ship}
        mass_src = jnp.where(
            comb["decoupled"] | (comb["mass"] <= 0), 0.0,
            comb["mass"])
        src13 = jnp.stack(
            [mass_src, comb["hsml"], comb["vel"][:, 0],
             comb["vel"][:, 1], comb["vel"][:, 2], comb["density"],
             comb["eomdensity"], comb["entvar"], comb["pressure"],
             comb["divvel"], comb["curlvel"], comb["dhsml_egy"],
             comb["dloga"]], axis=1).astype(jnp.float32)
        stab, smeta, cellh, long_rows, n_long = build_grid_hydro(
            comb["ipos"], src13, kst, hcut, lcap)

        T = ((C + sub - 1) // sub) * sub
        tvalid = (fields["mass"] > 0) & (fields["hsml"] > 0)
        (tgt_idx, tgt_valid, sst, scn, order_s, cover,
         diag) = _hydro_count(fields["ipos"], fields["hsml"],
                              tvalid, smeta, cellh, boxsize, hcut,
                              kst, sub, W, CAND, T, TBC)

        targets = {
            "ipos": fields["ipos"], "vel": fields["vel"],
            "hsml": fields["hsml"], "mass": fields["mass"],
            "density": fields["density"],
            "egyrho": fields["egyrho"], "entvar": fields["entvar"],
            "pressure": fields["pressure"], "f1": fields["f1"],
            "dhsml": fields["dhsml"], "dloga": fields["dloga"],
        }
        extra = _hydro_extra(targets, par, C, tf)

        nbs = TBC
        acc_bs = jnp.zeros((nbs, sub, 3), jnp.float32)
        dts_bs = jnp.zeros((nbs, sub), jnp.float32)
        mv_bs = jnp.zeros((nbs, sub), jnp.float32)
        lo = 0
        for b, pcap in zip(tier_bounds(nbs), pcaps):
            nsel = b - lo
            if nsel <= 0:
                lo = b
                continue
            sel = jnp.sort(order_s[lo:b])
            a, d_, m_ = _hydro_eval(
                stab, extra, fields["ipos"], tgt_idx, tgt_valid,
                sst, scn, sel, boxsize, hcut, spec, par_static,
                sub, pcap, nsel)
            acc_bs = acc_bs.at[sel].set(a)
            dts_bs = dts_bs.at[sel].set(d_)
            mv_bs = mv_bs.at[sel].set(m_)
            lo = b

        flat_idx = jnp.where(tgt_valid & ~cover[:, None], tgt_idx, C
                             ).reshape(-1)
        acc = jnp.zeros((C + 1, 3), jnp.float32).at[flat_idx].set(
            acc_bs.reshape(-1, 3))[:C]
        dts = jnp.zeros(C + 1, jnp.float32).at[flat_idx].set(
            dts_bs.reshape(-1))[:C]
        mv = jnp.zeros(C + 1, jnp.float32).at[flat_idx].set(
            mv_bs.reshape(-1))[:C]

        # dense long-reach pass (static lcap; zero rows masked by
        # n_long inside) — unconditional under jit
        la, ld, lm = _hydro_long_eval(
            long_rows, extra, fields["ipos"], tvalid, n_long,
            boxsize, spec, par_static, lcap)
        acc = acc + la
        dts = dts + ld
        mv = jnp.maximum(mv, lm)

        width_len = jnp.float32(width_fp / 2.0 ** 32 * boxsize)
        diag7 = jnp.concatenate(
            [diag.astype(jnp.int32),
             n_long.astype(jnp.int32)[None]])
        info = {
            "halo_lost": n_lost,
            "width_exceeded": jax.lax.psum(jnp.sum(
                ((fields["mass"] > 0)
                 & (fields["hsml"] > width_len))
                .astype(jnp.int32)), "dp"),
            "st_diag": jax.lax.pmax(diag7, "dp"),
        }
        return (acc, dts, mv), info

    return jax.jit(one_pass)


def _cached_density_pass(mesh, boxsize, width, spec, nlv, ncrit,
                         maxl, with_cuts=False, nb=None):
    key = ("dens", mesh, boxsize, width, spec, nlv, ncrit, maxl,
           with_cuts, nb)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_density_pass(mesh, boxsize, width, spec,
                               nlevels=nlv, ncrit=ncrit, maxl=maxl,
                               with_cuts=with_cuts, nb=nb)
        _PASS_CACHE[key] = fn
    return fn


def _cached_hydro_pass(mesh, par, width, spec, nlv, ncrit, maxl,
                       with_cuts=False, nb=None):
    key = ("hyd", mesh, par, width, spec, nlv, ncrit, maxl,
           with_cuts, nb)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_hydro_pass(mesh, par, width, spec, nlevels=nlv,
                             ncrit=ncrit, maxl=maxl,
                             with_cuts=with_cuts, nb=nb)
        _PASS_CACHE[key] = fn
    return fn


def _grow_nb(caps, mesh, nrows, block=64):
    """Double the walk's neighbour-BLOCK list cap (treewalk.py `nb`)
    after a block_overflow — overflow drops/garbles block visits and
    the affected targets come back NaN, so the pass MUST be retried
    (the single-device analog grows caps[('nb', nsub)],
    sph/density.py:351-356)."""
    C = nrows // mesh.devices.size
    nb0 = caps.get("nb")
    if nb0 is None:
        nb0 = max(2 * ((C + block - 1) // block), 8)
        nb0 = 1 << (nb0 - 1).bit_length()
    caps["nb"] = nb0 * 2


def _cached_stencil_density_pass(mesh, boxsize, width, spec, kst,
                                 TBC, pcaps, with_cuts=False):
    key = ("sdens", mesh, boxsize, width, spec, kst, TBC,
           tuple(pcaps), with_cuts)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_stencil_density_pass(mesh, boxsize, width, spec,
                                       kst, TBC, tuple(pcaps),
                                       with_cuts=with_cuts)
        _PASS_CACHE[key] = fn
    return fn


def _cached_stencil_hydro_pass(mesh, par, width, spec, kst, TBC,
                               pcaps, lcap, with_cuts=False):
    key = ("shyd", mesh, par.static_key(), float(par.boxsize),
           width, spec, kst, TBC, tuple(pcaps), lcap, with_cuts)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_stencil_hydro_pass(mesh, par, width, spec, kst,
                                     TBC, tuple(pcaps), lcap,
                                     with_cuts=with_cuts)
        _PASS_CACHE[key] = fn
    return fn


def _sph_engine(engine):
    if engine is None:
        import os
        engine = os.environ.get("SHENQI_SPH_ENGINE", "stencil")
    return engine


def density_pass_slab(mesh, fields, hsml, boxsize,
                      spec: KernelSpec = CUBIC, nlevels: int = 8,
                      ncrit: int = 32, caps: dict = None,
                      cuts_in=None):
    """ONE density evaluation at fixed hsml with overflow-regrowing
    caps (for the pressure-entropy init fixed point and other
    fixed-hsml recomputations).  Returns (DensityResult, info)."""
    if caps is None:
        caps = {}
    hmax0 = float(np.max(np.where(
        np.asarray(fields["mass"]) > 0, np.asarray(hsml), 0.0)))
    step = 1 << 27
    w0 = int(3 * hmax0 / boxsize * 2 ** 32) + (1 << 12)
    caps.setdefault("width", ((w0 + step - 1) // step) * step)
    caps.setdefault("maxl", 128)
    caps.setdefault("nlv", nlevels)
    if caps["width"] < w0:
        caps["width"] = ((w0 + step - 1) // step) * step
    while True:
        fn = _cached_density_pass(mesh, boxsize, caps["width"], spec,
                                  caps["nlv"], ncrit, caps["maxl"],
                                  with_cuts=cuts_in is not None,
                                  nb=caps.get("nb"))
        args = (fields, hsml) + ((cuts_in,)
                                 if cuts_in is not None else ())
        res, info = fn(*args)
        grew = False
        if int(info["list_overflow"]):
            caps["maxl"] *= 2
            grew = True
        if int(info["leaf_truncated"]):
            caps["nlv"] = min(caps["nlv"] + 1, 20)
            grew = True
        if int(info["width_exceeded"]):
            caps["width"] *= 2
            grew = True
        if int(info["block_overflow"]):
            _grow_nb(caps, mesh, fields["ipos"].shape[0])
            grew = True
        if not grew:
            return res, info


def hydro_slab(mesh, fields, par: HydroParams, tf,
               spec: KernelSpec = CUBIC, nlevels: int = 8,
               ncrit: int = 32, caps: dict = None, cuts_in=None,
               engine: str = None):
    """Hydro force over slab-sharded gas with overflow-regrowing caps
    (the hydra2.cpp distributed stage; same retry protocol as
    density_slab.run).  fields: make_hydro_pass columns.  Returns
    ((accel, dt_entropy_raw, maxvsig), info).

    engine: None -> $SHENQI_SPH_ENGINE (default "stencil" —
    make_stencil_hydro_pass); "walk" uses the octree pass.  Stencil
    cover-overflow falls back to the walk pass whole-pass (the
    single-device cover->oracle protocol)."""
    if caps is None:
        caps = {}
    boxsize = float(par.boxsize)
    hmax0 = float(np.max(np.where(
        np.asarray(fields["mass"]) > 0,
        np.asarray(fields["hsml"]), 0.0)))
    step = 1 << 27
    w0 = int(3 * hmax0 / boxsize * 2 ** 32) + (1 << 12)
    caps.setdefault("width", ((w0 + step - 1) // step) * step)
    caps.setdefault("maxl", 128)
    caps.setdefault("nlv", nlevels)
    if caps["width"] < w0:
        caps["width"] = ((w0 + step - 1) // step) * step

    if _sph_engine(engine) == "stencil":
        from ..gravity.stencil import grow_tier_caps, _round_tbc, \
            default_tbc
        from ..gravity.shortrange_refined import _next_pow2
        n_alive = int(np.sum(np.asarray(fields["mass"]) > 0))
        sep_src = boxsize / max(n_alive, 1) ** (1.0 / 3.0)
        kst = int(np.clip(round(np.log2(boxsize / (2.4 * sep_src))),
                          1, 10))
        sub = 32
        C = int(np.asarray(fields["mass"]).shape[0]) \
            // mesh.devices.size
        T = ((C + sub - 1) // sub) * sub
        caps.setdefault("sh_tbc", default_tbc(T, sub))
        caps.setdefault("sh_pcaps", (128, 256, 512, 1024))
        caps.setdefault("sh_lcap", 256)
        while True:
            fn = _cached_stencil_hydro_pass(
                mesh, par, caps["width"], spec, kst,
                caps["sh_tbc"], caps["sh_pcaps"], caps["sh_lcap"],
                with_cuts=cuts_in is not None)
            args = (fields, tf) + ((cuts_in,)
                                   if cuts_in is not None else ())
            out, info = fn(*args)
            d = np.asarray(info["st_diag"])
            grew = False
            if int(info["width_exceeded"]):
                caps["width"] *= 2
                grew = True
            if int(d[5]) > caps["sh_tbc"]:
                caps["sh_tbc"] = _round_tbc(int(d[5]) + 256)
                grew = True
            if int(d[6]) > caps["sh_lcap"]:
                caps["sh_lcap"] = _next_pow2(int(d[6]) + 16)
                grew = True
            pc = grow_tier_caps(tuple(int(x) for x in d[0:4]),
                                caps["sh_pcaps"], 8, 64)
            if pc != caps["sh_pcaps"]:
                caps["sh_pcaps"] = pc
                grew = True
            if grew:
                continue
            if int(d[4]) > 0:
                break   # cover overflow: octree-pass fallback below
            return out, info

    while True:
        fn = _cached_hydro_pass(mesh, par, caps["width"], spec,
                                caps["nlv"], ncrit, caps["maxl"],
                                with_cuts=cuts_in is not None,
                                nb=caps.get("nb"))
        args = (fields, tf) + ((cuts_in,)
                               if cuts_in is not None else ())
        out, info = fn(*args)
        grew = False
        if int(info["list_overflow"]):
            caps["maxl"] *= 2
            grew = True
        if int(info["leaf_truncated"]):
            caps["nlv"] = min(caps["nlv"] + 1, 20)
            grew = True
        if int(info["width_exceeded"]):
            caps["width"] *= 2
            grew = True
        if int(info["block_overflow"]):
            _grow_nb(caps, mesh, fields["ipos"].shape[0])
            grew = True
        if not grew:
            return out, info


def density_slab(mesh, fields, hsml0, boxsize, spec: KernelSpec = CUBIC,
                 eta: float = 1.0, ngb_deviation: float = 2.0,
                 nlevels: int = 8, ncrit: int = 32,
                 maxiter: int = 60, caps: dict = None,
                 cuts_in=None, engine: str = None):
    """Adaptive-hsml density loop over slab-sharded gas
    (do_hsml_loop over D devices).  fields: dict sharded over 'dp'
    with ipos/mass/vel/entvar.  Returns (DensityResult, hsml, info).

    caps: persistent grow-only {width, maxl, nlv} dict — pass the
    same dict across steps so regrows (each a distinct compiled
    shard_map program) happen once per run, not once per step.

    engine: None -> $SHENQI_SPH_ENGINE (default "stencil", the
    production grid engine — make_stencil_density_pass); "walk" uses
    the octree pass.  The stencil path falls back to the walk pass
    for any evaluation whose diag reports cover-overflow sub-blocks
    (the single-device cover->oracle protocol, whole-pass here).
    """
    from ..sph.density import HsmlState, update_hsml
    from ..sph.kernels import desnumngb

    des = float(desnumngb(spec, eta))
    hsml = jnp.asarray(hsml0, jnp.float32)
    t = hsml.shape[0]
    # dead rows (capacity padding / non-gas) are done from the start
    dead = np.asarray(fields["mass"]) <= 0
    n_alive = int((~dead).sum())
    hmax0 = float(np.max(np.where(dead, 0.0, np.asarray(hsml))))
    # bracket ceiling (sph/density.py lesson): right = boxsize lets a
    # single probing particle push hsml past the halo width, and each
    # width doubling is a fresh multi-minute shard_map compile —
    # bound the bisection to a few mean separations instead
    sep = boxsize / max(n_alive, 1) ** (1.0 / 3.0)
    hmax_allowed = min(boxsize / 4.0, max(8.0 * sep, 2.0 * hmax0))
    state = HsmlState(hsml=hsml, left=jnp.zeros(t, jnp.float32),
                      right=jnp.full(t, hmax_allowed, jnp.float32),
                      done=jnp.asarray(dead))
    # initial halo width from the CURRENT max hsml (3x covers the
    # bisection's growth factor); the bracket ceiling above keeps
    # width_exceeded regrows bounded.  Quantized to box/32 steps: a
    # distinct width is a distinct compiled shard_map program
    w0 = int(3 * hmax0 / boxsize * 2 ** 32) + (1 << 12)
    step = 1 << 27                      # box/32 in fixed point
    if caps is None:
        caps = {}
    caps.setdefault("maxl", 128)
    caps.setdefault("nlv", nlevels)
    caps.setdefault("width", ((w0 + step - 1) // step) * step)
    if caps["width"] < w0:
        caps["width"] = ((w0 + step - 1) // step) * step

    import os as _os
    _dbg = _os.environ.get("SHENQI_SPH_SLAB_DEBUG")
    engine = _sph_engine(engine)
    # stencil grid level from the global mean source separation
    # (sph/density.py single-device convention) — derived from the
    # global alive count, so every device compiles the same program
    sep_src = boxsize / max(n_alive, 1) ** (1.0 / 3.0)
    kst = int(np.clip(round(np.log2(boxsize / (2.4 * sep_src))),
                      1, 10))
    caps.setdefault("sd_pcaps", (128, 256, 512, 1024))

    def run_walk(hsml):
        while True:
            fn = _cached_density_pass(
                mesh, boxsize, caps["width"], spec, caps["nlv"],
                ncrit, caps["maxl"], with_cuts=cuts_in is not None,
                nb=caps.get("nb"))
            args = (fields, hsml) + ((cuts_in,)
                                     if cuts_in is not None else ())
            if _dbg:
                print(f"# density pass call caps={caps}", flush=True)
            res, info = fn(*args)
            if _dbg:
                print(f"# density pass done "
                      f"ovf={int(info['list_overflow'])} "
                      f"wid={int(info['width_exceeded'])}",
                      flush=True)
            grew = False
            if int(info["list_overflow"]):
                caps["maxl"] *= 2
                grew = True
            if int(info["leaf_truncated"]):
                caps["nlv"] = min(caps["nlv"] + 1, 20)
                grew = True
            if int(info["width_exceeded"]):
                caps["width"] *= 2
                grew = True
            if int(info["block_overflow"]):
                _grow_nb(caps, mesh, fields["ipos"].shape[0])
                grew = True
            if not grew:
                return res, info

    def run_stencil(hsml):
        from ..gravity.stencil import grow_tier_caps, _round_tbc, \
            default_tbc
        sub = 32
        C = t // mesh.devices.size       # per-device rows
        T = ((C + sub - 1) // sub) * sub
        caps.setdefault("sd_tbc", default_tbc(T, sub))
        while True:
            fn = _cached_stencil_density_pass(
                mesh, boxsize, caps["width"], spec, kst,
                caps["sd_tbc"], caps["sd_pcaps"],
                with_cuts=cuts_in is not None)
            args = (fields, hsml) + ((cuts_in,)
                                     if cuts_in is not None else ())
            if _dbg:
                print(f"# stencil density pass caps={caps}",
                      flush=True)
            res, info = fn(*args)
            d = np.asarray(info["st_diag"])
            if _dbg:
                print(f"# stencil density done diag={d.tolist()} "
                      f"wid={int(info['width_exceeded'])}",
                      flush=True)
            grew = False
            if int(info["width_exceeded"]):
                caps["width"] *= 2
                grew = True
            if int(d[5]) > caps["sd_tbc"]:
                caps["sd_tbc"] = _round_tbc(int(d[5]) + 256)
                grew = True
            pc = grow_tier_caps(tuple(int(x) for x in d[0:4]),
                                caps["sd_pcaps"], 8, 64)
            if pc != caps["sd_pcaps"]:
                caps["sd_pcaps"] = pc
                grew = True
            if grew:
                continue
            if int(d[4]) > 0:
                # cover-overflow sub-blocks (void probes outgrew the
                # W^3 window): whole-pass walk fallback — correct for
                # every target (single-device cover->oracle protocol)
                return run_walk(hsml)
            return res, info

    run = run_stencil if engine == "stencil" else run_walk
    res = info = None
    for _ in range(maxiter):
        res, info = run(state.hsml)
        state = update_hsml(state, res.ngb, res.dhsml_rho, res.rho,
                            des, ngb_deviation, boxsize)
        state = state._replace(hsml=jnp.minimum(state.hsml,
                                                hmax_allowed))
        if bool(jnp.all(state.done)):
            break
    res, info = run(state.hsml)
    return res, state.hsml, info
