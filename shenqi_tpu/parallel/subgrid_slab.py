"""Distributed rare-source subgrid passes over the slab domain.

The reference runs winds, metal return, and black-hole physics through
the same distributed treewalk engine as SPH (winds.cpp, metal_return.c,
blackhole.cpp over MPI exports).  The TPU-slab analog exploits what
those walks have in common: FEW sources (new stars this step, enriching
stars this bin, black holes) against MANY sharded gas targets.  Instead
of exporting targets to source owners, the rare sources are gathered
onto every device (fixed-cap pack + all_gather — bytes are tiny), the
per-source gas sums are jax.lax.psum'd, and each device applies the
scatter to its local gas rows only.  Per-device work is O(N/D * S);
communication is O(S).

Random draws are keyed by particle id (physics/winds.idhash_uniform,
the get_random_number(ID) scheme of winds.cpp:542), so kick decisions
are identical for any device count — slab runs reproduce the
single-device stream exactly, which the parity tests assert.

The one many-target walk here — the per-gas DM velocity dispersion
(veldisp2.cpp) feeding the sigma-based wind models — reuses the slab
ghost-halo octree machinery of sph_slab (same engine as single-device
physics/veldisp.py, run device-locally over [local + ghost] DM).
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

from ..core.particles import POS_SCALE
from ..sph.kernels import KernelSpec, CUBIC, wk as kern_wk
from .domain import halo_exchange

_PASS_CACHE = {}


# ---------------------------------------------------------------
# rare-source gather: pack masked rows, all_gather to every device
# ---------------------------------------------------------------

def make_gather_pass(mesh, struct, cap: int):
    """Jitted shard_map gathering up to `cap` masked rows per device.

    struct: tuple of (name, ndim) — the field layout.  Returns
    fn(fields, mask) -> (global dict [D*cap,...] replicated,
    valid [D*cap], n_overflow)."""

    field_specs = {k: (P("dp", None) if nd == 2 else P("dp"))
                   for k, nd in struct}

    @partial(shard_map, mesh=mesh,
             in_specs=(field_specs, P("dp")),
             out_specs=({k: P() for k, _ in struct}, P(), P()),
             check_vma=False)
    def gather(fields, mask):
        C = mask.shape[0]
        idx = jnp.nonzero(mask, size=cap, fill_value=C)[0]
        take = idx < C
        safe = jnp.minimum(idx, C - 1)
        packed = {}
        for k, nd in struct:
            v = fields[k][safe]
            sel = take[:, None] if nd == 2 else take
            packed[k] = jnp.where(sel, v, jnp.zeros_like(v))
        g = jax.lax.all_gather(packed, "dp")       # [D, cap, ...]
        gv = jax.lax.all_gather(take, "dp")
        ovf = jax.lax.psum(jnp.maximum(
            jnp.sum(mask.astype(jnp.int32)) - cap, 0), "dp")
        out = {k: v.reshape((-1,) + v.shape[2:])
               for k, v in g.items()}
        return out, gv.reshape(-1), ovf

    return jax.jit(gather)


def gather_rows(mesh, fields: dict, mask, cap: int):
    """Gather up to cap masked rows PER DEVICE into replicated global
    buffers [D*cap].  Returns (dict, valid, n_overflow int)."""
    struct = tuple(sorted((k, fields[k].ndim) for k in fields))
    key = ("gather", mesh, struct,
           tuple(str(fields[k].dtype) for k, _ in struct), cap)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_gather_pass(mesh, struct, cap)
        _PASS_CACHE[key] = fn
    out, valid, ovf = fn(fields, mask)
    return out, valid, int(ovf)


# ---------------------------------------------------------------
# star spawns: generation splits into local dead rows
# (slots_split_particle, slotsmanager.cpp:103 — distributed)
# ---------------------------------------------------------------

def make_spawn_pass(mesh, struct, cap: int):
    """Jitted shard_map spawning up to `cap` star children per device.

    A spawned child inherits the parent's position, so it belongs to
    the parent's slab BY CONSTRUCTION — each device scatters its own
    spawns into its own dead (mass==0) rows with zero communication;
    only the overflow count is psum'd.  struct: ((name, ndim), ...)
    of every per-row field (the whole sharded state moves together so
    the child row is valid for the next exchange).

    fn(fields, spawn_mask, mstar, atime) ->
        (fields', n_spawned, n_overflow)."""

    field_specs = {k: (P("dp", None) if nd == 2 else P("dp"))
                   for k, nd in struct}

    @partial(shard_map, mesh=mesh,
             in_specs=(field_specs, P("dp"), P("dp"), P()),
             out_specs=(field_specs, P(), P()), check_vma=False)
    def spawn(fields, mask, mstar, atime):
        C = mask.shape[0]
        par = jnp.nonzero(mask, size=cap, fill_value=C)[0]
        dead = fields["mass"] <= 0
        free = jnp.nonzero(dead, size=cap, fill_value=C)[0]
        ok = (par < C) & (free < C)
        n_req = jnp.sum(mask.astype(jnp.int32))
        n_ok = jnp.sum(ok.astype(jnp.int32))
        psafe = jnp.minimum(par, C - 1)
        fsafe = jnp.where(ok, free, C)          # C = dummy pad row

        def scat(a, vals):
            pad = jnp.zeros((1,) + a.shape[1:], a.dtype)
            a2 = jnp.concatenate([a, pad], axis=0)
            return a2.at[fsafe].set(vals)[:C]

        f = dict(fields)
        ms = jnp.where(ok, mstar[psafe], 0.0)
        # child rows: kinematics + id + star bookkeeping
        for k in ("ipos", "vel", "hsml", "tbin", "id_lo",
                  "met", "vdsp", "ne"):
            if k in f:
                f[k] = scat(f[k], f[k][psafe])
        # child id: base id + new generation in the top 8 bits, and
        # the child carries the incremented generation
        # (slotsmanager.cpp:110-115)
        gen_child = f["gen"][psafe] + 1
        f["id_hi"] = scat(f["id_hi"],
                          (f["id_hi"][psafe]
                           & jnp.uint32(0x00FFFFFF))
                          + (gen_child.astype(jnp.uint32)
                             << jnp.uint32(24)))
        f["gen"] = scat(f["gen"], gen_child)
        f["mass"] = scat(f["mass"], ms)
        f["ptyp"] = scat(f["ptyp"], jnp.full(cap, 4, jnp.int32))
        f["birtha"] = scat(f["birtha"],
                           jnp.full(cap, atime, jnp.float32))
        if "m0" in f:
            f["m0"] = scat(f["m0"], ms)
        if "smet" in f:
            f["smet"] = scat(f["smet"], f["met"][psafe])
        for k in ("enr", "tret", "sfr", "dtim", "grho", "entropy",
                  "density", "egywt", "dhsml_egy", "divv", "curlv",
                  "dts", "mvsig", "dth", "delay", "bhm", "bhmd"):
            if k in f:
                f[k] = scat(f[k], jnp.zeros(cap, f[k].dtype))
        if "gacc" in f:
            f["gacc"] = scat(f["gacc"], f["gacc"][psafe])
        if "gpm" in f:
            f["gpm"] = scat(f["gpm"], f["gpm"][psafe])
        if "hacc" in f:
            f["hacc"] = scat(f["hacc"],
                             jnp.zeros((cap, 3), jnp.float32))
        if "oldacc" in f:
            f["oldacc"] = scat(f["oldacc"], f["oldacc"][psafe])
        # parent updates: lose the child's mass, bump the generation
        applied = jnp.zeros(C + 1, bool).at[
            jnp.where(ok, psafe, C)].set(True)[:C]
        dm = jnp.zeros(C + 1, jnp.float32).at[
            jnp.where(ok, psafe, C)].add(ms)[:C]
        f["mass"] = jnp.where(applied, f["mass"] - dm, f["mass"])
        f["gen"] = jnp.where(applied, f["gen"] + 1, f["gen"])
        n_sp = jax.lax.psum(n_ok, "dp")
        ovf = jax.lax.psum(n_req - n_ok, "dp")
        return f, n_sp, ovf

    return jax.jit(spawn)


def spawn_stars_slab(mesh, fields: dict, spawn_mask, mstar, atime,
                     cap: int = 256):
    """Spawn star children for masked gas parents into local dead
    rows.  Returns (fields', n_spawned, n_overflow) — the caller
    grows capacity and retries when n_overflow > 0 (free-row
    exhaustion; SlotsIncreaseFactor analog)."""
    struct = tuple(sorted((k, fields[k].ndim) for k in fields))
    key = ("spawn", mesh, struct,
           tuple(str(fields[k].dtype) for k, _ in struct), cap)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_spawn_pass(mesh, struct, cap)
        _PASS_CACHE[key] = fn
    f, n_sp, ovf = fn(fields, spawn_mask, mstar, jnp.float32(atime))
    return f, int(n_sp), int(ovf)


# ---------------------------------------------------------------
# winds: gathered new stars kick local gas (sfr_wind_feedback)
# ---------------------------------------------------------------

def make_winds_pass(mesh, wp, boxsize: float, S: int):
    """One shard_map program: psum the per-star eligible gas mass,
    then apply winds_star_feedback locally with the global weights
    and id-keyed draws (winds.cpp:514-566 distributed)."""
    from ..physics.winds import winds_star_feedback

    gas_specs = {"ipos": P("dp", None), "mass": P("dp"),
                 "vel": P("dp", None), "entropy": P("dp"),
                 "density": P("dp"), "delay": P("dp"),
                 "eligible": P("dp"), "pid": P("dp")}
    star_specs = {k: P() for k in ("ipos", "hsml", "mass", "vdisp",
                                   "pid")}
    scal_specs = (P(), P(), P())
    out_specs = (P("dp", None), P("dp"), P("dp"))

    @partial(shard_map, mesh=mesh,
             in_specs=(gas_specs, star_specs, scal_specs),
             out_specs=out_specs, check_vma=False)
    def one_pass(gas, stars, scal):
        key, atime, a3inv = scal
        to_f = jnp.float32(boxsize / POS_SCALE)
        dist = (gas["ipos"][:, None, :]
                - stars["ipos"][None, :, :]).astype(
            jnp.int32).astype(jnp.float32) * to_f
        r2 = jnp.sum(dist * dist, axis=-1)            # [C, S]
        elig = gas["eligible"] & (gas["delay"] <= 0)
        inside = (r2 < stars["hsml"][None, :] ** 2) & elig[:, None]
        local_w = jnp.sum(
            jnp.where(inside, gas["mass"][:, None], 0.0), axis=0)
        tw = jax.lax.psum(local_w, "dp")              # [S]
        vel, ent, delay = winds_star_feedback(
            key, stars["ipos"], stars["hsml"], stars["mass"],
            stars["vdisp"], gas["ipos"], gas["mass"], gas["vel"],
            gas["entropy"], gas["density"], gas["delay"], elig,
            boxsize, atime, a3inv, wp,
            gas_pids=gas["pid"], star_pids=stars["pid"],
            total_weight=tw)
        return vel, ent, delay

    return jax.jit(one_pass)


def winds_slab(mesh, key, gas: dict, stars: dict, wp, boxsize,
               atime, a3inv):
    """Distributed non-subgrid winds.  gas: sharded dict with
    ipos/mass/vel/entropy/density/delay/eligible/pid (pid uint32,
    eligible = alive gas, EXCLUDING rows that just formed stars).
    stars: replicated dict with ipos/hsml/mass/vdisp/pid ([S]; dead
    lanes mass=0, hsml=0).  Returns (vel, entropy, delay) sharded."""
    S = int(stars["hsml"].shape[0])
    pkey = ("winds", mesh, tuple(sorted(vars(wp).items())),
            float(boxsize), S)
    fn = _PASS_CACHE.get(pkey)
    if fn is None:
        fn = make_winds_pass(mesh, wp, float(boxsize), S)
        _PASS_CACHE[pkey] = fn
    return fn(gas, stars, (key, jnp.float32(atime),
                           jnp.float32(a3inv)))


# ---------------------------------------------------------------
# source gas environment: kernel sums around gathered sources
# (stellar_density / blackhole accretion-walk gather part)
# ---------------------------------------------------------------

def make_source_env_pass(mesh, boxsize: float, S: int,
                         spec: KernelSpec):
    gas_specs = {"ipos": P("dp", None), "mass": P("dp"),
                 "entropy": P("dp"), "vel": P("dp", None)}
    src_specs = {"ipos": P(), "hsml": P()}
    out_specs = (P(), P(), P(), P())

    @partial(shard_map, mesh=mesh,
             in_specs=(gas_specs, src_specs),
             out_specs=out_specs, check_vma=False)
    def one_pass(gas, src):
        to_f = jnp.float32(boxsize / POS_SCALE)
        dist = (src["ipos"][:, None, :]
                - gas["ipos"][None, :, :]).astype(
            jnp.int32).astype(jnp.float32) * to_f
        r2 = jnp.sum(dist * dist, axis=-1)            # [S, C]
        H = src["hsml"][:, None]
        inside = (r2 < H * H) & (gas["mass"][None, :] > 0)
        u = jnp.minimum(jnp.sqrt(r2) / jnp.maximum(H, 1e-35), 1.0)
        w = jnp.where(inside,
                      kern_wk(spec, u, jnp.maximum(H, 1e-35)), 0.0)
        mw = gas["mass"][None, :] * w
        dens = jax.lax.psum(jnp.sum(mw, axis=1), "dp")
        sent = jax.lax.psum(
            jnp.sum(mw * gas["entropy"][None, :], axis=1), "dp")
        svel = jax.lax.psum(
            jnp.einsum("sc,cd->sd", mw, gas["vel"]), "dp")
        fw = dens
        return dens, sent, svel, fw

    return jax.jit(one_pass)


def source_env_slab(mesh, gas: dict, src: dict, boxsize,
                    spec: KernelSpec = CUBIC):
    """Kernel-weighted gas environment around replicated sources
    (bh_gas_environment distributed): returns
    (density, smoothed entropy, smoothed vel, feedback weight), all
    replicated [S].  gas: sharded ipos/mass/entropy/vel (mass 0 =
    dead/non-gas)."""
    S = int(src["hsml"].shape[0])
    key = ("senv", mesh, float(boxsize), S, spec)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_source_env_pass(mesh, float(boxsize), S, spec)
        _PASS_CACHE[key] = fn
    dens, sent, svel, fw = fn(gas, src)
    dsafe = jnp.maximum(dens, 1e-35)
    return dens, sent / dsafe, svel / dsafe[:, None], fw


# ---------------------------------------------------------------
# metal return: distribute gathered stars' ejecta to local gas
# ---------------------------------------------------------------

def make_metal_return_pass(mesh, boxsize: float, S: int,
                           spec: KernelSpec):
    from ..physics.metal_return import metal_return_step

    gas_specs = {"ipos": P("dp", None), "mass": P("dp")}
    star_specs = {k: P() for k in ("ipos", "hsml", "mret", "zret",
                                   "fw")}

    @partial(shard_map, mesh=mesh,
             in_specs=(gas_specs, star_specs),
             out_specs=(P("dp"), P("dp")), check_vma=False)
    def one_pass(gas, stars):
        alive = gas["mass"] > 0
        return metal_return_step(
            stars["ipos"], stars["hsml"], stars["mret"],
            stars["zret"], stars["fw"], gas["ipos"], gas["mass"],
            alive, boxsize, spec)

    return jax.jit(one_pass)


def metal_return_slab(mesh, gas: dict, stars: dict, boxsize,
                      spec: KernelSpec = CUBIC):
    """Kernel-weighted ejecta distribution (metal_return.c treewalk
    distributed): stars dict replicated [S] with
    ipos/hsml/mret/zret/fw (fw from source_env_slab).  Returns
    (dmass, dmetalmass) sharded over the local gas rows."""
    S = int(stars["hsml"].shape[0])
    key = ("mret", mesh, float(boxsize), S, spec)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_metal_return_pass(mesh, float(boxsize), S, spec)
        _PASS_CACHE[key] = fn
    return fn(gas, stars)


# ---------------------------------------------------------------
# black holes: feedback scatter + stochastic swallowing
# (blackhole.cpp feedback/accretion ngbiter, distributed — BHs are
# rare sources replicated to every device; per-gas work is local)
# ---------------------------------------------------------------

def make_bh_feedback_pass(mesh, boxsize: float, S: int,
                          spec: KernelSpec):
    from ..utils.constants import GAMMA_MINUS1

    gas_specs = {"ipos": P("dp", None), "mass": P("dp"),
                 "density": P("dp")}
    bh_specs = {k: P() for k in ("ipos", "hsml", "energy", "fw")}

    @partial(shard_map, mesh=mesh,
             in_specs=(gas_specs, bh_specs, P()),
             out_specs=P("dp"), check_vma=False)
    def one_pass(gas, bh, a3inv):
        to_f = jnp.float32(boxsize / POS_SCALE)
        dist = (gas["ipos"][:, None, :]
                - bh["ipos"][None, :, :]).astype(
            jnp.int32).astype(jnp.float32) * to_f
        r2 = jnp.sum(dist * dist, axis=-1)            # [C, S]
        H = bh["hsml"][None, :]
        inside = (r2 < H * H) & (gas["mass"][:, None] > 0) \
            & (bh["energy"][None, :] > 0)
        u = jnp.minimum(jnp.sqrt(r2) / jnp.maximum(H, 1e-35), 1.0)
        w = jnp.where(inside,
                      kern_wk(spec, u, jnp.maximum(H, 1e-35)), 0.0)
        # deltaU = wk m / FeedbackWeightSum * E / m_gas
        share = (w * gas["mass"][:, None]
                 / jnp.maximum(bh["fw"][None, :], 1e-35)
                 * bh["energy"][None, :])
        du = jnp.sum(share, axis=1) / jnp.maximum(gas["mass"],
                                                  1e-35)
        enttou = (gas["density"] * a3inv) ** GAMMA_MINUS1 \
            / GAMMA_MINUS1
        return du / jnp.maximum(enttou, 1e-35)

    return jax.jit(one_pass)


def bh_feedback_slab(mesh, gas: dict, bh: dict, boxsize, a3inv,
                     spec: KernelSpec = CUBIC):
    """Thermal feedback entropy increments to local gas
    (bh_thermal_feedback distributed).  gas: sharded
    ipos/mass/density (mass 0 = dead/non-gas); bh: replicated [S]
    ipos/hsml/energy/fw.  Returns dent sharded [C]."""
    S = int(bh["hsml"].shape[0])
    key = ("bhfb", mesh, float(boxsize), S, spec)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_bh_feedback_pass(mesh, float(boxsize), S, spec)
        _PASS_CACHE[key] = fn
    return fn(gas, bh, jnp.float32(a3inv))


def make_bh_swallow_pass(mesh, boxsize: float, S: int,
                         spec: KernelSpec):
    from ..physics.winds import idhash_uniform

    gas_specs = {"ipos": P("dp", None), "mass": P("dp"),
                 "pid": P("dp")}
    bh_specs = {k: P() for k in ("ipos", "hsml", "deficit", "rho")}

    @partial(shard_map, mesh=mesh,
             in_specs=(gas_specs, bh_specs, P()),
             out_specs=(P("dp"), P()), check_vma=False)
    def one_pass(gas, bh, salt):
        to_f = jnp.float32(boxsize / POS_SCALE)
        dist = (gas["ipos"][:, None, :]
                - bh["ipos"][None, :, :]).astype(
            jnp.int32).astype(jnp.float32) * to_f
        r2 = jnp.sum(dist * dist, axis=-1)            # [C, S]
        H = bh["hsml"][None, :]
        inside = (r2 < H * H) & (gas["mass"][:, None] > 0)
        u = jnp.minimum(jnp.sqrt(r2) / jnp.maximum(H, 1e-35), 1.0)
        w = jnp.where(inside,
                      kern_wk(spec, u, jnp.maximum(H, 1e-35)), 0.0)
        prob = jnp.clip(bh["deficit"][None, :] * w
                        / jnp.maximum(bh["rho"][None, :], 1e-35),
                        0.0, 1.0)
        # draws keyed by (salt + BH slot, gas id): layout- and
        # device-count-invariant (get_random_number(ID) scheme)
        draw = jax.vmap(
            lambda s: idhash_uniform(salt + s, gas["pid"], 3),
            out_axes=1)(jnp.arange(S, dtype=jnp.uint32))
        hit = (draw < prob) & inside
        any_hit = jnp.any(hit, axis=1)
        first = jnp.argmax(hit, axis=1).astype(jnp.int32)
        swallowed_by = jnp.where(any_hit, first, -1)
        gain = jnp.zeros(S, jnp.float32).at[first].add(
            jnp.where(any_hit, gas["mass"], 0.0))
        return swallowed_by, jax.lax.psum(gain, "dp")

    return jax.jit(one_pass)


def bh_swallow_slab(mesh, salt, gas: dict, bh: dict, boxsize,
                    spec: KernelSpec = CUBIC):
    """Stochastic gas swallowing (bh_swallow_gas distributed): each
    local gas neighbour is swallowed with p = deficit*wk/rho_bh,
    claimed by the FIRST hit slot in the replicated (id-ordered) BH
    pack.  gas: sharded ipos/mass/pid (mass 0 = dead/non-gas); bh:
    replicated [S] ipos/hsml/deficit/rho.  Returns
    (swallowed_by [C] int32 slot or -1 sharded,
     dyn_mass_gain [S] replicated)."""
    S = int(bh["hsml"].shape[0])
    key = ("bhsw", mesh, float(boxsize), S, spec)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_bh_swallow_pass(mesh, float(boxsize), S, spec)
        _PASS_CACHE[key] = fn
    return fn(gas, bh, jnp.uint32(salt))


# ---------------------------------------------------------------
# DM velocity dispersion (veldisp2.cpp) over the slab domain
# ---------------------------------------------------------------

def make_veldisp_pass(mesh, boxsize: float, width_fp: int,
                      nlevels: int = 8, ncrit: int = 32,
                      block: int = 64, maxl: int = 64,
                      gcap: int = None, with_cuts: bool = False):
    """Jitted shard_map veldisp pass: ghost-halo DM octree +
    device-local blocked walk (physics/veldisp._veldisp_accum — the
    same accumulator as single-device).

    fn(fields, radius) -> ((ngb, msum, vsum, v2sum) sharded, info).
    fields: ipos [N,3] / mass [N] (DM mass; 0 = not a source) /
    vel [N,3]; radius [N] per-target search radius (0 = inactive)."""
    from ..ops.treewalk import run_walk_blocked
    from ..ops.blockwalk import auto_block_level
    from ..physics.veldisp import _veldisp_accum
    from .sph_slab import _combined_tree

    ndev = mesh.devices.size
    field_specs = {"ipos": P("dp", None), "mass": P("dp"),
                   "vel": P("dp", None)}
    out_specs = (P("dp"), P("dp"), P("dp", None), P("dp"))
    info_specs = {k: P() for k in
                  ("halo_lost", "list_overflow", "block_overflow",
                   "leaf_truncated", "width_exceeded")}
    d_in = (field_specs, P("dp")) + ((P(),) if with_cuts else ())

    @partial(shard_map, mesh=mesh, in_specs=d_in,
             out_specs=(out_specs, info_specs), check_vma=False)
    def one_pass(fields, radius, *cuts):
        C = fields["ipos"].shape[0]
        g = gcap if gcap is not None else C
        tree, comb, alive, n_lost = _combined_tree(
            fields, ("ipos", "mass", "vel"), width_fp, ndev, g,
            nlevels, ncrit, boxsize,
            cuts_in=cuts[0] if cuts else None)
        order = tree.order
        payload = {"ipos": tree.ipos_s, "mass": tree.mass_s,
                   "vel": comb["vel"][order],
                   "alive": alive[order]}
        t = C
        nbl = max(2 * ((t + block - 1) // block), 8)
        nbl = 1 << (nbl - 1).bit_length()
        level = auto_block_level(t, block)
        z = lambda *s: jnp.zeros(s, jnp.float32)
        carry0 = (z(t), z(t), z(t, 3), z(t))
        extra = {"radius": radius}
        out, winfo = run_walk_blocked(
            tree, payload, fields["ipos"], radius, extra, carry0,
            _veldisp_accum, boxsize, symmetric=False, block=block,
            maxl=maxl, ncrit=ncrit, level=level, nb=nbl)
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
                (radius > width_len).astype(jnp.int32)), "dp"),
        }
        return out, info

    return jax.jit(one_pass)


def _cached_veldisp_pass(mesh, boxsize, width, nlv, ncrit, maxl,
                         with_cuts=False):
    key = ("vdisp", mesh, boxsize, width, nlv, ncrit, maxl,
           with_cuts)
    fn = _PASS_CACHE.get(key)
    if fn is None:
        fn = make_veldisp_pass(mesh, boxsize, width, nlv, ncrit,
                               maxl=maxl, with_cuts=with_cuts)
        _PASS_CACHE[key] = fn
    return fn


def veldisp_slab(mesh, fields: dict, radius0, boxsize, atime,
                 nlevels: int = 8, ncrit: int = 32,
                 target_ngb: float = 40.0, maxiter: int = 20,
                 caps: dict = None, cuts_in=None):
    """Distributed dm_velocity_dispersion: adaptive-radius bisection
    (host-driven, like density_slab) over the slab veldisp pass.

    fields: sharded ipos/mass/vel — mass holds DM MASS ONLY (zero for
    gas/star/dead rows); radius0 sharded per-target start radius (0
    rows stay inactive).  Returns (sigma_1d, radius, rho, info)."""
    from ..sph.density import HsmlState, update_hsml

    if caps is None:
        caps = {}
    n_src = int(jnp.sum(fields["mass"] > 0))
    sep = boxsize / max(n_src, 1) ** (1.0 / 3.0)
    r0 = np.asarray(radius0, np.float32)
    rmax0 = max(float(r0.max()), sep)
    step = (1 << 22)
    w0 = int(3 * rmax0 / boxsize * 2 ** 32) + step
    caps.setdefault("vd_width", ((w0 + step - 1) // step) * step)
    caps.setdefault("vd_maxl", 64)
    caps.setdefault("vd_nlv", nlevels)

    t = int(fields["mass"].shape[0])
    active = r0 > 0
    # radius ceiling (density_slab lesson): a probing target must
    # not outgrow the halo width — each width regrow recompiles.
    # Brackets start at [0, boxsize] to match the single-device
    # bisection path exactly; the ceiling clamps only runaways.
    hmax_allowed = max(8.0 * sep, 2.0 * rmax0)
    state = HsmlState(
        hsml=jnp.asarray(r0), left=jnp.zeros(t, jnp.float32),
        right=jnp.full(t, boxsize, jnp.float32),
        done=jnp.asarray(~active))

    def run(rad):
        while True:
            fn = _cached_veldisp_pass(
                mesh, boxsize, caps["vd_width"], caps["vd_nlv"],
                ncrit, caps["vd_maxl"],
                with_cuts=cuts_in is not None)
            args = (fields, rad) + ((cuts_in,)
                                    if cuts_in is not None else ())
            out, info = fn(*args)
            grew = False
            if int(info["list_overflow"]):
                caps["vd_maxl"] *= 2
                grew = True
            if int(info["leaf_truncated"]):
                caps["vd_nlv"] = min(caps["vd_nlv"] + 1, 20)
                grew = True
            if int(info["width_exceeded"]):
                caps["vd_width"] *= 2
                grew = True
            if not grew:
                return out, info

    out = info = None
    for _ in range(maxiter):
        out, info = run(state.hsml)
        ngb = out[0]
        state = update_hsml(
            state, ngb, -3.0 * ngb / jnp.maximum(state.hsml, 1e-35),
            ngb, target_ngb, 2.0, boxsize)
        state = HsmlState(
            hsml=jnp.minimum(state.hsml, hmax_allowed),
            left=state.left, right=state.right, done=state.done)
        if bool(jnp.all(state.done | ~jnp.asarray(active))):
            break
    out, info = run(state.hsml)
    ngb, msum, vsum, v2sum = out
    msafe = jnp.maximum(msum, 1e-35)
    vmean = vsum / msafe[:, None]
    v2mean = v2sum / msafe
    var3d = jnp.maximum(v2mean - jnp.sum(vmean ** 2, axis=-1), 0.0)
    sigma_1d = jnp.sqrt(var3d / 3.0) / atime
    vol = 4.0 / 3.0 * jnp.pi * jnp.maximum(state.hsml, 1e-35) ** 3
    return sigma_1d, state.hsml, msum / vol, info
