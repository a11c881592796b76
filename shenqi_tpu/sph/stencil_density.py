"""Grid-stencil SPH density: the direct-P3M neighbour scheme for gas.

Round-3 measurement: SPH is 90-95% of a full-physics step
(validation/NOTES_star_small_r2.md), and the octree walk that feeds
it is a pure neighbour ENUMERATOR — the same observation that
motivated the gravity stencil (gravity/stencil.py).  Density is a
gather over neighbours within H_i (libgadget/densitytree2.hpp:362-425),
so the cell-grid enumeration applies directly:

  * gas sources sort by level-k Morton cell; per cell, the 8 fields a
    density pair needs (ipos xyz, mass, vel xyz, entvar) are
    PAIR-packed into an interleaved [*, 16] i32 table (2 particles
    per 64-byte row — elementwise gathers cost ~10 ns per ROW nearly
    independent of width, memory-notes);
  * targets pack into CELL-ANCHORED 32-lane sub-blocks (bbox inside
    one 2x2x2-cell box by construction);
  * each sub-block keeps the cells within max_i(H_i) of its bbox
    (minimum-image cell geometry, pure arithmetic) — the radius is
    PER BLOCK, not the global rcut of the gravity stencil, because
    smoothing lengths are adaptive;
  * kept candidates pack with the boundary-scatter + cummax fill and
    evaluate densely in count-sorted tiers with static caps;
  * sub-blocks whose bbox+H outgrows the W^3 window (void particles
    probing large radii) are flagged `cover` and left to the caller's
    per-particle oracle patch (sph/density.py already routes
    list-overflow targets through density_walk — same protocol).

Physics identical to sph/density._density_accum (reference
densitytree2.hpp:362-425); cross-checked against the walk engines in
tests/test_stencil_density.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.particles import POS_SCALE
from ..gravity.stencil import _cell_morton
from ..gravity.shortrange_refined import _next_pow2, _round_cap, \
    tier_bounds
from .kernels import (KernelSpec, CUBIC, wk as kern_wk,
                      dwk as kern_dwk, volume, NUMDIMS)
from .density import DensityResult


@partial(jax.jit, static_argnames=("k",))
def build_grid_sph(ipos, mass, vel, entvar, k: int):
    """Sort gas by level-k Morton cell; build the pair-packed table.

    Returns (order, ipos_s, hcell-ready cid_s, ptab [PT+1, 16] i32,
    pmeta [NC, 2] i32 = (pstart, pc) per cell in PAIR-row units,
    n_alive).  Each ptab row interleaves 2 particles x 8 fields
    (ipos xyz | mass | vel xyz | entvar), bitcast to i32.
    """
    n = ipos.shape[0]
    NC = 8 ** k
    alive = mass > 0
    top = (ipos >> jnp.uint32(32 - k)).astype(jnp.uint32)
    cid = _cell_morton(top, k)
    cid = jnp.where(alive, cid, NC)
    order = jnp.argsort(cid).astype(jnp.int32)
    cid_s = cid[order]
    ipos_s = ipos[order]
    mass_s = jnp.where(alive[order], mass[order], 0.0
                       ).astype(jnp.float32)
    vel_s = vel[order].astype(jnp.float32)
    entv_s = entvar[order].astype(jnp.float32)

    cstart = jnp.searchsorted(
        cid_s, jnp.arange(NC + 1, dtype=jnp.int32)).astype(jnp.int32)
    n_alive = cstart[NC]
    pcount = jnp.diff(jnp.concatenate([cstart,
                                       jnp.array([n], jnp.int32)])
                      )[:NC]
    pc = (pcount + 1) >> 1                 # pair rows per cell
    pstart = (jnp.cumsum(pc) - pc).astype(jnp.int32)

    # per-particle table slot via boundary fill (build_grid analog,
    # group=2): B = 2*pstart - cstart is nondecreasing
    B = 2 * pstart - cstart[:NC]
    dst = jnp.where(pcount > 0, cstart[:NC], n)
    bf = jnp.zeros(n + 1, jnp.int32).at[dst].max(
        B, mode="promise_in_bounds")
    bf = jax.lax.cummax(bf[:n])
    p = jnp.arange(n, dtype=jnp.int32)
    PT = n // 2 + NC + 1
    slot = jnp.where(p < n_alive, jnp.minimum(bf + p, 2 * PT - 1),
                     2 * PT)

    rows = jnp.concatenate(
        [jax.lax.bitcast_convert_type(ipos_s, jnp.int32),
         jax.lax.bitcast_convert_type(mass_s, jnp.int32)[:, None],
         jax.lax.bitcast_convert_type(vel_s, jnp.int32),
         jax.lax.bitcast_convert_type(entv_s, jnp.int32)[:, None]],
        axis=1)                                        # [n, 8]
    flat = jnp.zeros((2 * PT + 2, 8), jnp.int32).at[slot].set(
        rows, mode="promise_in_bounds")
    ptab = flat[: 2 * (PT + 1)].reshape(PT + 1, 16)
    ptab = ptab.at[PT].set(0)
    pmeta = jnp.stack([pstart, pc], axis=1)
    return order, ipos_s, cid_s, ptab, pmeta, n_alive


def _sph_classify(bb_lo, bb_hi, live, pmeta, k: int, box, radius,
                  W: int, CAND: int):
    """Per-block-radius candidate classification (_classify analog).

    radius [nbs]: each sub-block keeps cells within ITS radius
    (max target hsml in the block) of its bbox.  Returns
    (pst, pcn [nbs, CAND], counts [nbs], cover_ovf [nbs]).
    """
    S = 1 << k
    cell = box / S
    inv = 1.0 / cell
    r_ = radius[:, None]
    base = jnp.floor(bb_lo * inv - r_ * inv).astype(jnp.int32)
    need = (jnp.floor(bb_hi * inv + r_ * inv).astype(jnp.int32)
            - base + 1)
    cover_ovf = live & jnp.any(need > W, axis=-1)

    r = jnp.arange(W, dtype=jnp.int32)
    offs = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"),
                     axis=-1).reshape(-1, 3)
    coords = base[:, None, :] + offs[None, :, :]
    lane = jnp.all(offs[None, :, :] < need[:, None, :], axis=-1)
    wrapped = jnp.remainder(coords, S)
    cid = _cell_morton(wrapped, k)
    pst0 = pmeta[:, 0][cid]
    pcn0 = pmeta[:, 1][cid]

    ccen = (coords.astype(jnp.float32) + 0.5) * cell
    c = 0.5 * (bb_lo + bb_hi)[:, None, :]
    h = 0.5 * (bb_hi - bb_lo)[:, None, :]
    d = jnp.abs(ccen - c)
    dcell = jnp.maximum(d - h - 0.5 * cell, 0.0)
    d2 = jnp.sum(dcell * dcell, axis=-1)
    keep = lane & live[:, None] & (pcn0 > 0) \
        & (d2 < (radius[:, None]) ** 2)

    BIG = jnp.int32(2 ** 30)
    skey = jnp.where(keep, pst0, BIG)
    pcn = jnp.where(keep, pcn0, 0)
    if CAND > W ** 3:
        pad = CAND - W ** 3
        skey = jnp.pad(skey, ((0, 0), (0, pad)),
                       constant_values=2 ** 30)
        pcn = jnp.pad(pcn, ((0, 0), (0, pad)))
    skey, pcn = jax.lax.sort((skey, pcn), dimension=1, num_keys=1)
    counts = jnp.sum(pcn, axis=1, dtype=jnp.int32)
    pst = jnp.where(pcn > 0, skey, 0)
    return pst, pcn, counts, cover_ovf


@partial(jax.jit, static_argnames=("k", "sub", "W", "CAND", "T",
                                   "TBC", "box"))
def _sph_count(grid, tgt_ipos, tgt_hsml, box, k: int,
               sub: int, W: int, CAND: int, T: int, TBC: int):
    """Target sub-block assembly + classification (one device
    program; diag for the single host sync of the slow path).

    Targets are INDEPENDENT of the source grid (subset iterations of
    the hsml loop pass a GATHERED subset with padded lanes' hsml
    zeroed — no separate active mask is needed): they sort by their
    own cell id and split into cell-anchored sub-blocks at
    level-(k-1) boundaries, exactly like gravity's _stencil_count.
    """
    t = tgt_ipos.shape[0]
    (order_g, ipos_s, cid_s, ptab, pmeta, n_alive) = grid
    top = (tgt_ipos >> jnp.uint32(32 - k)).astype(jnp.uint32)
    tcid = _cell_morton(top, k)
    lanes = jnp.arange(T, dtype=jnp.int32)
    alive_t = tgt_hsml > 0
    key = jnp.where(alive_t, tcid, jnp.int32(2 ** 30))
    torder = jnp.argsort(key).astype(jnp.int32)
    tgt_rows = torder[jnp.minimum(lanes, t - 1)]
    tvalid = alive_t[tgt_rows] & (lanes < t) \
        & (lanes < jnp.sum(alive_t.astype(jnp.int32)))

    jcell = jnp.where(tvalid, tcid[tgt_rows] >> 3, jnp.int32(2 ** 30))
    prev = jnp.concatenate([jnp.full(1, -2, jnp.int32), jcell[:-1]])
    rs = jcell != prev
    run_start = jax.lax.cummax(jnp.where(rs, lanes, 0))
    rank = lanes - run_start
    newblk = (rs | (rank % sub == 0)) & tvalid
    blk = jnp.cumsum(newblk.astype(jnp.int32)) - 1
    tb_total = jnp.max(jnp.where(tvalid, blk, -1)) + 1
    lane_in = rank % sub
    dst = jnp.where(tvalid & (blk < TBC), blk * sub + lane_in,
                    TBC * sub)
    nbs = TBC
    tgt_idx = jnp.zeros(TBC * sub + 1, jnp.int32).at[dst].set(
        tgt_rows, mode="promise_in_bounds")[:TBC * sub
                                            ].reshape(nbs, sub)
    tgt_valid = jnp.zeros(TBC * sub + 1, bool).at[dst].set(
        tvalid, mode="promise_in_bounds")[:TBC * sub
                                          ].reshape(nbs, sub)

    to_f = jnp.float32(box / POS_SCALE)
    tpos = tgt_ipos[tgt_idx.reshape(-1)].reshape(nbs, sub, 3)
    tf = tpos.astype(jnp.float32) * to_f
    BIGF = jnp.float32(3.4e38)
    vv = tgt_valid[..., None]
    bb_lo = jnp.min(jnp.where(vv, tf, BIGF), axis=1)
    bb_hi = jnp.max(jnp.where(vv, tf, -BIGF), axis=1)
    live = jnp.any(tgt_valid, axis=1)
    bb_lo = jnp.where(live[:, None], bb_lo, 0.0)
    bb_hi = jnp.where(live[:, None], bb_hi, 0.0)
    hb = tgt_hsml[tgt_idx.reshape(-1)].reshape(nbs, sub)
    hblk = jnp.max(jnp.where(tgt_valid, hb, 0.0), axis=1)

    pst, pcn, counts, cover = _sph_classify(
        bb_lo, bb_hi, live, pmeta, k, box, hblk, W, CAND)
    pcn = jnp.where(cover[:, None], 0, pcn)
    counts = jnp.where(cover, 0, counts)

    order_s = jnp.argsort(counts)
    tier_c = []
    lo = 0
    for b in tier_bounds(nbs):
        tier_c.append(counts[order_s[b - 1]] if b > 0
                      else jnp.int32(0))
        lo = b
    n_cover = jnp.sum(cover.astype(jnp.int32))
    diag = jnp.stack([*tier_c, n_cover, tb_total])
    return (tgt_idx, tgt_valid, pst, pcn, order_s, cover, diag)


@partial(jax.jit, static_argnames=("spec", "sub", "pcap", "nsel",
                                   "batch", "box"))
def _sph_eval(ptab, tgt_ipos, tgt_vel, tgt_hsml, tgt_idx, tgt_valid,
              pst, pcn, sel, box, spec: KernelSpec, sub: int,
              pcap: int, nsel: int, batch: int = 512):
    """Packed dense density evaluation of the selected sub-blocks.

    pcap in PAIR rows (2 particles each).  Returns the 8 DensityResult
    accumulators, each [nsel, sub(, 3)], in sel order.
    """
    to_f = jnp.float32(box / POS_SCALE)
    QCH = 64                      # pair rows per chunk (128 sources)
    while pcap % QCH:
        QCH //= 2
    bbs = min(batch, nsel, max(64, (1 << 21) // max(pcap, 1)))
    while nsel % bbs:
        bbs //= 2
    nbatch = nsel // bbs
    PT = ptab.shape[0] - 1

    def pack(p0, pn, cap):
        cum = jnp.cumsum(pn, axis=1)
        excl = cum - pn
        total = cum[:, -1]
        v = jnp.where(pn > 0, p0 - excl, 0)
        dst = jnp.where(pn > 0, jnp.minimum(excl, cap), cap)
        flat = (jnp.arange(bbs, dtype=jnp.int32)[:, None]
                * (cap + 1) + dst)
        buf = jnp.zeros(bbs * (cap + 1), jnp.int32).at[
            flat.reshape(-1)].max(v.reshape(-1),
                                  mode="promise_in_bounds")
        vf = jax.lax.cummax(buf.reshape(bbs, cap + 1)[:, :cap],
                            axis=1)
        p = jnp.arange(cap, dtype=jnp.int32)[None, :]
        valid = p < total[:, None]
        pidx = jnp.where(valid, jnp.minimum(vf + p, PT - 1), PT)
        srow = ptab[pidx].reshape(bbs, cap * 2, 8)
        spos = jax.lax.bitcast_convert_type(srow[:, :, :3],
                                            jnp.uint32)
        smass = jax.lax.bitcast_convert_type(srow[:, :, 3],
                                             jnp.float32)
        svel = jax.lax.bitcast_convert_type(srow[:, :, 4:7],
                                            jnp.float32)
        sentv = jax.lax.bitcast_convert_type(srow[:, :, 7],
                                             jnp.float32)
        return spos, smass, svel, sentv

    def eval_batch(sel_b):
        tidx = tgt_idx[sel_b]                    # [bbs, sub]
        tval = tgt_valid[sel_b]
        tgt = tgt_ipos[tidx]                     # [bbs, sub, 3] u32
        tv = tgt_vel[tidx]                       # [bbs, sub, 3] f32
        H = jnp.maximum(tgt_hsml[tidx], 1e-30)   # [bbs, sub]
        spos, smass, svel, sentv = pack(pst[sel_b], pcn[sel_b], pcap)

        def chunk(carry, c):
            (ngb, rho, dh, egy, dhe, div, rot, grad) = carry
            sl = jax.lax.dynamic_slice_in_dim(
                spos, c * 2 * QCH, 2 * QCH, axis=1)
            sm = jax.lax.dynamic_slice_in_dim(
                smass, c * 2 * QCH, 2 * QCH, axis=1)
            sv = jax.lax.dynamic_slice_in_dim(
                svel, c * 2 * QCH, 2 * QCH, axis=1)
            se = jax.lax.dynamic_slice_in_dim(
                sentv, c * 2 * QCH, 2 * QCH, axis=1)
            # dist: source -> target (reference get_distance
            # convention, ops/treewalk.py:21), uint32-exact wrap
            d = tgt[:, :, None, :] - sl[:, None, :, :]
            dist = jax.lax.bitcast_convert_type(
                d, jnp.int32).astype(jnp.float32) * to_f
            r2 = jnp.sum(dist * dist, axis=-1)   # [bbs, sub, S]
            Hc = H[:, :, None]
            inside = (r2 < Hc * Hc) & (sm[:, None, :] > 0)
            w = jnp.where(inside, 1.0, 0.0)
            r = jnp.sqrt(r2)
            u = jnp.minimum(r / Hc, 1.0)
            wkv = kern_wk(spec, u, Hc)
            dwkv = kern_dwk(spec, u, Hc)
            dWdH = -(NUMDIMS * wkv / Hc + u * dwkv)
            m = sm[:, None, :]
            ngb = ngb + jnp.sum(w * wkv, axis=2)
            rho = rho + jnp.sum(w * m * wkv, axis=2)
            dh = dh + jnp.sum(w * m * dWdH, axis=2)
            ev = se[:, None, :]
            egy = egy + jnp.sum(w * m * ev * wkv, axis=2)
            dhe = dhe + jnp.sum(w * m * ev * dWdH, axis=2)
            fac = jnp.where(r2 > 0,
                            m * dwkv / jnp.maximum(r, 1e-30),
                            0.0) * w
            dv = tv[:, :, None, :] - sv[:, None, :, :]
            div = div - jnp.sum(fac * jnp.sum(dist * dv, axis=-1),
                                axis=2)
            cx = dv[..., 1] * dist[..., 2] - dv[..., 2] * dist[..., 1]
            cy = dv[..., 2] * dist[..., 0] - dv[..., 0] * dist[..., 2]
            cz = dv[..., 0] * dist[..., 1] - dv[..., 1] * dist[..., 0]
            rot = rot + jnp.stack(
                [jnp.sum(fac * cx, axis=2),
                 jnp.sum(fac * cy, axis=2),
                 jnp.sum(fac * cz, axis=2)], axis=-1)
            grad = grad + jnp.sum(fac[..., None] * dist, axis=2)
            return (ngb, rho, dh, egy, dhe, div, rot, grad), None

        z = lambda *s: jnp.zeros((bbs, sub) + s, jnp.float32)
        carry0 = (z(), z(), z(), z(), z(), z(), z(3), z(3))
        carry, _ = jax.lax.scan(chunk, carry0,
                                jnp.arange(pcap // QCH))
        (ngb, rho, dh, egy, dhe, div, rot, grad) = carry
        ngb = ngb * volume(H)      # kernel-weighted neighbour number
        out = [ngb, rho, dh, egy, dhe, div, rot, grad]
        out = [jnp.where(tval[..., None] if o.ndim == 3 else tval,
                         o, 0.0) for o in out]
        return tuple(out)

    outs = jax.lax.map(eval_batch, sel.reshape(nbatch, bbs))
    res = []
    for o in outs:
        if o.ndim == 4:
            res.append(o.reshape(nsel, sub, 3))
        else:
            res.append(o.reshape(nsel, sub))
    return tuple(res)


def _round_tbc(x):
    return max((x + 1023) // 1024 * 1024, 1024)


def stencil_density_walk(grid, tgt_ipos, tgt_vel, tgt_hsml, boxsize,
                         k: int, spec: KernelSpec = CUBIC,
                         sub: int = 32, W: int = 7,
                         tier_cache: dict = None, batch: int = 512):
    """One density evaluation at given smoothing lengths over the
    pair-packed source grid (density_walk_blocked analog, no octree).

    grid: build_grid_sph output (sources fixed across the hsml loop).
    Returns (DensityResult, cover [t] bool, n_cover host int):
    cover-marked targets were NOT evaluated (their bbox+H outgrew the
    W^3 window) — the caller patches them with the per-particle
    oracle, exactly like the list-overflow protocol in
    sph/density.density.  n_cover comes from the SAME host sync as
    the cap diagnostics, so checking it costs nothing extra.
    """
    t = tgt_ipos.shape[0]
    if tier_cache is None:
        tier_cache = {}
    box = float(boxsize)
    CAND = _next_pow2(W ** 3) if W ** 3 & (W ** 3 - 1) else W ** 3
    T = ((t + sub - 1) // sub) * sub

    tbc_key = ("sphst_tbc", k, sub)
    TBC = tier_cache.get(
        tbc_key, _round_tbc(T // sub + max(T // (4 * sub), 64)))
    while True:
        (tgt_idx, tgt_valid, pst, pcn, order_s, cover,
         diag) = _sph_count(grid, tgt_ipos, tgt_hsml, box,
                            k, sub, W, CAND, T, TBC)
        (c1, c2, c3, c4, n_cover, tb_total) = [
            int(x) for x in np.asarray(diag)]
        if tb_total <= TBC:
            break
        TBC = _round_tbc(tb_total + 256)
    tier_cache[tbc_key] = TBC

    nbs = TBC
    key = ("sphst", k, sub, W, nbs)
    cached = tier_cache.get(key, (0, 0, 0, 0))
    caps = []
    hi = 0
    for c, cc in zip((c1, c2, c3, c4), cached):
        need = c + 1
        g = cc
        if need > cc:
            g = _round_cap(need + 8, align=64)
            if cc:
                g = max(g, cc + 64)
        hi = max(hi, g)
        caps.append(hi)
    pcaps = tuple(caps)
    tier_cache[key] = pcaps

    ptab = grid[3]
    z = lambda *s: jnp.zeros((nbs, sub) + s, jnp.float32)
    accs = [z(), z(), z(), z(), z(), z(), z(3), z(3)]
    lo = 0
    for b, pcap in zip(tier_bounds(nbs), pcaps):
        nsel = b - lo
        if nsel <= 0:
            lo = b
            continue
        sel = jnp.sort(order_s[lo:b])
        out = _sph_eval(ptab, tgt_ipos, tgt_vel, tgt_hsml, tgt_idx,
                        tgt_valid, pst, pcn, sel, box, spec, sub,
                        pcap, nsel, batch=batch)
        for i in range(8):
            accs[i] = accs[i].at[sel].set(out[i])
        lo = b

    # scatter back: sub-block lanes -> original target order
    flat_idx = jnp.where(tgt_valid & ~cover[:, None], tgt_idx, t
                         ).reshape(-1)
    res = []
    for a in accs:
        if a.ndim == 2:        # scalar accumulator [nbs, sub]
            res.append(jnp.zeros((t + 1,), jnp.float32).at[
                flat_idx].set(a.reshape(-1))[:t])
        else:                  # vector accumulator [nbs, sub, 3]
            res.append(jnp.zeros((t + 1, 3), jnp.float32).at[
                flat_idx].set(a.reshape(-1, 3))[:t])
    cover_t = jnp.zeros(t + 1, bool).at[
        jnp.where(tgt_valid, tgt_idx, t).reshape(-1)].max(
        (cover[:, None] & tgt_valid).reshape(-1))[:t]
    return DensityResult(*res), cover_t, n_cover
