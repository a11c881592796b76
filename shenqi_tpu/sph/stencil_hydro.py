"""Grid-stencil SPH hydro force (hydratree2.hpp analog, no octree).

The hydro pair is SYMMETRIC: i and j interact when
r < max(H_i, H_j) (libgadget/hydratree2.hpp pair condition), so the
cell enumeration must cover both reaches:

  * the i-side reach (max target H in a sub-block) widens the
    candidate window exactly like the density stencil;
  * the j-side reach is bounded PER CELL: cellh[c] = max hsml of the
    REGULAR sources in cell c — a candidate cell is kept when it lies
    within max(hblk, cellh[c]) of the bbox (the grid analog of the
    octree's node-hmax, force_update_hmax semantics);
  * sources with hsml > hcut = 2 cells ("long-reach": rare void
    particles) cannot be covered by the W^3 window from the j side —
    they are compacted into a flat list and evaluated against ALL
    targets in one dense pass, and EXCLUDED from the stencil pass by
    the H_j <= hcut test (each pair found exactly once);
  * sub-blocks whose own hblk outgrows the window are flagged
    `cover` for the caller's per-particle oracle patch (same
    protocol as stencil_density).

Sources pack 16 fields = one 64-byte row per particle (x y z mass
hsml vx vy vz density eomdensity entvar pressure divvel curlvel
dhsml_egy dloga); decoupled sources (hydro-decoupled winds) fold to
mass=0.  The per-pair physics is NOT reimplemented: _hydro_accum —
the exact accumulator the walk engines use — is double-vmapped over
[block, lane], so stencil-vs-walk parity is structural.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.particles import POS_SCALE
from ..gravity.stencil import _cell_morton
from ..gravity.shortrange_refined import _next_pow2, _round_cap, \
    tier_bounds
from .kernels import KernelSpec, CUBIC
from ..utils.constants import GAMMA_MINUS1
from .hydro import HydroResult, _hydro_accum_cached, _hydro_extra


@partial(jax.jit, static_argnames=("k", "lcap"))
def build_grid_hydro(ipos, fields, k: int, hcut, lcap: int):
    """Sort sources by level-k Morton cell; single-row packed table.

    fields: [n, 13] f32 = (mass, hsml, vx, vy, vz, density,
    eomdensity, entvar, pressure, divvel, curlvel, dhsml_egy, dloga)
    with mass already zeroed for dead/decoupled rows.

    Returns (stab [n+1, 16] i32, smeta [NC, 2] (start, count),
    cellh [NC] f32 max REGULAR-source hsml, long_rows [lcap, 16] i32
    packed long-reach sources, n_long).
    """
    n = ipos.shape[0]
    NC = 8 ** k
    mass = fields[:, 0]
    hsml = fields[:, 1]
    alive = mass > 0
    top = (ipos >> jnp.uint32(32 - k)).astype(jnp.uint32)
    cid = _cell_morton(top, k)
    cid = jnp.where(alive, cid, NC)
    order = jnp.argsort(cid).astype(jnp.int32)
    cid_s = cid[order]
    ipos_s = ipos[order]
    f_s = fields[order]
    f_s = f_s.at[:, 0].set(jnp.where(alive[order], f_s[:, 0], 0.0))

    cstart = jnp.searchsorted(
        cid_s, jnp.arange(NC + 1, dtype=jnp.int32)).astype(jnp.int32)

    rows = jnp.concatenate(
        [jax.lax.bitcast_convert_type(ipos_s, jnp.int32),
         jax.lax.bitcast_convert_type(f_s.astype(jnp.float32),
                                      jnp.int32)], axis=1)  # [n, 16]
    stab = jnp.zeros((n + 1, 16), jnp.int32).at[:n].set(rows)
    count = jnp.diff(cstart)
    smeta = jnp.stack([cstart[:NC], count], axis=1)

    # per-cell j-side reach over REGULAR sources only
    hreg = jnp.where((hsml <= hcut) & alive, hsml, 0.0)
    cellh = jnp.zeros(NC + 1, jnp.float32).at[
        jnp.minimum(cid, NC)].max(hreg, mode="promise_in_bounds")[:NC]

    # long-reach compaction (sorted-row order): rank by prefix sum
    is_long = (hsml > hcut) & alive
    is_long_s = is_long[order]
    rank = jnp.cumsum(is_long_s.astype(jnp.int32)) - 1
    n_long = jnp.sum(is_long_s.astype(jnp.int32))
    dst = jnp.where(is_long_s & (rank < lcap), rank, lcap)
    long_rows = jnp.zeros((lcap + 1, 16), jnp.int32).at[dst].set(
        rows, mode="promise_in_bounds")[:lcap]
    return stab, smeta, cellh, long_rows, n_long


def _unpack_src(srow):
    """[..., 16] i32 rows -> source dict for _hydro_accum."""
    f = jax.lax.bitcast_convert_type(srow[..., 3:], jnp.float32)
    return {
        "ipos": jax.lax.bitcast_convert_type(srow[..., :3],
                                             jnp.uint32),
        "mass": f[..., 0], "hsml": f[..., 1],
        "vel": f[..., 2:5], "density": f[..., 5],
        "eomdensity": f[..., 6], "entvar": f[..., 7],
        "pressure": f[..., 8], "divvel": f[..., 9],
        "curlvel": f[..., 10], "dhsml_egy": f[..., 11],
        "dloga": f[..., 12],
        "decoupled": jnp.zeros(srow.shape[:-1], bool),
    }


@partial(jax.jit, static_argnames=("k", "sub", "W", "CAND", "T",
                                   "TBC", "box", "hcut"))
def _hydro_count(tgt_ipos, tgt_hsml, tvalid_in, smeta, cellh, box,
                 hcut, k: int, sub: int, W: int, CAND: int, T: int,
                 TBC: int):
    """Sub-block assembly + symmetric-reach classification."""
    t = tgt_ipos.shape[0]
    top = (tgt_ipos >> jnp.uint32(32 - k)).astype(jnp.uint32)
    tcid = _cell_morton(top, k)
    lanes = jnp.arange(T, dtype=jnp.int32)
    alive_t = tvalid_in
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

    # enumeration radius covers BOTH reaches: the block's own hblk
    # and the j-side bound hcut (cells farther than hcut cannot hold
    # a regular source that reaches the bbox)
    S = 1 << k
    cell = box / S
    inv = 1.0 / cell
    r_enum = jnp.maximum(hblk, jnp.float32(hcut))[:, None]
    base = jnp.floor(bb_lo * inv - r_enum * inv).astype(jnp.int32)
    need = (jnp.floor(bb_hi * inv + r_enum * inv).astype(jnp.int32)
            - base + 1)
    cover = live & jnp.any(need > W, axis=-1)

    r = jnp.arange(W, dtype=jnp.int32)
    offs = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"),
                     axis=-1).reshape(-1, 3)
    coords = base[:, None, :] + offs[None, :, :]
    lane = jnp.all(offs[None, :, :] < need[:, None, :], axis=-1)
    wrapped = jnp.remainder(coords, S)
    cid = _cell_morton(wrapped, k)
    sst0 = smeta[:, 0][cid]
    scn0 = smeta[:, 1][cid]
    ch = cellh[cid]

    ccen = (coords.astype(jnp.float32) + 0.5) * cell
    c = 0.5 * (bb_lo + bb_hi)[:, None, :]
    h = 0.5 * (bb_hi - bb_lo)[:, None, :]
    d = jnp.abs(ccen - c)
    dcell = jnp.maximum(d - h - 0.5 * cell, 0.0)
    d2 = jnp.sum(dcell * dcell, axis=-1)
    reach = jnp.maximum(hblk[:, None], ch)
    keep = lane & live[:, None] & (scn0 > 0) & (d2 < reach * reach)

    BIG = jnp.int32(2 ** 30)
    skey = jnp.where(keep, sst0, BIG)
    scn = jnp.where(keep, scn0, 0)
    if CAND > W ** 3:
        pad = CAND - W ** 3
        skey = jnp.pad(skey, ((0, 0), (0, pad)),
                       constant_values=2 ** 30)
        scn = jnp.pad(scn, ((0, 0), (0, pad)))
    skey, scn = jax.lax.sort((skey, scn), dimension=1, num_keys=1)
    counts = jnp.sum(scn, axis=1, dtype=jnp.int32)
    sst = jnp.where(scn > 0, skey, 0)
    scn = jnp.where(cover[:, None], 0, scn)
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
    return (tgt_idx, tgt_valid, sst, scn, order_s, cover, diag)


@partial(jax.jit, static_argnames=("spec", "par_static", "sub",
                                   "pcap", "nsel", "batch", "box",
                                   "hcut"))
def _hydro_eval(stab, extra, tgt_ipos, tgt_idx, tgt_valid, sst, scn,
                sel, box, hcut, spec: KernelSpec, par_static,
                sub: int, pcap: int, nsel: int, batch: int = 256):
    """Packed dense hydro evaluation of the selected sub-blocks.

    pcap in SINGLE source rows.  extra: the _hydro_extra dict over
    the FULL target set (gathered per block here).
    """
    accum = _hydro_accum_cached(spec, par_static)
    QCH = 128
    while pcap % QCH:
        QCH //= 2
    bbs = min(batch, nsel, max(32, (1 << 20) // max(pcap, 1)))
    while nsel % bbs:
        bbs //= 2
    nbatch = nsel // bbs
    NT = stab.shape[0] - 1

    def pack_idx(s0, sn, cap):
        cum = jnp.cumsum(sn, axis=1)
        excl = cum - sn
        total = cum[:, -1]
        v = jnp.where(sn > 0, s0 - excl, 0)
        dst = jnp.where(sn > 0, jnp.minimum(excl, cap), cap)
        flat = (jnp.arange(bbs, dtype=jnp.int32)[:, None]
                * (cap + 1) + dst)
        buf = jnp.zeros(bbs * (cap + 1), jnp.int32).at[
            flat.reshape(-1)].max(v.reshape(-1),
                                  mode="promise_in_bounds")
        vf = jax.lax.cummax(buf.reshape(bbs, cap + 1)[:, :cap],
                            axis=1)
        p = jnp.arange(cap, dtype=jnp.int32)[None, :]
        valid = p < total[:, None]
        pidx = jnp.where(valid, jnp.minimum(vf + p, NT - 1), NT)
        return pidx, valid

    def eval_batch(sel_b):
        tidx = tgt_idx[sel_b]                    # [bbs, sub]
        tval = tgt_valid[sel_b]
        tgt = tgt_ipos[tidx]                     # [bbs, sub, 3] u32
        extra_blk = jax.tree_util.tree_map(lambda a: a[tidx], extra)
        pidx, pvalid = pack_idx(sst[sel_b], scn[sel_b], pcap)

        def chunk(carry, ci):
            sl = jax.lax.dynamic_slice_in_dim(pidx, ci * QCH, QCH,
                                              axis=1)
            lv = jax.lax.dynamic_slice_in_dim(pvalid, ci * QCH, QCH,
                                              axis=1)
            srow = stab[sl]                       # [bbs, QCH, 16]
            src = _unpack_src(srow)
            # stencil pass excludes long-reach sources (H_j > hcut):
            # they are handled exactly once by the dense long pass
            live = (lv[:, None, :] & tval[:, :, None]
                    & (src["hsml"] <= hcut)[:, None, :])

            def one_t(extra_t, tpos_u, src_c, live_t, carry_t):
                d = tpos_u[None, :] - src_c["ipos"]
                dist = jax.lax.bitcast_convert_type(
                    d, jnp.int32).astype(jnp.float32) \
                    * jnp.float32(box / POS_SCALE)
                r2 = jnp.sum(dist * dist, axis=-1)
                tpos_f = tpos_u.astype(jnp.float32) \
                    * jnp.float32(box / POS_SCALE)
                return accum(carry_t, extra_t, tpos_f, src_c, dist,
                             r2, live_t)

            inner = jax.vmap(one_t, in_axes=(0, 0, None, 0, 0))
            outer = jax.vmap(inner, in_axes=(0, 0, 0, 0, 0))
            return outer(extra_blk, tgt, src, live, carry), None

        carry0 = (jnp.zeros((bbs, sub, 3), jnp.float32),
                  jnp.zeros((bbs, sub), jnp.float32),
                  jnp.zeros((bbs, sub), jnp.float32))
        carry, _ = jax.lax.scan(chunk, carry0,
                                jnp.arange(pcap // QCH))
        acc, dts, mv = carry
        acc = jnp.where(tval[..., None], acc, 0.0)
        dts = jnp.where(tval, dts, 0.0)
        mv = jnp.where(tval, mv, 0.0)
        return acc, dts, mv

    acc, dts, mv = jax.lax.map(eval_batch, sel.reshape(nbatch, bbs))
    return (acc.reshape(nsel, sub, 3), dts.reshape(nsel, sub),
            mv.reshape(nsel, sub))


@partial(jax.jit, static_argnames=("spec", "par_static", "box",
                                   "lcap", "tch"))
def _hydro_long_eval(long_rows, extra, tgt_ipos, tvalid, n_long, box,
                     spec: KernelSpec, par_static, lcap: int,
                     tch: int = 4096):
    """Dense pass: every target vs the compacted long-reach sources.

    Targets are processed in `tch`-sized chunks via lax.map so the
    [targets, lcap] pair intermediates never exceed tch*lcap rows
    (HBM-bounded at production scale)."""
    accum = _hydro_accum_cached(spec, par_static)
    src = _unpack_src(long_rows)                 # dict [lcap(,3)]
    lanes = jnp.arange(lcap, dtype=jnp.int32)
    lvalid = lanes < n_long
    t = tgt_ipos.shape[0]

    def one_t(extra_t, tpos_u, valid_t):
        d = tpos_u[None, :] - src["ipos"]
        dist = jax.lax.bitcast_convert_type(
            d, jnp.int32).astype(jnp.float32) \
            * jnp.float32(box / POS_SCALE)
        r2 = jnp.sum(dist * dist, axis=-1)
        tpos_f = tpos_u.astype(jnp.float32) \
            * jnp.float32(box / POS_SCALE)
        carry0 = (jnp.zeros(3, jnp.float32), jnp.float32(0.0),
                  jnp.float32(0.0))
        return accum(carry0, extra_t, tpos_f, src, dist, r2,
                     lvalid & valid_t)

    if t <= tch:
        return jax.vmap(one_t)(extra, tgt_ipos,
                               jnp.broadcast_to(tvalid[:, None],
                                                (t, lcap)))
    tp = ((t + tch - 1) // tch) * tch
    idx = jnp.minimum(jnp.arange(tp, dtype=jnp.int32), t - 1)
    extra_p = jax.tree_util.tree_map(lambda a: a[idx], extra)
    tgt_p = tgt_ipos[idx]
    val_p = tvalid[idx] & (jnp.arange(tp) < t)

    def chunk(args):
        e_c, tg_c, v_c = args
        return jax.vmap(one_t)(e_c, tg_c,
                               jnp.broadcast_to(v_c[:, None],
                                                (tch, lcap)))

    nb = tp // tch
    rs = lambda a: a.reshape((nb, tch) + a.shape[1:])
    acc, dts, mv = jax.lax.map(
        chunk, (jax.tree_util.tree_map(rs, extra_p), rs(tgt_p),
                rs(val_p)))
    return (acc.reshape(tp, 3)[:t], dts.reshape(tp)[:t],
            mv.reshape(tp)[:t])


def _round_tbc(x):
    return max((x + 1023) // 1024 * 1024, 1024)


def stencil_hydro_walk(ipos_src, src_fields, targets, par,
                       spec: KernelSpec = CUBIC, k: int = None,
                       sub: int = 32, W: int = 7,
                       tier_cache: dict = None, tf=None,
                       batch: int = 256, tvalid=None):
    """Hydro force over the source grid (hydro_walk_blocked analog).

    ipos_src [n,3] u32; src_fields [n,13] f32 (see build_grid_hydro;
    mass pre-zeroed for dead/decoupled).  targets: the hydro_walk
    targets dict.  Returns (HydroResult, cover [t] bool, n_cover
    host int) — cover targets must be patched with the per-particle
    oracle; n_cover rides the cap-diagnostic sync, costing nothing.
    """
    t = targets["ipos"].shape[0]
    if tier_cache is None:
        tier_cache = {}
    box = float(par.boxsize)
    if k is None:
        n_src = ipos_src.shape[0]
        sep = box / max(n_src, 1) ** (1.0 / 3.0)
        k = int(np.clip(round(np.log2(box / (2.4 * sep))), 1, 10))
    cell = box / (1 << k)
    hcut = 2.0 * cell
    CAND = _next_pow2(W ** 3) if W ** 3 & (W ** 3 - 1) else W ** 3
    T = ((t + sub - 1) // sub) * sub
    par_static = par.static_key()

    # long-reach source cap (grow-only)
    lkey = ("hyst_lcap", k)
    lcap = tier_cache.get(lkey, 256)
    while True:
        stab, smeta, cellh, long_rows, n_long = build_grid_hydro(
            ipos_src, src_fields, k, hcut, lcap)
        nl = int(n_long)
        if nl <= lcap:
            break
        lcap = _next_pow2(nl + 16)
    tier_cache[lkey] = lcap

    tvalid_t = (targets["hsml"] > 0) if tvalid is None \
        else (tvalid & (targets["hsml"] > 0))
    tbc_key = ("hyst_tbc", k, sub)
    TBC = tier_cache.get(
        tbc_key, _round_tbc(T // sub + max(T // (4 * sub), 64)))
    while True:
        (tgt_idx, tgt_valid, sst, scn, order_s, cover,
         diag) = _hydro_count(targets["ipos"], targets["hsml"],
                              tvalid_t, smeta, cellh, box, hcut, k,
                              sub, W, CAND, T, TBC)
        (c1, c2, c3, c4, n_cover, tb_total) = [
            int(x) for x in np.asarray(diag)]
        if tb_total <= TBC:
            break
        TBC = _round_tbc(tb_total + 256)
    tier_cache[tbc_key] = TBC

    nbs = TBC
    key = ("hyst", k, sub, W, nbs)
    cached = tier_cache.get(key, (0, 0, 0, 0))
    caps = []
    hi = 0
    for c, cc in zip((c1, c2, c3, c4), cached):
        need = c + 1
        g = cc
        if need > cc:
            g = _round_cap(need + 16, align=128)
            if cc:
                g = max(g, cc + 128)
        hi = max(hi, g)
        caps.append(hi)
    pcaps = tuple(caps)
    tier_cache[key] = pcaps

    extra = _hydro_extra(targets, par, t, tf)
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
        a, d_, m_ = _hydro_eval(stab, extra, targets["ipos"],
                                tgt_idx, tgt_valid, sst, scn, sel,
                                box, hcut, spec, par_static, sub,
                                pcap, nsel, batch=batch)
        acc_bs = acc_bs.at[sel].set(a)
        dts_bs = dts_bs.at[sel].set(d_)
        mv_bs = mv_bs.at[sel].set(m_)
        lo = b

    flat_idx = jnp.where(tgt_valid & ~cover[:, None], tgt_idx, t
                         ).reshape(-1)
    acc = jnp.zeros((t + 1, 3), jnp.float32).at[flat_idx].set(
        acc_bs.reshape(-1, 3))[:t]
    dts = jnp.zeros(t + 1, jnp.float32).at[flat_idx].set(
        dts_bs.reshape(-1))[:t]
    mv = jnp.zeros(t + 1, jnp.float32).at[flat_idx].set(
        mv_bs.reshape(-1))[:t]

    if nl > 0:
        la, ld, lm = _hydro_long_eval(long_rows, extra,
                                      targets["ipos"], tvalid_t,
                                      n_long, box, spec, par_static,
                                      lcap)
        acc = acc + la
        dts = dts + ld
        mv = jnp.maximum(mv, lm)

    cover_t = jnp.zeros(t + 1, bool).at[
        jnp.where(tgt_valid, tgt_idx, t).reshape(-1)].max(
        (cover[:, None] & tgt_valid).reshape(-1))[:t]

    # entropy rate conversion (hydratree2.hpp:140, hydro_walk tail)
    hub_a2 = (tf or {}).get("hubble_a2", par.hubble_a2)
    dts = dts * GAMMA_MINUS1 / (hub_a2 * jnp.maximum(
        targets["density"], 1e-35) ** GAMMA_MINUS1)
    return HydroResult(accel=acc, dt_entropy=dts,
                       max_signal_vel=mv), cover_t, n_cover
