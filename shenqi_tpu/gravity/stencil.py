"""Grid-stencil short-range gravity: a direct-P3M neighbour scheme.

Measurement-driven redesign (round 3).  At production scales the
relative-acceleration MAC accepts NOTHING within rcut — the traversal
diag shows max accepted monopoles == 0 at 64^3 AND 128^3 clustered
steady state: every node within rcut opens all the way to leaves.  The
octree walk is therefore a pure neighbour ENUMERATOR, and an expensive
one: at 128^3 it costs 5.1 s of a 22.8 s step (plus 1.6 s octree build
+ 3.9 s list classification, tools/time_refined.py WHICH=parts).

A regular S^3 Morton cell grid enumerates the same neighbourhood in
O(1) per target group:

  * particles sort by level-k Morton cell id (cells PARTITION the
    particle range by construction — none of the canonical-leaf
    subtleties of the tree's nested is_leaf nodes);
  * per cell, sources are quad-packed into an interleaved [*, 16] i32
    table (4 particles per 64-byte row: elementwise gathers cost ~10
    ns per ROW nearly independent of width);
  * each 32-target sub-block tests the FIXED W^3 stencil of cells
    around its bbox: cell geometry is pure arithmetic — no gathered
    node table at all — and the only gather is one 8-byte
    (qstart, qc) row per candidate;
  * kept candidates (cell-to-bbox minimum-image distance < rcut,
    gravshort-tree.c rcut semantics) are sorted by qstart and packed
    with the boundary-scatter + cummax fill, then evaluated in
    count-sorted tiers with static caps — the same dense schedule as
    shortrange_refined._refined_eval;
  * sub-blocks whose bbox is too wide for the W^3 window (sparse
    regions) fall back to PER-TARGET stencils, for which W=5 is
    sufficient by construction (a point spans no cells) — this also
    serves small active subsets under hierarchical timestepping,
    where 32 consecutive active targets span many cells.

The force is STRICTLY more accurate than the walk engines: no
monopole approximation inside rcut at all — every source within
rcut (+ cell slop) is direct P2P through the smooth window
(reference force law: libgadget/gravity/gravshort-tree.c +
shortrange window table; pair math identical to
shortrange_refined._pair_fac).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.particles import POS_SCALE
from ..ops.morton import _expand_bits10
from .shortrange import ShortRangeParams, PolyWindow
from .shortrange_refined import _pair_fac_any, _next_pow2, _round_cap, \
    tier_bounds


def _round_tbc(x):
    """Sub-block capacity rounded to 1k multiples (not pow2): dead
    padding blocks ride tier 0's dense eval, so slack is pure waste."""
    return max((x + 1023) // 1024 * 1024, 1024)


def default_tbc(T: int, sub: int) -> int:
    """Initial sub-block capacity estimate for T padded targets."""
    return _round_tbc(T // sub + max(T // (4 * sub), 64))


def grow_tier_caps(counts, cached, margin, bump):
    """Grow-only tier caps with drift hysteresis: counts jitter a few
    units per step as particles move — without margin a count sitting
    on a 128-quad quantum boundary recompiles the tier eval every
    step.  Sufficiency rule everywhere: need = count + 1."""
    caps = []
    hi = 0
    for c, cc in zip(counts, cached):
        need = int(c) + 1
        if need > cc:
            g = _round_cap(need + margin)
            if cc:
                g = max(g, cc + bump)       # growth event: headroom
        else:
            g = cc
        hi = max(hi, g)
        caps.append(hi)
    return tuple(caps)


def _cell_morton(coords, k: int):
    """Morton cell id from integer cell coords [..., 3] at level k."""
    cx = _expand_bits10(coords[..., 0].astype(jnp.uint32))
    cy = _expand_bits10(coords[..., 1].astype(jnp.uint32))
    cz = _expand_bits10(coords[..., 2].astype(jnp.uint32))
    return ((cx << jnp.uint32(2)) | (cy << jnp.uint32(1))
            | cz).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def build_grid(ipos, mass, k: int):
    """Sort by level-k Morton cell; build cell + quad-packed tables.

    Returns (order, ipos_s, mass_s, qtab [QT+1,16] i32,
    qmeta [NC, 2] i32 = (qstart, qc) per cell, n_alive).
    All cumsum/scatter based — no per-node argsort (the octree quad
    build's 6.6M-node argsort cost 0.8 s at 128^3).
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

    cstart = jnp.searchsorted(
        cid_s, jnp.arange(NC + 1, dtype=jnp.int32)).astype(jnp.int32)
    n_alive = cstart[NC]
    pcount = jnp.diff(jnp.concatenate([cstart,
                                       jnp.array([n], jnp.int32)])
                      )[:NC]
    qc = (pcount + 3) >> 2
    qstart = (jnp.cumsum(qc) - qc).astype(jnp.int32)

    # per-particle table slot via boundary fill: B = 4*qstart - cstart
    # scattered at each nonempty cell's first particle, cummax-filled
    # (B is nondecreasing: 4*ceil(pc/4) >= pc)
    B = 4 * qstart - cstart[:NC]
    dst = jnp.where(pcount > 0, cstart[:NC], n)
    bf = jnp.zeros(n + 1, jnp.int32).at[dst].max(
        B, mode="promise_in_bounds")
    bf = jax.lax.cummax(bf[:n])
    p = jnp.arange(n, dtype=jnp.int32)
    QT = n // 4 + NC + 1
    slot = jnp.where(p < n_alive, jnp.minimum(bf + p, 4 * QT - 1),
                     4 * QT)

    rows = jnp.concatenate(
        [jax.lax.bitcast_convert_type(ipos_s, jnp.int32),
         jax.lax.bitcast_convert_type(mass_s, jnp.int32)[:, None]],
        axis=1)
    flat = jnp.zeros((4 * QT + 4, 4), jnp.int32).at[slot].set(
        rows, mode="promise_in_bounds")
    qtab = flat[: 4 * (QT + 1)].reshape(QT + 1, 16)
    qtab = qtab.at[QT].set(0)
    qmeta = jnp.stack([qstart, qc], axis=1)
    return order, ipos_s, mass_s, qtab, qmeta, n_alive


def _classify(bb_lo, bb_hi, live, qmeta, k: int, box, rcut, W: int,
              CAND: int, h_near=None):
    """Candidate stencil classification for [nbs] bboxes.

    Pure arithmetic geometry (no node table): candidates are the W^3
    cells from floor((bb_lo - rcut)/cell); a candidate is kept when
    its box lies within rcut of the bbox (minimum-image).  Kept
    candidates' (qstart, qc) are returned SORTED by qstart with
    dropped lanes forced to (BIG, 0) — qc=0 lanes are no-ops in the
    cummax packing, so no separate keep mask is needed downstream.

    h_near (softening length): when given, ALSO returns the NEAR
    subset — cells within h of the bbox, the only ones that can hold
    softened (r < h) pairs — for the capped-kernel correction pass.

    Returns (qst, qcn [nbs, CAND], counts [nbs], cover_ovf [nbs],
    near) with near = None or (qst_n, qcn_n [nbs, CAND], counts_n).
    """
    S = 1 << k
    cell = box / S
    inv = 1.0 / cell
    base = jnp.floor(bb_lo * inv - rcut * inv).astype(jnp.int32)
    need = (jnp.floor(bb_hi * inv + rcut * inv).astype(jnp.int32)
            - base + 1)                            # [nbs, 3]
    cover_ovf = live & jnp.any(need > W, axis=-1)

    r = jnp.arange(W, dtype=jnp.int32)
    offs = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"),
                     axis=-1).reshape(-1, 3)       # [W^3, 3]
    coords = base[:, None, :] + offs[None, :, :]   # [nbs, W^3, 3]
    lane = jnp.all(offs[None, :, :] < need[:, None, :], axis=-1)
    wrapped = jnp.remainder(coords, S)
    cid = _cell_morton(wrapped, k)                 # [nbs, W^3]
    # TWO plain gathers, NOT one [*, 2]-row gather: XLA tiles the
    # minor dim to 128 lanes (64x padding — 15.6G HBM at 64^3)
    qst0 = qmeta[:, 0][cid]
    qcn0 = qmeta[:, 1][cid]

    # unwrapped geometry: the window was built around the bbox, so
    # centers are already minimum-image — no box wrap needed
    ccen = (coords.astype(jnp.float32) + 0.5) * cell
    c = 0.5 * (bb_lo + bb_hi)[:, None, :]
    h = 0.5 * (bb_hi - bb_lo)[:, None, :]
    d = jnp.abs(ccen - c)
    dcell = jnp.maximum(d - h - 0.5 * cell, 0.0)
    d2 = jnp.sum(dcell * dcell, axis=-1)
    base_keep = lane & live[:, None] & (qcn0 > 0)

    def pack(keep):
        BIG = jnp.int32(2 ** 30)
        skey = jnp.where(keep, qst0, BIG)
        qcn = jnp.where(keep, qcn0, 0)
        if CAND > W ** 3:
            pad = CAND - W ** 3
            skey = jnp.pad(skey, ((0, 0), (0, pad)),
                           constant_values=2 ** 30)
            qcn = jnp.pad(qcn, ((0, 0), (0, pad)))
        skey, qcn = jax.lax.sort((skey, qcn), dimension=1,
                                 num_keys=1)
        counts = jnp.sum(qcn, axis=1, dtype=jnp.int32)
        qst = jnp.where(qcn > 0, skey, 0)
        return qst, qcn, counts

    qst, qcn, counts = pack(base_keep & (d2 <= rcut * rcut))
    near = None
    if h_near is not None:
        near = pack(base_keep & (d2 < h_near * h_near))
    return qst, qcn, counts, cover_ovf, near


def _poly_fw(r, cellsize, wt: PolyWindow):
    xmax, cf, _cp = wt
    x = r * (1.0 / cellsize)
    t = jnp.clip(2.0 * (x / xmax) - 1.0, -1.0, 1.0)
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for kk in range(cf.shape[0] - 1, 0, -1):
        b1, b2 = cf[kk] + 2 * t * b1 - b2, b1
    fw = cf[0] + t * b1 - b2
    return jnp.where(x < xmax, jnp.clip(fw, 0.0, 1.0), 0.0)


def _cheap_fac(r2, mass, soft, cellsize, wt: PolyWindow):
    """Capped-Newton force factor: m * min(rinv, 1/h)^3 * window.

    Exact for every unsoftened pair (r >= h: min == rinv); softened
    pairs get a finite capped value that the near-field correction
    pass replaces with the true spline — the cap expression is
    deterministic, so the correction's subtraction cancels it
    bit-exactly.  ~25 fewer VPU ops per pair than the full spline
    branch mix."""
    rinv = jnp.where(r2 > 0, jax.lax.rsqrt(r2), 0.0)
    rc = jnp.minimum(rinv, 1.0 / soft)
    r = r2 * rinv
    return mass * rc * rc * rc * _poly_fw(r, cellsize, wt)


@partial(jax.jit, static_argnames=("params", "sub", "pcap", "nsel",
                                   "batch", "want_pot", "engine",
                                   "ncap"))
def _stencil_eval(ipos_s, qtab, tgt_idx, tgt_valid, qst, qcn, sel,
                  params: ShortRangeParams, window_tables, sub: int,
                  pcap: int, nsel: int, batch: int = 1024,
                  want_pot: bool = False, engine: str = "xla",
                  qst_n=None, qcn_n=None, ncap: int = 0):
    """Packed dense evaluation of the selected stencil sub-blocks.

    tgt_idx [nbs, sub] rows into ipos_s; qst/qcn [nbs, CAND] sorted
    candidate meta; sel [nsel] sub-block ids; pcap in QUAD rows.

    With a PolyWindow and want_pot=False the main pass runs the
    capped-Newton kernel (_cheap_fac) and a small near-cell pass
    (qst_n/qcn_n, cap `ncap`) adds the exact spline correction for
    r < softening — softened pairs only live in cells within h of
    the bbox.
    Returns (acc [nsel, sub, 3], pot [nsel, sub]) * G in sel order.
    """
    box = params.boxsize
    to_f = jnp.float32(box / POS_SCALE)
    QCH = 128
    while pcap % QCH:
        QCH //= 2
    # bound the batch's packed-table footprint: bbs*pcap quad rows
    # (64B each) — caustic sub-blocks can push pcap to 10k+ quads,
    # and [batch, 4*pcap] srow/spos/smass at batch=1024 then OOMs HBM
    bbs = min(batch, nsel, max(64, (1 << 22) // max(pcap, 1)))
    while nsel % bbs:
        bbs //= 2
    nbatch = nsel // bbs
    QT = qtab.shape[0] - 1
    # engine="pallas": the fused VMEM pair kernel (ops/pallas_p2p)
    # evaluates the EXACT spline+window force for every packed pair,
    # so the capped-Newton/near-correction split is unnecessary
    use_pallas = (engine == "pallas" and sub % 8 == 0
                  and isinstance(window_tables, PolyWindow))
    split = (not want_pot) and isinstance(window_tables, PolyWindow) \
        and ncap > 0 and not use_pallas

    def seps(tgt, spos):
        d = spos[:, None, :, :] - tgt[:, :, None, :]
        dx = jax.lax.bitcast_convert_type(
            d, jnp.int32).astype(jnp.float32) * to_f
        return dx, jnp.sum(dx * dx, axis=-1)

    def pair_accum(tgt, spos, smass, acc, pot):
        dx, r2 = seps(tgt, spos)
        m = smass[:, None, :]
        if split:
            ff = _cheap_fac(r2, m, params.softening, params.cellsize,
                            window_tables)
            fp = None
        else:
            ff, fp = _pair_fac_any(r2, m, params, window_tables,
                                   want_pot)
        acc = acc + jnp.sum(dx * ff[..., None], axis=2)
        if want_pot:
            pot = pot + jnp.sum(fp, axis=2)
        return acc, pot

    HIGH = jax.lax.Precision.HIGHEST

    def pair_accum_mxu(dt, t2, spos, smass, center, acc):
        """MXU pair pass: r^2 = |t|^2 + |s|^2 - 2 t.s and
        acc += ff@s - t*sum(ff) — the two O(sub*S) contractions ride
        the systolic array; only the force factor stays elementwise.

        Coordinates are BLOCK-CENTER-relative (exact uint32 wrap then
        float), so the cancellation error in r^2 is ~|coord|^2 2^-24
        ~ O(1) internal units; softened (r < h) pairs are immune —
        the capped-Newton kernel is FLAT there (d cheap/d r^2 = 0)
        and the near pass replaces them with the exact spline."""
        ds = (spos - center[:, None, :])
        ds = jax.lax.bitcast_convert_type(
            ds, jnp.int32).astype(jnp.float32) * to_f    # [bbs,S,3]
        s2 = jnp.sum(ds * ds, axis=-1)
        cross = jnp.einsum("btk,bsk->bts", dt, ds, precision=HIGH)
        r2 = jnp.maximum(t2[:, :, None] + s2[:, None, :]
                         - 2.0 * cross, 0.0)
        ff = _cheap_fac(r2, smass[:, None, :], params.softening,
                        params.cellsize, window_tables)
        acc = acc + jnp.einsum("bts,bsk->btk", ff, ds,
                               precision=HIGH)
        acc = acc - dt * jnp.sum(ff, axis=2)[..., None]
        return acc

    def near_accum(tgt, spos, smass, acc):
        dx, r2 = seps(tgt, spos)
        m = smass[:, None, :]
        full, _ = _pair_fac_any(r2, m, params, window_tables, False)
        cheap = _cheap_fac(r2, m, params.softening, params.cellsize,
                           window_tables)
        h2 = params.softening * params.softening
        dd = jnp.where(r2 < h2, full - cheap, 0.0)
        return acc + jnp.sum(dx * dd[..., None], axis=2)

    def pack(q0, qn, cap):
        cum = jnp.cumsum(qn, axis=1)
        excl = cum - qn
        total = cum[:, -1]
        v = jnp.where(qn > 0, q0 - excl, 0)
        dst = jnp.where(qn > 0, jnp.minimum(excl, cap), cap)
        flat = (jnp.arange(bbs, dtype=jnp.int32)[:, None]
                * (cap + 1) + dst)
        buf = jnp.zeros(bbs * (cap + 1), jnp.int32).at[
            flat.reshape(-1)].max(v.reshape(-1),
                                  mode="promise_in_bounds")
        vf = jax.lax.cummax(buf.reshape(bbs, cap + 1)[:, :cap],
                            axis=1)
        p = jnp.arange(cap, dtype=jnp.int32)[None, :]
        valid = p < total[:, None]
        pidx = jnp.where(valid, jnp.minimum(vf + p, QT - 1), QT)
        srow = qtab[pidx].reshape(bbs, cap * 4, 4)
        spos = jax.lax.bitcast_convert_type(srow[:, :, :3],
                                            jnp.uint32)
        smass = jax.lax.bitcast_convert_type(srow[:, :, 3],
                                             jnp.float32)
        return spos, smass

    use_mxu = split and engine == "mxu"

    def eval_batch(sel_b):
        tidx = tgt_idx[sel_b]                    # [bbs, sub]
        tval = tgt_valid[sel_b]
        tgt = ipos_s[tidx]                       # [bbs, sub, 3] u32
        spos, smass = pack(qst[sel_b], qcn[sel_b], pcap)
        if use_pallas:
            from ..ops.pallas_p2p import p2p_blocked
            sch = 512
            while (4 * pcap) % sch:
                sch //= 2
            acc, pp = p2p_blocked(
                tgt, spos, smass, box, params.softening,
                params.cellsize, window_tables, 1.0,
                interpret=jax.default_backend() != "tpu",
                want_pot=want_pot, sch=sch, blk=sub)
            if pp is None:
                pp = jnp.zeros((bbs, sub), jnp.float32)
            acc = jnp.where(tval[..., None], acc, 0.0)
            return acc, jnp.where(tval, pp, 0.0)
        if use_mxu:
            center = tgt[:, 0, :]                # any in-block point
            dt = jax.lax.bitcast_convert_type(
                tgt - center[:, None, :], jnp.int32
            ).astype(jnp.float32) * to_f
            t2 = jnp.sum(dt * dt, axis=-1)

        def chunk(carry, c):
            acc, pot = carry
            sl = jax.lax.dynamic_slice_in_dim(
                spos, c * 4 * QCH, 4 * QCH, axis=1)
            sm = jax.lax.dynamic_slice_in_dim(
                smass, c * 4 * QCH, 4 * QCH, axis=1)
            if use_mxu:
                acc = pair_accum_mxu(dt, t2, sl, sm, center, acc)
            else:
                acc, pot = pair_accum(tgt, sl, sm, acc, pot)
            return (acc, pot), None

        acc0 = jnp.zeros((bbs, sub, 3), jnp.float32)
        pot0 = jnp.zeros((bbs, sub), jnp.float32)
        (acc, pot), _ = jax.lax.scan(chunk, (acc0, pot0),
                                     jnp.arange(pcap // QCH))
        if split:
            npos, nmass = pack(qst_n[sel_b], qcn_n[sel_b], ncap)
            acc = near_accum(tgt, npos, nmass, acc)
        acc = jnp.where(tval[..., None], acc, 0.0)
        pot = jnp.where(tval, pot, 0.0)
        return acc, pot

    acc, pot = jax.lax.map(eval_batch, sel.reshape(nbatch, bbs))
    return (acc.reshape(nsel, sub, 3) * params.G,
            pot.reshape(nsel, sub) * params.G)


@partial(jax.jit, static_argnames=("params", "k", "sub", "W", "CAND",
                                   "T", "compact", "TBC"))
def _stencil_count(ipos, mass, active, params, k: int,
                   sub: int, W: int, CAND: int, T: int,
                   compact: bool, TBC: int):
    """Fused device program: grid build, target compaction, stencil
    classification, tier order + diag for the single host sync.

    T is the padded target count (multiple of sub, clamped to n by
    the caller).  Targets are packed into CELL-ANCHORED sub-blocks:
    a Morton run is split whenever it crosses a level-(k-1) cell
    boundary (or fills `sub` lanes), so every sub-block's bbox fits
    inside one 2x2x2-cell box and the W=7 candidate window covers it
    BY CONSTRUCTION (need <= 2 + 2*ceil(rcut/cell) + 1 <= 7 for
    cell >= rcut/2) — no per-target coverage fallback in steady
    state.  TBC is the static sub-block capacity (grow-only cached by
    the host wrapper; diag reports the true block count)."""
    n = ipos.shape[0]
    order, ipos_s, mass_s, qtab, qmeta, n_alive = build_grid(
        ipos, mass, k)
    alive_s = mass_s > 0
    lanes = jnp.arange(T, dtype=jnp.int32)
    if compact:
        act_s = active[order] & alive_s
        order2 = jnp.argsort(jnp.where(act_s, 0, 1).astype(jnp.int8),
                             stable=True)
        tgt_rows = order2[jnp.minimum(lanes, n - 1)].astype(jnp.int32)
        tvalid = act_s[tgt_rows] & (lanes < n)
    else:
        tgt_rows = jnp.minimum(lanes, n - 1)
        tvalid = alive_s[tgt_rows] & (lanes < n)

    # ---- cell-anchored sub-block assignment ----
    top = (ipos_s >> jnp.uint32(32 - k)).astype(jnp.uint32)
    cid_s = _cell_morton(top, k)
    jcell = jnp.where(tvalid, cid_s[tgt_rows] >> 3, jnp.int32(2 ** 30))
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

    box = params.boxsize
    to_f = jnp.float32(box / POS_SCALE)
    tpos = ipos_s[tgt_idx.reshape(-1)].reshape(nbs, sub, 3)
    tf = tpos.astype(jnp.float32) * to_f
    BIGF = jnp.float32(3.4e38)
    vv = tgt_valid[..., None]
    bb_lo = jnp.min(jnp.where(vv, tf, BIGF), axis=1)
    bb_hi = jnp.max(jnp.where(vv, tf, -BIGF), axis=1)
    live = jnp.any(tgt_valid, axis=1)
    bb_lo = jnp.where(live[:, None], bb_lo, 0.0)
    bb_hi = jnp.where(live[:, None], bb_hi, 0.0)

    qst, qcn, counts, cover, near = _classify(
        bb_lo, bb_hi, live, qmeta, k, box, params.rcut, W, CAND,
        h_near=params.softening)
    qst_n, qcn_n, counts_n = near
    # coverage-overflow subs are evaluated per target elsewhere:
    # zero them here so their tier slots cost nothing
    qcn = jnp.where(cover[:, None], 0, qcn)
    counts = jnp.where(cover, 0, counts)
    qcn_n = jnp.where(cover[:, None], 0, qcn_n)

    order_s = jnp.argsort(counts)
    tier_c = []
    tier_cn = []
    lo = 0
    for b in tier_bounds(nbs):
        tier_c.append(counts[order_s[b - 1]] if b > 0
                      else jnp.int32(0))
        # per-tier NEAR cap: softened pairs live in ~1 cell, so the
        # near counts are far below the main counts — one global cap
        # made every tier pay the sparse worst case
        tier_cn.append(jnp.max(jax.lax.dynamic_slice_in_dim(
            counts_n[order_s], lo, max(b - lo, 1))) if b > lo
            else jnp.int32(0))
        lo = b
    n_cover = jnp.sum(cover.astype(jnp.int32))
    diag = jnp.stack([*tier_c, n_cover, jnp.max(counts_n), tb_total,
                      *tier_cn])
    return (order, ipos_s, qtab, qmeta, tgt_idx, tgt_valid, qst, qcn,
            qst_n, qcn_n, order_s, cover, diag)


@partial(jax.jit, static_argnames=("params", "k", "W", "CAND", "PP"))
def _cover_units(ipos_s, qmeta, tgt_idx, tgt_valid, cover, params,
                 k: int, W: int, CAND: int, PP: int):
    """Expand coverage-overflow sub-blocks into per-target units and
    classify each with its own (always-sufficient) W^3 stencil.

    Returns (u_idx [PP,1], u_valid [PP,1], qst/qcn [PP, CAND],
    counts [PP], n_units, pp_count_max)."""
    nbs, sub = tgt_idx.shape
    box = params.boxsize
    to_f = jnp.float32(box / POS_SCALE)
    umask = (cover[:, None] & tgt_valid).reshape(-1)
    rows = tgt_idx.reshape(-1)
    ord2 = jnp.argsort(jnp.where(umask, 0, 1).astype(jnp.int8),
                       stable=True)[:PP]
    u_idx = rows[ord2][:, None]                    # [PP, 1]
    u_valid = umask[ord2][:, None]
    n_units = jnp.sum(umask.astype(jnp.int32))

    tf = (ipos_s[u_idx[:, 0]].astype(jnp.float32) * to_f)
    lo = jnp.where(u_valid, tf, 0.0)
    qst, qcn, counts, cov2, _near = _classify(
        lo, lo, u_valid[:, 0], qmeta, k, box, params.rcut, 5, 128)
    # a point target always fits the W>=5 window
    return (u_idx, u_valid, qst, qcn, counts, n_units,
            jnp.max(counts))


def stencilgrav(ipos, mass, params: ShortRangeParams,
                window_tables=None, n_targets: int = None,
                sub: int = 32, k: int = None, W: int = 7,
                active=None, tier_cache: dict = None,
                caps_cache: dict = None, want_pot: bool = False,
                engine: str = None, batch: int = 1024,
                pp_cap: int = 1024):
    """Short-range gravity via the grid stencil (module docstring).

    Drop-in sibling of treegrav_refined: same (acc, pot, None) return
    in ORIGINAL particle order, same host-sync + grow-only cap
    caching.  No octree required.
    """
    n = ipos.shape[0]
    if n_targets is None:
        n_targets = n
    if k is None:
        # cell in [rcut/2, rcut): finest power-of-two grid whose
        # stencil halfwidth stays 2 (W=5 candidate window)
        k = int(np.ceil(np.log2(params.boxsize / params.rcut)))
    k = min(k, 10)
    CAND = _next_pow2(W ** 3) if W ** 3 & (W ** 3 - 1) else W ** 3
    compact = active is not None
    if compact:
        T = min(_next_pow2(max(int(n_targets), sub)), n)
        active = jnp.asarray(active)
    else:
        T = n
        active = jnp.zeros(0, bool)
    T = ((T + sub - 1) // sub) * sub       # padded lanes (dup n-1)
    if tier_cache is None:
        tier_cache = {}

    # sub-block capacity: Morton runs split at level-(k-1) cell
    # boundaries — blocks <= ceil(T/sub) + nonempty j-cells.  Rounded
    # to 1k-multiples (not pow2): dead padding blocks ride tier 0's
    # dense eval, so slack is pure waste
    def _round_tbc(x):
        return max((x + 1023) // 1024 * 1024, 1024)

    tbc_key = ("stencil_tbc", k, sub)
    TBC = tier_cache.get(
        tbc_key, _round_tbc(T // sub + max(T // (4 * sub), 64)))
    while True:
        (order, ipos_s, qtab, qmeta, tgt_idx, tgt_valid, qst, qcn,
         qst_n, qcn_n, order_s, cover, diag) = _stencil_count(
             ipos, mass, active, params, k, sub, W, CAND, T, compact,
             TBC)
        (c1, c2, c3, c4, n_cover, cn_max, tb_total, cn1, cn2, cn3,
         cn4) = [int(x) for x in np.asarray(diag)]
        if tb_total <= TBC:
            break
        TBC = _round_tbc(tb_total + 256)   # drift headroom
    tier_cache[tbc_key] = TBC

    nbs = TBC
    key = ("stencil", k, sub, W, nbs)

    pcaps = grow_tier_caps((c1, c2, c3, c4),
                           tier_cache.get(key, (0, 0, 0, 0)), 16, 128)
    tier_cache[key] = pcaps
    ncaps = grow_tier_caps((cn1, cn2, cn3, cn4),
                           tier_cache.get(key + ("n",), (0, 0, 0, 0)),
                           8, 64)
    tier_cache[key + ("n",)] = ncaps

    if engine is None:
        import os
        # PRODUCTION ENGINE DECISION, measured on the v5e chip
        # (validation/RESULT_engine_timing_r3): 128^3 clustered fused
        # megasteps — xla 499k pps, mxu 497k, pallas 402k (1.24x
        # slower).  XLA is the production default: the pair pass is
        # already one fused HBM-resident kernel, and the Pallas
        # variant pays layout/padding overheads it can't earn back.
        # mxu stays selectable (parity, exercises a different unit);
        # pallas is DEMOTED to a test-only reference — requesting it
        # via the env var warns and runs xla instead (pass
        # engine="pallas" explicitly in tests to exercise the
        # kernel).
        engine = os.environ.get("SHENQI_REFINED_ENGINE") or "xla"
        if engine == "pallas":
            print("WARNING: pallas engine is non-production "
                  "(1.24x slower than xla on v5e, "
                  "RESULT_engine_timing_r3); using xla")
            engine = "xla"

    acc_bs = jnp.zeros((nbs, sub, 3), jnp.float32)
    pot_bs = jnp.zeros((nbs, sub), jnp.float32)
    lo = 0
    for b, pcap, ncap in zip(tier_bounds(nbs), pcaps, ncaps):
        nsel = b - lo
        if nsel <= 0:
            lo = b
            continue
        sel = jnp.sort(order_s[lo:b])
        a, pp = _stencil_eval(ipos_s, qtab, tgt_idx, tgt_valid, qst,
                              qcn, sel, params, window_tables, sub,
                              pcap, nsel, batch=batch,
                              want_pot=want_pot, engine=engine,
                              qst_n=qst_n, qcn_n=qcn_n, ncap=ncap)
        acc_bs = acc_bs.at[sel].set(a)
        pot_bs = pot_bs.at[sel].set(pp)
        lo = b

    # ---- per-target fallback for coverage-overflow sub-blocks ----
    if n_cover > 0:
        if caps_cache is not None:
            pp_cap = max(pp_cap, caps_cache.get("pp", 0))
        PP = min(max(_next_pow2(32 * n_cover), pp_cap), T)
        while True:
            (u_idx, u_valid, uqst, uqcn, ucounts, n_units,
             ucmax) = _cover_units(ipos_s, qmeta, tgt_idx, tgt_valid,
                                   cover, params, k, W, CAND, PP)
            if int(n_units) <= PP or PP >= T:
                break
            PP = min(PP * 2, T)
        if caps_cache is not None:
            caps_cache["pp"] = PP
        ucap = max(_round_cap(int(ucmax) + 1),
                   tier_cache.get(key + ("pp",), 0))
        tier_cache[key + ("pp",)] = ucap
        ua, up = _stencil_eval(ipos_s, qtab, u_idx, u_valid, uqst,
                               uqcn, jnp.arange(PP, dtype=jnp.int32),
                               params, window_tables, 1, ucap, PP,
                               batch=min(batch * 8, PP),
                               want_pot=want_pot, engine=engine)
        # scatter per-target results into the sub-block lanes
        flat_u = jnp.where(u_valid[:, 0],
                           jnp.minimum(u_idx[:, 0], n - 1), n)
        acc_u = jnp.zeros((n + 1, 3), jnp.float32).at[flat_u].set(
            ua.reshape(PP, 3))
        pot_u = jnp.zeros(n + 1, jnp.float32).at[flat_u].set(
            up.reshape(PP))
    else:
        acc_u = None

    # scatter back: sub lanes -> sorted rows -> original order
    flat_idx = jnp.where(tgt_valid & ~cover[:, None], tgt_idx, n
                         ).reshape(-1)
    acc_sorted = jnp.zeros((n + 1, 3), jnp.float32).at[flat_idx].set(
        acc_bs.reshape(-1, 3))
    pot_sorted = jnp.zeros(n + 1, jnp.float32).at[flat_idx].set(
        pot_bs.reshape(-1))
    if acc_u is not None:
        acc_sorted = acc_sorted + acc_u
        pot_sorted = pot_sorted + pot_u
    acc = jnp.zeros((n, 3), jnp.float32).at[order].set(acc_sorted[:n])
    pot = jnp.zeros(n, jnp.float32).at[order].set(pot_sorted[:n])
    return acc, pot, None


@partial(jax.jit, static_argnames=("params", "k", "sub", "W", "CAND",
                                   "T", "compact", "TBC", "pcaps",
                                   "ncaps", "want_pot", "engine",
                                   "batch"))
def _stencil_fused(ipos, mass, active, window_tables,
                   params: ShortRangeParams, k: int, sub: int,
                   W: int, CAND: int, T: int, compact: bool,
                   TBC: int, pcaps, ncaps, want_pot: bool,
                   engine: str, batch: int):
    """ONE device program: grid build + classify + all tier evals +
    scatter-back, with STATIC (cached) caps and no host sync.

    The slow path (stencilgrav) syncs a diagnostic vector every call
    to grow its caps — on the remote-tunnel TPU that sync plus the
    ~15 eager dispatches around it dominate the non-force step time.
    Here cap sufficiency is checked ON DEVICE: the returned `ok`
    scalar is True iff every tier count fit its static cap, no
    sub-block overflowed TBC, and no coverage fallback was needed.
    When ok is False the acc/pot values are UNUSABLE (tiers were
    evaluated with truncated candidate lists) and the caller must
    redo the step via stencilgrav, which regrows the caches.  `ok`
    can be fetched asynchronously (e.g. one step behind) so the
    check never stalls the pipeline.

    Also returns the raw diag vector [c1..c4, n_cover, cn_max,
    tb_total, cn1..cn4] so callers that CANNOT host-sync per call
    (the shard_map slab path) can grow their static caps from a
    pmax-reduced diag instead of rerunning the slow path.
    """
    n = ipos.shape[0]
    (order, ipos_s, qtab, qmeta, tgt_idx, tgt_valid, qst, qcn,
     qst_n, qcn_n, order_s, cover, diag) = _stencil_count(
         ipos, mass, active, params, k, sub, W, CAND, T, compact,
         TBC)
    nbs = TBC
    n_cover = diag[4]
    tb_total = diag[6]
    ok = (tb_total <= TBC) & (n_cover == 0)
    for i in range(4):
        # same sufficiency rule as grow_caps: need = count + 1
        ok &= (diag[i] + 1 <= pcaps[i]) & (diag[7 + i] + 1
                                           <= ncaps[i])

    acc_bs = jnp.zeros((nbs, sub, 3), jnp.float32)
    pot_bs = jnp.zeros((nbs, sub), jnp.float32)
    lo = 0
    for b, pcap, ncap in zip(tier_bounds(nbs), pcaps, ncaps):
        nsel = b - lo
        if nsel <= 0:
            lo = b
            continue
        sel = jnp.sort(order_s[lo:b])
        a, pp = _stencil_eval(ipos_s, qtab, tgt_idx, tgt_valid, qst,
                              qcn, sel, params, window_tables, sub,
                              pcap, nsel, batch=batch,
                              want_pot=want_pot, engine=engine,
                              qst_n=qst_n, qcn_n=qcn_n, ncap=ncap)
        acc_bs = acc_bs.at[sel].set(a)
        pot_bs = pot_bs.at[sel].set(pp)
        lo = b

    flat_idx = jnp.where(tgt_valid & ~cover[:, None], tgt_idx, n
                         ).reshape(-1)
    acc_sorted = jnp.zeros((n + 1, 3), jnp.float32).at[flat_idx].set(
        acc_bs.reshape(-1, 3))
    pot_sorted = jnp.zeros(n + 1, jnp.float32).at[flat_idx].set(
        pot_bs.reshape(-1))
    acc = jnp.zeros((n, 3), jnp.float32).at[order].set(acc_sorted[:n])
    pot = jnp.zeros(n, jnp.float32).at[order].set(pot_sorted[:n])
    return acc, pot, ok, diag


def stencil_fused_config(n, params: ShortRangeParams, tier_cache,
                         n_targets=None, sub: int = 32, k: int = None,
                         W: int = 7, compact: bool = False):
    """Resolve the static configuration (k, T, CAND, TBC, pcaps,
    ncaps) for _stencil_fused from a tier_cache seeded by at least
    one stencilgrav call at the same shapes.  Returns None if the
    cache has no entry yet (caller must warm up via stencilgrav)."""
    if n_targets is None:
        n_targets = n
    if k is None:
        k = int(np.ceil(np.log2(params.boxsize / params.rcut)))
    k = min(k, 10)
    CAND = _next_pow2(W ** 3) if W ** 3 & (W ** 3 - 1) else W ** 3
    if compact:
        T = min(_next_pow2(max(int(n_targets), sub)), n)
    else:
        T = n
    T = ((T + sub - 1) // sub) * sub
    TBC = tier_cache.get(("stencil_tbc", k, sub))
    if TBC is None:
        return None
    key = ("stencil", k, sub, W, TBC)
    pcaps = tier_cache.get(key)
    ncaps = tier_cache.get(key + ("n",))
    if pcaps is None or ncaps is None:
        return None
    return dict(k=k, sub=sub, W=W, CAND=CAND, T=T, compact=compact,
                TBC=TBC, pcaps=pcaps, ncaps=ncaps)


def stencilgrav_fused(ipos, mass, params: ShortRangeParams,
                      window_tables=None, n_targets: int = None,
                      sub: int = 32, k: int = None, W: int = 7,
                      active=None, tier_cache: dict = None,
                      caps_cache: dict = None, want_pot: bool = False,
                      engine: str = None, batch: int = 1024):
    """Steady-state stencil gravity: one dispatch, no host sync.

    Returns (acc, pot, ok) where ok is a DEVICE bool scalar — the
    caller may fetch it lazily (pipeline it a step behind).  If
    bool(ok) turns out False the result must be discarded and the
    step redone with stencilgrav (which grows the cap caches so the
    retraced fused program fits again).  On a cold cache this falls
    back to stencilgrav directly and returns ok=True.
    """
    if tier_cache is None:
        tier_cache = {}
    if engine is None:
        import os
        engine = os.environ.get("SHENQI_REFINED_ENGINE") or "xla"
        if engine == "pallas":     # demoted: see stencilgrav
            engine = "xla"
    n = ipos.shape[0]
    compact = active is not None
    cfg = stencil_fused_config(n, params, tier_cache,
                               n_targets=n_targets, sub=sub, k=k,
                               W=W, compact=compact)
    if cfg is None:
        acc, pot, _ = stencilgrav(
            ipos, mass, params, window_tables, n_targets=n_targets,
            sub=sub, k=k, W=W, active=active, tier_cache=tier_cache,
            caps_cache=caps_cache, want_pot=want_pot, engine=engine,
            batch=batch)
        return acc, pot, jnp.bool_(True)
    act = jnp.asarray(active) if compact else jnp.zeros(0, bool)
    acc, pot, ok, _diag = _stencil_fused(
        ipos, mass, act, window_tables, params,
        cfg["k"], cfg["sub"], cfg["W"], cfg["CAND"], cfg["T"],
        cfg["compact"], cfg["TBC"], cfg["pcaps"], cfg["ncaps"],
        want_pot, engine, batch)
    return acc, pot, ok
