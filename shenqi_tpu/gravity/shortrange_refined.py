"""Refined blocked short-range gravity: sub-block drop + packed sources.

Round-3 redesign of the dense evaluation schedule, motivated by
measurement (tools/instr_grav.py + tools/ablate_refined.py, 64^3
clustered, rel-acc MAC):

  * the conservative 128-target block MAC degenerates: nearly every
    node within rcut opens all the way to leaves (n_nodes == 0 in
    steady state), so per-target cost is the ncrit-PADDED union leaf
    list — ~16.6k pair slots vs ~2.5k real sources per block;
  * ~41-55% of a block's union list lies beyond rcut of any given
    32-target sub-block (the 128-target bbox over-reaches);
  * re-testing the rel-acc MAC per sub-block buys almost nothing more
    (<=1% of listed leaves become sub-block monopoles), so the
    re-test reduces to the beyond-rcut DROP test alone.

This module re-tests each block's interaction lists at SUB-target
granularity: entries whose cell lies beyond rcut of the sub-block's
bbox are dropped (the short-range force is zero there — the traversal
applies the same cut at block granularity, gravshort-tree rcut
semantics); surviving leaf particles are packed into ONE contiguous
point-source table per sub-block (positions uint32 fixed point, exact
periodic wrap; no ncrit padding).  Listed leaves inside rcut always
interact as direct P2P — at least as accurate as the per-particle
opening criterion (gravshort2.hpp:173-193) that admitted them.
Block-accepted node monopoles (first step / strict-BH only; empty in
steady state) are evaluated in a separate dense pass.

TPU scheduling notes (hard-won, from ablation):
  * random 4-byte gathers run at ~0.4 GB/s on this chip: the packing
    is ONE scatter-max of leaf boundaries + a cummax fill + ONE
    16-byte-row gather from an interleaved [n,4] source table.  The
    boundary value v = pstart[leaf] - excl[leaf] is nondecreasing
    over kept leaves (leaves are emitted in Morton order, and pstart
    grows by at least the packed count), so cummax reconstructs every
    packed slot's source row as v + slot_index;
  * keep masks are computed ONCE (in the traversal+count program,
    where the classification geometry is gathered per block) and
    shipped to the evaluator as bitmasks;
  * the pair math uses a single rsqrt and otherwise pure FMA —
    sqrt/divide run ~7x slower on the VPU and dominated the naive
    form (spline 1/u^3 terms fold into rinv^3 exactly).

Physics identical to shortrange.py: spline softening + short-range
window on monopoles and particles alike.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tree import Octree
from ..ops.blockwalk import block_traverse, BlockLists
from ..core.particles import POS_SCALE
from .shortrange import ShortRangeParams, PolyWindow, spline_force, \
    short_range_window


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _sub_bbox(tgt_u32, tgt_valid, sub: int, box):
    """Per-sub-block bboxes.  tgt_u32 [B, block, 3] uint32.

    Returns lo, hi [B, nsub, 3] f32 (internal units), live [B, nsub].
    """
    B, block, _ = tgt_u32.shape
    nsub = block // sub
    to_f = jnp.float32(box / POS_SCALE)
    pos = tgt_u32.astype(jnp.float32) * to_f
    pos = pos.reshape(B, nsub, sub, 3)
    val = tgt_valid.reshape(B, nsub, sub)
    BIG = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(val[..., None], pos, BIG), axis=2)
    hi = jnp.max(jnp.where(val[..., None], pos, -BIG), axis=2)
    live = jnp.any(val, axis=2)
    lo = jnp.where(live[..., None], lo, 0.0)
    hi = jnp.where(live[..., None], hi, 0.0)
    return lo, hi, live


def _keep_mask(tree: Octree, ids, n_valid, lo, hi, live, box, rcut2):
    """Which listed cells survive the sub-block beyond-rcut drop.

    ids [B, M], lo/hi [B, ns, 3], live [B, ns] -> keep [B, ns, M].
    Mirrors the traversal's discard test (box-to-box minimum-image
    distance vs rcut) with the tighter sub-block bbox.
    """
    safe = jnp.maximum(ids, 0)
    cen = tree.center[safe]                 # [B, M, 3]
    length = tree.length[safe]              # [B, M]
    nmass = jnp.where(ids >= 0, tree.mass[safe], 0.0)
    lane = (jnp.arange(ids.shape[1])[None, :]
            < n_valid[:, None]) & (nmass > 0)

    c = 0.5 * (lo + hi)[:, :, None, :]      # [B, ns, 1, 3]
    h = 0.5 * (hi - lo)[:, :, None, :]
    d = cen[:, None, :, :] - c
    d = d - box * jnp.round(d / box)
    dbox = jnp.maximum(jnp.abs(d) - h, 0.0)
    dcell = jnp.maximum(dbox - 0.5 * length[:, None, :, None], 0.0)
    drop = jnp.sum(dcell * dcell, axis=-1) > rcut2
    return lane[:, None, :] & live[:, :, None] & (~drop)


def _leaf_pcount(tree: Octree, leaf_ids, ncrit: int):
    safe = jnp.maximum(leaf_ids, 0)
    return jnp.minimum(jnp.where(leaf_ids >= 0, tree.pcount[safe], 0),
                       ncrit)


@partial(jax.jit, static_argnames=("ncrit",))
def build_quad_table(tree: Octree, ncrit: int):
    """Quad-aligned interleaved source table, built once per force.

    The packed gather's cost is per ROW, nearly independent of row
    width (measured ~10 ns/row on v5e) — so pack FOUR particles per
    64-byte row: [n+1, 16] int32 = 4 x (x y z mass-bits).  Each leaf's
    particles start quad-aligned (<=3 zero-mass pad slots per leaf,
    ~7% extra pair lanes at ncrit=32) so a leaf occupies qc =
    ceil(pcount/4) whole rows and the evaluator's cummax packing works
    in quad units: 4x fewer gather rows than the particle-packed form.

    Returns (qtab [n+1, 16] i32, qstart [M] i32, qc [M] i32) with
    qstart monotone over leaves in pstart (Morton) order — the
    invariant the boundary-scatter + cummax fill needs.
    """
    n = tree.ipos_s.shape[0]
    M = tree.center.shape[0]
    pcount = jnp.minimum(tree.pcount, ncrit)
    # CANONICAL leaves only: is_leaf nodes with non-leaf parents are
    # the only ones a walk can list, and they PARTITION the particle
    # range — nested deeper is_leaf copies would steal scatter slots
    leaf = tree.canon & (pcount > 0)
    qc = jnp.where(leaf, (pcount + 3) >> 2, 0)

    # leaves in pstart order: argsort (non-leaves to the end)
    key = jnp.where(leaf, tree.pstart, jnp.int32(2 ** 30))
    rank_order = jnp.argsort(key)                  # [M] node ids
    qc_sorted = qc[rank_order]
    qstart_sorted = jnp.cumsum(qc_sorted) - qc_sorted
    qstart = jnp.zeros(M, jnp.int32).at[rank_order].set(
        qstart_sorted.astype(jnp.int32))

    # per-particle leaf rank: scatter rank at each leaf's pstart,
    # cummax fills the run (pstart runs are disjoint and ascending)
    ranks = jnp.arange(M, dtype=jnp.int32)
    pdst = jnp.where(leaf[rank_order],
                     jnp.minimum(tree.pstart[rank_order], n), n)
    lr = jnp.zeros(n + 1, jnp.int32).at[pdst].max(
        ranks, mode="promise_in_bounds")
    lr = jax.lax.cummax(lr[:n])                    # [n] leaf rank
    p = jnp.arange(n, dtype=jnp.int32)
    node_of = rank_order[lr]
    off = p - tree.pstart[node_of]
    slot = 4 * qstart[node_of] + off
    ok = (off >= 0) & (off < 4 * qc[node_of])
    slot = jnp.where(ok, jnp.minimum(slot, 4 * n), 4 * (n + 1))

    rows = jnp.concatenate(
        [jax.lax.bitcast_convert_type(tree.ipos_s, jnp.int32),
         jax.lax.bitcast_convert_type(tree.mass_s, jnp.int32)[:, None]],
        axis=1)                                    # [n, 4]
    flat = jnp.zeros(((n + 2) * 4, 4), jnp.int32).at[slot].set(
        rows, mode="promise_in_bounds")
    qtab = flat[: (n + 1) * 4].reshape(n + 1, 16)
    qtab = qtab.at[n].set(0)
    return qtab, qstart, qc


def _pair_fac(r2, mass, h, cellsize, window_tables,
              want_pot: bool):
    """(force factor, potential factor) with ONE rsqrt and no divide.

    force = dx * fac.  Identical math to shortrange.spline_force +
    short_range_window: the spline's 1/u^3 and 1/u terms are rewritten
    exactly in rinv (h^-3 u^-3 == rinv^3, (h u)^-1 == rinv).
    """
    rinv = jnp.where(r2 > 0, jax.lax.rsqrt(r2), 0.0)
    r = r2 * rinv
    rinv3 = rinv * rinv * rinv
    fac_n = mass * rinv3

    hinv = 1.0 / h
    h3i = hinv * hinv * hinv
    u = r * hinv
    fac_in = mass * h3i * (10.666666666667 + u * u * (32.0 * u - 38.4))
    fac_out = (mass * h3i * (21.333333333333 - 48.0 * u
                             + 38.4 * u * u
                             - 10.666666666667 * u ** 3)
               - 0.066666666667 * mass * rinv3)
    soft = r2 < h * h
    fac = jnp.where(soft, jnp.where(u < 0.5, fac_in, fac_out), fac_n)

    if isinstance(window_tables, PolyWindow):
        xmax, cf, cp = window_tables
        x = r * (1.0 / cellsize)
        t = jnp.clip(2.0 * (x / xmax) - 1.0, -1.0, 1.0)

        def clenshaw(c):
            b1 = jnp.zeros_like(t)
            b2 = jnp.zeros_like(t)
            for k in range(c.shape[0] - 1, 0, -1):
                b1, b2 = c[k] + 2 * t * b1 - b2, b1
            return c[0] + t * b1 - b2

        inrange = x < xmax
        fw = jnp.where(inrange, jnp.clip(clenshaw(cf), 0.0, 1.0), 0.0)
        pw = jnp.where(inrange, jnp.clip(clenshaw(cp), 0.0, 1.0), 0.0) \
            if want_pot else None
    else:
        fw, pw = short_range_window(r, cellsize, 1.5, window_tables) \
            if window_tables is not None else (None, None)
        if fw is None:
            raise ValueError("erfc fallback needs asmth via "
                             "short_range_window; pass tables")

    if not want_pot:
        return fac * fw, None
    pot_n = -mass * rinv
    wp_in = -2.8 + u * u * (5.333333333333 + u * u * (6.4 * u - 9.6))
    wp_out = (-3.2 + u * u * (10.666666666667
                              + u * (-16.0 + u * (9.6
                                     - 2.133333333333 * u))))
    pot_soft = mass * hinv * jnp.where(u < 0.5, wp_in, wp_out) \
        + jnp.where(u < 0.5, 0.0, 0.066666666667 * mass * rinv)
    facpot = jnp.where(soft, pot_soft, pot_n)
    return fac * fw, facpot * pw


def _pair_fac_any(r2, mass, params, window_tables, want_pot):
    """Dispatch: fast FMA form for PolyWindow, reference form else."""
    if isinstance(window_tables, PolyWindow):
        return _pair_fac(r2, mass, params.softening, params.cellsize,
                         window_tables, want_pot)
    fac, facpot = spline_force(r2, mass, params.softening)
    fw, pw = short_range_window(jnp.sqrt(r2), params.cellsize,
                                params.asmth, window_tables)
    return fac * fw, (facpot * pw if want_pot else None)


def packed_counts(tree, lists: BlockLists, tgt_u32, tgt_valid,
                  params, sub: int, ncrit: int, qstart, qc,
                  batch: int = 512):
    """Per-sub-block packed-source QUAD counts, keep bitmasks, and
    per-block leaf metadata.

    Gathers ONE interleaved 32-byte row per (block, listed leaf) —
    center/length/mass/qstart/qc — instead of five separate lookups
    (elementwise gathers cost ~10 ns per ROW almost independent of
    width; separate gathers at 128^3 were ~3 s of the count pass and
    another ~2.7 s re-gathered across eval tiers).

    Returns (counts [nb*nsub] i32 — quad rows —, keepbits
    [nb*nsub, ML//32] u32, leaf_meta [nb, ML, 2] i32 = (qstart, qc)
    per listed leaf, threaded to _refined_eval so tiers never touch
    the per-node tables again).  Must agree exactly with the packing
    in _refined_eval (the host sizes the static caps from these
    counts).  Batched over blocks to bound the [batch, nsub, ML]
    classification temporaries.
    """
    nb, block, _ = tgt_u32.shape
    nsub = block // sub
    box = params.boxsize
    rcut2 = params.rcut * params.rcut
    ML = lists.leaf_ids.shape[1]
    assert ML % 32 == 0
    bb = min(batch, nb)
    while nb % bb:
        bb //= 2

    icast = partial(jax.lax.bitcast_convert_type, new_dtype=jnp.int32)
    fcast = partial(jax.lax.bitcast_convert_type,
                    new_dtype=jnp.float32)
    # interleaved per-node classification row (32B):
    # center(3) length mass qstart qc pad
    M = tree.center.shape[0]
    ntab = jnp.concatenate(
        [icast(tree.center), icast(tree.length)[:, None],
         icast(tree.mass)[:, None], qstart[:, None], qc[:, None],
         jnp.zeros((M, 1), jnp.int32)], axis=1)

    shifts = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)

    def one(args):
        leaf_ids, n_leaves, tgt, val = args
        lo, hi, live = _sub_bbox(tgt, val, sub, box)
        row = ntab[jnp.maximum(leaf_ids, 0)]        # [bb, ML, 8]
        cen = fcast(row[:, :, 0:3])
        length = fcast(row[:, :, 3])
        nmass = jnp.where(leaf_ids >= 0, fcast(row[:, :, 4]), 0.0)
        lane = (jnp.arange(ML)[None, :]
                < n_leaves[:, None]) & (nmass > 0)
        c = 0.5 * (lo + hi)[:, :, None, :]          # [bb, ns, 1, 3]
        h = 0.5 * (hi - lo)[:, :, None, :]
        d = cen[:, None, :, :] - c
        d = d - box * jnp.round(d / box)
        dbox = jnp.maximum(jnp.abs(d) - h, 0.0)
        dcell = jnp.maximum(
            dbox - 0.5 * length[:, None, :, None], 0.0)
        drop = jnp.sum(dcell * dcell, axis=-1) > rcut2
        lk = lane[:, None, :] & live[:, :, None] & (~drop)

        pc = jnp.where(leaf_ids >= 0, row[:, :, 6], 0)   # [bb, ML]
        counts = jnp.sum(
            jnp.where(lk, pc[:, None, :], 0), axis=2).astype(jnp.int32)
        bits = jnp.sum(
            jnp.where(lk.reshape(bb, nsub, ML // 32, 32),
                      shifts[None, None, None, :], jnp.uint32(0)),
            axis=3, dtype=jnp.uint32)
        meta = jnp.stack([row[:, :, 5], pc], axis=-1)    # [bb, ML, 2]
        return counts, bits, meta

    nbatch = nb // bb
    args = (lists.leaf_ids.reshape(nbatch, bb, -1),
            lists.n_leaves.reshape(nbatch, bb),
            tgt_u32.reshape(nbatch, bb, block, 3),
            tgt_valid.reshape(nbatch, bb, block))
    counts, bits, meta = jax.lax.map(one, args)
    return (counts.reshape(nb * nsub),
            bits.reshape(nb * nsub, ML // 32),
            meta.reshape(nb, ML, 2))


@partial(jax.jit, static_argnames=("params", "ncrit", "sub", "pcap",
                                   "nsel", "block", "batch",
                                   "has_nodes", "want_pot", "engine"))
def _refined_eval(tree: Octree, lists: BlockLists, tgt_idx, tgt_valid,
                  keepbits, sel, qtab, leaf_meta,
                  params: ShortRangeParams,
                  window_tables, ncrit: int, sub: int, pcap: int,
                  nsel: int, block: int, batch: int = 1024,
                  has_nodes: bool = False, want_pot: bool = False,
                  engine: str = "xla"):
    """Evaluate the selected sub-blocks with packed source tables.

    sel [nsel] int32: flat sub-block ids (b * nsub + s).
    qtab: quad-packed source table (build_quad_table); leaf_meta
    [nb, ML, 2] = per listed leaf (qstart, qc), pre-gathered by
    packed_counts (re-gathering per node per tier was ~2.7 s at
    128^3); pcap counts QUAD rows (4 particles each).
    Returns (acc [nsel, sub, 3], pot [nsel, sub]) G-multiplied, in
    sub-block lane order.
    """
    box = params.boxsize
    nsub = block // sub
    to_f = jnp.float32(box / POS_SCALE)
    QCH = 128                       # quad rows per dense chunk
    while pcap % QCH:
        QCH //= 2

    bbs = min(batch, nsel)
    while nsel % bbs:
        bbs //= 2
    nbatch = nsel // bbs
    n = tree.ipos_s.shape[0]
    ML = lists.leaf_ids.shape[1]

    if has_nodes:
        cofm_u = jnp.clip(tree.cofm * jnp.float32(POS_SCALE / box),
                          0.0, float(POS_SCALE) - 1.0
                          ).astype(jnp.uint32)

    def pair_accum(tgt, spos, smass, acc, pot):
        d = spos[:, None, :, :] - tgt[:, :, None, :]
        dx = jax.lax.bitcast_convert_type(
            d, jnp.int32).astype(jnp.float32) * to_f
        r2 = jnp.sum(dx * dx, axis=-1)
        ff, fp = _pair_fac_any(r2, smass[:, None, :], params,
                               window_tables, want_pot)
        acc = acc + jnp.sum(dx * ff[..., None], axis=2)
        if want_pot:
            pot = pot + jnp.sum(fp, axis=2)
        return acc, pot

    def eval_batch(args):
        sel_b, kb = args                        # [bbs], [bbs, ML//32]
        b = sel_b // nsub
        s = sel_b % nsub
        rows = (b[:, None] * block + s[:, None] * sub
                + jnp.arange(sub, dtype=jnp.int32)[None, :])
        tidx = tgt_idx.reshape(-1)[rows]        # [bbs, sub]
        tgt = tree.ipos_s[tidx]                 # [bbs, sub, 3] u32

        # unpack keep bits -> [bbs, ML]
        lk = (kb[:, :, None]
              >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]
              & jnp.uint32(1)).astype(bool).reshape(bbs, ML)

        meta = leaf_meta[b]                     # [bbs, ML, 2]
        pc = meta[:, :, 1]
        cnt = jnp.where(lk, pc, 0)
        cum = jnp.cumsum(cnt, axis=1)
        excl = cum - cnt
        total = cum[:, -1]

        # scatter kept-leaf boundaries, cummax-fill the source map:
        # QUAD slot p of the packed table reads row v(p) + p where v
        # is the boundary value qstart - excl of the owning leaf
        # (both nondecreasing over kept leaves in Morton order)
        qst = meta[:, :, 0]
        v = jnp.where(lk, qst - excl, 0)
        dst = jnp.where(lk, jnp.minimum(excl, pcap), pcap)
        flat = (jnp.arange(bbs, dtype=jnp.int32)[:, None]
                * (pcap + 1) + dst)
        buf = jnp.zeros(bbs * (pcap + 1), jnp.int32).at[
            flat.reshape(-1)].max(v.reshape(-1),
                                  mode="promise_in_bounds")
        vf = jax.lax.cummax(buf.reshape(bbs, pcap + 1)[:, :pcap],
                            axis=1)
        p = jnp.arange(pcap, dtype=jnp.int32)[None, :]
        valid = p < total[:, None]
        pidx = jnp.where(valid, jnp.minimum(vf + p, n - 1), n)

        srow = qtab[pidx]               # [bbs, pcap, 16] i32
        srow = srow.reshape(bbs, pcap * 4, 4)
        spos = jax.lax.bitcast_convert_type(srow[:, :, :3],
                                            jnp.uint32)
        smass = jax.lax.bitcast_convert_type(srow[:, :, 3],
                                             jnp.float32)

        if engine == "pallas":
            # fused VMEM-resident pair kernel (G folded in at return)
            from ..ops.pallas_p2p import p2p_blocked
            import jax as _jax
            acc, pot = p2p_blocked(
                tgt, spos, smass, box, params.softening,
                params.cellsize, window_tables, 1.0,
                interpret=_jax.default_backend() != "tpu",
                want_pot=want_pot, sch=min(512, 4 * pcap), blk=sub)
            if pot is None:
                pot = jnp.zeros((bbs, sub), jnp.float32)
        else:
            # ---- dense pair pass [sub x 4*pcap], chunked ----
            def chunk(carry, c):
                acc, pot = carry
                sl = jax.lax.dynamic_slice_in_dim(
                    spos, c * 4 * QCH, 4 * QCH, axis=1)
                sm = jax.lax.dynamic_slice_in_dim(
                    smass, c * 4 * QCH, 4 * QCH, axis=1)
                acc, pot = pair_accum(tgt, sl, sm, acc, pot)
                return (acc, pot), None

            acc0 = jnp.zeros((bbs, sub, 3), jnp.float32)
            pot0 = jnp.zeros((bbs, sub), jnp.float32)
            (acc, pot), _ = jax.lax.scan(chunk, (acc0, pot0),
                                         jnp.arange(pcap // QCH))

        if has_nodes:
            # block-accepted monopoles (first step / strict BH):
            # dense over the block's node list, no sub-drop — correct
            # and rare, so simplicity over packing
            node_ids = lists.node_ids[b]
            MI = node_ids.shape[1]
            nmask = (jnp.arange(MI)[None, :]
                     < lists.n_nodes[b][:, None])
            safe = jnp.maximum(node_ids, 0)
            npos = cofm_u[safe]
            nmass = jnp.where(nmask & (node_ids >= 0),
                              tree.mass[safe], 0.0)
            NCH = min(512, MI)
            while MI % NCH:
                NCH //= 2

            def nchunk(carry, c):
                acc, pot = carry
                sl = jax.lax.dynamic_slice_in_dim(npos, c * NCH, NCH,
                                                  axis=1)
                sm = jax.lax.dynamic_slice_in_dim(nmass, c * NCH, NCH,
                                                  axis=1)
                acc, pot = pair_accum(tgt, sl, sm, acc, pot)
                return (acc, pot), None

            (acc, pot), _ = jax.lax.scan(nchunk, (acc, pot),
                                         jnp.arange(MI // NCH))
        return acc, pot

    acc, pot = jax.lax.map(eval_batch,
                           (sel.reshape(nbatch, bbs),
                            keepbits[sel].reshape(nbatch, bbs, -1)))
    return (acc.reshape(nsel, sub, 3) * params.G,
            pot.reshape(nsel, sub) * params.G)


def tier_bounds(nbs: int):
    """Static cumulative tier boundaries over the count-sorted
    sub-blocks: [50%, 75%, 87.5%, 100%].  Tiny tails collapse into
    the top tier (sizes may be zero for small nbs)."""
    return (nbs // 2, (3 * nbs) // 4, (7 * nbs) // 8, nbs)


def _infer_nlevels(M: int, n: int) -> int:
    """Recover the build nlevels from the node-array length (the node
    layout is level-major with per-level caps min(8^l, n+1))."""
    from ..ops.tree import _level_caps
    for nl in range(1, 40):
        if sum(_level_caps(n, nl, 1)) == M:
            return nl
    raise ValueError(f"node count {M} matches no nlevels for n={n}")


@partial(jax.jit, static_argnames=("T", "block", "level", "nb",
                                   "maxi", "maxl", "compact", "sub",
                                   "ncrit", "params", "traversal",
                                   "fcap", "nlevels"))
def _blocks_traverse_count(tree, oldacc, active, params, T, block,
                           level, nb, maxi, maxl, compact, sub,
                           ncrit, traversal="walk", fcap=2048,
                           nlevels=0):
    """One fused device program: target compaction, block assembly,
    traversal, sub-block keep masks + packed counts, tier order, and
    the diagnostic scalars for the single host sync."""
    from ..ops.blockwalk import make_blocks_device

    n = tree.ipos_s.shape[0]
    alive_s = tree.mass_s > 0
    oldacc_s = oldacc[tree.order]
    if compact:
        act_s = active[tree.order] & alive_s
        order2 = jnp.argsort(jnp.where(act_s, 0, 1).astype(jnp.int8),
                             stable=True)
        tgt_rows = order2[:T].astype(jnp.int32)
        tvalid = act_s[tgt_rows]
    else:
        tgt_rows = jnp.arange(n, dtype=jnp.int32)
        tvalid = alive_s

    bb_lo, bb_hi, tgt_idx, tgt_valid, b_ovf = make_blocks_device(
        tree, tgt_rows, tvalid, block, level, nb, params.boxsize)

    BIG = jnp.float32(1e30)
    aold_rows = jnp.where(
        tgt_valid, params.err_tol_force_acc * oldacc_s[tgt_idx], BIG)
    block_aold = jnp.min(aold_rows, axis=1)

    if traversal == "bfs":
        from ..ops.blockwalk import block_traverse_bfs
        lists, f_ovf = block_traverse_bfs(
            tree, bb_lo, bb_hi, jnp.zeros(nb, jnp.float32),
            block_aold, params.boxsize, params.rcut,
            params.bh_opening_angle ** 2, params.use_bh, maxi=maxi,
            maxl=maxl, mode="gravity", fcap=fcap, nlevels=nlevels)
    else:
        lists = block_traverse(
            tree, bb_lo, bb_hi, jnp.zeros(nb, jnp.float32),
            block_aold, params.boxsize, params.rcut,
            params.bh_opening_angle ** 2, params.use_bh, maxi=maxi,
            maxl=maxl, mode="gravity")
        f_ovf = jnp.zeros((), bool)

    qtab, qstart, qc = build_quad_table(tree, ncrit)
    tgt_u32 = tree.ipos_s[tgt_idx.reshape(-1)].reshape(nb, block, 3)
    counts, keepbits, leaf_meta = packed_counts(
        tree, lists, tgt_u32, tgt_valid, params, sub, ncrit,
        qstart, qc)
    nbs = counts.shape[0]
    order_s = jnp.argsort(counts)
    # per-tier max quad counts at the static tier boundaries (the
    # host sizes one packed cap per tier; 4 tiers hug the count
    # distribution much tighter than 2 — cap padding is paid in BOTH
    # the packed gather and the dense pass)
    tier_c = [counts[order_s[b - 1]] if b > 0 else jnp.int32(0)
              for b in tier_bounds(nbs)]
    diag = jnp.stack([
        b_ovf.astype(jnp.int32),
        jnp.any(lists.overflow).astype(jnp.int32),
        jnp.max(lists.n_nodes), jnp.max(lists.n_leaves),
        *tier_c, f_ovf.astype(jnp.int32)])
    return (tgt_idx, tgt_valid, lists, keepbits, leaf_meta, order_s,
            diag, qtab)


def _round_cap(x: int, align: int = 128) -> int:
    """Static QUAD-row cap: next multiple of the dense-pass chunk
    (pow2 caps overshoot up to 2x; the chunk multiple wastes < align
    rows).  128 quad rows = 512 particle lanes."""
    if x <= 32:
        return 32
    if x <= 64:
        return 64
    return ((x + align - 1) // align) * align


def _tiered_evals(tree, lists, tgt_idx, tgt_valid, keepbits, order_s,
                  qtab, leaf_meta, params, window_tables, ncrit,
                  sub, block, nbs, pcaps, has_nodes, want_pot,
                  engine):
    """Shared tier dispatch: one packed eval per non-empty tier with
    its own static cap; results scattered to sub-block lane order."""
    bounds = tier_bounds(nbs)
    acc_bs = jnp.zeros((nbs, sub, 3), jnp.float32)
    pot_bs = jnp.zeros((nbs, sub), jnp.float32)
    lo = 0
    for b, pcap in zip(bounds, pcaps):
        nsel = b - lo
        if nsel <= 0:
            lo = b
            continue
        sel = jnp.sort(order_s[lo:b])
        a, pp = _refined_eval(tree, lists, tgt_idx, tgt_valid,
                              keepbits, sel, qtab, leaf_meta, params,
                              window_tables, ncrit, sub, pcap, nsel,
                              block, has_nodes=has_nodes,
                              want_pot=want_pot, engine=engine)
        acc_bs = acc_bs.at[sel].set(a)
        pot_bs = pot_bs.at[sel].set(pp)
        lo = b
    return acc_bs, pot_bs


def treegrav_refined_fixed(tree: Octree, oldacc, params,
                           window_tables, T: int, block: int,
                           level: int, nb: int, maxi: int, maxl: int,
                           sub: int, ncrit: int, pcaps: tuple,
                           nlevels: int = 0,
                           fcap: int = 2048, traversal: str = "walk",
                           engine: str = "xla", active=None,
                           want_pot: bool = False):
    """Fully-traced refined schedule with STATIC caps — no host sync,
    so it composes with shard_map/pjit (the slab gravity path).

    The caller owns cap sizing: run once, inspect the returned diag
    (max over devices), grow {maxi,maxl,fcap,pcaps} and recompile on
    overflow — the `treegrav_refined` host wrapper automates this for
    the single-device path.  pcaps: one QUAD-row cap per tier
    (len(tier_bounds(...)) = 4), nondecreasing.

    diag layout: [block_ovf, list_ovf, max_nn, max_nl, c_t1..c_t4,
    frontier_ovf, pcap_ovf_t1..t4].
    Returns (acc [N,3], pot [N], diag [13] i32) in original order.
    """
    n = tree.ipos_s.shape[0]
    nsub = block // sub
    compact = active is not None
    if not compact:
        active = jnp.zeros(0, bool)
    (tgt_idx, tgt_valid, lists, keepbits, leaf_meta, order_s, diag,
     qtab) = \
        _blocks_traverse_count(tree, oldacc, active, params, T, block,
                               level, nb, maxi, maxl, compact, sub,
                               ncrit, traversal=traversal, fcap=fcap,
                               nlevels=nlevels)
    nbs = nb * nsub
    # packed-cap overflow: counts that exceed the static tables (the
    # evaluator truncates sources past pcap — detect, never silently)
    diag = jnp.concatenate([
        diag, jnp.stack([(diag[4 + i] > pcaps[i]).astype(jnp.int32)
                         for i in range(4)])])
    # has_nodes must be static here and accepted monopoles cannot be
    # ruled out at trace time: always run the node pass (masked rows
    # carry zero mass; ~2 extra chunks per batch, never wrong)
    acc_bs, pot_bs = _tiered_evals(
        tree, lists, tgt_idx, tgt_valid, keepbits, order_s, qtab,
        leaf_meta, params, window_tables, ncrit, sub, block, nbs,
        pcaps, True, want_pot, engine)

    flat_idx = jnp.where(tgt_valid, tgt_idx, n).reshape(-1)
    acc_sorted = jnp.zeros((n + 1, 3), jnp.float32).at[flat_idx].set(
        acc_bs.reshape(-1, 3))[:n]
    pot_sorted = jnp.zeros(n + 1, jnp.float32).at[flat_idx].set(
        pot_bs.reshape(-1))[:n]
    acc = jnp.zeros((n, 3), jnp.float32).at[tree.order].set(acc_sorted)
    pot = jnp.zeros(n, jnp.float32).at[tree.order].set(pot_sorted)
    return acc, pot, diag


def treegrav_refined(tree: Octree, oldacc, params: ShortRangeParams,
                     window_tables=None, n_targets: int = None,
                     block: int = 128, maxi: int = 1024,
                     maxl: int = 512, ncrit: int = 32, sub: int = 32,
                     auto_grow: int = 3, active=None,
                     tier_cache: dict = None, caps_cache: dict = None,
                     want_pot: bool = False, engine: str = None,
                     traversal: str = None, fcap: int = 2048):
    """Short-range force via the refined packed schedule.

    Drop-in sibling of shortrange_blocked.treegrav_blocked
    (blocking='device'): same traversal, same block assembly, ONE host
    sync per evaluation — but evaluation re-tests the lists per
    `sub`-target sub-block and runs packed dense passes (see module
    docstring).  Returns (accel [N,3], pot [N], lists) in ORIGINAL
    particle order.
    """
    from ..ops.blockwalk import auto_block_level

    n = tree.ipos_s.shape[0]
    if n_targets is None:
        n_targets = n
    assert block % sub == 0
    nsub = block // sub
    compact = active is not None
    if compact:
        T = min(_next_pow2(max(int(n_targets), block)), n)
        active = jnp.asarray(active)
    else:
        T = n
        active = jnp.zeros(0, bool)
    level = auto_block_level(T, block)
    nb = _next_pow2((T + block - 1) // block + max(T // (2 * block), 1))
    if caps_cache is not None:
        maxi = max(maxi, caps_cache.get("maxi", 0))
        maxl = max(maxl, caps_cache.get("maxl", 0))
    if tier_cache is None:
        tier_cache = {}
    if traversal is None:
        import os
        traversal = os.environ.get("SHENQI_TRAVERSAL", "walk")
    nlv = _infer_nlevels(tree.center.shape[0], n) \
        if traversal == "bfs" else 0
    if caps_cache is not None:
        fcap = max(fcap, caps_cache.get("fcap", 0))

    for attempt in range(2 * (auto_grow + 1)):
        (tgt_idx, tgt_valid, lists, keepbits, leaf_meta, order_s,
         diag, qtab) = \
            _blocks_traverse_count(tree, oldacc, active, params, T,
                                   block, level, nb, maxi, maxl,
                                   compact, sub, ncrit,
                                   traversal=traversal, fcap=fcap,
                                   nlevels=nlv)
        (b_ovf, w_ovf, max_nn, max_nl, c1, c2, c3, c4, f_ovf) = \
            [int(x) for x in np.asarray(diag)]      # THE host sync
        if not b_ovf and not w_ovf and not f_ovf:
            break
        if attempt == 2 * auto_grow + 1:
            raise RuntimeError(
                f"refined block walk overflow: blocks={b_ovf} "
                f"nodes {max_nn}/{maxi} leaves {max_nl}/{maxl} "
                f"frontier={f_ovf}/{fcap}")
        if b_ovf:
            nb *= 2
        if f_ovf:
            fcap *= 2
        if max_nn >= maxi:
            maxi *= 2
        if max_nl >= maxl:
            maxl *= 2
        if caps_cache is not None:
            caps_cache["maxi"] = maxi
            caps_cache["maxl"] = maxl
            caps_cache["fcap"] = fcap

    # static packed QUAD caps from the exact device counts (grow-only
    # cache -> bounded recompiles); caps nondecreasing across tiers
    nbs = nb * nsub
    key = ("refined", nb, maxi, maxl, sub)
    cached = tier_cache.get(key, (0, 0, 0, 0))
    pcaps = []
    hi = 0
    for c, cc in zip((c1, c2, c3, c4), cached):
        hi = max(hi, _round_cap(c + 1), cc)
        pcaps.append(hi)
    pcaps = tuple(pcaps)
    tier_cache[key] = pcaps
    has_nodes = max_nn > 0

    if engine is None:
        import os
        engine = os.environ.get("SHENQI_REFINED_ENGINE")
    if engine is None:
        # fused Pallas kernel on TPU when the Chebyshev window is
        # available; XLA chunked pass otherwise (interpret mode is
        # for tests only — far too slow to be a CPU default)
        engine = "pallas" if (jax.default_backend() == "tpu"
                              and isinstance(window_tables,
                                             PolyWindow)) else "xla"

    acc_bs, pot_bs = _tiered_evals(
        tree, lists, tgt_idx, tgt_valid, keepbits, order_s, qtab,
        leaf_meta, params, window_tables, ncrit, sub, block, nbs,
        pcaps, has_nodes, want_pot, engine)

    # scatter back: sub-block lanes -> sorted rows -> original order
    flat_idx = jnp.where(tgt_valid, tgt_idx, n).reshape(-1)
    acc_sorted = jnp.zeros((n + 1, 3), jnp.float32).at[flat_idx].set(
        acc_bs.reshape(-1, 3))[:n]
    pot_sorted = jnp.zeros(n + 1, jnp.float32).at[flat_idx].set(
        pot_bs.reshape(-1))[:n]
    acc = jnp.zeros((n, 3), jnp.float32).at[tree.order].set(acc_sorted)
    pot = jnp.zeros(n, jnp.float32).at[tree.order].set(pot_sorted)
    return acc, pot, lists
