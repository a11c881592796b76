"""Refined blocked short-range gravity: sub-block MAC + packed sources.

Round-3 redesign of the dense evaluation schedule, motivated by
measurement (tools/instr_grav.py, 64^3 clustered, rel-acc MAC):

  * the conservative 128-target block MAC degenerates: nearly every
    node within rcut opens all the way to leaves (n_nodes == 0), so
    per-target cost is the ncrit-PADDED union leaf list — ~16.6k pair
    slots vs ~2.5k real sources per block;
  * ~41-55% of a block's union list lies beyond rcut of any given
    32-target sub-block (the 128-target bbox over-reaches).

This module re-tests each block's interaction lists at SUB-target
granularity with the SAME opening criterion (strictly tighter bbox =>
conservative), classifying every listed entry as
    drop  (beyond rcut of the sub-block: zero short-range force),
    mono  (sub-block accepts the cell as a monopole), or
    p2p   (leaf particles interact directly),
then packs the survivors — kept node monopoles (+) leaf monopoles (+)
leaf particles — into ONE contiguous point-source table per sub-block
(positions uint32 fixed point, exact periodic wrap-around; no ncrit
padding).  The evaluation is a single dense masked pair pass
[SUB x P] per sub-block: ~9-11x less pair work at accuracy >= the
per-particle criterion (gravshort2.hpp:173-193 analog).

Physics identical to shortrange.py: spline softening + short-range
window on monopoles and particles alike.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tree import Octree
from ..ops.blockwalk import block_traverse, BlockLists, _bbox_dist
from ..core.particles import POS_SCALE
from .shortrange import (ShortRangeParams, spline_force,
                         short_range_window)


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _sub_geometry(tgt_u32, tgt_valid, aold_rows, sub: int, box):
    """Per-sub-block bbox + opening threshold.

    tgt_u32 [B, block, 3] uint32, tgt_valid [B, block] bool,
    aold_rows [B, block] f32 (= err_tol * oldacc per target row).
    Returns lo, hi [B, nsub, 3] f32 (internal units), aold [B, nsub]
    (min over valid lanes, BIG when empty), live [B, nsub] bool.
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
    aold = jnp.min(jnp.where(val, aold_rows.reshape(B, nsub, sub),
                             BIG), axis=2)
    return lo, hi, aold, live


def _classify(tree: Octree, node_ids, n_nodes, leaf_ids, n_leaves,
              lo, hi, aold, live, params: ShortRangeParams):
    """Re-test block lists against each sub-block's bbox.

    node_ids [B, MI], leaf_ids [B, ML]; lo/hi/aold/live [B, ns(,3)].
    Returns (node_keep [B, ns, MI], leaf_mono [B, ns, ML],
    leaf_p2p [B, ns, ML]) — mutually exclusive by construction.

    The tests mirror ops/blockwalk.block_traverse (gravity mode)
    exactly; a sub-bbox is contained in its block bbox, so
    open_sub => open_block: every p2p-classified leaf was already in
    the list, and a mono-classified cell's monopole satisfies the MAC
    for every target in the sub-block.
    """
    box = params.boxsize
    rcut2 = params.rcut * params.rcut
    bh2 = params.bh_opening_angle ** 2

    def test(ids, n_valid, is_node):
        safe = jnp.maximum(ids, 0)
        cen = tree.center[safe]            # [B, M, 3]
        length = tree.length[safe]         # [B, M]
        cofm = tree.cofm[safe]
        nmass = jnp.where(ids >= 0, tree.mass[safe], 0.0)
        lane = (jnp.arange(ids.shape[1])[None, :]
                < n_valid[:, None]) & (nmass > 0)

        # [B, ns, M, 3] minimum-image bbox->point distances
        c = 0.5 * (lo + hi)[:, :, None, :]
        h = 0.5 * (hi - lo)[:, :, None, :]
        d = cen[:, None, :, :] - c
        d = d - box * jnp.round(d / box)
        dbox = jnp.maximum(jnp.abs(d) - h, 0.0)
        dcell = jnp.maximum(dbox - 0.5 * length[:, None, :, None],
                            0.0)
        drop = jnp.sum(dcell * dcell, axis=-1) > rcut2   # [B, ns, M]

        dm = cofm[:, None, :, :] - c
        dm = dm - box * jnp.round(dm / box)
        dmin = jnp.maximum(jnp.abs(dm) - h, 0.0)
        r2min = jnp.sum(dmin * dmin, axis=-1)

        l2 = (length * length)[:, None, :]
        open_acc = (params.use_bh == 0) & (
            nmass[:, None, :] * l2
            > jnp.maximum(r2min, 1e-35) ** 2 * aold[:, :, None])
        open_bh = l2 > r2min * bh2
        inside = jnp.all(dbox < 0.6 * length[:, None, :, None],
                         axis=-1)
        opn = (open_acc | open_bh | inside) & (~drop)

        ok = lane[:, None, :] & live[:, :, None]
        if is_node:
            # block-accepted monopoles can only be kept or dropped:
            # r2min grows for the tighter bbox, so they never re-open
            return ok & (~drop)
        mono = ok & (~drop) & (~opn)
        p2p = ok & opn
        return mono, p2p

    node_keep = test(node_ids, n_nodes, True)
    leaf_mono, leaf_p2p = test(leaf_ids, n_leaves, False)
    return node_keep, leaf_mono, leaf_p2p


def _leaf_pcount(tree: Octree, leaf_ids, ncrit: int):
    safe = jnp.maximum(leaf_ids, 0)
    return jnp.minimum(jnp.where(leaf_ids >= 0, tree.pcount[safe], 0),
                       ncrit)


def packed_counts(tree, lists: BlockLists, tgt_u32, tgt_valid,
                  aold_rows, params, sub: int, ncrit: int,
                  batch: int = 128):
    """Total packed sources per sub-block: [nb, nsub] int32.

    Must agree exactly with the packing in _refined_eval (the host
    sizes the static cap from these counts).  Batched over blocks to
    bound the [batch, nsub, M] classification temporaries.
    """
    nb, block, _ = tgt_u32.shape
    nsub = block // sub
    bb = min(batch, nb)
    while nb % bb:
        bb //= 2

    def one(args):
        node_ids, n_nodes, leaf_ids, n_leaves, tgt, val, ao = args
        lo, hi, aold, live = _sub_geometry(tgt, val, ao, sub,
                                           params.boxsize)
        nk, lm, lp = _classify(tree, node_ids, n_nodes, leaf_ids,
                               n_leaves, lo, hi, aold, live, params)
        pc = _leaf_pcount(tree, leaf_ids, ncrit)     # [bb, ML]
        return (jnp.sum(nk, axis=2) + jnp.sum(lm, axis=2)
                + jnp.sum(jnp.where(lp, pc[:, None, :], 0), axis=2)
                ).astype(jnp.int32)

    nbatch = nb // bb
    args = (lists.node_ids.reshape(nbatch, bb, -1),
            lists.n_nodes.reshape(nbatch, bb),
            lists.leaf_ids.reshape(nbatch, bb, -1),
            lists.n_leaves.reshape(nbatch, bb),
            tgt_u32.reshape(nbatch, bb, block, 3),
            tgt_valid.reshape(nbatch, bb, block),
            aold_rows.reshape(nbatch, bb, block))
    out = jax.lax.map(one, args)
    return out.reshape(nb * nsub)


@partial(jax.jit, static_argnames=("params", "maxi", "maxl", "ncrit",
                                   "sub", "pcap", "nsel", "block",
                                   "batch", "want_pot"))
def _refined_eval(tree: Octree, lists: BlockLists, tgt_idx, tgt_valid,
                  aold_rows, sel, params: ShortRangeParams,
                  window_tables, maxi: int, maxl: int, ncrit: int,
                  sub: int, pcap: int, nsel: int, block: int,
                  batch: int = 256, want_pot: bool = False):
    """Evaluate the selected sub-blocks with packed source tables.

    sel [nsel] int32: flat sub-block ids (b * nsub + s).
    Returns (acc [nsel, sub, 3], pot [nsel, sub]) G-multiplied, in
    sub-block lane order.
    """
    box = params.boxsize
    nsub = block // sub
    to_f = jnp.float32(box / POS_SCALE)
    PCH = 512
    while pcap % PCH:
        PCH //= 2

    bbs = min(batch, nsel)
    while nsel % bbs:
        bbs //= 2
    nbatch = nsel // bbs

    cofm_u = jnp.clip(tree.cofm * jnp.float32(POS_SCALE / box),
                      0.0, float(POS_SCALE) - 1.0).astype(jnp.uint32)

    def eval_batch(sel_b):
        b = sel_b // nsub                       # [bbs]
        s = sel_b % nsub
        node_ids = lists.node_ids[b]            # [bbs, MI]
        n_nodes = lists.n_nodes[b]
        leaf_ids = lists.leaf_ids[b]            # [bbs, ML]
        n_leaves = lists.n_leaves[b]
        rows = (s[:, None] * sub
                + jnp.arange(sub, dtype=jnp.int32)[None, :])
        tidx = tgt_idx[b[:, None], rows]        # [bbs, sub]
        tval = tgt_valid[b[:, None], rows]
        ao = aold_rows[b[:, None], rows]
        tgt = tree.ipos_s[tidx]                 # [bbs, sub, 3] u32

        lo, hi, aold, live = _sub_geometry(
            tgt.reshape(bbs, 1 * sub, 3), tval, ao, sub, box)
        nk, lm, lp = _classify(tree, node_ids, n_nodes, leaf_ids,
                               n_leaves, lo, hi, aold, live, params)
        nk = nk[:, 0, :]                        # nsub==1 per entry
        lm = lm[:, 0, :]
        lp = lp[:, 0, :]

        # ---- pack: nodes ++ leaf monopoles ++ leaf particles ----
        # TPU scatters are slow, so packing is GATHER-ONLY: build the
        # per-segment count vector (node cells: 1 entry, mono leaves:
        # 1 entry, p2p leaves: pcount entries), then binary-search
        # each packed slot into the inclusive prefix sum and gather
        # its source.  Cost ~ log2(S) gathers per packed slot.
        pc = _leaf_pcount(tree, leaf_ids, ncrit)     # [bbs, ML]
        MI = node_ids.shape[1]
        ML = leaf_ids.shape[1]
        cnt = jnp.concatenate([
            nk.astype(jnp.int32),
            lm.astype(jnp.int32),
            jnp.where(lp, pc, 0)], axis=1)            # [bbs, S]
        S = MI + 2 * ML
        cum = jnp.cumsum(cnt, axis=1)                 # inclusive
        total = cum[:, -1]

        p = jnp.arange(pcap, dtype=jnp.int32)[None, :]  # [1, pcap]
        rowi = jnp.arange(bbs)[:, None]
        # searchsorted(cum, p, 'right'): first seg with cum > p
        seg = jnp.zeros((bbs, pcap), jnp.int32)
        step = 1 << (S - 1).bit_length()
        while step:
            cand = seg + step
            cval = cum[rowi, jnp.minimum(cand, S) - 1]
            seg = jnp.where((cand <= S) & (cval <= p), cand, seg)
            step //= 2
        segc = jnp.minimum(seg, S - 1)
        excl = cum[rowi, segc] - cnt[rowi, segc]
        j = p - excl                                  # within-segment
        valid = p < total[:, None]

        is_p2p = segc >= MI + ML
        cell_id = jnp.where(is_p2p, 0,
                            jnp.where(segc < MI,
                                      node_ids[rowi, segc % MI],
                                      leaf_ids[rowi, (segc - MI) % ML]))
        cell_id = jnp.maximum(cell_id, 0)
        leaf_id = jnp.maximum(
            leaf_ids[rowi, (segc - MI - ML) % ML], 0)
        n = tree.ipos_s.shape[0]
        pidx = jnp.clip(tree.pstart[leaf_id] + j, 0, n - 1)

        spos = jnp.where(is_p2p[..., None], tree.ipos_s[pidx],
                         cofm_u[cell_id])
        smass = jnp.where(valid,
                          jnp.where(is_p2p, tree.mass_s[pidx],
                                    tree.mass[cell_id]), 0.0)

        # ---- dense pair pass [sub x pcap], chunked ----
        def chunk(carry, c):
            acc, pot = carry
            sl = jax.lax.dynamic_slice_in_dim(spos, c * PCH, PCH,
                                              axis=1)
            sm = jax.lax.dynamic_slice_in_dim(smass, c * PCH, PCH,
                                              axis=1)
            # exact periodic separation in fixed point
            d = sl[:, None, :, :] - tgt[:, :, None, :]
            dx = jax.lax.bitcast_convert_type(
                d, jnp.int32).astype(jnp.float32) * to_f
            r2 = jnp.sum(dx * dx, axis=-1)
            fac, facpot = spline_force(r2, sm[:, None, :],
                                       params.softening)
            r = jnp.sqrt(r2)
            fw, pw = short_range_window(r, params.cellsize,
                                        params.asmth, window_tables)
            acc = acc + jnp.sum(dx * (fac * fw)[..., None], axis=2)
            if want_pot:
                pot = pot + jnp.sum(facpot * pw, axis=2)
            return (acc, pot), None

        acc0 = jnp.zeros((bbs, sub, 3), jnp.float32)
        pot0 = jnp.zeros((bbs, sub), jnp.float32)
        (acc, pot), _ = jax.lax.scan(chunk, (acc0, pot0),
                                     jnp.arange(pcap // PCH))
        return acc, pot

    acc, pot = jax.lax.map(eval_batch, sel.reshape(nbatch, bbs))
    return (acc.reshape(nsel, sub, 3) * params.G,
            pot.reshape(nsel, sub) * params.G)


@partial(jax.jit, static_argnames=("T", "block", "level", "nb",
                                   "maxi", "maxl", "compact", "sub",
                                   "ncrit", "params"))
def _blocks_traverse_count(tree, oldacc, active, params, T, block,
                           level, nb, maxi, maxl, compact, sub,
                           ncrit):
    """One fused device program: target compaction, block assembly,
    traversal, sub-block packed-source counts, tier order, and the
    diagnostic scalars for the single host sync."""
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

    lists = block_traverse(
        tree, bb_lo, bb_hi, jnp.zeros(nb, jnp.float32), block_aold,
        params.boxsize, params.rcut, params.bh_opening_angle ** 2,
        params.use_bh, maxi=maxi, maxl=maxl, mode="gravity")

    tgt_u32 = tree.ipos_s[tgt_idx.reshape(-1)].reshape(nb, block, 3)
    counts = packed_counts(tree, lists, tgt_u32, tgt_valid,
                           aold_rows, params, sub, ncrit)   # [nbs]
    nbs = counts.shape[0]
    order_s = jnp.argsort(counts)
    t2 = max(nbs // 8, 1)
    s_small_max = counts[order_s[nbs - t2 - 1]] if nbs > 1 else \
        counts[order_s[0]]
    diag = jnp.stack([
        b_ovf.astype(jnp.int32),
        jnp.any(lists.overflow).astype(jnp.int32),
        jnp.max(lists.n_nodes), jnp.max(lists.n_leaves),
        jnp.max(counts), s_small_max])
    return tgt_idx, tgt_valid, lists, aold_rows, order_s, diag


def treegrav_refined(tree: Octree, oldacc, params: ShortRangeParams,
                     window_tables=None, n_targets: int = None,
                     block: int = 128, maxi: int = 1024,
                     maxl: int = 512, ncrit: int = 32, sub: int = 32,
                     auto_grow: int = 3, active=None,
                     tier_cache: dict = None, caps_cache: dict = None,
                     want_pot: bool = False, engine: str = None):
    """Short-range force via the refined packed schedule.

    Drop-in sibling of shortrange_blocked.treegrav_blocked
    (blocking='device'): same traversal, same block assembly, ONE host
    sync per evaluation — but evaluation re-tests the lists per
    `sub`-target sub-block and runs packed dense passes (see module
    docstring).  Returns (accel [N,3], pot [N], lists) in ORIGINAL
    particle order.
    """
    from .shortrange_blocked import _next_pow2 as np2
    from ..ops.blockwalk import auto_block_level

    n = tree.ipos_s.shape[0]
    if n_targets is None:
        n_targets = n
    assert block % sub == 0
    nsub = block // sub
    compact = active is not None
    if compact:
        T = min(np2(max(int(n_targets), block)), n)
        active = jnp.asarray(active)
    else:
        T = n
        active = jnp.zeros(0, bool)
    level = auto_block_level(T, block)
    nb = np2((T + block - 1) // block + max(T // (2 * block), 1))
    if caps_cache is not None:
        maxi = max(maxi, caps_cache.get("maxi", 0))
        maxl = max(maxl, caps_cache.get("maxl", 0))
    if tier_cache is None:
        tier_cache = {}

    for attempt in range(2 * (auto_grow + 1)):
        tgt_idx, tgt_valid, lists, aold_rows, order_s, diag = \
            _blocks_traverse_count(tree, oldacc, active, params, T,
                                   block, level, nb, maxi, maxl,
                                   compact, sub, ncrit)
        (b_ovf, w_ovf, max_nn, max_nl, s_max, s_small) = \
            [int(x) for x in np.asarray(diag)]      # THE host sync
        if not b_ovf and not w_ovf:
            break
        if attempt == 2 * auto_grow + 1:
            raise RuntimeError(
                f"refined block walk overflow: blocks={b_ovf} "
                f"nodes {max_nn}/{maxi} leaves {max_nl}/{maxl}")
        if b_ovf:
            nb *= 2
        if max_nn >= maxi:
            maxi *= 2
        if max_nl >= maxl:
            maxl *= 2
        if caps_cache is not None:
            caps_cache["maxi"] = maxi
            caps_cache["maxl"] = maxl

    if engine is None:
        import os
        engine = os.environ.get("SHENQI_REFINED_ENGINE", "rxla")

    # static packed caps from the exact device counts (grow-only
    # cache -> bounded recompiles; PCH-aligned pow2)
    nbs = nb * nsub
    t2 = max(nbs // 8, 1)
    need_big = max(np2(s_max + 1), 128)
    need_small = max(np2(s_small + 1), 128)
    key = ("refined", nb, maxi, maxl, sub)
    cb, cs = tier_cache.get(key, (0, 0))
    pcap_big = max(cb, need_big)
    pcap_small = min(max(cs, need_small), pcap_big)
    tier_cache[key] = (pcap_big, pcap_small)

    small_sel = jnp.sort(order_s[:nbs - t2])
    big_sel = jnp.sort(order_s[nbs - t2:])
    acc_bs = jnp.zeros((nbs, sub, 3), jnp.float32)
    pot_bs = jnp.zeros((nbs, sub), jnp.float32)
    if nbs - t2 > 0:
        a1, p1 = _refined_eval(tree, lists, tgt_idx, tgt_valid,
                               aold_rows, small_sel, params,
                               window_tables, maxi, maxl, ncrit, sub,
                               pcap_small, nbs - t2, block,
                               want_pot=want_pot)
        acc_bs = acc_bs.at[small_sel].set(a1)
        pot_bs = pot_bs.at[small_sel].set(p1)
    a2, p2 = _refined_eval(tree, lists, tgt_idx, tgt_valid, aold_rows,
                           big_sel, params, window_tables, maxi,
                           maxl, ncrit, sub, pcap_big, t2,
                           block, want_pot=want_pot)
    acc_bs = acc_bs.at[big_sel].set(a2)
    pot_bs = pot_bs.at[big_sel].set(p2)

    # scatter back: sub-block lanes -> sorted rows -> original order
    flat_idx = jnp.where(tgt_valid, tgt_idx, n).reshape(-1)
    acc_sorted = jnp.zeros((n + 1, 3), jnp.float32).at[flat_idx].set(
        acc_bs.reshape(-1, 3))[:n]
    pot_sorted = jnp.zeros(n + 1, jnp.float32).at[flat_idx].set(
        pot_bs.reshape(-1))[:n]
    acc = jnp.zeros((n, 3), jnp.float32).at[tree.order].set(acc_sorted)
    pot = jnp.zeros(n, jnp.float32).at[tree.order].set(pot_sorted)
    return acc, pot, lists
