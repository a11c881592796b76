"""Blocked short-range gravity: block traversal + dense masked evaluation.

Production TPU path (see ops/blockwalk.py).  Physics identical to
shortrange.py (same spline softening + short-range window); only the
schedule differs: a conservative block MAC means every accepted node is
evaluated as a monopole by all targets of the block, and every opened
leaf contributes P2P pairs to all targets (masked).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tree import Octree
from ..ops.blockwalk import (block_traverse, make_blocks,
                             gather_leaf_sources, BlockLists)
from ..core.particles import POS_SCALE
from .shortrange import (ShortRangeParams, spline_force,
                         short_range_window)

BLOCK = 128


def _nearest(d, boxsize):
    return d - boxsize * jnp.round(d / boxsize)


@partial(jax.jit, static_argnames=("params", "maxi", "maxl", "ncrit",
                                   "nblocks", "block", "block_batch"))
def _blocked_eval(tree: Octree, lists, tgt_pos, params: ShortRangeParams,
                  window_tables, maxi: int, maxl: int, ncrit: int,
                  nblocks: int, block: int, block_batch: int = 256):
    """Evaluate monopole + P2P lists. tgt_pos: [B, BLK, 3] float.

    Blocks are processed in batches of `block_batch` via lax.map so
    peak HBM is bounded by the batch, not the whole block set: the
    gathered leaf-source tables ([batch, maxl*ncrit, ...]) and the
    pairwise temporaries ([batch, BLK, CH, 3]) dominate; batching
    keeps a 64^3+ walk inside a single v5e's 16 GB.
    """
    box = params.boxsize
    # chunk sizes tuned for the v5e: the eval is launch/pipeline-bound
    # (measured 29s/step at 128^3 with CH=64/PCH=128 vs ~100 GFLOP/s
    # achieved); wider chunks cut sequential kernel count 4x while a
    # [batch, BLK, PCH, 3] temporary stays ~50 MB
    CH = 256
    while maxi % CH:
        CH //= 2
    PCH = 512
    while (maxl * ncrit) % PCH:
        PCH //= 2
    total_src = maxl * ncrit

    bb = min(block_batch, nblocks)
    while nblocks % bb:
        bb //= 2
    nbatch = nblocks // bb

    def eval_batch(args):
        node_ids, n_nodes, leaf_ids, tgt = args
        # ---- monopoles ----
        safe = jnp.maximum(node_ids, 0)
        cofm = tree.cofm[safe]            # [bb, MAXI, 3]
        nmass = jnp.where(node_ids >= 0, tree.mass[safe], 0.0)
        nmask = (jnp.arange(maxi)[None, :] < n_nodes[:, None])
        nmass = jnp.where(nmask, nmass, 0.0)

        def mono_chunk(carry, c):
            acc, pot = carry
            sl = jax.lax.dynamic_slice_in_dim(cofm, c * CH, CH, axis=1)
            sm = jax.lax.dynamic_slice_in_dim(nmass, c * CH, CH, axis=1)
            dx = _nearest(sl[:, None, :, :] - tgt[:, :, None, :], box)
            r2 = jnp.sum(dx * dx, axis=-1)        # [bb, BLK, CH]
            fac, facpot = spline_force(r2, sm[:, None, :],
                                       params.softening)
            r = jnp.sqrt(r2)
            fw, pw = short_range_window(r, params.cellsize,
                                        params.asmth, window_tables)
            acc = acc + jnp.sum(dx * (fac * fw)[..., None], axis=2)
            pot = pot + jnp.sum(facpot * pw, axis=2)
            return (acc, pot), None

        acc0 = jnp.zeros((bb, block, 3), jnp.float32)
        pot0 = jnp.zeros((bb, block), jnp.float32)
        (acc, pot), _ = jax.lax.scan(mono_chunk, (acc0, pot0),
                                     jnp.arange(maxi // CH))

        # ---- P2P over opened leaves ----
        payload = {"ipos": tree.ipos_s, "mass": tree.mass_s}
        src, valid = gather_leaf_sources(tree, leaf_ids, ncrit,
                                         payload)
        smass = jnp.where(valid, src["mass"], 0.0)
        spos = src["ipos"].astype(jnp.float32) * jnp.float32(
            box / POS_SCALE)

        def p2p_chunk(carry, c):
            acc, pot = carry
            sl = jax.lax.dynamic_slice_in_dim(spos, c * PCH, PCH,
                                              axis=1)
            sm = jax.lax.dynamic_slice_in_dim(smass, c * PCH, PCH,
                                              axis=1)
            dx = _nearest(sl[:, None, :, :] - tgt[:, :, None, :], box)
            r2 = jnp.sum(dx * dx, axis=-1)
            fac, facpot = spline_force(r2, sm[:, None, :],
                                       params.softening)
            r = jnp.sqrt(r2)
            fw, pw = short_range_window(r, params.cellsize,
                                        params.asmth, window_tables)
            acc = acc + jnp.sum(dx * (fac * fw)[..., None], axis=2)
            pot = pot + jnp.sum(facpot * pw, axis=2)
            return (acc, pot), None

        (acc, pot), _ = jax.lax.scan(p2p_chunk, (acc, pot),
                                     jnp.arange(total_src // PCH))
        return acc, pot

    batched = (
        lists.node_ids.reshape(nbatch, bb, maxi),
        lists.n_nodes.reshape(nbatch, bb),
        lists.leaf_ids.reshape(nbatch, bb, maxl),
        tgt_pos.reshape(nbatch, bb, block, 3),
    )
    acc, pot = jax.lax.map(eval_batch, batched)
    return (acc.reshape(nblocks, block, 3) * params.G,
            pot.reshape(nblocks, block) * params.G)


@partial(jax.jit, static_argnames=("params", "maxi", "maxl", "ncrit",
                                   "nblocks", "block", "block_batch",
                                   "interpret", "want_pot"))
def _blocked_eval_pallas(tree: Octree, lists, tgt_ipos,
                         params: ShortRangeParams, window,
                         maxi: int, maxl: int, ncrit: int,
                         nblocks: int, block: int,
                         block_batch: int = 256,
                         interpret: bool = False,
                         want_pot: bool = False):
    """Fused Pallas evaluation of monopole + P2P lists.

    An accepted node's monopole is a point mass at its center of
    mass with the SAME pair math as a particle (spline + window), so
    node and leaf sources concatenate into ONE source table and one
    kernel call per block — the whole interaction (separation,
    softening, Chebyshev window, accumulate) stays in VMEM instead of
    the XLA path's per-op HBM round trips (ops/pallas_p2p.py).

    tgt_ipos: [B, 128, 3] uint32.  window must be a PolyWindow.
    Returns (acc [B,128,3], pot [B,128]), G-multiplied.
    """
    from ..ops.pallas_p2p import p2p_blocked, BLK, SCH

    assert block == BLK, "pallas engine requires 128-particle blocks"
    box = params.boxsize
    total_src = maxl * ncrit
    assert total_src % 128 == 0
    # node table padded so the CONCATENATED source table is a
    # multiple of the kernel's inner tile width
    sch = min(SCH, ((maxi + total_src + 127) // 128) * 128)
    maxi_p = maxi + (-(maxi + total_src)) % sch

    bb = min(block_batch, nblocks)
    while nblocks % bb:
        bb //= 2
    nbatch = nblocks // bb

    def eval_batch(args):
        node_ids, n_nodes, leaf_ids, tgt = args
        node_ids = jnp.pad(node_ids, ((0, 0), (0, maxi_p - maxi)),
                           constant_values=-1)
        safe = jnp.maximum(node_ids, 0)
        cofm = tree.cofm[safe]                      # [bb, maxi_p, 3]
        nmask = (node_ids >= 0) & (
            jnp.arange(maxi_p)[None, :] < n_nodes[:, None])
        nmass = jnp.where(nmask, tree.mass[safe], 0.0)
        # fixed-point CoM: one-tick rounding = box/2^32, far below
        # softening scales
        cofm_u = jnp.clip(cofm * jnp.float32(POS_SCALE / box),
                          0.0, float(POS_SCALE) - 1.0
                          ).astype(jnp.uint32)

        payload = {"ipos": tree.ipos_s, "mass": tree.mass_s}
        src, valid = gather_leaf_sources(tree, leaf_ids, ncrit,
                                         payload)
        smass = jnp.where(valid, src["mass"], 0.0)

        all_pos = jnp.concatenate([cofm_u, src["ipos"]], axis=1)
        all_mass = jnp.concatenate([nmass, smass], axis=1)
        acc, pot = p2p_blocked(tgt, all_pos, all_mass, box,
                               params.softening, params.cellsize,
                               window, params.G, interpret=interpret,
                               want_pot=want_pot, sch=sch)
        if pot is None:
            pot = jnp.zeros(acc.shape[:2], jnp.float32)
        return acc, pot

    batched = (
        lists.node_ids.reshape(nbatch, bb, maxi),
        lists.n_nodes.reshape(nbatch, bb),
        lists.leaf_ids.reshape(nbatch, bb, maxl),
        tgt_ipos.reshape(nbatch, bb, block, 3),
    )
    acc, pot = jax.lax.map(eval_batch, batched)
    return (acc.reshape(nblocks, block, 3),
            pot.reshape(nblocks, block))


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _default_engine(window_tables, block, maxl, ncrit):
    """Engine choice for the (non-default) blocked walk.  Settled by
    measurement in round 3: the production path is the grid-stencil
    engine (gravity/stencil.py) where XLA beats the Pallas and MXU
    variants on the v5e (499k vs 402k/497k pps at 128^3 clustered,
    validation/RESULT_engine_timing_r3).  The Pallas evaluator here
    stays correctness-verified and selectable (SHENQI_ENGINE=pallas)
    as an oracle/alternative, not a performance claim."""
    import os
    from .shortrange import PolyWindow
    want = os.environ.get("SHENQI_ENGINE", "xla")
    if (want == "pallas" and jax.default_backend() == "tpu"
            and isinstance(window_tables, PolyWindow)
            and block == 128 and (maxl * ncrit) % 128 == 0):
        return "pallas"
    return "xla"


def _dispatch_eval(tree, lists, tgt_u32, params, window_tables,
                   maxi, maxl, ncrit, nblocks, block, engine,
                   want_pot: bool = True):
    """Route one block set to the XLA or the Pallas evaluator."""
    if engine == "pallas":
        interpret = jax.default_backend() != "tpu"
        return _blocked_eval_pallas(tree, lists, tgt_u32, params,
                                    window_tables, maxi, maxl, ncrit,
                                    nblocks, block,
                                    interpret=interpret,
                                    want_pot=want_pot)
    to_f = jnp.float32(params.boxsize / POS_SCALE)
    tgt_pos = tgt_u32.astype(jnp.float32) * to_f
    return _blocked_eval(tree, lists, tgt_pos, params, window_tables,
                         maxi, maxl, ncrit, nblocks, block)


def _tiered_eval(tree, lists, tgt_u32, params, window_tables,
                 maxi: int, maxl: int, ncrit: int, nblocks: int,
                 block: int, engine: str = "xla"):
    """Split blocks into a small-list tier and a long-tail tier.

    Morton runs that cross high-level cell boundaries produce a few
    blocks with very long interaction lists; one global cap would make
    EVERY block pay for the worst one.  Here blocks whose list lengths
    fit tight power-of-two caps are evaluated with those caps, and
    only the long tail uses the full caps — typically a 4-8x saving in
    dense-eval work.  Caps are powers of two and tier sizes fixed
    fractions of nblocks, so shapes stay stable across steps.
    """
    nl = np.asarray(lists.n_leaves)
    ni = np.asarray(lists.n_nodes)
    if nblocks < 16:
        return _dispatch_eval(tree, lists, tgt_u32, params,
                              window_tables, maxi, maxl, ncrit,
                              nblocks, block, engine)

    t2 = nblocks // 8                    # long-tail tier (static)
    order = np.argsort(nl)               # ascending by leaf count
    small_idx = np.sort(order[:nblocks - t2])
    big_idx = np.sort(order[nblocks - t2:])
    maxl_small = min(max(_next_pow2(int(nl[small_idx].max()) + 1),
                         ncrit), maxl)
    maxi_small = min(max(_next_pow2(int(ni[small_idx].max()) + 1),
                         64), maxi)
    if engine == "pallas":
        # leaf-source tables must stay lane-aligned (S % 128 == 0)
        maxl_small = max(maxl_small, max(1, 128 // ncrit))
    if maxl_small >= maxl and maxi_small >= maxi:
        return _dispatch_eval(tree, lists, tgt_u32, params,
                              window_tables, maxi, maxl, ncrit,
                              nblocks, block, engine)

    def sub(idx_np, mi, ml):
        idxj = jnp.asarray(idx_np)
        sublists = BlockLists(
            node_ids=lists.node_ids[idxj][:, :mi],
            n_nodes=lists.n_nodes[idxj],
            leaf_ids=lists.leaf_ids[idxj][:, :ml],
            n_leaves=lists.n_leaves[idxj],
            overflow=lists.overflow[idxj])
        a, p = _dispatch_eval(tree, sublists, tgt_u32[idxj], params,
                              window_tables, mi, ml, ncrit,
                              len(idx_np), block, engine)
        return a, p

    acc = jnp.zeros((nblocks, block, 3), jnp.float32)
    pot = jnp.zeros((nblocks, block), jnp.float32)
    a1, p1 = sub(small_idx, maxi_small, maxl_small)
    acc = acc.at[jnp.asarray(small_idx)].set(a1)
    pot = pot.at[jnp.asarray(small_idx)].set(p1)
    a2, p2 = sub(big_idx, maxi, maxl)
    acc = acc.at[jnp.asarray(big_idx)].set(a2)
    pot = pot.at[jnp.asarray(big_idx)].set(p2)
    return acc, pot


def _tiered_eval_device(tree, lists, tgt_u32, params, window_tables,
                        maxi, maxl, ncrit, nblocks, block, engine,
                        caps, order_b, want_pot: bool = True):
    """Two-tier evaluation with DEVICE-side tier assignment.

    Unlike _tiered_eval, the sort by list length stays on device
    (order_b) and the small-tier caps are STATIC inputs (validated +
    grown by the caller from a persistent cache), so steady-state
    steps do no host transfers here and recompile only when a cap
    genuinely grows.
    """
    maxi_s, maxl_s = caps
    if nblocks < 16 or (maxi_s >= maxi and maxl_s >= maxl):
        return _dispatch_eval(tree, lists, tgt_u32, params,
                              window_tables, maxi, maxl, ncrit,
                              nblocks, block, engine, want_pot)
    t2 = nblocks // 8
    small_idx = jnp.sort(order_b[:nblocks - t2])
    big_idx = jnp.sort(order_b[nblocks - t2:])

    def sub(idxj, mi, ml, nsub):
        sublists = BlockLists(
            node_ids=lists.node_ids[idxj][:, :mi],
            n_nodes=lists.n_nodes[idxj],
            leaf_ids=lists.leaf_ids[idxj][:, :ml],
            n_leaves=lists.n_leaves[idxj],
            overflow=lists.overflow[idxj])
        return _dispatch_eval(tree, sublists, tgt_u32[idxj], params,
                              window_tables, mi, ml, ncrit, nsub,
                              block, engine, want_pot)

    acc = jnp.zeros((nblocks, block, 3), jnp.float32)
    pot = jnp.zeros((nblocks, block), jnp.float32)
    a1, p1 = sub(small_idx, maxi_s, maxl_s, nblocks - t2)
    acc = acc.at[small_idx].set(a1)
    pot = pot.at[small_idx].set(p1)
    a2, p2 = sub(big_idx, maxi, maxl, t2)
    acc = acc.at[big_idx].set(a2)
    pot = pot.at[big_idx].set(p2)
    return acc, pot


def treegrav_blocked(tree: Octree, oldacc, params: ShortRangeParams,
                     window_tables=None, n_targets: int = None,
                     block: int = BLOCK, maxi: int = 2048,
                     maxl: int = 512, ncrit: int = 32,
                     auto_grow: int = 3, blocking: str = "tree",
                     engine: str = None, active=None,
                     tier_cache: dict = None, caps_cache: dict = None,
                     want_pot: bool = True):
    """Short-range force at the sorted particle positions.

    oldacc: [N] |acc|/G in ORIGINAL order (gathered through tree.order).
    Returns (accel [N,3], pot [N]) in ORIGINAL particle order.
    blocking='tree' builds target blocks from the tree's effective
    leaves (compact cell bboxes -> short interaction lists);
    'morton' uses fixed-size Morton runs (fully device-side but with a
    long-tailed list-length distribution);
    'device' is the production path: cell-anchored blocks assembled
    ON DEVICE (no host position transfer), one scalar host sync per
    evaluation, static shapes bucketed so repeat steps hit the jit
    cache.  With blocking='device', `active` may give a host/device
    bool mask [N] (original order) of target rows and `n_targets`
    their count — targets are compacted to the front and the walk
    size bucketed to the next power of two (the build_active_sublist
    analog, timestep.cpp:111, without per-count recompiles).
    `tier_cache` (a dict the caller persists across steps) keeps the
    two-tier evaluation caps static and monotone.
    On traversal cap overflow, retries up to `auto_grow` times with the
    overflowed cap doubled; raises RuntimeError if they still overflow.
    """
    n = tree.ipos_s.shape[0]
    if n_targets is None:
        n_targets = n
    if blocking == "device":
        # caps_cache persists auto-grown traversal caps across steps
        # so a once-overflowed cap doesn't re-pay the retry every call
        if caps_cache is not None:
            maxi = max(maxi, caps_cache.get("maxi", 0))
            maxl = max(maxl, caps_cache.get("maxl", 0))
        out = _treegrav_device(tree, oldacc, params, window_tables,
                               n_targets, block, maxi, maxl, ncrit,
                               auto_grow, engine, active, tier_cache,
                               caps_cache, want_pot)
        return out
    if blocking == "tree":
        from ..ops.blockwalk import make_blocks_from_tree
        bb_lo, bb_hi, tgt_idx, tgt_valid, nblocks = \
            make_blocks_from_tree(tree, n_targets, block,
                                  params.boxsize)
        oldacc_s = oldacc[tree.order]
        aold_lane = jnp.where(tgt_valid,
                              params.err_tol_force_acc
                              * oldacc_s[tgt_idx], jnp.inf)
        block_aold = jnp.where(jnp.any(tgt_valid, axis=1),
                               jnp.min(aold_lane, axis=1), 0.0)
    else:
        bb_lo, bb_hi, nblocks, pad_n = make_blocks(
            tree, n_targets, block, params.boxsize)
        oldacc_s = oldacc[tree.order]
        idx = jnp.minimum(jnp.arange(pad_n), n_targets - 1)
        tgt_idx = idx.reshape(nblocks, block).astype(jnp.int32)
        tgt_valid = (tgt_idx.reshape(-1) < n_targets).reshape(
            nblocks, block)
        aold_blk = (params.err_tol_force_acc
                    * oldacc_s[idx].reshape(nblocks, block))
        block_aold = jnp.min(aold_blk, axis=1)
    for attempt in range(auto_grow + 1):
        lists = block_traverse(
            tree, bb_lo, bb_hi, jnp.zeros(nblocks, jnp.float32),
            block_aold, params.boxsize, params.rcut,
            params.bh_opening_angle ** 2, params.use_bh, maxi=maxi,
            maxl=maxl, mode="gravity")
        if not bool(jnp.any(lists.overflow)):
            break
        if attempt == auto_grow:
            raise RuntimeError(
                f"block traversal overflow: nodes max "
                f"{int(jnp.max(lists.n_nodes))}/{maxi}, leaves max "
                f"{int(jnp.max(lists.n_leaves))}/{maxl}")
        if int(jnp.max(lists.n_nodes)) >= maxi:
            maxi *= 2
        if int(jnp.max(lists.n_leaves)) >= maxl:
            maxl *= 2

    if engine is None:
        # Pallas fused kernel is the TPU production path (VMEM-
        # resident pair math); XLA everywhere else (interpret mode is
        # for tests only — too slow to be a CPU default)
        from .shortrange import PolyWindow
        engine = "pallas" if (jax.default_backend() == "tpu"
                              and isinstance(window_tables,
                                             PolyWindow)
                              and block == 128
                              and (maxl * ncrit) % 128 == 0) \
            else "xla"
    tgt_u32 = tree.ipos_s[tgt_idx.reshape(-1)].reshape(
        nblocks, block, 3)
    acc_b, pot_b = _tiered_eval(tree, lists, tgt_u32, params,
                                window_tables, maxi, maxl, ncrit,
                                nblocks, block, engine=engine)
    # scatter to sorted order: each live particle appears in exactly
    # one valid lane; invalid lanes land in a dump row
    flat_idx = jnp.where(tgt_valid, tgt_idx, n).reshape(-1)
    acc_sorted = jnp.zeros((n + 1, 3), jnp.float32).at[flat_idx].set(
        acc_b.reshape(-1, 3))[:n]
    pot_sorted = jnp.zeros(n + 1, jnp.float32).at[flat_idx].set(
        pot_b.reshape(-1))[:n]
    # back to original order
    acc = jnp.zeros((n, 3), jnp.float32).at[tree.order].set(acc_sorted)
    pot = jnp.zeros(n, jnp.float32).at[tree.order].set(pot_sorted)
    return acc, pot, lists


@partial(jax.jit, static_argnames=("T", "block", "level", "nb",
                                   "maxi", "maxl", "params",
                                   "compact"))
def _device_blocks_and_traverse(tree, oldacc, active, params, T, block,
                                level, nb, maxi, maxl, compact):
    """One fused device program: target compaction, block assembly,
    traversal, and the diagnostic scalars for the single host sync."""
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
    aold_lane = jnp.where(tgt_valid, params.err_tol_force_acc
                          * oldacc_s[tgt_idx], BIG)
    block_aold = jnp.min(aold_lane, axis=1)

    lists = block_traverse(
        tree, bb_lo, bb_hi, jnp.zeros(nb, jnp.float32), block_aold,
        params.boxsize, params.rcut, params.bh_opening_angle ** 2,
        params.use_bh, maxi=maxi, maxl=maxl, mode="gravity")

    order_b = jnp.argsort(lists.n_leaves)
    t2 = nb // 8
    if nb >= 16:
        nl_small_max = lists.n_leaves[order_b[nb - t2 - 1]]
        ni_small_max = jnp.max(lists.n_nodes[order_b[:nb - t2]])
    else:
        nl_small_max = jnp.max(lists.n_leaves)
        ni_small_max = jnp.max(lists.n_nodes)
    diag = jnp.stack([
        b_ovf.astype(jnp.int32),
        jnp.any(lists.overflow).astype(jnp.int32),
        jnp.max(lists.n_nodes), jnp.max(lists.n_leaves),
        ni_small_max, nl_small_max])
    return tgt_idx, tgt_valid, lists, order_b, diag


def _treegrav_device(tree, oldacc, params, window_tables, n_targets,
                     block, maxi, maxl, ncrit, auto_grow, engine,
                     active, tier_cache, caps_cache=None,
                     want_pot: bool = True):
    """blocking='device' body of treegrav_blocked: ONE host sync of 6
    scalars per evaluation (vs a full position transfer + several
    array syncs in the 'tree' path)."""
    from ..ops.blockwalk import auto_block_level

    n = tree.ipos_s.shape[0]
    compact = active is not None
    if compact:
        T = min(_next_pow2(max(int(n_targets), block)), n)
        active = jnp.asarray(active)
    else:
        T = n
        active = jnp.zeros(0, bool)      # unused placeholder
    level = auto_block_level(T, block)
    nb = _next_pow2((T + block - 1) // block
                    + max(T // (2 * block), 1))

    if tier_cache is None:
        tier_cache = {}
    for attempt in range(2 * (auto_grow + 1)):
        tgt_idx, tgt_valid, lists, order_b, diag = \
            _device_blocks_and_traverse(tree, oldacc, active, params,
                                        T, block, level, nb, maxi,
                                        maxl, compact)
        (b_ovf, w_ovf, max_nn, max_nl, ni_small, nl_small) = \
            [int(x) for x in np.asarray(diag)]       # THE host sync
        if not b_ovf and not w_ovf:
            break
        if attempt == 2 * auto_grow + 1:
            raise RuntimeError(
                f"device block walk overflow: blocks={b_ovf} "
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
        engine = _default_engine(window_tables, block, maxl, ncrit)

    # static small-tier caps: grow-only cache -> bounded recompiles
    need_l = min(max(_next_pow2(nl_small + 1), ncrit), maxl)
    need_i = min(max(_next_pow2(ni_small + 1), 64), maxi)
    if engine == "pallas":
        need_l = max(need_l, max(1, 128 // ncrit))
    key = (nb, maxi, maxl)
    ci, cl = tier_cache.get(key, (0, 0))
    caps = (min(max(ci, need_i), maxi), min(max(cl, need_l), maxl))
    tier_cache[key] = caps

    tgt_u32 = tree.ipos_s[tgt_idx.reshape(-1)].reshape(nb, block, 3)
    acc_b, pot_b = _tiered_eval_device(
        tree, lists, tgt_u32, params, window_tables, maxi, maxl,
        ncrit, nb, block, engine, caps, order_b, want_pot)

    flat_idx = jnp.where(tgt_valid, tgt_idx, n).reshape(-1)
    acc_sorted = jnp.zeros((n + 1, 3), jnp.float32).at[flat_idx].set(
        acc_b.reshape(-1, 3))[:n]
    pot_sorted = jnp.zeros(n + 1, jnp.float32).at[flat_idx].set(
        pot_b.reshape(-1))[:n]
    acc = jnp.zeros((n, 3), jnp.float32).at[tree.order].set(acc_sorted)
    pot = jnp.zeros(n, jnp.float32).at[tree.order].set(pot_sorted)
    return acc, pot, lists
