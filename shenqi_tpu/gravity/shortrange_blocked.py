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
    CH = 64
    PCH = 128
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


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _tiered_eval(tree, lists, tgt_pos, params, window_tables,
                 maxi: int, maxl: int, ncrit: int, nblocks: int,
                 block: int):
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
        acc, pot = _blocked_eval(tree, lists, tgt_pos, params,
                                 window_tables, maxi, maxl, ncrit,
                                 nblocks, block)
        return acc, pot

    t2 = nblocks // 8                    # long-tail tier (static)
    order = np.argsort(nl)               # ascending by leaf count
    small_idx = np.sort(order[:nblocks - t2])
    big_idx = np.sort(order[nblocks - t2:])
    maxl_small = min(max(_next_pow2(int(nl[small_idx].max()) + 1),
                         ncrit), maxl)
    maxi_small = min(max(_next_pow2(int(ni[small_idx].max()) + 1),
                         64), maxi)
    if maxl_small >= maxl and maxi_small >= maxi:
        acc, pot = _blocked_eval(tree, lists, tgt_pos, params,
                                 window_tables, maxi, maxl, ncrit,
                                 nblocks, block)
        return acc, pot

    def sub(idx_np, mi, ml):
        idxj = jnp.asarray(idx_np)
        sublists = BlockLists(
            node_ids=lists.node_ids[idxj][:, :mi],
            n_nodes=lists.n_nodes[idxj],
            leaf_ids=lists.leaf_ids[idxj][:, :ml],
            n_leaves=lists.n_leaves[idxj],
            overflow=lists.overflow[idxj])
        a, p = _blocked_eval(tree, sublists, tgt_pos[idxj], params,
                             window_tables, mi, ml, ncrit,
                             len(idx_np), block)
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


def treegrav_blocked(tree: Octree, oldacc, params: ShortRangeParams,
                     window_tables=None, n_targets: int = None,
                     block: int = BLOCK, maxi: int = 2048,
                     maxl: int = 512, ncrit: int = 32,
                     auto_grow: int = 3, blocking: str = "tree"):
    """Short-range force at the sorted particle positions.

    oldacc: [N] |acc|/G in ORIGINAL order (gathered through tree.order).
    Returns (accel [N,3], pot [N]) in ORIGINAL particle order.
    blocking='tree' builds target blocks from the tree's effective
    leaves (compact cell bboxes -> short interaction lists);
    'morton' uses fixed-size Morton runs (fully device-side but with a
    long-tailed list-length distribution).
    On traversal cap overflow, retries up to `auto_grow` times with the
    overflowed cap doubled; raises RuntimeError if they still overflow.
    """
    n = tree.ipos_s.shape[0]
    if n_targets is None:
        n_targets = n
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

    to_f = jnp.float32(params.boxsize / POS_SCALE)
    tgt_pos = (tree.ipos_s[tgt_idx.reshape(-1)].astype(jnp.float32)
               * to_f).reshape(nblocks, block, 3)
    acc_b, pot_b = _tiered_eval(tree, lists, tgt_pos, params,
                                window_tables, maxi, maxl, ncrit,
                                nblocks, block)
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
