"""Generic vectorized neighbor tree walk (the treewalk2 engine analog).

The reference's central abstraction (libgadget/treewalk2.h:203,
localtreewalk2.h:379-437) is a templated per-particle tree walk whose
`ngbiter` visits every neighbor within a search radius.  Here the same
protocol is a higher-order JAX function: a vmapped lax.while_loop over
the Octree's sibling/first-child order; leaf ranges are contiguous after
the Morton sort, so neighbor "iteration" is vectorized dynamic slices of
the sorted source payload, folded through a user accumulator.

No export/import machinery is needed on one chip; the multi-chip version
re-runs the same walk against ghost source slabs (exchange.py).

Usage:
    walk = NeighborWalk(accum_init=..., accumulate=fn, symmetric=False)
    out = walk.run(tree, payload_sorted, target_ipos, target_radius,
                   target_extra, boxsize)

accumulate(carry, target_extra, tpos_f, src, dist, r2, live) -> carry
  * src: pytree chunk of the sorted payload ([K] leaves)
  * dist: [K,3] minimum-image vector pointing from source to target
    (reference get_distance convention: input.Pos - other.Pos)
  * live: [K] bool — in-range validity mask (range only; the radius cut
    is the accumulator's job, matching ngbiter semantics)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .tree import Octree
from ..core.particles import POS_SCALE

CHUNK = 64


class TreeTooShallow(RuntimeError):
    """A blocked neighbour walk hit a leaf with more than ncrit rows
    (bottom-level overflow): the caller must rebuild the octree with
    more levels and retry, or neighbours go missing silently."""


def _slice_payload(payload, start, size):
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, start, size, axis=0),
        payload)


def _pad_payload(payload, pad):
    def _pad(a):
        w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, w)
    return jax.tree_util.tree_map(_pad, payload)


def _nearest(d, boxsize):
    return d - boxsize * jnp.round(d / boxsize)


def run_walk(tree: Octree, payload, target_ipos, target_radius,
             target_extra, carry0, accumulate, boxsize: float,
             symmetric: bool = False):
    """Functional form of the neighbor walk (see module docstring).

    carry0: pytree of per-target initial accumulators, leading dim T.
    """
    payload_p = _pad_payload(payload, CHUNK)
    to_f = jnp.float32(boxsize / POS_SCALE)

    def one_target(tipos, radius, extra, carry_init):
        tpos = tipos.astype(jnp.float32) * to_f

        def leaf_chunks(pstart, pcount, carry):
            nchunk = (pcount + CHUNK - 1) // CHUNK

            def chunk_body(c, carry):
                s = pstart + c * CHUNK
                src = _slice_payload(payload_p, s, CHUNK)
                live = (jnp.arange(CHUNK) + c * CHUNK) < pcount
                dist = (tipos[None, :] - src["ipos"]).astype(
                    jnp.int32).astype(jnp.float32) * to_f
                r2 = jnp.sum(dist * dist, axis=-1)
                return accumulate(carry, extra, tpos, src, dist, r2,
                                  live)

            return jax.lax.fori_loop(0, nchunk, chunk_body, carry)

        def body(state):
            no, carry = state
            cen = tree.center[no]
            length = tree.length[no]
            dc = jnp.abs(_nearest(cen - tpos, boxsize))
            dbox = jnp.maximum(dc - 0.5 * length, 0.0)
            d2 = jnp.sum(dbox * dbox)
            r = radius
            if symmetric:
                r = jnp.maximum(radius, tree.hmax[no])
            overlap = d2 < r * r

            is_leaf = tree.child[no] < 0
            do_leaf = overlap & is_leaf
            descend = overlap & (~is_leaf)

            carry = jax.lax.cond(
                do_leaf,
                lambda c: leaf_chunks(tree.pstart[no], tree.pcount[no],
                                      c),
                lambda c: c,
                carry)
            no_next = jnp.where(descend, tree.child[no],
                                tree.sibling[no])
            return no_next, carry

        def cond(state):
            return state[0] >= 0

        _, carry = jax.lax.while_loop(cond, body,
                                      (tree.root_child, carry_init))
        return carry

    return jax.vmap(one_target)(target_ipos, target_radius,
                                target_extra, carry0)


@partial(jax.jit, static_argnames=("accumulate", "boxsize",
                                   "src_chunk"))
def run_walk_dense(payload, target_ipos, target_extra, carry0,
                   accumulate, boxsize: float, src_chunk: int = 8192):
    """Brute-force oracle: every target against every source, scanned
    over STATIC source chunks — same accumulate protocol (and hence
    identical physics: the radius cut is the accumulator's job).

    Exists because the vmapped tree walk above batches its per-target
    dynamic slices into gathers whose operands XLA stages as
    [T, S, 3] with the 3 minor — TPU lane tiling T(8,128) pads 3->128,
    a 42x blowup that OOMs at production sizes even for T=256 overflow
    targets (measured: f32[256,262208,3] -> 34 GB).  Here the source
    slice happens OUTSIDE the target vmap, so the largest materialized
    buffer is [T, src_chunk].  Intended for the small overflow tails
    the blocked/stencil engines flag (the reference re-queues exactly
    such particles per-particle, treewalk2.h:307-362)."""
    n = jax.tree_util.tree_leaves(payload)[0].shape[0]
    nch = (n + src_chunk - 1) // src_chunk
    payload_p = _pad_payload(payload, nch * src_chunk - n)
    to_f = jnp.float32(boxsize / POS_SCALE)

    def chunk_step(carry, c):
        src = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(
                a, c * src_chunk, src_chunk, axis=0), payload_p)
        live0 = (jnp.arange(src_chunk) + c * src_chunk) < n

        def one_target(tipos, extra, cin):
            tpos = tipos.astype(jnp.float32) * to_f
            dist = (tipos[None, :] - src["ipos"]).astype(
                jnp.int32).astype(jnp.float32) * to_f
            r2 = jnp.sum(dist * dist, axis=-1)
            return accumulate(cin, extra, tpos, src, dist, r2, live0)

        carry = jax.vmap(one_target)(target_ipos, target_extra, carry)
        return carry, None

    carry, _ = jax.lax.scan(chunk_step, carry0, jnp.arange(nch))
    return carry


# ---------------------------------------------------------------------------
# Blocked neighbor walk: same accumulate protocol, TPU-native schedule.
#
# The vmapped per-target walk above is the reference-semantics oracle;
# on TPU at production sizes XLA lowers its batched dynamic slices into
# per-target gathers whose operands blow past HBM (a 64^3-gas density
# walk tried to stage a [262144, 262208, 3] u32 operand).  The blocked
# engine reuses ops/blockwalk.py exactly like blocked gravity does:
# one conservative traversal per Morton block of targets emits a leaf
# interaction list, leaf sources are gathered once, and every target in
# the block scans the dense [CHUNK]-sliced source table under a mask.


def make_target_blocks(target_ipos, block: int, nb: int, level: int):
    """Group arbitrary targets into Morton blocks, fully on device.
\
    Unlike blockwalk.make_blocks_device this takes raw uint32
    positions (targets need not be tree particles — e.g. the gas
    subset).  Returns (order [T] int32 block-gathered target ordering,
    lane_block [T] int32 flat slot per target, bb_lo/bb_hi [nb,3],
    overflow bool).  Blocks never straddle a level-`level` Morton cell
    so their bboxes stay compact (see make_blocks_from_tree).
    """
    from .morton import morton_key

    T = target_ipos.shape[0]
    keys = morton_key(target_ipos)
    order = jnp.argsort(keys).astype(jnp.int32)
    ipos_o = target_ipos[order]
    gid = morton_key(ipos_o) >> jnp.uint32(30 - 3 * level)

    idx = jnp.arange(T, dtype=jnp.int32)
    newcell = jnp.concatenate([jnp.ones(1, bool), gid[1:] != gid[:-1]])
    cellstart = jax.lax.cummax(jnp.where(newcell, idx, 0))
    rank = idx - cellstart
    bflag = newcell | (rank % block == 0)
    bid = jnp.cumsum(bflag.astype(jnp.int32)) - 1
    blockstart = jax.lax.cummax(jnp.where(bflag, idx, 0))
    lane = idx - blockstart

    overflow = bid[-1] >= nb
    sbid = jnp.minimum(bid, nb - 1)
    flat = sbid * block + lane
    to_f = jnp.float32(1.0 / (2.0 ** 32))
    posf = ipos_o.astype(jnp.float32)
    big = jnp.float32(3.4e38)
    bb_lo = jnp.full((nb, 3), big, jnp.float32).at[sbid].min(
        posf, mode="promise_in_bounds")
    bb_hi = jnp.full((nb, 3), -big, jnp.float32).at[sbid].max(
        posf, mode="promise_in_bounds")
    empty = bb_lo[:, 0] >= big
    bb_lo = jnp.where(empty[:, None], 0.0, bb_lo)
    bb_hi = jnp.where(empty[:, None], 0.0, bb_hi)
    return order, flat, bb_lo, bb_hi, overflow


@partial(jax.jit, static_argnames=("accumulate", "boxsize", "symmetric",
                                   "block", "maxl", "ncrit", "level",
                                   "nb", "block_batch", "eval_chunk"))
def run_walk_blocked(tree: Octree, payload, target_ipos, target_radius,
                     target_extra, carry0, accumulate, boxsize: float,
                     symmetric: bool = False, block: int = 64,
                     maxl: int = 256, ncrit: int = 32, level: int = 4,
                     nb: int = 1024, block_batch: int = 128,
                     eval_chunk: int = 256):
    """Blocked form of run_walk (identical accumulate protocol).

    Returns (carry_out in original target order, info dict with
    'block_overflow' and 'list_overflow' scalars — callers grow `nb`
    or `maxl` and retry if set).
    """
    from .blockwalk import block_traverse, gather_leaf_sources

    T = target_ipos.shape[0]
    order, flat, bb_lo, bb_hi, b_ovf = make_target_blocks(
        target_ipos, block, nb, level)
    to_f = jnp.float32(boxsize / POS_SCALE)

    # scatter target data into [nb*block] slots (empty slots inert)
    def to_slots(a, fill=0):
        out = jnp.full((nb * block,) + a.shape[1:],
                       jnp.asarray(fill, a.dtype))
        return out.at[flat].set(a[order], mode="promise_in_bounds")

    slot_valid = jnp.zeros(nb * block, bool).at[flat].set(
        True, mode="promise_in_bounds")
    tipos_b = to_slots(target_ipos).reshape(nb, block, 3)
    rad_b = to_slots(target_radius).reshape(nb, block)
    extra_b = jax.tree_util.tree_map(
        lambda a: to_slots(a).reshape((nb, block) + a.shape[1:]),
        target_extra)
    carry_b = jax.tree_util.tree_map(
        lambda a: to_slots(a).reshape((nb, block) + a.shape[1:]),
        carry0)
    valid_b = slot_valid.reshape(nb, block)

    block_rad = jnp.max(jnp.where(valid_b, rad_b, 0.0), axis=1)
    # scale bboxes to internal length units for the traversal
    bb_lo = bb_lo * to_f
    bb_hi = bb_hi * to_f

    lists = block_traverse(
        tree, bb_lo, bb_hi, block_rad, jnp.zeros(nb, jnp.float32),
        boxsize, 0.0, 0.0, 1, maxi=8, maxl=maxl, mode="neighbor",
        symmetric=symmetric)

    bb = min(block_batch, nb)
    while nb % bb:
        bb //= 2
    nbatch = nb // bb
    total_src = maxl * ncrit
    # eval chunk: bigger slabs mean fewer sequential device kernels —
    # the dense eval is launch-bound, not FLOP-bound, on this chip
    ech = eval_chunk
    while total_src % ech:
        ech //= 2

    def eval_batch(args):
        leaf_ids, tipos, rad, extra, carry_init, valid = args
        src_all, src_valid = gather_leaf_sources(tree, leaf_ids, ncrit,
                                                 payload)
        tpos = tipos.astype(jnp.float32) * to_f

        def chunk_body(carry, c):
            src = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_slice_in_dim(
                    a, c * ech, ech, axis=1), src_all)
            live = jax.lax.dynamic_slice_in_dim(
                src_valid, c * ech, ech, axis=1)  # [bb, ech]
            # dist: min-image source->target, uint32-exact wrap
            dist = (tipos[:, :, None, :] - src["ipos"][:, None, :, :]
                    ).astype(jnp.int32).astype(jnp.float32) * to_f
            r2 = jnp.sum(dist * dist, axis=-1)   # [bb, block, CHUNK]
            # vmap accumulate over (batch, lane)
            acc2 = jax.vmap(jax.vmap(
                accumulate,
                in_axes=(0, 0, 0, None, 0, 0, None)),
                in_axes=(0, 0, 0, 0, 0, 0, 0))
            return acc2(carry, extra, tpos, src, dist, r2, live), None

        carry_end, _ = jax.lax.scan(chunk_body, carry_init,
                                    jnp.arange(total_src // ech))
        # inert (padding) lanes keep their initial carry: their radius
        # is 0, and accumulators may divide by it (hsml) — mask, don't
        # trust w=0 to kill the NaNs
        return jax.tree_util.tree_map(
            lambda new, init: jnp.where(
                valid.reshape(valid.shape + (1,) * (new.ndim - 2)),
                new, init),
            carry_end, carry_init)

    batched = (
        lists.leaf_ids.reshape(nbatch, bb, maxl),
        tipos_b.reshape(nbatch, bb, block, 3),
        rad_b.reshape(nbatch, bb, block),
        jax.tree_util.tree_map(
            lambda a: a.reshape((nbatch, bb, block) + a.shape[2:]),
            extra_b),
        jax.tree_util.tree_map(
            lambda a: a.reshape((nbatch, bb, block) + a.shape[2:]),
            carry_b),
        valid_b.reshape(nbatch, bb, block),
    )
    carry_out_b = jax.lax.map(eval_batch, batched)

    # back to original target order
    def from_slots(a):
        a = a.reshape((nb * block,) + a.shape[3:])
        picked = a[flat]                      # [T] in sorted order
        out = jnp.zeros((T,) + a.shape[1:], a.dtype)
        return out.at[order].set(picked, mode="promise_in_bounds")

    carry_out = jax.tree_util.tree_map(from_slots, carry_out_b)
    # leaves holding more than ncrit rows get TRUNCATED by
    # gather_leaf_sources — silent missing neighbours.  Flag it so the
    # caller rebuilds a deeper tree (gravity tolerates it; SPH cannot).
    safe_l = jnp.maximum(lists.leaf_ids, 0)
    pc = jnp.where(lists.leaf_ids >= 0, tree.pcount[safe_l], 0)
    # per-target overflow: which targets sat in a block whose list
    # overflowed (callers can re-do just those with the per-particle
    # oracle instead of growing caps without bound)
    ovf_slot = jnp.repeat(lists.overflow, block)      # [nb*block]
    tovf = from_slots(ovf_slot)
    info = {"block_overflow": b_ovf,
            "list_overflow": jnp.any(lists.overflow),
            "leaf_truncated": jnp.any(pc > ncrit),
            "target_overflow": tovf}
    return carry_out, info
