"""Block-based tree traversal: the TPU-native treewalk engine.

The per-particle sibling walk (treewalk.py) is the reference semantics,
but its vmapped dynamic slices force XLA to materialize a
[targets x sources] broadcast on TPU.  This engine restructures the walk
the way GPU tree codes do (Bonsai-style), which is also the right shape
for the MXU/VPU:

  1. Targets are grouped into Morton-contiguous BLOCKS (compact bboxes).
  2. ONE traversal per block (vmap over blocks, ~N/BLOCK lanes): the
     opening test is made conservatively against the block bbox, so an
     accepted node is valid as a monopole for every target in the block.
     The traversal only emits per-block interaction LISTS:
       * node_ids: monopole-accepted nodes      (cap MAXI)
       * leaf_ids: leaves that must be opened   (cap MAXL)
  3. Dense evaluation: node/leaf data are gathered by index list
     (embedding-lookup pattern) and every target in the block interacts
     with every list entry under a mask — regular [BLOCK x CAP] VPU math,
     no data-dependent memory access in the inner loop.

Accuracy: the block MAC is conservative (a node is accepted only if NO
target would open it under the per-particle criterion), so forces are at
least as accurate as the reference walk.  Cost: more opened nodes; the
dense evaluation eats the slack.

Caps overflowing is detected and returned (callers grow caps and retry).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .tree import Octree
from ..core.particles import POS_SCALE


def _nearest(d, boxsize):
    return d - boxsize * jnp.round(d / boxsize)


def _bbox_dist(bb_lo, bb_hi, point, boxsize):
    """Per-dim minimum-image distance from an AABB to a point."""
    c = 0.5 * (bb_lo + bb_hi)
    half = 0.5 * (bb_hi - bb_lo)
    d = jnp.abs(_nearest(point - c, boxsize))
    return jnp.maximum(d - half, 0.0)


class BlockLists(NamedTuple):
    node_ids: jax.Array   # [B, MAXI] int32 (monopole nodes)
    n_nodes: jax.Array    # [B]
    leaf_ids: jax.Array   # [B, MAXL] int32 (leaves to open)
    n_leaves: jax.Array   # [B]
    overflow: jax.Array   # [B] bool


@partial(jax.jit, static_argnames=("maxi", "maxl", "mode", "symmetric"))
def block_traverse(tree: Octree, bb_lo, bb_hi, block_radius, block_aold,
                   boxsize, rcut: float, bh2: float, use_bh: int,
                   maxi: int = 1024, maxl: int = 1024,
                   mode: str = "gravity", symmetric: bool = False):
    """Traverse once per target block.

    bb_lo/bb_hi: [B,3] block bounding boxes (internal units).
    block_radius: [B] neighbor-search radius (mode='neighbor').
    block_aold: [B] min over block of ErrTol*OldAcc (mode='gravity').
    """
    # ONE interleaved node-row gather per walk step instead of six
    # 4-byte gathers: random small gathers are the walk's unit cost
    # on TPU (~0.4 GB/s), so row width is nearly free.  int32 carrier:
    # raw bits masquerading as f32 get NaN-canonicalized / denormal-
    # flushed on TPU (int ids ARE denormal patterns)
    icast = partial(jax.lax.bitcast_convert_type,
                    new_dtype=jnp.int32)
    fcast = partial(jax.lax.bitcast_convert_type,
                    new_dtype=jnp.float32)
    cols = [icast(tree.center), icast(tree.length)[:, None],
            icast(tree.cofm), icast(tree.mass)[:, None],
            tree.child[:, None], tree.sibling[:, None]]
    if mode != "gravity" and symmetric:
        cols.append(icast(tree.hmax)[:, None])
    inter = jnp.concatenate(cols, axis=1)

    def one_block(lo, hi, radius, aold):
        def body(state):
            no, nn, nl, nodes, leaves, ovf = state
            row = inter[no]
            cen = fcast(row[0:3])
            length = fcast(row[3])
            cofm = fcast(row[4:7])
            nmass = fcast(row[7])
            child_no = row[8]
            sib_no = row[9]

            dbox = _bbox_dist(lo, hi, cen, boxsize)  # bbox -> cell center
            # distance from bbox to node cell (box-to-box)
            dcell = jnp.maximum(dbox - 0.5 * length, 0.0)

            if mode == "gravity":
                # discard: no pair between the block bbox and any
                # particle inside the node cube can be within rcut
                # (box-to-box minimum distance; tighter and safe,
                # unlike a per-dim-only test which leaks diagonals)
                dmin_com = _bbox_dist(lo, hi, cofm, boxsize)
                r2min = jnp.sum(dmin_com ** 2)
                discard = jnp.sum(dcell ** 2) > rcut * rcut

                # conservative opening: any target might open
                open_acc = (use_bh == 0) & (
                    nmass * length * length
                    > jnp.maximum(r2min, 1e-35) ** 2 * aold)
                open_bh = length * length > r2min * bh2
                # inside test: bbox overlaps the 0.6*len cube
                inside = jnp.all(dbox < 0.6 * length)
                open_node = open_acc | open_bh | inside
                open_node = open_node & (~discard)
                accept = (~discard) & (~open_node) & (nmass > 0)
            else:
                r = radius
                if symmetric:
                    r = jnp.maximum(radius, fcast(row[10]))
                overlap = jnp.sum(dcell ** 2) < r * r
                discard = ~overlap
                open_node = overlap
                accept = jnp.zeros((), bool)

            # massless subtrees hold no alive sources — cull like the
            # BFS traversal's lane &= nmass > 0 (the all-dead sentinel
            # run is now a LEVEL-1 leaf since pcount went alive-only,
            # and its box/2 cell would otherwise land in nearly every
            # block's list)
            open_node = open_node & (nmass > 0)
            accept = accept & (nmass > 0)
            is_leaf = child_no < 0
            take_leaf = open_node & is_leaf
            descend = open_node & (~is_leaf)

            nodes = jax.lax.cond(
                accept & (nn < maxi),
                lambda a: a.at[nn].set(no), lambda a: a, nodes)
            leaves = jax.lax.cond(
                take_leaf & (nl < maxl),
                lambda a: a.at[nl].set(no), lambda a: a, leaves)
            ovf = ovf | (accept & (nn >= maxi)) | (take_leaf
                                                   & (nl >= maxl))
            nn = nn + accept.astype(jnp.int32)
            nl = nl + take_leaf.astype(jnp.int32)

            no_next = jnp.where(descend, child_no, sib_no)
            return no_next, nn, nl, nodes, leaves, ovf

        init = (tree.root_child, jnp.int32(0), jnp.int32(0),
                jnp.full(maxi, -1, jnp.int32),
                jnp.full(maxl, -1, jnp.int32),
                jnp.zeros((), bool))
        out = jax.lax.while_loop(lambda s: s[0] >= 0, body, init)
        _, nn, nl, nodes, leaves, ovf = out
        return nodes, nn, leaves, nl, ovf

    nodes, nn, leaves, nl, ovf = jax.vmap(one_block)(
        bb_lo, bb_hi, block_radius, block_aold)
    return BlockLists(node_ids=nodes, n_nodes=nn, leaf_ids=leaves,
                      n_leaves=nl, overflow=ovf)


def make_blocks(tree: Octree, n_targets: int, block: int, boxsize):
    """Group the first n_targets sorted particles into blocks.

    Returns (bb_lo [B,3], bb_hi [B,3], nblocks, pad_n).  Targets are the
    tree-sorted particles themselves (blocks are Morton runs).  The
    final partial block is padded with repeats of the last particle.
    """
    n = n_targets
    nblocks = (n + block - 1) // block
    pad_n = nblocks * block
    to_f = jnp.float32(boxsize / POS_SCALE)
    idx = jnp.minimum(jnp.arange(pad_n), n - 1)
    pos = tree.ipos_s[idx].astype(jnp.float32) * to_f
    pos = pos.reshape(nblocks, block, 3)
    # Morton runs never wrap the box, so plain min/max bboxes are valid
    bb_lo = jnp.min(pos, axis=1)
    bb_hi = jnp.max(pos, axis=1)
    return bb_lo, bb_hi, nblocks, pad_n


@partial(jax.jit, static_argnames=("block", "level", "nb"))
def make_blocks_device(tree: Octree, tgt_idx_sorted, tgt_valid,
                       block: int, level: int, nb: int, boxsize):
    """Cell-anchored target blocks, fully on device.

    The device-side version of make_blocks_from_tree: no host
    transfer of positions, no data-dependent output shape — callers
    pass a static block capacity `nb` and check the returned overflow
    flag (one scalar) instead.

    tgt_idx_sorted: [T] int32 target rows (indices into the SORTED
    particle arrays) in ascending sorted order; tgt_valid: [T] bool.
    Invalid rows group into their own trailing blocks.

    Returns (bb_lo [nb,3], bb_hi [nb,3], tgt_idx [nb,block],
    tgt_valid [nb,block], overflow scalar bool).
    """
    from .morton import morton_key

    T = tgt_idx_sorted.shape[0]
    ipos = tree.ipos_s[tgt_idx_sorted]
    gid = morton_key(ipos) >> jnp.uint32(30 - 3 * level)
    gid = jnp.where(tgt_valid, gid, jnp.uint32(0xFFFFFFFF))

    idx = jnp.arange(T, dtype=jnp.int32)
    newcell = jnp.concatenate(
        [jnp.ones(1, bool), gid[1:] != gid[:-1]])
    cellstart = jax.lax.cummax(jnp.where(newcell, idx, 0))
    rank = idx - cellstart
    bflag = newcell | (rank % block == 0)
    bid = jnp.cumsum(bflag.astype(jnp.int32)) - 1
    blockstart = jax.lax.cummax(jnp.where(bflag, idx, 0))
    lane = idx - blockstart

    overflow = bid[-1] >= nb
    sbid = jnp.minimum(bid, nb - 1)
    flat = sbid * block + lane
    tgt_idx_b = jnp.zeros(nb * block, jnp.int32).at[flat].set(
        tgt_idx_sorted, mode="promise_in_bounds")
    valid_b = jnp.zeros(nb * block, bool).at[flat].set(
        tgt_valid, mode="promise_in_bounds")

    to_f = jnp.float32(boxsize / POS_SCALE)
    posf = ipos.astype(jnp.float32) * to_f
    big = jnp.float32(3.4e38)
    lo_in = jnp.where(tgt_valid[:, None], posf, big)
    hi_in = jnp.where(tgt_valid[:, None], posf, -big)
    bb_lo = jnp.full((nb, 3), big, jnp.float32).at[sbid].min(
        lo_in, mode="promise_in_bounds")
    bb_hi = jnp.full((nb, 3), -big, jnp.float32).at[sbid].max(
        hi_in, mode="promise_in_bounds")
    empty = bb_lo[:, 0] >= big
    bb_lo = jnp.where(empty[:, None], 0.0, bb_lo)
    bb_hi = jnp.where(empty[:, None], 0.0, bb_hi)
    return (bb_lo, bb_hi, tgt_idx_b.reshape(nb, block),
            valid_b.reshape(nb, block), overflow)


def auto_block_level(T: int, block: int) -> int:
    """~4 blocks per occupied cell on average (host, static)."""
    import math
    return max(1, min(8, round(math.log(max(T, 8)
                                        / (4.0 * block), 8))))


def make_blocks_from_tree(tree: Octree, n_targets: int, block: int,
                          boxsize, level: int = None):
    """Cell-anchored target blocks (host-side).

    A fixed-size Morton RUN can straddle a high-level cell boundary
    and get a bounding box spanning a large fraction of the box, which
    blows up its interaction list.  Instead, the sorted particle order
    is split at level-`level` Morton-cell boundaries FIRST (each cell
    owns a contiguous run), and each cell's run is then chunked into
    blocks of up to `block` particles.  A block's particles all lie in
    one cell, so its min/max bbox is at most one cell wide — compact
    by construction — while lanes stay as full as the occupancy
    allows.

    Returns (bb_lo [B,3], bb_hi [B,3], tgt_idx [B,block] int32 into
    the sorted particle arrays, tgt_valid [B,block] bool, nblocks)
    with B padded to a power of two (empty blocks have tgt_valid all
    False and a point bbox at the origin).
    """
    n = tree.ipos_s.shape[0]
    nt = min(n_targets, n)
    if level is None:
        # ~4 blocks per cell on average
        import math
        level = max(1, min(8, round(math.log(max(nt, 8)
                                             / (4.0 * block), 8))))
    shift = np.uint32(32 - level)
    ipos = np.asarray(tree.ipos_s[:nt])
    cx = (ipos[:, 0] >> shift).astype(np.int64)
    cy = (ipos[:, 1] >> shift).astype(np.int64)
    cz = (ipos[:, 2] >> shift).astype(np.int64)
    gid = (cx << 42) | (cy << 21) | cz

    # contiguous runs of equal cell id (Morton order groups cells)
    bnd = np.nonzero(np.concatenate([[True], gid[1:] != gid[:-1]]))[0]
    g_start = bnd
    g_count = np.diff(np.concatenate([bnd, [nt]]))

    nchunk = (g_count + block - 1) // block
    total = int(nchunk.sum())
    nb = max(_next_pow2_bw(total), 1)

    row = np.repeat(np.arange(len(g_start)), nchunk)
    off = (np.arange(total)
           - np.repeat(np.cumsum(nchunk) - nchunk, nchunk)) * block
    starts = np.zeros(nb, np.int64)
    counts = np.zeros(nb, np.int64)
    starts[:total] = g_start[row] + off
    counts[:total] = np.minimum(g_count[row] - off, block)

    tgt_idx = starts[:, None] + np.arange(block)[None, :]
    tgt_valid = np.arange(block)[None, :] < counts[:, None]
    tgt_idx = np.clip(tgt_idx, 0, n - 1).astype(np.int32)

    # tight per-block particle bboxes (all within one level cell)
    to_f = boxsize / float(POS_SCALE)
    posf = ipos.astype(np.float64) * to_f
    pb = posf[np.clip(tgt_idx, 0, nt - 1)]
    big = np.where(tgt_valid[..., None], pb, -np.inf).max(axis=1)
    small = np.where(tgt_valid[..., None], pb, np.inf).min(axis=1)
    empty = ~tgt_valid.any(axis=1)
    bb_lo = np.where(empty[:, None], 0.0, small).astype(np.float32)
    bb_hi = np.where(empty[:, None], 0.0, big).astype(np.float32)
    return (jnp.asarray(bb_lo), jnp.asarray(bb_hi),
            jnp.asarray(tgt_idx), jnp.asarray(tgt_valid), nb)


def _next_pow2_bw(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def gather_leaf_sources(tree: Octree, leaf_ids, ncrit: int, payload):
    """[B, MAXL] leaf ids -> per-leaf-slot source data.

    Returns pytree with leaves [B, MAXL * ncrit, ...] plus a validity
    mask.  Leaf particle ranges are (pstart, pcount<=ncrit after the
    build's is_leaf rule; bottom-level leaves may exceed ncrit and are
    truncated — callers should build deep enough trees).
    """
    B, maxl = leaf_ids.shape
    safe = jnp.maximum(leaf_ids, 0)
    pstart = tree.pstart[safe]          # [B, MAXL]
    pcount = jnp.where(leaf_ids >= 0, tree.pcount[safe], 0)
    offs = jnp.arange(ncrit, dtype=jnp.int32)
    idx = pstart[..., None] + offs[None, None, :]    # [B, MAXL, ncrit]
    valid = offs[None, None, :] < pcount[..., None]
    n = tree.ipos_s.shape[0]
    idx = jnp.clip(idx, 0, n - 1).reshape(B, maxl * ncrit)
    valid = valid.reshape(B, maxl * ncrit)
    src = jax.tree_util.tree_map(lambda a: a[idx], payload)
    return src, valid


@partial(jax.jit, static_argnames=("maxi", "maxl", "mode", "symmetric",
                                   "fcap", "start_level", "nlevels"))
def block_traverse_bfs(tree: Octree, bb_lo, bb_hi, block_radius,
                       block_aold, boxsize, rcut: float, bh2: float,
                       use_bh: int, maxi: int = 1024,
                       maxl: int = 1024, mode: str = "gravity",
                       symmetric: bool = False, fcap: int = 2048,
                       start_level: int = 2, nlevels: int = 20):
    """Level-synchronous (frontier) form of block_traverse.

    The sequential sibling walk visits one node per while-loop step —
    ~10^3 dependent iterations per block, each a tiny gather: latency-
    bound on TPU.  Here every block advances a whole LEVEL per step:
    the frontier [B, F] is tested vectorized, descending nodes expand
    to their children with the scatter-boundaries + cummax-fill
    compaction (children of ascending parents are ascending contiguous
    ranges, so v = child_start - excl is nondecreasing), and accepted
    monopoles / opened leaves are scattered to the output lists at
    running per-block offsets.  ~nlevels sequential steps total.

    Emission order is level-major (NOT the DFS tree order): leaf lists
    are sorted by node id afterwards so downstream consumers (the
    refined evaluator's monotone-pstart packing) see Morton order.

    Returns (BlockLists, frontier_overflow scalar bool).  Caller grows
    `fcap` and retries on frontier overflow, like the list caps.
    """
    B = bb_lo.shape[0]
    icast = partial(jax.lax.bitcast_convert_type, new_dtype=jnp.int32)
    fcast = partial(jax.lax.bitcast_convert_type,
                    new_dtype=jnp.float32)
    # interleaved per-node row: center(3) len cofm(3) mass child
    # nchild hmax pad -> 12 int32 columns
    inter = jnp.concatenate(
        [icast(tree.center), icast(tree.length)[:, None],
         icast(tree.cofm), icast(tree.mass)[:, None],
         tree.child[:, None], tree.nchild[:, None],
         icast(tree.hmax)[:, None],
         jnp.zeros((tree.center.shape[0], 1), jnp.int32)], axis=1)

    c_bb = 0.5 * (bb_lo + bb_hi)              # [B, 3]
    h_bb = 0.5 * (bb_hi - bb_lo)

    # initial frontier: all level-`start_level` cells reachable from
    # the root (their ids are contiguous by level-major construction)
    from .tree import _level_caps
    n = tree.ipos_s.shape[0]
    caps = _level_caps(n, nlevels, 1)
    off = int(np.concatenate([[0], np.cumsum(caps)])[start_level])
    f0 = min(caps[start_level], fcap)
    fr = (off + jnp.arange(f0, dtype=jnp.int32))[None, :].repeat(B, 0)
    fr = jnp.where(tree.valid[jnp.maximum(fr, 0)] & (fr >= 0), fr, -1)

    node_ids = jnp.full((B, maxi), -1, jnp.int32)
    leaf_ids = jnp.full((B, maxl), -1, jnp.int32)
    nn = jnp.zeros(B, jnp.int32)
    nl = jnp.zeros(B, jnp.int32)
    ovf = jnp.zeros((), bool)       # frontier overflow (grow fcap)
    lovf = jnp.zeros((), bool)      # list overflow (grow maxi/maxl)
    rowi = jnp.arange(B, dtype=jnp.int32)[:, None]

    def emit(out, count, ids, mask, cap):
        """Append masked ids (ascending within the level) to out."""
        ecnt = mask.astype(jnp.int32)
        excl = jnp.cumsum(ecnt, axis=1) - ecnt
        dst = jnp.where(mask, count[:, None] + excl, cap)
        dst = jnp.minimum(dst, cap)
        flat = rowi * (cap + 1) + dst
        buf = jnp.concatenate([out, jnp.full((B, 1), -1, jnp.int32)],
                              axis=1)
        buf = buf.reshape(-1).at[flat.reshape(-1)].set(
            ids.reshape(-1), mode="promise_in_bounds")
        new_count = count + jnp.sum(ecnt, axis=1)
        over = jnp.any(new_count > cap)
        return buf.reshape(B, cap + 1)[:, :cap], new_count, over

    F = f0
    for level in range(start_level, nlevels + 1):
        row = inter[jnp.maximum(fr, 0)]        # [B, F, 12]
        lane = fr >= 0
        cen = fcast(row[:, :, 0:3])
        length = fcast(row[:, :, 3])
        cofm = fcast(row[:, :, 4:7])
        nmass = fcast(row[:, :, 7])
        child = row[:, :, 8]
        nch = row[:, :, 9]
        lane = lane & (nmass > 0)

        d = cen - c_bb[:, None, :]
        d = d - boxsize * jnp.round(d / boxsize)
        dbox = jnp.maximum(jnp.abs(d) - h_bb[:, None, :], 0.0)
        dcell = jnp.maximum(dbox - 0.5 * length[..., None], 0.0)

        if mode == "gravity":
            dm = cofm - c_bb[:, None, :]
            dm = dm - boxsize * jnp.round(dm / boxsize)
            dmin = jnp.maximum(jnp.abs(dm) - h_bb[:, None, :], 0.0)
            r2min = jnp.sum(dmin * dmin, axis=-1)
            discard = jnp.sum(dcell * dcell, axis=-1) > rcut * rcut
            open_acc = (use_bh == 0) & (
                nmass * length * length
                > jnp.maximum(r2min, 1e-35) ** 2
                * block_aold[:, None])
            open_bh = length * length > r2min * bh2
            inside = jnp.all(dbox < 0.6 * length[..., None], axis=-1)
            open_node = (open_acc | open_bh | inside) & (~discard)
            accept = lane & (~discard) & (~open_node)
        else:
            r = block_radius[:, None]
            if symmetric:
                r = jnp.maximum(r, fcast(row[:, :, 10]))
            overlap = jnp.sum(dcell * dcell, axis=-1) < r * r
            open_node = overlap
            accept = jnp.zeros_like(lane) & False

        is_leaf = child < 0
        take_leaf = lane & open_node & is_leaf
        descend = lane & open_node & (~is_leaf)

        if mode == "gravity":
            node_ids, nn, o1 = emit(node_ids, nn, fr, accept, maxi)
            lovf = lovf | o1
        leaf_ids, nl, o2 = emit(leaf_ids, nl, fr, take_leaf, maxl)
        lovf = lovf | o2

        if level == nlevels:
            break
        # expand: children of descending nodes -> next frontier
        Fn = min(fcap, 8 * F)
        cnt = jnp.where(descend, nch, 0)
        cum = jnp.cumsum(cnt, axis=1)
        excl = cum - cnt
        total = cum[:, -1]
        ovf = ovf | jnp.any(total > Fn)
        v = jnp.where(cnt > 0, child - excl, 0)
        dst = jnp.where(cnt > 0, jnp.minimum(excl, Fn), Fn)
        flat = rowi * (Fn + 1) + dst
        buf = jnp.zeros(B * (Fn + 1), jnp.int32).at[
            flat.reshape(-1)].max(v.reshape(-1),
                                  mode="promise_in_bounds")
        vf = jax.lax.cummax(buf.reshape(B, Fn + 1)[:, :Fn], axis=1)
        p = jnp.arange(Fn, dtype=jnp.int32)[None, :]
        fr = jnp.where(p < total[:, None], vf + p, -1)
        F = Fn

    # the refined evaluator's cummax packing needs leaf lists in
    # MORTON (pstart-monotone) order; level-major emission is not —
    # sort each block's leaves by pstart (disjoint ranges, no ties).
    # Node monopole order is irrelevant (pure sum), left as emitted.
    pkey = jnp.where(leaf_ids >= 0,
                     tree.pstart[jnp.maximum(leaf_ids, 0)],
                     jnp.int32(2 ** 30))
    _, leaf_ids = jax.lax.sort((pkey, leaf_ids), dimension=1,
                               num_keys=1)
    lists = BlockLists(node_ids=node_ids, n_nodes=nn,
                       leaf_ids=leaf_ids, n_leaves=nl,
                       overflow=jnp.zeros(B, bool) | lovf)
    return lists, ovf
