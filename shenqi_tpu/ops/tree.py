"""SoA octree over Morton-sorted particles (the forcetree.cpp analog).

TPU-first redesign of the reference's pointer octree
(libgadget/forcetree.cpp): particles are sorted by Morton key once per
rebuild; every octree cell is then a contiguous index range, so the
whole tree is built level-by-level with segmented scans — no pointer
chasing, no insertion, fully vectorized:

  level l:  prefix  p = key >> 3(D-l)
            run starts  f_i = [p_i != p_{i-1}]
            segment id  s_i = cumsum(f) - 1       (dense cell index!)
            monopoles   segment_sum(mass), segment_sum(mass*pos)
            ranges      pstart from run starts, pcount by segment_sum
            children    contiguous in the next level's segment ids

Traversal uses the same sibling/first-child linked order as the
reference's walk (forcetree.h:29-66), precomputed per level.

Nodes whose parent already satisfies pcount <= ncrit are retained in the
arrays (static shapes) but never visited: the parent is marked leaf.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .morton import morton_key, key_to_cell, MAX_DEPTH
from ..core.particles import POS_SCALE


@jax.tree_util.register_dataclass
@dataclass
class Octree:
    """Flat SoA octree.  [M] node arrays, level-major order."""

    # geometry (internal length units)
    center: jax.Array      # [M,3] f32 geometric cell center
    length: jax.Array      # [M]   f32 cell side length
    # moments
    cofm: jax.Array        # [M,3] f32 center of mass
    mass: jax.Array        # [M]   f32 total mass
    hmax: jax.Array        # [M]   f32 max smoothing length (SPH walks)
    # particle range (indices into the sorted arrays)
    pstart: jax.Array      # [M] i32
    pcount: jax.Array      # [M] i32
    # topology
    child: jax.Array       # [M] i32 first child node id (-1 if leaf)
    nchild: jax.Array      # [M] i32 child count (children contiguous)
    canon: jax.Array       # [M] bool leaf whose parent is NOT a leaf
                           # (the only leaves a walk can stop at;
                           # deeper nested copies are unreachable)
    sibling: jax.Array     # [M] i32 next node when skipping subtree (-1 end)
    is_leaf: jax.Array     # [M] bool (pcount <= ncrit or max depth)
    valid: jax.Array       # [M] bool (occupied cell)
    # sorted particle data
    order: jax.Array       # [N] i32 sort permutation (sorted <- original)
    ipos_s: jax.Array      # [N,3] uint32 sorted positions
    mass_s: jax.Array      # [N]  f32 sorted masses (0 for dead)
    root_child: jax.Array  # i32: first node of level 1 (walk entry)


def _level_caps(n: int, nlevels: int, ncrit: int):
    """Static per-level node caps: min(8^l, n+1).

    (The construction does not prune below small cells, so every level
    can hold up to one run per particle, plus one run of dead slots.)
    """
    return [int(min(8 ** l, n + 1)) for l in range(nlevels + 1)]


@partial(jax.jit, static_argnames=("nlevels", "ncrit"))
def build_octree(ipos, mass, alive, boxsize, nlevels: int = 8,
                 ncrit: int = 32, hsml=None) -> Octree:
    """Build the octree.  Dead particles sort to the end with zero mass."""
    n = ipos.shape[0]
    deep = nlevels > MAX_DEPTH
    if deep:
        from .morton import morton_key_pair
        khi, klo = morton_key_pair(ipos)
        # dead particles: sentinel above the 30-bit range in BOTH words
        khi = jnp.where(alive, khi, jnp.uint32(0xFFFFFFFF))
        klo = jnp.where(alive, klo, jnp.uint32(0xFFFFFFFF))
        order = jnp.lexsort((klo, khi)).astype(jnp.int32)
        keys_s = khi[order]
        keys_lo_s = klo[order]
    else:
        keys = morton_key(ipos)
        # dead particles get a key above the 30-bit range so they form
        # their own (massless) runs, never colliding with a real cell
        keys = jnp.where(alive, keys, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(keys).astype(jnp.int32)
        keys_s = keys[order]
        keys_lo_s = None
    ipos_s = ipos[order]
    mass_s = jnp.where(alive[order], mass[order], 0.0).astype(jnp.float32)
    alive_s = alive[order]
    hsml_s = (hsml[order].astype(jnp.float32) if hsml is not None
              else jnp.zeros(n, jnp.float32))

    pos_f = ipos_s.astype(jnp.float32) * jnp.float32(boxsize / POS_SCALE)
    mpos = mass_s[:, None] * pos_f
    mhml = jnp.where(alive_s, hsml_s, 0.0)

    caps = _level_caps(n, nlevels, ncrit)
    idx = jnp.arange(n, dtype=jnp.int32)

    # per-level arrays to concatenate
    lvl = {k: [] for k in ("center", "length", "cofm", "mass", "hmax",
                           "pstart", "pcount", "parent", "valid")}
    seg_per_level = []      # per-particle segment id at each level
    nseg_per_level = []     # device scalar: number of segments

    for l in range(nlevels + 1):
        cap = caps[l]
        if l <= MAX_DEPTH:
            pref = keys_s >> jnp.uint32(3 * (MAX_DEPTH - l))
            first = jnp.concatenate([jnp.ones(1, bool),
                                     pref[1:] != pref[:-1]])
        else:
            pref2 = keys_lo_s >> jnp.uint32(3 * (2 * MAX_DEPTH - l))
            first = jnp.concatenate(
                [jnp.ones(1, bool),
                 (keys_s[1:] != keys_s[:-1])
                 | (pref2[1:] != pref2[:-1])])
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # [n]
        seg = jnp.minimum(seg, cap - 1)
        nseg = seg[-1] + 1
        seg_per_level.append(seg)
        nseg_per_level.append(nseg)

        m = jax.ops.segment_sum(mass_s, seg, num_segments=cap)
        cm = jax.ops.segment_sum(mpos, seg, num_segments=cap)
        hm = jax.ops.segment_max(mhml, seg, num_segments=cap)
        # pstart: index of first particle of each run; pcount: ALIVE
        # rows only.  Dead rows sort to the tail under the sentinel
        # key, so real runs contain no dead rows and their counts are
        # unchanged — but the all-dead sentinel run must count 0, or
        # its (box-corner) leaf flags leaf_truncated forever when the
        # dead fraction exceeds ncrit (slab capacity padding + the
        # non-gas rows of a mixed-species SPH tree)
        ps = jax.ops.segment_min(idx, seg, num_segments=cap)
        cnt = jax.ops.segment_sum(alive_s.astype(jnp.int32), seg,
                                  num_segments=cap)
        valid = jnp.arange(cap) < nseg
        ps = jnp.where(valid, ps, n)
        # geometry from the first particle's key prefix
        psc = jnp.clip(ps, 0, n - 1)
        if l <= MAX_DEPTH:
            cell = key_to_cell(keys_s[psc], l)
        else:
            from .morton import key_pair_to_cell
            cell = key_pair_to_cell(keys_s[psc], keys_lo_s[psc], l)
        cell_len = boxsize / (1 << l)
        cen = (cell.astype(jnp.float32) + 0.5) * jnp.float32(cell_len)
        cofm = cm / jnp.maximum(m, 1e-30)[:, None]
        cofm = jnp.where((m > 0)[:, None], cofm, cen)

        lvl["center"].append(cen)
        lvl["length"].append(jnp.full(cap, cell_len, jnp.float32))
        lvl["cofm"].append(cofm)
        lvl["mass"].append(m.astype(jnp.float32))
        lvl["hmax"].append(hm.astype(jnp.float32))
        lvl["pstart"].append(ps)
        lvl["pcount"].append(cnt)
        lvl["valid"].append(valid)
        if l == 0:
            lvl["parent"].append(jnp.full(cap, -1, jnp.int32))
        else:
            parent_seg = seg_per_level[l - 1][jnp.clip(ps, 0, n - 1)]
            lvl["parent"].append(jnp.where(valid, parent_seg, -1))

    # global node ids: level-major
    offsets = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)
    M = int(offsets[-1])

    center = jnp.concatenate(lvl["center"])
    length = jnp.concatenate(lvl["length"])
    cofm = jnp.concatenate(lvl["cofm"])
    massn = jnp.concatenate(lvl["mass"])
    hmax = jnp.concatenate(lvl["hmax"])
    pstart = jnp.concatenate(lvl["pstart"])
    pcount = jnp.concatenate(lvl["pcount"])
    validn = jnp.concatenate(lvl["valid"])

    # leaves: few enough particles, or bottom level
    is_leaf = pcount <= ncrit
    bottom = jnp.zeros(M, bool)
    bottom = bottom.at[offsets[nlevels]:].set(True)
    is_leaf = is_leaf | bottom

    # children: level l cell's children live in level l+1; contiguous by
    # construction.  child_start = first level-(l+1) segment whose parent
    # is this cell; nchild via segment_sum over parents.
    child = jnp.full(M, -1, jnp.int32)
    nchild = jnp.zeros(M, jnp.int32)
    sibling = jnp.full(M, -1, jnp.int32)

    for l in range(nlevels):
        cap, ncap = caps[l], caps[l + 1]
        pl = lvl["parent"][l + 1]          # [ncap] parent seg at level l
        cidx = jnp.arange(ncap, dtype=jnp.int32)
        pl_safe = jnp.where(pl >= 0, pl, cap)
        cstart = jax.ops.segment_min(cidx, pl_safe, num_segments=cap + 1)
        cstart = cstart[:cap]
        has_child = cstart < ncap
        child = child.at[offsets[l]:offsets[l + 1]].set(
            jnp.where(has_child, cstart + offsets[l + 1], -1))
        ccount = jax.ops.segment_sum(jnp.ones(ncap, jnp.int32),
                                     pl_safe, num_segments=cap + 1)
        nchild = nchild.at[offsets[l]:offsets[l + 1]].set(
            jnp.where(has_child, ccount[:cap], 0))

    # sibling ("next") pointers, computed top-down:
    # within a level, node i's sibling is i+1 if it shares the parent,
    # else the parent's sibling.
    for l in range(1, nlevels + 1):
        cap = caps[l]
        off = offsets[l]
        pl = lvl["parent"][l]
        cidx = jnp.arange(cap, dtype=jnp.int32)
        same_parent = jnp.concatenate([pl[1:] == pl[:-1],
                                       jnp.zeros(1, bool)])
        valid_next = jnp.concatenate([lvl["valid"][l][1:],
                                      jnp.zeros(1, bool)])
        next_in_level = jnp.where(same_parent & valid_next,
                                  cidx + 1 + off, -1)
        parent_gid = jnp.where(pl >= 0, pl + offsets[l - 1], 0)
        parent_sib = sibling[parent_gid]
        sib = jnp.where(next_in_level >= 0, next_in_level, parent_sib)
        sibling = sibling.at[off:off + cap].set(sib)

    # nodes below a leaf are unreachable; also mark leaf nodes childless
    child = jnp.where(is_leaf, -1, child)
    nchild = jnp.where(is_leaf, 0, nchild)

    # canonical leaves: is_leaf with a non-leaf parent — the only
    # leaves a traversal can reach (a leaf's subdivided copies at
    # deeper levels are themselves marked is_leaf but unreachable).
    # They partition the particle range; the packed-source table
    # (shortrange_refined.build_quad_table) relies on that.
    parent_g = jnp.full(M, -1, jnp.int32)
    for l in range(1, nlevels + 1):
        pl = lvl["parent"][l]
        parent_g = parent_g.at[offsets[l]:offsets[l + 1]].set(
            jnp.where(pl >= 0, pl + offsets[l - 1], -1))
    parent_leaf = jnp.where(parent_g >= 0,
                            is_leaf[jnp.maximum(parent_g, 0)], False)
    canon = is_leaf & ~parent_leaf & validn

    root_child = child[0]

    return Octree(center=center, length=length, cofm=cofm, mass=massn,
                  hmax=hmax, pstart=pstart, pcount=pcount, child=child,
                  nchild=nchild, canon=canon, sibling=sibling,
                  is_leaf=is_leaf,
                  valid=validn, order=order, ipos_s=ipos_s,
                  mass_s=mass_s, root_child=root_child)
