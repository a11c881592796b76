"""Friends-of-friends halo finder (the fof.cpp analog).

Same definition as the reference (libgadget/fof.cpp): particles within
b = FOFHaloLinkingLength * mean-DM-separation of each other belong to
the same group (primary linking over DM/star types); gas/BH attach to
the group of their nearest primary particle (secondary linking); groups
shorter than FOFHaloMinLength are dropped; group numbers are assigned
by descending length.

TPU redesign of the union-find: instead of lock-free pointer doubling
over an explicit edge stream (fof.cpp:290-482), iterate
  label_i <- min(label_j : r_ij < b)     (a neighbor tree walk)
  label   <- label[label]  (x k)         (pointer jumping / shortcut)
to a fixpoint — the same hooking/shortcutting structure expressed as
whole-array ops.  Labels are particle indices into the FOF target set.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tree import Octree, build_octree
from ..ops.treewalk import run_walk
from ..core.particles import POS_SCALE, ipos_to_float


def _minlabel_accum(carry, extra, tpos, src, dist, r2, live):
    label = carry
    b2 = extra["b2"]
    inside = live & (r2 < b2) & src["alive"]
    cand = jnp.where(inside, src["label"], jnp.uint32(0xFFFFFFFF))
    return jnp.minimum(label, jnp.min(cand))


@partial(jax.jit, static_argnames=())
def _link_pass(tree: Octree, payload, ipos, labels, b, boxsize):
    """One propagation: label_i = min over neighbors within b."""
    t = ipos.shape[0]
    extra = {"b2": jnp.full(t, b * b, jnp.float32)}
    radius = jnp.full(t, b, jnp.float32)
    out = run_walk(tree, payload, ipos, radius, extra, labels,
                   _minlabel_accum, boxsize, symmetric=False)
    return out


@partial(jax.jit)
def _shortcut(labels):
    """Pointer jumping: label = label[label] three times."""
    for _ in range(3):
        labels = labels[labels]
    return labels


def _blocked_neighbor_lists(tree: Octree, b, boxsize, block=128,
                            maxl=512, auto_grow=4):
    """One blocked neighbor traversal shared by all link iterations.

    Returns (tgt_idx, tgt_valid, lists, nblocks) with leaf lists of
    every leaf overlapping each block's bbox inflated by b.
    """
    from ..ops.blockwalk import (make_blocks_from_tree, block_traverse)
    n = tree.ipos_s.shape[0]
    bb_lo, bb_hi, tgt_idx, tgt_valid, nb = make_blocks_from_tree(
        tree, n, block, boxsize)
    radius = jnp.where(jnp.any(tgt_valid, axis=1),
                       jnp.float32(b), 0.0)
    for attempt in range(auto_grow + 1):
        lists = block_traverse(tree, bb_lo, bb_hi, radius,
                               jnp.zeros(nb, jnp.float32), boxsize,
                               0.0, 0.0, 0, maxi=8, maxl=maxl,
                               mode="neighbor")
        if not bool(jnp.any(lists.overflow)):
            break
        if attempt == auto_grow:
            raise RuntimeError(
                f"neighbor traversal overflow: leaves "
                f"{int(jnp.max(lists.n_leaves))}/{maxl}")
        maxl *= 2
    return tgt_idx, tgt_valid, lists, nb


@partial(jax.jit, static_argnames=("ncrit", "block_batch"))
def _blocked_min_label(tree: Octree, tgt_idx, tgt_valid, lists,
                       labels_sorted, alive_sorted, b, boxsize,
                       ncrit: int, block_batch: int = 256):
    """label_i <- min label among sources within b (dense blocked)."""
    from ..ops.blockwalk import gather_leaf_sources
    n = tree.ipos_s.shape[0]
    nb, block = tgt_idx.shape
    maxl = lists.leaf_ids.shape[1]
    to_f = jnp.float32(boxsize / POS_SCALE)
    bb = min(block_batch, nb)
    while nb % bb:
        bb //= 2
    nbatch = nb // bb
    CH = 256
    total_src = maxl * ncrit
    nch = (total_src + CH - 1) // CH

    def eval_batch(args):
        leaf_ids, t_idx, t_val = args
        payload = {"ipos": tree.ipos_s, "label": labels_sorted,
                   "alive": alive_sorted}
        src, valid = gather_leaf_sources(tree, leaf_ids, ncrit,
                                         payload)
        spos = src["ipos"]
        slab = jnp.where(valid & src["alive"], src["label"],
                         jnp.uint32(0xFFFFFFFF))
        tpos = tree.ipos_s[t_idx.reshape(-1)].reshape(bb, block, 3)

        def chunk(carry, c):
            best = carry
            sl = jax.lax.dynamic_slice_in_dim(spos, c * CH, CH, 1)
            ll = jax.lax.dynamic_slice_in_dim(slab, c * CH, CH, 1)
            dx = (sl[:, None, :, :] - tpos[:, :, None, :]).astype(
                jnp.int32).astype(jnp.float32) * to_f
            r2 = jnp.sum(dx * dx, axis=-1)
            cand = jnp.where(r2 < b * b, ll[:, None, :],
                             jnp.uint32(0xFFFFFFFF))
            return jnp.minimum(best, jnp.min(cand, axis=2)), None

        best0 = jnp.full((bb, block), 0xFFFFFFFF, jnp.uint32)
        best, _ = jax.lax.scan(chunk, best0, jnp.arange(nch))
        return best

    batched = (lists.leaf_ids.reshape(nbatch, bb, maxl),
               tgt_idx.reshape(nbatch, bb, block),
               tgt_valid.reshape(nbatch, bb, block))
    best = jax.lax.map(eval_batch, batched).reshape(nb, block)
    # scatter back to sorted particle order
    flat_idx = jnp.where(tgt_valid, tgt_idx, n).reshape(-1)
    out = jnp.full(n + 1, 0xFFFFFFFF, jnp.uint32).at[flat_idx].set(
        best.reshape(-1))[:n]
    return out


def fof_label(ipos, alive, b, boxsize, nlevels=8, ncrit=32,
              maxiter=200, engine="blocked"):
    """Group labels for the primary-linking particle set.

    Returns int32 labels in [0, n): the smallest particle index in each
    connected component.  Dead particles get label = own index.
    engine='blocked' runs the dense block neighbor pass (TPU
    production; the traversal is done once and its leaf lists are
    reused by every propagation iteration); 'perparticle' is the
    reference-semantics vmapped walk.
    """
    n = ipos.shape[0]
    mass = jnp.ones(n, jnp.float32)  # unit masses: tree geometry only
    tree = build_octree(ipos, mass, alive, boxsize, nlevels=nlevels,
                        ncrit=ncrit)
    order = tree.order
    labels = jnp.arange(n, dtype=jnp.uint32)
    alive_j = jnp.asarray(alive)

    if engine == "blocked":
        tgt_idx, tgt_valid, lists, nb = _blocked_neighbor_lists(
            tree, b, boxsize)
        inv = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        for it in range(maxiter):
            best_sorted = _blocked_min_label(
                tree, tgt_idx, tgt_valid, lists, labels[order],
                alive_j[order], jnp.float32(b), boxsize, ncrit)
            new = best_sorted[inv]       # back to original order
            new = jnp.minimum(new, labels)
            new = jnp.where(alive_j, new, labels)
            new = _shortcut(new)
            changed = bool(jnp.any(new != labels))
            labels = new
            if not changed:
                break
        return labels

    for it in range(maxiter):
        payload = {"ipos": tree.ipos_s,
                   "label": labels[order],
                   "alive": alive_j[order]}
        new = _link_pass(tree, payload, ipos, labels, b, boxsize)
        new = jnp.where(alive_j, new, labels)
        new = _shortcut(new)
        changed = bool(jnp.any(new != labels))
        labels = new
        if not changed:
            break
    return labels


def _nearest_label_accum(carry, extra, tpos, src, dist, r2, live):
    best_r2, best_label = carry
    inside = live & src["alive"]
    r2m = jnp.where(inside, r2, jnp.inf)
    j = jnp.argmin(r2m)
    rj = r2m[j]
    lj = src["label"][j]
    better = rj < best_r2
    return (jnp.where(better, rj, best_r2),
            jnp.where(better, lj, best_label))


@partial(jax.jit, static_argnames=("ncrit", "block"))
def _blocked_nearest_pass(tree: Octree, labels_sorted, alive_sorted,
                          tgt_ipos_blk, tgt_live_blk, lists, boxsize,
                          ncrit: int, block: int):
    """Nearest-primary label per target over the blocked leaf lists."""
    from ..ops.blockwalk import gather_leaf_sources
    nb = tgt_ipos_blk.shape[0]
    maxl = lists.leaf_ids.shape[1]
    to_f = jnp.float32(boxsize / POS_SCALE)
    CH = 256
    total_src = maxl * ncrit
    nch = (total_src + CH - 1) // CH
    bb = min(256, nb)
    while nb % bb:
        bb //= 2
    nbatch = nb // bb

    def eval_batch(args):
        leaf_ids, tpos = args
        payload = {"ipos": tree.ipos_s, "label": labels_sorted,
                   "alive": alive_sorted}
        src, valid = gather_leaf_sources(tree, leaf_ids, ncrit,
                                         payload)
        spos = src["ipos"]
        ok = valid & src["alive"]
        slab = src["label"]

        def chunk(carry, c):
            br2, bl = carry
            sl = jax.lax.dynamic_slice_in_dim(spos, c * CH, CH, 1)
            ll = jax.lax.dynamic_slice_in_dim(slab, c * CH, CH, 1)
            kk = jax.lax.dynamic_slice_in_dim(ok, c * CH, CH, 1)
            dx = (sl[:, None, :, :] - tpos[:, :, None, :]).astype(
                jnp.int32).astype(jnp.float32) * to_f
            r2 = jnp.where(kk[:, None, :], jnp.sum(dx * dx, axis=-1),
                           jnp.inf)
            j = jnp.argmin(r2, axis=2)
            rj = jnp.min(r2, axis=2)
            lj = jnp.take_along_axis(ll[:, None, :].repeat(
                tpos.shape[1], 1), j[..., None], axis=2)[..., 0]
            better = rj < br2
            return (jnp.where(better, rj, br2),
                    jnp.where(better, lj, bl)), None

        br0 = jnp.full(tpos.shape[:2], jnp.inf, jnp.float32)
        bl0 = jnp.full(tpos.shape[:2], 0xFFFFFFFF, jnp.uint32)
        (br, bl), _ = jax.lax.scan(chunk, (br0, bl0),
                                   jnp.arange(nch))
        return br, bl

    batched = (lists.leaf_ids.reshape(nbatch, bb, maxl),
               tgt_ipos_blk.reshape(nbatch, bb, block, 3))
    br, bl = jax.lax.map(eval_batch, batched)
    return br.reshape(nb, block), bl.reshape(nb, block)


def fof_attach_secondary_blocked(tree_primary: Octree,
                                 primary_labels_sorted,
                                 primary_alive_sorted, target_ipos,
                                 boxsize, rmax, block=128, ncrit=32):
    """Blocked nearest-primary attach (TPU production form).

    Targets are grouped into Morton blocks of their OWN ordering (they
    are not in the primary tree); radius grows geometrically on
    misses, re-traversing only then.
    """
    from ..ops.blockwalk import block_traverse
    from ..ops.morton import morton_key
    t = target_ipos.shape[0]
    order = jnp.argsort(morton_key(target_ipos))
    # simple fixed-run blocks of the (roughly spatial) target order
    nb = (t + block - 1) // block
    pad = nb * block - t
    idx = jnp.concatenate([order, jnp.full(pad, order[-1],
                                           order.dtype)])
    tpos = target_ipos[idx].reshape(nb, block, 3)
    to_f = jnp.float32(boxsize / POS_SCALE)
    posf = tpos.astype(jnp.float32) * to_f
    bb_lo = jnp.min(posf, axis=1)
    bb_hi = jnp.max(posf, axis=1)

    best_r2 = jnp.full((nb, block), jnp.inf, jnp.float32)
    best_l = jnp.full((nb, block), 0xFFFFFFFF, jnp.uint32)
    radius = jnp.full(nb, rmax, jnp.float32)
    maxl = 512
    for _ in range(6):
        lists = block_traverse(tree_primary, bb_lo, bb_hi, radius,
                               jnp.zeros(nb, jnp.float32), boxsize,
                               0.0, 0.0, 0, maxi=8, maxl=maxl,
                               mode="neighbor")
        if bool(jnp.any(lists.overflow)):
            maxl *= 2
            continue
        br, bl = _blocked_nearest_pass(
            tree_primary, primary_labels_sorted, primary_alive_sorted,
            tpos, None, lists, boxsize, ncrit, block)
        better = br < best_r2
        best_r2 = jnp.where(better, br, best_r2)
        best_l = jnp.where(better, bl, best_l)
        blk_missing = jnp.any(~jnp.isfinite(best_r2), axis=1)
        if not bool(jnp.any(blk_missing)):
            break
        radius = jnp.where(blk_missing, radius * 2.0, radius)
    # unscatter the target ordering (padded lanes repeat the last
    # target, so their duplicate writes carry identical values)
    lab_flat = best_l.reshape(-1)
    labels = jnp.zeros(t, jnp.uint32).at[idx].set(lab_flat)[:t]
    found = jnp.zeros(t, bool).at[idx].set(
        jnp.isfinite(best_r2).reshape(-1))[:t]
    return labels, found


def fof_attach_secondary(tree_primary: Octree, primary_labels_sorted,
                         primary_alive_sorted, target_ipos, boxsize,
                         rmax):
    """Attach secondary particles to their nearest primary's group.

    rmax: search radius (grown geometrically on misses).
    Returns (labels, found mask).
    """
    t = target_ipos.shape[0]
    payload = {"ipos": tree_primary.ipos_s,
               "label": primary_labels_sorted,
               "alive": primary_alive_sorted}
    best_r2 = jnp.full(t, jnp.inf, jnp.float32)
    best_label = jnp.full(t, 0xFFFFFFFF, jnp.uint32)
    radius = jnp.full(t, rmax, jnp.float32)
    for _ in range(6):
        carry0 = (best_r2, best_label)
        extra = {"dummy": jnp.zeros(t, jnp.float32)}
        best_r2, best_label = run_walk(
            tree_primary, payload, target_ipos, radius, extra, carry0,
            _nearest_label_accum, boxsize, symmetric=False)
        missing = ~jnp.isfinite(best_r2)
        if not bool(jnp.any(missing)):
            break
        radius = jnp.where(missing, radius * 2.0, radius)
    return best_label, jnp.isfinite(best_r2)


@dataclass
class FOFGroups:
    """Halo catalog (fof_compile_catalogue analog)."""

    ngroups: int
    lengths: np.ndarray       # [G]
    masses: np.ndarray        # [G]
    cm: np.ndarray            # [G,3] periodic-aware center of mass
    vel: np.ndarray           # [G,3] mass-weighted mean velocity
    mass_by_type: np.ndarray  # [G,6]
    length_by_type: np.ndarray  # [G,6]
    group_id: np.ndarray      # [N] per-particle group number (0 = none)
    first_pos: np.ndarray     # [G,3] position of the minimum-id particle
    sfr: Optional[np.ndarray] = None


def compile_groups(labels, ipos, vel, mass, ptype, alive, boxsize,
                   min_length=32, sfr=None) -> FOFGroups:
    """Reduce particle labels into a group catalog (host-side numpy).

    Group numbering: 1..G by descending length (fof_assign_grnr).
    CM uses the periodic unwrap relative to the minimum-label particle
    (fof_finish_group_properties).
    """
    labels = np.asarray(labels)
    alive = np.asarray(alive)
    ptype_np = np.asarray(ptype)
    mass_np = np.asarray(mass, dtype=np.float64)
    vel_np = np.asarray(vel, dtype=np.float64)
    pos = np.asarray(ipos, dtype=np.float64) * (boxsize / POS_SCALE)
    n = len(labels)

    lab = np.where(alive, labels, 0xFFFFFFFF)
    uniq, inv = np.unique(lab, return_inverse=True)
    # drop the dead-sentinel group if present
    ngr_all = len(uniq)
    counts = np.bincount(inv, weights=alive.astype(np.float64),
                         minlength=ngr_all)
    keep = (counts >= min_length) & (uniq != 0xFFFFFFFF)
    # order groups by length descending (ties by label)
    order = np.lexsort((uniq[keep], -counts[keep]))
    kept_idx = np.nonzero(keep)[0][order]
    G = len(kept_idx)
    # map group slot -> 1-based group number
    grnr_of_slot = np.zeros(ngr_all, dtype=np.int64)
    grnr_of_slot[kept_idx] = np.arange(1, G + 1)
    group_id = np.where(alive, grnr_of_slot[inv], 0)

    lengths = counts[kept_idx].astype(np.int64)
    masses = np.zeros(G)
    cm = np.zeros((G, 3))
    vcm = np.zeros((G, 3))
    mass_by_type = np.zeros((G, 6))
    length_by_type = np.zeros((G, 6), dtype=np.int64)
    first_pos = np.zeros((G, 3))
    sfr_g = np.zeros(G)

    gi = group_id - 1  # -1 for ungrouped
    sel = gi >= 0
    gsel = gi[sel]
    msel = mass_np[sel] * alive[sel]
    np.add.at(masses, gsel, msel)
    # unwrap positions about the minimum-label particle of each group
    ref = np.zeros((G, 3))
    minlab_particle = uniq[kept_idx]  # the min particle index per group
    ref = pos[minlab_particle.astype(np.int64)]
    first_pos[:] = ref
    d = pos[sel] - ref[gsel]
    d -= boxsize * np.round(d / boxsize)
    for k in range(3):
        np.add.at(cm[:, k], gsel, msel * d[:, k])
        np.add.at(vcm[:, k], gsel, msel * vel_np[sel][:, k])
    cm /= np.maximum(masses, 1e-35)[:, None]
    cm = (cm + ref) % boxsize
    vcm /= np.maximum(masses, 1e-35)[:, None]
    for t in range(6):
        tsel = sel & (ptype_np == t)
        if tsel.any():
            np.add.at(mass_by_type[:, t], gi[tsel], mass_np[tsel])
            np.add.at(length_by_type[:, t], gi[tsel], 1)
    if sfr is not None:
        sfr_np = np.asarray(sfr, dtype=np.float64)
        gas_sel = sel & (ptype_np == 0)
        if gas_sel.any():
            np.add.at(sfr_g, gi[gas_sel], sfr_np[gas_sel])

    return FOFGroups(ngroups=G, lengths=lengths, masses=masses, cm=cm,
                     vel=vcm, mass_by_type=mass_by_type,
                     length_by_type=length_by_type, group_id=group_id,
                     first_pos=first_pos, sfr=sfr_g)


def fof(ipos, vel, mass, ptype, alive, boxsize, mean_separation,
        linking_length=0.2, min_length=32, primary_mask=None,
        sfr=None) -> FOFGroups:
    """Full FOF: primary link over DM(+stars), secondary attach, catalog.

    primary_mask: bool[N] — which particles define the linking set
    (default: types 1 and 4, matching the reference's DM+star primary).
    """
    ptype_np = np.asarray(ptype)
    alive_np = np.asarray(alive)
    if primary_mask is None:
        primary_mask = (ptype_np == 1) | (ptype_np == 4)
    primary = jnp.asarray(primary_mask & alive_np)
    b = linking_length * mean_separation

    labels = fof_label(ipos, primary, b, boxsize)
    labels = np.array(labels)  # writable host copy

    # secondary: attach gas/BH to nearest primary
    secondary = alive_np & ~np.asarray(primary)
    if secondary.any():
        mass_j = jnp.ones(len(labels), jnp.float32)
        tree = build_octree(ipos, mass_j, jnp.asarray(primary), boxsize,
                            nlevels=8, ncrit=32)
        order = np.asarray(tree.order)
        lab_sorted = jnp.asarray(labels[order])
        alive_sorted = jnp.asarray(np.asarray(primary)[order])
        sec_idx = np.nonzero(secondary)[0]
        sec_ipos = jnp.asarray(np.asarray(ipos)[sec_idx])
        sec_labels, found = fof_attach_secondary_blocked(
            tree, lab_sorted, alive_sorted, sec_ipos, boxsize,
            rmax=b)
        labels[sec_idx] = np.where(np.asarray(found),
                                   np.asarray(sec_labels),
                                   labels[sec_idx])

    return compile_groups(labels, ipos, vel, mass, ptype, alive_np,
                          boxsize, min_length=min_length, sfr=sfr)
