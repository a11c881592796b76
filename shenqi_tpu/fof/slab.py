"""Distributed FOF over the slab domain (fof.cpp cross-rank linking).

The reference links friends-of-friends groups across MPI ranks by
exchanging boundary particles and iterating a global min-label
reduction (libgadget/fof.cpp:368-482 fof_reduce_links).  The TPU-slab
analog, entirely inside shard_map/jit:

  1. ghost rows within one linking length arrive from the two slab
     neighbours (domain.halo_exchange ppermute ring);
  2. a LOCAL blocked FOF labels the [local + ghosts] set with a
     lax.while_loop fixpoint (min-label passes + pointer jumping) —
     the same dense block engine as the single-device fof.py;
  3. cross-device rounds: every row's GLOBAL label (min global pid of
     its component) is refreshed by re-exchanging boundary labels and
     taking per-component segment minima; a psum'd change count drives
     the outer lax.while_loop.  Labels converge in at most one round
     per slab a component spans.

Labels are global particle ids (uint32 pid), so the result is
device-count invariant: fof_label_slab over D slabs equals fof.py's
fof_label relabeled by pid (tested in tests/test_fof_slab.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tree import build_octree
from ..ops.blockwalk import (make_blocks_device, block_traverse,
                             auto_block_level)
from ..core.particles import POS_SCALE
from .fof import _blocked_min_label


NOLABEL = jnp.uint32(0xFFFFFFFF)


def _local_label_fixpoint(tree, tgt_idx, tgt_valid, lists, alive,
                          b, boxsize, ncrit: int, maxiter: int = 48):
    """Jitted-inline local FOF over the tree's particle set.

    Returns labels as LOCAL indices (root = min local row index of the
    component; dead rows label themselves).
    """
    n = tree.ipos_s.shape[0]
    order = tree.order
    inv = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    labels0 = jnp.arange(n, dtype=jnp.uint32)
    alive_s = alive[order]

    def body(state):
        labels, _, it = state
        best_sorted = _blocked_min_label(
            tree, tgt_idx, tgt_valid, lists, labels[order], alive_s,
            jnp.float32(b), boxsize, ncrit)
        new = jnp.minimum(best_sorted[inv], labels)
        new = jnp.where(alive, new, labels)
        for _ in range(3):            # pointer jumping
            new = new[new]
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < maxiter)

    labels, changed, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    return labels, changed    # changed=True => hit maxiter (report)


def fof_label_slab(fields: dict, b: float, boxsize: float, ndev: int,
                   gcap: int, nlevels: int, ncrit: int,
                   block: int = 128, maxl: int = 512,
                   axis_name: str = "dp", cuts_in=None):
    """Global FOF labels on a slab-sharded particle set.

    Runs INSIDE shard_map.  fields: ipos [C,3] uint32, mass [C]
    (0 = dead), pid [C] int32/uint32 global ids.  Returns
    (glabel [C] uint32 = min pid of the row's component, NOLABEL for
    dead rows; info dict of psum'd diagnostics).
    """
    from ..parallel.domain import halo_exchange

    ipos_l, mass_l = fields["ipos"], fields["mass"]
    pid_l = fields["pid"].astype(jnp.uint32)
    C = ipos_l.shape[0]
    width_fp = int(np.ceil(b / boxsize * 2 ** 32)) + (1 << 12)

    ghosts, n_lost = halo_exchange(
        {"ipos": ipos_l, "mass": mass_l, "pid": pid_l},
        width_fp, ndev, gcap, axis_name, cuts_in=cuts_in)
    G = ghosts["ipos"].shape[0]
    ncomb = C + G

    ipos = jnp.concatenate([ipos_l, ghosts["ipos"]])
    mass = jnp.concatenate([mass_l, ghosts["mass"]])
    alive = mass > 0
    # park dead rows on an alive particle so blocks stay compact
    from ..ops.morton import morton_key
    keys = morton_key(ipos)
    imax = jnp.argmax(jnp.where(alive, keys, 0))
    ipos = jnp.where(alive[:, None], ipos, ipos[imax])

    tree = build_octree(ipos, jnp.where(alive, 1.0, 0.0), alive,
                        boxsize, nlevels=nlevels, ncrit=ncrit)
    alive_s = alive[tree.order]

    # blocked neighbour lists once (device-side block maker)
    level = auto_block_level(ncomb, block)
    nb = max(2 * ((ncomb + block - 1) // block), 8)
    nb = 1 << (nb - 1).bit_length()
    bb_lo, bb_hi, tgt_idx, tgt_valid, b_ovf = make_blocks_device(
        tree, jnp.arange(ncomb, dtype=jnp.int32), alive_s, block,
        level, nb, boxsize)
    radius = jnp.where(jnp.any(tgt_valid, axis=1), jnp.float32(b),
                       0.0)
    lists = block_traverse(tree, bb_lo, bb_hi, radius,
                           jnp.zeros(nb, jnp.float32), boxsize,
                           0.0, 0.0, 0, maxi=8, maxl=maxl,
                           mode="neighbor")

    comp, local_nc = _local_label_fixpoint(
        tree, tgt_idx, tgt_valid, lists, alive, b, boxsize, ncrit)

    # global labels: min pid over each local component, then iterate
    # boundary refreshes until no label changes anywhere
    pid_comb = jnp.concatenate([pid_l, ghosts["pid"]])
    glabel0 = jnp.where(alive, pid_comb, NOLABEL)

    def seg_min(comp, g):
        m = jnp.full(ncomb, NOLABEL, jnp.uint32).at[comp].min(
            g, mode="promise_in_bounds")
        return m[comp]

    g_local0 = seg_min(comp, glabel0)[:C]
    g_local0 = jnp.where(alive[:C], g_local0, NOLABEL)

    def body(state):
        g_local, _, it = state
        gg, _ = halo_exchange(
            {"ipos": ipos_l, "mass": mass_l, "glabel": g_local},
            width_fp, ndev, gcap, axis_name, cuts_in=cuts_in)
        g_comb = jnp.concatenate([g_local, gg["glabel"]])
        g_comb = jnp.where(alive, g_comb, NOLABEL)
        g_new = seg_min(comp, g_comb)[:C]
        g_new = jnp.where(alive[:C], g_new, NOLABEL)
        nchanged = jax.lax.psum(
            jnp.sum((g_new != g_local).astype(jnp.int32)), axis_name)
        return g_new, nchanged, it + 1

    def cond(state):
        _, nchanged, it = state
        return (nchanged > 0) & (it < ndev + 2)

    g_local, nchanged, rounds = jax.lax.while_loop(
        cond, body, (g_local0, jnp.int32(1), jnp.int32(0)))

    info = {
        "halo_lost": n_lost,
        "block_overflow": jax.lax.psum(
            b_ovf.astype(jnp.int32), axis_name),
        "list_overflow": jax.lax.psum(
            jnp.sum(lists.overflow.astype(jnp.int32)), axis_name),
        "local_unconverged": jax.lax.psum(
            local_nc.astype(jnp.int32), axis_name),
        "global_unconverged": jax.lax.psum(
            (nchanged > 0).astype(jnp.int32), axis_name),
        "rounds": jax.lax.pmax(rounds, axis_name),
    }
    return g_local, info


def make_fof_slab(mesh, b: float, boxsize: float, nlevels: int = 8,
                  ncrit: int = 32, gcap: int = None,
                  block: int = 128, maxl: int = 512,
                  with_cuts: bool = False):
    """Host-side builder: jitted shard_map FOF over the 'dp' mesh.

    Returns fn(fields) -> (glabel sharded [D*C], info) for fields
    sharded with domain.distribute_slabs (ipos/mass/pid required).
    With with_cuts=True the fn takes a second argument — the
    [ndev-1] uint32 interior slab boundaries of a cost-balanced
    domain (domain.balance_cuts) — so ghost strips follow the ACTUAL
    ownership intervals, not the uniform slabs.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                      # older jax
        from jax.experimental.shard_map import shard_map

    ndev = mesh.devices.size

    field_specs = {"ipos": P("dp", None), "mass": P("dp"),
                   "pid": P("dp")}
    info_specs = {k: P() for k in
                  ("halo_lost", "block_overflow", "list_overflow",
                   "local_unconverged", "global_unconverged",
                   "rounds")}

    def body(fields, cuts):
        C = fields["ipos"].shape[0]
        # a strip can never hold more rows than the device owns, and
        # clumps sitting exactly on a slab face DO put most of a slab
        # in the strip — default to the safe bound
        g = gcap if gcap is not None else C
        return fof_label_slab(fields, b, boxsize, ndev, g, nlevels,
                              ncrit, block=block, maxl=maxl,
                              cuts_in=cuts)

    if with_cuts:
        run = partial(shard_map, mesh=mesh,
                      in_specs=(field_specs, P()),
                      out_specs=(P("dp"), info_specs),
                      check_vma=False)(
            lambda fields, cuts: body(fields, cuts))
    else:
        run = partial(shard_map, mesh=mesh, in_specs=(field_specs,),
                      out_specs=(P("dp"), info_specs),
                      check_vma=False)(
            lambda fields: body(fields, None))

    return jax.jit(run)


def compile_groups_from_slab(glabel, fields, boxsize: float,
                             min_length: int = 32):
    """Host-side halo catalog from slab FOF labels (fof_reduce_groups
    + fof_compile_catalogue analog for the sharded path).

    glabel: [D*C] uint32 min-PID component labels (fof_label_slab).
    fields: sharded dict with ipos/vel/mass and pid (or id_lo).
    The min-pid labels are remapped to min-ROW labels so
    fof.compile_groups' periodic-unwrap reference (indexed by label)
    applies unchanged.  Returns FOFGroups over the ALIVE rows, plus
    the alive-row ids (for member output)."""
    from .fof import compile_groups

    mass = np.asarray(fields["mass"])
    alive = mass > 0
    lab = np.asarray(glabel)[alive]
    ipos = np.asarray(fields["ipos"])[alive]
    vel = np.asarray(fields["vel"])[alive]
    m = mass[alive]
    pid = np.asarray(fields.get("pid", fields.get("id_lo"))
                     ).astype(np.uint32)[alive]
    # min-pid label -> row of that pid
    order = np.argsort(pid, kind="stable")
    rows = order[np.minimum(np.searchsorted(pid[order], lab),
                            len(pid) - 1)]
    # real per-row types when the state carries them (gas runs):
    # per-type group masses/lengths feed BH seeding + PIG output
    if "ptyp" in fields:
        ptype = np.asarray(fields["ptyp"], np.int8)[alive]
    else:
        ptype = np.full(len(m), 1, np.int8)
    groups = compile_groups(rows, ipos, vel, m, ptype,
                            np.ones(len(m), bool), boxsize,
                            min_length=min_length)
    return groups, pid
