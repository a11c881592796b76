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


# ---------------- distributed catalog reduction ----------------
# (fof_reduce_groups / fof.cpp:903: group properties are reduced by
# routing per-group partial sums to the label's owner device — the
# mpsort-by-MinID analog — so the global particle state never
# materializes on one host.  Two stages: a LOCAL segment reduction
# dedups each device's rows to one partial record per component, then
# route_rows ships partials to owner = label % D for the cross-device
# combine with periodic CM unwrap.)

def _segment_reduce_local(lab, pid, posf, vel, mass, ptyp, alive,
                          boxsize):
    """Per-device partial group sums, one record per distinct label.

    Returns (partials dict of [C]-sized per-SEGMENT arrays, seg_valid,
    rowctx) — rowctx keeps the sorted per-row state so the caller can
    recompute CM offsets against the GLOBAL reference once the owner
    has broadcast it back (exact per-particle wrap parity with
    fof_finish_group_properties).  ref = position of the segment's
    min-pid row; isref flags the partial holding the global min-pid
    particle."""
    C = lab.shape[0]
    lab = jnp.where(alive, lab, NOLABEL)
    order = jnp.lexsort((pid, lab))
    labs = lab[order]
    pids = pid[order]
    poss = posf[order]
    vels = vel[order]
    ms = jnp.where(alive[order], mass[order], 0.0)
    ts = ptyp[order]

    newseg = jnp.concatenate([
        jnp.ones(1, bool), labs[1:] != labs[:-1]])
    seg = jnp.cumsum(newseg.astype(jnp.int32)) - 1       # [C]
    seg_lab = jnp.full(C, NOLABEL, jnp.uint32).at[seg].min(
        labs, mode="promise_in_bounds")
    seg_valid = seg_lab != NOLABEL

    # reference position: the segment's FIRST sorted row (min pid)
    ref = jnp.zeros((C, 3), jnp.float32).at[seg].add(
        jnp.where(newseg[:, None], poss, 0.0),
        mode="promise_in_bounds")
    isref = jnp.zeros(C, bool).at[seg].max(
        newseg & (pids == labs), mode="promise_in_bounds")

    msum = jnp.zeros(C, jnp.float32).at[seg].add(
        ms, mode="promise_in_bounds")
    mvsum = jnp.zeros((C, 3), jnp.float32).at[seg].add(
        ms[:, None] * vels, mode="promise_in_bounds")
    cnt = jnp.zeros(C, jnp.int32).at[seg].add(
        (ms > 0).astype(jnp.int32), mode="promise_in_bounds")
    onehot = (ts[:, None] == jnp.arange(6)[None, :])
    mbt = jnp.zeros((C, 6), jnp.float32).at[seg].add(
        jnp.where(onehot, ms[:, None], 0.0),
        mode="promise_in_bounds")
    cbt = jnp.zeros((C, 6), jnp.int32).at[seg].add(
        (onehot & (ms > 0)[:, None]).astype(jnp.int32),
        mode="promise_in_bounds")
    part = {"lab": seg_lab, "ref": ref, "isref": isref,
            "msum": msum, "mvsum": mvsum,
            "cnt": cnt, "mbt": mbt, "cbt": cbt}
    rowctx = {"seg": seg, "poss": poss, "ms": ms}
    return part, seg_valid, rowctx


def reduce_groups_slab(glabel, fields, boxsize: float, ndev: int,
                       kcap: int, axis_name: str = "dp"):
    """Device-side group-catalog reduction (shard_map body).

    glabel [C] uint32 min-pid labels (fof_label_slab); fields: ipos
    uint32 [C,3], vel [C,3], mass [C], ptyp [C] i32, pid [C] u32.
    Returns (owner dict of [K2]-sized per-GROUP arrays with `valid`,
    n_lost) where K2 = C + ndev*kcap; each group appears on exactly
    one device (label % D).
    """
    from ..parallel.domain import route_back, route_rows

    ipos = fields["ipos"]
    C = ipos.shape[0]
    posf = ipos.astype(jnp.float32) * jnp.float32(
        boxsize / POS_SCALE)
    alive = (fields["mass"] > 0) & (glabel != NOLABEL)
    part, seg_valid, rowctx = _segment_reduce_local(
        glabel, fields["pid"].astype(jnp.uint32), posf,
        fields["vel"], fields["mass"],
        fields.get("ptyp", jnp.ones(C, jnp.int32)), alive, boxsize)

    me = jax.lax.axis_index(axis_name)
    dest = (part["lab"] % jnp.uint32(ndev)).astype(jnp.int32)
    recv, rvalid, state, n_lost = route_rows(
        part, dest, seg_valid, ndev, kcap, axis_name)

    # owner combine: local partials that stayed + received ones
    stay = seg_valid & (dest == me)
    comb = {k: jnp.concatenate([part[k], recv[k]])
            for k in part}
    cvalid = jnp.concatenate([stay, rvalid])
    N2 = C + ndev * kcap

    lab2 = jnp.where(cvalid, comb["lab"], NOLABEL)
    order = jnp.argsort(lab2)
    labs = lab2[order]
    newseg = jnp.concatenate([
        jnp.ones(1, bool), labs[1:] != labs[:-1]])
    seg = jnp.cumsum(newseg.astype(jnp.int32)) - 1
    seg_lab = jnp.full(N2, NOLABEL, jnp.uint32).at[seg].min(
        labs, mode="promise_in_bounds")
    gvalid = seg_lab != NOLABEL

    def sc(a, w=None):
        v = a[order]
        if w is not None:
            v = jnp.where(w[order].reshape(
                (-1,) + (1,) * (v.ndim - 1)), v, 0)
        return jnp.zeros((N2,) + a.shape[1:], a.dtype).at[seg].add(
            v, mode="promise_in_bounds")

    # the global reference: exactly one partial per group carries the
    # min-pid particle (isref)
    REF = sc(comb["ref"], comb["isref"] & cvalid)
    msum_o = jnp.where(cvalid[order], comb["msum"][order], 0.0)
    M = jnp.zeros(N2, jnp.float32).at[seg].add(
        msum_o, mode="promise_in_bounds")
    MV = sc(comb["mvsum"], cvalid)
    CNT = sc(comb["cnt"], cvalid)
    MBT = sc(comb["mbt"], cvalid)
    CBT = sc(comb["cbt"], cvalid)

    # ---- exact per-particle CM unwrap ----
    # Broadcast each group's GLOBAL reference back to the devices
    # holding its partials (route_back along the delivery lanes), so
    # member offsets wrap against REF exactly like the host/reference
    # per-particle convention (fof_finish_group_properties) — a
    # partial-granularity wrap diverges for groups wider than box/2.
    inv = jnp.zeros(N2, jnp.int32).at[order].set(
        jnp.arange(N2, dtype=jnp.int32))
    REF_rows = REF[seg][inv]                  # comb-row order
    refg_local = REF_rows[:C]                 # local partial slots
    refg_back = route_back(REF_rows[C:], state, axis_name)
    REFg = jnp.where((dest == me)[:, None], refg_local, refg_back)

    segl, poss, ms = rowctx["seg"], rowctx["poss"], rowctx["ms"]
    d2 = poss - REFg[segl]
    d2 -= boxsize * jnp.round(d2 / boxsize)
    mdsum2 = jnp.zeros((C, 3), jnp.float32).at[segl].add(
        ms[:, None] * d2, mode="promise_in_bounds")
    # second route along the SAME lanes (deterministic perm)
    recv2, _rv2, _st2, _ = route_rows(
        {"md": mdsum2}, dest, seg_valid, ndev, kcap, axis_name)
    md_comb = jnp.concatenate([mdsum2, recv2["md"]])
    MD = jnp.zeros((N2, 3), jnp.float32).at[seg].add(
        jnp.where(cvalid[order, None], md_comb[order], 0.0),
        mode="promise_in_bounds")

    cm = (REF + MD / jnp.maximum(M, 1e-35)[:, None]) % boxsize
    vcm = MV / jnp.maximum(M, 1e-35)[:, None]
    return {"lab": seg_lab, "len": CNT, "mass": M, "cm": cm,
            "vcm": vcm, "mbt": MBT, "cbt": CBT, "first_pos": REF,
            "valid": gvalid}, n_lost


def make_group_reduce_slab(mesh, boxsize: float, kcap: int,
                           axis_name: str = "dp"):
    """Jitted shard_map wrapper over reduce_groups_slab."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    ndev = mesh.devices.size
    field_specs = {"ipos": P("dp", None), "vel": P("dp", None),
                   "mass": P("dp"), "ptyp": P("dp"), "pid": P("dp")}
    out_tab = {k: P("dp", *([None] * e)) for k, e in
               (("lab", 0), ("len", 0), ("mass", 0), ("cm", 1),
                ("vcm", 1), ("mbt", 1), ("cbt", 1),
                ("first_pos", 1), ("valid", 0))}

    def body(glabel, fields):
        return reduce_groups_slab(glabel, fields, boxsize, ndev,
                                  kcap, axis_name)

    run = partial(shard_map, mesh=mesh,
                  in_specs=(P("dp"), field_specs),
                  out_specs=(out_tab, P()), check_vma=False)(body)
    return jax.jit(run)


def compile_groups_slab_distributed(mesh, glabel, fields,
                                    boxsize: float,
                                    min_length: int = 32,
                                    kcap: int = None,
                                    _cache={}):
    """Distributed drop-in for compile_groups_from_slab.

    The per-group reduction runs device-side (reduce_groups_slab);
    the host only materializes the G-sized catalog plus one int
    column (per-row group numbers), never the global particle state.
    Returns (FOFGroups over the ALIVE rows, alive-row pids).
    """
    from .fof import FOFGroups

    ndev = mesh.devices.size
    C_total = fields["mass"].shape[0]
    if kcap is None:
        kcap = max(C_total // ndev // max(ndev // 2, 1), 4096)
    f = {"ipos": fields["ipos"], "vel": fields["vel"],
         "mass": fields["mass"],
         "ptyp": (fields["ptyp"].astype(jnp.int32)
                  if "ptyp" in fields
                  else jnp.ones(C_total, jnp.int32)),
         "pid": (fields.get("pid", fields.get("id_lo"))
                 ).astype(jnp.uint32)}
    for _ in range(6):
        key = (id(mesh), boxsize, kcap)
        prog = _cache.get(key)
        if prog is None:
            prog = make_group_reduce_slab(mesh, boxsize, kcap)
            _cache[key] = prog
        tab, n_lost = prog(glabel, f)
        if int(n_lost) == 0:
            break
        kcap = min(kcap * 2, C_total)
    else:
        raise RuntimeError("group reduction route overflow at "
                           f"kcap={kcap}")

    valid = np.asarray(tab["valid"])
    lens = np.asarray(tab["len"])[valid]
    keep = lens >= min_length
    lab_k = np.asarray(tab["lab"])[valid][keep]
    lens_k = lens[keep]
    # group numbering 1..G by descending length, ties by label
    # (fof_assign_grnr semantics)
    order = np.lexsort((lab_k, -lens_k))
    G = len(order)
    lengths = lens_k[order].astype(np.int64)
    masses = np.asarray(tab["mass"])[valid][keep][order].astype(
        np.float64)
    cm = np.asarray(tab["cm"])[valid][keep][order].astype(np.float64)
    vcm = np.asarray(tab["vcm"])[valid][keep][order].astype(
        np.float64)
    mbt = np.asarray(tab["mbt"])[valid][keep][order].astype(
        np.float64)
    cbt = np.asarray(tab["cbt"])[valid][keep][order].astype(np.int64)
    fpos = np.asarray(tab["first_pos"])[valid][keep][order].astype(
        np.float64)

    # per-row group number: host lookup label -> grnr over the ALIVE
    # rows (one uint32 + one int32 column of bookkeeping)
    lab_rows = np.asarray(glabel)
    mass_rows = np.asarray(fields["mass"])
    alive = mass_rows > 0
    lut_lab = lab_k[order]
    s = np.argsort(lut_lab)
    pos_s = np.searchsorted(lut_lab[s], lab_rows[alive])
    pos_s = np.clip(pos_s, 0, max(G - 1, 0))
    hit = np.zeros(alive.sum(), np.int64)
    if G:
        m = lut_lab[s][pos_s] == lab_rows[alive]
        hit[m] = s[pos_s[m]] + 1
    group_id = hit

    pid_rows = np.asarray(
        fields.get("pid", fields.get("id_lo"))).astype(
            np.uint32)[alive]
    groups = FOFGroups(ngroups=G, lengths=lengths, masses=masses,
                       cm=cm, vel=vcm, mass_by_type=mbt,
                       length_by_type=cbt, group_id=group_id,
                       first_pos=fpos, sfr=None)
    return groups, pid_rows
