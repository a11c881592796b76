"""Multi-chip TreePM step over a jax.sharding.Mesh (the domain layer).

The MPI domain decomposition (libgadget/domain.cpp, exchange.hpp) maps to
sharding the Morton-sorted particle axis over a 1-D device mesh: each
device owns a contiguous Peano/Morton range, which is exactly the
reference's topleaf-segment invariant.

Round-1 strategy (compute-parallel correct baseline):
  * particles sharded over axis 'dp';
  * PM: every device CIC-deposits its shard into a local mesh copy;
    one psum makes the full mesh; the FFT work is replicated (a
    pencil-sharded FFT replaces this later);
  * tree: positions/masses all_gathered, each device builds the same
    octree but walks ONLY its 1/D share of the target blocks; the
    per-device partial results are summed with a psum (each device
    contributes disjoint rows);
  * KDK updates are embarrassingly parallel on the shard.

The locally-essential-tree + ghost-exchange design (rcut halos via
ppermute rings, no all_gather) is the planned scaling step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..core.particles import POS_SCALE
from ..ops.tree import build_octree
from ..ops.blockwalk import block_traverse, make_blocks
from ..ops.cic import cic_deposit, cic_readout
from ..gravity.pm import PMConfig, _cic_invwindow, _k2_int, _kpos_1d
from ..gravity.shortrange import ShortRangeParams
from ..gravity.shortrange_blocked import _blocked_eval


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices \
            else jax.devices()
    return Mesh(np.array(devices), axis_names=("dp",))


def shard_particles(mesh: Mesh, *arrays):
    """Place arrays with the leading axis sharded over 'dp'."""
    out = []
    for a in arrays:
        spec = P("dp", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def pm_forces_replicated_fft(ipos_local, mass_local, cfg: PMConfig):
    """PM inside shard_map: local deposit + psum + replicated FFT."""
    n = cfg.nmesh
    mesh_local = cic_deposit(ipos_local, mass_local, n)
    mesh_full = jax.lax.psum(mesh_local, "dp")
    rho_k = jnp.fft.rfftn(mesh_full)

    invwindow = _cic_invwindow(cfg)
    k2 = _k2_int(cfg)
    asmth2 = (2 * np.pi * cfg.asmth / n) ** 2
    pot_factor = -cfg.G / (np.pi * cfg.boxsize)
    fac = (pot_factor * n ** 3) * jnp.exp(-k2 * asmth2) \
        / jnp.where(k2 > 0, k2, 1.0) * invwindow * invwindow
    fac = jnp.where(k2 > 0, fac, 0.0)
    pot_k = rho_k * fac

    kx = _kpos_1d(n)[:, None, None]
    ky = _kpos_1d(n)[None, :, None]
    kz = _kpos_1d(n, half=True)[None, None, :]

    def diff_kernel(w):
        return (8.0 * jnp.sin(w) - jnp.sin(2.0 * w)) / 6.0

    accel = []
    for kj in (kx, ky, kz):
        ffac = -diff_kernel(kj * (2 * np.pi / n)) * (n / cfg.boxsize)
        fmesh = jnp.fft.irfftn((1j * ffac) * pot_k, s=(n, n, n))
        accel.append(cic_readout(fmesh, ipos_local))
    return jnp.stack(accel, axis=-1)


def tree_forces_sharded(ipos_local, mass_local, oldacc_local,
                        sp: ShortRangeParams, window_tables,
                        tree_nlevels: int, tree_ncrit: int,
                        maxi: int, maxl: int, block: int):
    """Inside shard_map: replicated tree, each device walks its share
    of the target blocks, psum combines the disjoint rows."""
    ipos_all = jax.lax.all_gather(ipos_local, "dp", axis=0, tiled=True)
    mass_all = jax.lax.all_gather(mass_local, "dp", axis=0, tiled=True)
    oldacc_all = jax.lax.all_gather(oldacc_local, "dp", axis=0,
                                    tiled=True)
    alive_all = mass_all > 0
    n = ipos_all.shape[0]
    tree = build_octree(ipos_all, mass_all, alive_all, sp.boxsize,
                        nlevels=tree_nlevels, ncrit=tree_ncrit)

    # all blocks, globally
    bb_lo, bb_hi, nblocks, pad_n = make_blocks(tree, n, block,
                                               sp.boxsize)
    ndev = jax.lax.psum(1, "dp")
    di = jax.lax.axis_index("dp")
    blocks_per_dev = (nblocks + ndev - 1) // ndev
    lo_b = di * blocks_per_dev
    # slice this device's block range (static size, masked tail)
    my_lo = jax.lax.dynamic_slice_in_dim(
        jnp.pad(bb_lo, ((0, blocks_per_dev * ndev - nblocks), (0, 0))),
        lo_b, blocks_per_dev, axis=0)
    my_hi = jax.lax.dynamic_slice_in_dim(
        jnp.pad(bb_hi, ((0, blocks_per_dev * ndev - nblocks), (0, 0))),
        lo_b, blocks_per_dev, axis=0)

    oldacc_s = oldacc_all[tree.order]
    idxp = jnp.minimum(jnp.arange(nblocks * block), n - 1)
    aold_blk_all = (sp.err_tol_force_acc
                    * oldacc_s[idxp].reshape(nblocks, block)).min(axis=1)
    aold_pad = jnp.pad(aold_blk_all,
                       (0, blocks_per_dev * ndev - nblocks))
    my_aold = jax.lax.dynamic_slice_in_dim(aold_pad, lo_b,
                                           blocks_per_dev, axis=0)

    lists = block_traverse(
        tree, my_lo, my_hi, jnp.zeros(blocks_per_dev, jnp.float32),
        my_aold, sp.boxsize, sp.rcut, sp.bh_opening_angle ** 2,
        sp.use_bh, maxi=maxi, maxl=maxl, mode="gravity")

    to_f = jnp.float32(sp.boxsize / POS_SCALE)
    tgt_idx = jnp.minimum(
        (lo_b * block) + jnp.arange(blocks_per_dev * block), n - 1)
    tgt_pos = (tree.ipos_s[tgt_idx].astype(jnp.float32) * to_f
               ).reshape(blocks_per_dev, block, 3)
    acc_b, pot_b = _blocked_eval(tree, lists, tgt_pos, sp,
                                 window_tables, maxi, maxl, tree_ncrit,
                                 blocks_per_dev, block)
    # scatter this device's sorted-range results into a global buffer
    acc_sorted = jnp.zeros((blocks_per_dev * ndev * block, 3),
                           jnp.float32)
    acc_sorted = jax.lax.dynamic_update_slice_in_dim(
        acc_sorted, acc_b.reshape(-1, 3), lo_b * block, axis=0)
    acc_sorted = jax.lax.psum(acc_sorted, "dp")[:n]
    # back to original order, then slice the local rows
    acc_orig = jnp.zeros((n, 3), jnp.float32).at[tree.order].set(
        acc_sorted)
    nloc = ipos_local.shape[0]
    return jax.lax.dynamic_slice_in_dim(acc_orig, di * nloc, nloc,
                                        axis=0)


def tree_forces_slab(fields: dict, sp: ShortRangeParams,
                     window_tables, ndev: int, gcap: int,
                     tree_nlevels: int, tree_ncrit: int,
                     maxi: int, maxl: int, block: int,
                     axis_name: str = "dp", schedule: str = "blocked",
                     sub: int = 32,
                     pcaps: tuple = (256, 512, 1024, 2048),
                     fcap: int = 2048,
                     traversal: str = "walk", engine: str = "xla",
                     nb_mult: int = 1, cuts_in=None):
    """Locally-essential-tree short-range gravity on a slab domain.

    Replaces the round-1 replicated tree (all_gather + psum,
    sharded.py r1): ghosts within rcut arrive from the two slab
    neighbors via ppermute (treewalk2.h:307-362 export/import analog,
    ring-reduced), then the ENTIRE walk is device-local — per-device
    memory and work are O(N/D + halo).

    fields: local rows dict with ipos/mass/oldacc ([C] leading).
    Returns (acc [C,3], pot [C], info dict of psum'd diagnostics).
    """
    from ..ops.morton import morton_key
    from .domain import halo_exchange

    ipos_l = fields["ipos"]
    C = ipos_l.shape[0]
    width_fp = int(np.ceil(sp.rcut / sp.boxsize * 2 ** 32)) + (1 << 16)
    ghosts, n_lost = halo_exchange(
        {"ipos": fields["ipos"], "mass": fields["mass"],
         "oldacc": fields["oldacc"]},
        width_fp, ndev, gcap, axis_name, cuts_in=cuts_in)

    ipos_all = jnp.concatenate([fields["ipos"], ghosts["ipos"]])
    mass_all = jnp.concatenate([fields["mass"], ghosts["mass"]])
    oldacc_all = jnp.concatenate([fields["oldacc"], ghosts["oldacc"]])
    alive = mass_all > 0
    n = ipos_all.shape[0]

    # park dead rows on the max-key alive particle so Morton-run
    # target blocks stay tight (garbage positions would blow up the
    # block bboxes and the interaction lists)
    keys = morton_key(ipos_all)
    imax = jnp.argmax(jnp.where(alive, keys, 0))
    ipos_all = jnp.where(alive[:, None], ipos_all, ipos_all[imax])

    tree = build_octree(ipos_all, mass_all, alive, sp.boxsize,
                        nlevels=tree_nlevels, ncrit=tree_ncrit)

    if schedule == "refined":
        # round-3 production schedule on the slab: sub-block MAC +
        # packed source tables, targets compacted to LOCAL alive rows
        # (ghost rows get no force — their owners compute them).
        # Static caps: the caller reads diag from info and regrows.
        from ..gravity.shortrange_refined import (
            treegrav_refined_fixed, _next_pow2, _infer_nlevels)
        from ..ops.blockwalk import auto_block_level
        local = jnp.arange(n) < C
        active = local & alive
        T = min(_next_pow2(C), n)
        level = auto_block_level(T, block)
        # nb_mult: regrown by the caller when cell-anchored Morton-run
        # splitting produces more blocks than the T/block estimate
        # (diag[0] block_ovf) — bites at small T
        nb = _next_pow2(((T + block - 1) // block
                         + max(T // (2 * block), 1)) * nb_mult)
        nlv = _infer_nlevels(tree.center.shape[0], n) \
            if traversal == "bfs" else 0
        acc, pot, diag = treegrav_refined_fixed(
            tree, oldacc_all, sp, window_tables, T, block, level, nb,
            maxi, maxl, sub, tree_ncrit, pcaps,
            nlevels=nlv, fcap=fcap, traversal=traversal,
            engine=engine, active=active)
        ovf = diag[0] + diag[1] + diag[8] + jnp.sum(diag[9:13])
        info = {
            "halo_lost": n_lost,
            "walk_overflow": jax.lax.psum(ovf, axis_name),
            "grav_diag": jax.lax.pmax(diag, axis_name),
        }
        return acc[:C], pot[:C], info

    bb_lo, bb_hi, nblocks, pad_n = make_blocks(tree, n, block,
                                               sp.boxsize)
    alive_s = tree.mass_s > 0
    oldacc_s = oldacc_all[tree.order]
    idxp = jnp.minimum(jnp.arange(pad_n), n - 1)
    BIG = jnp.float32(1e30)
    aold_lane = jnp.where(alive_s[idxp],
                          sp.err_tol_force_acc * oldacc_s[idxp], BIG)
    block_aold = aold_lane.reshape(nblocks, block).min(axis=1)

    lists = block_traverse(
        tree, bb_lo, bb_hi, jnp.zeros(nblocks, jnp.float32),
        block_aold, sp.boxsize, sp.rcut, sp.bh_opening_angle ** 2,
        sp.use_bh, maxi=maxi, maxl=maxl, mode="gravity")

    to_f = jnp.float32(sp.boxsize / POS_SCALE)
    tgt_pos = (tree.ipos_s[idxp].astype(jnp.float32) * to_f
               ).reshape(nblocks, block, 3)
    acc_b, pot_b = _blocked_eval(tree, lists, tgt_pos, sp,
                                 window_tables, maxi, maxl,
                                 tree_ncrit, nblocks, block)

    # back to row order (local rows are [0, C); ghosts discarded).
    # clamped tail lanes duplicate row n-1: scatter-set via a dump row
    lane_ok = jnp.arange(pad_n) < n
    flat = jnp.where(lane_ok, tree.order[idxp], n)
    acc = jnp.zeros((n + 1, 3), jnp.float32).at[flat].set(
        acc_b.reshape(-1, 3))[:C]
    pot = jnp.zeros(n + 1, jnp.float32).at[flat].set(
        pot_b.reshape(-1))[:C]
    info = {
        "halo_lost": n_lost,
        "walk_overflow": jax.lax.psum(
            jnp.sum(lists.overflow.astype(jnp.int32)), axis_name),
    }
    return acc, pot, info


def stencil_static_config(C: int, sub: int = 32, W: int = 7,
                          sp: ShortRangeParams = None):
    """Host-reproducible static stencil shapes for a slab device with
    row capacity C.  T deliberately omits stencilgrav's min(T, n)
    clamp — n depends on the ghost layout (ring vs all_to_all), and
    the host must be able to resolve TBC without tracing."""
    from ..gravity.shortrange_refined import _next_pow2
    k = min(int(np.ceil(np.log2(sp.boxsize / sp.rcut))), 10)
    CAND = _next_pow2(W ** 3) if W ** 3 & (W ** 3 - 1) else W ** 3
    T = ((_next_pow2(max(C, sub)) + sub - 1) // sub) * sub
    return k, CAND, T


def stencil_forces_slab(fields: dict, sp: ShortRangeParams,
                        window_tables, ndev: int, gcap: int,
                        tbc: int, pcaps: tuple, ncaps: tuple,
                        axis_name: str = "dp", sub: int = 32,
                        W: int = 7, engine: str = "xla",
                        batch: int = 1024, cuts_in=None):
    """Grid-stencil short-range gravity on a slab domain (the round-3
    production engine, gravity/stencil.py, distributed).

    No octree at all: ghosts within rcut arrive via the halo
    exchange, then ONE fused device program (grid build + classify +
    tier evals + scatter) runs per device with STATIC caps — no host
    sync inside shard_map, which a grow-loop engine cannot avoid.
    Cap sufficiency comes back as a pmax'd diag vector; the caller
    (slab_sim._grow_from_diag) regrows and rebuilds on overflow, the
    same protocol as the refined schedule.

    Targets are the LOCAL alive rows (ghosts get no force — their
    owners compute them); sources are local + ghosts.  Forces are
    exact P2P inside rcut, so slab results match the single-device
    stencil engine to f32 summation order.
    """
    from .domain import halo_exchange
    from ..gravity.stencil import _stencil_fused, default_tbc

    ipos_l = fields["ipos"]
    C = ipos_l.shape[0]
    width_fp = int(np.ceil(sp.rcut / sp.boxsize * 2 ** 32)) + (1 << 16)
    ghosts, n_lost = halo_exchange(
        {"ipos": fields["ipos"], "mass": fields["mass"]},
        width_fp, ndev, gcap, axis_name, cuts_in=cuts_in)
    ipos_all = jnp.concatenate([fields["ipos"], ghosts["ipos"]])
    mass_all = jnp.concatenate([fields["mass"], ghosts["mass"]])
    n = ipos_all.shape[0]
    active = (jnp.arange(n) < C) & (mass_all > 0)

    k, CAND, T = stencil_static_config(C, sub, W, sp)
    TBC = tbc or default_tbc(T, sub)
    acc, pot, ok, diag = _stencil_fused(
        ipos_all, mass_all, active, window_tables, sp, k, sub, W,
        CAND, T, True, TBC, tuple(pcaps), tuple(ncaps),
        False, engine, batch)
    info = {
        "halo_lost": n_lost,
        "walk_overflow": jax.lax.psum((~ok).astype(jnp.int32),
                                      axis_name),
        "st_diag": jax.lax.pmax(diag, axis_name),
    }
    return acc[:C], pot[:C], info


def make_slab_step(mesh: Mesh, cfg_pm: PMConfig,
                   sp: ShortRangeParams, window_tables,
                   tree_nlevels: int = 6, tree_ncrit: int = 32,
                   maxi: int = 1024, maxl: int = 512,
                   block: int = 128, kcap: int = None,
                   gcap: int = None, pm_halo: int = 2,
                   schedule: str = "blocked", sub: int = 32,
                   pcaps: tuple = (256, 512, 1024, 2048),
                   fcap: int = 2048, traversal: str = "walk",
                   engine: str = "xla"):
    """The distributed multi-chip TreePM KDK step (round-2 design).

    Unlike the round-1 `make_sharded_step` (replicated tree via
    all_gather, full PM mesh psum'd to every device), every stage here
    is O(N/D + halo) per device:

      exchange   -> rows migrate to their owner slab (all_to_all)
      PM         -> slab deposit + ppermute halos + pencil FFT +
                    slab readout (pfft.pm_forces_slab)
      tree       -> per-device octree over local + rcut ghosts
                    (tree_forces_slab)
      KDK        -> embarrassingly parallel on the rows

    step(fields, kick, drift) -> (fields, info); fields is a dict of
    per-device row blocks (ipos/vel/mass/oldacc/pid) sharded over
    'dp', built with domain.distribute_slabs.  info carries psum'd
    diagnostics (exchange unsent/dropped, halo overflow, walk
    overflow) — assert zeros in tests, monitor in production.
    """
    from .domain import exchange
    from .pfft import pm_forces_slab

    ndev = mesh.devices.size
    if kcap is None:
        kcap = 256

    field_specs = {
        "ipos": P("dp", None), "vel": P("dp", None), "mass": P("dp"),
        "oldacc": P("dp"), "pid": P("dp"),
    }
    info_specs = {"unsent": P(), "dropped": P(), "n_alive": P(),
                  "halo_lost": P(), "walk_overflow": P()}
    if schedule == "refined":
        info_specs["grav_diag"] = P()

    @partial(shard_map, mesh=mesh,
             in_specs=(field_specs, P(), P()),
             out_specs=(field_specs, info_specs),
             check_vma=False)
    def step_local(fields, kick, drift):
        C = fields["ipos"].shape[0]
        if gcap is not None:
            g = gcap
        else:
            # whole slabs ship when rcut exceeds the slab width; only
            # a boundary strip does otherwise
            wide = sp.rcut * ndev >= sp.boxsize
            g = C if wide else max(C // 4, block)
        fields, xinfo = exchange(fields, ndev, kcap)
        alive = fields["mass"] > 0

        accel_pm, _, _ = pm_forces_slab(
            fields["ipos"], fields["mass"], cfg_pm, ndev,
            halo=pm_halo)
        acc_tree, _pot, tinfo = tree_forces_slab(
            fields, sp, window_tables, ndev, g, tree_nlevels,
            tree_ncrit, maxi, maxl, block, schedule=schedule,
            sub=sub, pcaps=pcaps,
            fcap=fcap, traversal=traversal, engine=engine)

        accel = accel_pm + acc_tree
        vel = jnp.where(alive[:, None],
                        fields["vel"] + accel * kick, fields["vel"])
        dx = vel * drift * jnp.float32(POS_SCALE / cfg_pm.boxsize)
        ipos = jnp.where(alive[:, None],
                         fields["ipos"]
                         + dx.astype(jnp.int32).astype(jnp.uint32),
                         fields["ipos"])
        oldacc = jnp.where(alive,
                           jnp.linalg.norm(accel, axis=-1) / sp.G,
                           fields["oldacc"])
        out = dict(fields)
        out.update(ipos=ipos, vel=vel, oldacc=oldacc)
        info = dict(xinfo)
        info.update(tinfo)
        return out, info

    return jax.jit(step_local)


def make_sharded_step(mesh: Mesh, cfg_pm: PMConfig,
                      sp: ShortRangeParams, window_tables,
                      tree_nlevels: int = 6, tree_ncrit: int = 32,
                      maxi: int = 1024, maxl: int = 512,
                      block: int = 128):
    """Build the jitted multi-chip KDK training step.

    step(ipos, vel, mass, oldacc, kick, drift) -> (ipos, vel, oldacc)
    with particle arrays sharded over 'dp'.
    """

    # pencil-distributed FFT when the mesh divides evenly (the usual
    # case); replicated FFT as fallback for odd device counts
    ndev = mesh.devices.size
    use_pencil = (cfg_pm.nmesh % ndev == 0
                  and (cfg_pm.nmesh // ndev) % ndev == 0)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp", None), P("dp", None), P("dp"), P("dp"),
                       P(), P()),
             out_specs=(P("dp", None), P("dp", None), P("dp")),
             # the traversal's conditional appends are data-dependent per
             # device; disable the varying-manual-axes strictness check
             check_vma=False)
    def step_local(ipos, vel, mass, oldacc, kick, drift):
        if use_pencil:
            from .pfft import pm_forces_pencil
            accel_pm = pm_forces_pencil(ipos, mass, cfg_pm)
        else:
            accel_pm = pm_forces_replicated_fft(ipos, mass, cfg_pm)
        accel_tree = tree_forces_sharded(
            ipos, mass, oldacc, sp, window_tables, tree_nlevels,
            tree_ncrit, maxi, maxl, block)
        vel = vel + (accel_pm + accel_tree) * kick
        dx = vel * drift * jnp.float32(POS_SCALE / cfg_pm.boxsize)
        ipos = ipos + dx.astype(jnp.int32).astype(jnp.uint32)
        newacc = jnp.linalg.norm(accel_pm + accel_tree, axis=-1) / sp.G
        return ipos, vel, newacc

    return jax.jit(step_local)
