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
