"""Cost-balanced slab domains (VERDICT r2 missing #3 / next #6).

The reference refines its toptree until no topleaf exceeds its cost
share and assigns segments balanced (libgadget/domain.cpp:48-57,620).
The slab analog: variable mesh-plane-aligned slab boundaries chosen
from per-x-plane cost histograms (domain.balance_cuts), with the PM
deposit routed to the uniform FFT slab layout through the round-trip
layout exchange (domain.route_rows — petapm.cpp:79-87 analog).

Asserts (1) the balance property on a clustered box: max/mean alive
rows per device <= 1.25 for balanced cuts vs >= 1.8 for uniform
slabs; (2) distributed-vs-single force parity THROUGH the balanced
path (exchange + routed PM + a2a-halo tree gravity with cuts);
(3) the route_rows/route_back round trip is exact.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map
from functools import partial

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.parallel.sharded import make_mesh, tree_forces_slab
from shenqi_tpu.parallel.domain import (balance_cuts,
                                        cuts_fp_from_planes,
                                        distribute_slabs,
                                        collect_alive, exchange,
                                        route_rows, route_back)
from shenqi_tpu.parallel.pfft import pm_forces_slab
from shenqi_tpu.gravity.pm import PMConfig, pm_forces
from shenqi_tpu.gravity.shortrange import ShortRangeParams

BOX = 50000.0
G = 43007.1
NDEV = 8
NMESH = 32          # PM mesh (cuts need not align with it)
NCOLS = 4096        # cost-histogram column granularity


def _clustered_pos(n, seed=11):
    """Strongly x-clustered: 70% of particles in a thin x-sheet."""
    rng = np.random.RandomState(seed)
    n_dense = int(0.7 * n)
    pos = rng.uniform(0, BOX, (n, 3))
    pos[:n_dense, 0] = (BOX * 0.40
                        + rng.normal(0, 0.01 * BOX, n_dense))
    return pos % BOX


def _col_hist(ipos_x):
    cols = (ipos_x.astype(np.uint64) * np.uint64(NCOLS)
            >> np.uint64(32)).astype(np.int64)
    return np.bincount(cols, minlength=NCOLS)


def test_balance_cuts_equalizes_load():
    pos = _clustered_pos(4096)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    hist = _col_hist(ipos[:, 0])
    cuts = balance_cuts(hist, NDEV)
    assert cuts[0] == 0 and cuts[-1] == NCOLS
    assert np.all(np.diff(cuts) >= 1)

    # occupancy per device under each decomposition
    per_balanced = np.add.reduceat(hist, cuts[:-1])
    per_uniform = hist.reshape(NDEV, NCOLS // NDEV).sum(axis=1)
    mean = hist.sum() / NDEV
    assert per_uniform.max() / mean >= 1.8, per_uniform
    assert per_balanced.max() / mean <= 1.25, per_balanced


def test_route_rows_round_trip():
    mesh = make_mesh(NDEV)
    C = 64
    rng = np.random.RandomState(2)
    vals = rng.normal(size=(NDEV * C, 3)).astype(np.float32)
    dest = rng.randint(0, NDEV, NDEV * C).astype(np.int32)
    valid = rng.rand(NDEV * C) > 0.2
    kcap = C

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp"), P("dp"), P("dp")),
             out_specs=(P("dp"), P()), check_vma=False)
    def ship(vals, dest, valid):
        me = jax.lax.axis_index("dp")
        recv, rvalid, state, lost = route_rows(
            {"v": vals}, dest, valid, NDEV, kcap)
        # remote computation: double the shipped rows
        out = jnp.where(rvalid[:, None], 2.0 * recv["v"], 0.0)
        back = route_back(out, state)
        # local rows (dest == me) double in place
        local = valid & (dest == me)
        res = jnp.where(local[:, None], 2.0 * vals, back)
        return res, lost

    res, lost = jax.jit(ship)(jnp.asarray(vals),
                              jnp.asarray(dest),
                              jnp.asarray(valid))
    assert int(lost) == 0
    want = np.where(valid[:, None], 2.0 * vals, 0.0)
    np.testing.assert_allclose(np.asarray(res), want, rtol=0, atol=0)


def test_balanced_slab_forces_match_single_device():
    """Force parity through the FULL balanced path: searchsorted
    exchange + routed PM deposit/readout + a2a-halo refined tree."""
    from shenqi_tpu.gravity.shortrange_refined import treegrav_refined
    from shenqi_tpu.ops.tree import build_octree

    pos = _clustered_pos(3000, seed=13)
    n = len(pos)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    mass = np.ones(n, np.float32)
    oldacc = np.zeros(n, np.float32)
    cfg = PMConfig(nmesh=NMESH, boxsize=BOX, G=G, asmth=1.5)
    sp = ShortRangeParams(boxsize=BOX, cellsize=BOX / NMESH,
                          rcut=6 * BOX / NMESH, asmth=1.5, use_bh=1,
                          softening=BOX / 14 / 30 * 2.8, G=G)

    accel_pm, _, _ = pm_forces(ipos, jnp.asarray(mass), cfg,
                               want_potential=False)
    tree = build_octree(ipos, jnp.asarray(mass),
                        jnp.asarray(mass) > 0, BOX, nlevels=5,
                        ncrit=16)
    accel_tree, _, _ = treegrav_refined(tree, jnp.asarray(oldacc),
                                        sp, None, maxi=1024,
                                        maxl=1024, ncrit=16, sub=32)
    accel_ref = np.asarray(accel_pm + accel_tree)

    mesh = make_mesh(NDEV)
    hist = _col_hist(np.asarray(ipos)[:, 0])
    cuts_planes = balance_cuts(hist, NDEV)
    cuts_in = cuts_fp_from_planes(cuts_planes, NCOLS)
    fields = {"ipos": np.asarray(ipos), "mass": mass,
              "oldacc": oldacc, "pid": np.arange(n, dtype=np.int32)}
    sharded, C = distribute_slabs(mesh, fields, block=64,
                                  cuts_in=cuts_in)
    # the balanced layout concentrates the dense sheet on fewer
    # planes per device: occupancy must beat uniform slabs
    occ = (np.asarray(sharded["mass"]).reshape(NDEV, C) > 0).sum(1)
    assert occ.max() / (n / NDEV) <= 1.25, occ

    specs = {k: P("dp", *([None] * (np.ndim(v) - 1)))
             for k, v in sharded.items()}
    info_specs = {"unsent": P(), "dropped": P(), "n_alive": P(),
                  "halo_lost": P(), "pm_lost": P(),
                  "walk_overflow": P(), "grav_diag": P()}

    @partial(shard_map, mesh=mesh, in_specs=(specs, P()),
             out_specs=(specs, P("dp", None), info_specs),
             check_vma=False)
    def forces(f, cuts):
        f, xinfo = exchange(f, NDEV, C, cuts_in=cuts)
        alive = f["mass"] > 0
        gpm, _, pm_lost = pm_forces_slab(
            f["ipos"], f["mass"], cfg, NDEV, halo=2, mask=alive,
            cuts_in=cuts, route_kcap=C)
        acc_t, _pot, tinfo = tree_forces_slab(
            {"ipos": f["ipos"], "mass": f["mass"],
             "oldacc": f["oldacc"]},
            sp, None, NDEV, C, 5, 16, 1024, 1024, 64,
            schedule="refined", sub=32,
            pcaps=(256, 512, 1024, 2048), cuts_in=cuts)
        info = dict(xinfo)
        info.update(tinfo)
        info["pm_lost"] = pm_lost
        return f, gpm + acc_t, info

    out, acc, info = jax.jit(forces)(sharded, jnp.asarray(cuts_in))
    assert int(info["dropped"]) == 0
    assert int(info["unsent"]) == 0
    assert int(info["pm_lost"]) == 0
    assert int(info["halo_lost"]) == 0
    assert int(info["walk_overflow"]) == 0, np.asarray(
        info["grav_diag"])
    assert int(info["n_alive"]) == n

    got = collect_alive({"pid": np.asarray(out["pid"]),
                         "mass": np.asarray(out["mass"]),
                         "acc": np.asarray(acc)})
    order = np.argsort(got["pid"])
    acc_out = got["acc"][order]
    scale = np.abs(accel_ref).max()
    np.testing.assert_allclose(acc_out, accel_ref,
                               atol=5e-4 * scale + 1e-7)
