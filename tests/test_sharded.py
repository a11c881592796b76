"""Multi-chip (8 virtual CPU devices) TreePM step tests.

The mpirun -np 4 analog: the sharded step must equal the single-device
computation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos, POS_SCALE
from shenqi_tpu.parallel.sharded import (make_mesh, shard_particles,
                                         make_sharded_step)
from shenqi_tpu.gravity.pm import PMConfig, pm_forces
from shenqi_tpu.gravity.shortrange import ShortRangeParams
from shenqi_tpu.gravity.shortrange_blocked import treegrav_blocked
from shenqi_tpu.ops.tree import build_octree

BOX = 50000.0
G = 43007.1


def _setup(n_side=12, seed=3):
    rng = np.random.RandomState(seed)
    grid = (np.arange(n_side) + 0.5) * BOX / n_side
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    pos += rng.uniform(-0.3, 0.3, pos.shape) * (BOX / n_side)
    pos %= BOX
    # keep the global array Morton-sorted (the domain invariant)
    from shenqi_tpu.ops.morton import morton_key
    ip = float_to_ipos(pos, BOX)
    keys = np.asarray(morton_key(jnp.asarray(ip)))
    order = np.argsort(keys)
    pos = pos[order]
    n = len(pos)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    vel = jnp.asarray(rng.normal(0, 10, (n, 3)).astype(np.float32))
    mass = jnp.ones(n, jnp.float32)
    return ipos, vel, mass


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 devices"
    ipos, vel, mass, = _setup(12)
    n = ipos.shape[0]
    nmesh = 24
    cellsize = BOX / nmesh
    cfg = PMConfig(nmesh=nmesh, boxsize=BOX, G=G, asmth=1.5)
    sp = ShortRangeParams(boxsize=BOX, cellsize=cellsize,
                          rcut=6 * cellsize, asmth=1.5, use_bh=1,
                          softening=BOX / 12 / 30 * 2.8, G=G)
    kick = jnp.float32(1e-4)
    drift = jnp.float32(1e-4)
    oldacc = jnp.zeros(n, jnp.float32)

    # ---- single-device reference ----
    accel_pm, _, _ = pm_forces(ipos, mass, cfg, want_potential=False)
    tree = build_octree(ipos, mass, mass > 0, BOX, nlevels=5, ncrit=16)
    accel_tree, _, _ = treegrav_blocked(tree, oldacc, sp, None,
                                        maxi=1024, maxl=512, ncrit=16)
    vel_ref = vel + (accel_pm + accel_tree) * kick
    dx = vel_ref * drift * jnp.float32(POS_SCALE / BOX)
    ipos_ref = ipos + dx.astype(jnp.int32).astype(jnp.uint32)

    # ---- 8-device sharded step ----
    mesh = make_mesh(8)
    step = make_sharded_step(mesh, cfg, sp, None, tree_nlevels=5,
                             tree_ncrit=16, maxi=1024, maxl=512,
                             block=64)
    ipos_s, vel_s, mass_s, oldacc_s = shard_particles(
        mesh, ipos, vel, mass, oldacc)
    ipos_out, vel_out, acc_out = step(ipos_s, vel_s, mass_s, oldacc_s,
                                      kick, drift)

    vel_out = np.asarray(vel_out)
    vel_ref = np.asarray(vel_ref)
    scale = np.abs(vel_ref - np.asarray(vel)).max()
    np.testing.assert_allclose(vel_out, vel_ref, atol=2e-5 * scale
                               + 1e-7)
    # integer positions nearly identical (float roundoff can differ by
    # one fixed-point tick)
    dpos = (np.asarray(ipos_out).astype(np.int64)
            - np.asarray(ipos_ref).astype(np.int64))
    assert np.abs(dpos).max() <= 2
