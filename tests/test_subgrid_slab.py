"""Distributed rare-source subgrid passes vs single-device physics.

winds/metal-return/veldisp (winds.cpp, metal_return.c, veldisp2.cpp)
run distributed via parallel/subgrid_slab: rare sources are gathered
to every device, per-source gas sums are psum'd, draws are keyed by
particle id — so an 8-device run must reproduce the single-device
stream row for row (aligned by pid)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.parallel.sharded import make_mesh
from shenqi_tpu.parallel.domain import distribute_slabs
from shenqi_tpu.parallel.subgrid_slab import (
    gather_rows, winds_slab, source_env_slab, metal_return_slab,
    veldisp_slab)

BOX = 1000.0


def _state(n=3000, seed=3):
    rng = np.random.RandomState(seed)
    pos = np.concatenate([
        rng.uniform(0, BOX, (n // 2, 3)),
        rng.normal([300, 300, 300], 30, (n - n // 2, 3)) % BOX])
    vel = rng.normal(scale=30.0, size=(n, 3)).astype(np.float32)
    return pos, vel


def _mesh_or_skip():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def _dist(mesh, fields):
    sharded, C = distribute_slabs(mesh, fields, block=64)
    return sharded


def _align(pid_slab, pid_ref, arr_slab):
    """Map slab rows (by pid) onto reference row order."""
    a = np.asarray(arr_slab)
    out = np.zeros((len(pid_ref),) + a.shape[1:], a.dtype)
    lookup = {int(p): i for i, p in enumerate(pid_slab)}
    for j, p in enumerate(pid_ref):
        out[j] = a[lookup[int(p)]]
    return out


def test_gather_rows():
    mesh = _mesh_or_skip()
    pos, vel = _state(512)
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    fields = {"ipos": ipos, "mass": np.ones(n, np.float32),
              "vel": vel, "pid": np.arange(n, dtype=np.int32)}
    sh = _dist(mesh, fields)
    mask = (np.asarray(sh["pid"]) % 7 == 0) & \
        (np.asarray(sh["mass"]) > 0)
    out, valid, ovf = gather_rows(
        mesh, {"pid": sh["pid"], "mass": sh["mass"],
               "ipos": sh["ipos"]}, jnp.asarray(mask), cap=64)
    assert ovf == 0
    got = np.sort(np.asarray(out["pid"])[np.asarray(valid)])
    want = np.sort(np.arange(n)[np.arange(n) % 7 == 0])
    np.testing.assert_array_equal(got, want)


def test_spawn_stars_slab():
    """Distributed star spawning (slots_split_particle analog):
    children land in local dead rows with the parent's position, the
    incremented generation in the id's top byte, and exact mass
    conservation; overflow is counted, never dropped."""
    from shenqi_tpu.parallel.subgrid_slab import spawn_stars_slab
    mesh = _mesh_or_skip()
    pos, vel = _state(1500, seed=9)
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    mass = np.full(n, 0.02, np.float32)
    pid = np.arange(1, n + 1, dtype=np.uint64)
    fields = {"ipos": ipos, "mass": mass,
              "vel": vel.astype(np.float32),
              "id_lo": (pid & np.uint64(0xFFFFFFFF)).astype(
                  np.uint32),
              "id_hi": (pid >> np.uint64(32)).astype(np.uint32),
              "gen": np.zeros(n, np.int32),
              "ptyp": np.zeros(n, np.int32),
              "birtha": np.zeros(n, np.float32),
              "tbin": np.full(n, 3, np.int32),
              "hsml": np.full(n, 5.0, np.float32),
              "met": np.full(n, 0.004, np.float32),
              "sfr": np.ones(n, np.float32),
              "entropy": np.full(n, 50.0, np.float32)}
    sh = _dist(mesh, fields)
    alive = np.asarray(sh["mass"]) > 0
    spawn = alive & (np.asarray(sh["id_lo"]) % 11 == 0)
    nreq = int(spawn.sum())
    mstar = np.where(spawn, 0.005, 0.0).astype(np.float32)
    f2, n_sp, ovf = spawn_stars_slab(
        mesh, sh, jnp.asarray(spawn), jnp.asarray(mstar),
        atime=0.31, cap=128)
    assert ovf == 0 and n_sp == nreq
    np.testing.assert_allclose(float(jnp.sum(f2["mass"])),
                               float(mass.sum()), rtol=1e-6)
    child = (~alive) & (np.asarray(f2["mass"]) > 0)
    assert int(child.sum()) == nreq
    assert np.all(np.asarray(f2["ptyp"])[child] == 4)
    np.testing.assert_allclose(np.asarray(f2["mass"])[child], 0.005,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f2["birtha"])[child], 0.31,
                               rtol=1e-6)
    assert np.all(np.asarray(f2["gen"])[child] == 1)
    assert np.all((np.asarray(f2["id_hi"])[child] >> 24) == 1)
    # every child's base id matches exactly one spawning parent, and
    # the child inherits that parent's position (same slab by
    # construction); star bookkeeping fields reset
    base = np.asarray(f2["id_lo"])[child]
    np.testing.assert_array_equal(
        np.sort(base), np.sort(np.asarray(sh["id_lo"])[spawn]))
    lookup = {int(p): i for i, p
              in enumerate(np.asarray(sh["id_lo"]))}
    ip0, ip2 = np.asarray(sh["ipos"]), np.asarray(f2["ipos"])
    for row in np.nonzero(child)[0]:
        np.testing.assert_array_equal(
            ip2[row], ip0[lookup[int(np.asarray(f2["id_lo"])[row])]])
    assert np.all(np.asarray(f2["sfr"])[child] == 0)
    assert np.all(np.asarray(f2["entropy"])[child] == 0)
    # parents: mass reduced, generation bumped, still gas
    np.testing.assert_allclose(np.asarray(f2["mass"])[spawn], 0.015,
                               rtol=1e-6)
    assert np.all(np.asarray(f2["gen"])[spawn] == 1)
    assert np.all(np.asarray(f2["ptyp"])[spawn] == 0)
    assert np.all((np.asarray(f2["id_hi"])[spawn] >> 24) == 0)
    # cap exhaustion: cap=1 per device satisfies at most 8 requests
    f3, n_sp3, ovf3 = spawn_stars_slab(
        mesh, sh, jnp.asarray(spawn), jnp.asarray(mstar),
        atime=0.31, cap=1)
    assert n_sp3 + ovf3 == nreq and ovf3 > 0


def test_winds_slab_matches_single_device():
    from shenqi_tpu.physics.winds import (WindParams,
                                          WIND_MODEL_OFJT10,
                                          winds_star_feedback)
    mesh = _mesh_or_skip()
    pos, vel = _state(2000, seed=5)
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    mass = np.full(n, 0.01, np.float32)
    ent = np.full(n, 50.0, np.float32)
    dens = np.full(n, 1e-8, np.float32)
    delay = np.zeros(n, np.float32)
    pid = np.arange(1, n + 1, dtype=np.uint32)

    # 5 stars at clustered positions, padded to an 8-lane bucket
    S = 8
    sidx = np.array([n // 2 + 1, n // 2 + 7, n // 2 + 19,
                     n // 2 + 23, 11])
    s_ipos = np.zeros((S, 3), ipos.dtype)
    s_ipos[:5] = ipos[sidx]
    s_hsml = np.zeros(S, np.float32)
    s_hsml[:5] = 60.0
    s_mass = np.zeros(S, np.float32)
    s_mass[:5] = 0.01
    s_vdisp = np.zeros(S, np.float32)
    s_vdisp[:5] = 120.0
    s_pid = np.zeros(S, np.uint32)
    s_pid[:5] = pid[sidx]

    wp = WindParams(WindModel=WIND_MODEL_OFJT10, WindSigma0=353.0,
                    WindSpeedFactor=3.7, WindFreeTravelLength=20.0,
                    MaxWindFreeTravelTime=10.0,
                    WindFreeTravelDensThresh=1e-12)
    atime, a3inv = 0.5, 8.0
    elig = np.ones(n, bool)
    elig[sidx] = False
    key = jax.random.PRNGKey(7)

    v1, e1, d1 = winds_star_feedback(
        key, jnp.asarray(s_ipos), jnp.asarray(s_hsml),
        jnp.asarray(s_mass), jnp.asarray(s_vdisp), jnp.asarray(ipos),
        jnp.asarray(mass), jnp.asarray(vel), jnp.asarray(ent),
        jnp.asarray(dens), jnp.asarray(delay), jnp.asarray(elig),
        BOX, atime, a3inv, wp, gas_pids=jnp.asarray(pid),
        star_pids=jnp.asarray(s_pid))
    assert np.linalg.norm(np.asarray(v1) - vel, axis=1).max() > 0

    fields = {"ipos": ipos, "mass": mass, "vel": vel,
              "entropy": ent, "density": dens, "delay": delay,
              "pid": pid.astype(np.int32),
              "elig": elig.astype(np.float32)}
    sh = _dist(mesh, fields)
    alive = np.asarray(sh["mass"]) > 0
    gas = {"ipos": sh["ipos"], "mass": sh["mass"], "vel": sh["vel"],
           "entropy": sh["entropy"], "density": sh["density"],
           "delay": sh["delay"],
           "eligible": jnp.asarray((np.asarray(sh["elig"]) > 0)
                                   & alive),
           "pid": jnp.asarray(np.asarray(sh["pid"]).astype(
               np.uint32))}
    stars = {"ipos": jnp.asarray(s_ipos),
             "hsml": jnp.asarray(s_hsml),
             "mass": jnp.asarray(s_mass),
             "vdisp": jnp.asarray(s_vdisp),
             "pid": jnp.asarray(s_pid)}
    v2, e2, d2 = winds_slab(mesh, key, gas, stars, wp, BOX, atime,
                            a3inv)

    pid_slab = np.asarray(sh["pid"])[alive]
    for ref, slab, rt in [(v1, v2, 1e-5), (e1, e2, 1e-5),
                          (d1, d2, 1e-5)]:
        got = _align(pid_slab, pid, np.asarray(slab)[alive])
        np.testing.assert_allclose(got, np.asarray(ref), rtol=rt,
                                   atol=1e-6)


def test_metal_return_slab_matches_single_device():
    from shenqi_tpu.physics.blackhole import bh_gas_environment
    from shenqi_tpu.physics.metal_return import metal_return_step
    mesh = _mesh_or_skip()
    pos, vel = _state(1500, seed=8)
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    mass = np.full(n, 0.02, np.float32)
    ent = np.full(n, 25.0, np.float32)
    pid = np.arange(n, dtype=np.int32)

    S = 8
    sidx = np.array([n // 2 + 3, n // 2 + 9, 100])
    s_ipos = np.zeros((S, 3), ipos.dtype)
    s_ipos[:3] = ipos[sidx]
    s_hsml = np.zeros(S, np.float32)
    s_hsml[:3] = 70.0
    mret = np.zeros(S, np.float32)
    mret[:3] = [0.003, 0.001, 0.002]
    zret = 0.4 * mret

    alive = np.ones(n, bool)
    env = bh_gas_environment(
        jnp.asarray(s_ipos), jnp.asarray(s_hsml), jnp.asarray(ipos),
        jnp.asarray(mass), jnp.asarray(ent), jnp.asarray(vel),
        jnp.asarray(alive), BOX)
    dm1, dz1 = metal_return_step(
        jnp.asarray(s_ipos), jnp.asarray(s_hsml), jnp.asarray(mret),
        jnp.asarray(zret), env.feedback_weight, jnp.asarray(ipos),
        jnp.asarray(mass), jnp.asarray(alive), BOX)

    fields = {"ipos": ipos, "mass": mass, "vel": vel,
              "entropy": ent, "pid": pid}
    sh = _dist(mesh, fields)
    salive = np.asarray(sh["mass"]) > 0
    gas = {"ipos": sh["ipos"], "mass": sh["mass"],
           "entropy": sh["entropy"], "vel": sh["vel"]}
    dens2, sent2, svel2, fw2 = source_env_slab(
        mesh, gas, {"ipos": jnp.asarray(s_ipos),
                    "hsml": jnp.asarray(s_hsml)}, BOX)
    np.testing.assert_allclose(np.asarray(fw2),
                               np.asarray(env.feedback_weight),
                               rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(np.asarray(dens2),
                               np.asarray(env.density),
                               rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(np.asarray(sent2),
                               np.asarray(env.entropy),
                               rtol=2e-5, atol=1e-30)

    dm2, dz2 = metal_return_slab(
        mesh, {"ipos": sh["ipos"], "mass": sh["mass"]},
        {"ipos": jnp.asarray(s_ipos), "hsml": jnp.asarray(s_hsml),
         "mret": jnp.asarray(mret), "zret": jnp.asarray(zret),
         "fw": fw2}, BOX)
    pid_slab = np.asarray(sh["pid"])[salive]
    for ref, slab in [(dm1, dm2), (dz1, dz2)]:
        got = _align(pid_slab, pid, np.asarray(slab)[salive])
        sc = np.abs(np.asarray(ref)).max() + 1e-30
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4,
                                   atol=1e-5 * sc)
    # conservation: distributed increments sum to the ejected mass
    assert float(jnp.sum(dm2)) == pytest.approx(float(mret.sum()),
                                                rel=1e-4)


def test_veldisp_slab_matches_single_device():
    from shenqi_tpu.physics.veldisp import dm_velocity_dispersion
    mesh = _mesh_or_skip()
    pos, vel = _state(3000, seed=11)
    n = len(pos)
    # first 2/3 DM sources, last 1/3 gas targets
    ndm = 2 * n // 3
    ipos = np.asarray(float_to_ipos(pos, BOX))
    dm_mass = np.full(ndm, 0.05, np.float32)
    atime = 0.5
    sep = BOX / ndm ** (1 / 3)
    r0 = np.full(n - ndm, 2 * sep, np.float32)

    sig1, rad1, rho1 = dm_velocity_dispersion(
        jnp.asarray(ipos[:ndm]), jnp.asarray(vel[:ndm]),
        jnp.asarray(dm_mass), jnp.ones(ndm, bool),
        jnp.asarray(ipos[ndm:]), jnp.asarray(r0), BOX, atime,
        nlevels=8)

    mass = np.concatenate([dm_mass, np.full(n - ndm, 0.01,
                                            np.float32)])
    ptyp = np.concatenate([np.ones(ndm, np.int32),
                           np.zeros(n - ndm, np.int32)])
    fields = {"ipos": ipos, "mass": mass, "vel": vel, "ptyp": ptyp,
              "pid": np.arange(n, dtype=np.int32)}
    sh = _dist(mesh, fields)
    alive = np.asarray(sh["mass"]) > 0
    is_dm = (np.asarray(sh["ptyp"]) == 1) & alive
    is_gas = (np.asarray(sh["ptyp"]) == 0) & alive
    dmm = jnp.where(jnp.asarray(is_dm), sh["mass"], 0.0)
    rad0 = jnp.where(jnp.asarray(is_gas), jnp.float32(2 * sep), 0.0)
    sig2, rad2, rho2, info = veldisp_slab(
        mesh, {"ipos": sh["ipos"], "mass": dmm, "vel": sh["vel"]},
        rad0, BOX, atime, nlevels=8)
    assert int(info["halo_lost"]) == 0

    pid_slab = np.asarray(sh["pid"])[is_gas]
    pid_ref = np.arange(ndm, n)
    for ref, slab, rt in [(sig1, sig2, 5e-4), (rad1, rad2, 5e-4),
                          (rho1, rho2, 1e-3)]:
        got = _align(pid_slab, pid_ref, np.asarray(slab)[is_gas])
        sc = np.abs(np.asarray(ref)).max() + 1e-30
        np.testing.assert_allclose(got, np.asarray(ref), rtol=rt,
                                   atol=1e-4 * sc)
