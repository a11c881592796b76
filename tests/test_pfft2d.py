"""2-D processor-grid pencil FFT (petapm.cpp:217-255 procgrid
analog): transform parity vs numpy rfftn, roundtrip, and PM force
parity vs the single-device path, on (4,2) and (2,4) device grids."""

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
from shenqi_tpu.parallel.pfft2d import (make_mesh2d, pfft2d_r2c,
                                        pfft2d_c2r, pm_forces_brick,
                                        measure_power_pencil2d)
from shenqi_tpu.gravity.pm import PMConfig, pm_forces

BOX = 50000.0
G = 43007.1
N = 16


@pytest.mark.parametrize("d1,d2", [(4, 2), (2, 4)])
def test_pfft2d_forward_matches_rfftn(d1, d2):
    mesh = make_mesh2d(d1, d2)
    rng = np.random.RandomState(3)
    field = rng.normal(size=(N, N, N)).astype(np.float32)
    k = N // 2 + 1
    k2 = ((k + d2 - 1) // d2) * d2

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dpx", "dpy", None),),
             out_specs=P(None, "dpx", "dpy"), check_vma=False)
    def fwd(brick):
        return pfft2d_r2c(brick, N)

    got = np.asarray(jax.jit(fwd)(jnp.asarray(field)))[:, :, :k]
    want = np.fft.rfftn(field)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("d1,d2", [(4, 2)])
def test_pfft2d_roundtrip(d1, d2):
    mesh = make_mesh2d(d1, d2)
    rng = np.random.RandomState(5)
    field = rng.normal(size=(N, N, N)).astype(np.float32)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dpx", "dpy", None),),
             out_specs=P("dpx", "dpy", None), check_vma=False)
    def rt(brick):
        return pfft2d_c2r(pfft2d_r2c(brick, N), N)

    got = np.asarray(jax.jit(rt)(jnp.asarray(field)))
    np.testing.assert_allclose(got, field, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("d1,d2", [(4, 2), (2, 4)])
def test_pm_forces_brick_matches_single_device(d1, d2):
    mesh = make_mesh2d(d1, d2)
    npart = 1024
    rng = np.random.RandomState(11)
    pos = rng.uniform(0, BOX, (npart, 3))
    ipos = np.asarray(float_to_ipos(pos, BOX))
    mass = rng.uniform(0.5, 2.0, npart).astype(np.float32)
    nmesh = 32
    cfg = PMConfig(nmesh=nmesh, boxsize=BOX, G=G, asmth=1.5)

    want, _, _ = pm_forces(jnp.asarray(ipos), jnp.asarray(mass), cfg,
                           want_potential=False)
    want = np.asarray(want)

    # x-slab domain over dpx; round-robin over dpy inside each slab
    l1 = int(np.log2(d1))
    xslab = (ipos[:, 0] >> np.uint32(32 - l1)).astype(np.int64)
    C = int(np.ceil(npart / (d1 * d2) * 2.0))
    buf_i = np.zeros((d1, d2, C, 3), np.uint32)
    buf_m = np.zeros((d1, d2, C), np.float32)
    buf_pid = np.full((d1, d2, C), -1, np.int64)
    fill = np.zeros((d1, d2), np.int64)
    for p in range(npart):
        s = xslab[p]
        j = p % d2
        if fill[s, j] >= C:
            j = int(np.argmin(fill[s]))
        r = fill[s, j]
        buf_i[s, j, r] = ipos[p]
        buf_m[s, j, r] = mass[p]
        buf_pid[s, j, r] = p
        fill[s, j] += 1

    @partial(shard_map, mesh=mesh,
             in_specs=(P(("dpx", "dpy")), P(("dpx", "dpy")),),
             out_specs=(P(("dpx", "dpy")), P(), P()),
             check_vma=False)
    def forces(ip, mm):
        acc, ps, lost = pm_forces_brick(ip, mm, cfg, d1, d2, halo=2,
                                        mask=mm > 0, want_power=True)
        return acc, ps.norm, lost

    acc, norm, lost = jax.jit(forces)(
        jnp.asarray(buf_i.reshape(-1, 3)),
        jnp.asarray(buf_m.reshape(-1)))
    assert int(lost) == 0
    acc = np.asarray(acc).reshape(d1, d2, C, 3)
    got = np.zeros((npart, 3), np.float32)
    pid = buf_pid.reshape(-1)
    got[pid[pid >= 0]] = acc.reshape(-1, 3)[pid >= 0]
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale)
    # the k=0 norm must equal (sum mass)^2 like the 1-D pencil
    assert float(norm) == pytest.approx(float(mass.sum()) ** 2,
                                        rel=1e-4)


@pytest.mark.parametrize("d1,d2", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_pm_forces_brick_dp_matches_single_device(d1, d2):
    """Flat-axis procgrid PM (pm_forces_brick_dp, the product wiring
    for --mesh AxB): forces from the 1-D domain layout routed through
    the (d1,d2) brick must match the single-device pm_forces."""
    from shenqi_tpu.parallel.domain import distribute_slabs
    from shenqi_tpu.parallel.pfft2d import pm_forces_brick_dp
    from shenqi_tpu.parallel.sharded import make_mesh
    if jax.device_count() < d1 * d2:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.RandomState(7)
    n = 3000
    pos = np.concatenate([
        rng.uniform(0, BOX, (n // 2, 3)),
        rng.normal([0.3 * BOX] * 3, 0.05 * BOX, (n - n // 2, 3))
        % BOX])
    ipos = np.asarray(float_to_ipos(pos, BOX))
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    cfg = PMConfig(nmesh=N, boxsize=BOX, G=G, asmth=1.5)
    ref, _, ps_ref = pm_forces(jnp.asarray(ipos), jnp.asarray(mass),
                               cfg, want_potential=False)
    ref = np.asarray(ref)

    mesh = make_mesh(d1 * d2)
    fields = {"ipos": ipos, "mass": mass,
              "pid": np.arange(n, dtype=np.int32)}
    sharded, C = distribute_slabs(mesh, fields, block=64)

    def body(ip, ms):
        acc, ps, lost = pm_forces_brick_dp(
            ip, ms, cfg, d1, d2, mask=ms > 0, want_power=True)
        return acc, (ps.k, ps.power, ps.nmodes), lost

    run = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P("dp", None), P("dp")),
        out_specs=(P("dp", None), (P(), P(), P()), P()),
        check_vma=False))
    acc, (kk, pw, nm), lost = run(sharded["ipos"], sharded["mass"])
    assert int(lost) == 0
    got = np.zeros((n, 3), np.float32)
    pid = np.asarray(sharded["pid"])
    alive = np.asarray(sharded["mass"]) > 0
    got[pid[alive]] = np.asarray(acc)[alive]
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale)
    # P(k) parity too
    sel = np.asarray(ps_ref.nmodes) > 0
    np.testing.assert_allclose(np.asarray(pw)[sel],
                               np.asarray(ps_ref.power)[sel],
                               rtol=1e-4)
