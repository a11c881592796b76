"""Split PM solve (pm_depose_slab -> pm_forces_from_rhok) equals the
one-shot pm_forces_slab — the numerical core of the nu deposit reuse
(advisor r3 #1; gravpm.cpp:360 measures P(k) inside the force solve).
Covers both the uniform-slab (unrouted) and cost-balanced (routed)
layouts on the 8-virtual-device mesh."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.gravity.pm import PMConfig
from shenqi_tpu.parallel.domain import distribute_slabs, collect_alive
from shenqi_tpu.parallel.pfft import (pm_forces_slab, pm_depose_slab,
                                      pm_forces_from_rhok)

BOX = 32000.0
N = 32
NDEV = 8
G = 43007.1


def _mesh():
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:NDEV])
    return Mesh(devs, ("dp",))


def _nu_tables():
    nu_k = np.linspace(2 * np.pi / BOX, N * 2 * np.pi / BOX,
                       32).astype(np.float32)
    nu_fac = (1.0 + 0.05 * np.exp(-nu_k / nu_k[5])).astype(np.float32)
    return jnp.asarray(nu_k), jnp.asarray(nu_fac)


def test_split_pm_matches_oneshot():
    rng = np.random.RandomState(3)
    npart = 2048
    pos = rng.uniform(0, BOX, (npart, 3))
    ipos = float_to_ipos(pos, BOX)
    mass = np.ones(npart, np.float32)
    cfg = PMConfig(nmesh=N, boxsize=BOX, G=G, asmth=1.5)
    nu_k, nu_fac = _nu_tables()
    mesh = _mesh()

    fields = {"ipos": np.asarray(ipos), "mass": mass,
              "pid": np.arange(npart, dtype=np.int32)}
    sharded, C = distribute_slabs(mesh, fields, block=64)
    specs = {k: P("dp", *([None] * (np.ndim(v) - 1)))
             for k, v in sharded.items()}

    @partial(shard_map, mesh=mesh, in_specs=(specs, P(), P()),
             out_specs=(P("dp", None), P("dp", None)),
             check_vma=False)
    def both(f, nk, nf):
        alive = f["mass"] > 0
        acc1, _, _ = pm_forces_slab(
            f["ipos"], f["mass"], cfg, NDEV, halo=2, mask=alive,
            want_power=False, nu_k=nk, nu_fac=nf)
        rho_k, ps_pre, (ipos_dep, dep_mask, stay, perm, flat,
                        pm_lost) = pm_depose_slab(
            f["ipos"], f["mass"], cfg, NDEV, halo=2, mask=alive)
        acc2, ps_post = pm_forces_from_rhok(
            rho_k, ipos_dep, dep_mask, stay, perm, flat, cfg, NDEV,
            f["ipos"].shape[0], 0, halo=2, nu_k=nk, nu_fac=nf,
            want_power=True, routed=False)
        return acc1, acc2

    a1, a2 = jax.jit(both)(sharded, nu_k, nu_fac)
    out = collect_alive({"pid": np.asarray(sharded["pid"]),
                         "mass": np.asarray(sharded["mass"]),
                         "a1": np.asarray(a1), "a2": np.asarray(a2)})
    np.testing.assert_allclose(out["a2"], out["a1"], rtol=0,
                               atol=1e-6 * np.abs(out["a1"]).max())
