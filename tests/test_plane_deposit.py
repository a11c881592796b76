"""Device-side integer plane deposit: exactness + sharding invariance.

Round-5 closes VERDICT r4 row 44: the reference writes lensing planes
inside the DISTRIBUTED loop (run.cpp:743-750, plane.cpp:120-318).  Our
deposit (physics/plane.plane_counts_ipos) is integer-exact, so the
--mesh loop and the single-device loop must produce bit-identical
count grids — validated here on the 8-virtual-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shenqi_tpu.physics.plane import (plane_counts_ipos,
                                      cut_plane_from_counts,
                                      cut_plane_gaussian_grid)

BOX = 250.0
RES = 64


def _ref_counts(ipos, alive, normal, center, thickness):
    """Independent numpy reference with the same exact integer math."""
    d0, d1 = (normal + 1) % 3, (normal + 2) % 3
    off = int(round(((center - thickness / 2) % BOX) / BOX * 2 ** 32))
    rel = (ipos[:, normal].astype(np.uint64)
           - np.uint64(off)) % np.uint64(2 ** 32)
    thick_u = int(round(thickness / BOX * 2 ** 32))
    in_slab = alive & (rel < np.uint64(thick_u))
    i0 = (ipos[:, d0].astype(np.uint64) * RES) >> np.uint64(32)
    i1 = (ipos[:, d1].astype(np.uint64) * RES) >> np.uint64(32)
    cnt = np.zeros((RES, RES), np.int64)
    np.add.at(cnt, (i0[in_slab].astype(int),
                    i1[in_slab].astype(int)), 1)
    return cnt, int(in_slab.sum())


def test_integer_deposit_matches_reference():
    rng = np.random.RandomState(7)
    n = 20000
    ipos = rng.randint(0, 2 ** 32, (n, 3), dtype=np.uint32)
    alive = rng.rand(n) < 0.9
    for normal, center, thickness in [(0, 60.0, 50.0),
                                      (2, 240.0, 40.0),
                                      (1, 125.0, 250.0)]:
        counts, n_plane = plane_counts_ipos(
            jnp.asarray(ipos), jnp.asarray(alive), BOX, normal,
            center, thickness, RES)
        ref, nref = _ref_counts(ipos, alive, normal, center,
                                thickness)
        assert int(n_plane) == nref
        np.testing.assert_array_equal(np.asarray(counts), ref)


def test_deposit_sharding_invariant():
    rng = np.random.RandomState(11)
    n = 8 * 1024
    ipos = rng.randint(0, 2 ** 32, (n, 3), dtype=np.uint32)
    alive = np.ones(n, bool)
    fn = jax.jit(lambda ip, al: plane_counts_ipos(
        ip, al, BOX, 0, 100.0, 60.0, RES))
    c1, n1 = fn(jnp.asarray(ipos), jnp.asarray(alive))

    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    sh = NamedSharding(mesh, P("x"))
    ip_sh = jax.device_put(jnp.asarray(ipos),
                           NamedSharding(mesh, P("x", None)))
    al_sh = jax.device_put(jnp.asarray(alive), sh)
    c8, n8 = fn(ip_sh, al_sh)
    assert int(n1) == int(n8)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c8))


def test_counts_path_matches_legacy_potential():
    """cut_plane_from_counts on the integer deposit reproduces the
    host cut_plane_gaussian_grid potential (same physics; binning
    differs only at measure-zero f64 bin edges, absent for random
    positions)."""
    from shenqi_tpu.cosmology.background import Cosmology
    from shenqi_tpu.utils.units import get_unitsystem
    units = get_unitsystem(3.085678e21, 1.989e43, 1e5)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, CMBTemperature=2.7255,
                   RadiationOn=1)
    cp.init(0.1, units)
    rng = np.random.RandomState(3)
    n = 30000
    ipos = rng.randint(0, 2 ** 32, (n, 3), dtype=np.uint32)
    alive = np.ones(n, bool)
    pos = ipos.astype(np.float64) * (BOX / 2 ** 32)
    atime, chi = 0.5, 800.0
    normal, center, thickness = 1, 120.0, 80.0

    pot_ref, n_ref = cut_plane_gaussian_grid(
        pos, alive, n, chi, BOX, cp, atime, normal, center,
        thickness, RES)
    counts, n_plane = plane_counts_ipos(
        jnp.asarray(ipos), jnp.asarray(alive), BOX, normal, center,
        thickness, RES)
    assert int(n_plane) == n_ref
    pot = cut_plane_from_counts(counts, n, chi, BOX, cp, atime,
                                thickness, RES)
    np.testing.assert_allclose(pot, pot_ref, rtol=1e-10, atol=0)
