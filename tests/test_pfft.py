"""Pencil-distributed FFT tests (heFFTe dataflow analog) on the
8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from shenqi_tpu.parallel.sharded import make_mesh, shard_particles
from shenqi_tpu.parallel.pfft import (pfft_r2c, pfft_c2r, pencil_kvec,
                                      pm_forces_pencil)

N = 32


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8)


def test_pfft_forward_matches_rfftn(mesh):
    rng = np.random.RandomState(0)
    x = rng.normal(size=(N, N, N)).astype(np.float32)

    @jax.jit
    def fwd(slab):
        return shard_map(pfft_r2c, mesh=mesh, in_specs=(P("dp"),),
                         out_specs=P(None, "dp", None),
                         check_vma=False)(slab)

    pencil = fwd(jax.device_put(x, NamedSharding(mesh, P("dp"))))
    # pencil layout [N, N/D, K] sharded on axis 1 -> global [N, N, K]
    got = np.asarray(pencil)
    ref = np.fft.rfftn(x.astype(np.float64))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-2 * np.abs(ref).max()


def test_pfft_roundtrip(mesh):
    rng = np.random.RandomState(1)
    x = rng.normal(size=(N, N, N)).astype(np.float32)

    @jax.jit
    def rt(slab):
        def inner(s):
            return pfft_c2r(pfft_r2c(s), N)
        return shard_map(inner, mesh=mesh, in_specs=(P("dp"),),
                         out_specs=P("dp"), check_vma=False)(slab)

    back = np.asarray(rt(jax.device_put(
        x, NamedSharding(mesh, P("dp")))))
    assert np.abs(back - x).max() < 1e-4


def test_pencil_kvec_layout(mesh):
    """ky covers every wavenumber exactly once across devices."""
    @jax.jit
    def kys():
        def inner():
            _, ky, _ = pencil_kvec(N)
            return ky[0, :, 0]
        return shard_map(inner, mesh=mesh, in_specs=(),
                         out_specs=P("dp"), check_vma=False)()

    ky_all = np.asarray(kys())
    k = np.arange(N, dtype=np.float32)
    expected = np.where(k <= N // 2, k, k - N)
    assert np.array_equal(ky_all, expected)


def test_pm_forces_pencil_matches_single_device(mesh):
    """Pencil-distributed PM == single-device PM at float tolerance."""
    from shenqi_tpu.gravity.pm import PMConfig, pm_forces
    from shenqi_tpu.core.particles import float_to_ipos

    box = 50000.0
    rng = np.random.RandomState(2)
    npart = 1024
    pos = rng.uniform(0, box, (npart, 3))
    ipos = float_to_ipos(pos, box)
    mass = np.full(npart, 2.0, np.float32)
    cfg = PMConfig(nmesh=N, boxsize=box, G=43007.1, asmth=1.5)

    acc_ref, _, _ = pm_forces(jnp.asarray(ipos), jnp.asarray(mass),
                              cfg, want_potential=False)

    ipos_s, mass_s = shard_particles(mesh, jnp.asarray(ipos),
                                     jnp.asarray(mass))

    @jax.jit
    def dist(ip, m):
        def inner(ip, m):
            return pm_forces_pencil(ip, m, cfg)
        return shard_map(inner, mesh=mesh, in_specs=(P("dp"), P("dp")),
                         out_specs=P("dp"), check_vma=False)(ip, m)

    acc = np.asarray(dist(ipos_s, mass_s))
    ref = np.asarray(acc_ref)
    scale = np.abs(ref).max()
    assert np.abs(acc - ref).max() < 1e-4 * scale
