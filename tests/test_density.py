"""SPH density tests (mirrors the reference test_density coverage)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.sph.kernels import (CUBIC, QUINTIC, wk, dwk, desnumngb,
                                    volume)
from shenqi_tpu.sph.density import density, density_walk, make_gas_payload

BOX = 10000.0


def test_kernel_normalization():
    """integral of W over the support volume = 1 (for each kernel)."""
    for spec in (CUBIC, QUINTIC):
        H = 2.0
        r = np.linspace(0, H, 20001)
        u = r / H
        w = np.asarray(wk(spec, jnp.asarray(u), H))
        integral = np.trapezoid(4 * np.pi * r ** 2 * w, r)
        assert integral == pytest.approx(1.0, rel=1e-5)
        # dwk is the derivative of wk
        wnum = np.gradient(w, r)
        dw = np.asarray(dwk(spec, jnp.asarray(u), H))
        sel = (r > 0.05 * H) & (r < 0.95 * H)
        # (3% slack: np.gradient is noisy at the spline knots in f32)
        np.testing.assert_allclose(dw[sel], wnum[sel], rtol=3e-2,
                                   atol=1e-4)


def _uniform_gas(ng=10, jitter=0.0, seed=0):
    rng = np.random.RandomState(seed)
    grid = (np.arange(ng) + 0.5) * BOX / ng
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    if jitter:
        pos += rng.uniform(-jitter, jitter, pos.shape) * (BOX / ng)
    pos %= BOX
    n = len(pos)
    mass = np.full(n, 1.5, np.float32)
    return pos, mass


def _setup(pos, mass, hsml0):
    n = len(pos)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    tree = build_octree(ipos, jnp.asarray(mass), jnp.ones(n, bool), BOX,
                        nlevels=6, ncrit=16, hsml=jnp.full(n, hsml0,
                                                           jnp.float32))
    vel = jnp.zeros((n, 3), jnp.float32)
    entvar = jnp.ones(n, jnp.float32)
    payload = make_gas_payload(tree, vel, entvar)
    return ipos, tree, vel, entvar, payload


def test_uniform_density():
    """Uniform lattice: converged density = mean density everywhere."""
    pos, mass = _uniform_gas(10)
    n = len(pos)
    mean_rho = mass.sum() / BOX ** 3
    sep = BOX / 10
    ipos, tree, vel, entvar, payload = _setup(pos, mass, 2.0 * sep)
    out = density(tree, payload, ipos, vel, jnp.ones(n, jnp.float32),
                  np.full(n, 2.0 * sep, np.float32), BOX, CUBIC, eta=1.0)
    des = desnumngb(CUBIC, 1.0)
    # converged neighbor counts within the deviation band
    assert np.all(np.abs(np.asarray(out.numngb) - des) < 3.0)
    np.testing.assert_allclose(np.asarray(out.density), mean_rho,
                               rtol=2e-2)
    # velocities are zero -> no div/curl
    assert np.abs(np.asarray(out.div_vel)).max() < 1e-5
    assert np.abs(np.asarray(out.curl_vel)).max() < 1e-5


def test_density_brute_force():
    """Walk result equals the O(N^2) kernel sum at fixed hsml."""
    pos, mass = _uniform_gas(6, jitter=0.4, seed=3)
    n = len(pos)
    hsml = np.full(n, 2.2 * BOX / 6, np.float32)
    rng = np.random.RandomState(4)
    vel = rng.normal(size=(n, 3)).astype(np.float32) * 10
    entvar = rng.uniform(0.5, 2.0, n).astype(np.float32)

    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    tree = build_octree(ipos, jnp.asarray(mass), jnp.ones(n, bool), BOX,
                        nlevels=5, ncrit=8)
    payload = make_gas_payload(tree, jnp.asarray(vel),
                               jnp.asarray(entvar))
    res = density_walk(tree, payload, ipos, jnp.asarray(vel),
                       jnp.asarray(hsml), BOX, CUBIC)

    # brute force in f64
    rho_bf = np.zeros(n)
    div_bf = np.zeros(n)
    egy_bf = np.zeros(n)
    for i in range(n):
        d = pos[i] - pos
        d -= BOX * np.round(d / BOX)
        r = np.linalg.norm(d, axis=1)
        H = hsml[i]
        inside = r < H
        u = r / H
        w = np.asarray(wk(CUBIC, jnp.asarray(u), H))
        dw = np.asarray(dwk(CUBIC, jnp.asarray(u), H))
        rho_bf[i] = (mass * w)[inside].sum()
        egy_bf[i] = (mass * entvar * w)[inside].sum()
        with np.errstate(invalid="ignore", divide="ignore"):
            fac = np.where(r > 0, mass * dw / r, 0.0)
        dv = vel[i] - vel
        div_bf[i] = -(fac * np.einsum("ij,ij->i", d, dv))[inside].sum()
    np.testing.assert_allclose(np.asarray(res.rho), rho_bf, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.egy_rho), egy_bf,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.div), div_bf, rtol=1e-3,
                               atol=1e-8 * np.abs(div_bf).max())


def test_density_walk_dense_matches_tree():
    """The all-sources oracle (run_walk_dense) is physics-identical to
    the vmapped tree walk — it exists only because the tree walk's
    batched gathers OOM on TPU at production source counts."""
    from shenqi_tpu.sph.density import (density_walk_dense,
                                        _density_accum_cached)
    pos, mass = _uniform_gas(6, jitter=0.4, seed=11)
    n = len(pos)
    hsml = np.full(n, 2.2 * BOX / 6, np.float32)
    rng = np.random.RandomState(12)
    vel = rng.normal(size=(n, 3)).astype(np.float32) * 10
    entvar = rng.uniform(0.5, 2.0, n).astype(np.float32)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    tree = build_octree(ipos, jnp.asarray(mass), jnp.ones(n, bool),
                        BOX, nlevels=5, ncrit=8)
    payload = make_gas_payload(tree, jnp.asarray(vel),
                               jnp.asarray(entvar))
    ref = density_walk(tree, payload, ipos, jnp.asarray(vel),
                       jnp.asarray(hsml), BOX, CUBIC)
    # src_chunk > n exercises the padding path; a small chunk
    # exercises the scan
    from shenqi_tpu.ops import treewalk as tw
    for chunk in (8192, 64):
        dense = tw.run_walk_dense(
            payload, ipos,
            {"hsml": jnp.asarray(hsml), "vel": jnp.asarray(vel)},
            tuple(jnp.zeros_like(x) for x in ref),
            _density_accum_cached(CUBIC), BOX, src_chunk=chunk)
        for a, b in zip(ref, dense):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)
    # and through the public wrapper
    dres = density_walk_dense(payload, ipos, jnp.asarray(vel),
                              jnp.asarray(hsml), BOX, CUBIC)
    np.testing.assert_allclose(np.asarray(dres.rho),
                               np.asarray(ref.rho), rtol=1e-5)


def test_hsml_adapts_to_clustering():
    """Clustered region gets smaller hsml than voids."""
    rng = np.random.RandomState(7)
    nc, nu = 600, 400
    pos = np.concatenate([
        BOX / 2 + rng.normal(0, BOX / 40, (nc, 3)),
        rng.uniform(0, BOX, (nu, 3))]) % BOX
    n = len(pos)
    mass = np.ones(n, np.float32)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    tree = build_octree(ipos, jnp.asarray(mass), jnp.ones(n, bool), BOX,
                        nlevels=6, ncrit=16)
    vel = jnp.zeros((n, 3), jnp.float32)
    payload = make_gas_payload(tree, vel, jnp.ones(n, jnp.float32))
    hsml0 = np.full(n, BOX / 10, np.float32)
    out = density(tree, payload, ipos, vel, jnp.ones(n, jnp.float32),
                  hsml0, BOX, CUBIC, eta=1.0)
    des = desnumngb(CUBIC, 1.0)
    numngb = np.asarray(out.numngb)
    assert np.mean(np.abs(numngb - des) < 5.0) > 0.95
    hs = np.asarray(out.hsml)
    assert np.median(hs[:nc]) < 0.5 * np.median(hs[nc:])
    # density reflects clustering
    dens = np.asarray(out.density)
    assert np.median(dens[:nc]) > 5 * np.median(dens[nc:])
