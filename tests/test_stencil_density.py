"""Grid-stencil SPH density vs the per-particle oracle walk.

Engine-vs-engine oracle strategy (runtests.cpp analog): the stencil
enumeration must reproduce density_walk (reference semantics,
densitytree2.hpp:362-425) to f32 tolerance on every accumulator.
"""

import numpy as np
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.sph.density import density_walk, make_gas_payload
from shenqi_tpu.sph.kernels import CUBIC
from shenqi_tpu.sph.stencil_density import (build_grid_sph,
                                            stencil_density_walk)

BOX = 10000.0


def _gas(n, seed, clustered=True):
    rng = np.random.default_rng(seed)
    if clustered:
        ncl = n // 4
        centers = rng.uniform(0, BOX, (8, 3))
        blob = (centers[rng.integers(0, 8, ncl)]
                + rng.normal(scale=0.04 * BOX, size=(ncl, 3)))
        rest = rng.uniform(0, BOX, (n - ncl, 3))
        pos = np.concatenate([blob, rest]).astype(np.float32) % BOX
    else:
        pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    vel = rng.normal(scale=50.0, size=(n, 3)).astype(np.float32)
    entvar = rng.uniform(0.8, 1.2, n).astype(np.float32)
    return pos, mass, vel, entvar


def _compare(n=900, seed=41, k=3, subset=None):
    pos, mass, vel, entvar = _gas(n, seed)
    sep = BOX / n ** (1 / 3)
    rng = np.random.default_rng(seed + 1)
    hsml = rng.uniform(1.5, 2.5, n).astype(np.float32) * sep

    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    massj = jnp.asarray(mass)
    velj = jnp.asarray(vel)
    entj = jnp.asarray(entvar)
    hj = jnp.asarray(hsml)

    # oracle: per-particle treewalk
    tree = build_octree(ipos, massj, jnp.ones(n, bool), BOX,
                        nlevels=7, ncrit=16)
    payload = make_gas_payload(tree, velj, entj)
    if subset is None:
        t_ipos, t_vel, t_h = ipos, velj, hj
    else:
        selj = jnp.asarray(subset)
        t_ipos, t_vel, t_h = ipos[selj], velj[selj], hj[selj]
    oracle = density_walk(tree, payload, t_ipos, t_vel, t_h, BOX,
                          CUBIC)

    grid = build_grid_sph(ipos, massj, velj, entj, k)
    res, cover, _ = stencil_density_walk(grid, t_ipos, t_vel, t_h,
                                         BOX, k, spec=CUBIC)
    cov = np.asarray(cover)
    ok = ~cov
    assert ok.sum() > 0.9 * len(cov), f"cover fallback too wide: " \
        f"{cov.sum()}/{len(cov)}"
    for name, a, b in zip(oracle._fields, oracle, res):
        a = np.asarray(a)[ok]
        b = np.asarray(b)[ok]
        scale = np.maximum(np.abs(a).max(), 1e-20)
        err = np.abs(a - b).max() / scale
        assert err < 2e-5, f"{name}: rel err {err}"
    return cov


def test_stencil_density_matches_oracle():
    _compare(n=900, seed=41, k=3)


def test_stencil_density_uniform_no_cover():
    # jittered lattice: a Poisson-random box has real O(30%) shot
    # noise in the kernel density at ~33 neighbours
    ng = 9
    rng = np.random.default_rng(43)
    grid1 = (np.arange(ng) + 0.5) * BOX / ng
    X, Y, Z = np.meshgrid(grid1, grid1, grid1, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    pos += rng.uniform(-0.1, 0.1, pos.shape) * (BOX / ng)
    pos = (pos % BOX).astype(np.float32)
    n = len(pos)
    mass = np.ones(n, np.float32)
    vel = np.zeros((n, 3), np.float32)
    entvar = np.ones(n, np.float32)
    sep = BOX / n ** (1 / 3)
    hsml = np.full(n, 2.0 * sep, np.float32)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    grid = build_grid_sph(ipos, jnp.asarray(mass), jnp.asarray(vel),
                          jnp.asarray(entvar), 3)
    res, cover, ncov = stencil_density_walk(
        grid, ipos, jnp.asarray(vel), jnp.asarray(hsml), BOX, 3)
    assert int(np.asarray(cover).sum()) == 0
    # physics sanity: mean density of a uniform box
    mean_rho = mass.sum() / BOX ** 3
    rho = np.asarray(res.rho)
    assert abs(np.median(rho) / mean_rho - 1) < 0.2


def test_stencil_density_subset_targets():
    """Subset iterations of the hsml loop walk a gathered subset."""
    n = 700
    rng = np.random.default_rng(44)
    subset = np.sort(rng.choice(n, 160, replace=False))
    # k=2 -> cell ~ 2.2 mean seps, the production sizing rule (a k=3
    # grid at n=700 puts hsml ~ 2.3 cells and the W=7 window
    # correctly flags wide blocks as cover)
    _compare(n=n, seed=45, k=2, subset=subset)


def test_stencil_engine_full_hsml_loop():
    """density(engine='stencil') converges to the same smoothing
    lengths and densities as the oracle walk engine."""
    from shenqi_tpu.sph.density import density
    pos, mass, vel, entvar = _gas(500, 47)
    n = len(pos)
    sep = BOX / n ** (1 / 3)
    hsml0 = np.full(n, 1.8 * sep, np.float32)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    tree = build_octree(ipos, jnp.asarray(mass), jnp.ones(n, bool),
                        BOX, nlevels=7, ncrit=16)
    payload = make_gas_payload(tree, jnp.asarray(vel),
                               jnp.asarray(entvar))
    kwargs = dict(boxsize=BOX, spec=CUBIC, eta=1.0)
    d_ref = density(tree, payload, ipos, jnp.asarray(vel),
                    jnp.asarray(entvar), hsml0, engine="walk",
                    **kwargs)
    d_st = density(tree, payload, ipos, jnp.asarray(vel),
                   jnp.asarray(entvar), hsml0, engine="stencil",
                   **kwargs)
    h_r = np.asarray(d_ref.hsml)
    h_s = np.asarray(d_st.hsml)
    # bisection paths may differ on ngb-boundary particles; bulk must
    # agree tightly
    match = np.isclose(h_r, h_s, rtol=5e-3)
    assert match.mean() > 0.97, match.mean()
    rho_r = np.asarray(d_ref.density)[match]
    rho_s = np.asarray(d_st.density)[match]
    np.testing.assert_allclose(rho_s, rho_r, rtol=2e-4)


def test_stencil_density_flags_wide_hsml_as_cover():
    """Targets probing beyond the W^3 window must be flagged, not
    silently truncated."""
    pos, mass, vel, entvar = _gas(600, 46, clustered=False)
    n = len(pos)
    hsml = np.full(n, 0.02 * BOX, np.float32)
    hsml[5] = 0.45 * BOX          # a void prober
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    grid = build_grid_sph(ipos, jnp.asarray(mass), jnp.asarray(vel),
                          jnp.asarray(entvar), 4)
    res, cover, ncov = stencil_density_walk(
        grid, ipos, jnp.asarray(vel), jnp.asarray(hsml), BOX, 4)
    cov = np.asarray(cover)
    assert cov[5]
