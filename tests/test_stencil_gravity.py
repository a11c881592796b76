"""Grid-stencil gravity vs the f64 direct oracle + the tree engines.

The stencil scheme has no MAC at all (direct P2P within rcut + cell
slop), so it must be at least as accurate as every walk engine on the
same force law (engine-vs-engine oracle strategy, runtests.cpp
analog).
"""

import numpy as np
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.gravity.stencil import stencilgrav
from tests.test_refined_gravity import _setup, _params
from tests.test_tree import _direct_short_range, random_particles, BOX


def _ipos_mass(n, seed):
    pos, mass = random_particles(n, seed=seed, clustered=True)
    params = _params(use_bh=0)
    expected, _ = _direct_short_range(pos.astype(np.float64),
                                      mass.astype(np.float64), params)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    return ipos, jnp.asarray(mass), params, expected


def test_stencil_matches_direct():
    ipos, mass, params, expected = _ipos_mass(700, 21)
    n = expected.shape[0]
    acc, pot, _ = stencilgrav(ipos, mass, params, want_pot=True)
    acc = np.asarray(acc)
    fmag = np.linalg.norm(expected, axis=1)
    scale = np.median(fmag[fmag > 0])
    err = np.linalg.norm(acc - expected, axis=1) / scale
    # no MAC: only the rcut cell-cut and f32 rounding remain
    assert np.percentile(err, 90) < 0.005, np.percentile(err, 90)
    assert np.percentile(err, 99) < 0.02


def test_stencil_matches_refined_engine():
    from shenqi_tpu.gravity.shortrange_refined import treegrav_refined
    from shenqi_tpu.ops.tree import build_octree
    ipos, mass, params, expected = _ipos_mass(900, 22)
    n = expected.shape[0]
    tree = build_octree(ipos, mass, jnp.ones(n, bool), BOX,
                        nlevels=6, ncrit=8)
    oldacc = jnp.full(n, 50.0, jnp.float32)
    acc_t, _, _ = treegrav_refined(tree, oldacc, params, maxi=4096,
                                   maxl=1024, ncrit=8, sub=32)
    acc_s, _, _ = stencilgrav(ipos, mass, params)
    at = np.asarray(acc_t)
    as_ = np.asarray(acc_s)
    fmag = np.linalg.norm(expected, axis=1)
    scale = np.median(fmag[fmag > 0])
    err_t = np.linalg.norm(at - expected, axis=1) / scale
    err_s = np.linalg.norm(as_ - expected, axis=1) / scale
    # the stencil applies the reference's hard rcut cut (the oracle
    # does not), so it cannot beat the walk against THIS oracle —
    # but MAC-free direct P2P must stay the same order of accuracy
    assert np.percentile(err_s, 90) < 0.005
    assert err_s.mean() <= err_t.mean() * 3 + 1e-3


def test_stencil_sparse_active_fallback():
    ipos, mass, params, expected = _ipos_mass(800, 23)
    n = expected.shape[0]
    rng = np.random.RandomState(5)
    active = rng.rand(n) < 0.1          # sparse actives: exercises
    nact = int(active.sum())            # the per-target fallback
    acc, _, _ = stencilgrav(ipos, mass, params,
                            active=jnp.asarray(active),
                            n_targets=nact)
    acc = np.asarray(acc)
    fmag = np.linalg.norm(expected, axis=1)
    scale = np.median(fmag[fmag > 0])
    err = np.linalg.norm(acc[active] - expected[active],
                         axis=1) / scale
    assert np.percentile(err, 90) < 0.005
    assert np.all(acc[~active] == 0.0)


def test_stencil_odd_n_and_dead_rows():
    ipos, mass, params, expected = _ipos_mass(653, 24)
    n = expected.shape[0]
    mass_np = np.asarray(mass).copy()
    dead = np.zeros(n, bool)
    dead[::13] = True
    mass_np[dead] = 0.0
    acc, _, _ = stencilgrav(ipos, jnp.asarray(mass_np), params)
    acc = np.asarray(acc)
    assert np.all(acc[dead] == 0.0)
    assert np.isfinite(acc).all()
    # alive-only oracle
    from shenqi_tpu.core.particles import POS_SCALE
    pos = np.asarray(ipos).astype(np.float64) * (BOX / 2 ** 32)
    exp_alive, _ = _direct_short_range(pos[~dead],
                                       mass_np[~dead].astype(np.float64),
                                       params)
    fmag = np.linalg.norm(exp_alive, axis=1)
    scale = np.median(fmag[fmag > 0])
    err = np.linalg.norm(acc[~dead] - exp_alive, axis=1) / scale
    assert np.percentile(err, 90) < 0.005


def test_stencil_capped_kernel_split_matches_full():
    """The capped-Newton main pass + near-cell spline correction must
    reproduce the full spline kernel (want_pot=True disables the
    split, so the two calls take different code paths)."""
    from shenqi_tpu.gravity.window import window_polynomials
    ipos, mass, params, _ = _ipos_mass(800, 25)
    wt = window_polynomials(params.asmth)
    acc_split, _, _ = stencilgrav(ipos, mass, params, wt)
    acc_full, _, _ = stencilgrav(ipos, mass, params, wt,
                                 want_pot=True)
    a1 = np.asarray(acc_split)
    a2 = np.asarray(acc_full)
    scale = np.median(np.linalg.norm(a2, axis=1))
    d = np.linalg.norm(a1 - a2, axis=1)
    assert np.max(d) / scale < 1e-5, np.max(d) / scale


def test_stencil_active_subset():
    """Active-source stencil (the hierarchical-gravity per-bin path):
    sources = masked subset, targets compacted to the subset — must
    equal the full-call rows for a subset-only system."""
    ipos, mass, params, _ = _ipos_mass(900, 23)
    n = mass.shape[0]
    rng = np.random.RandomState(5)
    sel = rng.rand(n) < 0.4
    selj = jnp.asarray(sel)
    mass_sel = jnp.where(selj, mass, 0.0)

    acc_a, _, _ = stencilgrav(ipos, mass_sel, params,
                              n_targets=int(sel.sum()), active=selj)
    # oracle: a fresh system containing ONLY the selected particles
    acc_f, _, _ = stencilgrav(ipos, mass_sel, params)
    aa = np.asarray(acc_a)
    af = np.asarray(acc_f)
    assert np.allclose(aa[sel], af[sel], rtol=1e-5, atol=1e-7)
    assert np.all(aa[~sel] == 0.0)


def test_stencil_pallas_engine_interpret():
    """engine='pallas' (fused VMEM pair kernel over the packed stencil
    tables, interpret mode on CPU) must match the xla pass: the
    kernel evaluates the exact spline+window force, so agreement is
    f32-tight."""
    from shenqi_tpu.gravity.window import window_polynomials
    ipos, mass, params, _ = _ipos_mass(500, 33)
    wt = window_polynomials(params.asmth)
    acc_p, _, _ = stencilgrav(ipos, mass, params, wt,
                              engine="pallas")
    acc_x, _, _ = stencilgrav(ipos, mass, params, wt, engine="xla")
    ap = np.asarray(acc_p)
    ax = np.asarray(acc_x)
    scale = np.median(np.linalg.norm(ax, axis=1))
    d = np.linalg.norm(ap - ax, axis=1) / scale
    assert np.percentile(d, 99) < 1e-4, np.percentile(d, 99)
    assert np.isfinite(ap).all()


def test_stencil_mxu_engine_accuracy():
    """engine='mxu' (matmul r^2 + matmul accumulation) must hold the
    same accuracy bars as the elementwise pass vs the f64 oracle:
    the capped-Newton split keeps softened pairs immune to the
    |t|^2+|s|^2-2t.s cancellation (flat kernel below h + exact near
    correction)."""
    from shenqi_tpu.gravity.window import window_polynomials
    ipos, mass, params, expected = _ipos_mass(900, 31)
    wt = window_polynomials(params.asmth)
    acc_m, _, _ = stencilgrav(ipos, mass, params, wt, engine="mxu")
    acc_x, _, _ = stencilgrav(ipos, mass, params, wt, engine="xla")
    am = np.asarray(acc_m)
    ax = np.asarray(acc_x)
    fmag = np.linalg.norm(expected, axis=1)
    scale = np.median(fmag[fmag > 0])
    err_m = np.linalg.norm(am - expected, axis=1) / scale
    assert np.percentile(err_m, 90) < 0.005, np.percentile(err_m, 90)
    assert np.percentile(err_m, 99) < 0.02
    # and the two engines agree tightly pair-for-pair
    d = np.linalg.norm(am - ax, axis=1) / scale
    assert np.percentile(d, 99) < 2e-3, np.percentile(d, 99)
