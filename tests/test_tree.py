"""Octree build invariants + short-range tree force accuracy.

Mirrors the reference's test_forcetree (structure/moments) and
test_gravity / runtests flag-99 (tree force vs direct pairwise sum with
the same erfc window)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.special import erfc

from shenqi_tpu.core.particles import float_to_ipos, POS_SCALE
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.ops.morton import morton_key, key_to_cell
from shenqi_tpu.gravity.shortrange import (ShortRangeParams, treegrav,
                                           short_range_window,
                                           spline_force,
                                           TABLE_RANGE_CELLS)

BOX = 64000.0


def random_particles(n, seed=0, clustered=False):
    rng = np.random.RandomState(seed)
    if clustered:
        # a few gaussian clumps + uniform background
        ncl = n // 2
        centers = rng.uniform(0, BOX, (8, 3))
        which = rng.randint(0, 8, ncl)
        pos_cl = centers[which] + rng.normal(0, BOX / 50, (ncl, 3))
        pos_un = rng.uniform(0, BOX, (n - ncl, 3))
        pos = np.concatenate([pos_cl, pos_un]) % BOX
    else:
        pos = rng.uniform(0, BOX, (n, 3))
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    return pos, mass


def build(pos, mass, alive=None, nlevels=6, ncrit=8):
    n = len(pos)
    if alive is None:
        alive = np.ones(n, bool)
    return build_octree(jnp.asarray(float_to_ipos(pos, BOX)),
                        jnp.asarray(mass), jnp.asarray(alive),
                        BOX, nlevels=nlevels, ncrit=ncrit)


def test_tree_moments():
    """Every valid node's (mass, cofm) equals the sum over its range."""
    pos, mass = random_particles(500, clustered=True)
    tree = build(pos, mass)
    mass_s = np.asarray(tree.mass_s)
    pos_s = np.asarray(tree.ipos_s, dtype=np.float64) * (BOX / 2 ** 32)
    valid = np.asarray(tree.valid)
    pstart = np.asarray(tree.pstart)
    pcount = np.asarray(tree.pcount)
    nmass = np.asarray(tree.mass)
    cofm = np.asarray(tree.cofm)
    checked = 0
    for i in np.nonzero(valid)[0]:
        s, c = pstart[i], pcount[i]
        if s >= len(mass_s):
            continue
        msum = mass_s[s:s + c].sum()
        assert nmass[i] == pytest.approx(msum, rel=1e-5), i
        if msum > 0:
            com = (mass_s[s:s + c, None]
                   * pos_s[s:s + c]).sum(axis=0) / msum
            np.testing.assert_allclose(cofm[i], com, rtol=1e-4,
                                       atol=BOX * 1e-6)
        checked += 1
    assert checked > 50
    # root contains everything
    assert nmass[0] == pytest.approx(mass.sum(), rel=1e-5)


def test_tree_ranges_partition():
    """At each level, valid cells partition the ALIVE particle rows.

    Dead rows sort to the tail under the sentinel key and count ZERO
    (pcount is alive-only — a raw count let the all-dead sentinel
    leaf flag leaf_truncated forever once the dead fraction exceeded
    ncrit, e.g. the non-gas rows of a mixed-species SPH tree)."""
    pos, mass = random_particles(300, seed=2)
    alive = np.ones(300, bool)
    alive[250:] = False  # some dead particles
    tree = build(pos, mass, alive)
    valid = np.asarray(tree.valid)
    pstart = np.asarray(tree.pstart)[valid]
    pcount = np.asarray(tree.pcount)[valid]
    length = np.asarray(tree.length)[valid]
    # group nodes by level via their cell length
    for ll in np.unique(length):
        sel = (length == ll) & (pcount > 0)
        s = pstart[sel]
        c = pcount[sel]
        o = np.argsort(s)
        s, c = s[o], c[o]
        assert s[0] == 0
        np.testing.assert_array_equal(s[1:], (s + c)[:-1])
        assert (s + c)[-1] == 250


def test_tree_sibling_linkage():
    """Walking child/sibling pointers from the root visits every valid
    level-1..L node exactly once (the walk order invariant)."""
    pos, mass = random_particles(200, seed=3)
    tree = build(pos, mass, nlevels=4, ncrit=4)
    child = np.asarray(tree.child)
    sibling = np.asarray(tree.sibling)
    valid = np.asarray(tree.valid)
    is_leaf = np.asarray(tree.is_leaf)
    visited = set()
    no = int(tree.root_child)
    steps = 0
    while no >= 0 and steps < 100000:
        assert no not in visited
        visited.add(no)
        steps += 1
        if child[no] >= 0:
            no = int(child[no])
        else:
            no = int(sibling[no])
    # every visited node is valid
    assert all(valid[i] for i in visited)
    # visited leaves cover all particles
    pstart = np.asarray(tree.pstart)
    pcount = np.asarray(tree.pcount)
    covered = np.zeros(200, bool)
    for i in visited:
        if child[i] < 0:
            covered[pstart[i]:pstart[i] + pcount[i]] = True
    assert covered.all()


def _direct_short_range(pos, mass, params: ShortRangeParams):
    """f64 brute-force periodic short-range force with the erfc window."""
    n = len(pos)
    acc = np.zeros((n, 3))
    pot = np.zeros(n)
    h = params.softening
    for i in range(n):
        dx = pos - pos[i]
        dx -= params.boxsize * np.round(dx / params.boxsize)
        r2 = (dx ** 2).sum(axis=1)
        r = np.sqrt(r2)
        u = r / h
        # spline-softened newton
        with np.errstate(divide="ignore", invalid="ignore"):
            fac = mass / (r2 * r)
            facpot = -mass / r
        inner = u < 0.5
        fac_in = mass / h ** 3 * (10.666666666667
                                  + u ** 2 * (32.0 * u - 38.4))
        wp_in = -2.8 + u ** 2 * (5.333333333333
                                 + u ** 2 * (6.4 * u - 9.6))
        with np.errstate(divide="ignore", invalid="ignore"):
            fac_out = mass / h ** 3 * (21.333333333333 - 48.0 * u
                                       + 38.4 * u ** 2
                                       - 10.666666666667 * u ** 3
                                       - 0.066666666667 / u ** 3)
            wp_out = (-3.2 + 0.066666666667 / u
                      + u ** 2 * (10.666666666667
                                  + u * (-16.0
                                         + u * (9.6
                                                - 2.133333333333 * u))))
        soft = r2 < h * h
        fac = np.where(soft, np.where(inner, fac_in, fac_out), fac)
        facpot = np.where(soft, mass / h * np.where(inner, wp_in, wp_out),
                          facpot)
        # window
        uu = r / params.cellsize * (0.5 / params.asmth)
        fw = erfc(uu) + 2 * uu / np.sqrt(np.pi) * np.exp(-uu ** 2)
        pw = erfc(uu)
        inrange = r < TABLE_RANGE_CELLS * params.cellsize
        fw = np.where(inrange, fw, 0.0)
        pw = np.where(inrange, pw, 0.0)
        fac = np.nan_to_num(fac * fw, nan=0.0, posinf=0.0)
        facpot = np.nan_to_num(facpot * pw, nan=0.0)
        # self term: r=0 -> softened potential -2.8 m/h, zero force
        facpot[i] = -2.8 * mass[i] / h * pw[i]
        acc[i] = (dx * fac[:, None]).sum(axis=0)
        pot[i] = facpot.sum()
    return acc * params.G, pot * params.G


def _params(nmesh=32, **kw):
    cellsize = BOX / nmesh
    d = dict(boxsize=BOX, cellsize=cellsize, rcut=6.0 * cellsize,
             asmth=1.5, err_tol_force_acc=0.002, bh_opening_angle=0.175,
             use_bh=0, softening=BOX / 32 / 30 * 2.8, G=43007.1)
    d.update(kw)
    return ShortRangeParams(**d)


def test_tree_force_vs_direct_random():
    """Tree short-range force vs f64 brute force: sub-percent errors."""
    pos, mass = random_particles(400, seed=4, clustered=True)
    params = _params()
    expected_acc, expected_pot = _direct_short_range(
        pos.astype(np.float64), mass.astype(np.float64), params)

    tree = build(pos, mass, nlevels=6, ncrit=8)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    # first step: no old accelerations -> BH angle criterion
    oldacc = jnp.zeros(len(pos), jnp.float32)
    acc, pot, nint = treegrav(tree, ipos, oldacc,
                              dataclasses_replace(params, use_bh=1))
    acc = np.asarray(acc)
    # errors relative to the typical force magnitude
    fmag = np.linalg.norm(expected_acc, axis=1)
    scale = np.median(fmag[fmag > 0])
    err = np.linalg.norm(acc - expected_acc, axis=1) / scale
    assert np.percentile(err, 90) < 0.01
    assert err.max() < 0.1
    # potential agrees too
    pot = np.asarray(pot)
    perr = np.abs(pot - expected_pot) / np.median(np.abs(expected_pot))
    assert np.percentile(perr, 90) < 0.01


def dataclasses_replace(params: ShortRangeParams, **kw):
    return params._replace(**kw)


def test_tree_force_acc_criterion():
    """With the relative-acceleration criterion and realistic oldacc the
    force is at least as accurate as pure BH."""
    pos, mass = random_particles(300, seed=5, clustered=True)
    params = _params()
    expected_acc, _ = _direct_short_range(
        pos.astype(np.float64), mass.astype(np.float64), params)
    tree = build(pos, mass, nlevels=6, ncrit=8)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    oldacc = jnp.asarray(np.linalg.norm(expected_acc, axis=1)
                         / params.G).astype(jnp.float32)
    acc, pot, nint = treegrav(tree, ipos, oldacc, params)
    acc = np.asarray(acc)
    fmag = np.linalg.norm(expected_acc, axis=1)
    scale = np.median(fmag[fmag > 0])
    err = np.linalg.norm(acc - expected_acc, axis=1) / scale
    assert np.percentile(err, 90) < 0.005


def test_lattice_force_is_zero():
    """A uniform lattice has zero net short-range force by symmetry."""
    ng = 8
    grid = (np.arange(ng) + 0.5) * BOX / ng
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    mass = np.ones(len(pos), np.float32)
    params = _params(nmesh=16)
    tree = build(pos, mass, nlevels=5, ncrit=8)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    acc, pot, _ = treegrav(tree, ipos,
                           jnp.zeros(len(pos), jnp.float32),
                           dataclasses_replace(params, use_bh=1))
    acc = np.asarray(acc)
    # normalize against the force from one neighbor at lattice spacing
    a_ref = params.G * 1.0 / (BOX / ng) ** 2
    assert np.abs(acc).max() < 2e-2 * a_ref


def test_window_polynomial_matches_table():
    """Chebyshev window fit matches the calibrated table to <2e-4
    (TPU production form; table gathers crash the axon worker)."""
    import jax.numpy as jnp
    from shenqi_tpu.gravity.window import (window_arrays,
                                           window_polynomials)
    from shenqi_tpu.gravity.shortrange import short_range_window
    tab = window_arrays(1.5)
    poly = window_polynomials(1.5)
    cellsize = 1.0
    r = jnp.linspace(0.0, float(poly.xmax) * 1.05, 4001)
    fw_t, pw_t = short_range_window(r, cellsize, 1.5, tab)
    fw_p, pw_p = short_range_window(r, cellsize, 1.5, poly)
    # the force table carries ~1e-3 calibration measurement noise
    # which the fit smooths; agreement is bounded by that noise and
    # stays well inside ErrTolForceAcc=2e-3
    assert float(jnp.abs(fw_t - fw_p).max()) < 2.5e-3
    rin = r < 6.5
    assert float(jnp.abs(fw_t[rin] - fw_p[rin]).max()) < 1.2e-3
    assert float(jnp.abs(pw_t - pw_p).max()) < 2e-4
    # beyond range both are zero
    assert float(fw_p[-1]) == 0.0 and float(pw_p[-1]) == 0.0


def test_deep_tree_60bit_keys():
    """nlevels > 10 engages the 60-bit (hi, lo) Morton key pair: cells
    below level 10 must still partition ranges, carry exact moments,
    and resolve a sub-cell-scale clump (the 512^3+ clustering case the
    30-bit keys could not, utils/peano.h:7-8 parity)."""
    rng = np.random.RandomState(4)
    n = 2000
    # one clump far tighter than a level-10 cell (box/1024)
    clump = (BOX * 0.3 + rng.normal(0, BOX / 2 ** 14, (n // 2, 3)))
    rest = rng.uniform(0, BOX, (n - n // 2, 3))
    pos = np.concatenate([clump, rest]) % BOX
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    tree = build(pos, mass, nlevels=14, ncrit=8)

    valid = np.asarray(tree.valid)
    pstart = np.asarray(tree.pstart)
    pcount = np.asarray(tree.pcount)
    nmass = np.asarray(tree.mass)
    mass_s = np.asarray(tree.mass_s)
    length = np.asarray(tree.length)

    # moments exact at every level incl. below level 10
    for i in np.nonzero(valid)[0][::7]:
        s, c = pstart[i], pcount[i]
        if s >= n:
            continue
        assert nmass[i] == pytest.approx(mass_s[s:s + c].sum(),
                                         rel=1e-5)
    # deep levels actually split the clump: some valid level-14 cells
    # hold a strict subset of it
    deep = valid & (length < BOX / 2 ** 10 * 1.01) & (pcount > 0) \
        & (pstart < n)
    assert deep.sum() > 8, "deep levels never resolved the clump"
    # partition property at the deepest level
    ll = length[valid].min()
    sel = valid & (length == ll)
    s, c = pstart[sel], pcount[sel]
    o = np.argsort(s)
    s, c = s[o], c[o]
    np.testing.assert_array_equal(s[1:], (s + c)[:-1])

    # force through the deep tree still matches the direct sum
    params = _params(nmesh=16)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    acc_tree = treegrav(tree, ipos,
                        jnp.asarray(np.zeros(n, np.float32)),
                        params)[0]
    acc_dir, _ = _direct_short_range(pos.astype(np.float64),
                                     mass.astype(np.float64), params)
    err = np.linalg.norm(np.asarray(acc_tree) - acc_dir, axis=1)
    scale = np.linalg.norm(acc_dir, axis=1).mean() + 1e-30
    assert np.percentile(err / scale, 90) < 0.02
