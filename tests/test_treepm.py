"""Total TreePM force vs mirror-box direct summation.

Reproduces the reference's gravity self-test (test_gravity.cpp:130-311):
direct f64 sum over 27 mirror boxes with spline softening, compared to
PM + tree with the reference tolerances meanerr < 0.8*ErrTol,
maxerr < 3*ErrTol (errors normalized by the mean |acc|)."""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # direct O(N^2) reference sum, ~1-2 min
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.gravity.treepm import (GravityConfig, treepm_forces,
                                       default_softening)

BOX = 64000.0
G = 43007.1


def _direct_mirror_force(pos, mass, h, g):
    """f64 softened Newtonian force summed over 27 mirror boxes."""
    n = len(pos)
    acc = np.zeros((n, 3))
    mirror = np.array([(x, y, z) for x in (-1, 0, 1) for y in (-1, 0, 1)
                       for z in (-1, 0, 1)], dtype=np.float64) * BOX
    for i in range(n):
        # dist points from source j to target i (reference sign);
        # [27, n, 3] broadcast over mirrors
        dist = mirror[:, None, :] + pos[i] - pos[None, :, :]
        r2 = (dist ** 2).sum(axis=-1)
        r = np.sqrt(r2)
        u = r / h
        with np.errstate(divide="ignore", invalid="ignore"):
            fac = 1.0 / (r2 * r)
            fac_in = 1.0 / h ** 3 * (10.666666666667
                                     + u ** 2 * (32.0 * u - 38.4))
            fac_out = 1.0 / h ** 3 * (
                21.333333333333 - 48.0 * u + 38.4 * u ** 2
                - 10.666666666667 * u ** 3
                - 0.066666666667 / u ** 3)
        fac = np.where(r < h, np.where(u < 0.5, fac_in, fac_out), fac)
        fac = np.where(r2 == 0, 0.0, fac)
        acc[i] = -(dist * (mass * fac)[..., None]).sum(axis=(0, 1)) * g
    return acc


def test_treepm_total_force():
    """Replica of the reference test_force_random configuration
    (test_gravity.cpp:316-341): 1/4 uniform, 1/2 in a clump at the box
    center, 1/4 in a tighter clump at 0.1 box; tolerances as asserted
    there (meanerr < 0.8 ErrTol, maxerr < 3 ErrTol, vs mean |acc|)."""
    n = 4096
    rng = np.random.RandomState(8)
    pos = np.empty((n, 3))
    u = rng.uniform(0, 1, (n, 3))
    pos[: n // 4] = BOX * u[: n // 4]
    pos[n // 4: 3 * n // 4] = (BOX / 2 + BOX / 8
                               * np.exp((u[n // 4: 3 * n // 4]
                                         - 0.5) ** 2))
    pos[3 * n // 4:] = (BOX * 0.1 + BOX / 32
                        * np.exp((u[3 * n // 4:] - 0.5) ** 2))
    pos %= BOX
    mass = np.ones(n)

    soft = default_softening(BOX, n, 1.0 / 30)
    errtol = 0.002
    cfg = GravityConfig(boxsize=BOX, nmesh=48, G=G, asmth=1.5,
                        rcut_cells=6.0, err_tol_force_acc=errtol,
                        softening=soft, tree_nlevels=8, tree_ncrit=8)

    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    massj = jnp.asarray(mass, dtype=jnp.float32)
    alive = jnp.ones(n, bool)
    oldacc = jnp.zeros(n, jnp.float32)

    # two-pass like the reference TreeUseBH=2: BH first, then rel-acc
    apm, atree, pot, ps = treepm_forces(ipos, massj, alive, oldacc, cfg,
                                        first_step=True)
    oldacc = jnp.linalg.norm(apm + atree, axis=1) / G
    apm, atree, pot, ps = treepm_forces(ipos, massj, alive, oldacc, cfg,
                                        first_step=False)
    total = np.asarray(apm + atree)

    expected = _direct_mirror_force(pos.astype(np.float64), mass, soft, G)

    meanacc = np.abs(expected).mean()
    err = np.abs(total - expected) / meanacc
    meanerr = err.mean()
    maxerr = err.max()
    print(f"meanerr={meanerr:.3e} maxerr={maxerr:.3e} (tol {errtol})")
    assert meanerr < 0.8 * errtol
    assert maxerr < 3 * errtol
