"""Fused steady-state stencil path: one dispatch, on-device cap check.

stencilgrav syncs a diagnostic vector to the host every call to grow
its static caps; on the remote-tunnel TPU that sync dominates the
non-force step time.  stencilgrav_fused runs the identical schedule
with FROZEN caps and reports sufficiency in an on-device `ok` flag
(the treewalk maxnumngb-retry protocol, libgadget/treewalk2.c,
reformulated as optimistic execution + deferred validation).
"""

import numpy as np
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.gravity.stencil import stencilgrav, stencilgrav_fused
from tests.test_refined_gravity import _params
from tests.test_tree import random_particles, BOX


def _ipos_mass(n, seed, clustered=True):
    pos, mass = random_particles(n, seed=seed, clustered=clustered)
    params = _params(use_bh=0)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    return ipos, jnp.asarray(mass), params


def test_fused_matches_slow_path():
    ipos, mass, params = _ipos_mass(900, 31)
    tc, cc = {}, {}
    acc_slow, pot_slow, _ = stencilgrav(ipos, mass, params,
                                        tier_cache=tc, caps_cache=cc,
                                        want_pot=True)
    acc_f, pot_f, ok = stencilgrav_fused(ipos, mass, params,
                                         tier_cache=tc,
                                         caps_cache=cc,
                                         want_pot=True)
    assert bool(ok)
    # identical schedule + identical caps -> bitwise identical forces
    np.testing.assert_array_equal(np.asarray(acc_slow),
                                  np.asarray(acc_f))
    np.testing.assert_array_equal(np.asarray(pot_slow),
                                  np.asarray(pot_f))


def test_fused_cold_cache_falls_back():
    ipos, mass, params = _ipos_mass(600, 32)
    tc = {}
    acc_f, _, ok = stencilgrav_fused(ipos, mass, params,
                                     tier_cache=tc)
    assert bool(ok)
    acc_slow, _, _ = stencilgrav(ipos, mass, params)
    np.testing.assert_array_equal(np.asarray(acc_slow),
                                  np.asarray(acc_f))
    # the fallback seeded the cache: next call takes the fused path
    assert any(k[0] == "stencil_tbc" for k in tc)


def test_fused_detects_cap_overflow():
    """Caps seeded on a uniform box must flag ok=False when the same
    fused program sees a strongly clustered box (higher per-cell
    counts), instead of silently truncating the candidate lists."""
    n = 1024
    params = _params(use_bh=0)
    pos_u, mass_u = random_particles(n, seed=33, clustered=False)
    ipos_u = jnp.asarray(float_to_ipos(pos_u, BOX))
    tc = {}
    stencilgrav(ipos_u, jnp.asarray(mass_u), params, tier_cache=tc)

    # same n (same static shapes), much denser clustering
    rng = np.random.default_rng(34)
    pos_c = (rng.normal(scale=0.01 * BOX, size=(n, 3))
             + 0.5 * BOX).astype(np.float32) % BOX
    ipos_c = jnp.asarray(float_to_ipos(pos_c, BOX))
    mass_c = jnp.asarray(mass_u)
    _, _, ok = stencilgrav_fused(ipos_c, mass_c, params,
                                 tier_cache=tc)
    assert not bool(ok)
    # the redo protocol: slow path regrows the caches, after which
    # the fused program fits again and reproduces it exactly
    acc_slow, _, _ = stencilgrav(ipos_c, mass_c, params,
                                 tier_cache=tc)
    acc_f, _, ok2 = stencilgrav_fused(ipos_c, mass_c, params,
                                      tier_cache=tc)
    assert bool(ok2)
    np.testing.assert_array_equal(np.asarray(acc_slow),
                                  np.asarray(acc_f))
