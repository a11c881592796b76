"""Blocked neighbour engine vs the per-particle oracle walk.

The blocked engine (ops/treewalk.run_walk_blocked) is the production
TPU schedule for SPH density, hydro and veldisp; the vmapped per-target
walk is the reference-semantics oracle.  Identical physics — cross
check on clustered configurations (the reference's new-vs-old engine
strategy, as for gravity in test_blocked_gravity.py).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.ops.treewalk import TreeTooShallow
from shenqi_tpu.sph.density import density, make_gas_payload
from shenqi_tpu.sph.hydro import (HydroParams, hydro_walk,
                                  hydro_walk_blocked,
                                  hydro_time_factors, balsara_f1,
                                  pressure_predict)
from shenqi_tpu.utils.constants import GAMMA

BOX = 1000.0


def _clustered(n, seed=3):
    rng = np.random.RandomState(seed)
    pos = np.concatenate([
        rng.uniform(0, BOX, (n // 2, 3)),
        rng.normal([250] * 3, 30, (n // 4, 3)) % BOX,
        rng.normal([700] * 3, 15, (n - n // 2 - n // 4, 3)) % BOX])
    return pos, rng


def test_blocked_density_matches_walk():
    n = 1200
    pos, rng = _clustered(n)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    mass = jnp.ones(n, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    tree = build_octree(ipos, mass, jnp.ones(n, bool), BOX,
                        nlevels=9, ncrit=32)
    entvar = jnp.ones(n, jnp.float32)
    payload = make_gas_payload(tree, vel, entvar)
    hsml0 = np.full(n, BOX / n ** (1 / 3) * 2, np.float32)
    d1 = density(tree, payload, ipos, vel, entvar, hsml0, BOX,
                 engine="walk")
    d2 = density(tree, payload, ipos, vel, entvar, hsml0, BOX,
                 engine="blocked")
    for f in ("hsml", "density", "egy_wt_density", "curl_vel",
              "dhsml_egy_density_factor"):
        np.testing.assert_allclose(getattr(d2, f), getattr(d1, f),
                                   rtol=2e-5, atol=1e-7, err_msg=f)
    np.testing.assert_allclose(d2.div_vel, d1.div_vel, rtol=2e-3,
                               atol=1e-5)


def test_blocked_density_raises_on_shallow_tree():
    n = 600
    rng = np.random.RandomState(1)
    # one dense blob: bottom-level cells of a 2-level tree hold >> 32
    pos = rng.normal([500] * 3, 5, (n, 3)) % BOX
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    mass = jnp.ones(n, jnp.float32)
    vel = jnp.zeros((n, 3), jnp.float32)
    tree = build_octree(ipos, mass, jnp.ones(n, bool), BOX,
                        nlevels=2, ncrit=32)
    entvar = jnp.ones(n, jnp.float32)
    payload = make_gas_payload(tree, vel, entvar)
    hsml0 = np.full(n, 10.0, np.float32)
    with pytest.raises(TreeTooShallow):
        density(tree, payload, ipos, vel, entvar, hsml0, BOX,
                engine="blocked")


def test_blocked_hydro_matches_walk():
    n = 1000
    pos, rng = _clustered(n, seed=7)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    mass = jnp.ones(n, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    tree = build_octree(ipos, mass, jnp.ones(n, bool), BOX,
                        nlevels=9, ncrit=32)
    entvar = jnp.ones(n, jnp.float32)
    payload = make_gas_payload(tree, vel, entvar)
    hsml0 = np.full(n, BOX / n ** (1 / 3) * 2, np.float32)
    d = density(tree, payload, ipos, vel, entvar, hsml0, BOX)
    hsml = jnp.asarray(d.hsml)

    # rebuild with hmax for the symmetric walk
    tree = build_octree(ipos, mass, jnp.ones(n, bool), BOX,
                        nlevels=9, ncrit=32, hsml=hsml)
    order = tree.order
    dens = jnp.asarray(d.density)
    egyr = jnp.asarray(d.egy_wt_density)
    press = pressure_predict(jnp.maximum(egyr, 1e-35), entvar)
    atime, hubble = 0.5, 0.15
    par = HydroParams(boxsize=BOX, atime=atime, hubble=hubble)
    tf = hydro_time_factors(atime, hubble)
    cs = jnp.sqrt(GAMMA * press / jnp.maximum(egyr, 1e-35))
    f1 = balsara_f1(jnp.asarray(d.div_vel), jnp.asarray(d.curl_vel),
                    cs, hsml, tf["fac_mu"])
    zero = jnp.zeros(n, jnp.float32)
    payload_h = {
        "ipos": tree.ipos_s, "mass": tree.mass_s,
        "hsml": hsml[order], "vel": vel[order],
        "density": dens[order], "eomdensity": egyr[order],
        "entvar": entvar[order], "pressure": press[order],
        "divvel": jnp.asarray(d.div_vel)[order],
        "curlvel": jnp.asarray(d.curl_vel)[order],
        "dhsml_egy": jnp.asarray(
            d.dhsml_egy_density_factor)[order],
        "dloga": zero[order],
        "decoupled": jnp.zeros(n, bool)[order],
    }
    targets = {
        "ipos": ipos, "vel": vel, "hsml": hsml, "mass": mass,
        "density": dens, "egyrho": egyr, "entvar": entvar,
        "pressure": press, "f1": f1,
        "dhsml": jnp.asarray(d.dhsml_egy_density_factor),
        "dloga": zero,
    }
    h1 = hydro_walk(tree, payload_h, targets, par)
    maxl = 64
    while True:   # grow caps like the production loop
        h2, info = hydro_walk_blocked(tree, payload_h, targets, par,
                                      maxl=maxl, tf=tf)
        if not bool(info["list_overflow"]):
            break
        maxl *= 2
        assert maxl <= 4096
    assert not bool(info["leaf_truncated"])
    scale = float(jnp.max(jnp.abs(h1.accel)))
    np.testing.assert_allclose(np.asarray(h2.accel),
                               np.asarray(h1.accel),
                               rtol=1e-4, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(h2.max_signal_vel),
                               np.asarray(h1.max_signal_vel),
                               rtol=1e-5, atol=1e-6)
    dscale = float(jnp.max(jnp.abs(h1.dt_entropy))) + 1e-30
    np.testing.assert_allclose(np.asarray(h2.dt_entropy),
                               np.asarray(h1.dt_entropy),
                               rtol=1e-3, atol=1e-4 * dscale)
