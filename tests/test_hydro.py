"""SPH hydro force tests: symmetry, momentum conservation, gradients."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.sph.kernels import CUBIC, desnumngb
from shenqi_tpu.sph.density import density, make_gas_payload
from shenqi_tpu.sph.hydro import (HydroParams, hydro_walk, balsara_f1,
                                  pressure_predict)
from shenqi_tpu.utils.constants import GAMMA

BOX = 10000.0


def _prepare(pos, mass, vel, entropy, hsml0):
    """Run density, then assemble hydro payload+targets (all gas)."""
    n = len(pos)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    massj = jnp.asarray(mass, jnp.float32)
    velj = jnp.asarray(vel, jnp.float32)
    entr = jnp.asarray(entropy, jnp.float32)
    entvar = entr ** (1.0 / GAMMA)

    tree = build_octree(ipos, massj, jnp.ones(n, bool), BOX,
                        nlevels=6, ncrit=16,
                        hsml=jnp.asarray(hsml0, jnp.float32))
    payload_d = make_gas_payload(tree, velj, entvar)
    out = density(tree, payload_d, ipos, velj, entvar,
                  hsml0, BOX, CUBIC, eta=1.0)

    hsml = jnp.asarray(out.hsml)
    dens = jnp.asarray(out.density)
    egyrho = jnp.asarray(out.egy_wt_density)
    press = pressure_predict(egyrho, entvar)
    # hubble > 0: the entropy-rate conversion divides by H a^2 (the
    # reference always runs in a cosmological background)
    par = HydroParams(boxsize=BOX, atime=1.0, hubble=0.05)
    cs = jnp.sqrt(GAMMA * press / jnp.maximum(egyrho, 1e-35))
    f1 = balsara_f1(jnp.asarray(out.div_vel), jnp.asarray(out.curl_vel),
                    cs, hsml, par.fac_mu)

    # rebuild tree with final hsml so node hmax is right
    tree = build_octree(ipos, massj, jnp.ones(n, bool), BOX,
                        nlevels=6, ncrit=16, hsml=hsml)
    order = tree.order
    payload = {
        "ipos": tree.ipos_s, "mass": tree.mass_s,
        "hsml": hsml[order], "vel": velj[order],
        "density": dens[order], "eomdensity": egyrho[order],
        "entvar": entvar[order], "pressure": press[order],
        "divvel": jnp.asarray(out.div_vel)[order],
        "curlvel": jnp.asarray(out.curl_vel)[order],
        "dhsml_egy": jnp.asarray(out.dhsml_egy_density_factor)[order],
        "dloga": jnp.zeros(n, jnp.float32)[order],
        "decoupled": jnp.zeros(n, bool)[order],
    }
    targets = {
        "ipos": ipos, "vel": velj, "hsml": hsml, "mass": massj,
        "density": dens, "egyrho": egyrho, "entvar": entvar,
        "pressure": press, "f1": f1,
        "dhsml": jnp.asarray(out.dhsml_egy_density_factor),
        "dloga": jnp.zeros(n, jnp.float32),
    }
    return tree, payload, targets, par, out


def _lattice(ng, jitter=0.0, seed=0):
    rng = np.random.RandomState(seed)
    grid = (np.arange(ng) + 0.5) * BOX / ng
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    if jitter:
        pos += rng.uniform(-jitter, jitter, pos.shape) * (BOX / ng)
    return pos % BOX


def test_uniform_gas_in_equilibrium():
    """Uniform lattice, constant entropy: accel ~ 0, dtEntropy = 0."""
    ng = 8
    pos = _lattice(ng)
    n = len(pos)
    mass = np.ones(n, np.float32)
    vel = np.zeros((n, 3), np.float32)
    entropy = np.full(n, 100.0, np.float32)
    hsml0 = np.full(n, 2.0 * BOX / ng, np.float32)
    tree, payload, targets, par, dout = _prepare(pos, mass, vel,
                                                 entropy, hsml0)
    res = hydro_walk(tree, payload, targets, par, CUBIC)
    acc = np.asarray(res.accel)
    # scale: cs^2/hsml (a natural pressure acceleration)
    press = np.asarray(targets["pressure"])
    cs2 = GAMMA * press / np.asarray(targets["egyrho"])
    scale = np.median(cs2 / np.asarray(targets["hsml"]))
    assert np.abs(acc).max() < 1e-3 * scale
    # no motion -> no viscous heating
    assert np.abs(np.asarray(res.dt_entropy)).max() < 1e-10
    # signal velocity ~ 2 cs
    cs = np.sqrt(cs2)
    np.testing.assert_allclose(np.asarray(res.max_signal_vel),
                               2 * np.median(cs), rtol=0.05)


def test_momentum_conservation():
    """Symmetric SPH force conserves momentum (jittered lattice,
    random entropies and velocities)."""
    ng = 8
    pos = _lattice(ng, jitter=0.3, seed=2)
    n = len(pos)
    rng = np.random.RandomState(3)
    mass = rng.uniform(0.8, 1.2, n).astype(np.float32)
    vel = rng.normal(0, 20, (n, 3)).astype(np.float32)
    entropy = rng.uniform(50, 150, n).astype(np.float32)
    hsml0 = np.full(n, 2.0 * BOX / ng, np.float32)
    tree, payload, targets, par, dout = _prepare(pos, mass, vel,
                                                 entropy, hsml0)
    res = hydro_walk(tree, payload, targets, par, CUBIC)
    acc = np.asarray(res.accel, dtype=np.float64)
    ptot = (acc * mass[:, None]).sum(axis=0)
    pabs = (np.abs(acc) * mass[:, None]).sum(axis=0)
    assert np.all(np.abs(ptot) < 2e-3 * pabs)
    # viscous dissipation only heats (dtEntropy >= 0 within noise)
    dts = np.asarray(res.dt_entropy)
    assert dts.min() > -1e-6 * max(dts.max(), 1e-30)


def test_hydro_walk_dense_matches_tree():
    """The all-sources oracle equals the tree walk (the symmetric
    max(H_i,H_j) cut lives in the accumulator, so considering every
    source changes nothing but the staging)."""
    from shenqi_tpu.sph.hydro import hydro_walk_dense
    ng = 8
    pos = _lattice(ng, jitter=0.3, seed=5)
    n = len(pos)
    rng = np.random.RandomState(6)
    mass = rng.uniform(0.8, 1.2, n).astype(np.float32)
    vel = rng.normal(0, 20, (n, 3)).astype(np.float32)
    entropy = rng.uniform(50, 150, n).astype(np.float32)
    hsml0 = np.full(n, 2.0 * BOX / ng, np.float32)
    tree, payload, targets, par, dout = _prepare(pos, mass, vel,
                                                 entropy, hsml0)
    ref = hydro_walk(tree, payload, targets, par, CUBIC)
    dense = hydro_walk_dense(payload, targets, par, CUBIC)
    np.testing.assert_allclose(np.asarray(dense.accel),
                               np.asarray(ref.accel),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dense.dt_entropy),
                               np.asarray(ref.dt_entropy),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dense.max_signal_vel),
                               np.asarray(ref.max_signal_vel),
                               rtol=1e-5)


def test_pressure_gradient_direction():
    """A central hot (high-entropy) region accelerates gas outward."""
    ng = 10
    pos = _lattice(ng, jitter=0.05, seed=4)
    n = len(pos)
    mass = np.ones(n, np.float32)
    vel = np.zeros((n, 3), np.float32)
    center = np.array([BOX / 2] * 3)
    d = pos - center
    d -= BOX * np.round(d / BOX)
    r = np.linalg.norm(d, axis=1)
    entropy = np.where(r < BOX / 5, 400.0, 100.0).astype(np.float32)
    hsml0 = np.full(n, 2.0 * BOX / ng, np.float32)
    tree, payload, targets, par, dout = _prepare(pos, mass, vel,
                                                 entropy, hsml0)
    res = hydro_walk(tree, payload, targets, par, CUBIC)
    acc = np.asarray(res.accel)
    # radial acceleration at the hot/cold boundary is outward
    shell = (r > BOX / 7) & (r < BOX / 3.5)
    rad = np.einsum("ij,ij->i", acc, d / np.maximum(r[:, None], 1e-9))
    assert np.median(rad[shell]) > 0
    # and it dominates the tangential noise
    tang = np.linalg.norm(acc - rad[:, None]
                          * d / np.maximum(r[:, None], 1e-9), axis=1)
    assert np.median(rad[shell]) > np.median(tang[shell])
