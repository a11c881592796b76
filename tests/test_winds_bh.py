"""Winds + black hole module tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.utils.constants import GAMMA_MINUS1
from shenqi_tpu.physics.winds import (WindParams, WIND_MODEL_OFJT10,
                                      WIND_MODEL_SH03, winds_subgrid_step,
                                      wind_params_for, is_decoupled,
                                      winds_decay, WIND_SUBGRID,
                                      WIND_DECOUPLE_SPH)
from shenqi_tpu.physics.blackhole import (BHParams, bondi_rate,
                                          eddington_rate,
                                          bh_gas_environment,
                                          bh_thermal_feedback,
                                          bh_soundspeed)
from shenqi_tpu.sph.kernels import CUBIC, wk

BOX = 10000.0


def test_wind_velocity_scalings():
    wp = WindParams(WindModel=WIND_MODEL_OFJT10 | WIND_SUBGRID,
                    WindSpeedFactor=3.7, WindSigma0=353.0)
    wp.init(0.1, 2.1e6, 1e-3, 3.08568e16)
    vdisp = jnp.asarray([100.0, 200.0])
    vel, eff, uth = wind_params_for(vdisp, 0.5, wp)
    np.testing.assert_allclose(np.asarray(vel), 3.7 * np.asarray(vdisp),
                               rtol=1e-6)
    # efficiency decreases with vdisp (sigma0^2/vphys^2)
    assert eff[0] > eff[1]
    np.testing.assert_allclose(np.asarray(eff),
                               353.0 ** 2 / (np.asarray(vdisp) / 0.5) ** 2,
                               rtol=1e-5)

    wp2 = WindParams(WindModel=WIND_MODEL_SH03 | WIND_SUBGRID,
                     WindEfficiency=2.0)
    wp2.init(0.1, 2.1e6, 1e-3, 3.08568e16)
    vel2, eff2, _ = wind_params_for(vdisp, 0.5, wp2)
    assert np.allclose(np.asarray(eff2), 2.0)
    np.testing.assert_allclose(np.asarray(vel2), wp2.WindSpeed * 0.5,
                               rtol=1e-6)


def test_wind_kick_statistics():
    """High mass loading -> essentially every particle is kicked; kick
    speed is the VS08 value and DelayTime is set."""
    wp = WindParams(WindModel=WIND_MODEL_OFJT10 | WIND_SUBGRID,
                    WindFreeTravelLength=20.0)
    wp.init(0.1, 2.1e6, 1e-3, 3.08568e16)
    n = 2048
    vel3 = jnp.zeros((n, 3), jnp.float32)
    entropy = jnp.full(n, 100.0, jnp.float32)
    density = jnp.full(n, 1.0, jnp.float32)
    delay = jnp.zeros(n, jnp.float32)
    mass = jnp.full(n, 1.0, jnp.float32)
    sm = jnp.full(n, 0.5, jnp.float32)   # huge SF this step
    vdisp = jnp.full(n, 100.0, jnp.float32)
    res = winds_subgrid_step(jax.random.PRNGKey(0), vel3, entropy,
                             density, delay, mass, sm, vdisp,
                             atime=0.5, a3inv=8.0, wp=wp,
                             eligible=jnp.ones(n, bool))
    speeds = np.linalg.norm(np.asarray(res.vel), axis=1)
    kicked = speeds > 0
    # eff = 353^2/(200^2) ~ 3.1; pw ~ 1.56; prob ~ 0.79
    assert 0.7 < kicked.mean() < 0.9
    np.testing.assert_allclose(speeds[kicked], 370.0, rtol=1e-4)
    assert (np.asarray(res.delay_time)[kicked] > 0).all()
    # decoupling predicate + decay
    dec = is_decoupled(res.delay_time, density, 8.0, wp)
    assert bool(np.asarray(dec)[kicked].all())
    d2 = winds_decay(res.delay_time, density, 8.0, 1e10, wp)
    assert (np.asarray(d2) == 0).all()


def test_wind_subgrid_idkeyed_layout_invariant():
    """With pids given, subgrid-wind draws are keyed by (salt, id) —
    get_random_number(ID) analog (winds.cpp:542) — so a row
    permutation permutes the results exactly (slab runs reproduce the
    single-device stream) and the kick statistics still hold."""
    wp = WindParams(WindModel=WIND_MODEL_OFJT10 | WIND_SUBGRID,
                    WindFreeTravelLength=20.0)
    wp.init(0.1, 2.1e6, 1e-3, 3.08568e16)
    n = 2048
    rng = np.random.RandomState(8)
    vel3 = jnp.zeros((n, 3), jnp.float32)
    entropy = jnp.full(n, 100.0, jnp.float32)
    density = jnp.full(n, 1.0, jnp.float32)
    delay = jnp.zeros(n, jnp.float32)
    mass = jnp.full(n, 1.0, jnp.float32)
    sm = jnp.asarray(rng.uniform(0.2, 0.8, n), jnp.float32)
    vdisp = jnp.full(n, 100.0, jnp.float32)
    pids = jnp.asarray(rng.permutation(n).astype(np.uint32) + 1)
    key = jax.random.PRNGKey(3)
    res = winds_subgrid_step(key, vel3, entropy, density, delay,
                             mass, sm, vdisp, atime=0.5, a3inv=8.0,
                             wp=wp, eligible=jnp.ones(n, bool),
                             pids=pids)
    speeds = np.linalg.norm(np.asarray(res.vel), axis=1)
    kicked = speeds > 0
    assert 0.3 < kicked.mean() < 0.9
    np.testing.assert_allclose(speeds[kicked], 370.0, rtol=1e-4)
    # permute rows: same key, same ids -> identical per-id results
    perm = np.random.RandomState(9).permutation(n)
    res_p = winds_subgrid_step(
        key, vel3[perm], entropy[perm], density[perm], delay[perm],
        mass[perm], sm[perm], vdisp[perm], atime=0.5, a3inv=8.0,
        wp=wp, eligible=jnp.ones(n, bool), pids=pids[perm])
    np.testing.assert_array_equal(np.asarray(res_p.vel),
                                  np.asarray(res.vel)[perm])
    np.testing.assert_array_equal(np.asarray(res_p.delay_time),
                                  np.asarray(res.delay_time)[perm])


def test_bondi_and_eddington():
    par = BHParams(BlackHoleAccretionFactor=100,
                   BlackHoleEddingtonFactor=3.0)
    G = 43007.1
    m = jnp.asarray([5e-5])
    rho = jnp.asarray([1e-2])
    cs = jnp.asarray([10.0])
    v = jnp.asarray([0.0])
    atime = 0.5
    mdot = bondi_rate(m, rho, cs, v, atime, G, par)
    expected = (4 * np.pi * 100 * G ** 2 * 5e-5 ** 2 * (1e-2 / 0.125)
                / 10.0 ** 3)
    medd = float(eddington_rate(m, par)[0])
    assert float(mdot[0]) == pytest.approx(min(expected, 3 * medd),
                                           rel=1e-5)
    # huge density -> capped at Eddington factor x Eddington
    mdot2 = bondi_rate(m, jnp.asarray([1e6]), cs, v, atime, G, par)
    assert float(mdot2[0]) == pytest.approx(3 * medd, rel=1e-5)


def test_bh_environment_and_feedback():
    rng = np.random.RandomState(2)
    ng = 500
    gas_pos = BOX / 2 + rng.uniform(-300, 300, (ng, 3))
    bh_pos = np.array([[BOX / 2] * 3])
    gas_ipos = jnp.asarray(float_to_ipos(gas_pos % BOX, BOX))
    bh_ipos = jnp.asarray(float_to_ipos(bh_pos, BOX))
    hsml = jnp.asarray([250.0])
    mass = jnp.full(ng, 2.0, jnp.float32)
    entr = jnp.full(ng, 50.0, jnp.float32)
    gvel = jnp.asarray(rng.normal(0, 5, (ng, 3)).astype(np.float32))
    alive = jnp.ones(ng, bool)
    env = bh_gas_environment(bh_ipos, hsml, gas_ipos, mass, entr, gvel,
                             alive, BOX)
    # brute-force check of the kernel density
    d = gas_pos - bh_pos[0]
    d -= BOX * np.round(d / BOX)
    r = np.linalg.norm(d, axis=1)
    inside = r < 250.0
    u = np.minimum(r / 250.0, 1.0)
    w = np.asarray(wk(CUBIC, jnp.asarray(u), 250.0))
    expected_rho = (2.0 * w)[inside].sum()
    assert float(env.density[0]) == pytest.approx(expected_rho,
                                                  rel=1e-4)
    assert float(env.entropy[0]) == pytest.approx(50.0, rel=1e-4)

    # feedback conserves energy: sum m du_spec = E
    E = jnp.asarray([1e-3])
    dent = bh_thermal_feedback(bh_ipos, hsml, E, env.feedback_weight,
                               gas_ipos, mass, jnp.full(ng, expected_rho,
                                                        jnp.float32),
                               alive, BOX, a3inv=1.0)
    enttou = expected_rho ** GAMMA_MINUS1 / GAMMA_MINUS1
    du = np.asarray(dent) * enttou
    total = (du * 2.0).sum()
    assert total == pytest.approx(1e-3, rel=1e-3)
    # only particles inside the kernel heated
    assert (du[~inside] == 0).all()


def test_winds_star_feedback():
    """Non-subgrid winds: neighbours of new stars get kicked with the
    expected mass loading; distant gas untouched; decoupling set."""
    import jax
    from shenqi_tpu.physics.winds import (WindParams, WIND_MODEL_OFJT10,
                                          winds_star_feedback,
                                          wind_params_for)
    box = 20000.0
    rng = np.random.RandomState(0)
    ngas = 3000
    # half the gas near the star, half far away
    near = (np.full((ngas // 2, 3), box / 2)
            + rng.uniform(-300, 300, (ngas // 2, 3)))
    far = rng.uniform(0, box / 4, (ngas // 2, 3))
    gas_pos = np.vstack([near, far])
    gas_ipos = jnp.asarray(float_to_ipos(gas_pos % box, box))
    gmass = jnp.full(ngas, 0.01, jnp.float32)
    gvel = jnp.zeros((ngas, 3), jnp.float32)
    gent = jnp.full(ngas, 100.0, jnp.float32)
    gdens = jnp.full(ngas, 1e-8, jnp.float32)
    gdelay = jnp.zeros(ngas, jnp.float32)
    alive = jnp.ones(ngas, bool)

    star_ipos = jnp.asarray(float_to_ipos(
        np.array([[box / 2] * 3]), box))
    hsml = jnp.asarray([400.0])
    smass = jnp.asarray([0.01])
    vdisp = jnp.asarray([120.0])
    wp = WindParams(WindModel=WIND_MODEL_OFJT10, WindSigma0=353.0,
                    WindSpeedFactor=3.7, WindFreeTravelLength=20.0,
                    MaxWindFreeTravelTime=10.0,
                    WindFreeTravelDensThresh=1e-12)
    atime = 0.5
    kicked_counts = []
    for seed in range(20):
        vel, ent, delay = winds_star_feedback(
            jax.random.PRNGKey(seed), star_ipos, hsml, smass, vdisp,
            gas_ipos, gmass, gvel, gent, gdens, gdelay, alive, box,
            atime, 1 / atime ** 3, wp)
        kicked = np.asarray(np.linalg.norm(np.asarray(vel), axis=1)
                            > 1e-6)
        kicked_counts.append(kicked.sum())
        # only near-gas is kicked
        assert not kicked[ngas // 2:].any()
        if kicked.any():
            v, eff, ut = wind_params_for(vdisp, atime, wp)
            vk = np.linalg.norm(np.asarray(vel)[kicked], axis=1)
            assert np.allclose(vk, float(v[0]), rtol=1e-4)
            # decoupling delay set
            assert (np.asarray(delay)[kicked] > 0).all()
            assert (np.asarray(ent)[kicked] >= 100.0).all()
    # expected number of kicks: eff * M_star / TotalWeight * N_inside
    v, eff, ut = wind_params_for(vdisp, atime, wp)
    d = np.linalg.norm(near - box / 2, axis=1)
    n_in = (d < 400.0).sum()
    expect = float(eff[0]) * 0.01 / (n_in * 0.01) * n_in
    assert np.mean(kicked_counts) == pytest.approx(expect, rel=0.4)
