"""Unit test for the accretion-momentum BH drag
(blackhole.cpp:418-429 behavior)."""

import jax.numpy as jnp
import numpy as np

from shenqi_tpu.physics.blackhole import (BHParams, bh_drag_accel,
                                          eddington_rate)


def test_drag_points_toward_gas_flow():
    par = BHParams(BH_DRAG=1)
    bh_vel = jnp.asarray([[100.0, 0.0, 0.0]], jnp.float32)
    gas_vel = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    mdot = jnp.asarray([2.0], jnp.float32)
    dynm = jnp.asarray([10.0], jnp.float32)
    bhm = jnp.asarray([1.0], jnp.float32)
    atime = 0.5
    a = np.asarray(bh_drag_accel(bh_vel, gas_vel, mdot, dynm, bhm,
                                 atime, par))
    # decelerates the BH toward the gas bulk flow
    assert a[0, 0] < 0 and abs(a[0, 1]) < 1e-12
    # a_int = -(v_int/a) * (mdot/M) * a = -v_int * mdot/M
    np.testing.assert_allclose(a[0, 0], -100.0 * 2.0 / 10.0,
                               rtol=1e-6)


def test_drag_method2_uses_eddington():
    par = BHParams(BH_DRAG=2)
    bh_vel = jnp.asarray([[50.0, 0.0, 0.0]], jnp.float32)
    gas_vel = jnp.zeros((1, 3), jnp.float32)
    bhm = jnp.asarray([1e-3], jnp.float32)
    medd = float(eddington_rate(bhm, par)[0])
    a = np.asarray(bh_drag_accel(
        bh_vel, gas_vel, jnp.zeros(1), jnp.ones(1), bhm, 1.0, par))
    want = -50.0 * par.BlackHoleEddingtonFactor * medd / 1e-3
    np.testing.assert_allclose(a[0, 0], want, rtol=1e-5)


def test_drag_zero_relative_velocity():
    par = BHParams(BH_DRAG=1)
    v = jnp.asarray([[10.0, -5.0, 3.0]], jnp.float32)
    a = np.asarray(bh_drag_accel(v, v, jnp.ones(1), jnp.ones(1),
                                 jnp.ones(1), 0.3, par))
    np.testing.assert_allclose(a, 0.0, atol=1e-12)
