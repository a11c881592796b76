"""Cooling rate network tests (ports of the reference test_cooling_rates
anchors: Ferland 92 recombination data, equilibrium ionization checks,
self-shielding behavior, implicit cooling solve)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.physics.cooling_rates import (
    recomb_alphaHp, get_equilib_ne, get_temp_from_u, UVBG,
    CoolingParams, TreeCool, get_neutral_fraction,
    get_heatingcooling_rate, do_cooling, self_shield_dens)

TREECOOL = "/root/reference/examples/TREECOOL_ep_2018p"

# Case B+n1 recombination rates from Ferland et al 1992 Table 1
F92G2 = np.array([5.758e-11, 2.909e-11, 1.440e-11, 6.971e-12, 3.282e-12,
                  1.489e-12, 6.43e-13, 2.588e-13, 9.456e-14, 3.069e-14,
                  8.793e-15, 2.245e-15, 5.190e-16, 1.107e-16, 2.221e-17,
                  4.267e-18, 7.960e-19, 1.457e-19, 2.636e-20, 4.737e-21])
F92N1 = np.array([9.258e-12, 5.206e-12, 2.927e-12, 1.646e-12, 9.246e-13,
                  5.184e-13, 2.890e-13, 1.582e-13, 8.255e-14, 3.882e-14,
                  1.545e-14, 5.058e-15, 1.383e-15, 3.276e-16, 7.006e-17,
                  1.398e-17, 2.665e-18, 4.940e-19, 9.001e-20, 1.623e-20])
TEMPS = np.array([3.16227766e+00, 1.0e+01, 3.16227766e+01, 1.0e+02,
                  3.16227766e+02, 1.00e+03, 3.16227766e+03, 1.e+04,
                  3.16227766e+04, 1.e+05, 3.16227766e+05, 1.e+06,
                  3.16227766e+06, 1.0e+07, 3.16227766e+07, 1.0e+08,
                  3.16227766e+08, 1.0e+09, 3.16227766e+09, 1.0e+10])


def params():
    return CoolingParams(MinGasTemp=100, fBar=0.17)


def make_uvbg(z=2.0):
    tc = TreeCool(TREECOOL)
    return tc.uvbg(z, params())


def test_recomb_rates_vs_ferland92():
    """Verner96 alphaHp within 1% of Ferland 92 exact for T<1e9 K
    (matches test_cooling_rates.cpp:66)."""
    got = np.asarray(recomb_alphaHp(jnp.asarray(TEMPS, jnp.float32)),
                     dtype=np.float64)
    expected = F92G2 + F92N1
    sel = TEMPS < 1e9
    np.testing.assert_allclose(got[sel], expected[sel], rtol=0.012)


def test_uvbg_interpolation():
    """TREECOOL interpolation at z=2: log-space lerp between the rows
    bracketing log10(3) (values computed directly from the table; the
    reference test's anchors predate the shipped ep_2018p table)."""
    uv = make_uvbg(2.0)
    d = np.loadtxt(TREECOOL)
    x = np.log10(3.0)
    exp = [10 ** np.interp(x, d[:, 0], np.log10(d[:, 1 + i]))
           for i in range(6)]
    assert uv.gJH0 == pytest.approx(exp[0], rel=1e-6)
    assert uv.gJHe0 == pytest.approx(exp[1], rel=1e-6)
    assert uv.gJHep == pytest.approx(exp[2], rel=1e-6)
    assert uv.epsH0 == pytest.approx(exp[3], rel=1e-6)
    # Rahmati 13 formula with this gJH0
    g12 = exp[0] / 1e-12
    ss = 6.73e-3 * (2.27e-18 / 2.49e-18) ** (-2. / 3) * g12 ** (2. / 3) \
        * (0.17 / 0.17) ** (-1. / 3)
    assert uv.self_shield_dens == pytest.approx(ss, rel=1e-3)
    # beyond the table: UVB off
    tc = TreeCool(TREECOOL)
    uv_hi = tc.uvbg(20.0, params())
    assert uv_hi.gJH0 == 0
    assert uv_hi.self_shield_dens > 1e8


def test_equilib_full_ionization():
    """Low density + UVB: complete ionization, ne/nh = 1 + 2y."""
    uv = make_uvbg(2.0)
    p = params()
    for helium, dens, tol in [(0.24, 1e-6, 1e-4), (0.12, 1e-6, 1e-4),
                              (0.24, 1e-5, 3e-4), (0.24, 1e-4, 2e-3)]:
        nh = dens * (1 - helium)
        ne, logt = get_equilib_ne(jnp.asarray([nh], jnp.float32),
                                  jnp.asarray([200e10], jnp.float32),
                                  helium, uv, p)
        expected = 1 + 2 * helium / (1 - helium) / 4
        assert float(ne[0]) / nh == pytest.approx(expected, rel=5 * tol)


def test_temperature():
    uv = make_uvbg(2.0)
    p = params()
    nh = 1e-4 * (1 - 0.24)
    ne, logt = get_equilib_ne(jnp.asarray([nh], jnp.float32),
                              jnp.asarray([200e10], jnp.float32),
                              0.24, uv, p)
    temp = float(get_temp_from_u(ne[0] / nh, 200e10, 0.24, 100))
    assert 9450 < temp < 9550
    # proportional to internal energy when fully ionized
    ne2, _ = get_equilib_ne(jnp.asarray([nh], jnp.float32),
                            jnp.asarray([400e10], jnp.float32),
                            0.24, uv, p)
    temp2 = float(get_temp_from_u(ne2[0] / nh, 400e10, 0.24, 100))
    assert temp2 == pytest.approx(2 * temp, rel=3e-3)


def test_neutral_fraction_scaling():
    """nH0/nH proportional to density in the optically thin regime
    (anchor 0.3113 * density, test_cooling_rates.cpp:154)."""
    uv = make_uvbg(2.0)
    p = params()
    for dens in [1e-5, 1e-6, 1e-7]:
        nf = float(get_neutral_fraction(
            jnp.asarray([dens * 1.6726e-24], jnp.float32),
            jnp.asarray([200e10], jnp.float32), 0.24, uv, p)[0])
        assert nf == pytest.approx(dens * 0.3113, rel=0.01)


def test_self_shielding():
    """High density: self-shielded and mostly neutral; without
    self-shielding it stays ionized."""
    uv = make_uvbg(2.0)
    p = params()
    mp = 1.6726e-24
    nf = float(get_neutral_fraction(jnp.asarray([1.0 * mp], jnp.float32),
                                    jnp.asarray([100.0], jnp.float32),
                                    0.24, uv, p)[0])
    assert nf > 0.95
    nf2 = float(get_neutral_fraction(
        jnp.asarray([0.1 * mp], jnp.float32),
        jnp.asarray([100e10], jnp.float32), 0.24, uv, p)[0])
    assert 0.70 < nf2 < 0.78
    p_noss = CoolingParams(MinGasTemp=100, fBar=0.17,
                           SelfShieldingOn=False)
    nf3 = float(get_neutral_fraction(
        jnp.asarray([1.0 * mp], jnp.float32),
        jnp.asarray([100e10], jnp.float32), 0.24, uv, p_noss)[0])
    assert nf3 < 0.25


def test_do_cooling_converges():
    """Implicit solve: hot low-density gas cools toward equilibrium;
    the solution satisfies u - u_old = LambdaNet(u) dt."""
    uv = make_uvbg(2.0)
    p = params()
    mp = 1.6726e-24
    rho = jnp.asarray([1e-3 * mp], jnp.float32)

    # start very hot (T ~ 2e6 K): radiative cooling dominates heating
    u_old = jnp.asarray([5e14], jnp.float32)
    dt = 1e13  # seconds
    u_new, ne = do_cooling(u_old, rho, dt, 0.24, 2.0, uv, p,
                           min_egyspec_cgs=1e8)
    u_new = float(u_new[0])
    assert u_new < float(u_old[0])  # it cooled
    # residual check: the implicit equation u - u_old = Lambda(u) dt
    lam, _ = get_heatingcooling_rate(rho, jnp.asarray([u_new]),
                                     0.24, 2.0, uv, p)
    resid = (u_new - float(u_old[0]) - float(lam[0]) * dt)
    assert abs(resid) < 1e-4 * float(u_old[0])

    # mildly-warm gas at this density net-HEATS toward equilibrium
    u_w = jnp.asarray([5e12], jnp.float32)
    u_new2, _ = do_cooling(u_w, rho, dt, 0.24, 2.0, uv, p,
                           min_egyspec_cgs=1e8)
    assert float(u_new2[0]) > float(u_w[0])
    lam2, _ = get_heatingcooling_rate(rho, u_new2, 0.24, 2.0, uv, p)
    resid2 = float(u_new2[0]) - float(u_w[0]) - float(lam2[0]) * dt
    assert abs(resid2) < 1e-4 * float(u_w[0])
