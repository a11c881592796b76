"""Fluctuating UVB, metal cooling table, HeII reionization tests
(cooling_uvfluc.cpp / cooling_qso_lightup.cpp analogs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.physics.uv_fluctuations import (ZreionTable, local_uvbg,
                                                MetalCoolingTable)
from shenqi_tpu.physics.helium_reion import (HeliumReion, q_inst,
                                             QSOLightupParams)
from shenqi_tpu.physics.cooling_rates import UVBG

HEII_TABLE = "/root/reference/examples/HeIIReionizationTable"
BOX = 20000.0


def _mk_zreion_file(tmp_path, nside=8, box_mpc=20.0):
    """Write a synthetic UV fluctuation bigfile: z_reion = 6 in one
    octant, 10 elsewhere."""
    from shenqi_tpu.io.bigfile import BigFile
    tab = np.full((nside, nside, nside), 10.0)
    tab[: nside // 2, : nside // 2, : nside // 2] = 6.0
    bf = BigFile(str(tmp_path / "UVF"), create=True)
    blk = bf.create_block("Zreion_Table", "<f8", nside ** 3, nmemb=1)
    blk.write(0, tab.ravel())
    blk.attrs["Nmesh"] = np.array([nside], dtype="u8")
    blk.attrs["BoxSize"] = np.array([box_mpc], dtype="f8")
    blk.attrs["Redshift"] = np.array([7.5], dtype="f8")
    blk.flush()
    return str(tmp_path / "UVF")


def test_zreion_lookup_and_gating(tmp_path):
    path = _mk_zreion_file(tmp_path)
    # BOX kpc/h = 20 Mpc/h with kpc units
    zt = ZreionTable.load(path, BOX, 3.085678e21)
    assert zt.nside == 8 and zt.median_redshift == 7.5
    # deep inside the z=6 octant vs the z=10 region
    pos = jnp.asarray([[0.15 * BOX] * 3, [0.75 * BOX] * 3])
    zr = np.asarray(zt.zreion(pos))
    assert zr[0] == pytest.approx(6.0, abs=0.01)
    assert zr[1] == pytest.approx(10.0, abs=0.01)

    g = UVBG(gJH0=1e-12, gJHe0=1e-13, gJHep=1e-14, epsH0=1e-24,
             epsHe0=1e-25, epsHep=1e-26, self_shield_dens=5e-3)
    # at z=8: octant (zreion=6 < 8) not yet ionized -> rates off
    lu = local_uvbg(g, jnp.asarray(zr), redshift=8.0)
    assert float(lu.gJH0[0]) == 0.0 and float(lu.epsH0[0]) == 0.0
    assert float(lu.gJH0[1]) == pytest.approx(1e-12)
    # at z=5 both reionized
    lu5 = local_uvbg(g, jnp.asarray(zr), redshift=5.0)
    assert float(lu5.gJH0[0]) == pytest.approx(1e-12)
    # periodic wrap: a position just past the box edge maps inside
    zwrap = np.asarray(zt.zreion(jnp.asarray([[BOX * 0.999 + BOX * 0.15,
                                               0.15 * BOX,
                                               0.15 * BOX]])))
    assert np.isfinite(zwrap).all()


def test_metal_cooling_table(tmp_path):
    """Synthetic table: rate = z + lognh + logt (linear -> trilinear
    interpolation is exact)."""
    from shenqi_tpu.io.bigfile import BigFile
    zb = np.array([0.0, 1.0, 2.0])
    nb = np.array([-6.0, -3.0, 0.0])
    tb = np.array([3.0, 5.0, 7.0])
    Z, N, T = np.meshgrid(zb, nb, tb, indexing="ij")
    rate = Z + N + T
    bf = BigFile(str(tmp_path / "MC"), create=True)
    for name, data in [("MetallicityInSolar_bins", np.array([0.0])),
                       ("Redshift_bins", zb),
                       ("HydrogenNumberDensity_bins", nb),
                       ("Temperature_bins", tb),
                       ("NetCoolingRate", rate.ravel())]:
        blk = bf.create_block(name, "<f8", len(data), nmemb=1)
        blk.write(0, data)
        blk.flush()
    mc = MetalCoolingTable.load(str(tmp_path / "MC"))
    got = float(mc.eval(0.5, 10 ** 4.0, 10 ** -4.5))
    assert got == pytest.approx(0.5 - 4.5 + 4.0, abs=1e-5)
    # clamped outside the range
    # clamps: z=5 -> 2, lognH=3 -> 0, logT=9 -> 7
    hi = float(mc.eval(5.0, 10 ** 9.0, 10 ** 3.0))
    assert hi == pytest.approx(2.0 + 0.0 + 7.0, rel=1e-5)


def test_heii_history_parsing():
    he = HeliumReion.load(HEII_TABLE)
    assert he.start_redshift == pytest.approx(4.0, abs=0.01)
    # fraction increases towards low z
    assert he.desired_ion_frac(he.a_hist[0]) < 0.05
    assert he.desired_ion_frac(he.a_hist[-1]) > 0.9
    # q_inst for Emax=150 eV, alpha=1.7 is a few eV in ergs
    q = q_inst(150.0, 1.7)
    assert 1e-12 < q < 1e-10
    assert he.inst_heating == pytest.approx(q)
    # during() window
    assert not he.during(5.0)
    assert he.during(3.5)
    # lmfp heating positive mid-reionization, zero before
    rho_b = 4e-31
    assert he.lmfp_heating_per_gram(3.5, rho_b) > 0
    assert he.lmfp_heating_per_gram(5.0, rho_b) == 0.0


def test_quasar_bubbles_ionize():
    he = HeliumReion.load(HEII_TABLE, QSOLightupParams(
        qso_candidate_min_mass=1.0, qso_candidate_max_mass=1e8,
        mean_bubble=4000.0, var_bubble=1.0,
        heIIIreion_finish_frac=0.95))
    rng = np.random.RandomState(0)
    ngas = 5000
    pos = rng.uniform(0, BOX, (ngas, 3))
    dens = np.full(ngas, 1e-8, np.float32)
    ent = np.full(ngas, 100.0, np.float32)
    alive = np.ones(ngas, bool)
    heiii = np.zeros(ngas, bool)
    groups_m = np.array([50.0, 80.0, 0.1])    # third below min mass
    groups_cm = np.array([[0.25 * BOX] * 3, [0.75 * BOX] * 3,
                          [0.5 * BOX] * 3])
    # mid-reionization epoch: desired frac between 0 and 1
    a_mid = 1.0 / (1.0 + 3.2)
    desired = he.desired_ion_frac(a_mid)
    assert 0.05 < desired < 0.95
    h2, e2, nion = he.turn_on_quasars(
        rng, a_mid, groups_m, groups_cm, pos, dens, alive, heiii,
        ent, BOX, uu_in_cgs=1e10)
    assert nion > 0
    assert h2.sum() == nion
    # ionized particles got heated, others untouched
    assert (e2[h2] > ent[h2]).all()
    assert np.array_equal(e2[~h2], ent[~h2])
    # ionized particles concentrate near candidate halo centers
    d0 = np.linalg.norm((pos - groups_cm[0] + BOX / 2) % BOX
                        - BOX / 2, axis=1)
    d1 = np.linalg.norm((pos - groups_cm[1] + BOX / 2) % BOX
                        - BOX / 2, axis=1)
    near = np.minimum(d0, d1)
    assert near[h2].mean() < near[~h2].mean()

    # flash finish: late time ionizes everything
    he2 = HeliumReion.load(HEII_TABLE, QSOLightupParams(
        qso_candidate_min_mass=1.0, qso_candidate_max_mass=1e8))
    a_late = 1.0 / (1.0 + 2.85)
    assert he2.desired_ion_frac(a_late) > 0.95
    h3, e3, n3 = he2.turn_on_quasars(
        rng, a_late, groups_m, groups_cm, pos, dens, alive,
        np.zeros(ngas, bool), ent, BOX, uu_in_cgs=1e10)
    assert h3.all() and n3 == ngas


def test_cooling_with_metal_and_extra_heat(tmp_path):
    """Metal cooling lowers u; extra heating raises it."""
    from shenqi_tpu.physics.cooling_rates import (do_cooling,
                                                  CoolingParams)
    from shenqi_tpu.io.bigfile import BigFile
    # constant metal cooling rate table
    zb = np.array([0.0, 10.0])
    nb = np.array([-8.0, 2.0])
    tb = np.array([2.0, 9.0])
    rate = np.full((2, 2, 2), 1.0)
    bf = BigFile(str(tmp_path / "MC2"), create=True)
    for name, data in [("MetallicityInSolar_bins", np.array([0.0])),
                       ("Redshift_bins", zb),
                       ("HydrogenNumberDensity_bins", nb),
                       ("Temperature_bins", tb),
                       ("NetCoolingRate", rate.ravel())]:
        blk = bf.create_block(name, "<f8", len(data), nmemb=1)
        blk.write(0, data)
        blk.flush()
    mc = MetalCoolingTable.load(str(tmp_path / "MC2"))

    par = CoolingParams()
    u0 = jnp.full(4, 3e12, jnp.float32)
    rho = jnp.full(4, 1e-28, jnp.float32)
    dt = 1e13
    base, _ = do_cooling(u0, rho, dt, 0.24, 3.0, UVBG(), par)
    # strong metal cooling: Z=1 with rate 1 erg/s/g removes 1e13 erg/g
    zmet = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    met, _ = do_cooling(u0, rho, dt, 0.24, 3.0, UVBG(), par,
                        metallicity=zmet, metal_cool=mc)
    assert float(met[1]) < float(base[1])
    assert float(met[0]) == pytest.approx(float(base[0]), rel=1e-3)
    # extra heating beats cooling
    hot, _ = do_cooling(u0, rho, dt, 0.24, 3.0, UVBG(), par,
                        extra_heat=jnp.asarray([0.0, 0.0, 10.0, 0.0]))
    assert float(hot[2]) > float(base[2])
    assert float(hot[0]) == pytest.approx(float(base[0]), rel=1e-3)
