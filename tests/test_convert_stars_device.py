"""Device-side gas->star conversion must match the host oracle.

Round-5 perf work moved `_convert_stars` onto the device (the host
path pulls+pushes ~20 full arrays over the axon tunnel per SF step,
seconds per step at 64^3-gas scale).  The host path stays as the
fallback/oracle; this test drives both on the same fabricated
SF result — mixed whole conversions and split spawns, with dead
prefix rows to reuse — and compares every touched array.
"""

import copy
import dataclasses
from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp

from tests.test_slots_gc import _mk_sim


def _mk_res(sim, whole_rows, split_rows, frac=0.3):
    n = sim.gas.ngas
    form = np.zeros(n, bool)
    form[whole_rows] = True
    form[split_rows] = True
    whole = np.zeros(n, bool)
    whole[whole_rows] = True
    mstar = np.zeros(n, np.float32)
    mass = np.asarray(sim.particles.mass[:n])
    mstar[split_rows] = frac * mass[split_rows]
    mstar[whole_rows] = mass[whole_rows]
    return SimpleNamespace(
        form_star=jnp.asarray(form),
        convert_whole=jnp.asarray(whole),
        mass_of_star=jnp.asarray(mstar))


def _snapshot(sim, gas):
    p = sim.particles
    out = {f.name: np.asarray(getattr(p, f.name))
           for f in dataclasses.fields(p)
           if hasattr(getattr(p, f.name), "shape")}
    for name in ("birth_a", "last_enrich_myr", "mass0",
                 "star_metallicity", "generation", "sfr",
                 "delay_time", "bh_mass", "bh_mdot"):
        out["gas." + name] = np.asarray(getattr(gas, name))
    return out


def test_device_conversion_matches_host_oracle():
    sim_h = _mk_sim(ngas=256, headroom=64)
    gp_h = sim_h.gas_physics
    sim_d = _mk_sim(ngas=256, headroom=64)
    gp_d = sim_d.gas_physics

    # kill a few prefix rows so splits must reuse dead slots first
    for s in (sim_h, sim_d):
        mask = np.array(s.particles.mask)
        mask[[7, 19, 101]] = False
        s.particles = dataclasses.replace(
            s.particles, mask=jnp.asarray(mask))

    whole_rows = [3, 88]
    split_rows = [12, 40, 200, 255]
    atime = 0.11

    res_h = _mk_res(sim_h, whole_rows, split_rows)
    n_h = gp_h._convert_stars(sim_h, sim_h.gas, res_h, atime)

    res_d = _mk_res(sim_d, whole_rows, split_rows)
    n_d = gp_d._convert_stars_device(sim_d, sim_d.gas, res_d, atime,
                                     n_split=len(split_rows),
                                     n_whole=len(whole_rows))
    assert n_h == n_d == len(whole_rows) + len(split_rows)

    snap_h = _snapshot(sim_h, sim_h.gas)
    snap_d = _snapshot(sim_d, sim_d.gas)
    assert snap_h.keys() == snap_d.keys()
    for k in snap_h:
        np.testing.assert_allclose(
            snap_d[k], snap_h[k], rtol=1e-6, atol=0,
            err_msg=f"mismatch in {k}")


def test_device_conversion_whole_only_and_split_only():
    for whole_rows, split_rows in ([[5, 6, 7]], []), ([], [[9, 30]]):
        pass  # readable parametrization below
    cases = [([5, 6, 7], []), ([], [9, 30])]
    for whole_rows, split_rows in cases:
        sim_h = _mk_sim(ngas=128, headroom=32)
        sim_d = _mk_sim(ngas=128, headroom=32)
        res_h = _mk_res(sim_h, whole_rows, split_rows)
        res_d = _mk_res(sim_d, whole_rows, split_rows)
        n_h = sim_h.gas_physics._convert_stars(
            sim_h, sim_h.gas, res_h, 0.2)
        n_d = sim_d.gas_physics._convert_stars_device(
            sim_d, sim_d.gas, res_d, 0.2,
            n_split=len(split_rows), n_whole=len(whole_rows))
        assert n_h == n_d
        snap_h = _snapshot(sim_h, sim_h.gas)
        snap_d = _snapshot(sim_d, sim_d.gas)
        for k in snap_h:
            np.testing.assert_allclose(
                snap_d[k], snap_h[k], rtol=1e-6, atol=0,
                err_msg=f"mismatch in {k} (case {whole_rows},"
                        f" {split_rows})")
