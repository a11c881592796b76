"""Distributed slab SPH density/hydro vs single-device blocked engine.

Configs are dense enough that 3x the converged smoothing length fits
the 8-slab halo-ring limit (2*width < 7/8 box).

VERDICT 'multi-chip everything-else' item: SPH runs distributed with
ghost halos; per-device work is O(N/D + halo).  Results must match the
single-device engine exactly up to f32 summation order.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.sph.density import density, make_gas_payload
from shenqi_tpu.sph.hydro import (HydroParams, hydro_walk_blocked,
                                  hydro_time_factors, balsara_f1,
                                  pressure_predict)
from shenqi_tpu.parallel.sharded import make_mesh
from shenqi_tpu.parallel.domain import distribute_slabs
from shenqi_tpu.parallel.sph_slab import density_slab, make_hydro_pass
from shenqi_tpu.utils.constants import GAMMA

BOX = 1000.0


def _gas(n=4000, seed=9):
    rng = np.random.RandomState(seed)
    pos = np.concatenate([
        rng.uniform(0, BOX, (n // 2, 3)),
        rng.normal([125, 300, 300], 20, (n // 4, 3)) % BOX,
        rng.normal([600, 600, 600], 25, (n - n // 2 - n // 4, 3))
        % BOX])
    vel = rng.normal(scale=30.0, size=(n, 3)).astype(np.float32)
    return pos, vel


def test_slab_density_matches_single_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    pos, vel = _gas()
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    hsml0 = BOX / n ** (1 / 3) * 2

    # single-device
    ip = jnp.asarray(ipos)
    ms = jnp.ones(n, jnp.float32)
    vl = jnp.asarray(vel)
    ent = jnp.ones(n, jnp.float32)
    tree = build_octree(ip, ms, jnp.ones(n, bool), BOX, nlevels=9,
                        ncrit=32)
    payload = make_gas_payload(tree, vl, ent)
    d1 = density(tree, payload, ip, vl, ent,
                 np.full(n, hsml0, np.float32), BOX)

    # slab-distributed
    mesh = make_mesh(8)
    fields = {"ipos": ipos, "mass": np.ones(n, np.float32),
              "vel": vel, "entvar": np.ones(n, np.float32),
              "pid": np.arange(n, dtype=np.int32)}
    sharded, C = distribute_slabs(mesh, fields, block=64)
    hsml_init = jnp.where(jnp.asarray(sharded["mass"]) > 0,
                          jnp.float32(hsml0), jnp.float32(0.0))
    dfields = {k: sharded[k] for k in ("ipos", "mass", "vel",
                                       "entvar")}
    res, hsml, info = density_slab(mesh, dfields, hsml_init, BOX,
                                   nlevels=9)
    assert int(info["halo_lost"]) == 0
    assert int(info["width_exceeded"]) == 0

    pid = np.asarray(sharded["pid"])
    alive = np.asarray(sharded["mass"]) > 0
    back = lambda a: np.asarray(a)[alive][np.argsort(pid[alive])]
    np.testing.assert_allclose(back(hsml), np.asarray(d1.hsml),
                               rtol=3e-5, atol=1e-7)
    np.testing.assert_allclose(back(res.rho),
                               np.asarray(d1.density),
                               rtol=3e-5, atol=1e-8)
    # entvar == 1 here, so raw egy_rho equals egy_wt_density
    np.testing.assert_allclose(back(res.egy_rho),
                               np.asarray(d1.egy_wt_density),
                               rtol=3e-5, atol=1e-8)


def test_slab_hydro_matches_single_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    pos, vel = _gas(6000, seed=13)
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    hsml0 = BOX / n ** (1 / 3) * 2

    ip = jnp.asarray(ipos)
    ms = jnp.ones(n, jnp.float32)
    vl = jnp.asarray(vel)
    ent = jnp.ones(n, jnp.float32)
    tree = build_octree(ip, ms, jnp.ones(n, bool), BOX, nlevels=9,
                        ncrit=32)
    payload = make_gas_payload(tree, vl, ent)
    d = density(tree, payload, ip, vl, ent,
                np.full(n, hsml0, np.float32), BOX)
    hsml = jnp.asarray(d.hsml)
    dens = jnp.asarray(d.density)
    egyr = jnp.asarray(d.egy_wt_density)
    press = pressure_predict(jnp.maximum(egyr, 1e-35), ent)
    atime, hubble = 0.5, 0.15
    par = HydroParams(boxsize=BOX)
    tf = hydro_time_factors(atime, hubble)
    cs = jnp.sqrt(GAMMA * press / jnp.maximum(egyr, 1e-35))
    f1 = balsara_f1(jnp.asarray(d.div_vel), jnp.asarray(d.curl_vel),
                    cs, hsml, tf["fac_mu"])
    zero = jnp.zeros(n, jnp.float32)

    tree2 = build_octree(ip, ms, jnp.ones(n, bool), BOX, nlevels=9,
                         ncrit=32, hsml=hsml)
    order = tree2.order
    payload_h = {"ipos": tree2.ipos_s, "mass": tree2.mass_s,
                 "hsml": hsml[order], "vel": vl[order],
                 "density": dens[order], "eomdensity": egyr[order],
                 "entvar": ent[order], "pressure": press[order],
                 "divvel": jnp.asarray(d.div_vel)[order],
                 "curlvel": jnp.asarray(d.curl_vel)[order],
                 "dhsml_egy": jnp.asarray(
                     d.dhsml_egy_density_factor)[order],
                 "dloga": zero[order],
                 "decoupled": jnp.zeros(n, bool)[order]}
    targets = {"ipos": ip, "vel": vl, "hsml": hsml, "mass": ms,
               "density": dens, "egyrho": egyr, "entvar": ent,
               "pressure": press, "f1": f1,
               "dhsml": jnp.asarray(d.dhsml_egy_density_factor),
               "dloga": zero}
    h1 = None
    maxl = 128
    while True:
        h1, info1 = hydro_walk_blocked(tree2, payload_h, targets,
                                       par, maxl=maxl, tf=tf)
        if not bool(info1["list_overflow"]):
            break
        maxl *= 2

    # slab
    mesh = make_mesh(8)
    host = {
        "ipos": ipos, "mass": np.ones(n, np.float32), "vel": vel,
        "hsml": np.asarray(hsml), "density": np.asarray(dens),
        "eomdensity": np.asarray(egyr),
        "entvar": np.ones(n, np.float32),
        "pressure": np.asarray(press),
        "divvel": np.asarray(d.div_vel),
        "curlvel": np.asarray(d.curl_vel),
        "dhsml_egy": np.asarray(d.dhsml_egy_density_factor),
        "dloga": np.zeros(n, np.float32),
        "decoupled": np.zeros(n, bool),
        "f1": np.asarray(f1), "egyrho": np.asarray(egyr),
        "dhsml": np.asarray(d.dhsml_egy_density_factor),
        "pid": np.arange(n, dtype=np.int32),
    }
    sharded, C = distribute_slabs(mesh, host, block=64)
    # 3x the max smoothing length: 4x would breach the 8-slab
    # ring limit (2*width < 7/8 box) at this particle count
    width = int(3 * float(jnp.max(hsml)) / BOX * 2 ** 32)
    fn = make_hydro_pass(mesh, par, width, nlevels=9, maxl=256)
    dfields = {k: sharded[k] for k in host if k != "pid"}
    (acc, dts_raw, mvs), info = fn(dfields, tf)
    assert int(info["halo_lost"]) == 0
    assert int(info["list_overflow"]) == 0
    assert int(info["width_exceeded"]) == 0

    pid = np.asarray(sharded["pid"])
    alive = np.asarray(sharded["mass"]) > 0
    back = lambda a: np.asarray(a)[alive][np.argsort(pid[alive])]
    scale = float(jnp.max(jnp.abs(h1.accel)))
    np.testing.assert_allclose(back(acc), np.asarray(h1.accel),
                               rtol=1e-4, atol=3e-5 * scale)
    np.testing.assert_allclose(back(mvs),
                               np.asarray(h1.max_signal_vel),
                               rtol=1e-5, atol=1e-6)


def test_slab_density_stencil_matches_walk():
    """Stencil slab density (production engine) vs the octree walk
    pass on the same 8-device slab state — the distributed analog of
    tests/test_stencil_density.py's oracle cross-check."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from shenqi_tpu.parallel.sph_slab import hydro_slab
    from shenqi_tpu.sph.hydro import (hydro_time_factors,
                                      pressure_predict)
    pos, vel = _gas()
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    hsml0 = BOX / n ** (1 / 3) * 2

    mesh = make_mesh(8)
    fields = {"ipos": ipos, "mass": np.ones(n, np.float32),
              "vel": vel, "entvar": np.ones(n, np.float32),
              "pid": np.arange(n, dtype=np.int32)}
    sharded, C = distribute_slabs(mesh, fields, block=64)
    hsml_init = jnp.where(jnp.asarray(sharded["mass"]) > 0,
                          jnp.float32(hsml0), jnp.float32(0.0))
    dfields = {k: sharded[k] for k in ("ipos", "mass", "vel",
                                       "entvar")}
    res_w, hsml_w, _ = density_slab(mesh, dict(dfields), hsml_init,
                                    BOX, nlevels=9, engine="walk")
    res_s, hsml_s, info_s = density_slab(mesh, dict(dfields),
                                         hsml_init, BOX, nlevels=9,
                                         engine="stencil")
    assert int(info_s["halo_lost"]) == 0
    alive = np.asarray(sharded["mass"]) > 0
    for a, b, rt in [(hsml_w, hsml_s, 3e-5),
                     (res_w.rho, res_s.rho, 3e-5),
                     (res_w.egy_rho, res_s.egy_rho, 3e-5),
                     (res_w.div, res_s.div, 2e-4),
                     (res_w.rot, res_s.rot, 2e-4)]:
        aa, bb = np.asarray(a)[alive], np.asarray(b)[alive]
        scale = np.max(np.abs(aa)) + 1e-30
        np.testing.assert_allclose(bb, aa, rtol=rt,
                                   atol=1e-5 * scale)

    # hydro on the converged walk state: stencil vs walk pass
    from shenqi_tpu.utils.constants import GAMMA as G
    atime, hubble = 0.5, 0.15
    par = HydroParams(boxsize=BOX)
    tf = hydro_time_factors(atime, hubble)
    dens = jnp.asarray(res_w.rho)
    egyr = jnp.maximum(jnp.asarray(res_w.egy_rho), 1e-35)
    ent = jnp.asarray(sharded["entvar"])
    press = pressure_predict(egyr, ent)
    cs = jnp.sqrt(G * press / egyr)
    divv = jnp.asarray(res_w.div) / jnp.maximum(dens, 1e-35)
    curlv = jnp.linalg.norm(jnp.asarray(res_w.rot), axis=-1) \
        / jnp.maximum(dens, 1e-35)
    f1 = balsara_f1(divv, curlv, cs, hsml_w, tf["fac_mu"])
    zero = jnp.zeros_like(dens)
    hf = {"ipos": sharded["ipos"], "mass": sharded["mass"],
          "vel": sharded["vel"], "hsml": hsml_w, "density": dens,
          "eomdensity": egyr, "entvar": ent, "pressure": press,
          "divvel": divv, "curlvel": curlv,
          "dhsml_egy": res_w.dhsml_egy, "dloga": zero,
          "decoupled": jnp.zeros(dens.shape, bool), "f1": f1,
          "egyrho": egyr, "dhsml": res_w.dhsml_egy}
    (acc_w, dts_w, mv_w), _ = hydro_slab(mesh, dict(hf), par, tf,
                                         nlevels=9, engine="walk")
    (acc_s, dts_s, mv_s), hi_s = hydro_slab(mesh, dict(hf), par, tf,
                                            nlevels=9,
                                            engine="stencil")
    assert int(hi_s["halo_lost"]) == 0
    scale = np.max(np.abs(np.asarray(acc_w)[alive]))
    np.testing.assert_allclose(np.asarray(acc_s)[alive],
                               np.asarray(acc_w)[alive],
                               rtol=1e-4, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(mv_s)[alive],
                               np.asarray(mv_w)[alive],
                               rtol=1e-5, atol=1e-6)
    ds = np.max(np.abs(np.asarray(dts_w)[alive])) + 1e-30
    np.testing.assert_allclose(np.asarray(dts_s)[alive],
                               np.asarray(dts_w)[alive],
                               rtol=2e-4, atol=1e-5 * ds)


def test_density_pass_nb_regrow_no_nan():
    """Regression: huge-hsml fixed-hsml pass (the pressure-entropy
    init fixed point) overflowed the walk's neighbour-BLOCK list
    (treewalk `nb`) and density_pass_slab returned the overflow
    rows as NaN instead of regrowing — NaN entropy poisoned every
    gas row of the slab cooling test at step 0 (round-3 slab-sim
    failure).  The caps protocol must retry on block_overflow and
    end finite, like sph/density.py:351-356 single-device."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import os
    from shenqi_tpu.parallel.sph_slab import density_pass_slab

    d = np.load(os.path.join(os.path.dirname(__file__), "data",
                             "fp0_slabcool.npz"))
    fields = {"ipos": jnp.asarray(d["ipos"]),
              "mass": jnp.asarray(d["mass"]),
              "vel": jnp.zeros((d["ipos"].shape[0], 3), jnp.float32),
              "entvar": jnp.asarray(d["entvar"])}
    mesh = make_mesh(8)
    caps = {"width": int(d["caps_width"]),
            "maxl": int(d["caps_maxl"]), "nlv": int(d["caps_nlv"])}
    res, info = density_pass_slab(
        mesh, fields, jnp.asarray(d["hsml"]), float(d["boxsize"]),
        caps=caps, cuts_in=jnp.asarray(d["cuts"]))
    assert int(info["block_overflow"]) == 0
    assert caps.get("nb") is not None     # the regrow happened
    g = np.asarray(d["mass"]) > 0
    for nm in ("rho", "egy_rho", "dhsml_rho", "dhsml_egy"):
        x = np.asarray(getattr(res, nm))[g]
        assert np.isfinite(x).all(), nm
    assert (np.asarray(res.rho)[g] > 0).all()
