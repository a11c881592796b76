"""Distributed massive-neutrino linear response + slab lightcone.

The reference applies the delta_nu linear-response factor to the PM
density modes on every rank through petapm (gravpm.cpp:202-209
apply_neutrino_power) and collects lightcone crossings during drifts
(lightcone.cpp).  Round-3 wires both through the slab driver: the
factor rides the pencil FFT as a 1-D |k| interp table, the lightcone
walks one device shard at a time.
"""

import os
from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.gravity.pm import PMConfig, pm_forces
from shenqi_tpu.parallel.pfft import pm_forces_slab
from shenqi_tpu.parallel.sharded import make_mesh
from shenqi_tpu.parallel.domain import distribute_slabs, collect_alive

NDEV = 8
N = 32
BOX = 50000.0
G = 43007.1


def _nu_tables():
    """Synthetic 1 + f_nu*delta_nu/delta_cdm interp table: >=1,
    suppressed toward high k like the real response."""
    nu_k = np.linspace(2 * np.pi / BOX, N * 2 * np.pi / BOX,
                       48).astype(np.float32)
    nu_fac = (1.0 + 0.08 * np.exp(-nu_k / nu_k[8])).astype(np.float32)
    return nu_k, nu_fac


def test_pm_nu_factor_slab_matches_single_device():
    """pm_forces_slab(nu_k, nu_fac) == pm_forces(nu_factor=3d mesh)."""
    rng = np.random.RandomState(7)
    npart = 4096
    pos = rng.uniform(0, BOX, (npart, 3))
    ipos = float_to_ipos(pos, BOX)
    mass = np.ones(npart, np.float32)
    cfg = PMConfig(nmesh=N, boxsize=BOX, G=G, asmth=1.5)
    nu_k, nu_fac = _nu_tables()

    # single-device reference: the 3-D multiplier mesh exactly as
    # simulation._compute_pm builds it
    kx = np.fft.fftfreq(N, 1.0 / N)[:, None, None]
    ky = np.fft.fftfreq(N, 1.0 / N)[None, :, None]
    kz = np.arange(N // 2 + 1)[None, None, :]
    kmag = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2) * (2 * np.pi / BOX)
    nu3d = np.interp(kmag.ravel(), nu_k, nu_fac,
                     left=nu_fac[0], right=nu_fac[-1])
    nu3d = jnp.asarray(nu3d.reshape(kmag.shape).astype(np.float32))
    acc_ref, _, ps_ref = pm_forces(
        jnp.asarray(ipos), jnp.asarray(mass), cfg,
        want_potential=False, nu_factor=nu3d)

    mesh = make_mesh(NDEV)
    fields = {"ipos": np.asarray(ipos), "mass": mass,
              "pid": np.arange(npart, dtype=np.int32)}
    sharded, C = distribute_slabs(mesh, fields, block=64)
    specs = {k: P("dp", *([None] * (np.ndim(v) - 1)))
             for k, v in sharded.items()}

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, P(), P()),
             out_specs=(P("dp", None), (P(), P(), P(), P())),
             check_vma=False)
    def forces(f, nk, nf):
        alive = f["mass"] > 0
        acc, ps, _ = pm_forces_slab(
            f["ipos"], f["mass"], cfg, NDEV, halo=2, mask=alive,
            want_power=True, nu_k=nk, nu_fac=nf)
        return acc, (ps.k, ps.power, ps.nmodes, ps.norm)

    acc, ps = jax.jit(forces)(sharded, jnp.asarray(nu_k),
                              jnp.asarray(nu_fac))
    got = collect_alive({"pid": np.asarray(sharded["pid"]),
                         "mass": np.asarray(sharded["mass"]),
                         "acc": np.asarray(acc)})
    order = np.argsort(got["pid"])
    ref = np.asarray(acc_ref)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got["acc"][order], ref,
                               atol=2e-4 * scale + 1e-8)
    # P(k) is measured AFTER the nu multiply on both paths
    sel = np.asarray(ps_ref.nmodes) > 0
    np.testing.assert_allclose(np.asarray(ps[1])[sel],
                               np.asarray(ps_ref.power)[sel],
                               rtol=2e-3)


GENIC_PARAM = """
OutputDir = {out}/IC
FileBase = IC
Ngrid = 12
BoxSize = 64000
Omega0 = 0.288
OmegaLambda = 0.712
OmegaBaryon = 0.0472
ProduceGas = 0
HubbleParam = 0.7
Redshift = 9
FileWithInputSpectrum = /root/reference/examples/dm-small/class_pk_9.dat
DifferentTransferFunctions = 0
UsePeculiarVelocity = 1
Seed = 181170
UnitaryAmplitude = 1
"""

GADGET_PARAM = """
InitCondFile = {out}/IC/IC
OutputDir = {outdir}
OutputList = 0.125
TimeMax = 0.125
Omega0 = 0.288
MassiveNuLinRespOn = 1
MNue = 0.3
HydroOn = 0
CoolingOn = 0
StarformationOn = 0
DensityIndependentSphOn = 0
SnapshotWithFOF = 0
PartAllocFactor = 2.0
BlackHoleOn = 0
MetalReturnOn = 0
WindOn = 0
Nmesh = 24
LightconeOn = 1
"""


@pytest.mark.slow
def test_mesh_driver_nu_lightcone(tmp_path, monkeypatch):
    """--mesh 8 with MassiveNuLinRespOn + LightconeOn: runs end to
    end, carries the response (same P(k) suppression as the
    single-device run), saves the delta_tot history with the sharded
    snapshot, and writes lightcone crossings.  Also asserts the
    deposit REUSE (advisor r3 #1): the mesh force program must
    consume phase A's rho_k instead of tracing a second
    pm_forces_slab deposit per PM step."""
    from shenqi_tpu.cli.genic_main import run_genic
    from shenqi_tpu.cli.gadget_main import run_gadget
    from shenqi_tpu.io.bigfile import BigFile
    import shenqi_tpu.parallel.slab_sim as ss

    out = str(tmp_path)
    gp = tmp_path / "paramfile.genic"
    gp.write_text(GENIC_PARAM.format(out=out))
    run_genic(str(gp))

    p1 = tmp_path / "single.gadget"
    p1.write_text(GADGET_PARAM.format(out=out,
                                      outdir=f"{out}/single"))
    sim1 = run_gadget(str(p1))

    # trace-time counter: with the shared deposit, the slab force
    # program never traces pm_forces_slab (one exchange + one
    # deposit + one r2c per PM step, gravpm.cpp:360 semantics)
    slab_calls = []
    orig_pfs = ss.pm_forces_slab
    monkeypatch.setattr(
        ss, "pm_forces_slab",
        lambda *a, **k: (slab_calls.append(1), orig_pfs(*a, **k))[1])

    p2 = tmp_path / "mesh.gadget"
    p2.write_text(GADGET_PARAM.format(out=out, outdir=f"{out}/mesh"))
    sim2 = run_gadget(str(p2), mesh_devices=NDEV)
    assert not slab_calls, \
        "nu mesh run re-deposited instead of reusing phase-A rho_k"

    # the response evolved on both paths
    nt1, nt2 = sim1.nu_table, sim2.nu_table
    assert nt2.delta_tot is not None
    assert nt2.delta_tot.shape[1] >= 2
    # same delta_nu history at the few-percent level (same ICs, same
    # integral; only f32 P(k) measurement differs)
    np.testing.assert_allclose(nt2.delta_tot[:, -1],
                               nt1.delta_tot[:, -1], rtol=5e-2)
    # history rides the sharded snapshot
    assert "Neutrino/Deltas" in BigFile(
        os.path.join(out, "mesh", "PART_000"))
    # final P(k) parity single vs mesh
    a1, k1, pk1, nm1 = sim1.power_history[-1]
    a2, k2, pk2, nm2 = sim2.power_history[-1]
    sel = (nm1 > 0) & (nm2 > 0)
    np.testing.assert_allclose(pk2[sel], pk1[sel], rtol=5e-2)
    # lightcone outputs written by both drivers
    assert os.path.exists(os.path.join(out, "single", "LIGHTCONE"))
    assert os.path.exists(os.path.join(out, "mesh", "LIGHTCONE"))
