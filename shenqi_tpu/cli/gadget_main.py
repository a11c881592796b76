"""MP-Gadget equivalent CLI (gadget/main.cpp analog).

Usage:
  python -m shenqi_tpu.cli.gadget_main paramfile [RestartFlag] [SnapNum]

RestartFlag semantics match the reference (gadget/main.cpp:51-119):
  (none)/2 : start from the IC file (or snapshot SnapNum if given)
  1        : restart from the last stored snapshot
  3        : run FOF on snapshot SnapNum and write a halo catalog
  4        : compute and write the power spectrum of snapshot SnapNum
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .params import gadget_params
from ..utils.units import get_unitsystem
from ..utils.config import build_output_list
from ..cosmology.background import Cosmology
from ..core.timeline import Timeline
from ..core.integrate import TimestepParams
from ..io.snapshot import (SnapshotHeader, read_snapshot, write_snapshot,
                           state_to_blocks)
from ..io.bigfile import BigFile
from ..simulation import Simulation
from ..fof.fof import fof


def load_cosmology(ps, hdr: SnapshotHeader, time_begin, units):
    def pick(par, hval, default=None):
        v = ps.get_double(par)
        return hval if v < 0 else v
    cp = Cosmology(
        Omega0=ps.get_double("Omega0"),
        OmegaLambda=pick("OmegaLambda", hdr.OmegaLambda),
        OmegaBaryon=pick("OmegaBaryon", hdr.OmegaBaryon),
        HubbleParam=pick("HubbleParam", hdr.HubbleParam),
        CMBTemperature=ps.get_double("CMBTemperature"),
        RadiationOn=ps.get_int("RadiationOn"),
        Omega_fld=ps.get_double("Omega_fld"),
        w0_fld=ps.get_double("w0_fld"),
        wa_fld=ps.get_double("wa_fld"),
        Omega_ur=ps.get_double("Omega_ur"),
        MNu=(ps.get_double("MNue"), ps.get_double("MNum"),
             ps.get_double("MNut")),
        MassiveNuLinRespOn=ps.get_int("MassiveNuLinRespOn"))
    cp.init(time_begin, units)
    return cp


def _read_particles(snap_path, want_blocks: bool = False):
    hdr, blocks = read_snapshot(snap_path)
    pos_l, vel_l, ids_l, mass_l, type_l = [], [], [], [], []
    for t, props in sorted(blocks.items()):
        pos = props["Position"]
        n = len(pos)
        pos_l.append(pos)
        vel = props["Velocity"].astype(np.float64)
        if hdr.UsePeculiarVelocity:
            vel = vel * hdr.Time   # internal v = a * v_pec
        vel_l.append(vel)
        ids_l.append(props.get("ID", np.arange(n, dtype=np.uint64)))
        if "Mass" in props:
            mass_l.append(props["Mass"].astype(np.float64))
        else:
            mass_l.append(np.full(n, hdr.MassTable[t]))
        type_l.append(np.full(n, t, dtype=np.int8))
    out = (np.concatenate(pos_l), np.concatenate(vel_l),
           np.concatenate(ids_l), np.concatenate(mass_l),
           np.concatenate(type_l))
    if want_blocks:
        return hdr, out, blocks
    return hdr, out


def _init_checks(pos, ids, mass, cp, boxsize):
    """IC validation (init.cpp:88-115 analogs): unique IDs, positions
    inside the box, total matter mass consistent with Omega0."""
    if len(np.unique(ids)) != len(ids):
        raise ValueError("duplicate particle IDs in the ICs "
                         "(domain_test_id_uniqueness)")
    if np.any(pos < 0) or np.any(pos > boxsize):
        raise ValueError("particle positions outside the box "
                         "(check_positions)")
    masstot = float(np.sum(mass))
    omega = masstot / boxsize ** 3 / cp.RhoCrit
    omega_exp = cp.Omega0
    if cp.MassiveNuLinRespOn:
        omega_exp -= cp.ONu.get_omega_nu(1.0)
    if abs(omega - omega_exp) > 5e-2 * omega_exp:
        # the reference endruns here; tolerate synthetic test
        # snapshots but make the inconsistency loud
        print(f"WARNING: IC mass inconsistent with Omega0: particles "
              f"give Omega={omega:.4g}, expected {omega_exp:.4g} "
              f"(check_omega)")


def _resume_snap_counter(outdir):
    """Fallback snapshot counter: one past the last snapshot on
    record, so unplanned (HCI/off-OutputList) dumps never overwrite
    an existing PART_* after a RestartFlag-1 resume."""
    try:
        with open(os.path.join(outdir, "LastSnapNum.txt")) as f:
            return int(f.read().strip()) + 1
    except (OSError, ValueError):
        return 0


def _snap_index(ps, a, fallback):
    """Snapshot number = position of `a` in the FULL OutputList.

    Resume-invariant numbering (the reference derives snapshot numbers
    from the OutputList syncpoint index, timebinmgr.cpp setup_sync_points
    + checkpoint.cpp find_last_snapnum): a run resumed from PART_k keeps
    writing PART_{k+1}... instead of restarting at PART_000.  Falls back
    to the sequential counter when `a` is not an OutputList entry (e.g.
    TimeMax-only snapshots in synthetic tests)."""
    try:
        times = sorted(set(build_output_list(
            ps.get_string("OutputList"))))
    except Exception:
        return fallback
    if not times:
        return fallback
    ls = np.log(times)
    i = int(np.argmin(np.abs(ls - np.log(a))))
    if abs(ls[i] - np.log(a)) < 1e-6:
        return i
    return fallback


def _restore_gas_state(sim, blocks, ptype, atime, cp, min_egyspec):
    """Restore gas/star/BH state from snapshot blocks on resume.

    Mirrors the reference's petaio read-side converters
    (petaio.cpp:858-865: Entropy = (g-1) u / (Density a^-3)^(g-1),
    registered after Density so density is already read) and
    check_density_entropy's fixups + MinEgySpec floor
    (init.cpp:363-389).  Rows in `sim` are ordered by sorted ptype
    with within-type order preserved, matching `blocks`."""
    import dataclasses as _dc
    import jax.numpy as jnp
    from ..utils.constants import GAMMA_MINUS1
    g = blocks[0]
    ngas = int(sim.gas.ngas)
    a3inv = 1.0 / atime ** 3
    meanbar = cp.OmegaBaryon * cp.RhoCrit
    dens = np.asarray(g["Density"], np.float64).copy()
    bad = (dens <= 0) | ~np.isfinite(dens)
    dens[bad] = meanbar
    if bad.any():
        print(f"Detected bad densities in {bad.sum()} particles "
              "on disc")
    egyw = np.asarray(g.get("EgyWtDensity", dens), np.float64).copy()
    badw = (egyw <= 0) | ~np.isfinite(egyw)
    egyw[badw] = dens[badw]
    u = np.asarray(g["InternalEnergy"], np.float64)
    with np.errstate(invalid="ignore"):
        ent = GAMMA_MINUS1 * u / (dens * a3inv) ** GAMMA_MINUS1
    minent = GAMMA_MINUS1 * min_egyspec \
        / (dens * a3inv) ** GAMMA_MINUS1
    ent = np.where(~np.isfinite(ent) | (ent < minent), minent, ent)
    gas = sim.gas
    rep = dict(entropy=jnp.asarray(ent.astype(np.float32)),
               density=jnp.asarray(dens.astype(np.float32)),
               egy_wt_density=jnp.asarray(egyw.astype(np.float32)))
    for name, attr in (("ElectronAbundance", "ne"),
                       ("StarFormationRate", "sfr"),
                       ("Metallicity", "metallicity"),
                       ("DelayTime", "delay_time")):
        if name in g:
            rep[attr] = jnp.asarray(
                np.asarray(g[name], np.float32))
    if "Generation" in g:
        rep["generation"] = jnp.asarray(
            np.asarray(g["Generation"], np.int32))
    if "SmoothingLength" in g:
        hs = np.array(sim.particles.hsml)
        hs[:ngas] = np.asarray(g["SmoothingLength"], np.float32)
        sim.particles = _dc.replace(sim.particles,
                                    hsml=jnp.asarray(hs))
    # star rows: formation time, birth metallicity, return budget
    offs = {}
    o = 0
    for t in sorted(set(ptype.tolist())):
        n_t = int((ptype == t).sum())
        offs[t] = (o, o + n_t)
        o += n_t
    ntot = sim.particles.n
    if 4 in blocks and 4 in offs:
        s0, s1 = offs[4]
        st = blocks[4]
        if "StellarFormationTime" in st:
            ba = np.zeros(ntot, np.float32)
            ba[s0:s1] = np.asarray(st["StellarFormationTime"],
                                   np.float32)
            rep["birth_a"] = jnp.asarray(ba)
        if "Metallicity" in st:
            sm = np.array(gas.star_metallicity)
            sm[s0:s1] = np.asarray(st["Metallicity"], np.float32)
            rep["star_metallicity"] = jnp.asarray(sm)
        if "LastEnrichmentMyr" in st:
            le = np.array(gas.last_enrich_myr)
            le[s0:s1] = np.asarray(st["LastEnrichmentMyr"],
                                   np.float32)
            rep["last_enrich_myr"] = jnp.asarray(le)
        if "TotalMassReturned" in st:
            tr = np.array(gas.total_returned)
            trs = np.asarray(st["TotalMassReturned"], np.float32)
            tr[s0:s1] = trs
            rep["total_returned"] = jnp.asarray(tr)
            # mass0 back-solved from the returned fraction
            m0 = np.array(gas.mass0)
            mnow = np.asarray(sim.particles.mass)[s0:s1]
            m0[s0:s1] = mnow / np.maximum(1.0 - trs, 0.1)
            rep["mass0"] = jnp.asarray(m0)
    if 5 in blocks and 5 in offs:
        b0, b1 = offs[5]
        bh = blocks[5]
        if "BlackholeMass" in bh:
            bm = np.array(gas.bh_mass)
            bm[b0:b1] = np.asarray(bh["BlackholeMass"], np.float32)
            rep["bh_mass"] = jnp.asarray(bm)
        if "BlackholeAccretionRate" in bh:
            bd = np.array(gas.bh_mdot)
            bd[b0:b1] = np.asarray(bh["BlackholeAccretionRate"],
                                   np.float32)
            rep["bh_mdot"] = jnp.asarray(bd)
    sim.gas = _dc.replace(gas, **rep)
    sim._gas_entropy_is_u = False


def _build_nu_table(ps, cp, units, boxsize, nmesh, atime,
                    restart_flag, snapnum, icfile):
    """Massive-neutrino linear-response state (neutrinos_lra.cpp):
    the delta_tot integral table, its IC ratio from the CLASS
    transfer, and the resume restore.  Shared by the single-device
    and slab drivers.  Returns None when MassiveNuLinRespOn=0."""
    if not cp.MassiveNuLinRespOn:
        return None
    from ..physics.neutrinos_lra import DeltaTotTable
    wavenum = (2 * np.pi / boxsize) * np.arange(1, nmesh // 2 + 1)
    nt = DeltaTotTable.create(
        cp, wavenum, time_transfer=atime,
        unit_time_in_s=units.UnitTime_in_s,
        unit_velocity=units.UnitVelocity_in_cm_per_s)
    tfile = ps.get_string("FileWithTransferFunction")
    if tfile and os.path.exists(tfile):
        # IC ratio delta_nu/delta_cdm from the CLASS transfer
        tr = np.loadtxt(tfile)
        h = cp.HubbleParam
        ktr = tr[:, 0] * h / (units.UnitLength_in_cm
                              / 3.085678e24)   # h/Mpc -> internal
        dnu = np.abs(tr[:, 5]) if tr.shape[1] > 5 \
            else np.abs(tr[:, 3])
        dcdm = np.abs(tr[:, 3])
        nt.init_ratio = np.interp(
            wavenum, ktr, dnu / np.maximum(dcdm, 1e-30))
    # resuming: restore the delta_tot history saved with the
    # snapshot (the reference endruns without it)
    if restart_flag in (1, 2) and snapnum >= 0:
        if nt.load(icfile):
            print(f"Restored neutrino delta_tot history from "
                  f"{icfile}")
    return nt


def _run_slab(ps, hdr, cp, units, timeline, tsp, gravity_kw,
              pos, vel, mass, ids, boxsize, nmesh, atime, outdir,
              mesh_devices: int, max_steps: int, species=None,
              gas_u0=None, nu_table=None, resumed=False,
              procgrid=None):
    """Multi-chip run: the slab simulation loop (TreePM + adiabatic
    SPH when gas is present) with sharded snapshot/FOF/P(k) outputs
    (run.cpp:331-822 distributed; the product wiring for
    parallel.slab_sim)."""
    from ..parallel.slab_sim import SlabSimulation
    from ..parallel.sharded import make_mesh
    from ..io.sharded_io import save_snapshot_sharded
    from ..fof.slab import (make_fof_slab,
                            compile_groups_slab_distributed)
    from ..io.fofio import save_fof

    mesh = make_mesh(mesh_devices)
    if species is not None:
        sim = SlabSimulation.from_species(
            mesh, species, cp, boxsize, nmesh, timeline, atime,
            gas_u0=gas_u0, tsp=tsp, gravity_kw=gravity_kw,
            headroom=ps.get_double("PartAllocFactor"))
    else:
        sim = SlabSimulation.from_arrays(
            mesh, pos, vel, mass, ids, cp, boxsize, nmesh, timeline,
            atime, tsp=tsp, gravity_kw=gravity_kw,
            headroom=ps.get_double("PartAllocFactor"))
    sim.nu_table = nu_table
    sim.resumed = resumed
    sim.procgrid = procgrid
    sim.hierarchical = bool(ps.get_int("SplitGravityTimestepsOn")
                            or ps.get_int("HierarchicalGravity"))
    # anti-correlation box shift, a fraction of a PM cell
    # (run.cpp:426-428), honored on --mesh too
    sim.random_offset_frac = (ps.get_double("RandomParticleOffset")
                              / max(nmesh, 1))

    # lightcone crossings collected during drifts (lightcone.cpp),
    # computed one device shard at a time (bounded host memory)
    lightcone = None
    if ps.get_int("LightconeOn"):
        from ..physics.lightcone import Lightcone
        lightcone = Lightcone(CP=cp, boxsize=boxsize,
                              unit_velocity=(
                                  units.UnitVelocity_in_cm_per_s))

        def on_drift(s, a0, a1):
            f = s.fields
            shards = {k: f[k].addressable_shards
                      for k in ("ipos", "vel", "mass",
                                "id_lo", "id_hi")}
            off = (s._offset_u32 if s._offset_u32 is not None
                   else np.zeros(3, np.uint32))
            for d in range(len(shards["ipos"])):
                ip = np.asarray(shards["ipos"][d].data) - off
                vl = np.asarray(shards["vel"][d].data)
                ms = np.asarray(shards["mass"][d].data)
                ids64 = ((np.asarray(shards["id_hi"][d].data)
                          .astype(np.uint64) << np.uint64(32))
                         | np.asarray(shards["id_lo"][d].data)
                         .astype(np.uint64))
                lightcone.compute(a0, a1, ip, vl, ids64, ms > 0)
        sim.on_drift = on_drift

    # distributed subgrid config (elementwise cooling + SF flips)
    if species is not None and (ps.get_int("CoolingOn")
                                or ps.get_int("StarformationOn")):
        from ..physics.cooling_rates import CoolingParams, TreeCool
        from ..physics.sfr import SFRParams, CoolingUnits
        sim.cooling_on = bool(ps.get_int("CoolingOn"))
        sim.sfr_on = bool(ps.get_int("StarformationOn"))
        sim.coolpar = CoolingParams(
            CMBTemperature=ps.get_double("CMBTemperature"),
            MinGasTemp=ps.get_double("MinGasTemp"),
            PhotoIonizeFactor=ps.get_double("PhotoIonizeFactor"),
            SelfShieldingOn=bool(ps.get_int("SelfShieldingOn")),
            PhotoIonizationOn=bool(ps.get_int("PhotoIonizationOn")),
            UVRedshiftThreshold=ps.get_double("UVRedshiftThreshold"),
            fBar=cp.OmegaBaryon / max(cp.OmegaCDM, 1e-10))
        tcf = ps.get_string("TreeCoolFile")
        if sim.cooling_on and tcf:
            sim.treecool = TreeCool(tcf,
                                    sim.coolpar.PhotoIonizeFactor)
        sim.coolunits = CoolingUnits.create(units, cp.HubbleParam)
        if sim.sfr_on:
            from ..physics.cooling_rates import UVBG
            gas_m = np.concatenate([np.atleast_1d(sp_m)
                                    for t, _, _, sp_m, _ in species
                                    if t == 0])
            avg_bar = float(np.median(gas_m))
            sim.sfrpar = SFRParams(
                CritOverDensity=ps.get_double("CritOverDensity"),
                CritPhysDensity=ps.get_double("CritPhysDensity"),
                FactorSN=ps.get_double("FactorSN"),
                FactorEVP=ps.get_double("FactorEVP"),
                TempSupernova=ps.get_double("TempSupernova"),
                TempClouds=ps.get_double("TempClouds"),
                MaxSfrTimescale=ps.get_double("MaxSfrTimescale"),
                Generations=int(ps.get_double("Generations")),
                MinGasTemp=ps.get_double("MinGasTemp"),
                Criterion=ps.get_enum("StarformationCriterion"),
                BHFeedbackUseTcool=ps.get_int("BHFeedbackUseTcool"))
            sim.sfrpar.init(cp, units, avg_bar, UVBG(), sim.coolpar)
            if ps.get_int("WindOn"):
                from ..physics.winds import WindParams
                sim.winds_on = True
                sim.windpar = WindParams(
                    WindModel=ps.get_enum("WindModel"),
                    WindEfficiency=ps.get_double("WindEfficiency"),
                    WindEnergyFraction=ps.get_double(
                        "WindEnergyFraction"),
                    WindSigma0=ps.get_double("WindSigma0"),
                    WindSpeedFactor=ps.get_double("WindSpeedFactor"),
                    WindFreeTravelLength=ps.get_double(
                        "WindFreeTravelLength"),
                    WindFreeTravelDensFac=ps.get_double(
                        "WindFreeTravelDensFac"),
                    MinWindVelocity=ps.get_double("MinWindVelocity"),
                    WindThermalFactor=ps.get_double(
                        "WindThermalFactor"))
                sim.windpar.init(sim.sfrpar.FactorSN,
                                 sim.sfrpar.EgySpecSN,
                                 sim.sfrpar.PhysDensThresh,
                                 units.UnitTime_in_s)
    if species is not None:
        # fluctuating UVB tables (cooling_uvfluc.cpp)
        uvf = ps.get_string("UVFluctuationFile")
        if uvf:
            from ..physics.uv_fluctuations import ZreionTable
            sim.zreion_table = ZreionTable.load(
                uvf, boxsize, units.UnitLength_in_cm)
        mcf = ps.get_string("MetalCoolFile")
        if mcf and ps.get_int("MetalCoolingOn"):
            from ..physics.uv_fluctuations import MetalCoolingTable
            sim.metal_cool = MetalCoolingTable.load(mcf)
        # QSO helium reionization (cooling_qso_lightup.cpp), now on
        # the slab loop: bubbles applied device-side at FOF cadence
        if (ps.get_int("QSOLightupOn")
                or ps.get_int("HeliumReionizationOn")):
            rhf = ps.get_string("ReionHistFile")
            if rhf:
                from ..physics.helium_reion import (HeliumReion,
                                                    QSOLightupParams)
                sim.helium = HeliumReion.load(rhf, QSOLightupParams(
                    qso_candidate_min_mass=ps.get_double(
                        "QSOMinMass"),
                    qso_candidate_max_mass=ps.get_double(
                        "QSOMaxMass"),
                    mean_bubble=ps.get_double("QSOMeanBubble"),
                    var_bubble=max(ps.get_double("QSOVarBubble"),
                                   1e-10),
                    heIIIreion_finish_frac=ps.get_double(
                        "QSOHeIIIReionFinishFrac")))
        # excursion-set reionization (uvbg.cpp), distributed over
        # the pencil FFT (parallel/excursion_slab)
        if ps.get_int("ExcursionSetReionOn"):
            from ..physics.excursion import ExcursionSetParams
            from ..physics.uv_fluctuations import J21Coeffs
            sim.excursion = ExcursionSetParams(
                UVBGdim=ps.get_int("UVBGdim"),
                ReionRBubbleMax=ps.get_double("ReionRBubbleMax"),
                ReionRBubbleMin=ps.get_double("ReionRBubbleMin"),
                ReionDeltaRFactor=ps.get_double("ReionDeltaRFactor"),
                ReionFilterType=ps.get_int("ReionFilterType"),
                RtoMFilterType=ps.get_int("RtoMFilterType"),
                ReionNionPhotPerBary=ps.get_double(
                    "ReionNionPhotPerBary"),
                AlphaUV=ps.get_double("AlphaUV"),
                EscapeFractionNorm=ps.get_double(
                    "EscapeFractionNorm"),
                EscapeFractionScaling=ps.get_double(
                    "EscapeFractionScaling"),
                ReionUseParticleSFR=ps.get_int("ReionUseParticleSFR"),
                ReionGammaHaloBias=ps.get_double(
                    "ReionGammaHaloBias"),
                ReionSFRTimescale=ps.get_double(
                    "ReionSFRTimescale"))
            sim.excursion_zstop = ps.get_double("ExcursionSetZStop")
            sim.units = units
            jcf = ps.get_string("J21CoeffFile")
            if jcf:
                sim.j21_coeffs = J21Coeffs.load(jcf)
    if species is not None and ps.get_int("MetalReturnOn"):
        from ..physics.metal_return import MetalReturn
        ydir = ps.get_string("MetalYieldDir") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "data_yields")
        sim.metal_return_on = True
        sim.metals = MetalReturn.load(
            ydir, sn1a_n0=ps.get_double("MetalsSn1aN0"))
    if species is not None and ps.get_int("BlackHoleOn"):
        from ..physics.blackhole import BHParams
        sim.bh_on = True
        sim.bhpar = BHParams(
            BlackHoleAccretionFactor=ps.get_double(
                "BlackHoleAccretionFactor"),
            BlackHoleEddingtonFactor=ps.get_double(
                "BlackHoleEddingtonFactor"),
            BlackHoleFeedbackFactor=ps.get_double(
                "BlackHoleFeedbackFactor"),
            SeedBlackHoleMass=ps.get_double("SeedBlackHoleMass"),
            SeedBHDynMass=ps.get_double("SeedBHDynMass"),
            MinFoFMassForNewSeed=ps.get_double(
                "MinFoFMassForNewSeed"),
            MinMStarForNewSeed=ps.get_double("MinMStarForNewSeed"),
            BlackHoleNgbFactor=ps.get_double("BlackHoleNgbFactor"),
            BlackHoleMaxAccretionRadius=ps.get_double(
                "BlackHoleMaxAccretionRadius"),
            UnitTime_in_s=units.UnitTime_in_s,
            UnitVelocity_in_cm_per_s=units.UnitVelocity_in_cm_per_s,
            HubbleParam=cp.HubbleParam,
            BH_DRAG=ps.get_int("BH_DRAG"))
        sim.bh_dynfric_on = ps.get_int("BH_DynFrictionMethod") > 0

    base = ps.get_string("SnapshotFileBase")
    snapshot_with_fof = bool(ps.get_int("SnapshotWithFOF"))
    snap_counter = [_resume_snap_counter(outdir)]
    npart_tot = len(pos)
    mean_sep = boxsize / np.cbrt(max(npart_tot, 1))
    b_link = ps.get_double("FOFHaloLinkingLength") * mean_sep
    fof_fn = [None]

    def on_snapshot(s, a):
        # max() keeps numbering monotone when an unplanned (HCI)
        # dump has consumed an index below this OutputList position
        snap_counter[0] = max(_snap_index(ps, a, snap_counter[0]),
                              snap_counter[0])
        path = os.path.join(outdir, f"{base}_{snap_counter[0]:03d}")
        shdr = SnapshotHeader(
            TotNumPart=np.zeros(6, np.uint64), MassTable=np.zeros(6),
            Time=a, BoxSize=boxsize, Omega0=cp.Omega0,
            OmegaLambda=cp.OmegaLambda, OmegaBaryon=cp.OmegaBaryon,
            HubbleParam=cp.HubbleParam,
            UnitLength_in_cm=units.UnitLength_in_cm,
            UnitMass_in_g=units.UnitMass_in_g,
            UnitVelocity_in_cm_per_s=units.UnitVelocity_in_cm_per_s,
            UsePeculiarVelocity=1, TimeIC=hdr.TimeIC)
        f = s.fields
        if getattr(s, "has_gas", False):
            from ..io.sharded_io import save_snapshot_sharded_multi
            save_snapshot_sharded_multi(
                path, shdr,
                dict(f, ipos=s.output_ipos(), pid=f["id_lo"],
                     pid_hi=f["id_hi"]),
                s.mesh, boxsize, a, id_offset=0)
        else:
            save_snapshot_sharded(
                path, shdr,
                {"ipos": s.output_ipos(), "vel": f["vel"],
                 "mass": f["mass"], "pid": f["id_lo"],
                 "pid_hi": f["id_hi"]},
                s.mesh, boxsize, a, id_offset=0)
        nt = getattr(s, "nu_table", None)
        if nt is not None:
            nt.save(path)      # delta_nu history rides the snapshot
        with open(os.path.join(outdir, "LastSnapNum.txt"), "w") as fh:
            fh.write(str(snap_counter[0]))
        if s.power_history:
            a_p, kk, pk, nm = s.power_history[-1]
            d1 = 1.0 / cp.growth_factor(1.0, a)
            fn = os.path.join(outdir, f"powerspectrum-{a:.4f}.txt")
            with open(fn, "w") as fh:
                fh.write("# in Mpc/h Units \n")
                fh.write(f"# D1 = {d1:g} \n")
                fh.write("# k P N P(z=0)\n")
                for j in range(len(kk)):
                    if nm[j] > 0:
                        fh.write(f"{kk[j]:g} {pk[j]:g} {int(nm[j])} "
                                 f"{pk[j] / d1 ** 2:g}\n")
        if snapshot_with_fof:
            balanced = s.balance_domains and s._cuts_dev is not None
            if fof_fn[0] is None:
                fof_fn[0] = make_fof_slab(
                    s.mesh, b_link, boxsize,
                    nlevels=s.gravity.tree_nlevels,
                    with_cuts=balanced)
            fof_fields = {"ipos": f["ipos"], "mass": f["mass"],
                          "pid": f["id_lo"].astype(np.int32)}
            if balanced:
                # balanced domains: ghost strips must follow the
                # actual ownership cuts, not the uniform slabs
                glabel, finfo = fof_fn[0](fof_fields, s._cuts_dev)
            else:
                glabel, finfo = fof_fn[0](fof_fields)
            # device-side catalog reduction (fof.cpp:903 analog):
            # the host only materializes the G-sized catalog
            groups, _pid = compile_groups_slab_distributed(
                s.mesh, glabel, dict(f, ipos=s.output_ipos()),
                boxsize, min_length=ps.get_int("FOFHaloMinLength"))
            pig = os.path.join(
                outdir, f"{ps.get_string('FOFFileBase')}"
                f"_{snap_counter[0]:03d}")
            save_fof(pig, groups, shdr, a)
            print(f"FOF at a={a:g}: {groups.ngroups} groups -> {pig}")

        # lensing potential planes inside the distributed loop
        # (run.cpp:743-750, plane.cpp): the NGP deposit runs over
        # the SHARDED ipos — XLA reduces the replicated R x R grid
        # across devices itself — and is integer-exact, so the
        # planes are bit-identical to the single-device loop's
        if ps.get_int("WritePlaneOn"):
            from functools import partial as _partial
            import jax as _jax
            from ..physics.plane import (PlaneParams,
                                         plane_counts_ipos,
                                         write_planes_deposit)
            pcuts = [float(x) for x in ps.get_string(
                "PlaneCutPoints").split(",") if x.strip()]
            pnormals = [int(x) for x in ps.get_string(
                "PlaneNormals").split(",") if x.strip()]
            par = PlaneParams(
                Resolution=ps.get_int("PlaneResolution"),
                Thickness=ps.get_double("PlaneThickness"),
                CutPoints=pcuts, Normals=pnormals or [0, 1, 2])
            alive_d = f["mass"] > 0

            def _deposit(normal, center, thickness):
                dep = _jax.jit(_partial(
                    plane_counts_ipos, boxsize=boxsize,
                    normal=normal, center=center,
                    thickness=thickness,
                    resolution=par.Resolution))
                return dep(s.output_ipos(), alive_d)

            ntot = int(np.asarray(alive_d).sum())
            write_planes_deposit(snap_counter[0], a, cp, _deposit,
                                 ntot, boxsize, outdir,
                                 units.UnitVelocity_in_cm_per_s,
                                 units.UnitLength_in_cm, par)
        snap_counter[0] += 1

    sim.on_snapshot = on_snapshot
    # HCI on the slab loop too: the query runs on the host driver
    # (one per process here; rank-0 semantics of hci.cpp), checkpoint
    # reuses the sharded snapshot writer at the next free index
    from ..utils.hci import HCI
    sim.hci = HCI(outdir,
                  time_limit_cpu=ps.get_double("TimeLimitCPU"),
                  auto_checkpoint_time=ps.get_double(
                      "AutoSnapshotTime"))
    sim.on_checkpoint = on_snapshot

    from ..utils.walltime import Walltime
    wt = Walltime()
    sim.walltime = wt
    fd_cpu = open(os.path.join(outdir, ps.get_string("CpuFile")), "a")

    def on_step(s):
        wt.write_cpu_log(fd_cpu, s.atime())
        wt.reset_step()

    sim.on_step = on_step

    # FOF-cadence physics on PM steps (run.cpp:364,637-660): BH
    # seeding searches, helium QSO bubbles, and the excursion set's
    # halo-mass refresh share one FOF pass
    if sim.bh_on or sim.helium is not None \
            or sim.excursion is not None:
        seed_factor = ps.get_double("TimeBetweenSeedingSearch")
        next_seed_check = [atime]
        min_len = ps.get_int("FOFHaloMinLength")

        def _slab_fof_groups(s):
            f = s.fields
            balanced = s.balance_domains and s._cuts_dev is not None
            if fof_fn[0] is None:
                fof_fn[0] = make_fof_slab(
                    s.mesh, b_link, boxsize,
                    nlevels=s.gravity.tree_nlevels,
                    with_cuts=balanced)
            ffields = {"ipos": f["ipos"], "mass": f["mass"],
                       "pid": f["id_lo"].astype(np.int32)}
            if balanced:
                glabel, _ = fof_fn[0](ffields, s._cuts_dev)
            else:
                glabel, _ = fof_fn[0](ffields)
            groups, _pid = compile_groups_slab_distributed(
                s.mesh, glabel, f, boxsize, min_length=min_len)
            return groups

        def _seed_from_groups(s, groups):
            from ..physics.blackhole import seed_black_holes
            f = s.fields
            to_seed = seed_black_holes(
                groups, groups.mass_by_type[:, 4],
                groups.length_by_type[:, 5], s.bhpar)
            if not len(to_seed):
                return
            alive = np.asarray(f["mass"]) > 0
            gid_alive = groups.group_id
            dens = np.asarray(f["density"])[alive]
            is_gas_a = np.asarray(f["ptyp"])[alive] == 0
            rows_global = np.nonzero(alive)[0]
            seeds = []
            for gi in to_seed:
                cand = np.nonzero((gid_alive == gi + 1)
                                  & is_gas_a)[0]
                if cand.size:
                    seeds.append(int(
                        rows_global[cand[np.argmax(dens[cand])]]))
            if seeds:
                s._seed_bh_rows(seeds)
                print(f"Seeded {len(seeds)} black holes")

        def on_pm_step(s):
            a = s.atime()
            seed_due = sim.bh_on and a >= next_seed_check[0]
            he_due = s.helium is not None and s.helium.during(
                1.0 / a - 1.0)
            exc_due = (s.excursion is not None
                       and 1.0 / a - 1.0 > s.excursion_zstop
                       and a >= next_seed_check[0])
            if not (seed_due or he_due or exc_due):
                return
            groups = _slab_fof_groups(s)
            if seed_due or exc_due:
                next_seed_check[0] = a * seed_factor
            if s.excursion is not None:
                # per-row FOF halo mass for escape fractions,
                # aligned with the CURRENT row layout (rows migrate,
                # so it lives in s.fields and rides exchanges).
                # groups.group_id indexes the alive-compacted rows.
                import jax
                from jax.sharding import (NamedSharding,
                                          PartitionSpec as _P)
                alive_rows = np.nonzero(
                    np.asarray(s.fields["mass"]) > 0)[0]
                gid = groups.group_id
                hm = np.zeros(s.fields["mass"].shape[0], np.float32)
                ing = gid > 0
                if groups.ngroups:
                    hm[alive_rows[ing]] = groups.masses[gid[ing] - 1]
                s.fields["hmass"] = jax.device_put(
                    hm, NamedSharding(s.mesh, _P("dp")))
            if not groups.ngroups:
                return
            if seed_due:
                _seed_from_groups(s, groups)
            if he_due:
                nion = s.helium_step(groups.masses, groups.cm)
                if nion:
                    print(f"HeIII QSO bubbles: {nion} ionized "
                          f"at a={a:g}")

        sim.on_pm_step = on_pm_step

    sim.run(max_steps=max_steps)
    fd_cpu.close()
    if lightcone is not None:
        lc_path = lightcone.save(os.path.join(outdir, "LIGHTCONE"))
        print(f"Lightcone -> {lc_path}")
    return sim


def run_gadget(paramfile: str, restart_flag: int = 2,
               snapnum: int = -1, max_steps: int = 10 ** 9,
               strict: bool = False, mesh_devices: int = 0,
               procgrid=None):
    ps = gadget_params()
    ps.parse_file(paramfile, strict=strict)
    outdir = ps.get_string("OutputDir")
    os.makedirs(outdir, exist_ok=True)

    icfile = ps.get_string("InitCondFile")
    if restart_flag == 1:
        lastsnap_file = os.path.join(outdir, "LastSnapNum.txt")
        with open(lastsnap_file) as f:
            snapnum = int(f.read().strip())
        icfile = os.path.join(outdir, f"{ps.get_string('SnapshotFileBase')}"
                              f"_{snapnum:03d}")
    elif snapnum >= 0:
        icfile = os.path.join(outdir, f"{ps.get_string('SnapshotFileBase')}"
                              f"_{snapnum:03d}")

    hdr, (pos, vel, ids, mass, ptype), snap_blocks = _read_particles(
        icfile, want_blocks=True)
    units = get_unitsystem(hdr.UnitLength_in_cm, hdr.UnitMass_in_g,
                           hdr.UnitVelocity_in_cm_per_s)
    atime = hdr.Time
    cp = load_cosmology(ps, hdr, atime, units)
    boxsize = hdr.BoxSize
    _init_checks(pos, ids, mass, cp, boxsize)

    if restart_flag == 99:
        # built-in force accuracy tests (runtests.cpp analog)
        from ..runtests import run_gravity_test
        nmesh = ps.get_int("Nmesh")
        if nmesh <= 0:
            nmesh = 2 * int(round(np.cbrt(sum(hdr.TotNumPart))))
        return run_gravity_test(
            pos, mass, cp, boxsize, nmesh,
            asmth=ps.get_double("Asmth"),
            rcut_cells=ps.get_double("TreeRcut"),
            err_tol_force_acc=ps.get_double("ErrTolForceAcc"),
            bh_opening_angle=ps.get_double("BHOpeningAngle"))

    if restart_flag == 3:
        # FOF postprocessing
        from ..core.particles import float_to_ipos
        import jax.numpy as jnp  # noqa: used below
        npart_tot = int(sum(hdr.TotNumPart))
        mean_sep = boxsize / np.cbrt(
            hdr.TotNumPart[1] if hdr.TotNumPart[1] > 0 else npart_tot)
        groups = fof(jnp.asarray(float_to_ipos(pos, boxsize)),
                     vel.astype(np.float32), mass.astype(np.float32),
                     ptype, np.ones(len(pos), bool), boxsize, mean_sep,
                     linking_length=ps.get_double("FOFHaloLinkingLength"),
                     min_length=ps.get_int("FOFHaloMinLength"))
        from ..io.fofio import save_fof, save_fof_particles
        path = os.path.join(outdir, f"{ps.get_string('FOFFileBase')}"
                            f"_{max(snapnum, 0):03d}")
        save_fof(path, groups, hdr, atime)
        if ps.get_int("FOFSaveParticles"):
            import dataclasses as _dc
            from ..core.particles import ParticleData
            n = len(pos)
            pd = ParticleData.zeros(n)
            pd = _dc.replace(
                pd, ipos=jnp.asarray(float_to_ipos(pos, boxsize)),
                vel=jnp.asarray(vel.astype(np.float32)),
                mass=jnp.asarray(mass.astype(np.float32)),
                ptype=jnp.asarray(ptype),
                mask=jnp.ones(n, bool),
                id_lo=jnp.asarray((ids.astype(np.uint64)
                                   & np.uint64(0xFFFFFFFF)).astype(
                                       np.uint32)),
                id_hi=jnp.asarray((ids.astype(np.uint64)
                                   >> np.uint64(32)).astype(np.uint32)))
            save_fof_particles(path, groups, pd, boxsize=boxsize,
                               atime=atime)
        print(f"FOF: {groups.ngroups} groups -> {path}")
        return groups

    if restart_flag == 4:
        # power-spectrum-only mode (runpower, gadget/main.cpp:106-119)
        from ..core.particles import float_to_ipos
        from ..gravity.pm import PMConfig, pm_forces, finalize_power
        from ..utils.constants import CM_PER_MPC
        import jax.numpy as jnp
        nmesh = ps.get_int("Nmesh")
        if nmesh <= 0:
            nmesh = 2 * int(round(np.cbrt(sum(hdr.TotNumPart))))
        cfg = PMConfig(nmesh=nmesh, boxsize=boxsize,
                       G=cp.GravInternal,
                       asmth=ps.get_double("Asmth"))
        ipos = jnp.asarray(float_to_ipos(pos, boxsize))
        _, _, psacc = pm_forces(ipos, jnp.asarray(
            mass.astype(np.float32)), cfg, want_potential=False)
        mpc = CM_PER_MPC / units.UnitLength_in_cm
        kk, pk, nm = finalize_power(psacc, cfg, boxsize / mpc)
        d1 = 1.0 / cp.growth_factor(1.0, atime)
        fn = os.path.join(outdir, f"powerspectrum-{atime:.4f}.txt")
        with open(fn, "w") as f:
            f.write("# in Mpc/h Units \n")
            f.write(f"# D1 = {d1:g} \n")
            f.write("# k P N P(z=0)\n")
            for j in range(len(kk)):
                if nm[j] > 0:
                    f.write(f"{kk[j]:g} {pk[j]:g} {int(nm[j])} "
                            f"{pk[j] / d1 ** 2:g}\n")
        print(f"runpower: wrote {fn}")
        return fn

    # timeline
    outputs = build_output_list(ps.get_string("OutputList"))
    timemax = ps.get_double("TimeMax")
    timeline = Timeline.setup(outputs, atime, timemax,
                              ps.get_double("NoSnapshotUntilTime"),
                              bool(ps.get_int("SnapshotWithFOF")))

    nmesh = ps.get_int("Nmesh")
    if nmesh <= 0:
        nmesh = 2 * int(round(np.cbrt(sum(hdr.TotNumPart))))
    tsp = TimestepParams(
        ErrTolIntAccuracy=ps.get_double("ErrTolIntAccuracy"),
        CourantFac=ps.get_double("CourantFac"),
        MaxRMSDisplacementFac=ps.get_double("MaxRMSDisplacementFac"),
        MaxSizeTimestep=ps.get_double("MaxSizeTimestep"),
        MinSizeTimestep=ps.get_double("MinSizeTimestep"),
        MaxGasVel=ps.get_double("MaxGasVel"),
        ForceEqualTimesteps=bool(ps.get_int("ForceEqualTimesteps")),
        FastParticleType=ps.get_int("FastParticleType"))
    gravity_kw = dict(
        asmth=ps.get_double("Asmth"),
        rcut_cells=ps.get_double("TreeRcut"),
        err_tol_force_acc=ps.get_double("ErrTolForceAcc"),
        bh_opening_angle=ps.get_double("BHOpeningAngle"),
        use_bh=1 if ps.get_int("TreeUseBH") == 1 else 0,
        window_type=("exact" if ps.get_enum(
            "ShortRangeForceWindowType") == 0 else "erfc"))
    # softening: honor an explicitly-set fraction (reference name
    # GravitySoftening, params.cpp:161, in mean DM separations;
    # spline h = 2.8x that); otherwise the sims derive the same
    # 1/30 default themselves
    if ps.is_set("GravitySoftening") or \
            ps.is_set("FractionalGravitySoftening"):
        frac = ps.get_double(
            "GravitySoftening" if ps.is_set("GravitySoftening")
            else "FractionalGravitySoftening")
        gravity_kw["softening"] = (
            2.8 * frac * boxsize / np.cbrt(max(len(pos), 1)))

    has_gas = bool((ptype == 0).any()) and ps.get_int("HydroOn")

    if mesh_devices:
        # multi-chip slab run (--mesh N): TreePM + SPH + cooling/SF
        # (spawns into local dead rows) + winds + metal return + BH
        # + neutrino LRA + lightcone, all distributed
        nu_table = _build_nu_table(ps, cp, units, boxsize, nmesh,
                                   atime, restart_flag, snapnum,
                                   icfile)
        gas_u0 = None
        species = None
        if has_gas:
            from ..utils.constants import (BOLTZMANN, PROTONMASS,
                                           GAMMA_MINUS1,
                                           HYDROGEN_MASSFRAC)
            init_temp = ps.get_double("InitGasTemp")
            if init_temp < 0:
                init_temp = cp.CMBTemperature / atime
            mw = 4.0 / (1 + 3 * HYDROGEN_MASSFRAC)
            gas_u0 = (BOLTZMANN * init_temp / mw / PROTONMASS
                      / GAMMA_MINUS1
                      / units.UnitInternalEnergy_in_cgs)
            species = []
            for t in sorted(set(ptype.tolist())):
                sel = ptype == t
                species.append((int(t), pos[sel], vel[sel],
                                mass[sel], ids[sel]))
        return _run_slab(ps, hdr, cp, units, timeline, tsp,
                         gravity_kw, pos, vel, mass, ids, boxsize,
                         nmesh, atime, outdir, mesh_devices,
                         max_steps, species=species, gas_u0=gas_u0,
                         nu_table=nu_table,
                         resumed=(restart_flag == 1),
                         procgrid=procgrid)

    if has_gas:
        from ..simulation_gas import GasPhysics
        from ..physics.cooling_rates import CoolingParams, TreeCool
        from ..physics.sfr import SFRParams, CoolingUnits
        from ..physics.winds import WindParams
        from ..sph.kernels import KERNELS
        cooling_on = bool(ps.get_int("CoolingOn"))
        sfr_on = bool(ps.get_int("StarformationOn"))
        winds_on = bool(ps.get_int("WindOn"))
        coolpar = CoolingParams(
            CMBTemperature=ps.get_double("CMBTemperature"),
            MinGasTemp=ps.get_double("MinGasTemp"),
            PhotoIonizeFactor=ps.get_double("PhotoIonizeFactor"),
            SelfShieldingOn=bool(ps.get_int("SelfShieldingOn")),
            PhotoIonizationOn=bool(ps.get_int("PhotoIonizationOn")),
            UVRedshiftThreshold=ps.get_double("UVRedshiftThreshold"),
            fBar=cp.OmegaBaryon / max(cp.OmegaCDM, 1e-10))
        treecool = None
        tcf = ps.get_string("TreeCoolFile")
        if cooling_on and tcf:
            treecool = TreeCool(tcf, coolpar.PhotoIonizeFactor)
        cu = CoolingUnits.create(units, cp.HubbleParam)
        sfrpar = None
        windpar = None
        if sfr_on:
            avg_bar = float(np.median(mass[ptype == 0]))
            sfrpar = SFRParams(
                CritOverDensity=ps.get_double("CritOverDensity"),
                CritPhysDensity=ps.get_double("CritPhysDensity"),
                FactorSN=ps.get_double("FactorSN"),
                FactorEVP=ps.get_double("FactorEVP"),
                TempSupernova=ps.get_double("TempSupernova"),
                TempClouds=ps.get_double("TempClouds"),
                MaxSfrTimescale=ps.get_double("MaxSfrTimescale"),
                Generations=int(ps.get_double("Generations")),
                MinGasTemp=ps.get_double("MinGasTemp"),
                Criterion=ps.get_enum("StarformationCriterion"),
                BHFeedbackUseTcool=ps.get_int("BHFeedbackUseTcool"))
            from ..physics.cooling_rates import UVBG
            sfrpar.init(cp, units, avg_bar, UVBG(), coolpar)
            if winds_on:
                windpar = WindParams(
                    WindModel=ps.get_enum("WindModel"),
                    WindEfficiency=ps.get_double("WindEfficiency"),
                    WindEnergyFraction=ps.get_double(
                        "WindEnergyFraction"),
                    WindSigma0=ps.get_double("WindSigma0"),
                    WindSpeedFactor=ps.get_double("WindSpeedFactor"),
                    WindFreeTravelLength=ps.get_double(
                        "WindFreeTravelLength"),
                    WindFreeTravelDensFac=ps.get_double(
                        "WindFreeTravelDensFac"),
                    MinWindVelocity=ps.get_double("MinWindVelocity"),
                    WindThermalFactor=ps.get_double(
                        "WindThermalFactor"))
                windpar.init(sfrpar.FactorSN, sfrpar.EgySpecSN,
                             sfrpar.PhysDensThresh, units.UnitTime_in_s)
        kern = {0: "cubic", 1: "quintic", 2: "quartic"}[
            ps.get_enum("DensityKernelType")]

        # metal return (metal_return.cpp)
        metals = None
        if ps.get_int("MetalReturnOn"):
            from ..physics.metal_return import MetalReturn
            ydir = ps.get_string("MetalYieldDir") or os.path.join(
                os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))),
                "data_yields")
            metals = MetalReturn.load(
                ydir, sn1a_n0=ps.get_double("MetalsSn1aN0"))

        # fluctuating UVB tables (cooling_uvfluc.cpp)
        zreion_table = None
        uvf = ps.get_string("UVFluctuationFile")
        if uvf:
            from ..physics.uv_fluctuations import ZreionTable
            zreion_table = ZreionTable.load(uvf, boxsize,
                                            units.UnitLength_in_cm)
        metal_cool = None
        mcf = ps.get_string("MetalCoolFile")
        if mcf and ps.get_int("MetalCoolingOn"):
            from ..physics.uv_fluctuations import MetalCoolingTable
            metal_cool = MetalCoolingTable.load(mcf)

        # QSO helium reionization (cooling_qso_lightup.cpp)
        helium = None
        if (ps.get_int("QSOLightupOn")
                or ps.get_int("HeliumReionizationOn")):
            rhf = ps.get_string("ReionHistFile")
            if rhf:
                from ..physics.helium_reion import (HeliumReion,
                                                    QSOLightupParams)
                helium = HeliumReion.load(rhf, QSOLightupParams(
                    qso_candidate_min_mass=ps.get_double("QSOMinMass"),
                    qso_candidate_max_mass=ps.get_double("QSOMaxMass"),
                    mean_bubble=ps.get_double("QSOMeanBubble"),
                    var_bubble=max(ps.get_double("QSOVarBubble"),
                                   1e-10),
                    heIIIreion_finish_frac=ps.get_double(
                        "QSOHeIIIReionFinishFrac")))

        # excursion-set reionization (uvbg.cpp)
        excursion = None
        j21c = None
        if ps.get_int("ExcursionSetReionOn"):
            from ..physics.excursion import ExcursionSetParams
            from ..physics.uv_fluctuations import J21Coeffs
            excursion = ExcursionSetParams(
                UVBGdim=ps.get_int("UVBGdim"),
                ReionRBubbleMax=ps.get_double("ReionRBubbleMax"),
                ReionRBubbleMin=ps.get_double("ReionRBubbleMin"),
                ReionDeltaRFactor=ps.get_double("ReionDeltaRFactor"),
                ReionFilterType=ps.get_int("ReionFilterType"),
                RtoMFilterType=ps.get_int("RtoMFilterType"),
                ReionNionPhotPerBary=ps.get_double(
                    "ReionNionPhotPerBary"),
                AlphaUV=ps.get_double("AlphaUV"),
                EscapeFractionNorm=ps.get_double("EscapeFractionNorm"),
                EscapeFractionScaling=ps.get_double(
                    "EscapeFractionScaling"),
                ReionUseParticleSFR=ps.get_int("ReionUseParticleSFR"),
                ReionGammaHaloBias=ps.get_double("ReionGammaHaloBias"),
                ReionSFRTimescale=ps.get_double("ReionSFRTimescale"))
            jcf = ps.get_string("J21CoeffFile")
            if jcf:
                j21c = J21Coeffs.load(jcf)

        # black holes (blackhole.cpp)
        bhpar = None
        bh_on = bool(ps.get_int("BlackHoleOn"))
        if bh_on:
            from ..physics.blackhole import BHParams
            bhpar = BHParams(
                BlackHoleAccretionFactor=ps.get_double(
                    "BlackHoleAccretionFactor"),
                BlackHoleEddingtonFactor=ps.get_double(
                    "BlackHoleEddingtonFactor"),
                BlackHoleFeedbackFactor=ps.get_double(
                    "BlackHoleFeedbackFactor"),
                SeedBlackHoleMass=ps.get_double("SeedBlackHoleMass"),
                SeedBHDynMass=ps.get_double("SeedBHDynMass"),
                MinFoFMassForNewSeed=ps.get_double(
                    "MinFoFMassForNewSeed"),
                MinMStarForNewSeed=ps.get_double("MinMStarForNewSeed"),
                BlackHoleNgbFactor=ps.get_double("BlackHoleNgbFactor"),
                BlackHoleMaxAccretionRadius=ps.get_double(
                    "BlackHoleMaxAccretionRadius"),
                UnitTime_in_s=units.UnitTime_in_s,
                UnitVelocity_in_cm_per_s=(
                    units.UnitVelocity_in_cm_per_s),
                HubbleParam=cp.HubbleParam,
                BH_DRAG=ps.get_int("BH_DRAG"))

        gp = GasPhysics(
            cooling_on=cooling_on, sfr_on=sfr_on, winds_on=winds_on,
            density_independent_sph=bool(
                ps.get_int("DensityIndependentSphOn")),
            eta=ps.get_double("DensityResolutionEta"),
            ngb_deviation=ps.get_double("MaxNumNgbDeviation"),
            art_bulk_visc=ps.get_double("ArtBulkViscConst"),
            density_contrast_limit=ps.get_double(
                "DensityContrastLimit"),
            kernel=KERNELS[kern], coolpar=coolpar, treecool=treecool,
            sfrpar=sfrpar, windpar=windpar, coolunits=cu,
            metal_return_on=bool(ps.get_int("MetalReturnOn")),
            metals=metals, bh_on=bh_on, bhpar=bhpar,
            bh_dynfric_on=(bh_on and
                           ps.get_int("BH_DynFrictionMethod") > 0),
            zreion_table=zreion_table, metal_cool=metal_cool,
            helium=helium, excursion=excursion, j21_coeffs=j21c,
            excursion_zstop=ps.get_double("ExcursionSetZStop"),
            units=units)
        # initial gas temperature -> specific internal energy
        init_temp = ps.get_double("InitGasTemp")
        if init_temp < 0:
            # CMB-derived like the reference init.cpp
            init_temp = cp.CMBTemperature / atime
        from ..utils.constants import (BOLTZMANN, PROTONMASS,
                                       GAMMA_MINUS1, HYDROGEN_MASSFRAC)
        mw = 4.0 / (1 + 3 * HYDROGEN_MASSFRAC)
        u0 = (BOLTZMANN * init_temp / mw / PROTONMASS / GAMMA_MINUS1
              / units.UnitInternalEnergy_in_cgs)
        species = []
        for t in sorted(set(ptype.tolist())):
            sel = ptype == t
            species.append((int(t), pos[sel], vel[sel], mass[sel],
                            ids[sel]))
        # spare rows for split-spawned stars (slots headroom,
        # PartAllocFactor analog); grown on demand if exhausted
        ngas0 = int((ptype == 0).sum())
        shr = max(ngas0 // 4, 1024) \
            if ps.get_int("StarformationOn") else 0
        sim = Simulation.from_species(
            species, cp, boxsize, nmesh, timeline, atime, tsp=tsp,
            gravity_kw=gravity_kw, gas_u0=u0, gas_physics=gp,
            star_headroom=shr)
        if 0 in snap_blocks and "InternalEnergy" in snap_blocks[0]:
            # resuming from one of our snapshots (or a reference
            # one): restore the gas/star/BH state instead of the
            # InitGasTemp cold start.  Mirrors petaio's read-side
            # converters (petaio.cpp:858-865 u -> entropy via
            # Density) + check_density_entropy fixups
            # (init.cpp:363-389)
            minegy = gp.sfrpar.min_egyspec() \
                if (gp is not None and gp.sfrpar is not None) else 0.0
            _restore_gas_state(sim, snap_blocks, ptype, atime, cp,
                               minegy)
            print("Restored gas/star/BH state from snapshot")
    else:
        sim = Simulation.from_arrays(pos, vel, mass, ids, cp, boxsize,
                                     nmesh, timeline, atime, tsp=tsp,
                                     gravity_kw=gravity_kw)

    sim.resumed = (restart_flag == 1)
    sim.hierarchical = bool(ps.get_int("SplitGravityTimestepsOn")
                            or ps.get_int("HierarchicalGravity"))
    # anti-correlation box shift, a fraction of a PM cell
    # (gadget/params.cpp:85, default 8 cells worth over Nmesh)
    sim.random_offset_frac = (ps.get_double("RandomParticleOffset")
                              / max(nmesh, 1))

    # massive-neutrino linear response (neutrinos_lra.cpp)
    nt0 = _build_nu_table(ps, cp, units, boxsize, nmesh, atime,
                          restart_flag, snapnum, icfile)
    if nt0 is not None:
        sim.nu_table = nt0

    # lightcone output collected during drifts (lightcone.cpp)
    lightcone = None
    if ps.get_int("LightconeOn"):
        from ..physics.lightcone import Lightcone
        lightcone = Lightcone(CP=cp, boxsize=boxsize,
                              unit_velocity=(
                                  units.UnitVelocity_in_cm_per_s))

        def on_drift(s, a0, a1):
            p = s.particles
            ids64 = ((np.asarray(p.id_hi).astype(np.uint64)
                      << np.uint64(32))
                     | np.asarray(p.id_lo).astype(np.uint64))
            lightcone.compute(a0, a1, np.asarray(sim.output_ipos()),
                              np.asarray(p.vel), ids64,
                              np.asarray(p.mask))
        sim.on_drift = on_drift

    snap_counter = [_resume_snap_counter(outdir)]
    base = ps.get_string("SnapshotFileBase")

    def on_snapshot(s, a):
        # max() keeps numbering monotone when an unplanned (HCI)
        # dump has consumed an index below this OutputList position
        snap_counter[0] = max(_snap_index(ps, a, snap_counter[0]),
                              snap_counter[0])
        path = os.path.join(outdir, f"{base}_{snap_counter[0]:03d}")
        p = s.particles
        maskv = np.asarray(p.mask)
        tys = np.asarray(p.ptype)
        posn = np.asarray(s.output_ipos(),
                          dtype=np.float64) * (boxsize / 2**32)
        veln = np.asarray(p.vel, dtype=np.float32) / a  # peculiar
        massn = np.asarray(p.mass, dtype=np.float32)
        idsn = p.ids64()
        blocks = {}
        totnum = np.zeros(6, dtype=np.uint64)
        for t in range(6):
            sel = maskv & (tys == t)
            if not sel.any():
                continue
            totnum[t] = sel.sum()
            d = {"Position": posn[sel], "Velocity": veln[sel],
                 "Mass": massn[sel], "ID": idsn[sel]}
            if t == 0 and s.gas is not None:
                ng = s.gas.ngas
                gsel = sel[:ng]
                from ..utils.constants import GAMMA_MINUS1
                dens = np.asarray(s.gas.density)[gsel]
                entr = np.asarray(s.gas.entropy)[gsel]
                d["SmoothingLength"] = np.asarray(p.hsml)[:ng][gsel]
                d["Density"] = dens
                d["EgyWtDensity"] = np.asarray(
                    s.gas.egy_wt_density)[gsel]
                a3inv = 1.0 / a ** 3
                with np.errstate(invalid="ignore"):
                    u = (entr * np.maximum(dens * a3inv, 1e-35)
                         ** GAMMA_MINUS1 / GAMMA_MINUS1)
                d["InternalEnergy"] = np.nan_to_num(u).astype(
                    np.float32)
                d["ElectronAbundance"] = np.asarray(s.gas.ne)[gsel]
                d["StarFormationRate"] = np.asarray(s.gas.sfr)[gsel]
                d["Metallicity"] = np.asarray(
                    s.gas.metallicity)[gsel]
                d["DelayTime"] = np.asarray(s.gas.delay_time)[gsel]
                d["Generation"] = np.asarray(
                    s.gas.generation)[gsel].astype(np.uint8)
            if t == 4 and s.gas is not None:
                # star state needed for resume + metal return
                # (petaio.cpp star-block registrations)
                d["StellarFormationTime"] = np.asarray(
                    s.gas.birth_a)[sel].astype(np.float32)
                d["Metallicity"] = np.asarray(
                    s.gas.star_metallicity)[sel].astype(np.float32)
                d["TotalMassReturned"] = np.asarray(
                    s.gas.total_returned)[sel].astype(np.float32)
                d["LastEnrichmentMyr"] = np.asarray(
                    s.gas.last_enrich_myr)[sel].astype(np.float32)
            if t == 5 and s.gas is not None:
                d["BlackholeMass"] = np.asarray(
                    s.gas.bh_mass)[sel].astype(np.float32)
                d["BlackholeAccretionRate"] = np.asarray(
                    s.gas.bh_mdot)[sel].astype(np.float32)
            blocks[t] = d
        shdr = SnapshotHeader(
            TotNumPart=totnum,
            MassTable=np.zeros(6), Time=a, BoxSize=boxsize,
            Omega0=cp.Omega0, OmegaLambda=cp.OmegaLambda,
            OmegaBaryon=cp.OmegaBaryon, HubbleParam=cp.HubbleParam,
            UnitLength_in_cm=units.UnitLength_in_cm,
            UnitMass_in_g=units.UnitMass_in_g,
            UnitVelocity_in_cm_per_s=units.UnitVelocity_in_cm_per_s,
            UsePeculiarVelocity=1, TimeIC=hdr.TimeIC)
        write_snapshot(path, shdr, blocks)
        nt = getattr(s, "nu_table", None)
        if nt is not None:
            nt.save(path)      # delta_nu history rides the snapshot
        with open(os.path.join(outdir, "LastSnapNum.txt"), "w") as f:
            f.write(str(snap_counter[0]))
        # power spectrum text file (gravpm.cpp:110-118 convention)
        if s.power_history:
            a_p, kk, pk, nm = s.power_history[-1]
            d1 = 1.0 / cp.growth_factor(1.0, a)
            fn = os.path.join(outdir, f"powerspectrum-{a:.4f}.txt")
            with open(fn, "w") as f:
                f.write("# in Mpc/h Units \n")
                f.write(f"# D1 = {d1:g} \n")
                f.write("# k P N P(z=0)\n")
                for j in range(len(kk)):
                    if nm[j] > 0:
                        f.write(f"{kk[j]:g} {pk[j]:g} {int(nm[j])} "
                                f"{pk[j] / d1 ** 2:g}\n")
        snap_counter[0] += 1

    # FOF at snapshot time (SnapshotWithFOF)
    snapshot_with_fof = bool(ps.get_int("SnapshotWithFOF"))
    base_on_snapshot = on_snapshot

    def run_fof(s):
        """Build the FOF catalog for the current particle state."""
        p = s.particles
        npart_tot = int(np.asarray(p.mask).sum())
        ndm = int((np.asarray(p.ptype)[np.asarray(p.mask)] == 1).sum())
        mean_sep = boxsize / np.cbrt(max(ndm, npart_tot, 1))
        return fof(s.output_ipos(), np.asarray(p.vel),
                   np.asarray(p.mass),
                   np.asarray(p.ptype), np.asarray(p.mask), boxsize,
                   mean_sep,
                   linking_length=ps.get_double(
                       "FOFHaloLinkingLength"),
                   min_length=ps.get_int("FOFHaloMinLength"),
                   sfr=(np.pad(np.asarray(s.gas.sfr),
                               (0, p.n - s.gas.ngas))
                        if s.gas is not None else None))

    def on_snapshot_with_fof(s, a):
        base_on_snapshot(s, a)
        if not snapshot_with_fof:
            return
        import jax.numpy as _jnp
        groups = run_fof(s)
        p = s.particles
        from ..io.fofio import save_fof, save_fof_particles
        pig = os.path.join(outdir, f"{ps.get_string('FOFFileBase')}"
                           f"_{snap_counter[0] - 1:03d}")
        save_fof(pig, groups, hdr, a)
        if ps.get_int("FOFSaveParticles"):
            save_fof_particles(pig, groups, p, boxsize=boxsize,
                               atime=a)
        print(f"FOF at a={a:g}: {groups.ngroups} groups -> {pig}")
        fof_physics(s, groups)

        # lensing potential planes at snapshot times (plane.cpp);
        # the deposit runs on device (plane_counts_ipos), shared
        # bit-for-bit with the --mesh loop's sharded deposit
        if ps.get_int("WritePlaneOn"):
            from functools import partial as _partial
            import jax as _jax
            from ..physics.plane import (PlaneParams,
                                         plane_counts_ipos,
                                         write_planes_deposit)
            cuts = [float(x) for x in ps.get_string(
                "PlaneCutPoints").split(",") if x.strip()]
            normals = [int(x) for x in ps.get_string(
                "PlaneNormals").split(",") if x.strip()]
            par = PlaneParams(
                Resolution=ps.get_int("PlaneResolution"),
                Thickness=ps.get_double("PlaneThickness"),
                CutPoints=cuts, Normals=normals or [0, 1, 2])

            def _deposit(normal, center, thickness):
                fn = _jax.jit(_partial(
                    plane_counts_ipos, boxsize=boxsize,
                    normal=normal, center=center,
                    thickness=thickness,
                    resolution=par.Resolution))
                return fn(s.output_ipos(), p.mask)

            ntot = int(np.asarray(p.mask).sum())
            write_planes_deposit(snap_counter[0] - 1, a, cp,
                                 _deposit, ntot, boxsize, outdir,
                                 units.UnitVelocity_in_cm_per_s,
                                 units.UnitLength_in_cm, par)

    def fof_physics(s, groups):
        """FOF-cadence physics: BH seeding, HeIII bubbles, excursion
        halo masses (run.cpp FOF block ordering)."""
        import jax.numpy as _jnp
        p = s.particles
        if s.gas is not None and s.gas_physics is not None:
            gpx = s.gas_physics
            gid = groups.group_id
            halo_mass = np.zeros(p.n, np.float32)
            ing = gid > 0
            if groups.ngroups:
                halo_mass[ing] = groups.masses[gid[ing] - 1]
            s.halo_mass = _jnp.asarray(halo_mass)
            if gpx.bh_on and gpx.bhpar is not None \
                    and groups.ngroups:
                from ..physics.blackhole import seed_black_holes
                to_seed = seed_black_holes(
                    groups, groups.mass_by_type[:, 4],
                    groups.length_by_type[:, 5], gpx.bhpar)
                rows = []
                dens = np.asarray(s.gas.density)
                ngc = s.gas.ngas
                is_gas = (np.asarray(p.ptype[:ngc]) == 0) \
                    & np.asarray(p.mask[:ngc])
                for gi in to_seed:
                    cand = np.nonzero((gid[:ngc] == gi + 1)
                                      & is_gas)[0]
                    if cand.size:
                        rows.append(int(cand[np.argmax(dens[cand])]))
                if rows:
                    s.gas = gpx.seed_bh(s, s.gas, rows)
                    print(f"Seeded {len(rows)} black holes")
            if gpx.helium is not None and groups.ngroups:
                s.gas = gpx.helium_step(s, s.gas, groups.masses,
                                        groups.cm)

    sim.on_snapshot = on_snapshot_with_fof

    # seeding-cadence FOF searches on PM steps (run.cpp:364,637-660):
    # the first BHs in star-small appear at a~0.14 from a seeding FOF,
    # well before any snapshot
    bh_enabled = bool(ps.get_int("BlackHoleOn")) and has_gas
    helium_obj = (sim.gas_physics.helium
                  if getattr(sim, "gas_physics", None) else None)
    next_seed_check = [atime]
    seed_factor = ps.get_double("TimeBetweenSeedingSearch")

    def on_pm_step(s):
        a = s.atime()
        seed_due = bh_enabled and a >= next_seed_check[0]
        he_due = helium_obj is not None and helium_obj.during(
            1.0 / a - 1.0)
        if not (seed_due or he_due):
            return
        groups = run_fof(s)
        if seed_due:
            next_seed_check[0] = a * seed_factor
        fof_physics(s, groups)
        if getattr(s, "walltime", None) is not None:
            s.walltime.measure("FOF")

    sim.on_pm_step = on_pm_step

    def on_bad_timestep(s):
        """Emergency TIMESTEP-DUMP snapshot (run.cpp:794-797)."""
        try:
            # reuse the snapshot writer with a recognizable name
            snap_counter_save = snap_counter[0]
            snap_counter[0] = 999
            base_on_snapshot(s, s.atime())
            src = os.path.join(outdir, f"{base}_999")
            dst = os.path.join(outdir, "TIMESTEP-DUMP")
            if os.path.isdir(src):
                os.rename(src, dst)
            snap_counter[0] = snap_counter_save
            # base_on_snapshot recorded 999 in LastSnapNum.txt, but
            # PART_999 was just renamed away — restore the pointer
            # (last real snapshot = counter-1) or the next resume
            # aborts on a missing snapshot
            lsn = os.path.join(outdir, "LastSnapNum.txt")
            prev = None
            if snap_counter_save > 0:
                prev = snap_counter_save - 1
            else:
                # resumed run that has not written a snapshot yet:
                # find the last real PART_* on disk
                import re as _re
                nums = [int(m.group(1)) for f in os.listdir(outdir)
                        if (m := _re.fullmatch(
                            f"{base}_(\\d{{3}})", f))]
                if nums:
                    prev = max(nums)
            if prev is not None:
                with open(lsn, "w") as fh:
                    fh.write(str(prev))
            elif os.path.exists(lsn):
                os.remove(lsn)
            print(f"Bad timestep: emergency dump -> {dst}")
        except Exception as e:       # the dump must never mask the
            print(f"TIMESTEP-DUMP failed: {e}")   # original error
    sim.on_bad_timestep = on_bad_timestep

    # human control interface: poll stop/checkpoint/terminate files
    # + wall-clock timeout prediction on PM steps (hci.cpp:76-185,
    # polled run.cpp:408).  HCI checkpoints reuse the full snapshot
    # writer (with FOF when SnapshotWithFOF, like write_fof) at the
    # next free snapshot index, so RestartFlag 1 resumes from them.
    from ..utils.hci import HCI
    sim.hci = HCI(outdir,
                  time_limit_cpu=ps.get_double("TimeLimitCPU"),
                  auto_checkpoint_time=ps.get_double(
                      "AutoSnapshotTime"))
    sim.on_checkpoint = on_snapshot_with_fof

    # per-step statistics: energy.txt, sfr.txt, cpu.txt
    from ..utils.walltime import Walltime
    from ..utils.stats import (energy_statistics, sfr_statistics,
                               blackhole_statistics, bh_details)
    wt = Walltime()
    sim.walltime = wt        # stage timers inside the run loop
    fd_energy = open(os.path.join(outdir,
                                  ps.get_string("EnergyFile")), "a")
    fd_cpu = open(os.path.join(outdir, ps.get_string("CpuFile")), "a")
    fd_sfr = (open(os.path.join(outdir, "sfr.txt"), "a")
              if has_gas and ps.get_int("StarformationOn") else None)
    if fd_sfr is not None and fd_sfr.tell() == 0:
        fd_sfr.write(
            "# SFR.txt columns are:\n"
            "# 0. Time  1. total_sm  2. totsfrrate [Msun/yr]\n"
            "# 3. rate_in_msunperyear  4. total_sum_mass_stars\n"
            "# 5. avg dt  6. n star-forming  7. new stars\n")
    bh_on = has_gas and ps.get_int("BlackHoleOn")
    fd_bh = (open(os.path.join(outdir, "blackholes.txt"), "a")
             if bh_on else None)
    fd_bhdet = (open(os.path.join(
        outdir, "BlackholeDetails.bin"), "ab")
        if bh_on and ps.get_int("WriteBlackHoleDetails") else None)

    pk_written = [0]

    def _dump_power(s):
        """Write powerspectrum-%.4f.txt for every PM step
        (gravpm.cpp writes at each long-range force)."""
        while pk_written[0] < len(s.power_history):
            a_p, kk, pk, nm = s.power_history[pk_written[0]]
            pk_written[0] += 1
            d1 = 1.0 / cp.growth_factor(1.0, a_p)
            fn = os.path.join(outdir, f"powerspectrum-{a_p:.4f}.txt")
            with open(fn, "w") as f:
                f.write("# in Mpc/h Units \n")
                f.write(f"# D1 = {d1:g} \n")
                f.write("# k P N P(z=0)\n")
                for j in range(len(kk)):
                    if nm[j] > 0:
                        f.write(f"{kk[j]:g} {pk[j]:g} {int(nm[j])} "
                                f"{pk[j] / d1 ** 2:g}\n")

    def on_step(s):
        a = s.atime()
        wt.measure("Misc")
        _dump_power(s)
        from ..utils.stats import (energy_statistics_fast,
                                   bh_statistics_fast)
        energy_statistics_fast(fd_energy, a, s.particles,
                               sph=s.gas)
        if fd_sfr is not None and s.gas is not None:
            # reference writes a line only when stars could form
            # (sfr_eff.cpp:390 `if(FdSfr && total_sm > 0)`)
            st = getattr(s.gas_physics, "last_sfr_stats", None)
            if st is not None and st["total_sm"] > 0:
                sfr_statistics(fd_sfr, a, st["total_sm"],
                               st["totsfrrate"],
                               st["rate_in_msunperyear"],
                               st["total_sum_mass_stars"],
                               st["avg_dtime"], st["total_sum_part"],
                               st["tot_newstars"])
            if st is not None:
                s.gas_physics.last_sfr_stats = None
        if fd_bh is not None and s.gas is not None:
            # reference emits nothing before the first BH is seeded
            # (blackhole.cpp:221-223 early return on totbh == 0);
            # one device gather covers blackholes.txt + BHDetails
            bh_statistics_fast(fd_bh, fd_bhdet, a, s.particles,
                               s.gas, boxsize, units)
        wt.write_cpu_log(fd_cpu, a)
        wt.reset_step()

    sim.on_step = on_step
    sim.run(max_steps=max_steps)
    if lightcone is not None:
        lc_path = lightcone.save(os.path.join(outdir, "LIGHTCONE"))
        print(f"Lightcone -> {lc_path}")
    for f in (fd_energy, fd_cpu):
        f.close()
    for f in (fd_sfr, fd_bh, fd_bhdet):
        if f:
            f.close()
    return sim


def main(argv=None):
    argv = list(argv) if argv is not None else sys.argv[1:]
    mesh_devices = 0
    procgrid = None
    if "--mesh" in argv:
        i = argv.index("--mesh")
        spec = argv[i + 1]
        if "x" in spec:
            # 2-D PM processor grid (petapm.cpp:217-255): domains
            # stay 1-D x-slabs over d1*d2 devices, the PM FFT runs
            # on the (d1, d2) brick layout
            d1, d2 = (int(v) for v in spec.split("x"))
            mesh_devices = d1 * d2
            procgrid = (d1, d2)
        else:
            mesh_devices = int(spec)
        del argv[i: i + 2]
    if len(argv) < 1:
        print("usage: python -m shenqi_tpu.cli.gadget_main paramfile "
              "[RestartFlag] [SnapNum] [--mesh N | --mesh AxB]",
              file=sys.stderr)
        return 1
    restart = int(argv[1]) if len(argv) > 1 else 2
    snapnum = int(argv[2]) if len(argv) > 2 else -1
    run_gadget(argv[0], restart, snapnum, mesh_devices=mesh_devices,
               procgrid=procgrid)
    return 0


if __name__ == "__main__":
    sys.exit(main())
