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


def _read_particles(snap_path):
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
    return hdr, (np.concatenate(pos_l), np.concatenate(vel_l),
                 np.concatenate(ids_l), np.concatenate(mass_l),
                 np.concatenate(type_l))


def run_gadget(paramfile: str, restart_flag: int = 2,
               snapnum: int = -1, max_steps: int = 10 ** 9,
               strict: bool = False):
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

    hdr, (pos, vel, ids, mass, ptype) = _read_particles(icfile)
    units = get_unitsystem(hdr.UnitLength_in_cm, hdr.UnitMass_in_g,
                           hdr.UnitVelocity_in_cm_per_s)
    atime = hdr.Time
    cp = load_cosmology(ps, hdr, atime, units)
    boxsize = hdr.BoxSize

    if restart_flag == 3:
        # FOF postprocessing
        from ..core.particles import float_to_ipos
        import jax.numpy as jnp
        npart_tot = int(sum(hdr.TotNumPart))
        mean_sep = boxsize / np.cbrt(
            hdr.TotNumPart[1] if hdr.TotNumPart[1] > 0 else npart_tot)
        groups = fof(jnp.asarray(float_to_ipos(pos, boxsize)),
                     vel.astype(np.float32), mass.astype(np.float32),
                     ptype, np.ones(len(pos), bool), boxsize, mean_sep,
                     linking_length=ps.get_double("FOFHaloLinkingLength"),
                     min_length=ps.get_int("FOFHaloMinLength"))
        from ..io.fofio import save_fof
        path = os.path.join(outdir, f"{ps.get_string('FOFFileBase')}"
                            f"_{max(snapnum, 0):03d}")
        save_fof(path, groups, hdr, atime)
        print(f"FOF: {groups.ngroups} groups -> {path}")
        return groups

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

    sim = Simulation.from_arrays(pos, vel, mass, ids, cp, boxsize,
                                 nmesh, timeline, atime, tsp=tsp,
                                 gravity_kw=gravity_kw)
    snap_counter = [0]
    base = ps.get_string("SnapshotFileBase")

    def on_snapshot(s, a):
        path = os.path.join(outdir, f"{base}_{snap_counter[0]:03d}")
        from ..core.particles import SimState, RegionLayout
        layout = RegionLayout(offsets=np.zeros(6, dtype=np.int64),
                              capacities=np.array(
                                  [0, s.particles.n, 0, 0, 0, 0]))
        state = SimState(particles=s.particles, layout=layout)
        blocks = state_to_blocks(state, boxsize, a, use_peculiar=True)
        nlive = int(np.asarray(s.particles.mask).sum())
        shdr = SnapshotHeader(
            TotNumPart=np.array([0, nlive, 0, 0, 0, 0],
                                dtype=np.uint64),
            MassTable=np.zeros(6), Time=a, BoxSize=boxsize,
            Omega0=cp.Omega0, OmegaLambda=cp.OmegaLambda,
            OmegaBaryon=cp.OmegaBaryon, HubbleParam=cp.HubbleParam,
            UnitLength_in_cm=units.UnitLength_in_cm,
            UnitMass_in_g=units.UnitMass_in_g,
            UnitVelocity_in_cm_per_s=units.UnitVelocity_in_cm_per_s,
            UsePeculiarVelocity=1, TimeIC=hdr.TimeIC)
        write_snapshot(path, shdr, blocks)
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

    sim.on_snapshot = on_snapshot
    sim.run(max_steps=max_steps)
    return sim


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print("usage: python -m shenqi_tpu.cli.gadget_main paramfile "
              "[RestartFlag] [SnapNum]", file=sys.stderr)
        return 1
    restart = int(argv[1]) if len(argv) > 1 else 2
    snapnum = int(argv[2]) if len(argv) > 2 else -1
    run_gadget(argv[0], restart, snapnum)
    return 0


if __name__ == "__main__":
    sys.exit(main())
