#!/usr/bin/env python
"""Run the reference's star-small CI example end-to-end and apply its
acceptance criteria (examples/star-small/check_results.py analog).

64^3 DM + 64^3 gas in a 5 Mpc/h box, z=9 -> z=4 (a=0.2), cooling +
star formation + winds + metal return + black holes, FOF catalogs at
a=0.125/0.15/0.2.  Uses the reference's own pinned expectations
(check_results.py:10-53) -- valid here because the IC phases are
reference-exact (genic/gadget_field.py reproduces MP-GenIC's RNG):

  * PIG_000/001/002 star counts ~ 16/123/865 and BH counts 0/3/4
    (rtol 10%, atol 2);
  * all stars/BHs are inside FOF groups;
  * more gas and DM than stars in groups;
  * sfr.txt: stars form before a=0.115; median(col2)/median(col3) in
    [0.5, 1.5]; total_sm/total_sum_mass_stars in [0.2, 1] at the
    max-new-star step;
  * blackholes.txt: first line at 0.14 < a < 0.15 with 2 seed-mass
    BHs; >= 4 BHs by the end.

NOTE: star-small runs WITHOUT a TREECOOL file -- photoionization off
(cooling_rates.cpp:972-975 "No TreeCool file ... OK for DM only" --
the example relies on collisional cooling only).

Usage: python validation/star_small.py [workdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EX = "/root/reference/examples/star-small"

GENIC = """
OutputDir = {out}/IC
FileBase = IC
Ngrid = 64
BoxSize = 5000
Omega0 = 0.288
OmegaLambda = 0.712
OmegaBaryon = 0.0472
ProduceGas = 1
HubbleParam = 0.7
Redshift = 9
FileWithInputSpectrum = /root/reference/examples/dm-small/class_pk_9.dat
DifferentTransferFunctions = 0
UsePeculiarVelocity = 1
Seed = 181170
UnitaryAmplitude = 1
"""

GADGET = """
InitCondFile = {out}/IC/IC
OutputDir = {out}/output
OutputList = 0.125,0.15,0.2
TimeLimitCPU = 43000
TimeMax = 0.2
Omega0 = 0.288
MassiveNuLinRespOn = 0
HydroOn = 1
CoolingOn = 1
StarformationOn = 1
DensityIndependentSphOn = 1
SnapshotWithFOF = 1
PartAllocFactor = 2.0
BlackHoleOn = 1
MetalReturnOn = 1
WindOn = 1
"""


def check_snapshot(pig, stars, bh, log):
    """check_results.py:7-18 analog."""
    from shenqi_tpu.io.bigfile import BigFile
    from shenqi_tpu.io.fofio import load_fof
    ok = True
    bf = BigFile(pig)
    pin = np.asarray(bf["Header"].attrs["NumPartInGroupTotal"])
    name = os.path.basename(pig)
    t = (pin[0] > pin[4]) and (pin[1] > pin[4])
    log(f"{name}: NumPartInGroup {pin.tolist()} "
        f"(gas/dm > stars: {'PASS' if t else 'FAIL'})")
    ok &= t
    for idx, want in ((4, stars), (5, bh)):
        got = int(pin[idx])
        good = abs(got - want) <= max(0.1 * want, 2)
        log(f"{name}: type-{idx} count {got} vs ref {want} "
            f"(rtol 0.1, atol 2) -> {'PASS' if good else 'FAIL'}")
        ok &= good
    gsmf = load_fof(pig)["LengthByType"]
    for i in (4, 5):
        t = int(np.sum(gsmf[:, i])) == int(pin[i])
        log(f"{name}: type-{i} all in groups -> "
            f"{'PASS' if t else 'FAIL'}")
        ok &= t
    return ok


def check_sfr(sfrfile, log):
    """check_results.py:20-40 analog."""
    ok = True
    sfr = np.loadtxt(sfrfile)
    if sfr.ndim == 1:
        sfr = sfr[None, :]
    istars = np.where(sfr[:, -1] > 0)
    if len(istars[0]) == 0:
        log("sfr.txt: no stars formed -> FAIL")
        return False
    amin = np.min(sfr[:, 0][istars])
    t = amin < 0.115
    log(f"sfr.txt: first star at a={amin:.4f} (< 0.115) -> "
        f"{'PASS' if t else 'FAIL'}")
    ok &= t
    r = np.median(sfr[:, 2]) / np.median(sfr[:, 3])
    t = 0.5 < r < 1.5
    log(f"sfr.txt: median sfr-rate ratio {r:.3f} in (0.5,1.5) -> "
        f"{'PASS' if t else 'FAIL'}")
    ok &= t
    ii = np.argmax(sfr[:, -1])
    r2 = sfr[ii, 1] / sfr[ii, 4]
    t = 0.2 < r2 < 1
    log(f"sfr.txt: sm/spawned at peak a={sfr[ii, 0]:.4f}: {r2:.3f} "
        f"in (0.2,1) -> {'PASS' if t else 'FAIL'}")
    ok &= t
    return ok


def check_bh(bhfile, log):
    """check_results.py:42-57 analog."""
    ok = True
    bh = np.loadtxt(bhfile)
    if bh.ndim == 1:
        bh = bh[None, :]
    seedmass = 2.00062e-05
    t = 0.14 < bh[0, 0] < 0.15
    log(f"blackholes.txt: first BH line at a={bh[0, 0]:.4f} "
        f"(0.14-0.15) -> {'PASS' if t else 'FAIL'}")
    ok &= t
    t = bh[0, 1] == 2
    log(f"blackholes.txt: first-line N_bh {int(bh[0, 1])} == 2 -> "
        f"{'PASS' if t else 'FAIL'}")
    ok &= t
    t = abs(bh[0, 2] - bh[0, 1] * seedmass) < 1e-7
    log(f"blackholes.txt: first-line mass {bh[0, 2]:.6g} ~ "
        f"{bh[0, 1] * seedmass:.6g} -> {'PASS' if t else 'FAIL'}")
    ok &= t
    t = bh[-1, 1] >= 4
    log(f"blackholes.txt: final N_bh {int(bh[-1, 1])} >= 4 -> "
        f"{'PASS' if t else 'FAIL'}")
    ok &= t
    return ok


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/star_small_val"
    os.makedirs(work, exist_ok=True)
    with open(os.path.join(work, "paramfile.genic"), "w") as f:
        f.write(GENIC.format(out=work))
    with open(os.path.join(work, "paramfile.gadget"), "w") as f:
        f.write(GADGET.format(out=work))

    from shenqi_tpu.cli.genic_main import run_genic
    from shenqi_tpu.cli.gadget_main import run_gadget

    lines = []

    def log(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    log("Generating star-small ICs (64^3 gas + 64^3 DM, 5 Mpc/h)...")
    run_genic(os.path.join(work, "paramfile.genic"))

    log("Running star-small (z=9 -> z=4, SF + BHs)...")
    run_gadget(os.path.join(work, "paramfile.gadget"))

    outdir = os.path.join(work, "output")
    ok = True
    for pig, stars, bh in (("PIG_000", 16, 0), ("PIG_001", 123, 3),
                           ("PIG_002", 865, 4)):
        p = os.path.join(outdir, pig)
        if os.path.isdir(p):
            ok &= check_snapshot(p, stars, bh, log)
        else:
            log(f"FAIL: missing {pig}")
            ok = False
    ok &= check_sfr(os.path.join(outdir, "sfr.txt"), log)
    ok &= check_bh(os.path.join(outdir, "blackholes.txt"), log)
    log("OVERALL: " + ("PASS" if ok else "FAIL"))
    with open(os.path.join(work, "RESULT.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
