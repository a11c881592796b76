#!/usr/bin/env python
"""dm-small realization-scatter study (VERDICT round-2 item #8).

Round 2's dm-small run failed one P(k) bin (a=0.2 ratio 1.199 vs the
reference CI's 1.19 envelope, examples/dm-small/check_results.py:9-25)
after the Nmesh=2*Ngrid genic parity fix changed the realization.  The
open question: is a ~1.20 rebinned-bin ratio within realization
scatter for this box (64^3 particles, 64 Mpc/h, first large-scale bins
hold a handful of modes), or a systematic bias of this code?

This script answers it empirically: run the full dm-small pipeline
(genic + gadget, z=9 -> z=3) for SEEDS different phase realizations,
apply the reference's exact rebinned P(k)/CLASS ratio at each output,
and report per-bin min/max/mean scatter across seeds alongside the
reference tolerances.  PASS = the reference seed's worst-bin deviation
lies inside the cross-seed scatter band (i.e. it is realization noise,
not bias): mean over seeds within tolerance in every bin, and the
round-2 exceedance magnitude (<= ~1% over envelope) smaller than the
observed cross-seed spread in that bin.

Usage: python validation/dm_small_seeds.py [workdir] [nseeds]
Writes <workdir>/RESULT.txt; exit 0 on pass.  ~TPU-hours: nseeds x
(one dm-small run ~15-40 min).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dm_small import EX, GENIC, GADGET, modecount_rebin  # noqa: E402

# (scalefactor, reference rtol, n rebinned large-scale bins checked)
CHECKS = [(0.1, 0.08, 6), (0.2, 0.19, 6), (0.25, 0.21, 5)]

SEEDS = [181170, 23, 9000001, 424242]


def power_ratios(outdir, scalefactor, maxi):
    from scipy.interpolate import interp1d
    fn = os.path.join(outdir, f"powerspectrum-{scalefactor:.4f}.txt")
    data = np.loadtxt(fn)
    kk, pk, modes = data[:, 0], data[:, 1], data[:, 2]
    sel = kk > 0
    kk_sim, pk_sim = modecount_rebin(kk[sel], pk[sel], modes[sel])
    zz = 1 / scalefactor - 1
    camb = np.loadtxt(f"{EX}/class_pk_9.dat" if zz > 8.5
                      else f"{EX}/class_pk_9.dat-{zz:.1f}")
    ref = interp1d(camb[:, 0], camb[:, 1])(kk_sim[:maxi])
    return pk_sim[:maxi] / ref


def run_seed(work, seed):
    os.makedirs(work, exist_ok=True)
    gp = os.path.join(work, "paramfile.genic")
    with open(gp, "w") as f:
        f.write(GENIC.format(out=work, ex=EX).replace(
            "Seed = 181170", f"Seed = {seed}"))
    pp = os.path.join(work, "paramfile.gadget")
    with open(pp, "w") as f:
        f.write(GADGET.format(out=work))
    from shenqi_tpu.cli.genic_main import run_genic
    from shenqi_tpu.cli.gadget_main import run_gadget
    run_genic(gp)
    run_gadget(pp)
    out = os.path.join(work, "output")
    return {sf: power_ratios(out, sf, maxi)
            for sf, _, maxi in CHECKS}


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dm_small_seeds"
    nseeds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.makedirs(work, exist_ok=True)
    lines = []

    def log(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    ratios = {}   # seed -> {sf: ratio array}
    for seed in SEEDS[:nseeds]:
        log(f"=== seed {seed} ===")
        ratios[seed] = run_seed(os.path.join(work, f"s{seed}"), seed)
        for sf, rt, _ in CHECKS:
            r = ratios[seed][sf]
            log(f"  a={sf}: ratio {r.round(3)} (rtol {rt})")

    ok = True
    for sf, rt, maxi in CHECKS:
        allr = np.stack([ratios[s][sf] for s in ratios])  # [S, bins]
        mean, lo, hi = allr.mean(0), allr.min(0), allr.max(0)
        spread = hi - lo
        mean_ok = np.allclose(mean, 1.0, rtol=rt, atol=0)
        # worst single-seed envelope exceedance vs cross-seed spread
        exceed = np.maximum(np.abs(allr - 1.0) - rt, 0.0)
        worst = float(exceed.max())
        worst_bin = int(np.unravel_index(exceed.argmax(),
                                         exceed.shape)[1])
        noise_ok = worst == 0.0 or worst < float(spread[worst_bin])
        log(f"a={sf}: mean {mean.round(3)} spread {spread.round(3)} "
            f"mean-in-tol={mean_ok} worst-exceed {worst:.3f} "
            f"(bin {worst_bin}, cross-seed spread "
            f"{float(spread[worst_bin]):.3f}) noise-ok={noise_ok}")
        ok &= mean_ok and noise_ok
    log("OVERALL: " + ("PASS — envelope exceedances are realization "
                       "scatter" if ok else "FAIL"))
    with open(os.path.join(work, "RESULT.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
