#!/usr/bin/env python
"""dm-small realization-scatter study (VERDICT round-2 item #8).

Round 2's dm-small run failed one P(k) bin (a=0.2 ratio 1.199 vs the
reference CI's 1.19 envelope, examples/dm-small/check_results.py:9-25)
after the Nmesh=2*Ngrid genic parity fix changed the realization.  The
open question: is a ~1.20 rebinned-bin ratio within realization
scatter for this box (64^3 particles, 64 Mpc/h, first large-scale bins
hold a handful of modes), or a systematic bias of this code?

This script answers it two ways.  Empirically: run the full dm-small
pipeline (genic + gadget, z=9 -> z=3) for SEEDS different phase
realizations, apply the reference's exact rebinned P(k)/CLASS ratio at
each output, and report per-bin scatter across seeds.  Analytically:
dm-small generates with UnitaryAmplitude=1, so every mode's power is
exactly P_lin(k) and the check's zero-noise expectation follows from
the k-grid's mode structure alone (expected_ratios) — it is NOT 1.0:
the a=0.1 second bin EXPECTS 1.108 against an rtol-0.08 envelope (the
check is knife-edge around its own discreteness bias).

PASS = (a) the cross-seed mean deviates from the discrete-mode
expectation by less than the reference rtol in every bin, and (b) any
single-seed raw-envelope exceedance is smaller than the cross-seed
spread or the check's own bias in that bin (realization noise, not
code bias).  Per-seed raw reference-check outcomes are reported
verbatim alongside.

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


def expected_ratios(scalefactor, maxi, nmesh=128, box_mpc=64.0):
    """Zero-noise expectation of the reference check's bin ratios.

    dm-small generates with UnitaryAmplitude=1, so every mode's power
    is exactly P_lin(k_mode): the expected measured spectrum follows
    from the k-grid's mode structure alone.  Running the estimator's
    exact binning (gravpm.cpp powerspectrum_add_mode) + the check's
    modecount_rebin on per-mode P_lin, then taking the check's own
    ratio vs interp1d(CLASS)(k_mean), quantifies the DISCRETENESS BIAS
    built into the check itself — e.g. +10.8% in the a=0.1 second bin,
    with the tolerance at 8%: the check is knife-edge around its own
    binning bias, and deviations must be judged against THIS curve,
    not against 1.0."""
    from scipy.interpolate import interp1d
    zz = 1 / scalefactor - 1
    camb = np.loadtxt(f"{EX}/class_pk_9.dat" if zz > 8.5
                      else f"{EX}/class_pk_9.dat-{zz:.1f}")
    pint = interp1d(camb[:, 0], camb[:, 1])
    n = nmesh
    kx = np.fft.fftfreq(n, d=1.0 / n)
    kz = np.arange(n // 2 + 1)
    KX, KY, KZ = np.meshgrid(kx, kx, kz, indexing="ij")
    k2 = KX ** 2 + KY ** 2 + KZ ** 2
    keff = np.sqrt(k2)
    w = np.where((KZ == 0) | (KZ == n // 2), 1.0, 2.0)
    kphys = keff * 2 * np.pi / box_mpc
    mask = k2 > 0
    pmode = np.zeros_like(kphys)
    pmode[mask] = pint(np.clip(kphys[mask], camb[0, 0], camb[-1, 0]))
    nbins = n
    bpu = (nbins - 1) / np.log(np.sqrt(3.0) * n / 2.0)
    kint = np.floor(bpu * 0.5 * np.log(
        np.where(mask, k2, 1.0))).astype(int)
    kint[~mask] = nbins
    power = np.bincount(kint.ravel(), weights=(w * pmode).ravel(),
                        minlength=nbins + 1)[:nbins]
    nmodes = np.bincount(kint.ravel(), weights=w.ravel(),
                         minlength=nbins + 1)[:nbins]
    ksum = np.bincount(kint.ravel(), weights=(w * keff).ravel(),
                       minlength=nbins + 1)[:nbins]
    sel = nmodes > 0
    kk = (ksum[sel] / nmodes[sel]) * 2 * np.pi / box_mpc
    pk = power[sel] / nmodes[sel]
    kk_sim, pk_sim = modecount_rebin(kk, pk, nmodes[sel])
    return pk_sim[:maxi] / pint(kk_sim[:maxi])


def run_seed(work, seed):
    os.makedirs(work, exist_ok=True)
    out = os.path.join(work, "output")
    have = all(os.path.exists(os.path.join(
        out, f"powerspectrum-{sf:.4f}.txt")) for sf, _, _ in CHECKS)
    if not have:
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
        # the correct null hypothesis under UnitaryAmplitude: the
        # check's own discreteness bias (NOT ratio == 1) — the second
        # a=0.1 bin EXPECTS 1.108 against an rtol-0.08 envelope
        exp = expected_ratios(sf, maxi)
        raw_ok = [bool(np.allclose(ratios[s][sf], 1.0, rtol=rt,
                                   atol=0)) for s in ratios]
        # deviation of the cross-seed mean from the discrete-mode
        # expectation, judged with the reference's own rtol
        # (re-centered envelope); late-time high-k bins grow
        # quasi-nonlinearly above LINEAR expectation — one-sided slack
        dev = mean - exp
        dev_ok = bool(np.all((dev > -rt) & (dev < rt)))
        # worst single-seed RAW envelope exceedance vs seed scatter
        exceed = np.maximum(np.abs(allr - 1.0) - rt, 0.0)
        worst = float(exceed.max())
        worst_bin = int(np.unravel_index(exceed.argmax(),
                                         exceed.shape)[1])
        noise_ok = worst == 0.0 or worst < float(
            np.maximum(spread[worst_bin],
                       np.abs(exp[worst_bin] - 1.0)))
        log(f"a={sf}: mean {mean.round(3)} spread {spread.round(3)}")
        log(f"a={sf}: discrete-mode expectation {exp.round(3)} "
            f"mean-dev {dev.round(3)} dev-in-tol={dev_ok}")
        log(f"a={sf}: raw per-seed reference check: {raw_ok}; "
            f"worst-exceed {worst:.3f} (bin {worst_bin}, seed spread "
            f"{float(spread[worst_bin]):.3f}, check bias "
            f"{float(abs(exp[worst_bin] - 1.0)):.3f}) "
            f"noise-ok={noise_ok}")
        ok &= dev_ok and noise_ok
    log("OVERALL: " + (
        "PASS — deviations from the check's own discrete-mode "
        "expectation are within the reference envelope, and raw "
        "exceedances are within seed scatter / check bias"
        if ok else "FAIL"))
    with open(os.path.join(work, "RESULT.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
