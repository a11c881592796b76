#!/usr/bin/env python
"""Offline forensics for the star-small entropy fireball.

Loads full-state trace dumps (SHENQI_TRACE_DUMP_STEP) from the fresh
TPU reproducer and, for a focal particle, recomputes the hydro
DtEntropy in f64 with the reference pair semantics
(hydratree2.hpp:232-380), decomposing per-neighbour contributions and
checking the viscosity limiter, the signal velocity, and the entropy
kick bookkeeping between consecutive dumps.

Usage: python validation/fireball_analyze.py DUMPDIR STEP [FOCAL_ID]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GAMMA = 5.0 / 3.0
GM1 = GAMMA - 1.0


def load(dumpdir, step):
    d = np.load(os.path.join(dumpdir, f"trace_dump_step{step}.npz"))
    return {k: d[k] for k in d.files}


def neighbors_of(d, row, boxsize):
    pos = d["ipos"].astype(np.int64)
    dp = (pos - pos[row]).astype(np.int64)
    dp = (dp + 2 ** 31) % 2 ** 32 - 2 ** 31
    dx = dp.astype(np.float64) * (boxsize / 2 ** 32)
    r2 = (dx * dx).sum(axis=1)
    H_i = float(d["hsml"][row])
    H_j = d["hsml"].astype(np.float64)
    inside = (r2 < np.maximum(H_i, H_j) ** 2) & (r2 > 0) \
        & (d["mask"]) & (d["ptype"] == 0) & (d["mass"] > 0)
    return np.nonzero(inside)[0], dx, r2


def dwk_cubic(q, H):
    """Cubic spline dW/dr (gadget convention, sph/kernels.py)."""
    sig = 8.0 / np.pi
    fac = sig / H ** 4
    q = np.minimum(q, 1.0)
    out = np.where(q < 0.5, 6.0 * q * (3.0 * q - 2.0),
                   -6.0 * (1.0 - q) ** 2)
    return fac * out


def analyze(dumpdir, step, focal_id, boxsize=5000.0,
            art_visc=0.75, courant=0.15, hubble=None):
    d = load(dumpdir, step)
    a = float(d["atime"])
    if hubble is None:
        # star-small cosmology: Omega0=0.288, OL=0.712, h=0.7,
        # internal H0 = 0.1 h... use the trace convention H(a)
        from shenqi_tpu.cosmology import Cosmology
        from shenqi_tpu.utils.units import default_units
        cp = Cosmology(Omega0=0.288, OmegaLambda=0.712,
                       OmegaBaryon=0.0472, HubbleParam=0.7,
                       RadiationOn=1)
        cp.init(TimeBegin=0.1, units=default_units())
        hubble = float(cp.hubble_function(a))
    ids = d["ids"]
    row = int(np.nonzero(ids == focal_id)[0][0])
    nbr, dx, r2 = neighbors_of(d, row, boxsize)
    print(f"step {step} a={a:.6f} id={focal_id} row={row} "
          f"tbin={d['tbin'][row]} ent={d['entropy'][row]:.5g} "
          f"dts_dumped={d['dt_entropy'][row]:.4g} "
          f"mvsig_dumped={d['max_signal_vel'][row]:.4g} "
          f"nneighbors={len(nbr)}")

    # comoving factors (hydro.py hydro_time_factors)
    fac_mu = a ** (3 * (GAMMA - 1) / 2) / a       # = 1 for gamma=5/3
    fac_vsic_fix = hubble * a ** (3 * GM1)
    hubble_a2 = hubble * a * a

    ent = d["entropy"].astype(np.float64)
    egyw = np.maximum(d["egywt"].astype(np.float64), 1e-35)
    rho = d["density"].astype(np.float64)
    entvar = np.maximum(ent, 1e-35) ** (1.0 / GAMMA)
    press = np.maximum(entvar * egyw, 1e-35) ** GAMMA
    cs = np.sqrt(GAMMA * press / egyw)
    H = d["hsml"].astype(np.float64)
    vel = d["vel"].astype(np.float64)
    m = d["mass"].astype(np.float64)

    # per-bin dloga for the viscosity limiter (timeline dloga of the
    # particle's bin — approximated from the global step spacing is
    # not enough; use dloga = ln(a2/a1) scaling by 2^(bin-minbin))
    # For the limiter audit we use the bin dloga from the dump pair.
    i = row
    print(f"  i-state: cs={cs[i]:.4g} P={press[i]:.4g} "
          f"egyw={egyw[i]:.4g} rho={rho[i]:.4g} "
          f"entvar={entvar[i]:.4g} h={H[i]:.4g} "
          f"divv={d['divv'][i]:.4g} curlv={d['curlv'][i]:.4g}")

    r = np.sqrt(r2[nbr])
    dv = vel[i] - vel[nbr]
    vdotr = (dx[nbr] * dv).sum(axis=1)
    vdotr2 = vdotr + hubble_a2 * r2[nbr]
    mu = fac_mu * vdotr2 / r
    vsig_visc = cs[i] + cs[nbr] - 3 * mu
    approach = vdotr2 < 0
    rho_ij = 0.5 * (rho[i] + rho[nbr])
    f1 = abs(d["divv"][i]) / (abs(d["divv"][i]) + d["curlv"][i]
                              + 1e-30)
    f2 = np.abs(d["divv"][nbr]) / (np.abs(d["divv"][nbr])
                                   + d["curlv"][nbr] + 1e-30)
    visc = (0.25 * art_visc * vsig_visc * (-mu) / rho_ij
            * (f1 + f2))
    visc = np.where(approach, visc, 0.0)
    dwk_i = dwk_cubic(r / H[i], H[i])
    dwk_j = dwk_cubic(r / H[nbr], H[nbr])
    hfc_visc = 0.5 * m[nbr] * visc * (dwk_i + dwk_j) / r
    contrib = 0.5 * hfc_visc * vdotr2
    conv = GM1 / (hubble_a2 * np.maximum(rho[i], 1e-35) ** GM1)
    dts_recon = contrib.sum() * conv

    print(f"  recomputed dts (NO limiter) = {dts_recon:.4g}  "
          f"(dumped {d['dt_entropy'][i]:.4g})")
    order = np.argsort(-contrib)
    print("  top-5 contributors:")
    for k in order[:5]:
        j = nbr[k]
        print(f"    j=id{ids[j]} r={r[k]:.3g} H_j={H[j]:.3g} "
              f"ent_j={ent[j]:.4g} cs_j={cs[j]:.3g} "
              f"mu={mu[k]:.4g} vsig={vsig_visc[k]:.4g} "
              f"visc={visc[k]:.4g} dts_contrib="
              f"{contrib[k] * conv:.4g} tbin_j={d['tbin'][j]}")
    # what would the limiter have done? need each pair's dloga —
    # report the limiter-free/limited ratio for a RANGE of dloga
    for dloga in (1e-5, 1e-4, 1e-3, 1e-2):
        dl = 2 * dloga
        denom = 0.5 * (m[i] + m[nbr]) * (dwk_i + dwk_j) * r * dl
        lim = 0.5 * fac_vsic_fix * vdotr2 / np.where(
            np.abs(denom) > 0, denom, 1.0)
        ok = (dl > 0) & ((dwk_i + dwk_j) < 0)
        visc_l = np.where(ok, np.minimum(visc, lim), visc)
        visc_l = np.where(approach, visc_l, 0.0)
        hv = 0.5 * m[nbr] * visc_l * (dwk_i + dwk_j) / r
        print(f"  with limiter dloga={dloga:g}: dts = "
              f"{(0.5 * hv * vdotr2).sum() * conv:.4g}")
    return d


def compare_steps(dumpdir, s1, s2, focal_id, boxsize=5000.0):
    """Entropy bookkeeping: ent(s2) - ent(s1) vs the kick integral."""
    d1, d2 = load(dumpdir, s1), load(dumpdir, s2)
    for d, s in ((d1, s1), (d2, s2)):
        row = int(np.nonzero(d["ids"] == focal_id)[0][0])
        print(f"step {s}: a={float(d['atime']):.7f} "
              f"ti={int(d['ti'])} tbin={d['tbin'][row]} "
              f"ent={d['entropy'][row]:.6g} "
              f"dts={d['dt_entropy'][row]:.4g} "
              f"|v|={np.linalg.norm(d['vel'][row]):.4g} "
              f"mvsig={d['max_signal_vel'][row]:.4g}")
    r1 = int(np.nonzero(d1["ids"] == focal_id)[0][0])
    r2 = int(np.nonzero(d2["ids"] == focal_id)[0][0])
    dent = float(d2["entropy"][r2]) - float(d1["entropy"][r1])
    print(f"  Delta ent = {dent:.6g}")


if __name__ == "__main__":
    dumpdir = sys.argv[1]
    step = int(sys.argv[2])
    focal = int(sys.argv[3]) if len(sys.argv) > 3 else 441802
    analyze(dumpdir, step, focal)
