#!/usr/bin/env python
"""Photoionisation / photoheating rate table at J_21 == 1 for a grid
of spectral slopes (tools/make_j21coefftable.py analog): J(nu) =
J_21 (nu/nu_H)^-alpha; rates integrate the Verner et al. (1996)
photoionisation cross sections for HI / HeI / HeII.  The excursion-set
code multiplies these by its inhomogeneous J_21 output.

Output: n_slopes rows of
  slope  Gamma_HI  Gamma_HeI  Gamma_HeII  Heat_HI  Heat_HeI  Heat_HeII
"""

import argparse

import numpy as np
from scipy import integrate

# ionization thresholds (eV)
V_TH = np.array([13.6, 24.59, 54.42])

# Verner et al. (1996) fit parameters per species:
# (sigma0 [Mb], E0 [eV], ya, P, yw, y0, y1)
_VERNER = [
    (54750.0, 0.4298, 32.88, 2.963, 0.0, 0.0, 0.0),      # HI
    (949.2, 13.61, 1.469, 3.188, 2.039, 0.4434, 2.136),  # HeI
    (13690.0, 1.720, 32.88, 2.963, 0.0, 0.0, 0.0),       # HeII
]


def cross_section(v_ev, sp):
    """Verner+96 photoionisation cross section in cm^2."""
    if v_ev < V_TH[sp]:
        return 0.0
    sig0, e0, ya, P, yw, y0, y1 = _VERNER[sp]
    x = v_ev / e0 - y0
    y = np.sqrt(x * x + y1 * y1)
    return (sig0 * 1e-18 * ((x - 1) ** 2 + yw * yw)
            * y ** (0.5 * P - 5.5)
            * (1 + np.sqrt(y / ya)) ** (-P))


def make_table(slope_min=0.0, slope_max=5.0, n_slopes=26,
               noheiii=False):
    # 4 pi J / (h_pl nu): J in eV-ish units so the quad integrand is
    # dimensionless times the cross section (J_21 == 1)
    j_norm = 6.242e11 / 4.14e-15

    def jnu(v, slope):
        if noheiii and v >= V_TH[2]:
            return 0.0
        return j_norm * (v / V_TH[0]) ** (-slope)

    out = np.zeros((n_slopes, 7))
    slopes = np.linspace(slope_min, slope_max, num=n_slopes)
    for i, s in enumerate(slopes):
        out[i, 0] = s
        for sp in range(3):
            ion = integrate.quad(
                lambda v: 4 * np.pi * jnu(v, s) / v
                * cross_section(v, sp), V_TH[sp], np.inf)[0]
            heat = integrate.quad(
                lambda v: 4 * np.pi * jnu(v, s) / v
                * (v - V_TH[sp]) * cross_section(v, sp),
                V_TH[sp], np.inf)[0]
            out[i, sp + 1] = ion * 1e-21
            out[i, sp + 4] = heat * 1e-21
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", default=0, type=float)
    ap.add_argument("--max", default=5, type=float)
    ap.add_argument("-n", "--n_slopes", default=26, type=int)
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--noheiii", action="store_true",
                    help="no HeII-ionising photons (cut at 54.42 eV)")
    args = ap.parse_args()
    table = make_table(args.min, args.max, args.n_slopes,
                       args.noheiii)
    np.savetxt(args.outfile, table, fmt="%.6e", delimiter=" ")


if __name__ == "__main__":
    main()
