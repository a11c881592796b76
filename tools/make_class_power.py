#!/usr/bin/env python
"""Generate the matter power spectrum (and transfer functions) that
MP-GenIC / shenqi genic read, from an MP-GenIC parameter file
(tools/make_class_power.py analog).

Two backends:
  * classy (the CLASS Boltzmann code python wrapper), when installed:
    full behavior — synchronous-gauge dTk/vTk/mPk at the requested
    redshift(s), transfer tables in the CLASS command-line format
    (the 22-column layout cosmology/power.py parses), P(k) in
    (k h/Mpc, P (Mpc/h)^3) columns.
  * Eisenstein & Hu (1998) analytic fallback (this image has no
    CLASS): writes FileWithInputSpectrum from the EH98 transfer
    shape, normalized to the paramfile Sigma8 at z=0 and scaled to
    the output redshift with the exact growth ODE.  The fallback
    refuses DifferentTransferFunctions=1, massive neutrinos, and
    dark-energy fluids — those need a Boltzmann code.

Existing output files are never overwritten (reference behavior).

Usage: make_class_power.py PARAMFILE [--extraz z1 z2 ...]
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DEFAULTS = {
    "FileWithInputSpectrum": "", "FileWithTransferFunction": "",
    "Ngrid": 0, "BoxSize": 0.0, "Omega0": 0.3, "OmegaLambda": 0.7,
    "OmegaBaryon": 0.0486, "HubbleParam": 0.7, "Redshift": 99.0,
    "Sigma8": -1.0, "InputPowerRedshift": -1.0,
    "DifferentTransferFunctions": 1,
    "UnitLength_in_cm": 3.085678e21, "Omega_fld": 0.0,
    "w0_fld": -1.0, "wa_fld": 0.0, "Omega_ur": 0.0,
    "MNue": 0.0, "MNum": 0.0, "MNut": 0.0, "MWDM_Therm": 0.0,
    "PrimordialIndex": 0.971, "PrimordialAmp": 2.215e-9,
    "PrimordialRunning": 0.0, "CMBTemperature": 2.7255,
}


def read_paramfile(path):
    """Flat Key = Value MP-GenIC paramfile -> typed dict."""
    cfg = dict(_DEFAULTS)
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].split("%")[0].strip()
            if "=" not in line:
                continue
            key, val = [s.strip() for s in line.split("=", 1)]
            if key not in cfg:
                cfg.setdefault(key, val)
                continue
            d = _DEFAULTS.get(key, "")
            if isinstance(d, int):
                cfg[key] = int(float(val))
            elif isinstance(d, float):
                cfg[key] = float(val)
            else:
                cfg[key] = val
    return cfg


def _refuse_existing(path):
    if os.path.exists(path):
        raise IOError(f"Refusing to write to existing file: {path}")


def _out_redshift(cfg):
    if cfg["InputPowerRedshift"] >= 0:
        return cfg["InputPowerRedshift"]
    return cfg["Redshift"]


# ---------------------------------------------------------------------------
# EH98 fallback


def eh98_power(cfg, redshift):
    """(k h/Mpc, P(k) (Mpc/h)^3) from the EH98 transfer + growth ODE,
    normalized to Sigma8 at z=0."""
    from shenqi_tpu.cosmology.background import (Cosmology,
                                                 tophat_sigma)
    from shenqi_tpu.cosmology.power import eisenstein_hu
    from shenqi_tpu.utils.units import get_unitsystem

    if cfg["DifferentTransferFunctions"]:
        raise SystemExit(
            "DifferentTransferFunctions=1 needs species-level "
            "Boltzmann transfers: install classy, or set "
            "DifferentTransferFunctions=0 for the EH98 fallback")
    if cfg["MNue"] + cfg["MNum"] + cfg["MNut"] > 0 \
            or cfg["Omega_fld"] != 0:
        raise SystemExit("massive neutrinos / Omega_fld need classy")
    if cfg["Sigma8"] <= 0:
        raise SystemExit(
            "the EH98 fallback normalizes with Sigma8: set Sigma8 "
            "in the paramfile (classy supports PrimordialAmp)")

    units = get_unitsystem(cfg["UnitLength_in_cm"], 1.989e43, 1e5)
    CP = Cosmology(Omega0=cfg["Omega0"],
                   OmegaLambda=cfg["OmegaLambda"],
                   OmegaBaryon=cfg["OmegaBaryon"],
                   HubbleParam=cfg["HubbleParam"],
                   CMBTemperature=cfg["CMBTemperature"],
                   RadiationOn=1)
    a_out = 1.0 / (1.0 + redshift)
    CP.init(min(a_out, 0.5), units)

    boxmpc = cfg["BoxSize"] / 3.085678e24 * cfg["UnitLength_in_cm"]
    maxk = max(10, 2 * math.pi / max(boxmpc, 1e-10)
               * max(cfg["Ngrid"], 1) * 4)
    k = np.logspace(-5, np.log10(maxk), 600)      # h/Mpc
    t = eisenstein_hu(k, CP)
    ns = cfg["PrimordialIndex"]
    shape = k ** ns * t * t                        # ~ P(k), unnorm
    s8 = tophat_sigma(k, shape, 8.0)
    pk0 = shape * (cfg["Sigma8"] / s8) ** 2        # z=0, (Mpc/h)^3
    growth = CP.growth_factor(a_out, 1.0)          # D(a)/D(1)
    return k, pk0 * growth ** 2


# ---------------------------------------------------------------------------
# classy backend (mirrors the reference tool's parameter mapping)


def classy_power(cfg, redshifts, external_pk=None, verbose=False):
    from classy import Class

    h = cfg["HubbleParam"]
    omega0 = cfg["Omega0"]
    omegab = cfg["OmegaBaryon"]
    mnu = [cfg["MNue"], cfg["MNum"], cfg["MNut"]]
    nmassive = sum(m > 0 for m in mnu)
    params = {
        "h": h, "Omega_b": omegab,
        "Omega_cdm": omega0 - omegab
        - sum(mnu) / 93.14 / h ** 2,
        "T_cmb": cfg["CMBTemperature"],
        "n_s": cfg["PrimordialIndex"],
        "alpha_s": cfg["PrimordialRunning"],
        "gauge": "synchronous",
        "k_per_decade_for_pk": 50, "k_bao_width": 8,
        "k_per_decade_for_bao": 200,
        "neglect_CMB_sources_below_visibility": 1e-30,
        "transfer_neglect_late_source": 3000.0,
        "l_max_g": 50, "l_max_ur": 150,
        "N_ur": cfg["Omega_ur"] if cfg["Omega_ur"] > 0
        else 3.044 - 1.0132 * nmassive,
        "output": "dTk vTk mPk",
        "extra metric transfer functions": "y",
        "z_pk": ", ".join(str(z) for z in redshifts),
        "z_max_pk": max(max(redshifts) + 1, 99),
    }
    if nmassive:
        params["N_ncdm"] = nmassive
        params["m_ncdm"] = ", ".join(str(m) for m in mnu if m > 0)
    if cfg["Omega_fld"] > 0:
        params.update({"Omega_fld": cfg["Omega_fld"],
                       "w0_fld": cfg["w0_fld"],
                       "wa_fld": cfg["wa_fld"]})
    if cfg["Sigma8"] > 0:
        params["sigma8"] = cfg["Sigma8"]
    else:
        params["A_s"] = cfg["PrimordialAmp"]
    boxmpc = cfg["BoxSize"] / 3.085678e24 * cfg["UnitLength_in_cm"]
    params["P_k_max_h/Mpc"] = max(
        10, 2 * math.pi / max(boxmpc, 1e-10)
        * max(cfg["Ngrid"], 1) * 4)
    if external_pk is not None:
        params["P_k_ini"] = "external_pk"
        params["command"] = "cat " + external_pk
    if verbose:
        for kk, vv in params.items():
            print(kk, "=", vv)
    c = Class()
    c.set(params)
    c.compute()
    print("sigma_8(z=0) =", c.sigma8())
    return c, h


_TRANSFER_HEADER = (
    "Transfer functions T_i(k) for adiabatic (AD) mode "
    "(normalized to initial curvature=1); CLASS command-line format "
    "(T_CAMB(k) = -T_CLASS(k)/k^2)")


def save_transfer(trans, path):
    """CLASS command-line column layout (22 cols with 3 ncdm)."""
    if "d_ncdm[0]" in trans.keys():
        keys = ["k (h/Mpc)", "d_g", "d_b", "d_cdm", "d_ur",
                "d_ncdm[0]", "d_ncdm[1]", "d_ncdm[2]", "d_tot",
                "phi", "psi", "h", "h_prime", "eta", "eta_prime",
                "t_g", "t_b", "t_ur", "t_ncdm[0]", "t_ncdm[1]",
                "t_ncdm[2]", "t_tot"]
    else:
        keys = ["k (h/Mpc)", "d_g", "d_b", "d_cdm", "d_ur", "d_tot",
                "phi", "psi", "h", "h_prime", "eta", "eta_prime",
                "t_g", "t_b", "t_ur", "t_tot"]
    np.savetxt(path, np.vstack([trans[kk] for kk in keys]).T,
               header=_TRANSFER_HEADER)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paramfile")
    ap.add_argument("--extpk", type=str, default=None,
                    help="external primordial power spectrum (classy)")
    ap.add_argument("--extraz", type=float, nargs="*", default=None)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    cfg = read_paramfile(args.paramfile)
    sdir = os.path.split(args.paramfile)[0]
    redshift = _out_redshift(cfg)
    pkfile = os.path.join(sdir, cfg["FileWithInputSpectrum"])
    _refuse_existing(pkfile)
    zs = [redshift] + list(args.extraz or [])

    try:
        import classy                          # noqa: F401
        have_classy = True
    except ImportError:
        have_classy = False

    if have_classy:
        c, h = classy_power(cfg, zs, args.extpk, args.verbose)
        for i, z in enumerate(zs):
            suffix = "" if i == 0 else "-" + str(z)
            trans = c.get_transfer(z=z)
            if cfg["DifferentTransferFunctions"] == 1:
                tfile = os.path.join(
                    sdir, cfg["FileWithTransferFunction"] + suffix)
                _refuse_existing(tfile)
                save_transfer(trans, tfile)
            khmpc = trans["k (h/Mpc)"]
            khmpc[-1] *= 0.9999
            kmpc = khmpc * h
            pk = np.array([c.pk_lin(k=kk, z=z)
                           for kk in kmpc]) * h ** 3
            out = pkfile + suffix
            _refuse_existing(out) if suffix else None
            np.savetxt(out, np.vstack([khmpc, pk]).T)
            print("wrote", out)
    else:
        print("classy not installed: Eisenstein & Hu (1998) "
              "fallback (total-matter transfer, Sigma8 "
              "normalization)")
        for i, z in enumerate(zs):
            k, pk = eh98_power(cfg, z)
            out = pkfile + ("" if i == 0 else "-" + str(z))
            if i > 0:
                _refuse_existing(out)
            np.savetxt(out, np.vstack([k, pk]).T)
            print("wrote", out)


if __name__ == "__main__":
    main()
