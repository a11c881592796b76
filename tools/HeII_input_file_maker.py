#!/usr/bin/env python
"""Helium-II reionization history table generator
(tools/HeII_input_file_maker.py analog): writes the
(alpha_q, Emax, then rows of z / X_HeIII / long-MFP heating rate)
text table that the helium reionization module parses
(shenqi_tpu.physics.helium_reion.HeliumReion.load,
cooling_qso_lightup.cpp:123-183 format).

Physics (published fits): Verner & Ferland 1996 HeIII recombination,
Hui & Gnedin 1997 photoionization cross sections, quasar HeII
ionizing emissivities from Haardt & Madau 2012 / Khaire et al. 2015 /
Kulkarni et al. 2019; the uniform heating rate integrates the
redshifted power-law QSO intensity above the threshold energy
attenuated by the HeII opacity of the un-reionized IGM.

History options: 'linear' X_HeIII(z) between z_i and z_f, or
'quasar' — integrate dX/dz from the emissivity minus clumped
recombinations.
"""

import argparse

import numpy as np
from scipy import integrate, interpolate

EV_TO_ERG = 1.60217e-12
E0_HEII = 54.4               # eV
C_CMS = 3.0e10
H_ERG_S = 6.626e-27
MPC_CM = 3.086e24


class Cosmology:
    """Matter + Lambda background and mean H/He densities (radiation
    and neutrinos negligible at z < 10 for this purpose)."""

    def __init__(self, hub=0.678, OmegaM=0.3175, Omegab=0.048):
        self.hub = hub
        self.OmegaM = OmegaM
        self.OmegaL = 1.0 - OmegaM
        self.Omegab = Omegab
        self.H0 = 3.241e-20 * 100.0 * hub           # s^-1
        self.protonmass = 1.67262178e-24            # g
        G = 6.673e-8
        self.h2rhocrit = 3.0 / (8 * np.pi * G) * self.H0 ** 2

    def Hubble(self, z):
        return self.H0 * np.sqrt(self.OmegaM * (1 + z) ** 3
                                 + self.OmegaL)

    def nH(self, z, YHe=0.25):
        return ((1 - YHe) * self.h2rhocrit * self.Omegab
                / self.protonmass * (1 + z) ** 3)

    def nHe(self, z, YHe=0.25):
        return (YHe * self.h2rhocrit * self.Omegab
                / (4 * self.protonmass) * (1 + z) ** 3)

    def ne(self, z):
        """Pre-HeII-reionization electron density ansatz: one
        electron per H and per He."""
        return self.nH(z) + self.nHe(z)


def _verner96(temp, aa, bb, temp0, temp1):
    s0 = np.sqrt(temp / temp0)
    s1 = np.sqrt(temp / temp1)
    return aa / (s0 * (1 + s0) ** (1 - bb) * (1 + s1) ** (1 + bb))


def alpha_hepp(temp):
    """HeIII -> HeII recombination rate, cm^3/s (V&F96 table 1)."""
    return _verner96(temp, 1.891e-10, 0.7524, 9.370, 2.774e6)


def sigma_heii(E):
    """HeII photoionization cross section, cm^2 (Hui & Gnedin 97)."""
    E0, sigma0, P, ya = 1.720, 1.369e-14, 2.963, 32.88
    return (sigma0 * (E / E0 - 1) ** 2 * (E / E0) ** (0.5 * P - 5.5)
            / (1 + np.sqrt(E / (E0 * ya))) ** P)


class LinearHistory:
    def __init__(self, z_i, z_f):
        self.z_i, self.z_f = z_i, z_f

    def __str__(self):
        return "linear"

    def XHeIII(self, z):
        return float(np.clip((z - self.z_i) / (self.z_f - self.z_i),
                             0, 1))

    def dXHeIIIdz(self, z):
        if self.z_f <= z <= self.z_i:
            return 1.0 / (self.z_f - self.z_i)
        return 0.0


class QuasarHistory:
    """X_HeIII(z) from the Kulkarni+19 (M<-21) quasar emissivity:
    dX/dz = -(emissivity - clumped recombinations)/(nHe H (1+z))."""

    def __init__(self, cosmo, z_i=6.0, z_f=2.5, alpha_q=1.7,
                 clumping_fac=3.0):
        self.cosmo = cosmo
        self.alpha_q = alpha_q
        self.clump = clumping_fac
        self.alpha_rec = alpha_hepp(15000.0)
        self.z_i, self.z_f = z_i, z_f
        zs = np.linspace(z_i, z_f, 1000)
        x = integrate.odeint(self._dxdz, 0.0, zs)[:, 0]
        x = np.minimum(x, 1.0)
        self._interp = interpolate.interp1d(
            zs, np.log(1e-30 + x), bounds_error=False,
            fill_value=0.0)

    def __str__(self):
        return "quasar"

    def emissivity(self, z):
        """Kulkarni+19 limiting-magnitude -21 HeII-ionizing photon
        emissivity, photons/s/cm^3 proper."""
        e1450 = (10 ** 23.91 * (1 + z) ** 11.26 * np.exp(-1.3 * z)
                 / (np.exp(1.62 * z) + 13.6))
        e912 = e1450 * (912 / 1450) ** 0.61
        return (e912 / (H_ERG_S * self.alpha_q) / MPC_CM ** 3
                * 4.0 ** (-self.alpha_q))

    def _dxdz(self, x, z):
        c = self.cosmo
        cosfac = c.nHe(z) * c.Hubble(z) * (1 + z)
        rec = (self.clump * self.alpha_rec * c.ne(z) * x * c.nHe(z))
        return -(self.emissivity(z) - rec) / cosfac

    def XHeIII(self, z):
        return float(np.exp(self._interp(z)) - 1e-30)

    def dXHeIIIdz(self, z):
        return self._dxdz(self.XHeIII(z), z)


class HeIIHeating:
    def __init__(self, hist="linear", hub=0.678, OmegaM=0.3175,
                 Omegab=0.048, z_i=4.0, z_f=2.8, alpha_q=1.7,
                 Emax=150.0, clumping_fac=3.0):
        self.cosmo = Cosmology(hub, OmegaM, Omegab)
        if hist == "quasar":
            self.hist = QuasarHistory(self.cosmo, z_i, z_f, alpha_q,
                                      clumping_fac)
        else:
            self.hist = LinearHistory(z_i, z_f)
        self.alpha_q = alpha_q
        self.Emax = Emax
        self.clump = clumping_fac
        self.alpha_rec = alpha_hepp(15000.0)

    def tau(self, z, z0, E):
        """Optical depth of a photon of present energy E emitted at
        z, absorbed at z0, through HeII of the unreionized IGM."""
        def dtau(zz):
            xHeII = max(1 - self.hist.XHeIII(zz), 0.0)
            return (C_CMS / (self.cosmo.Hubble(zz) * (1 + zz))
                    * sigma_heii(E * (1 + zz) / (1 + z0))
                    * self.cosmo.nHe(zz) * xHeII)
        return integrate.quad(dtau, z0, z)[0]

    def a_norm(self, z):
        """Emissivity normalization: ionizations + clumped
        recombinations balance the photon production."""
        c = self.cosmo
        absfac = (self.clump * self.alpha_rec
                  * self.hist.XHeIII(z) * c.ne(z))
        return (self.alpha_q * c.nHe(z) / E0_HEII ** (-self.alpha_q)
                * (self.hist.dXHeIIIdz(z)
                   * (-c.Hubble(z) * (1 + z)) + absfac))

    def dGamma_hard_dt(self, z, E_lim=1000.0):
        """Uniform (long-MFP) photoheating rate, erg/s/cm^3."""
        def integrand(zz, E):
            inten = (C_CMS / (4 * np.pi)
                     / (self.cosmo.Hubble(zz) * (1 + zz))
                     * (1 + z) ** 3 / (1 + zz) ** 3
                     * self.a_norm(zz) * np.exp(-self.tau(zz, z, E)))
            return ((E - E0_HEII) / E * inten * sigma_heii(E)
                    * E ** (-self.alpha_q))
        w = integrate.dblquad(integrand, self.Emax, E_lim, z, 10)[0]
        xHeII = max(1 - self.hist.XHeIII(z), 0.0)
        return (4 * np.pi * w * EV_TO_ERG * self.cosmo.nHe(z)
                * xHeII)

    def write_table(self, outfile, numz=100):
        zq = np.logspace(np.log10(self.hist.z_i),
                         np.log10(self.hist.z_f), numz)
        with open(outfile, "w") as f:
            f.write(f"#File parameters for this input file: "
                    f"Emax = {self.Emax:g}, alpha_q = "
                    f"{self.alpha_q:g}, Clumping factor = "
                    f"{self.clump:g}, history = {self.hist}\n")
            f.write("#Units of heating rate (3rd column) are "
                    "erg/s/cm^3 \n")
            f.write(f"{self.alpha_q:f} \n")
            f.write(f"{self.Emax:f} \n")
            for z in zq:
                f.write(f"{z:e} {self.hist.XHeIII(z):e} "
                        f"{self.dGamma_hard_dt(z):e} \n")
        print("wrote", outfile)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alphaq", type=float, required=True)
    ap.add_argument("--Emax", type=float, default=150.0)
    ap.add_argument("--cf", type=float, default=3.0)
    ap.add_argument("--z_i", type=float, default=-1)
    ap.add_argument("--z_f", type=float, default=-1)
    ap.add_argument("--hist", type=str, required=True,
                    choices=("linear", "quasar"))
    ap.add_argument("--outfile", type=str,
                    default="HeIIReionizationTable")
    ap.add_argument("--numz", type=int, default=100)
    args = ap.parse_args()
    if args.z_i < 0:
        args.z_i = 4.0 if args.hist == "linear" else 6.0
    if args.z_f < 0:
        args.z_f = 2.8 if args.hist == "linear" else 2.5
    heat = HeIIHeating(hist=args.hist, z_i=args.z_i, z_f=args.z_f,
                       Emax=args.Emax, alpha_q=args.alphaq,
                       clumping_fac=args.cf)
    heat.write_table(args.outfile, numz=args.numz)


if __name__ == "__main__":
    main()
