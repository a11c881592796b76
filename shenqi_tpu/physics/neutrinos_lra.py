"""Massive-neutrino linear response (neutrinos_lra.cpp analog).

Ali-Haimoud & Bird 2013 integral-equation method: follow delta_nu(k)
sourced by the measured total-matter delta(k) history through the
free-streaming kernel

  delta_nu(k,a) = J(k F(a_tr,a)/(m/kT)) delta_nu_init (1 + ...)        (IC)
    + prefac * int dloga' F(a',a)/(a' H(a')) J(k F(a',a)/(m/kT))
                 delta_tot(k,a')

with F the free-streaming length integral and J the Fermi-Dirac-averaged
sinc (fit accurate to 3%).  All host-side float64 (one evaluation per PM
step on ~nk bins — tiny).

The result feeds the PM potential multiplier
  nufac(k) = 1 + prefac * delta_nu(k)/delta_cdm(k)
(gravpm.cpp:412-424) and the saved total power normalization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
from scipy.integrate import quad
from scipy.interpolate import PchipInterpolator

from ..utils.constants import HUBBLE, LIGHTCGS


def specialJ(x):
    """FD-averaged sinc fit (neutrinos_lra.cpp specialJ_fit):
    accurate to <3% rel, 0.07% abs."""
    x = np.asarray(x, dtype=np.float64)
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    out = ((1. + 0.0168 * x2 + 0.0407 * x4)
           / (1. + 2.1734 * x2 + 1.6787 * np.exp(4.1811 * np.log(
               np.maximum(x, 1e-30))) + 0.1467 * x8))
    return np.where(x <= 0, 1.0, out)


def fslength(CP, logai, logaf, light):
    """Free-streaming length x (m/kT) from ai to af, in internal length
    (neutrinos_lra.cpp fslength)."""
    if logai >= logaf:
        return 0.0
    val, _ = quad(lambda loga: 1.0 / np.exp(loga)
                  / (np.exp(loga) * CP.hubble_function(np.exp(loga))),
                  logai, logaf, epsrel=1e-8, limit=100)
    return light * val


@dataclass
class DeltaTotTable:
    """History of total-matter delta(k) + neutrino response state."""

    CP: object
    wavenum: np.ndarray            # [nk] internal units
    time_transfer: float           # a at initialization
    light: float                   # c in internal velocity units
    delta_nu_prefac: float = 0.0
    omeganonu: float = 0.0
    scalefact: List[float] = field(default_factory=list)   # log a
    delta_tot: Optional[np.ndarray] = None   # [nk, Na]
    delta_nu_init: Optional[np.ndarray] = None
    delta_nu_last: Optional[np.ndarray] = None
    # optional per-k delta_nu/delta_cdm IC ratio (from the CLASS
    # transfer table) used at first initialization
    init_ratio: Optional[np.ndarray] = None

    @classmethod
    def create(cls, CP, wavenum, time_transfer, unit_time_in_s,
               unit_velocity) -> "DeltaTotTable":
        light = LIGHTCGS / unit_velocity
        tab = cls(CP=CP, wavenum=np.asarray(wavenum, np.float64),
                  time_transfer=time_transfer, light=light)
        tab.delta_nu_prefac = (1.5 * CP.Omega0 * HUBBLE * HUBBLE
                               * unit_time_in_s ** 2 / light)
        tab.omeganonu = CP.Omega0 - CP.ONu.get_omega_nu(1.0)
        return tab

    def _get_delta_tot(self, delta_nu, delta_cdm, a):
        onu_a3 = self.CP.ONu.get_omega_nu_nopart(a) * a ** 3
        onu1 = self.CP.ONu.get_omega_nu(1.0)
        fcdm = 1 - onu_a3 / (self.omeganonu + onu1)
        return fcdm * (delta_cdm + delta_nu * onu_a3
                       / (self.omeganonu + onu1))

    def initialize(self, delta_cdm_init, t_nu_by_t_nonu=1.0):
        """First call: set ICs at time_transfer
        (neutrinos_lra.cpp:103-132)."""
        self.delta_nu_init = (np.asarray(delta_cdm_init, np.float64)
                              * t_nu_by_t_nonu)
        d0 = self._get_delta_tot(self.delta_nu_init, delta_cdm_init,
                                 self.time_transfer)
        self.delta_tot = d0[:, None].copy()
        self.scalefact = [np.log(self.time_transfer)]
        self.delta_nu_last = self.delta_nu_init.copy()

    def get_delta_nu(self, a, mnu):
        """delta_nu(k) for one species of mass mnu at scale factor a."""
        kT = self.CP.ONu.kBtnu
        mnubykT = mnu / kT if kT > 0 else 0.0
        loga_tr = np.log(self.time_transfer)
        loga = np.log(a)
        fsl_a0a = fslength(self.CP, loga_tr, loga, self.light)
        deriv_prefac = (self.time_transfer
                        * (self.CP.hubble_function(self.time_transfer)
                           / self.light) * self.time_transfer)
        x = self.wavenum * fsl_a0a / (mnubykT if mnubykT > 0 else 1.0)
        delta_nu = (specialJ(x) * self.delta_nu_init
                    * (1. + deriv_prefac * fsl_a0a))

        na = self.delta_tot.shape[1]
        if na > 1 and mnubykT > 0:
            # free-streaming length spline over the history
            nfs = max(na * 16, 32)
            fsscales = np.linspace(loga_tr, loga, nfs)
            fslengths = np.array([fslength(self.CP, la, loga,
                                           self.light)
                                  for la in fsscales])
            fs_sp = PchipInterpolator(fsscales, fslengths)
            logas = np.asarray(self.scalefact)
            for ik, k in enumerate(self.wavenum):
                if na >= 3:
                    dtot_sp = PchipInterpolator(logas,
                                                self.delta_tot[ik])
                else:
                    dtot_sp = lambda x_, ik=ik: np.interp(
                        x_, logas, self.delta_tot[ik])

                def integrand(logai):
                    fsl = float(fs_sp(logai))
                    ai = np.exp(logai)
                    sj = float(specialJ(k * fsl / mnubykT))
                    return (fsl / (ai * self.CP.hubble_function(ai))
                            * sj * float(dtot_sp(logai)))

                val, _ = quad(integrand, loga_tr, loga, epsrel=1e-6,
                              limit=200)
                delta_nu[ik] += self.delta_nu_prefac * val
        return delta_nu

    def get_delta_nu_combined(self, a):
        """Degeneracy-weighted combination over massive species."""
        onu_nopart = self.CP.ONu.get_omega_nu_nopart(a)
        total = np.zeros_like(self.wavenum)
        for deg, tabl in zip(self.CP.ONu.nu_degeneracies,
                             self.CP.ONu.tables):
            if tabl.mnu <= 0:
                continue
            omega_i = deg * tabl.rho(a) / self.CP.ONu.rhocrit
            total += (self.get_delta_nu(a, tabl.mnu)
                      * omega_i / max(onu_nopart, 1e-35))
        return total

    def update(self, a, delta_cdm):
        """Per PM step: compute delta_nu and append the new delta_tot
        (update_delta_tot + get_delta_nu_combined protocol)."""
        delta_cdm = np.asarray(delta_cdm, np.float64)
        if self.delta_tot is None:
            r = 1.0 if self.init_ratio is None else self.init_ratio
            self.initialize(delta_cdm, t_nu_by_t_nonu=r)
            return self.delta_nu_last
        loga = np.log(a)
        delta_nu = self.get_delta_nu_combined(a)
        if loga > self.scalefact[-1] + 1e-10:
            dt = self._get_delta_tot(delta_nu, delta_cdm, a)
            self.delta_tot = np.concatenate(
                [self.delta_tot, dt[:, None]], axis=1)
            self.scalefact.append(loga)
        self.delta_nu_last = delta_nu
        return delta_nu

    def save(self, snapdir: str):
        """Write the delta_tot history into a snapshot
        (petaio_save_neutrinos analog, neutrinos_lra.cpp:267): blocks
        Neutrino/{Deltas,Scalefact,Wavenum,DeltaNuInit}."""
        from ..io.bigfile import BigFile
        if self.delta_tot is None:
            return
        bf = BigFile(snapdir)
        nk, na = self.delta_tot.shape

        def put(name, arr):
            arr = np.asarray(arr, np.float64).ravel()
            blk = bf.create_block(f"Neutrino/{name}", "f8", len(arr))
            blk.write(0, arr)
            blk.flush()

        put("Deltas", self.delta_tot)          # row-major [nk, na]
        put("Scalefact", self.scalefact)
        put("Wavenum", self.wavenum)
        put("DeltaNuInit", self.delta_nu_init)

    def load(self, snapdir: str) -> bool:
        """Restore the history written by save(); returns success.
        Resuming without this would restart delta_nu from scratch and
        bias the late-time neutrino suppression."""
        from ..io.bigfile import BigFile
        bf = BigFile(snapdir)
        if "Neutrino/Deltas" not in bf:
            return False
        scale = np.asarray(bf["Neutrino/Scalefact"].read())
        wav = np.asarray(bf["Neutrino/Wavenum"].read())
        deltas = np.asarray(bf["Neutrino/Deltas"].read())
        self.wavenum = wav
        self.scalefact = list(scale)
        self.delta_tot = deltas.reshape(len(wav), len(scale))
        self.delta_nu_init = np.asarray(
            bf["Neutrino/DeltaNuInit"].read())
        self.time_transfer = float(np.exp(scale[0]))
        self.delta_nu_last = self.get_delta_nu_combined(
            float(np.exp(scale[-1])))
        return True

    def potential_factor(self, a, delta_cdm):
        """Multiplier 1 + prefac * delta_nu/delta_cdm for the PM
        potential (gravpm.cpp:412-424)."""
        delta_nu = self.delta_nu_last
        onu_a3 = self.CP.ONu.get_omega_nu_nopart(a) * a ** 3
        prefac = onu_a3 / self.omeganonu
        ratio = np.where(np.asarray(delta_cdm) > 0,
                         delta_nu / np.maximum(delta_cdm, 1e-35), 0.0)
        return 1.0 + prefac * ratio
