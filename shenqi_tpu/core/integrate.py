"""Hierarchical individual timesteps: criteria, bins, KDK kicks.

The timestep.cpp analog.  Host-side DriftKickTimes bookkeeping (python
ints on the 2^46-tick timeline) + device-side vectorized criteria and
per-bin kick application (per-particle kick factor = gather from a
[TIMEBINS+1] factor table by timebin — the masked-lanes answer to the
reference's per-bin loops).

Criteria (timestep.cpp:99-137, 1012-1040):
  * gravity: dt = sqrt(2 ErrTolIntAccuracy atime eps / |a_phys|),
    eps = FORCE_SOFTENING/2.8, a_phys = (a_tree + a_pm)/atime^2
  * Courant: dt = 2 CourantFac atime Hsml / (fac3 MaxSignalVel)
  * Hsml change: dt = CourantFac atime^2 |Hsml / DtHsml|
  * PM step: MaxRMSDisplacementFac hubble atime^2 min(asmth, dmean)
    / sqrt(<v^2>) per type, min over types
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .timeline import (TIMEBINS, TIMEBASE, Timeline, dti_from_timebin,
                       round_down_power_of_two, timebin_from_dti)
from ..utils.constants import GAMMA, GAMMA_MINUS1


@dataclass
class TimestepParams:
    ErrTolIntAccuracy: float = 0.02
    CourantFac: float = 0.15
    MaxRMSDisplacementFac: float = 0.2
    MaxSizeTimestep: float = 0.1
    MinSizeTimestep: float = 0.0
    MaxGasVel: float = 3e5
    ForceEqualTimesteps: bool = False
    FastParticleType: int = 2


@dataclass
class DriftKickTimes:
    """Host-side integer kick/drift bookkeeping (timestep.h:10-26)."""

    ti_current: int = 0
    ti_kick: list = field(default_factory=lambda: [0] * (TIMEBINS + 1))
    ti_lastactivedrift: list = field(
        default_factory=lambda: [0] * (TIMEBINS + 1))
    pm_kick: int = 0
    pm_start: int = 0
    pm_length: int = 0
    mintimebin: int = TIMEBINS
    maxtimebin: int = 0

    @classmethod
    def init(cls, ti: int) -> "DriftKickTimes":
        t = cls(ti_current=ti)
        t.ti_kick = [ti] * (TIMEBINS + 1)
        t.ti_lastactivedrift = [ti] * (TIMEBINS + 1)
        t.pm_kick = ti
        t.pm_start = ti
        t.pm_length = 0   # first step is always a PM step
        t.mintimebin = 0
        t.maxtimebin = 0
        return t

    def is_pm(self) -> bool:
        if self.ti_current > self.pm_start + self.pm_length:
            raise RuntimeError("passed end of PM step")
        return self.ti_current == self.pm_start + self.pm_length


def is_timebin_active(bin: int, ti: int) -> bool:
    if bin <= 0 or ti <= 0:
        return True
    return ti % dti_from_timebin(bin) == 0


def active_bins_mask(ti: int) -> np.ndarray:
    """[TIMEBINS+1] bool: which bins are active at integer time ti."""
    return np.array([is_timebin_active(b, ti)
                     for b in range(TIMEBINS + 1)])


def find_next_kick(ti: int, mintimebin: int) -> int:
    return ti + dti_from_timebin(max(mintimebin, 1))


# ---------- device-side criteria ----------

def gravity_dloga(accel_total, atime, hubble, softening,
                  err_tol_int_acc):
    """sqrt(2 eta a eps/|a_phys|) * H  (timestep.cpp:1028-1040)."""
    a2inv = 1.0 / (atime * atime)
    ac2 = jnp.sum((accel_total * a2inv) ** 2, axis=-1)
    ac = jnp.sqrt(jnp.maximum(ac2, 1e-60))
    eps = softening / 2.8
    dt = jnp.sqrt(2 * err_tol_int_acc * atime * eps / ac)
    return dt * hubble


def hydro_dloga(hsml, max_signal_vel, dt_hsml, atime, hubble,
                courant_fac):
    """Courant + Hsml-change criteria; returns dloga."""
    fac3 = atime ** (3 * (1 - GAMMA) / 2.0)
    dt_courant = (2 * courant_fac * atime * hsml
                  / (fac3 * jnp.maximum(max_signal_vel, 1e-35)))
    dt_hsml_c = (courant_fac * atime * atime
                 * jnp.abs(hsml / (dt_hsml + 1e-20)))
    dt = jnp.minimum(dt_courant, dt_hsml_c)
    return dt * hubble


def long_range_dloga(vel, mass, ptype, alive, atime, CP, boxsize,
                     asmth_internal, params: TimestepParams):
    """Global PM timestep from RMS displacement (timestep.cpp:114+).

    Host-side reduction (counts/min-masses per type) over device arrays.
    """
    vel = np.asarray(vel, dtype=np.float64)
    mass = np.asarray(mass, dtype=np.float64)
    ptype = np.asarray(ptype)
    alive = np.asarray(alive)
    hubble = CP.hubble_function(atime)
    v_sum = np.zeros(6)
    count = np.zeros(6, dtype=np.int64)
    min_mass = np.full(6, 1e30)
    for t in range(6):
        sel = alive & (ptype == t)
        if not sel.any():
            continue
        v_sum[t] = (vel[sel] ** 2).sum()
        count[t] = sel.sum()
        min_mass[t] = mass[sel][mass[sel] > 0].min() \
            if (mass[sel] > 0).any() else 1e30
    # combine baryonic species
    v_sum[0] += v_sum[4]
    count[0] += count[4]
    v_sum[4], count[4] = v_sum[0], count[0]
    v_sum[0] += v_sum[5]
    count[0] += count[5]
    v_sum[5], count[5] = v_sum[0], count[0]
    min_mass[5] = min_mass[0]

    dloga = params.MaxSizeTimestep
    for t in range(6):
        if count[t] == 0:
            continue
        if t in (0, 4, 5):
            omega = CP.OmegaBaryon
        elif t == 2:
            omega = CP.ONu.get_omega_nu(1.0)
        else:
            omega = CP.OmegaCDM
        if omega <= 0:
            omega = CP.OmegaCDM if CP.OmegaCDM > 0 else CP.Omega0
        dmean = (min_mass[t] / (omega * CP.RhoCrit)) ** (1.0 / 3)
        dloga1 = (params.MaxRMSDisplacementFac * hubble * atime ** 2
                  * min(asmth_internal, dmean)
                  / np.sqrt(v_sum[t] / count[t]))
        if t != params.FastParticleType and dloga1 < dloga:
            dloga = dloga1
    return max(dloga, params.MinSizeTimestep)


def assign_timebins(dloga, timebin_old, active, times: DriftKickTimes,
                    timeline: Timeline,
                    min_dloga: float = 0.0) -> np.ndarray:
    """Host-side: dloga [N] -> new power-of-two timebins.

    A particle's bin may only grow to a bin that is active now
    (synchronization rule); dti is clamped to the PM step length.
    Returns (new_timebins, bad_count).
    """
    dloga = np.asarray(dloga, dtype=np.float64)
    timebin_old = np.asarray(timebin_old)
    active = np.asarray(active)
    dti_max = times.pm_length
    ti = times.ti_current
    new_bins = timebin_old.copy()
    bad = 0
    dloga_c = np.maximum(dloga, min_dloga)
    # vector: dti from dloga using the current segment's tick size
    dloga_per_ti = timeline.dloga_interval_ti(ti)
    if dloga_per_ti <= 0:
        return new_bins, 0
    # an UNCONSTRAINED step (e.g. a just-spawned star with no force
    # yet: |acc|=0 -> dloga=inf, timestep.cpp caps at MaxSizeTimestep)
    # clamps to the PM step; only NaN (genuinely sick dynamics) falls
    # through to the bad-timestep count via the garbage cast
    dloga_cap = float(dti_max) * dloga_per_ti
    dloga_c = np.where(dloga_c > dloga_cap, dloga_cap, dloga_c)
    with np.errstate(invalid="ignore"):
        dti = (dloga_c / dloga_per_ti).astype(np.int64)
    dti = np.minimum(dti, dti_max)
    dti = np.maximum(dti, 0)
    # round down to power of two
    with np.errstate(divide="ignore"):
        bins = np.where(dti > 0,
                        np.floor(np.log2(np.maximum(dti, 1))), 0
                        ).astype(np.int32)
    bins = np.clip(bins, 0, TIMEBINS)
    bad = int(np.sum(active & ((dti <= 1) | (dti > TIMEBASE))))
    # growth limited to bins synchronized at the current time
    for i in np.nonzero(active)[0]:
        b = bins[i]
        if b > timebin_old[i]:
            while b > timebin_old[i] and not is_timebin_active(b, ti):
                b -= 1
        new_bins[i] = max(b, 1)
    return new_bins, bad


# ---------- device-side kicks ----------

@partial(jax.jit, donate_argnums=(0,))
def kick_gravity(vel, accel, timebin, active_mask, gravkick_table):
    """v += a_tree * gravkick[bin] for active particles."""
    fac = gravkick_table[timebin.astype(jnp.int32)]
    fac = jnp.where(active_mask, fac, 0.0)
    return vel + accel * fac[:, None]


@partial(jax.jit, donate_argnums=(0, 1))
def kick_hydro(vel, entropy, hydro_accel, dt_entropy_rate, timebin,
               is_gas, hydrokick_table, dt_entr_table, atime,
               max_gas_vel):
    """Hydro kick + entropy update + velocity limiter for gas."""
    bin_i = timebin.astype(jnp.int32)
    hk = hydrokick_table[bin_i]
    dte = dt_entr_table[bin_i]
    gas = is_gas
    vel = vel + jnp.where(gas, hk, 0.0)[:, None] * hydro_accel
    # hard velocity limit
    vv = jnp.linalg.norm(vel, axis=-1)
    over = gas & (vv / atime > max_gas_vel) & (vv > 0)
    scale = jnp.where(over, max_gas_vel * atime
                      / jnp.maximum(vv, 1e-35), 1.0)
    vel = vel * scale[:, None]
    entropy = entropy + jnp.where(gas, dte, 0.0) * dt_entropy_rate
    return vel, entropy


@partial(jax.jit, donate_argnums=(0,))
def kick_pm(vel, grav_pm, alive, fac):
    return vel + jnp.where(alive[:, None], grav_pm * fac, 0.0)


def gravkick_tables(CP, timeline: Timeline, times: DriftKickTimes):
    """Per-bin (gravkick, hydrokick, dt_entr) half-step factor tables.

    Factors from Ti_kick[bin] to Ti_kick[bin]+dti/2 for active bins
    (apply_half_kick, timestep.cpp:842-880); zeros for inactive bins.
    """
    grav = np.zeros(TIMEBINS + 1)
    hyd = np.zeros(TIMEBINS + 1)
    dte = np.zeros(TIMEBINS + 1)
    for b in range(TIMEBINS + 1):
        if not is_timebin_active(b, times.ti_current):
            continue
        t0 = times.ti_kick[b]
        t1 = t0 + dti_from_timebin(b) // 2
        if t1 == t0:
            continue
        grav[b] = timeline.exact_gravkick_factor(CP, t0, t1)
        hyd[b] = timeline.exact_hydrokick_factor(CP, t0, t1)
        dte[b] = timeline.dloga_from_dti(dti_from_timebin(b) // 2,
                                         times.ti_current)
    return (jnp.asarray(grav, jnp.float32), jnp.asarray(hyd, jnp.float32),
            jnp.asarray(dte, jnp.float32))


def predictor_tables(CP, timeline: Timeline, times: DriftKickTimes):
    """Per-bin drift-time predictor factors (density.c VelPred /
    EntVarPred semantics).

    With individual timesteps, an inactive particle's velocity and
    entropy sit at its last half-kick time Ti_kick[bin], not at the
    current drift time; neighbour interactions must use values
    predicted forward (or backward: factors are signed) to ti_current:

      v_pred = v + GravAccel * gk[bin] + GravPM * gk_pm
                 + HydroAccel * hk[bin]
      entvar_pred = (Entropy + DtEntropy * dloga[bin])^(1/gamma)

    Returns (gravkick[TB+1], hydrokick[TB+1], dloga[TB+1], gk_pm).
    """
    grav = np.zeros(TIMEBINS + 1)
    hyd = np.zeros(TIMEBINS + 1)
    dte = np.zeros(TIMEBINS + 1)
    for b in range(TIMEBINS + 1):
        t0 = times.ti_kick[b]
        if t0 == times.ti_current:
            continue
        grav[b] = timeline.exact_gravkick_factor(CP, t0,
                                                 times.ti_current)
        hyd[b] = timeline.exact_hydrokick_factor(CP, t0,
                                                 times.ti_current)
        dte[b] = timeline.dloga_from_dti(times.ti_current - t0,
                                         times.ti_current)
    gk_pm = timeline.exact_gravkick_factor(CP, times.pm_kick,
                                           times.ti_current)
    return (jnp.asarray(grav, jnp.float32),
            jnp.asarray(hyd, jnp.float32),
            jnp.asarray(dte, jnp.float32), float(gk_pm))


def update_kick_times(times: DriftKickTimes):
    """Advance Ti_kick for active bins by half their step."""
    if times.mintimebin == 0 and times.maxtimebin == 0:
        return
    for b in range(times.mintimebin, TIMEBINS + 1):
        if is_timebin_active(b, times.ti_current):
            times.ti_kick[b] += dti_from_timebin(b) // 2
    for b in range(1, times.mintimebin):
        times.ti_kick[b] += dti_from_timebin(times.mintimebin) // 2
