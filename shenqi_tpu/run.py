"""Main simulation driver: the run()/begrun() analog (libgadget/run.cpp).

Round-1 scope: kick-drift-kick leapfrog on the integer timeline with
PM gravity (the FastPM-like minimum end-to-end slice; the tree force,
SPH and subgrid stages widen this incrementally).  The time loop is
host-side Python (it does host-side quadrature for exact factors between
steps, like the reference); each force/kick/drift is a jitted device
function over the SoA state.

Internal unit/variable conventions (Gadget):
  * velocity v_int = a^2 dx/dt  (x comoving);
  * drift:  x    += v_int * int dt/a^2  (exact_drift_factor)
  * kick:   v_int += g_comoving * int dt/a  (exact_gravkick_factor)
  * g_comoving is the comoving-coordinate gradient of the comoving
    potential, what pm_forces/tree forces return.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.particles import (ParticleData, SimState, RegionLayout,
                             float_to_ipos, POS_SCALE, DM)
from .core.timeline import Timeline, TIMEBASE
from .cosmology.background import Cosmology
from .gravity.pm import PMConfig, pm_forces, finalize_power
from .utils.constants import CM_PER_MPC


@partial(jax.jit, donate_argnums=(0,), static_argnames=("nmesh",
                                                        "want_potential"))
def _pm_force_step(particles: ParticleData, nmesh: int, boxsize: float,
                   G: float, asmth: float, want_potential: bool = False):
    """Compute PM accelerations into particles.grav_pm."""
    cfg = PMConfig(nmesh=nmesh, boxsize=boxsize, G=G, asmth=asmth)
    accel, pot, ps = pm_forces(particles.ipos, particles.mass, cfg,
                               mask=particles.mask,
                               want_potential=want_potential)
    particles = dataclasses.replace(particles, grav_pm=accel)
    if want_potential:
        particles = dataclasses.replace(particles, potential=pot)
    return particles, ps


@partial(jax.jit, donate_argnums=(0,))
def _kick(particles: ParticleData, gravkick: jax.Array,
          which: str = "pm") -> ParticleData:
    """v += a_grav * gravkick (PM and/or short-range per caller)."""
    acc = particles.grav_pm + particles.grav_accel
    vel = particles.vel + acc * gravkick
    vel = jnp.where(particles.mask[:, None], vel, particles.vel)
    return dataclasses.replace(particles, vel=vel)


@partial(jax.jit, donate_argnums=(0,))
def _drift(particles: ParticleData, driftfac: jax.Array,
           boxsize: float) -> ParticleData:
    """x += v * driftfac with exact periodic wrap via uint32 overflow."""
    dx = particles.vel * driftfac  # internal length units
    dx_fp = (dx * jnp.float32(POS_SCALE / boxsize))
    ipos = particles.ipos + dx_fp.astype(jnp.int32).astype(jnp.uint32)
    ipos = jnp.where(particles.mask[:, None], ipos, particles.ipos)
    return dataclasses.replace(particles, ipos=ipos)


@dataclass
class PMSimulation:
    """Global-timestep PM-only simulation (the FastPM-like slice)."""

    CP: Cosmology
    boxsize: float
    nmesh: int
    state: SimState
    timeline: Timeline
    ti_current: int = 0
    asmth: float = 1.5
    # measured P(k) history: list of (atime, k, P) host-side tuples
    power_history: list = dataclasses.field(default_factory=list)

    @classmethod
    def from_arrays(cls, pos, vel, mass, ids, CP, boxsize, nmesh,
                    timeline, atime):
        n = len(pos)
        ncap = ((n + 127) // 128) * 128
        # build padded arrays with numpy, convert to device once
        ipos_np = np.zeros((ncap, 3), np.uint32)
        ipos_np[:n] = float_to_ipos(pos, boxsize)
        vel_np = np.zeros((ncap, 3), np.float32)
        vel_np[:n] = vel
        mass_np = np.zeros(ncap, np.float32)
        mass_np[:n] = mass if np.ndim(mass) else np.full(n, mass)
        mask_np = np.zeros(ncap, bool)
        mask_np[:n] = True
        ids_np = np.zeros(ncap, np.uint64)
        ids_np[:n] = ids
        p = ParticleData.zeros(ncap)
        p = dataclasses.replace(
            p, ipos=jnp.asarray(ipos_np), vel=jnp.asarray(vel_np),
            mass=jnp.asarray(mass_np), mask=jnp.asarray(mask_np),
            ptype=jnp.full(ncap, DM, jnp.int8),
            id_lo=jnp.asarray((ids_np & 0xFFFFFFFF).astype(np.uint32)),
            id_hi=jnp.asarray((ids_np >> np.uint64(32)).astype(np.uint32)))
        layout = RegionLayout(offsets=np.array([0, 0, 0, 0, 0, 0]),
                              capacities=np.array([0, ncap, 0, 0, 0, 0]))
        state = SimState(particles=p, layout=layout)
        ti = timeline.ti_from_loga(np.log(atime))
        return cls(CP=CP, boxsize=boxsize, nmesh=nmesh, state=state,
                   timeline=timeline, ti_current=ti)

    # ---- factors ----
    def _gravkick(self, ti0, ti1):
        return np.float32(self.timeline.exact_gravkick_factor(
            self.CP, ti0, ti1))

    def _driftfac(self, ti0, ti1):
        return np.float32(self.timeline.exact_drift_factor(
            self.CP, ti0, ti1))

    def compute_pm_forces(self, record_power: bool = True):
        p, ps = _pm_force_step(self.state.particles, self.nmesh,
                               self.boxsize, self.CP.GravInternal,
                               self.asmth)
        self.state.particles = p
        if record_power:
            mpc = CM_PER_MPC / 3.085678e21  # kpc per Mpc (h factors cancel)
            boxsize_mpc = self.boxsize / mpc
            cfg = PMConfig(nmesh=self.nmesh, boxsize=self.boxsize,
                           G=self.CP.GravInternal)
            kk, power, nmodes = finalize_power(ps, cfg, boxsize_mpc)
            atime = self.timeline.atime_from_ti(self.ti_current)
            self.power_history.append((atime, kk, power, nmodes))

    def run_steps(self, nsteps: int, dloga_max: float = 0.05):
        """Evolve with a global timestep (PM-only KDK).

        Step loop matches the structure of the reference main loop for
        the PM part (run.cpp:331-582): force -> half kick -> drift ->
        force -> half kick.
        """
        self.compute_pm_forces()
        for _ in range(nsteps):
            ti = self.ti_current
            loga = self.timeline.loga_from_ti(ti)
            if self.timeline.find_next_sync_point(ti) is None:
                break
            dti = self.timeline.dti_from_dloga(dloga_max, ti)
            # clamp to next sync point
            dti = min(dti, self.timeline.find_next_ti_sync(ti) - ti)
            ti_half = ti + dti // 2
            ti_next = ti + dti
            # half kick
            self.state.particles = _kick(
                self.state.particles, self._gravkick(ti, ti_half))
            # full drift
            self.state.particles = _drift(
                self.state.particles, self._driftfac(ti, ti_next),
                self.boxsize)
            self.ti_current = ti_next
            # force at new positions
            self.compute_pm_forces()
            # second half kick
            self.state.particles = _kick(
                self.state.particles, self._gravkick(ti_half, ti_next))
        return self

    def atime(self) -> float:
        return self.timeline.atime_from_ti(self.ti_current)
