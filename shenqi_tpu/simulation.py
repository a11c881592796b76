"""Full simulation driver: TreePM + individual timesteps (run.cpp analog).

Implements the reference main loop protocol (run.cpp:331-822) for
DM-only TreePM in this round; gas hooks (density/hydro/cooling) land on
the same skeleton:

  loop:
    ti_next = min active-bin kick time (clamped to PM step end)
    drift ALL particles to ti_next
    active set from timebins
    [forces: density/hydro for gas; PM on PM steps; tree for active]
    apply_half_kick       (completes the previous half step)
    update_kick_times
    [PM step] apply_PM_half_kick  (completes the previous PM half)
    [outputs at sync points]
    find_timesteps -> new bins, new PM length
    apply_half_kick       (starts the new half step)
    [PM step] apply_PM_half_kick  (starts the new PM half)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.particles import (ParticleData, SimState, RegionLayout,
                             float_to_ipos, POS_SCALE, DM, GAS)
from .core.timeline import Timeline, TIMEBASE, TIMEBINS, dti_from_timebin, \
    round_down_power_of_two
from .core.integrate import (DriftKickTimes, TimestepParams,
                             active_bins_mask, find_next_kick,
                             gravity_dloga, long_range_dloga,
                             assign_timebins, gravkick_tables,
                             update_kick_times, kick_pm,
                             is_timebin_active)
from .cosmology.background import Cosmology
from .gravity.treepm import (GravityConfig, get_window_tables,
                             default_softening)
from .gravity.pm import PMConfig, pm_forces, finalize_power
from .gravity.shortrange import treegrav_targets
from .ops.tree import build_octree
from .utils.constants import CM_PER_MPC


@jax.jit    # NOTE: deliberately NOT donated — see density subset note
def _drift(ipos, vel, alive, driftfac, pos_scale_over_box):
    dx = vel * driftfac * pos_scale_over_box
    newpos = ipos + dx.astype(jnp.int32).astype(jnp.uint32)
    return jnp.where(alive[:, None], newpos, ipos)


@partial(jax.jit, donate_argnums=(0,))
def _kick_tree(vel, accel_tree, timebin, gravkick_table, alive):
    fac = gravkick_table[timebin.astype(jnp.int32)]
    fac = jnp.where(alive, fac, 0.0)
    return vel + accel_tree * fac[:, None]


@dataclass
class Simulation:
    CP: Cosmology
    boxsize: float
    timeline: Timeline
    times: DriftKickTimes
    gravity: GravityConfig
    tsp: TimestepParams
    particles: ParticleData
    fast_particle_type: int = 2
    step_count: int = 0
    power_history: list = field(default_factory=list)
    snapshots: list = field(default_factory=list)
    window_tables: object = None
    hierarchical: bool = False   # Gadget-4 split gravity timesteps
    _accel_tree: jax.Array = None
    on_snapshot: object = None   # callback(sim, atime)
    on_step: object = None       # callback(sim) at end of each step
    # callback(sim) on PM steps (not the first): the reference hangs
    # FOF-cadence physics here — BH seeding searches, HeIII bubbles,
    # excursion-set UVBG (run.cpp:637-660)
    on_pm_step: object = None
    # optional utils.walltime.Walltime: stage boundaries in run() are
    # charged to reference timer names (PMgrav/Tree/SPH/...)
    walltime: object = None

    def _wt(self, name: str):
        if self.walltime is not None:
            self.walltime.measure(name)
    on_drift: object = None      # callback(sim, a0, a1) after drifts
    gas: object = None           # GasState (simulation_gas.py)
    gas_physics: object = None   # GasPhysics
    # human control interface (utils.hci.HCI): polled on PM steps like
    # the reference (run.cpp:408, hci.cpp:131-198).  `stop`/
    # `checkpoint`/`terminate` files in the output dir + wall-clock
    # timeout prediction.  hci_exit records why the loop ended.
    hci: object = None
    on_checkpoint: object = None  # callback(sim, atime): unplanned dump
    hci_exit: str = ""
    # RestartFlag-1 resume: the first loop iteration sits exactly on
    # the sync point the run resumed from — do not re-write it (the
    # reference resumes with SnapshotFileCount past it,
    # checkpoint.cpp find_last_snapnum)
    resumed: bool = False
    # persistent walk/tier caches: keep the device-blocked gravity's
    # static shapes monotone so steady-state steps hit the jit cache
    _tier_cache: dict = field(default_factory=dict)
    _caps_cache: dict = field(default_factory=dict)
    # rows [n_real, n) are spare capacity for spawned stars
    n_real: int = 0
    # anti-correlation random box shift (partmanager.h:79-82, applied
    # run.cpp:426-428): fraction of the box drawn each PM step; the
    # uint32 offset is EXACT so it subtracts out losslessly at output
    random_offset_frac: float = 0.0
    _offset_u32: object = None

    def _apply_random_offset(self):
        """Re-draw the internal particle offset (update_random_offset,
        partmanager.c:45-62): decorrelates tree-opening errors between
        PM steps.  Positions shift by (new - old) exactly in uint32;
        snapshot/FOF writers subtract `self._offset_u32`."""
        if not self.random_offset_frac:
            return
        rng = np.random.RandomState(
            int(self.times.ti_current) & 0x7FFFFFFF)
        rr = rng.uniform(0, 1, 3) * self.random_offset_frac
        new_u = (rr * 2 ** 32).astype(np.int64).astype(np.uint32)
        old_u = self._offset_u32 if self._offset_u32 is not None \
            else np.zeros(3, np.uint32)
        delta = (new_u - old_u).astype(np.uint32)
        self.particles = dataclasses.replace(
            self.particles,
            ipos=self.particles.ipos + jnp.asarray(delta)[None, :])
        self._offset_u32 = new_u

    def output_ipos(self):
        """Positions with the internal random shift removed
        (petaio.cpp:678 convention)."""
        if self._offset_u32 is None:
            return self.particles.ipos
        return self.particles.ipos - jnp.asarray(
            self._offset_u32.astype(np.uint32))[None, :]

    @classmethod
    def from_arrays(cls, pos, vel, mass, ids, CP, boxsize, nmesh,
                    timeline, atime, tsp: Optional[TimestepParams] = None,
                    gravity_kw: Optional[dict] = None,
                    extra_capacity: int = 0):
        n = len(pos)
        ncap = ((n + extra_capacity + 127) // 128) * 128
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
            timebin=jnp.ones(ncap, jnp.int8),
            id_lo=jnp.asarray((ids_np & 0xFFFFFFFF).astype(np.uint32)),
            id_hi=jnp.asarray((ids_np >> np.uint64(32)).astype(np.uint32)))
        soft = default_softening(boxsize, n)
        gkw = dict(boxsize=boxsize, nmesh=nmesh, G=CP.GravInternal,
                   softening=soft,
                   tree_nlevels=min(20, max(6, int(np.ceil(
                       np.log(max(n, 8) / 16) / np.log(8))) + 3)),
                   tree_ncrit=32)
        if gravity_kw:
            gkw.update(gravity_kw)
        gravity = GravityConfig(**gkw)
        ti = timeline.ti_from_loga(np.log(atime))
        sim = cls(CP=CP, boxsize=boxsize, timeline=timeline,
                  times=DriftKickTimes.init(ti), gravity=gravity,
                  tsp=tsp or TimestepParams(), particles=p)
        sim.n_real = n
        return sim

    @classmethod
    def from_species(cls, species, CP, boxsize, nmesh, timeline, atime,
                     tsp=None, gravity_kw=None, gas_u0=None,
                     gas_physics=None, star_headroom: int = 0):
        """Build a simulation from per-type particle sets.

        species: list of (ptype, pos, vel, mass, ids); gas (type 0)
        rows are placed first so gas fields align to the array prefix.
        gas_u0: initial specific internal energy for gas (internal
        units); converted to entropy after the first density pass.
        """
        species = sorted(species, key=lambda s: s[0])
        pos = np.concatenate([s[1] for s in species])
        vel = np.concatenate([s[2] for s in species])
        mass = np.concatenate([
            np.full(len(s[1]), s[3]) if np.ndim(s[3]) == 0 else s[3]
            for s in species])
        ids = np.concatenate([s[4] for s in species])
        ptypes = np.concatenate([
            np.full(len(s[1]), s[0], dtype=np.int8) for s in species])
        sim = cls.from_arrays(pos, vel, mass, ids, CP, boxsize, nmesh,
                              timeline, atime, tsp=tsp,
                              gravity_kw=gravity_kw,
                              extra_capacity=star_headroom)
        ptype_arr = np.full(sim.particles.n, 1, dtype=np.int8)
        ptype_arr[:len(ptypes)] = ptypes
        sim.particles = dataclasses.replace(
            sim.particles, ptype=jnp.asarray(ptype_arr))
        ngas = int((ptypes == 0).sum())
        if ngas > 0:
            from .simulation_gas import GasState
            # initial hsml guess: mean gas separation
            sep = boxsize / max(ngas, 1) ** (1.0 / 3)
            hsml0 = np.array(sim.particles.hsml)
            hsml0[:ngas] = 2.0 * sep
            sim.particles = dataclasses.replace(
                sim.particles, hsml=jnp.asarray(hsml0))
            ent0 = np.full(ngas, 1.0, np.float32) if gas_u0 is None \
                else np.full(ngas, gas_u0, np.float32)
            sim.gas = GasState.create(ngas, ent0,
                                      ntot=sim.particles.n)
            sim._gas_entropy_is_u = gas_u0 is not None
            sim.gas_physics = gas_physics
        return sim

    def init_gas_entropy(self):
        """After the first density pass, convert the stored u0 into
        entropy (init.cpp uniform-temperature setup).  With
        pressure-entropy SPH the conversion is a FIXED POINT — entropy
        depends on EgyWtDensity which depends on entropy — iterated to
        1e-3 like setup_density_indep_entropy (init.cpp:403-449);
        otherwise a single A = u (g-1)/(rho a^-3)^(g-1)."""
        if self.gas is None or not getattr(self, "_gas_entropy_is_u",
                                           False):
            return
        from .utils.constants import GAMMA_MINUS1
        gp = self.gas_physics
        u0 = self.gas.entropy    # holds u until this conversion
        if gp is not None and gp.density_independent_sph:
            # u0 is uniform at init; use the (scalar) median
            u_init = float(jnp.median(u0))
            self.gas = gp.setup_density_indep_entropy(self, self.gas,
                                                      u_init)
        else:
            a3inv = 1.0 / self.atime() ** 3
            rho = jnp.maximum(self.gas.density, 1e-35) * a3inv
            ent = u0 * GAMMA_MINUS1 / rho ** GAMMA_MINUS1
            self.gas = dataclasses.replace(self.gas, entropy=ent)
        self._gas_entropy_is_u = False

    # ---------- pieces ----------
    def atime(self) -> float:
        return self.timeline.atime_from_ti(self.times.ti_current)

    def _drift_all(self, ti_next: int):
        a0 = self.atime()
        fac = self.timeline.exact_drift_factor(self.CP,
                                               self.times.ti_current,
                                               ti_next)
        self.particles = dataclasses.replace(
            self.particles,
            ipos=_drift(self.particles.ipos, self.particles.vel,
                        self.particles.mask, jnp.float32(fac),
                        jnp.float32(POS_SCALE / self.boxsize)))
        if self.gas is not None:
            # predict smoothing lengths through the drift
            # (drift.cpp:55-66, Gadget-4 style: Hsml += DtHsml*ddrift,
            # capped) — without this the density bisection restarts
            # from stale radii and needs ~10 extra walks per step
            ng = self.gas.ngas
            p = self.particles
            h0 = p.hsml[:ng]
            h1 = h0 + self.gas.dt_hsml * jnp.float32(fac)
            h1 = jnp.clip(h1, 0.5 * h0, 2.0 * h0)
            is_gas = (p.ptype[:ng] == 0) & p.mask[:ng]
            self.particles = dataclasses.replace(
                p, hsml=p.hsml.at[:ng].set(
                    jnp.where(is_gas & (h0 > 0), h1, h0)))
        if self.on_drift is not None:
            self.on_drift(self, a0,
                          self.timeline.atime_from_ti(ti_next))
        self.times.ti_current = ti_next
        for b in range(TIMEBINS + 1):
            if is_timebin_active(b, ti_next):
                self.times.ti_lastactivedrift[b] = ti_next

    def _compute_pm(self, record_power=True):
        p = self.particles
        nu_factor = None
        nt = getattr(self, "nu_table", None)
        if nt is not None:
            # neutrino linear response (compute_neutrino_power,
            # gravpm.cpp:308): measure the CDM power, advance the
            # delta_nu integral, fold 1 + f_nu*delta_nu/delta_cdm
            # into the potential for THIS solve
            from .gravity.pm import measure_cdm_power
            cfg = self.gravity.pm()
            psc = measure_cdm_power(p.ipos, p.mass, cfg, mask=p.mask)
            kk = np.asarray(psc.k, np.float64) * (2 * np.pi
                                                  / self.boxsize)
            pw = np.asarray(psc.power, np.float64)
            nm = np.asarray(psc.nmodes, np.float64)
            sel = nm > 0
            delta_meas = np.sqrt(pw[sel] / nm[sel]
                                 / max(float(psc.norm), 1e-300))
            delta_cdm = np.interp(nt.wavenum, kk[sel], delta_meas)
            atime = self.atime()
            nt.update(atime, delta_cdm)
            fac1d = nt.potential_factor(atime, delta_cdm)
            # per-mode multiplier mesh from |k|
            n = cfg.nmesh
            kx = np.fft.fftfreq(n, 1.0 / n)[:, None, None]
            ky = np.fft.fftfreq(n, 1.0 / n)[None, :, None]
            kz = np.arange(n // 2 + 1)[None, None, :]
            kmag = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2) \
                * (2 * np.pi / self.boxsize)
            nu3d = np.interp(kmag.ravel(), nt.wavenum, fac1d,
                             left=fac1d[0], right=fac1d[-1])
            nu3d = nu3d.reshape(kmag.shape)
            # DC mode: no response factor at k=0; instead the P(k)
            # Norm (= |rho_k(0)|^2) carries (Mtot/Mcdm)^2
            # (gravpm.cpp:412,431) — scaling the DC amplitude by
            # Mtot/Mcdm achieves exactly that (forces see fac=0 at
            # k=0 anyway)
            nu3d[0, 0, 0] = self.CP.Omega0 / (
                self.CP.Omega0
                - atime ** 3 * self.CP.ONu.get_omega_nu_nopart(atime))
            nu_factor = jnp.asarray(nu3d.astype(np.float32))
        accel, pot, ps = pm_forces(p.ipos, p.mass, self.gravity.pm(),
                                   mask=p.mask, nu_factor=nu_factor)
        self.particles = dataclasses.replace(p, grav_pm=accel,
                                             potential=pot)
        if record_power:
            mpc = CM_PER_MPC / 3.085678e21
            kk, power, nmodes = finalize_power(
                ps, self.gravity.pm(), self.boxsize / mpc)
            self.power_history.append((self.atime(), kk, power, nmodes))

    def _compute_tree(self, first_step: bool):
        p = self.particles
        if self.window_tables is None and \
                self.gravity.window_type == "exact":
            self.window_tables = get_window_tables(self.gravity)
        sp = self.gravity.short(use_bh=1 if first_step else None)
        if self.gravity.engine == "stencil":
            # grid-stencil direct P3M: exact inside rcut, no octree,
            # no oldacc dependence (MAC-free) — first_step needs no
            # BH-opening special case.  Steady state takes the fused
            # single-dispatch path (no mid-step host sync); an
            # on-device ok flag triggers the cap-regrowing slow path
            # on overflow (optimistic execution, stencil.py).
            #
            # ACTIVE-set targets (run.cpp:488 ActiveParticles /
            # treewalk_run over act): only active-bin particles kick
            # this step, so only they need fresh short-range
            # accelerations; inactive rows keep their last-sync
            # value exactly like the reference.  Sources are always
            # ALL particles (full mass).  Deep-timebin phases (a few
            # hundred active of 500k) drop from a full 525k-target
            # eval (~1.7 s) to a compacted pow2 bucket (~0.1-0.3 s)
            # — the difference between finishing star-small and not.
            from .gravity.stencil import stencilgrav, stencilgrav_fused
            mass = jnp.where(p.mask, p.mass, 0.0)
            active = None
            n_act = None
            import os as _os
            if not first_step and _os.environ.get(
                    "SHENQI_ACTIVE_GRAV", "1") != "0":
                act_np = np.asarray(self._active_mask())
                n_all = int(np.asarray(p.mask).sum())
                n_act = int(act_np.sum())
                if n_act < n_all // 2:
                    active = jnp.asarray(act_np)
            if active is None:
                acc, pot, ok = stencilgrav_fused(
                    p.ipos, mass, sp, self.window_tables,
                    sub=self.gravity.refine_sub,
                    tier_cache=self._tier_cache,
                    caps_cache=self._caps_cache, want_pot=False)
                if not bool(ok):
                    acc, pot, _ = stencilgrav(
                        p.ipos, mass, sp, self.window_tables,
                        sub=self.gravity.refine_sub,
                        tier_cache=self._tier_cache,
                        caps_cache=self._caps_cache, want_pot=False)
            else:
                acc, _, ok = stencilgrav_fused(
                    p.ipos, mass, sp, self.window_tables,
                    n_targets=max(n_act, 1),
                    sub=self.gravity.refine_sub, active=active,
                    tier_cache=self._tier_cache,
                    caps_cache=self._caps_cache, want_pot=False)
                if not bool(ok):
                    acc, _, _ = stencilgrav(
                        p.ipos, mass, sp, self.window_tables,
                        n_targets=max(n_act, 1),
                        sub=self.gravity.refine_sub, active=active,
                        tier_cache=self._tier_cache,
                        caps_cache=self._caps_cache, want_pot=False)
                # inactive rows keep their stored (last-sync) accel
                acc = jnp.where(active[:, None], acc, p.grav_accel)
            self.particles = dataclasses.replace(p, grav_accel=acc)
            return
        tree = build_octree(p.ipos, p.mass, p.mask, self.boxsize,
                            nlevels=self.gravity.tree_nlevels,
                            ncrit=self.gravity.tree_ncrit)
        if self.gravity.engine == "refined":
            from .gravity.shortrange_refined import treegrav_refined
            acc, pot, _ = treegrav_refined(
                tree, p.old_acc, sp, self.window_tables,
                block=self.gravity.block, sub=self.gravity.refine_sub,
                maxi=self.gravity.maxi, maxl=self.gravity.maxl,
                ncrit=self.gravity.tree_ncrit,
                tier_cache=self._tier_cache,
                caps_cache=self._caps_cache, want_pot=False)
        elif self.gravity.engine == "blocked":
            # production path: dead rows sort to the tail (their
            # Morton key is the sentinel), so walking the first
            # n_alive sorted rows covers exactly the live set
            from .gravity.shortrange_blocked import treegrav_blocked
            acc, pot, _ = treegrav_blocked(
                tree, p.old_acc, sp, self.window_tables,
                block=self.gravity.block,
                maxi=self.gravity.maxi, maxl=self.gravity.maxl,
                ncrit=self.gravity.tree_ncrit, blocking="device",
                tier_cache=self._tier_cache,
                caps_cache=self._caps_cache, want_pot=False)
        else:
            acc, pot, _ = treegrav_targets(tree, p.ipos, p.old_acc,
                                           sp, self.window_tables)
        self.particles = dataclasses.replace(p, grav_accel=acc)

    # ---------- hierarchical (split) gravity, Gadget-4 scheme ----------
    def _largest_active_bin(self) -> int:
        times = self.times
        for b in range(TIMEBINS, -1, -1):
            if is_timebin_active(b, times.ti_current) and \
                    dti_from_timebin(b) <= max(times.pm_length, 1):
                return b
        return TIMEBINS

    def _active_source_accel(self, sel, n_act: int = None):
        """Tree gravity with ONLY the selected particles as sources
        (force_tree_active_moments semantics: at each level both the
        sources and the kicked targets are the active set, which is
        what makes the scheme momentum-conserving).

        sel: host bool mask [N]; n_act its popcount (host int, avoids
        a device sync — the walk size is bucketed to a power of two
        so distinct counts don't recompile)."""
        p = self.particles
        selj = jnp.asarray(sel)
        mass = jnp.where(selj, p.mass, 0.0)
        if self.window_tables is None and \
                self.gravity.window_type == "exact":
            self.window_tables = get_window_tables(self.gravity)
        sp = self.gravity.short()
        if self.gravity.engine == "stencil":
            # active-source stencil force: sources = selected (masked
            # mass), targets compacted to the active set; fused
            # single-dispatch steady state with slow-path redo on
            # cap overflow (same protocol as _compute_tree)
            from .gravity.stencil import stencilgrav, stencilgrav_fused
            if n_act is None:
                n_act = int(np.asarray(sel).sum())
            acc, _, ok = stencilgrav_fused(
                p.ipos, mass, sp, self.window_tables,
                n_targets=max(n_act, 1), sub=self.gravity.refine_sub,
                active=selj, tier_cache=self._tier_cache,
                caps_cache=self._caps_cache, want_pot=False)
            if not bool(ok):
                acc, _, _ = stencilgrav(
                    p.ipos, mass, sp, self.window_tables,
                    n_targets=max(n_act, 1),
                    sub=self.gravity.refine_sub,
                    active=selj, tier_cache=self._tier_cache,
                    caps_cache=self._caps_cache, want_pot=False)
            return acc
        tree = build_octree(p.ipos, mass, selj & p.mask, self.boxsize,
                            nlevels=self.gravity.tree_nlevels,
                            ncrit=self.gravity.tree_ncrit)
        if self.gravity.engine == "refined":
            from .gravity.shortrange_refined import treegrav_refined
            if n_act is None:
                n_act = int(np.asarray(sel).sum())
            acc, _, _ = treegrav_refined(
                tree, p.old_acc, sp, self.window_tables,
                n_targets=max(n_act, 1), block=self.gravity.block,
                sub=self.gravity.refine_sub,
                maxi=self.gravity.maxi, maxl=self.gravity.maxl,
                ncrit=self.gravity.tree_ncrit,
                active=selj, tier_cache=self._tier_cache,
                caps_cache=self._caps_cache, want_pot=False)
        elif self.gravity.engine == "blocked":
            from .gravity.shortrange_blocked import treegrav_blocked
            if n_act is None:
                n_act = int(np.asarray(sel).sum())
            acc, _, _ = treegrav_blocked(
                tree, p.old_acc, sp, self.window_tables,
                n_targets=max(n_act, 1), block=self.gravity.block,
                maxi=self.gravity.maxi, maxl=self.gravity.maxl,
                ncrit=self.gravity.tree_ncrit, blocking="device",
                active=selj, tier_cache=self._tier_cache,
                caps_cache=self._caps_cache, want_pot=False)
        else:
            acc, _, _ = treegrav_targets(tree, p.ipos, p.old_acc, sp,
                                         self.window_tables)
        return acc

    def _hier_grav_kick(self, sel, accel, ti: int, largest: int):
        """Half-step forward for bin ti, half-step back for ti+1
        (apply_hierarchical_grav_kick, timestep.cpp:247-289)."""
        times = self.times
        dti = dti_from_timebin(ti)
        gk = self.timeline.exact_gravkick_factor(
            self.CP, times.ti_kick[ti], times.ti_kick[ti] + dti // 2)
        if ti < largest:
            lower = dti_from_timebin(ti + 1)
            gk -= self.timeline.exact_gravkick_factor(
                self.CP, times.ti_kick[ti + 1],
                times.ti_kick[ti + 1] + lower // 2)
        p = self.particles
        fac = jnp.where(jnp.asarray(sel) & p.mask, jnp.float32(gk), 0.0)
        self.particles = dataclasses.replace(
            p, vel=p.vel + accel * fac[:, None])

    def _hier_second_half(self):
        """Closing gravity kicks with per-level active-source trees
        (hierarchical_gravity_accelerations, timestep.cpp:483-566)."""
        largest = self._largest_active_bin()
        active = np.asarray(self._active_mask())
        tb = np.asarray(self.particles.timebin)
        accel = None
        last_count = -1
        for ti in range(largest, max(self.times.mintimebin, 1) - 1,
                        -1):
            sel = active & (tb <= ti)
            cnt = int(sel.sum())
            if cnt == 0:
                break
            if cnt != last_count:
                accel = self._active_source_accel(sel, cnt)
                last_count = cnt
            self._hier_grav_kick(sel, accel, ti, largest)
            if ti == largest:
                # the top-level (all-active) force is the stored one
                # used for tree opening + timesteps next step
                self.particles = dataclasses.replace(
                    self.particles, grav_accel=accel)

    def _hier_first_half(self, first_step: bool) -> int:
        """Assign gravity timebins and do the opening kicks
        (hierarchical_gravity_and_timesteps, timestep.cpp:307-480).
        Returns the count of bad timesteps.

        This round uses a single per-particle timebin (gravity and
        hydro share it; the hydro Courant limit is folded in via min),
        rather than the reference's fully split TimeBinGravity /
        TimeBinHydro pair."""
        times = self.times
        is_pm = times.is_pm()
        p = self.particles
        atime = self.atime()
        if is_pm:
            asmth_internal = (self.gravity.asmth * self.boxsize
                              / self.gravity.nmesh)
            dloga_pm = long_range_dloga(
                p.vel, p.mass, p.ptype, np.asarray(p.mask), atime,
                self.CP, self.boxsize, asmth_internal, self.tsp)
            dti = round_down_power_of_two(
                self.timeline.dti_from_dloga(dloga_pm,
                                             times.ti_current))
            dti_max = (self.timeline.find_next_ti_sync(times.ti_current)
                       - times.pm_kick)
            times.pm_length = min(dti, dti_max)
            times.pm_start = times.pm_kick

        largest = self._largest_active_bin()
        hubble = float(self.CP.hubble_function(atime))
        accel_tot = p.grav_accel + p.grav_pm
        dloga = gravity_dloga(accel_tot, atime, hubble,
                              self.gravity.softening,
                              self.tsp.ErrTolIntAccuracy)
        if self.gas is not None:
            from .core.integrate import hydro_dloga
            ng = self.gas.ngas
            dl_h = hydro_dloga(p.hsml[:ng], self.gas.max_signal_vel,
                               self.gas.dt_hsml, atime, hubble,
                               self.tsp.CourantFac)
            is_gas = (p.ptype == 0)[:ng]
            dloga = dloga.at[:ng].set(
                jnp.where(is_gas, jnp.minimum(dloga[:ng], dl_h),
                          dloga[:ng]))
        oldacc = jnp.linalg.norm(accel_tot, axis=-1) / self.gravity.G
        self.particles = dataclasses.replace(self.particles,
                                             old_acc=oldacc)

        active = np.asarray(self._active_mask())
        if first_step:
            active = np.asarray(p.mask)
        newbins, bad = assign_timebins(
            np.asarray(dloga), np.asarray(p.timebin),
            active & np.asarray(p.mask), times, self.timeline,
            self.tsp.MinSizeTimestep)
        newbins = np.minimum(newbins, largest)

        # push-down: on PM steps, collapse a sparse top bin into the
        # one below so the top-level force need not be recomputed
        if is_pm:
            counts = np.bincount(
                newbins[active & np.asarray(p.mask)],
                minlength=TIMEBINS + 2)
            push_down = largest
            for ti in range(largest, 0, -1):
                if counts[ti] // 3 <= counts[ti - 1]:
                    push_down = ti - 1
                    counts[ti - 1] += counts[ti]
                else:
                    break
            if push_down != largest and push_down >= 1:
                newbins = np.minimum(newbins, push_down)
                largest = push_down
        self.particles = dataclasses.replace(
            self.particles,
            timebin=jnp.asarray(newbins.astype(np.int8)))
        occupied = newbins[np.asarray(p.mask)]
        if occupied.size:
            times.mintimebin = int(occupied.min())
            times.maxtimebin = int(occupied.max())
        if is_pm and times.pm_length < dti_from_timebin(
                times.maxtimebin):
            times.pm_length = dti_from_timebin(times.maxtimebin)

        # opening kicks: top bin uses the stored (full/active) accel
        tb = newbins
        mask_h = np.asarray(self.particles.mask)
        sel = active & mask_h & (tb <= largest)
        if sel.any():
            self._hier_grav_kick(sel, self.particles.grav_accel,
                                 largest, largest)
        accel = None
        last_count = -1
        for ti in range(largest - 1, 0, -1):
            sel = active & mask_h & (tb <= ti)
            cnt = int(sel.sum())
            if cnt == 0:
                times.mintimebin = max(times.mintimebin, ti + 1)
                break
            if cnt != last_count:
                accel = self._active_source_accel(sel, cnt)
                last_count = cnt
            self._hier_grav_kick(sel, accel, ti, largest)
        return bad

    def _apply_half_kick(self, skip_grav: bool = False):
        gk, hk, dte = gravkick_tables(self.CP, self.timeline, self.times)
        p = self.particles
        if skip_grav:
            vel = p.vel
        else:
            vel = _kick_tree(p.vel, p.grav_accel, p.timebin, gk, p.mask)
        # hydro kick for gas rows (do_hydro_kick analog)
        if self.gas is not None:
            ng = self.gas.ngas
            is_gas = (p.mask & (p.ptype == 0))[:ng]
            bins = p.timebin[:ng].astype(jnp.int32)
            hkf = jnp.where(is_gas, hk[bins], 0.0)
            dtef = jnp.where(is_gas, dte[bins], 0.0)
            vel = vel.at[:ng].add(self.gas.hydro_accel
                                  * hkf[:, None])
            # hard gas velocity cap (do_hydro_kick,
            # timestep.cpp:988-998 MaxGasVel): rarely hit, but
            # uncapped it lets a single sick pair run away
            atime = self.atime()
            vv = jnp.linalg.norm(vel[:ng], axis=-1)
            over = is_gas & (vv / atime > self.tsp.MaxGasVel) \
                & (vv > 0)
            scale = jnp.where(over, self.tsp.MaxGasVel * atime
                              / jnp.maximum(vv, 1e-35), 1.0)
            vel = vel.at[:ng].multiply(scale[:, None])
            ent = self.gas.entropy + dtef * self.gas.dt_entropy
            self.gas = dataclasses.replace(self.gas, entropy=ent)
        self.particles = dataclasses.replace(p, vel=vel)

    def _apply_pm_half_kick(self):
        t0 = self.times.pm_kick
        t1 = t0 + self.times.pm_length // 2
        fac = self.timeline.exact_gravkick_factor(self.CP, t0, t1)
        p = self.particles
        vel = kick_pm(p.vel, p.grav_pm, p.mask, jnp.float32(fac))
        self.particles = dataclasses.replace(p, vel=vel)
        self.times.pm_kick = t1

    def _find_timesteps(self, first_step: bool):
        times = self.times
        is_pm = times.is_pm()
        p = self.particles
        atime = self.atime()
        if is_pm:
            asmth_internal = (self.gravity.asmth * self.boxsize
                              / self.gravity.nmesh)
            dloga_pm = long_range_dloga(
                p.vel, p.mass, p.ptype, np.asarray(p.mask), atime,
                self.CP, self.boxsize, asmth_internal, self.tsp)
            dti = self.timeline.dti_from_dloga(dloga_pm,
                                               times.ti_current)
            dti = round_down_power_of_two(dti)
            dti_max = (self.timeline.find_next_ti_sync(times.ti_current)
                       - times.pm_kick)
            times.pm_length = min(dti, dti_max)
            times.pm_start = times.pm_kick

        hubble = float(self.CP.hubble_function(atime))
        accel_tot = self.particles.grav_accel + self.particles.grav_pm
        dloga = gravity_dloga(accel_tot, atime, hubble,
                              self.gravity.softening,
                              self.tsp.ErrTolIntAccuracy)
        if self.gas is not None:
            from .core.integrate import hydro_dloga
            ng = self.gas.ngas
            dl_h = hydro_dloga(self.particles.hsml[:ng],
                               self.gas.max_signal_vel,
                               self.gas.dt_hsml, atime, hubble,
                               self.tsp.CourantFac)
            is_gas = (self.particles.ptype == 0)[:ng]
            dloga = dloga.at[:ng].set(
                jnp.where(is_gas, jnp.minimum(dloga[:ng], dl_h),
                          dloga[:ng]))
        # store old_acc for next tree opening criterion
        oldacc = jnp.linalg.norm(accel_tot, axis=-1) / self.gravity.G
        self.particles = dataclasses.replace(self.particles,
                                             old_acc=oldacc)
        active = np.asarray(self._active_mask())
        if first_step:
            active = np.asarray(self.particles.mask)
        newbins, bad = assign_timebins(
            np.asarray(dloga), np.asarray(self.particles.timebin),
            active & np.asarray(self.particles.mask), times,
            self.timeline, self.tsp.MinSizeTimestep)
        self.particles = dataclasses.replace(
            self.particles, timebin=jnp.asarray(newbins.astype(np.int8)))
        occupied = newbins[np.asarray(self.particles.mask)]
        if occupied.size:
            times.mintimebin = int(occupied.min())
            times.maxtimebin = int(occupied.max())
        # PM length never below the largest occupied bin
        if is_pm and times.pm_length < dti_from_timebin(
                times.maxtimebin):
            times.pm_length = dti_from_timebin(times.maxtimebin)
        return bad

    def _active_mask(self):
        bins_active = active_bins_mask(self.times.ti_current)
        tb = np.asarray(self.particles.timebin)
        return jnp.asarray(bins_active[tb] & np.asarray(
            self.particles.mask))

    # ---------- the main loop ----------
    def _trace_ids(self, tag: str):
        """Diagnostic per-step trace of named particle IDs
        (SHENQI_TRACE_IDS=441802,441738): prints timebin, velocity,
        entropy, viscous heating rate, signal velocity, density —
        the runaway-pair forensics channel.  Off unless the env var
        is set; one host gather per step when on."""
        import os
        spec = os.environ.get("SHENQI_TRACE_IDS")
        if not spec or self.gas is None:
            return
        want = [int(x) for x in spec.split(",") if x]
        p = self.particles
        ids = (np.asarray(p.id_hi).astype(np.uint64) << np.uint64(32)
               | np.asarray(p.id_lo).astype(np.uint64))
        g = self.gas
        ng = g.ngas
        ent = np.asarray(g.entropy)
        dts = np.asarray(g.dt_entropy)
        mvs = np.asarray(g.max_signal_vel)
        rho = np.asarray(g.density)
        sfr = np.asarray(g.sfr) if hasattr(g, "sfr") else None
        vel = np.asarray(p.vel)
        tb = np.asarray(p.timebin)
        hs = np.asarray(p.hsml)
        rows = []
        for w in want:
            hit = np.nonzero(ids[:ng] == np.uint64(w))[0]
            if len(hit):
                rows.append((w, int(hit[0])))
        # always include the current worst-entropy gas row
        alive_g = np.asarray(p.mask[:ng]) & (np.asarray(p.ptype[:ng])
                                             == 0)
        if alive_g.any():
            iw = int(np.argmax(np.where(alive_g, ent[:ng], -np.inf)))
            if all(r != iw for _, r in rows):
                rows.append((int(ids[iw]), iw))
        a = self.atime()
        for w, r in rows:
            print(f"[trace {tag} step={self.step_count} a={a:.6f}] "
                  f"id={w} row={r} tbin={int(tb[r])} "
                  f"|v|={np.linalg.norm(vel[r]):.4g} ent={ent[r]:.5g} "
                  f"dts={dts[r]:.4g} mvsig={mvs[r]:.4g} "
                  f"rho={rho[r]:.4g} h={hs[r]:.4g}"
                  + (f" sfr={sfr[r]:.3g}" if sfr is not None else ""),
                  flush=True)
        dump_step = os.environ.get("SHENQI_TRACE_DUMP_STEP")
        if dump_step and tag == "post-sph" and self.step_count in [
                int(x) for x in dump_step.split(",") if x]:
            out = {"ids": ids[:ng], "ipos": np.asarray(p.ipos[:ng]),
                   "vel": vel[:ng], "mass": np.asarray(p.mass[:ng]),
                   "ptype": np.asarray(p.ptype[:ng]),
                   "mask": np.asarray(p.mask[:ng]),
                   "tbin": tb[:ng], "hsml": hs[:ng],
                   "entropy": ent, "dt_entropy": dts,
                   "max_signal_vel": mvs, "density": rho,
                   "egywt": np.asarray(g.egy_wt_density),
                   "dhsml_egy": np.asarray(g.dhsml_egy),
                   "divv": np.asarray(g.div_vel),
                   "curlv": np.asarray(g.curl_vel),
                   "hacc": np.asarray(g.hydro_accel),
                   "gacc": np.asarray(p.grav_accel[:ng]),
                   "gpm": np.asarray(p.grav_pm[:ng]),
                   "pvel": np.asarray(p.vel[:ng]),
                   "atime": a, "boxsize": self.boxsize,
                   "ti": self.times.ti_current,
                   "ti_kick": np.asarray(self.times.ti_kick),
                   "pm_kick": self.times.pm_kick,
                   "pm_start": self.times.pm_start,
                   "pm_length": self.times.pm_length,
                   "mintimebin": self.times.mintimebin,
                   "sfr_all": np.asarray(g.sfr),
                   "ne": np.asarray(g.ne),
                   "dt_hsml": np.asarray(g.dt_hsml),
                   "delay_time": np.asarray(g.delay_time)}
            ddir = os.environ.get("SHENQI_TRACE_DUMP_DIR", "/tmp")
            fn = os.path.join(
                ddir, f"trace_dump_step{self.step_count}.npz")
            np.savez(fn, **out)
            print(f"[trace dump] wrote {fn}", flush=True)

    def run(self, max_steps: int = 10 ** 9):
        """Evolve until the last sync point (or max_steps).  The KDK
        stage ORDER lives in ONE place for both run loops
        (core/step_protocol.run_protocol, the run.cpp:331-822
        analog); this class provides the stage implementations via
        the proto_* adapters below."""
        from .core.step_protocol import run_protocol
        return run_protocol(self, max_steps)

    # ---------- step-protocol adapters (core/step_protocol) -------
    def proto_drift(self, ti_next):
        self._drift_all(ti_next)

    def proto_forces(self, is_pm, first):
        """Gas first (density w/ adaptive hsml + hydro,
        run.cpp:482-505), then gravity."""
        if is_pm:
            # reference redraws the box shift at each full domain
            # decomposition, i.e. every PM step (run.cpp:426-428)
            self._apply_random_offset()
        if self.gas is not None and self.gas_physics is not None:
            # density/hydro queue ONLY the active-bin gas
            # (run.cpp:488-505 ActiveParticles); first step and
            # PM-sync steps naturally activate everyone
            import os as _os
            all_sph = _os.environ.get("SHENQI_ACTIVE_SPH",
                                      "1") == "0"
            act = None if (first or all_sph) else np.asarray(
                self._active_mask())
            self.gas = self.gas_physics.density_hydro(
                self, self.gas, active=act)
            if getattr(self, "_gas_entropy_is_u", False):
                # first pass: convert initial u to entropy and
                # recompute the pressure-dependent parts next step
                self.init_gas_entropy()
            self._wt("SPH")
        if is_pm:
            self._compute_pm()
            self._wt("PMgrav")
        if self.hierarchical:
            if first:
                self._compute_tree(first_step=True)
            else:
                # per-level active-source closing kicks
                self._hier_second_half()
        else:
            self._compute_tree(first_step=first)
        self._wt("Tree")

    def proto_sources(self, is_pm, first):
        """Strang-split sources (cooling/SFR/winds/BH/metal return,
        run.cpp:604-681)."""
        if self.gas is None or self.gas_physics is None or first:
            return
        times = self.times
        if is_pm:
            # sigma-based winds refresh vdisp once per PM step
            # (run.cpp:662-663)
            self.gas = self.gas_physics.update_vdisp(self, self.gas)
            # excursion-set J21 recomputed at PM cadence when halo
            # masses are available (uvbg.cpp via gravpm)
            hm = getattr(self, "halo_mass", None)
            if hm is not None and getattr(
                    self.gas_physics, "excursion", None):
                self.gas = self.gas_physics.excursion_step(
                    self, self.gas, hm)
        # Reference semantics: sources act on ACTIVE rows with their
        # OWN bin's dloga (sfr_eff.cpp cooling_and_starformation:
        # get_dloga_for_bin(TimeBinHydro)).  Using the global min-bin
        # dloga for everyone under-applies the eEOS relaxation
        # exp(-dtime/trelax) by dti(bin)/dti(minbin) — with trelax <<
        # dtime_bin the thermostat that pins viscously shock-heated
        # SF gas back to the effective EOS never engages, and a
        # heated pair runs away (star-small a=0.111 fireball).
        hubble = float(self.CP.hubble_function(self.atime()))
        dt_tab = np.array(
            [self.timeline.get_dloga_for_bin(
                b, times.ti_current) / hubble
             for b in range(TIMEBINS + 1)], np.float32)
        dt_tab *= active_bins_mask(times.ti_current)
        ngg = self.gas.ngas
        sbins = jnp.clip(
            self.particles.timebin[:ngg].astype(jnp.int32),
            1, TIMEBINS)
        dtime = jnp.asarray(dt_tab)[sbins]
        self.gas, nstars = self.gas_physics.source_terms(
            self, self.gas, dtime)
        self._wt("Cooling")
        # black holes: accretion/feedback/swallow/mergers
        self.gas = self.gas_physics.blackhole_step(
            self, self.gas, dtime)
        self._wt("BH")
        # stellar mass + metal return (metal_return.cpp)
        self.gas = self.gas_physics.metal_return(self, self.gas)
        self._wt("MetalReturn")

    def proto_snapshot(self, atime):
        # reclaim dead rows before writing (run.cpp:704 runs
        # slots_gc ahead of the snapshot)
        if self.gas is not None and self.gas_physics is not None:
            self.gas_physics.slots_gc(self, self.gas)
        if self.on_snapshot:
            self.on_snapshot(self, atime)

    def proto_checkpoint(self, cb, atime):
        if self.gas is not None and self.gas_physics is not None:
            self.gas_physics.slots_gc(self, self.gas)
        cb(self, atime)

    def proto_pre_timestep(self):
        self._trace_ids("post-sph")

    def proto_bad_timestep(self, bad):
        self._trace_ids("bad-step")
        # emergency dump before aborting (run.cpp:794-797:
        # dump_snapshot("TIMESTEP-DUMP") then endrun)
        if getattr(self, "on_bad_timestep", None):
            self.on_bad_timestep(self)
        raise RuntimeError(f"{bad} bad timesteps at step "
                           f"{self.step_count}")
