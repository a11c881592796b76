"""Multi-chip slab-domain simulation loop: the distributed main loop.

This is the product layer that composes the round-2/3 distributed
library (domain exchange, slab PM + pencil FFT, locally-essential-tree
refined gravity, slab FOF, sharded snapshot IO) into the reference's
main-loop protocol (run.cpp:331-822) over a 1-D jax.sharding.Mesh —
so reference examples (dm-small) actually RUN multi-chip from the CLI.

Scope: TreePM collisionless physics with the full individual-timebin
KDK integrator — the same non-hierarchical protocol as
simulation.Simulation.run — plus distributed ADIABATIC SPH when gas
species are present (from_species): density/hydro via the ghost-halo
slab passes (parallel/sph_slab.py), pressure-entropy init fixed
point, hydro kicks and Courant timesteps.  Subgrid sources
(cooling/SFR/winds/BH) stay single-device for now.

Design:
  * Particle state is a dict of [D*C] arrays sharded over axis 'dp';
    device d owns rows [d*C, (d+1)*C): its x-slab's particles plus
    dead (mass=0) padding (domain.distribute_slabs layout).  Slab
    ownership is restored by a bucketed all_to_all exchange EVERY
    force step (domain.exchange; the reference runs
    domain_decompose_full/maintain at the same cadence,
    run.cpp:434-451), so the rcut-halo ghost exchange inside the
    gravity program is always sufficient.
  * One jitted shard_map "force program" per (pm?, first?) variant:
    exchange -> [slab PM + pencil P(k)] -> refined slab tree gravity.
    Static caps (pcaps/fcap/maxl/kcap) are regrown from the psum'd
    diagnostics and the program rebuilt+rerun on overflow — the
    distributed analog of the single-device grow-only tier caches.
  * Drift/kicks/timebin bookkeeping are elementwise jnp ops on the
    sharded arrays (XLA partitions them with zero communication); the
    timestep ASSIGNMENT (assign_timebins) runs on host over the
    gathered dloga like the single-device loop — O(N) host work per
    step, acceptable at validation scale and isolated behind one
    function for a later device-side port.

Outputs (snapshots via io.sharded_io, FOF via fof.slab, P(k) from the
pencil FFT) are wired by the CLI (cli/gadget_main.py --mesh N).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map

from ..core.particles import float_to_ipos, POS_SCALE
from ..core.timeline import (Timeline, TIMEBINS, dti_from_timebin,
                             round_down_power_of_two)
from ..core.integrate import (DriftKickTimes, TimestepParams,
                              active_bins_mask, find_next_kick,
                              gravity_dloga, long_range_dloga,
                              assign_timebins, gravkick_tables,
                              update_kick_times, is_timebin_active)
from ..gravity.treepm import (GravityConfig, get_window_tables,
                              default_softening)
from ..gravity.pm import finalize_power
from ..utils.constants import CM_PER_MPC
from .domain import distribute_slabs, exchange, collect_alive
from .sharded import tree_forces_slab
from .pfft import pm_forces_slab, measure_cdm_power_slab


# x-column granularity of the cost-balance histogram (the topleaf
# count analog): fine enough to split a clustered mesh plane
_BALANCE_COLS = 4096


@jax.jit
def _drift_fields(ipos, vel, alive, driftfac, pos_scale_over_box):
    dx = vel * driftfac * pos_scale_over_box
    newpos = ipos + dx.astype(jnp.int32).astype(jnp.uint32)
    return jnp.where(alive[:, None], newpos, ipos)


@jax.jit
def _kick_bins(vel, gacc, timebin, gravkick_table, alive):
    fac = gravkick_table[timebin.astype(jnp.int32)]
    fac = jnp.where(alive, fac, 0.0)
    return vel + gacc * fac[:, None]


@jax.jit
def _kick_pm_all(vel, gpm, alive, fac):
    return vel + gpm * jnp.where(alive, fac, 0.0)[:, None]


@dataclass
class SlabCaps:
    """Regrowable static sizes of the jitted force program."""
    kcap: int = 512          # exchange rows per (src,dst) pair
    gcap: int = 0            # ghost strip rows (0 = capacity C)
    maxl: int = 512          # traversal leaf-list length
    fcap: int = 2048         # BFS frontier cap (walk traversal: unused)
    pcaps: tuple = (256, 512, 1024, 2048)   # eval tier caps (quads)
    nb_mult: int = 1         # target-block count multiplier
    pm_kcap: int = 2048      # PM layout-exchange rows per pair
    # stencil-schedule statics (engine="stencil"; 0 = resolve default)
    st_tbc: int = 0          # stencil sub-block capacity
    st_pcaps: tuple = (256, 512, 1024, 2048)  # stencil tier caps
    st_ncaps: tuple = (16, 32, 64, 128)       # near-pass tier caps

    def key(self):
        return (self.kcap, self.gcap, self.maxl, self.fcap,
                self.pcaps, self.nb_mult, self.pm_kcap,
                self.st_tbc, self.st_pcaps, self.st_ncaps)


@dataclass
class SlabSimulation:
    """Distributed DM TreePM simulation over a 1-D device mesh."""
    CP: object
    boxsize: float
    timeline: Timeline
    times: DriftKickTimes
    gravity: GravityConfig
    tsp: TimestepParams
    mesh: Mesh
    fields: dict                   # sharded [D*C] state
    capacity: int                  # rows per device
    window_tables: object = None
    step_count: int = 0
    power_history: list = field(default_factory=list)
    snapshots: list = field(default_factory=list)
    caps: SlabCaps = field(default_factory=SlabCaps)
    on_snapshot: object = None     # callback(sim, atime)
    on_step: object = None
    on_pm_step: object = None      # FOF-cadence physics (BH seeding)
    # human control interface (utils.hci.HCI), polled on PM steps
    # like the reference (run.cpp:408); see simulation.py
    hci: object = None
    on_checkpoint: object = None   # callback(sim, atime)
    hci_exit: str = ""
    # RestartFlag-1 resume: skip re-writing the resume-point snapshot
    resumed: bool = False
    on_drift: object = None        # callback(sim, a0, a1) after drift
    nu_table: object = None        # neutrinos_lra.DeltaTotTable
    walltime: object = None
    balance_domains: bool = False  # cost-balanced slab cuts
    hierarchical: bool = False     # Gadget-4 split gravity timesteps
    # 2-D PM processor grid (d1, d2) with d1*d2 == device count
    # (petapm.cpp:217-255): the particle domain stays 1-D x-slabs on
    # the flat axis; only the PM stage routes rows to the (d1, d2)
    # brick layout (pfft2d.pm_forces_brick_dp) and back
    procgrid: object = None
    # anti-correlation random box shift (partmanager.h:79-82, redrawn
    # each PM step run.cpp:426-428): fraction of the box; the uint32
    # offset is EXACT so outputs subtract it losslessly.  The global
    # shift changes slab ownership; the PM-step exchange re-homes rows
    # like the reference's domain_decompose_full after the shift.
    random_offset_frac: float = 0.0
    _offset_u32: object = None
    cuts_planes: object = None     # [D+1] mesh-plane cut indices
    _cuts_dev: object = None       # [D-1] uint32 interior cuts
    _programs: dict = field(default_factory=dict)
    _exchange_cadence_info: dict = field(default_factory=dict)
    # ---- distributed gas (adiabatic SPH; run.cpp:482-505) ----
    has_gas: bool = False
    gas_u0: object = None          # initial specific energy (IC)
    kernel: object = None          # sph KernelSpec (default CUBIC)
    eta: float = 1.0
    art_bulk_visc: float = 0.75
    density_independent_sph: bool = True
    density_contrast_limit: float = 100.0
    _entropy_is_u: bool = False
    _sph_caps: dict = field(default_factory=dict)
    _hydro_caps: dict = field(default_factory=dict)
    # distributed subgrid sources: elementwise cooling/SF, star
    # spawns into local dead rows (subgrid_slab.spawn_stars_slab),
    # winds via the rare-source gather passes, PM-cadence veldisp
    cooling_on: bool = False
    sfr_on: bool = False
    coolpar: object = None
    treecool: object = None
    zreion_table: object = None  # uv_fluctuations.ZreionTable
    metal_cool: object = None    # uv_fluctuations.MetalCoolingTable
    helium: object = None        # helium_reion.HeliumReion (QSO)
    excursion: object = None     # excursion.ExcursionSetParams
    j21_coeffs: object = None    # uv_fluctuations.J21Coeffs
    excursion_zstop: float = 5.0
    excursion_xhi: object = None  # (vol, mass) neutral fractions
    sfrpar: object = None
    coolunits: object = None
    rng_key: object = None
    star_count: int = 0
    winds_on: bool = False
    windpar: object = None
    metal_return_on: bool = False
    metals: object = None        # physics.metal_return.MetalReturn
    min_enrich_window_myr: float = 1.0
    bh_on: bool = False
    bhpar: object = None         # physics.blackhole.BHParams
    bh_dynfric_on: bool = False
    _spawn_cap: int = 256
    _veldisp_caps: dict = field(default_factory=dict)
    _t_grid: object = None

    # ---------------- construction ----------------
    @classmethod
    def from_arrays(cls, mesh: Mesh, pos, vel, mass, ids, CP, boxsize,
                    nmesh, timeline, atime,
                    tsp: Optional[TimestepParams] = None,
                    gravity_kw: Optional[dict] = None,
                    headroom: float = 1.6,
                    balance_domains: bool = True):
        n = len(pos)
        ids = np.asarray(ids, np.uint64)
        host = {
            "ipos": np.asarray(float_to_ipos(pos, boxsize)),
            "vel": np.asarray(vel, np.float32),
            "mass": (np.asarray(mass, np.float32) if np.ndim(mass)
                     else np.full(n, mass, np.float32)),
            "oldacc": np.zeros(n, np.float32),
            "tbin": np.ones(n, np.int32),
            "id_lo": (ids & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            "id_hi": (ids >> np.uint64(32)).astype(np.uint32),
            "gpm": np.zeros((n, 3), np.float32),
            "gacc": np.zeros((n, 3), np.float32),
        }
        # cost-balanced slab cuts from the initial x-column histogram
        # (domain.cpp:620 balanced topleaf assignment analog);
        # NCOLS columns play the role of topleaves — finer than the
        # mesh so a clustered plane can still be split
        balance = balance_domains and mesh.devices.size > 1
        cuts_planes = cuts_in = None
        if balance:
            from .domain import balance_cuts, cuts_fp_from_planes
            ncols = _BALANCE_COLS
            ipx = host["ipos"][:, 0][host["mass"] > 0]
            cols = (ipx.astype(np.uint64) * np.uint64(ncols)
                    >> np.uint64(32)).astype(np.int64)
            hist = np.bincount(cols, minlength=ncols)
            cuts_planes = balance_cuts(hist, mesh.devices.size)
            cuts_in = cuts_fp_from_planes(cuts_planes, ncols)
        fields, capacity = distribute_slabs(mesh, host,
                                            headroom=headroom,
                                            cuts_in=cuts_in)
        soft = default_softening(boxsize, n)
        gkw = dict(boxsize=boxsize, nmesh=nmesh, G=CP.GravInternal,
                   softening=soft,
                   tree_nlevels=min(20, max(6, int(np.ceil(
                       np.log(max(n // mesh.devices.size, 8) / 16)
                       / np.log(8))) + 4)),
                   tree_ncrit=32)
        if gravity_kw:
            gkw.update(gravity_kw)
        gravity = GravityConfig(**gkw)
        ti = timeline.ti_from_loga(np.log(atime))
        return cls(CP=CP, boxsize=boxsize, timeline=timeline,
                   times=DriftKickTimes.init(ti), gravity=gravity,
                   tsp=tsp or TimestepParams(), mesh=mesh,
                   fields=fields, capacity=capacity,
                   balance_domains=balance,
                   cuts_planes=cuts_planes,
                   _cuts_dev=(jnp.asarray(cuts_in)
                              if cuts_in is not None else None))

    @classmethod
    def from_species(cls, mesh: Mesh, species, CP, boxsize, nmesh,
                     timeline, atime, gas_u0: float = None,
                     tsp: Optional[TimestepParams] = None,
                     gravity_kw: Optional[dict] = None,
                     headroom: float = 1.6,
                     balance_domains: bool = True):
        """Multi-species constructor (Simulation.from_species analog):
        species = [(ptype, pos, vel, mass, ids), ...].  ptype 0 rows
        get the distributed-SPH columns; entropy starts as the IC
        specific energy u0 and converts after the first density pass
        (init_gas_entropy protocol, init.cpp:230)."""
        parts = []
        for ptype, pos, vel, mass, ids in species:
            n_s = len(pos)
            m = (np.asarray(mass, np.float32) if np.ndim(mass)
                 else np.full(n_s, mass, np.float32))
            parts.append((ptype, np.asarray(pos), np.asarray(vel),
                          m, np.asarray(ids, np.uint64)))
        pos = np.concatenate([p[1] for p in parts])
        vel = np.concatenate([p[2] for p in parts])
        mass = np.concatenate([p[3] for p in parts])
        ids = np.concatenate([p[4] for p in parts])
        ptyp = np.concatenate([np.full(len(p[1]), p[0], np.int32)
                               for p in parts])
        sim = cls.from_arrays(mesh, pos, vel, mass, ids, CP, boxsize,
                              nmesh, timeline, atime, tsp=tsp,
                              gravity_kw=gravity_kw,
                              headroom=headroom,
                              balance_domains=balance_domains)
        has_gas = bool((ptyp == 0).any())
        # route ptype through the same slab layout as the dynamics:
        # re-distribute a host dict carrying a row tag, then align by
        # 64-bit id (distribute_slabs orders rows identically given
        # identical inputs — but ids are authoritative)
        if has_gas:
            idsd = sim.ids64()
            alive = np.asarray(sim._alive())
            sort_idx = np.argsort(ids)
            pt_rows = np.zeros(idsd.shape[0], np.int32)
            rows = np.nonzero(alive)[0]
            at = np.searchsorted(ids[sort_idx], idsd[rows])
            pt_rows[rows] = ptyp[sort_idx[at]]
            sh = NamedSharding(sim.mesh, P("dp"))
            sh3 = NamedSharding(sim.mesh, P("dp", None))
            f = sim.fields
            f["ptyp"] = jax.device_put(pt_rows, sh)
            is_gas = (pt_rows == 0) & alive
            n_gas = int(is_gas.sum())
            sep = boxsize / max(n_gas, 1) ** (1.0 / 3.0)
            zs = np.zeros(idsd.shape[0], np.float32)
            f["hsml"] = jax.device_put(
                np.where(is_gas, 1.5 * sep, 0.0).astype(np.float32),
                sh)
            for name in ("density", "egywt", "dhsml_egy",
                         "divv", "curlv", "dts", "mvsig", "dth"):
                f["" + name] = jax.device_put(zs.copy(), sh)
            # entropy HOLDS u0 until the first-density conversion
            # (init_gas_entropy protocol — a zero entropy would make
            # the first pass's entvar ~0 and EgyWtDensity 0/0)
            ent0 = np.where(is_gas, np.float32(gas_u0 or 0.0), 0.0)
            f["entropy"] = jax.device_put(ent0.astype(np.float32),
                                          sh)
            f["hacc"] = jax.device_put(
                np.zeros((idsd.shape[0], 3), np.float32), sh3)
            # subgrid state: electron abundance, metallicity, SF
            # generation counter, SFR, |grad rho|, star birth time
            f["ne"] = jax.device_put(
                np.where(is_gas, 1.0, 0.0).astype(np.float32), sh)
            # met/sfr/grho: gas subgrid; birtha/m0/smet/enr: star
            # bookkeeping (birth time, initial mass, metallicity at
            # birth, last enrichment age); delay/vdsp: wind state
            for name in ("met", "sfr", "grho", "birtha", "m0",
                         "smet", "enr", "tret", "delay", "vdsp",
                         "bhm", "bhmd"):
                f[name] = jax.device_put(zs.copy(), sh)
            # HeIII ionization flag (QSO helium reionization)
            f["heiii"] = jax.device_put(
                np.zeros(idsd.shape[0], bool), sh)
            # excursion-set state: per-gas max J21, first-ionization
            # redshift (-1 = never), FOF halo mass for escape
            # fractions (refreshed at FOF cadence)
            f["j21"] = jax.device_put(zs.copy(), sh)
            f["zrei"] = jax.device_put(
                np.full(idsd.shape[0], -1.0, np.float32), sh)
            f["hmass"] = jax.device_put(zs.copy(), sh)
            f["gen"] = jax.device_put(
                np.zeros(idsd.shape[0], np.int32), sh)
            sim.has_gas = True
            sim.gas_u0 = gas_u0
            sim._entropy_is_u = gas_u0 is not None
        from ..sph.kernels import CUBIC
        sim.kernel = CUBIC
        return sim

    # ---------------- small helpers ----------------
    def atime(self) -> float:
        return self.timeline.atime_from_ti(self.times.ti_current)

    def _alive(self):
        return self.fields["mass"] > 0

    def _apply_random_offset(self):
        """Re-draw the internal particle offset (update_random_offset,
        partmanager.c:45-62), seeded by the integer timeline exactly
        like the single-device loop so the draws match across device
        counts.  Elementwise on the sharded ipos; the subsequent
        PM-step exchange re-homes rows to their new owner slabs."""
        if not self.random_offset_frac:
            return
        rng = np.random.RandomState(
            int(self.times.ti_current) & 0x7FFFFFFF)
        rr = rng.uniform(0, 1, 3) * self.random_offset_frac
        new_u = (rr * 2 ** 32).astype(np.int64).astype(np.uint32)
        old_u = self._offset_u32 if self._offset_u32 is not None \
            else np.zeros(3, np.uint32)
        delta = (new_u - old_u).astype(np.uint32)
        self.fields["ipos"] = (self.fields["ipos"]
                               + jnp.asarray(delta)[None, :])
        self._offset_u32 = new_u

    def output_ipos(self):
        """Sharded positions with the internal random shift removed
        (petaio.cpp:678 convention) — exact uint32 subtraction."""
        if self._offset_u32 is None:
            return self.fields["ipos"]
        return self.fields["ipos"] - jnp.asarray(
            self._offset_u32)[None, :]

    def _wt(self, name: str):
        if self.walltime is not None:
            self.walltime.measure(name)

    def n_alive(self) -> int:
        return int(jnp.sum(self._alive()))

    def ids64(self):
        return (np.asarray(self.fields["id_hi"]).astype(np.uint64)
                << np.uint64(32)) \
            | np.asarray(self.fields["id_lo"]).astype(np.uint64)

    # ---------------- the force program ----------------
    def _force_program(self, with_pm: bool, first: bool):
        """Build (or fetch) the jitted shard_map force step."""
        with_nu = with_pm and self.nu_table is not None
        # 1-D slab nu runs feed the force half the phase-A rho_k +
        # readout context instead of re-depositing (advisor r3 #1)
        nu_reuse = with_nu and self.procgrid is None
        key = (with_pm, first, with_nu, nu_reuse, self.caps.key())
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        if self.window_tables is None and \
                self.gravity.window_type == "exact":
            self.window_tables = get_window_tables(self.gravity)

        mesh = self.mesh
        ndev = mesh.devices.size
        caps = self.caps
        C = self.capacity
        gcap = caps.gcap or C
        sp = self.gravity.short(use_bh=1 if first else None)
        cfg_pm = self.gravity.pm()
        wt = self.window_tables
        g = self.gravity
        maxi = g.maxi
        use_stencil = g.engine == "stencil"
        if use_stencil and caps.st_tbc == 0:
            # resolve the default so key() reflects the value actually
            # compiled in (host-reproducible, sharded.py)
            from .sharded import stencil_static_config
            from ..gravity.stencil import default_tbc
            _, _, T = stencil_static_config(C, g.refine_sub, 7, sp)
            caps.st_tbc = default_tbc(T, g.refine_sub)
            key = (with_pm, first, with_nu, nu_reuse, caps.key())

        balance = self.balance_domains and ndev > 1

        field_specs = {name: P("dp", *([None] * (a.ndim - 1)))
                      for name, a in self.fields.items()}
        info_specs = {"unsent": P(), "dropped": P(), "n_alive": P(),
                      "halo_lost": P(), "walk_overflow": P(),
                      "pm_lost": P()}
        info_specs["st_diag" if use_stencil else "grav_diag"] = P()
        out_specs = (field_specs, info_specs)
        if with_pm:
            out_specs = out_specs + ((P(), P(), P(), P()),)

        def body(fields, cuts, nu_k=None, nu_fac=None, rho_k=None,
                 pm_ctx=None):
            if nu_reuse:
                # phase A (_nu_factor_tables) already exchanged and
                # deposited this step; rows have not moved since
                xinfo = {
                    "unsent": jnp.zeros((), jnp.int32),
                    "dropped": jnp.zeros((), jnp.int32),
                    "n_alive": jax.lax.psum(
                        jnp.sum(fields["mass"] > 0), "dp")}
            else:
                fields, xinfo = exchange(fields, ndev, caps.kcap,
                                         cuts_in=cuts)
            alive = fields["mass"] > 0
            ps = None
            pm_lost = jnp.zeros((), jnp.int32)
            if with_pm:
                if nu_reuse:
                    from .pfft import pm_forces_from_rhok
                    ipos_dep, dep_mask, stay, perm, flat = pm_ctx
                    gpm, ps = pm_forces_from_rhok(
                        rho_k, ipos_dep, dep_mask, stay, perm,
                        flat, cfg_pm, ndev, C, caps.pm_kcap,
                        halo=2, nu_k=nu_k, nu_fac=nu_fac,
                        want_power=True,
                        routed=balance)
                elif self.procgrid is not None:
                    from .pfft2d import pm_forces_brick_dp
                    d1, d2 = self.procgrid
                    gpm, ps, pm_lost = pm_forces_brick_dp(
                        fields["ipos"], fields["mass"], cfg_pm,
                        d1, d2, halo=2, mask=alive,
                        want_power=True, route_kcap=caps.pm_kcap,
                        nu_k=nu_k, nu_fac=nu_fac)
                else:
                    gpm, ps, pm_lost = pm_forces_slab(
                        fields["ipos"], fields["mass"], cfg_pm,
                        ndev, halo=2, mask=alive, want_power=True,
                        cuts_in=cuts, route_kcap=caps.pm_kcap,
                        nu_k=nu_k, nu_fac=nu_fac)
                fields = dict(fields, gpm=gpm)
            if use_stencil:
                from .sharded import stencil_forces_slab
                acc, _pot, tinfo = stencil_forces_slab(
                    {"ipos": fields["ipos"], "mass": fields["mass"]},
                    sp, wt, ndev, gcap, caps.st_tbc, caps.st_pcaps,
                    caps.st_ncaps, sub=g.refine_sub, cuts_in=cuts)
            else:
                acc, _pot, tinfo = tree_forces_slab(
                    {"ipos": fields["ipos"], "mass": fields["mass"],
                     "oldacc": fields["oldacc"]},
                    sp, wt, ndev, gcap, g.tree_nlevels, g.tree_ncrit,
                    maxi, caps.maxl, g.block, schedule="refined",
                    sub=g.refine_sub, pcaps=caps.pcaps,
                    fcap=caps.fcap, traversal="walk", engine="xla",
                    nb_mult=caps.nb_mult, cuts_in=cuts)
            fields = dict(fields, gacc=acc)
            info = dict(xinfo)
            info.update(tinfo)
            info["pm_lost"] = pm_lost
            out = (fields, info)
            if with_pm:
                out = out + ((ps.k, ps.power, ps.nmodes, ps.norm),)
            return out

        nu_specs = (P(), P()) if with_nu else ()
        if nu_reuse:
            nu_specs = nu_specs + (
                P(None, "dp", None),
                (P("dp"), P("dp"), P("dp"), P("dp"), P("dp")))
        if balance:
            run = partial(shard_map, mesh=mesh,
                          in_specs=(field_specs, P()) + nu_specs,
                          out_specs=out_specs, check_vma=False)(
                lambda fields, cuts, *nu: body(fields, cuts, *nu))
        else:
            run = partial(shard_map, mesh=mesh,
                          in_specs=(field_specs,) + nu_specs,
                          out_specs=out_specs, check_vma=False)(
                lambda fields, *nu: body(fields, None, *nu))

        prog = jax.jit(run)
        self._programs[key] = prog
        return prog

    def _grow_from_diag(self, info) -> bool:
        """Inspect psum'd force diagnostics; grow caps on overflow.
        Returns True when the program must be rebuilt and rerun."""
        from ..gravity.shortrange_refined import _round_cap
        grew = False
        caps = self.caps
        if int(info["unsent"]) > 0:
            caps.kcap = caps.kcap * 2
            grew = True
        if int(info["dropped"]) > 0:
            raise RuntimeError(
                f"slab capacity overflow: {int(info['dropped'])} rows "
                f"dropped at capacity {self.capacity} — rerun with "
                f"more headroom (PartAllocFactor analog)")
        if int(info.get("pm_lost", 0)) > 0:
            caps.pm_kcap = min(caps.pm_kcap * 2, self.capacity)
            grew = True
        if int(info["halo_lost"]) > 0:
            if (caps.gcap or self.capacity) >= self.capacity:
                # gcap is clamped to C inside halo_exchange: losses at
                # gcap=C mean a strip outgrew the device's row count
                raise RuntimeError(
                    f"ghost strip overflow at gcap={self.capacity}")
            caps.gcap = min(caps.gcap * 2, self.capacity)
            grew = True
        if "st_diag" in info:
            # stencil schedule: [c1..c4, n_cover, cn_max, tb_total,
            # cn1..cn4] pmax'd over devices (gravity/stencil.py diag)
            from ..gravity.stencil import grow_tier_caps, _round_tbc
            d = np.asarray(info["st_diag"])
            if int(d[4]) > 0:
                # cell-anchored sub-blocks fit the W=7 window by
                # construction (stencil.py:_stencil_count docstring);
                # coverage overflow means a geometry bug, not a cap
                raise RuntimeError(
                    f"stencil coverage overflow on the slab path: "
                    f"{int(d[4])} sub-blocks exceeded the W=7 window")
            if int(d[6]) > caps.st_tbc:
                caps.st_tbc = _round_tbc(int(d[6]) + 256)
                grew = True
            pc = grow_tier_caps(tuple(int(x) for x in d[0:4]),
                                caps.st_pcaps, 16, 128)
            if pc != caps.st_pcaps:
                caps.st_pcaps = pc
                grew = True
            nc = grow_tier_caps(tuple(int(x) for x in d[7:11]),
                                caps.st_ncaps, 8, 64)
            if nc != caps.st_ncaps:
                caps.st_ncaps = nc
                grew = True
            return grew
        d = np.asarray(info["grav_diag"])
        if d[0] > 0:                       # target-block count overflow
            caps.nb_mult = caps.nb_mult * 2
            grew = True
        if d[1] > 0:                       # leaf-list overflow
            caps.maxl = caps.maxl * 2
            grew = True
        if d[8] > 0:                       # frontier overflow (bfs)
            caps.fcap = caps.fcap * 2
            grew = True
        if np.any(d[9:13] > 0):            # tier cap overflow
            newcaps = []
            hi = 0
            for i in range(4):
                hi = max(hi, _round_cap(int(d[4 + i]) + 1),
                         caps.pcaps[i])
                newcaps.append(hi)
            caps.pcaps = tuple(newcaps)
            grew = True
        return grew

    def _nu_cdm_power_program(self):
        """Jitted shard_map: exchange + distributed deposit/FFT + P(k)
        binning only — the pre-nu-factor CDM power the linear response
        integrates (gravpm.cpp:360 measure_power_spectrum)."""
        key = ("nupow", self.procgrid is None, self.caps.key())
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        mesh = self.mesh
        ndev = mesh.devices.size
        caps = self.caps
        cfg_pm = self.gravity.pm()
        balance = self.balance_domains and ndev > 1
        share = self.procgrid is None   # 1-D slabs share the deposit
        field_specs = {name: P("dp", *([None] * (a.ndim - 1)))
                       for name, a in self.fields.items()}
        out_specs = (field_specs,
                     (P(), P(), P(), P()),
                     {"unsent": P(), "dropped": P(), "pm_lost": P()})
        if share:
            # rho_k pencil + deposit context for pm_forces_from_rhok
            out_specs = out_specs + (
                P(None, "dp", None),
                (P("dp"), P("dp"), P("dp"), P("dp"), P("dp")))

        def body(fields, cuts):
            # one exchange serves BOTH this measurement and the force
            # program that follows; with 1-D slabs the DEPOSIT + r2c
            # are also shared — the force half consumes this rho_k
            # (gravpm.cpp:360 measures P(k) inside the force solve)
            fields, xinfo = exchange(fields, ndev, caps.kcap,
                                     cuts_in=cuts)
            alive = fields["mass"] > 0
            if share:
                from .pfft import pm_depose_slab
                rho_k, ps, (ipos_dep, dep_mask, stay, perm, flat,
                            pm_lost) = pm_depose_slab(
                    fields["ipos"], fields["mass"], cfg_pm, ndev,
                    halo=2, mask=alive, cuts_in=cuts,
                    route_kcap=caps.pm_kcap)
                info = {"unsent": xinfo["unsent"],
                        "dropped": xinfo["dropped"],
                        "pm_lost": pm_lost}
                return (fields, (ps.k, ps.power, ps.nmodes, ps.norm),
                        info, rho_k,
                        (ipos_dep, dep_mask, stay, perm, flat))
            ps, pm_lost = measure_cdm_power_slab(
                fields["ipos"], fields["mass"], cfg_pm, ndev,
                halo=2, mask=alive, cuts_in=cuts,
                route_kcap=caps.pm_kcap)
            info = {"unsent": xinfo["unsent"],
                    "dropped": xinfo["dropped"], "pm_lost": pm_lost}
            return fields, (ps.k, ps.power, ps.nmodes, ps.norm), info

        if balance:
            run = partial(shard_map, mesh=mesh,
                          in_specs=(field_specs, P()),
                          out_specs=out_specs, check_vma=False)(
                lambda fields, cuts: body(fields, cuts))
        else:
            run = partial(shard_map, mesh=mesh,
                          in_specs=(field_specs,),
                          out_specs=out_specs, check_vma=False)(
                lambda fields: body(fields, None))
        prog = jax.jit(run)
        self._programs[key] = prog
        return prog

    def _nu_factor_tables(self):
        """Measure the CDM power, advance the delta_nu integral, and
        return the (k, fac) interp tables for THIS PM solve — the
        slab analog of simulation._compute_pm's nu branch
        (compute_neutrino_power, gravpm.cpp:308)."""
        for _ in range(8):
            prog = self._nu_cdm_power_program()
            if self.balance_domains and self.mesh.devices.size > 1:
                out = prog(self.fields, self._cuts_dev)
            else:
                out = prog(self.fields)
            info = out[2]
            if int(info["dropped"]) > 0:
                raise RuntimeError(
                    f"slab capacity overflow in nu power measure: "
                    f"{int(info['dropped'])} rows dropped at "
                    f"capacity {self.capacity}")
            grew = False
            if int(info["unsent"]) > 0:
                self.caps.kcap = self.caps.kcap * 2
                grew = True
            if int(info["pm_lost"]) > 0:
                self.caps.pm_kcap = min(self.caps.pm_kcap * 2,
                                        self.capacity)
                grew = True
            if not grew:
                break
        else:
            raise RuntimeError("nu power-measure caps failed to "
                               f"converge: {self.caps}")
        # rows are now exchange-homed; with 1-D slabs the deposit's
        # rho_k + readout context carry over to the force program
        # (one exchange + one deposit + one r2c per PM step)
        self.fields = out[0]
        self._nu_pm_ctx = (out[3], out[4]) if len(out) > 3 else None
        k, power, nmodes, norm = out[1]
        nt = self.nu_table
        kk = np.asarray(k, np.float64) * (2 * np.pi / self.boxsize)
        pw = np.asarray(power, np.float64)
        nm = np.asarray(nmodes, np.float64)
        sel = nm > 0
        delta_meas = np.sqrt(pw[sel] / nm[sel]
                             / max(float(norm), 1e-300))
        delta_cdm = np.interp(nt.wavenum, kk[sel], delta_meas)
        atime = self.atime()
        nt.update(atime, delta_cdm)
        fac1d = nt.potential_factor(atime, delta_cdm)
        # DC mode: the reference does NOT apply the response factor at
        # k=0 but rescales Norm by (Mtot/Mcdm)^2 (gravpm.cpp:412,431)
        # — prepend a synthetic (k=0, MtotbyMcdm) point so interp
        # hits it exactly at kmag=0 and nothing else
        mtot_by_mcdm = self.CP.Omega0 / (
            self.CP.Omega0
            - atime ** 3 * self.CP.ONu.get_omega_nu_nopart(atime))
        # the extra (eps, fac1d[0]) knot keeps every k>0 mode on the
        # flat left-clamp the single-device path uses
        w0 = float(np.asarray(nt.wavenum)[0])
        kk_tab = np.concatenate([[0.0, 1e-3 * w0],
                                 np.asarray(nt.wavenum)])
        fac_tab = np.concatenate([[mtot_by_mcdm, fac1d[0]],
                                  np.asarray(fac1d)])
        return (jnp.asarray(kk_tab.astype(np.float32)),
                jnp.asarray(fac_tab.astype(np.float32)))

    def _forces(self, with_pm: bool, first: bool = False):
        """Run the force program, regrowing static caps on overflow."""
        nu_args = ()
        if with_pm and self.nu_table is not None:
            nu_args = self._nu_factor_tables()
            ctx = getattr(self, "_nu_pm_ctx", None)
            if ctx is not None and self.procgrid is None:
                # phase-A rho_k + readout context: the force program
                # skips its exchange, deposit, and r2c
                nu_args = nu_args + ctx
        for _ in range(8):
            prog = self._force_program(with_pm, first)
            if self.balance_domains and self.mesh.devices.size > 1:
                out = prog(self.fields, self._cuts_dev, *nu_args)
            else:
                out = prog(self.fields, *nu_args)
            info = out[1]
            if not self._grow_from_diag(info):
                self.fields = out[0]
                if with_pm:
                    k, power, nmodes, norm = out[2]
                    from ..gravity.pm import PowerSpectrum
                    mpc = CM_PER_MPC / 3.085678e21
                    kk, pw, nm = finalize_power(
                        PowerSpectrum(k=k, power=power, nmodes=nmodes,
                                      norm=norm),
                        self.gravity.pm(), self.boxsize / mpc)
                    self.power_history.append(
                        (self.atime(), kk, pw, nm))
                return info
        raise RuntimeError("force-program caps failed to converge "
                           f"after 8 regrows: {self.caps}")

    # ---------------- distributed gas stage ----------------
    def _gas_density_hydro(self, first: bool):
        """Distributed density (adaptive hsml) + hydro force over the
        slab-owned gas (run.cpp:482-505; the reference runs both
        stages distributed through the treewalk engine — here through
        the ghost-halo slab passes, parallel/sph_slab.py).

        Runs AFTER the force program (ownership re-established by its
        exchange); uses the PREVIOUS step's accelerations in the
        velocity/entropy predictors, exactly like the single-device
        driver (core/integrate.predictor_tables semantics)."""
        from ..core.integrate import predictor_tables
        from ..sph.density import DensityResult
        from ..sph.hydro import (HydroParams, balsara_f1,
                                 pressure_predict, hydro_time_factors)
        from ..sph.kernels import NUMDIMS
        from ..utils.constants import GAMMA, GAMMA_MINUS1
        from .sph_slab import density_slab, hydro_slab

        f = self.fields
        alive = self._alive()
        is_gas = (f["ptyp"] == 0) & alive
        # seed generous walk caps: every regrow retraces a ~30-minute
        # 8-device shard_map compile on this host, and the list can
        # never exceed local+ghost rows anyway
        ml = min(1024, 1 << (max(3 * self.capacity - 1, 1)
                             ).bit_length())
        self._sph_caps.setdefault("maxl", ml)
        self._hydro_caps.setdefault("maxl", ml)
        gk_t, hk_t, de_t, gk_pm = predictor_tables(
            self.CP, self.timeline, self.times)
        bins = f["tbin"].astype(jnp.int32)
        vel_p = (f["vel"] + f["gacc"] * gk_t[bins][:, None]
                 + f["gpm"] * jnp.float32(gk_pm)
                 + f["hacc"] * hk_t[bins][:, None])
        # zero non-gas/dead rows: their accelerations can be
        # non-finite, and any non-finite SOURCE field reaches gas
        # sums through 0*NaN=NaN
        vel_p = jnp.where(is_gas[:, None], vel_p, 0.0)
        ent_pred = f["entropy"] + f["dts"] * de_t[bins]
        ent_pred = jnp.maximum(ent_pred, 0.25 * f["entropy"])
        entvar = jnp.where(
            is_gas, jnp.maximum(ent_pred, 1e-35) ** (1.0 / GAMMA),
            0.0)
        mass_gas = jnp.where(is_gas, f["mass"], 0.0)

        dfields = {"ipos": f["ipos"], "mass": mass_gas,
                   "vel": vel_p, "entvar": entvar}
        hsml0 = jnp.where(is_gas, f["hsml"], 0.0)
        cuts = (self._cuts_dev if (self.balance_domains
                                   and self.mesh.devices.size > 1)
                else None)
        res, hsml, dinfo = density_slab(
            self.mesh, dfields, hsml0, self.boxsize,
            spec=self.kernel, eta=self.eta, caps=self._sph_caps,
            cuts_in=cuts)
        self._wt("SPHDensity")
        rho = jnp.maximum(res.rho, 1e-35)
        dhsml_fac = 1.0 / (1.0 + res.dhsml_rho * hsml
                           / (NUMDIMS * rho))
        divv = res.div / rho
        curlv = jnp.linalg.norm(res.rot, axis=-1) / rho
        dth = (1.0 / NUMDIMS) * divv * hsml
        egy_rho = jnp.maximum(res.egy_rho, 1e-35)
        dhsml_egy = -(res.dhsml_egy * hsml
                      / (NUMDIMS * egy_rho)) * dhsml_fac
        egywt = egy_rho / jnp.maximum(entvar, 1e-35)
        if not self.density_independent_sph:
            egywt = rho
            dhsml_egy = dhsml_fac

        def mg(name, new):
            f[name] = jnp.where(is_gas, new, f[name])
        mg("hsml", hsml)
        mg("density", rho)
        mg("egywt", egywt)
        mg("dhsml_egy", dhsml_egy)
        mg("divv", divv)
        mg("curlv", curlv)
        mg("dth", dth)
        mg("grho", jnp.linalg.norm(res.grad_rho, axis=-1))

        if os.environ.get("SHENQI_DEBUG_INIT"):
            def _dbg(tag, *arrs):
                for i, a in enumerate(arrs):
                    x = np.asarray(a)[np.asarray(is_gas)]
                    print(f"[dbg:{tag}:{i}] finite={np.isfinite(x).all()}"
                          f" min={x.min():.4g} max={x.max():.4g}",
                          flush=True)
        else:
            _dbg = lambda *a: None
        _dbg("density", rho, egy_rho, entvar, hsml, f["egywt"])

        if self._entropy_is_u and first:
            # init_gas_entropy: IC u -> entropy.  With
            # pressure-entropy SPH this is the same fixed point as
            # the single-device setup_density_indep_entropy
            # (init.cpp:403-449) — iterate entropy -> EgyWtDensity at
            # FIXED hsml via the distributed pass until converged.
            from .sph_slab import density_pass_slab
            a3 = self.atime() ** 3
            u0f = jnp.float32(self.gas_u0)
            egywt = jnp.maximum(f["density"], 1e-35)
            entropy = f["entropy"]
            stop = False
            for j in range(100):
                # gas rows ONLY: an unmasked formula drives dead/DM
                # rows' entvar to NaN within two iterations, and
                # 0*NaN = NaN poisons every gas target whose
                # candidate list holds a dead row
                entropy = jnp.where(
                    is_gas,
                    GAMMA_MINUS1 * u0f
                    / jnp.maximum(egywt / a3, 1e-35) ** GAMMA_MINUS1,
                    0.0)
                if not self.density_independent_sph:
                    break
                entvar_i = jnp.where(
                    is_gas,
                    jnp.maximum(entropy, 1e-35) ** (1.0 / GAMMA),
                    0.0)
                if j == 0 and os.environ.get(
                        "SHENQI_DEBUG_INIT") == "dump":
                    np.savez("/tmp/fp0_inputs.npz",
                             ipos=np.asarray(f["ipos"]),
                             mass=np.asarray(mass_gas),
                             entvar=np.asarray(entvar_i),
                             hsml=np.asarray(f["hsml"]),
                             cuts=(np.asarray(cuts)
                                   if cuts is not None
                                   else np.zeros(0)),
                             boxsize=self.boxsize,
                             caps_width=self._sph_caps.get(
                                 "width", 0),
                             caps_maxl=self._sph_caps.get(
                                 "maxl", 128),
                             caps_nlv=self._sph_caps.get("nlv", 8))
                res2, _ = density_pass_slab(
                    self.mesh,
                    {"ipos": f["ipos"], "mass": mass_gas,
                     "vel": jnp.zeros_like(vel_p),
                     "entvar": entvar_i},
                    f["hsml"], self.boxsize, spec=self.kernel,
                    caps=self._sph_caps, cuts_in=cuts)
                new_egywt = jnp.where(
                    is_gas,
                    jnp.maximum(res2.egy_rho, 1e-35)
                    / jnp.maximum(entvar_i, 1e-35), 0.0)
                if stop:
                    egywt = new_egywt
                    break
                maxdiff = float(jnp.max(jnp.where(
                    is_gas,
                    jnp.abs(new_egywt - egywt)
                    / jnp.maximum(new_egywt, 1e-35), 0.0)))
                _dbg(f"fp{j}", entropy, entvar_i, res2.egy_rho,
                     new_egywt)
                egywt = new_egywt
                if maxdiff < 1e-3:
                    stop = True
            mg("entropy", entropy)
            mg("egywt", jnp.maximum(egywt, 1e-35))
            self._entropy_is_u = False
            entvar = jnp.maximum(f["entropy"], 1e-35) ** (1.0 / GAMMA)
            _dbg("postfp", f["entropy"], f["egywt"], entvar)

        # ---- hydro force ----
        atime = self.atime()
        hubble = float(self.CP.hubble_function(atime))
        par = HydroParams(boxsize=self.boxsize,
                          art_bulk_visc_const=self.art_bulk_visc,
                          density_contrast_limit=(
                              self.density_contrast_limit),
                          density_independent_sph=(
                              self.density_independent_sph))
        tf = hydro_time_factors(atime, hubble)
        eom = f["egywt"] if self.density_independent_sph \
            else f["density"]
        press = pressure_predict(jnp.maximum(eom, 1e-35), entvar)
        cs = jnp.sqrt(GAMMA * press / jnp.maximum(eom, 1e-35))
        f1 = balsara_f1(f["divv"], f["curlv"], cs, f["hsml"],
                        tf["fac_mu"])
        zs = jnp.zeros_like(press)
        # per-row timebin dloga for the viscosity limiter
        # (hydratree2.hpp:334-343); bin 0 -> 0 = limiter off
        from ..core.timeline import TIMEBINS
        dl_bin = np.zeros(TIMEBINS + 1, np.float32)
        for b in range(1, TIMEBINS + 1):
            dl_bin[b] = self.timeline.get_dloga_for_bin(
                b, self.times.ti_current)
        dloga_bin = jnp.asarray(dl_bin)[
            jnp.clip(f["tbin"].astype(jnp.int32), 0, TIMEBINS)]
        if self.winds_on and self.windpar and "delay" in f:
            # wind particles are hydro-decoupled while delayed and
            # below the recoupling density (winds.cpp winds_is_particle_decoupled)
            from ..physics.winds import is_decoupled
            a3inv = 1.0 / atime ** 3
            decoupled = is_decoupled(f["delay"], f["density"], a3inv,
                                     self.windpar) & is_gas
        else:
            decoupled = jnp.zeros(press.shape[0], bool)
        hfields = {
            "ipos": f["ipos"], "mass": mass_gas, "vel": vel_p,
            "hsml": f["hsml"], "density": f["density"],
            "eomdensity": eom, "entvar": entvar, "pressure": press,
            "divvel": f["divv"], "curlvel": f["curlv"],
            "dhsml_egy": f["dhsml_egy"], "dloga": dloga_bin,
            "decoupled": decoupled,
            "f1": f1, "egyrho": eom, "dhsml": f["dhsml_egy"],
        }
        (hacc, dts_raw, mvsig), hinfo = hydro_slab(
            self.mesh, hfields, par, tf, spec=self.kernel,
            caps=self._hydro_caps, cuts_in=cuts)
        hub_a2 = tf["hubble_a2"]
        dts = dts_raw * GAMMA_MINUS1 / (
            hub_a2 * jnp.maximum(f["density"], 1e-35)
            ** GAMMA_MINUS1)
        coupled = is_gas & ~decoupled
        f["hacc"] = jnp.where(coupled[:, None], hacc,
                              jnp.where(is_gas[:, None], 0.0,
                                        f["hacc"]))
        mg("dts", jnp.where(coupled, dts, 0.0))
        mg("mvsig", mvsig)
        _dbg("posthydro", press, cs, f1, hacc, dts_raw, mvsig)
        self._wt("SPHHydro")

    def _gas_source_terms(self, dtime: float):
        """Strang-split cooling + star formation + winds on the
        sharded gas (cooling_and_starformation, run.cpp:604-681).

        Cooling/SF are ELEMENTWISE (zero communication).  Whole
        conversions flip the gas row in place (make_particle_star);
        generation SPLITS spawn children into LOCAL dead rows
        (subgrid_slab.spawn_stars_slab, slots_split_particle analog) —
        capacity grows host-side on free-row exhaustion.  Wind kicks
        are id-keyed so the slab run reproduces the single-device
        stream (winds.cpp:542 get_random_number(ID))."""
        if not self.has_gas or not (self.cooling_on or self.sfr_on):
            return
        from ..utils.constants import HYDROGEN_MASSFRAC
        from ..physics.sfr import starformation_step, entropy_to_u
        from ..physics.cooling_rates import UVBG

        f = self.fields
        alive = self._alive()
        is_gas = (f["ptyp"] == 0) & alive
        atime = self.atime()
        a3inv = 1.0 / atime ** 3
        redshift = 1.0 / atime - 1.0
        uvbg = (self.treecool.uvbg(redshift, self.coolpar)
                if self.treecool else UVBG())
        if (self.excursion is not None and self.j21_coeffs is not None
                and redshift > self.excursion_zstop):
            # excursion-set per-particle J21 UVB (cooling_uvfluc.cpp
            # get_local_UVBG_from_J21) — elementwise on the sharded
            # j21/zrei fields
            from ..physics.uv_fluctuations import uvbg_from_j21
            uvbg = uvbg_from_j21(uvbg, f["j21"], f["zrei"],
                                 redshift, self.excursion.AlphaUV,
                                 self.j21_coeffs,
                                 fbar=self.coolpar.fBar
                                 if self.coolpar else 0.17)
        elif self.zreion_table is not None:
            # fluctuating UVB: per-particle rates gated on z_reion
            # (cooling_uvfluc.cpp) — elementwise on the sharded rows,
            # zero communication (the zreion grid is replicated)
            from ..core.particles import ipos_to_float
            from ..physics.uv_fluctuations import local_uvbg
            pos = ipos_to_float(f["ipos"], self.boxsize)
            uvbg = local_uvbg(uvbg, self.zreion_table.zreion(pos),
                              redshift)
        mass_gas = jnp.where(is_gas, f["mass"], 0.0)
        # HeII long-mean-free-path heating for not-yet-ionized gas
        # during QSO reionization (cooling_qso_lightup.cpp:46-50) —
        # elementwise on the sharded rows, zero communication
        extra_heat = 0.0
        if self.helium is not None and self.helium.during(redshift):
            from ..utils.constants import GRAVITY, HUBBLE
            h0 = self.CP.HubbleParam * HUBBLE
            rho_crit_b = (3 * h0 * h0 / (8 * np.pi * GRAVITY)
                          * self.CP.OmegaBaryon)
            lm = self.helium.lmfp_heating_per_gram(redshift,
                                                   rho_crit_b)
            extra_heat = jnp.where(f["heiii"], 0.0, jnp.float32(lm))

        if self.sfr_on:
            if self.rng_key is None:
                self.rng_key = jax.random.PRNGKey(42)
            self.rng_key, sub = jax.random.split(self.rng_key)
            res = starformation_step(
                sub, f["density"], f["egywt"], f["entropy"],
                mass_gas, f["ne"], f["met"], f["gen"], dtime, a3inv,
                redshift, uvbg, self.sfrpar, self.coolpar,
                self.coolunits, is_gas, gradrho_mag=f["grho"],
                hsml=f["hsml"], pids=f["id_lo"],
                extra_heat=extra_heat)
            f["entropy"] = jnp.where(is_gas, res.entropy,
                                     f["entropy"])
            f["ne"] = jnp.where(is_gas, res.ne, f["ne"])
            f["met"] = jnp.where(is_gas, res.metallicity, f["met"])
            f["sfr"] = jnp.where(is_gas, res.sfr, f["sfr"])
            form = is_gas & res.form_star
            conv = form & res.convert_whole
            f["ptyp"] = jnp.where(conv, jnp.int32(4), f["ptyp"])
            f["birtha"] = jnp.where(conv, jnp.float32(atime),
                                    f["birtha"])
            f["sfr"] = jnp.where(conv, 0.0, f["sfr"])
            if "m0" in f:
                f["m0"] = jnp.where(conv, f["mass"], f["m0"])
                f["smet"] = jnp.where(conv, f["met"], f["smet"])
                f["enr"] = jnp.where(conv, 0.0, f["enr"])
            nstars = int(jnp.sum(conv.astype(jnp.int32)))
            # generation splits: spawn children into local dead rows
            split = form & ~res.convert_whole
            n_split = int(jnp.sum(split.astype(jnp.int32)))
            if n_split:
                from .subgrid_slab import spawn_stars_slab
                mstar = res.mass_of_star
                while self._spawn_cap < n_split:
                    self._spawn_cap *= 2
                for _ in range(3):
                    f2, n_sp, ovf = spawn_stars_slab(
                        self.mesh, f, split, mstar, atime,
                        cap=self._spawn_cap)
                    if not ovf:
                        break
                    # free rows exhausted on some device: grow row
                    # capacity in place (order-preserving pad — the
                    # SlotsIncreaseFactor analog, slotsmanager.cpp:419)
                    split, mstar = self._grow_rows(int(ovf),
                                                   (split, mstar))
                    f = self.fields
                else:
                    raise RuntimeError(
                        f"star spawn overflow persists ({ovf}) after "
                        "capacity growth; increase PartAllocFactor")
                self.fields = f = f2
                nstars += n_sp
            self.star_count += nstars

            # ---- winds after star formation (winds_make_after_sf /
            # sfr_wind_feedback, distributed) ----
            if self.winds_on and self.windpar:
                self._slab_winds(f, res, form, is_gas, atime, a3inv,
                                 dtime)
        elif self.cooling_on:
            from ..physics.cooling_rates import do_cooling
            cu = self.coolunits
            eom = f["egywt"] if self.density_independent_sph \
                else f["density"]
            dfac = entropy_to_u(jnp.maximum(eom, 1e-35), a3inv)
            u = f["entropy"] * dfac
            u_cgs, ne = do_cooling(
                u * cu.uu_in_cgs,
                f["density"] * a3inv * cu.density_in_phys_cgs,
                dtime * cu.tt_in_s, 1 - HYDROGEN_MASSFRAC, redshift,
                uvbg, self.coolpar,
                min_egyspec_cgs=(self.sfrpar.min_egyspec()
                                 * cu.uu_in_cgs if self.sfrpar
                                 else 0.0),
                ne_init=f["ne"], metallicity=f["met"],
                metal_cool=self.metal_cool, extra_heat=extra_heat)
            u_new = u_cgs / cu.uu_in_cgs
            upd = is_gas & (dfac > 0) & (dtime > 0)
            ent = jnp.where(upd, u_new / jnp.maximum(dfac, 1e-35),
                            f["entropy"])
            f["entropy"] = ent
            f["ne"] = jnp.where(upd, ne, f["ne"])

    def _excursion_program(self, cst):
        """Jitted shard_map for one distributed find_HII_bubbles
        pass (parallel/excursion_slab.calculate_uvbg_slab)."""
        key = ("excursion", cst, self.caps.key())
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        from .excursion_slab import calculate_uvbg_slab
        mesh = self.mesh
        ndev = mesh.devices.size
        caps = self.caps
        balance = self.balance_domains and ndev > 1
        in_specs = [P("dp"), P("dp", None), P("dp"), P("dp"),
                    P("dp"), P("dp"), P(), P()]
        out_specs = (P("dp"), P(), P(), P())

        def body(mask, ipos, mass, ptyp, sfr, fesc, zsq, sfrn,
                 cuts):
            return calculate_uvbg_slab(
                ipos, mass, ptyp, sfr, fesc, zsq, sfrn, cst, ndev,
                mask=mask, cuts_in=cuts, route_kcap=caps.pm_kcap)

        if balance:
            run = partial(shard_map, mesh=mesh,
                          in_specs=(*in_specs, P()),
                          out_specs=out_specs, check_vma=False)(
                lambda m, ip, ms, pt, sf, fe, zq, sn, cuts: body(
                    m, ip, ms, pt, sf, fe, zq, sn, cuts))
        else:
            run = partial(shard_map, mesh=mesh,
                          in_specs=tuple(in_specs),
                          out_specs=out_specs, check_vma=False)(
                lambda m, ip, ms, pt, sf, fe, zq, sn: body(
                    m, ip, ms, pt, sf, fe, zq, sn, None))
        prog = jax.jit(run)
        self._programs[key] = prog
        return prog

    def excursion_step(self):
        """One excursion-set UVBG pass at PM cadence while
        z > ExcursionSetZStop (run.cpp:653-660; the slab analog of
        GasPhysics.excursion_step).  Escape fractions come from the
        per-row FOF halo mass field (refreshed at FOF cadence);
        updates the monotone per-gas J21 and first-ionization
        redshift fields."""
        if self.excursion is None or not self.has_gas:
            return
        atime = self.atime()
        redshift = 1.0 / atime - 1.0
        if redshift <= self.excursion_zstop:
            return
        from ..physics.excursion import escape_fractions
        from ..utils.units import default_units
        from .excursion_slab import (excursion_consts,
                                     excursion_epoch_scalars)
        units = getattr(self, "units", None) or default_units()
        cst = excursion_consts(self.excursion, self.CP, units,
                               self.boxsize)
        zsq, sfrn = excursion_epoch_scalars(self.excursion, self.CP,
                                            units, atime)
        if cst.n % self.mesh.devices.size:
            raise ValueError(
                f"UVBGdim {cst.n} must divide the device count "
                f"{self.mesh.devices.size} for the slab FFT")
        f = self.fields
        alive = self._alive()
        fesc = escape_fractions(f["hmass"], self.excursion,
                                units.UnitMass_in_g,
                                self.CP.HubbleParam)
        prog = self._excursion_program(cst)
        args = (alive, f["ipos"], f["mass"], f["ptyp"], f["sfr"],
                fesc, zsq, sfrn)
        if self.balance_domains and self.mesh.devices.size > 1:
            j21p, vxhi, mxhi, n_lost = prog(*args, self._cuts_dev)
        else:
            j21p, vxhi, mxhi, n_lost = prog(*args)
        if int(n_lost) > 0:
            raise RuntimeError(
                f"excursion layout-route overflow: {int(n_lost)} "
                f"rows at pm_kcap {self.caps.pm_kcap}")
        is_gas = (f["ptyp"] == 0) & alive
        j21g = jnp.where(is_gas, j21p, 0.0)
        f["j21"] = jnp.maximum(f["j21"], j21g)
        f["zrei"] = jnp.where(
            is_gas & (f["zrei"] < 0) & (j21g > 0),
            jnp.float32(redshift), f["zrei"])
        self.excursion_xhi = (float(vxhi), float(mxhi))

    def helium_step(self, group_masses, group_cm):
        """QSO-bubble HeIII ionization at FOF cadence, distributed
        (cooling_qso_lightup.cpp turn_on_quasars).

        The QSO choice is inherently sequential (each bubble's ionized
        fraction feeds the next pick), so the pick loop runs on the
        host — rank-0 semantics, like the reference's choose_QSO_halo
        + MPI_Bcast — while each bubble's application is ONE jitted
        elementwise pass over the sharded rows plus a global fresh
        count (the reference's MPI_Allreduce of N_ionized).  Draws are
        seeded by the integer timeline so 1-device and N-device runs
        ionize identically."""
        if (self.helium is None or self.coolunits is None
                or not self.has_gas):
            return
        atime = self.atime()
        redshift = 1.0 / atime - 1.0
        if not self.helium.during(redshift):
            return
        f = self.fields
        is_gas = (f["ptyp"] == 0) & self._alive()
        n_gas = max(int(jnp.sum(is_gas.astype(jnp.int32))), 1)
        desired = self.helium.desired_ion_frac(atime)
        a3inv = 1.0 / atime ** 3
        uu = self.coolunits.uu_in_cgs
        par = self.helium.par
        from ..utils.constants import (HYDROGEN_MASSFRAC, PROTONMASS,
                                       GAMMA_MINUS1)
        from ..physics.helium_reion import HEMASS
        nheperg = (1 - HYDROGEN_MASSFRAC) / (PROTONMASS * HEMASS)
        deltau = jnp.float32(self.helium.inst_heating * nheperg / uu)

        def apply_bubble(center_u32, r2cut):
            """One bubble (or the whole box when r2cut<0): ionize
            fresh gas inside, return the global fresh count."""
            d = (f["ipos"] - center_u32[None, :]).astype(
                jnp.int32).astype(jnp.float32) * jnp.float32(
                    self.boxsize / 2 ** 32)
            inside = (jnp.sum(d * d, axis=-1)
                      < jnp.float32(r2cut)) if r2cut >= 0 \
                else jnp.ones_like(is_gas)
            fresh = inside & is_gas & ~f["heiii"]
            etou = (jnp.maximum(f["density"], 1e-35)
                    * a3inv) ** GAMMA_MINUS1 / GAMMA_MINUS1
            f["entropy"] = jnp.where(
                fresh, f["entropy"] + deltau / etou, f["entropy"])
            f["heiii"] = f["heiii"] | fresh
            return int(jnp.sum(fresh.astype(jnp.int32)))

        total = 0
        if desired > par.heIIIreion_finish_frac:
            # flash finish: ionize everything left
            total += apply_bubble(jnp.zeros(3, jnp.uint32), -1.0)
            return total

        cur = int(jnp.sum((f["heiii"] & is_gas).astype(
            jnp.int32))) / n_gas
        masses = np.asarray(group_masses)
        cand = list(np.nonzero(
            (masses > par.qso_candidate_min_mass)
            & (masses < par.qso_candidate_max_mass))[0])
        cm = np.asarray(group_cm)
        rng = np.random.RandomState(
            int(self.times.ti_current) & 0x7FFFFFFF)
        it = 0
        while cur < desired and cand and it < 10000:
            it += 1
            pick = cand.pop(rng.randint(len(cand)))
            bubble = rng.normal(par.mean_bubble,
                                np.sqrt(par.var_bubble))
            if bubble <= 0:
                continue
            center = jnp.asarray(
                (np.asarray(cm[pick]) / self.boxsize % 1.0
                 * 2 ** 32).astype(np.int64).astype(np.uint32))
            n = apply_bubble(center, bubble * bubble)
            total += n
            cur += n / n_gas
            self.helium.events.append(
                (atime, tuple(cm[pick]), cur, n))
        return total

    def _grow_rows(self, extra_per_dev: int, aux=()):
        """Grow per-device row capacity by appending dead rows to the
        END of each device's shard — order-preserving (no re-sort, no
        ownership change), so masks computed against the old layout
        remap by the same padding.  The slots capacity-growth analog
        (slotsmanager.cpp:419 sfr_reserve_slots).  aux: extra
        [N]-arrays to remap alongside; returns them remapped."""
        D = self.mesh.devices.size
        C = self.capacity
        grow = (max(extra_per_dev, 64) + 63) // 64 * 64
        C2 = C + grow

        def pad(a):
            h = np.asarray(a)
            h = h.reshape((D, C) + h.shape[1:])
            w = [(0, 0), (0, grow)] + [(0, 0)] * (h.ndim - 2)
            h = np.pad(h, w).reshape((D * C2,) + h.shape[2:])
            spec = P("dp") if h.ndim == 1 else P("dp", None)
            return jax.device_put(h, NamedSharding(self.mesh, spec))

        self.fields = {k: pad(v) for k, v in self.fields.items()}
        self.capacity = C2
        return tuple(pad(a) for a in aux)

    def _slab_winds(self, f, res, form, is_gas, atime, a3inv, dtime):
        """Wind kicks after star formation, distributed
        (winds_make_after_sf / sfr_wind_feedback).  Sources are the
        rows that formed stars this step (parent rows for splits, the
        flipped rows for whole conversions — the reference's NewStars
        list); draws are id-keyed, so any device count reproduces the
        single-device stream."""
        from ..physics.winds import (WIND_SUBGRID, winds_subgrid_step,
                                     winds_decay)
        wp = self.windpar
        if wp.has(WIND_SUBGRID):
            sm = res.sfr * dtime / jnp.maximum(
                self.sfrpar.UnitSfr_in_solar_per_year, 1e-35)
            self.rng_key, sub = jax.random.split(self.rng_key)
            # reference queues gas that formed mass but did NOT
            # spawn/convert (sfr_eff.cpp:271 newstar<0 -> flag -2)
            wres = winds_subgrid_step(
                sub, f["vel"], f["entropy"], f["density"], f["delay"],
                f["mass"], sm, f["vdsp"], atime, a3inv, wp,
                eligible=is_gas & (res.sfr > 0) & ~form,
                pids=f["id_lo"])
            vel, ent, delay0 = (wres.vel, wres.entropy,
                                wres.delay_time)
        else:
            from .subgrid_slab import gather_rows, winds_slab
            stars, valid, ovf = gather_rows(
                self.mesh,
                {"ipos": f["ipos"], "hsml": f["hsml"],
                 "mass": f["mass"], "vdisp": f["vdsp"],
                 "pid": f["id_lo"]},
                form, cap=self._spawn_cap)
            if ovf:
                raise RuntimeError(
                    f"wind source gather overflow ({ovf}); raise "
                    "_spawn_cap")
            stars = dict(stars)
            stars["hsml"] = jnp.where(
                valid, jnp.maximum(stars["hsml"], 1e-3), 0.0)
            stars["mass"] = jnp.where(valid, stars["mass"], 0.0)
            gas = {"ipos": f["ipos"], "mass": f["mass"],
                   "vel": f["vel"], "entropy": f["entropy"],
                   "density": f["density"], "delay": f["delay"],
                   "eligible": is_gas & ~form, "pid": f["id_lo"]}
            self.rng_key, sub = jax.random.split(self.rng_key)
            vel, ent, delay0 = winds_slab(
                self.mesh, sub, gas, stars, wp, self.boxsize, atime,
                a3inv)
        gas_rows = (f["ptyp"] == 0) & (f["mass"] > 0)
        f["vel"] = jnp.where(gas_rows[:, None], vel, f["vel"])
        f["entropy"] = jnp.where(gas_rows, ent, f["entropy"])
        delay = winds_decay(delay0, f["density"], a3inv, dtime, wp)
        f["delay"] = jnp.where(gas_rows, delay, f["delay"])

    def _age_myr(self, a0, a1):
        """Vectorized cosmic-time difference via a cached t(a) grid
        (simulation_gas._age_myr protocol)."""
        if self._t_grid is None:
            a_lo = min(float(np.min(a0[a0 > 0])) if np.any(a0 > 0)
                       else 0.01, 0.01)
            ag = np.geomspace(a_lo, 1.0, 257)
            tg = np.zeros_like(ag)
            for i in range(1, len(ag)):
                tg[i] = tg[i - 1] + self.CP.age_myr(ag[i - 1], ag[i])
            self._t_grid = (ag, tg)
        ag, tg = self._t_grid
        t0 = np.interp(np.maximum(a0, ag[0]), ag, tg)
        t1 = np.interp(np.maximum(a1, ag[0]), ag, tg)
        return t1 - t0

    def _slab_metal_return(self):
        """Stellar ejecta mass+metals to neighbouring gas,
        distributed (metal_return.cpp; the single-device
        simulation_gas.metal_return protocol: host-orchestrated star
        selection + per-star yield integrals — rare, scipy-based —
        with the kernel environment and ejecta scatter passes
        distributed over the slab mesh via subgrid_slab)."""
        if not (self.metal_return_on and self.metals):
            return
        from .subgrid_slab import source_env_slab, metal_return_slab
        f = self.fields
        atime = self.atime()
        alive_h = np.asarray(self._alive())
        ptyp = np.asarray(f["ptyp"])
        birth = np.asarray(f["birtha"])
        star = alive_h & (ptyp == 4) & (birth > 0)
        if not star.any():
            return
        last = np.array(np.asarray(f["enr"]), np.float64)
        age_now = np.zeros(star.shape[0])
        age_now[star] = self._age_myr(
            birth[star], np.full(int(star.sum()), atime))
        act = star & (age_now - last > self.min_enrich_window_myr)
        if not act.any():
            return
        idx = np.nonzero(act)[0]
        ns0 = len(idx)
        nbkt = max(8, 1 << (ns0 - 1).bit_length())
        idx = np.pad(idx, (0, nbkt - ns0))
        lane = np.arange(nbkt) < ns0
        ipos_h = np.asarray(f["ipos"])
        hsml_h = np.asarray(f["hsml"])
        s_ipos = jnp.asarray(ipos_h[idx])
        s_hsml = jnp.asarray(np.where(
            lane, np.maximum(hsml_h[idx], 1e-3), 0.0)
            .astype(np.float32))
        is_gas = (f["ptyp"] == 0) & self._alive()
        mass_gas = jnp.where(is_gas, f["mass"], 0.0)
        gasd = {"ipos": f["ipos"], "mass": mass_gas,
                "entropy": f["entropy"], "vel": f["vel"]}
        dens, sent, svel, fw = source_env_slab(
            self.mesh, gasd, {"ipos": s_ipos, "hsml": s_hsml},
            self.boxsize, self.kernel)
        fwh = np.asarray(fw)
        has_ngb = fwh > 1e-30

        h = self.CP.HubbleParam
        zmet = np.asarray(f["smet"])
        m0 = np.asarray(f["m0"])
        totret = np.array(np.asarray(f["tret"]), np.float64)
        mret = np.zeros(len(idx), np.float32)
        zret = np.zeros(len(idx), np.float32)
        for j, i in enumerate(idx):
            if j >= ns0 or not has_ngb[j]:
                continue
            mfrac, zfrac, _ = self.metals.star_return(
                float(zmet[i]), float(last[i]), float(age_now[i]), h)
            # never return more than 90% of the birth mass in total
            mfrac = min(mfrac, max(0.9 - totret[i], 0.0))
            mret[j] = mfrac * m0[i]
            zret[j] = min(zfrac, mfrac) * m0[i]
            totret[i] += mfrac
            last[i] = age_now[i]
        sh = NamedSharding(self.mesh, P("dp"))
        f["enr"] = jax.device_put(last.astype(np.float32), sh)
        f["tret"] = jax.device_put(totret.astype(np.float32), sh)
        if mret.sum() <= 0:
            return
        dm, dz = metal_return_slab(
            self.mesh, {"ipos": f["ipos"], "mass": mass_gas},
            {"ipos": s_ipos, "hsml": s_hsml,
             "mret": jnp.asarray(mret), "zret": jnp.asarray(zret),
             "fw": fw},
            self.boxsize, self.kernel)
        old_gmass = jnp.maximum(mass_gas, 1e-35)
        f["met"] = jnp.where(
            is_gas, (f["met"] * mass_gas + dz) / (old_gmass + dm),
            f["met"])
        new_mass = f["mass"] + jnp.where(is_gas, dm, 0.0)
        mass_after = np.array(np.asarray(new_mass))
        for j, i in enumerate(idx):
            if j >= ns0:
                continue
            mass_after[i] = max(mass_after[i] - mret[j],
                                0.1 * m0[i])
        f["mass"] = jax.device_put(mass_after, sh)

    def _seed_bh_rows(self, rows):
        """Convert the given (global) gas rows to black holes
        (fof_seed conversion: the gas particle becomes the BH, keeps
        its dynamic mass, subgrid mass starts at the seed —
        simulation_gas.seed_bh protocol on the sharded layout)."""
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        if rows.size == 0:
            return
        f = self.fields
        sh = NamedSharding(self.mesh, P("dp"))
        ptyp = np.array(np.asarray(f["ptyp"]))
        ptyp[rows] = 5
        f["ptyp"] = jax.device_put(ptyp, sh)
        bhm = np.array(np.asarray(f["bhm"]))
        bhm[rows] = self.bhpar.SeedBlackHoleMass
        f["bhm"] = jax.device_put(bhm, sh)

    def _slab_blackhole_step(self, dtime: float):
        """Accretion, feedback, swallowing, mergers, dyn. friction on
        the slab layout (blackhole.cpp; the single-device
        simulation_gas.blackhole_step protocol).  BHs are rare: the
        pack is replicated in 64-BIT-ID ORDER (device-count-invariant
        arbitration), the per-gas passes are distributed
        (subgrid_slab.bh_feedback_slab / bh_swallow_slab), and
        mergers run host-side on the unpadded pack."""
        if not (self.bh_on and self.bhpar):
            return
        from ..physics.blackhole import (BHEnv, bh_accretion,
                                         bh_drag_accel, bh_mergers,
                                         bh_soundspeed,
                                         dynamical_friction)
        from ..utils.constants import LIGHTCGS
        from ..core.particles import ipos_to_float
        from .subgrid_slab import (source_env_slab, bh_feedback_slab,
                                   bh_swallow_slab)
        f = self.fields
        alive_h = np.asarray(self._alive())
        ptyp = np.asarray(f["ptyp"])
        bh_rows = alive_h & (ptyp == 5)
        if not bh_rows.any():
            return
        atime = self.atime()
        a3inv = 1.0 / atime ** 3
        idl = np.asarray(f["id_lo"])
        ids64 = (np.asarray(f["id_hi"]).astype(np.uint64)
                 << np.uint64(32)) | idl.astype(np.uint64)
        idx = np.nonzero(bh_rows)[0]
        idx = idx[np.argsort(ids64[idx])]
        ns0 = len(idx)
        nbkt = max(8, 1 << (ns0 - 1).bit_length())
        idxp = np.pad(idx, (0, nbkt - ns0))
        lane = np.arange(nbkt) < ns0
        # per-BH dtime: own-bin dloga when active, else 0
        if jnp.ndim(dtime):
            dt_bh = jnp.asarray(np.where(
                lane, np.asarray(dtime)[idxp], 0.0).astype(np.float32))
        else:
            dt_bh = jnp.float32(dtime)

        ipos_h = np.asarray(f["ipos"])
        hsml_h = np.asarray(f["hsml"])
        vel_h = np.asarray(f["vel"])
        mass_h = np.array(np.asarray(f["mass"]))
        hsml_bh = np.minimum(np.maximum(
            hsml_h[idxp] * self.bhpar.BlackHoleNgbFactor, 1e-3),
            self.bhpar.BlackHoleMaxAccretionRadius)
        hsml_bh = np.where(lane, hsml_bh, 0.0).astype(np.float32)
        s_ipos = jnp.asarray(ipos_h[idxp])
        s_hsml = jnp.asarray(hsml_bh)

        is_gas = (f["ptyp"] == 0) & self._alive()
        mass_gas = jnp.where(is_gas, f["mass"], 0.0)
        gasd = {"ipos": f["ipos"], "mass": mass_gas,
                "entropy": f["entropy"], "vel": f["vel"]}
        dens, sent, svel, fw = source_env_slab(
            self.mesh, gasd, {"ipos": s_ipos, "hsml": s_hsml},
            self.boxsize, self.kernel)
        env = BHEnv(density=dens, entropy=sent, gas_vel=svel,
                    feedback_weight=fw)

        bhm = jnp.asarray(np.where(
            lane, np.asarray(f["bhm"])[idxp], 0.0).astype(np.float32))
        mdot = bh_accretion(bhm, jnp.asarray(vel_h[idxp]), env,
                            atime, self.gravity.G, self.bhpar)
        mdot = jnp.where(jnp.asarray(lane), mdot, 0.0)
        bhm_new = bhm + mdot * dt_bh

        # accretion-momentum drag kick (blackhole.cpp BH_DRAG)
        if getattr(self.bhpar, "BH_DRAG", 0):
            dynm = jnp.asarray(np.where(
                lane, mass_h[idxp], 0.0).astype(np.float32))
            adrag = bh_drag_accel(jnp.asarray(vel_h[idxp]),
                                  env.gas_vel, mdot, dynm, bhm,
                                  atime, self.bhpar)
            dv = np.zeros_like(vel_h)
            dt_np = (np.asarray(dt_bh)[:ns0, None] if jnp.ndim(dt_bh)
                     else float(dt_bh))
            dv[idx] = np.asarray(adrag)[:ns0] * dt_np
            f["vel"] = f["vel"] + jax.device_put(
                jnp.asarray(dv), f["vel"].sharding)

        # thermal feedback: E = eps_f * 0.1 Mdot c^2 dt (internal)
        c_int = LIGHTCGS / self.bhpar.UnitVelocity_in_cm_per_s
        energy = (self.bhpar.BlackHoleFeedbackFactor * 0.1 * mdot
                  * dt_bh * c_int ** 2)
        dent = bh_feedback_slab(
            self.mesh,
            {"ipos": f["ipos"], "mass": mass_gas,
             "density": jnp.maximum(f["density"], 1e-35)},
            {"ipos": s_ipos, "hsml": s_hsml, "energy": energy,
             "fw": fw},
            self.boxsize, a3inv, self.kernel)
        f["entropy"] = jnp.where(is_gas, f["entropy"] + dent,
                                 f["entropy"])

        # stochastic swallowing closes the subgrid/dynamic mass gap
        if self.rng_key is None:
            self.rng_key = jax.random.PRNGKey(42)
        self.rng_key, sub = jax.random.split(self.rng_key)
        salt = int(jax.random.bits(sub, dtype=jnp.uint32))
        deficit = jnp.maximum(
            bhm_new - jnp.asarray(np.where(
                lane, mass_h[idxp], 0.0).astype(np.float32)), 0.0)
        swallowed_by, gain = bh_swallow_slab(
            self.mesh, salt,
            {"ipos": f["ipos"], "mass": mass_gas, "pid": f["id_lo"]},
            {"ipos": s_ipos, "hsml": s_hsml, "deficit": deficit,
             "rho": jnp.maximum(dens, 1e-35)},
            self.boxsize, self.kernel)
        sw = np.asarray(swallowed_by)
        eaten_gas = np.nonzero(sw >= 0)[0]
        if eaten_gas.size:
            gain_h = np.asarray(gain)
            mass_h[idx] += gain_h[:ns0]
            mass_h[eaten_gas] = 0.0

        # BH-BH mergers (host-side on the UNPADDED id-ordered pack)
        bhm_np = np.asarray(bhm_new)
        cs = np.asarray(bh_soundspeed(env.entropy, env.density,
                                      atime))
        eaten_by, msub2, mdyn2 = bh_mergers(
            ipos_to_float(ipos_h[idx], self.boxsize), vel_h[idx],
            hsml_bh[:ns0], bhm_np[:ns0], mass_h[idx], ids64[idx],
            atime, cs[:ns0], self.boxsize)
        bhm_h = np.array(np.asarray(f["bhm"]))
        mdot_h = np.array(np.asarray(f["bhmd"]))
        if (eaten_by >= 0).any():
            bhm_h[idx] = msub2
            mass_h[idx] = mdyn2
            dead = idx[eaten_by >= 0]
            mass_h[dead] = 0.0
        else:
            bhm_h[idx] = bhm_np[:ns0]
        mdot_h[idx] = np.asarray(mdot)[:ns0]
        sh = NamedSharding(self.mesh, P("dp"))
        f["mass"] = jax.device_put(mass_h, sh)
        f["bhm"] = jax.device_put(bhm_h, sh)
        f["bhmd"] = jax.device_put(mdot_h, sh)

        # dynamical friction from the collisionless background
        if self.bh_dynfric_on:
            from .subgrid_slab import veldisp_slab
            alive2 = self._alive()
            coll = alive2 & (f["ptyp"] != 0) & (f["ptyp"] != 5)
            n_coll = int(jnp.sum(coll.astype(jnp.int32)))
            if n_coll:
                sep = self.boxsize / max(n_coll, 1) ** (1.0 / 3.0)
                bh_mask = np.zeros(len(ptyp), bool)
                bh_mask[idx] = mass_h[idx] > 0
                radius0 = jnp.asarray(np.where(
                    bh_mask, 2 * sep, 0.0).astype(np.float32))
                sigma, _, rho, _ = veldisp_slab(
                    self.mesh,
                    {"ipos": f["ipos"],
                     "mass": jnp.where(coll, f["mass"], 0.0),
                     "vel": f["vel"]},
                    radius0, self.boxsize, atime,
                    nlevels=self.gravity.tree_nlevels,
                    ncrit=self.gravity.tree_ncrit,
                    caps=self._veldisp_caps,
                    cuts_in=(self._cuts_dev if self.balance_domains
                             else None))
                adf = dynamical_friction(
                    f["vel"], rho, sigma, f["bhm"], atime,
                    self.gravity.G)
                bh_m = jnp.asarray(bh_mask)
                dt_rows = (dtime[:, None] if jnp.ndim(dtime)
                           else jnp.float32(dtime))
                f["vel"] = jnp.where(
                    bh_m[:, None],
                    f["vel"] + adf * dt_rows, f["vel"])

    def _update_vdisp_slab(self):
        """PM-cadence refresh of the per-gas DM velocity dispersion
        for sigma-based wind models (run.cpp:662-663;
        subgrid_slab.veldisp_slab over the slab ghost halos)."""
        from ..physics.winds import WIND_FIXED_EFFICIENCY
        if not (self.has_gas and self.winds_on and self.windpar) or \
                self.windpar.has(WIND_FIXED_EFFICIENCY):
            return
        from .subgrid_slab import veldisp_slab
        f = self.fields
        alive = self._alive()
        is_gas = (f["ptyp"] == 0) & alive
        is_dm = (f["ptyp"] == 1) & alive
        dm_mass = jnp.where(is_dm, f["mass"], 0.0)
        radius0 = jnp.where(is_gas,
                            jnp.maximum(f["hsml"] * 2, 1e-3), 0.0)
        sigma, _, _, _ = veldisp_slab(
            self.mesh,
            {"ipos": f["ipos"], "mass": dm_mass, "vel": f["vel"]},
            radius0, self.boxsize, self.atime(),
            nlevels=self.gravity.tree_nlevels,
            ncrit=self.gravity.tree_ncrit,
            caps=self._veldisp_caps,
            cuts_in=self._cuts_dev if self.balance_domains else None)
        f["vdsp"] = jnp.where(is_gas, sigma, f["vdsp"])

    # ---------------- KDK pieces ----------------
    def _drift_all(self, ti_next: int):
        fac = self.timeline.exact_drift_factor(
            self.CP, self.times.ti_current, ti_next)
        self.fields["ipos"] = _drift_fields(
            self.fields["ipos"], self.fields["vel"], self._alive(),
            jnp.float32(fac), jnp.float32(POS_SCALE / self.boxsize))
        self.times.ti_current = ti_next
        for b in range(TIMEBINS + 1):
            if is_timebin_active(b, ti_next):
                self.times.ti_lastactivedrift[b] = ti_next

    def _apply_half_kick(self, skip_grav: bool = False):
        gk, hk, dte = gravkick_tables(self.CP, self.timeline,
                                      self.times)
        if not skip_grav:
            self.fields["vel"] = _kick_bins(
                self.fields["vel"], self.fields["gacc"],
                self.fields["tbin"], gk, self._alive())
        if self.has_gas:
            # hydro kick + entropy half-update (do_hydro_kick)
            f = self.fields
            is_gas = (f["ptyp"] == 0) & self._alive()
            bins = f["tbin"].astype(jnp.int32)
            hkf = jnp.where(is_gas, hk[bins], 0.0)
            dtef = jnp.where(is_gas, dte[bins], 0.0)
            vel = f["vel"] + f["hacc"] * hkf[:, None]
            # hard gas velocity cap (do_hydro_kick,
            # timestep.cpp:988-998 MaxGasVel)
            atime = self.atime()
            vv = jnp.linalg.norm(vel, axis=-1)
            over = is_gas & (vv / atime > self.tsp.MaxGasVel) \
                & (vv > 0)
            scale = jnp.where(over, self.tsp.MaxGasVel * atime
                              / jnp.maximum(vv, 1e-35), 1.0)
            f["vel"] = vel * scale[:, None]
            f["entropy"] = f["entropy"] + dtef * f["dts"]

    def _apply_pm_half_kick(self):
        t0 = self.times.pm_kick
        t1 = t0 + self.times.pm_length // 2
        fac = self.timeline.exact_gravkick_factor(self.CP, t0, t1)
        self.fields["vel"] = _kick_pm_all(
            self.fields["vel"], self.fields["gpm"], self._alive(),
            jnp.float32(fac))
        self.times.pm_kick = t1

    def _find_timesteps(self, first_step: bool):
        times = self.times
        is_pm = times.is_pm()
        f = self.fields
        atime = self.atime()
        alive_h = np.asarray(self._alive())
        if is_pm:
            asmth_internal = (self.gravity.asmth * self.boxsize
                              / self.gravity.nmesh)
            ptype = (np.asarray(f["ptyp"], np.int8) if self.has_gas
                     else np.full(alive_h.shape[0], 1, np.int8))
            dloga_pm = long_range_dloga(
                f["vel"], f["mass"], ptype, alive_h, atime, self.CP,
                self.boxsize, asmth_internal, self.tsp)
            dti = round_down_power_of_two(
                self.timeline.dti_from_dloga(dloga_pm,
                                             times.ti_current))
            dti_max = (self.timeline.find_next_ti_sync(
                times.ti_current) - times.pm_kick)
            times.pm_length = min(dti, dti_max)
            times.pm_start = times.pm_kick

        hubble = float(self.CP.hubble_function(atime))
        accel_tot = f["gacc"] + f["gpm"]
        dloga = gravity_dloga(accel_tot, atime, hubble,
                              self.gravity.softening,
                              self.tsp.ErrTolIntAccuracy)
        if self.has_gas:
            # Courant + hsml-change limits for gas rows
            from ..core.integrate import hydro_dloga
            dl_h = hydro_dloga(f["hsml"], f["mvsig"], f["dth"],
                               atime, hubble, self.tsp.CourantFac)
            is_gas = (f["ptyp"] == 0) & self._alive()
            dloga = jnp.where(is_gas, jnp.minimum(dloga, dl_h),
                              dloga)
        self.fields["oldacc"] = (
            jnp.linalg.norm(accel_tot, axis=-1) / self.gravity.G)
        active = np.asarray(self._active_mask())
        if first_step:
            active = alive_h
        newbins, bad = assign_timebins(
            np.asarray(dloga), np.asarray(f["tbin"], np.int32),
            active & alive_h, times, self.timeline,
            self.tsp.MinSizeTimestep)
        self.fields["tbin"] = jax.device_put(
            newbins.astype(np.int32),
            NamedSharding(self.mesh, P("dp")))
        occupied = newbins[alive_h]
        if occupied.size:
            times.mintimebin = int(occupied.min())
            times.maxtimebin = int(occupied.max())
        if is_pm and times.pm_length < dti_from_timebin(
                times.maxtimebin):
            times.pm_length = dti_from_timebin(times.maxtimebin)
        return bad

    def _active_mask(self):
        bins_active = active_bins_mask(self.times.ti_current)
        tb = np.asarray(self.fields["tbin"])
        return bins_active[tb] & np.asarray(self._alive())

    # -------- hierarchical (split) gravity timesteps --------
    # (Gadget-4 scheme, timestep.cpp:247-566, distributed: each
    # level's force is one masked-source slab stencil pass)

    def _largest_active_bin(self) -> int:
        times = self.times
        for b in range(TIMEBINS, -1, -1):
            if is_timebin_active(b, times.ti_current) and \
                    dti_from_timebin(b) <= max(times.pm_length, 1):
                return b
        return TIMEBINS

    def _hier_accel_program(self):
        """Jitted shard_map: masked-source short-range gravity on the
        CURRENT slab layout (no migration exchange — rows are already
        homed by this step's force program; ghosts ride the halo
        exchange inside stencil_forces_slab)."""
        key = ("hier", self.caps.key())
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        from .sharded import stencil_forces_slab, stencil_static_config
        from ..gravity.stencil import default_tbc
        mesh = self.mesh
        ndev = mesh.devices.size
        caps = self.caps
        C = self.capacity
        g = self.gravity
        sp = self.gravity.short()
        if self.window_tables is None and \
                self.gravity.window_type == "exact":
            self.window_tables = get_window_tables(self.gravity)
        wt = self.window_tables
        if caps.st_tbc == 0:
            _, _, T = stencil_static_config(C, g.refine_sub, 7, sp)
            caps.st_tbc = default_tbc(T, g.refine_sub)
            key = ("hier", caps.key())
        balance = self.balance_domains and ndev > 1

        def body(ipos, mass_sel, cuts):
            acc, _pot, tinfo = stencil_forces_slab(
                {"ipos": ipos, "mass": mass_sel}, sp, wt, ndev,
                caps.gcap or C, caps.st_tbc, caps.st_pcaps,
                caps.st_ncaps, sub=g.refine_sub, cuts_in=cuts)
            return acc, tinfo

        if balance:
            run = partial(shard_map, mesh=mesh,
                          in_specs=(P("dp", None), P("dp"), P()),
                          out_specs=(P("dp", None),
                                     {"halo_lost": P(),
                                      "walk_overflow": P(),
                                      "st_diag": P()}),
                          check_vma=False)(
                lambda ip, ms, cuts: body(ip, ms, cuts))
        else:
            run = partial(shard_map, mesh=mesh,
                          in_specs=(P("dp", None), P("dp")),
                          out_specs=(P("dp", None),
                                     {"halo_lost": P(),
                                      "walk_overflow": P(),
                                      "st_diag": P()}),
                          check_vma=False)(
                lambda ip, ms: body(ip, ms, None))
        prog = jax.jit(run)
        self._programs[key] = prog
        return prog

    def _active_source_accel(self, sel):
        """Short-range gravity with ONLY the selected rows as sources
        AND targets (force_tree_active_moments semantics — the
        active-set symmetry keeps each level momentum-conserving).
        sel: host bool mask over rows."""
        f = self.fields
        mass_sel = jnp.where(jnp.asarray(sel), f["mass"], 0.0)
        for _ in range(6):
            prog = self._hier_accel_program()
            if self.balance_domains and self.mesh.devices.size > 1:
                acc, tinfo = prog(f["ipos"], mass_sel,
                                  self._cuts_dev)
            else:
                acc, tinfo = prog(f["ipos"], mass_sel)
            if (int(tinfo["halo_lost"]) > 0
                    or int(tinfo["walk_overflow"]) > 0):
                info = {"unsent": 0, "dropped": 0,
                        "halo_lost": tinfo["halo_lost"],
                        "st_diag": tinfo["st_diag"]}
                if self._grow_from_diag(info):
                    continue
            return acc
        raise RuntimeError("hierarchical gravity: caps did not "
                           "converge after 6 regrows")

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
        f = self.fields
        fac = jnp.where(jnp.asarray(sel) & self._alive(),
                        jnp.float32(gk), 0.0)
        f["vel"] = f["vel"] + accel * fac[:, None]

    def _hier_second_half(self):
        """Closing gravity kicks with per-level active-source forces
        (hierarchical_gravity_accelerations, timestep.cpp:483-566)."""
        largest = self._largest_active_bin()
        active = np.asarray(self._active_mask())
        tb = np.asarray(self.fields["tbin"])
        accel = None
        last_count = -1
        for ti in range(largest, max(self.times.mintimebin, 1) - 1,
                        -1):
            sel = active & (tb <= ti)
            cnt = int(sel.sum())
            if cnt == 0:
                break
            if cnt != last_count:
                accel = self._active_source_accel(sel)
                last_count = cnt
            self._hier_grav_kick(sel, accel, ti, largest)
            if ti == largest:
                # the top-level (all-active) force is the stored one
                # used for timesteps next step
                self.fields["gacc"] = accel

    def _hier_first_half(self, first_step: bool) -> int:
        """Assign gravity timebins and do the opening kicks
        (hierarchical_gravity_and_timesteps, timestep.cpp:307-480).
        Distributed mirror of simulation._hier_first_half; the bin
        bookkeeping is host-side on gathered [N] scalars (device-count
        invariant — the histogram push-down sees the GLOBAL bins)."""
        times = self.times
        is_pm = times.is_pm()
        f = self.fields
        atime = self.atime()
        alive_h = np.asarray(self._alive())
        if is_pm:
            asmth_internal = (self.gravity.asmth * self.boxsize
                              / self.gravity.nmesh)
            ptype = (np.asarray(f["ptyp"], np.int8) if self.has_gas
                     else np.full(alive_h.shape[0], 1, np.int8))
            dloga_pm = long_range_dloga(
                f["vel"], f["mass"], ptype, alive_h, atime, self.CP,
                self.boxsize, asmth_internal, self.tsp)
            dti = round_down_power_of_two(
                self.timeline.dti_from_dloga(dloga_pm,
                                             times.ti_current))
            dti_max = (self.timeline.find_next_ti_sync(
                times.ti_current) - times.pm_kick)
            times.pm_length = min(dti, dti_max)
            times.pm_start = times.pm_kick

        largest = self._largest_active_bin()
        hubble = float(self.CP.hubble_function(atime))
        accel_tot = f["gacc"] + f["gpm"]
        dloga = gravity_dloga(accel_tot, atime, hubble,
                              self.gravity.softening,
                              self.tsp.ErrTolIntAccuracy)
        if self.has_gas:
            from ..core.integrate import hydro_dloga
            dl_h = hydro_dloga(f["hsml"], f["mvsig"], f["dth"],
                               atime, hubble, self.tsp.CourantFac)
            is_gas = (f["ptyp"] == 0) & self._alive()
            dloga = jnp.where(is_gas, jnp.minimum(dloga, dl_h),
                              dloga)
        self.fields["oldacc"] = (
            jnp.linalg.norm(accel_tot, axis=-1) / self.gravity.G)
        active = np.asarray(self._active_mask())
        if first_step:
            active = alive_h
        newbins, bad = assign_timebins(
            np.asarray(dloga), np.asarray(f["tbin"], np.int32),
            active & alive_h, times, self.timeline,
            self.tsp.MinSizeTimestep)
        newbins = np.minimum(newbins, largest)

        # push-down: on PM steps, collapse a sparse top bin into the
        # one below so the top-level force need not be recomputed
        if is_pm:
            counts = np.bincount(newbins[active & alive_h],
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
        self.fields["tbin"] = jax.device_put(
            newbins.astype(np.int32),
            NamedSharding(self.mesh, P("dp")))
        occupied = newbins[alive_h]
        if occupied.size:
            times.mintimebin = int(occupied.min())
            times.maxtimebin = int(occupied.max())
        if is_pm and times.pm_length < dti_from_timebin(
                times.maxtimebin):
            times.pm_length = dti_from_timebin(times.maxtimebin)

        # opening kicks: top bin uses the stored (all-source) accel
        tb = newbins
        sel = active & alive_h & (tb <= largest)
        if sel.any():
            self._hier_grav_kick(sel, self.fields["gacc"],
                                 largest, largest)
        accel = None
        last_count = -1
        for ti in range(largest - 1, 0, -1):
            sel = active & alive_h & (tb <= ti)
            cnt = int(sel.sum())
            if cnt == 0:
                times.mintimebin = max(times.mintimebin, ti + 1)
                break
            if cnt != last_count:
                accel = self._active_source_accel(sel)
                last_count = cnt
            self._hier_grav_kick(sel, accel, ti, largest)
        return bad

    def _rebalance_cuts(self):
        """Re-cut slab boundaries from the drifted column histogram
        (PM-step cadence — the reference re-decomposes at the same
        cadence, run.cpp:434-451 / domain.cpp retry policies).  The
        next force program's exchange migrates rows to the new
        ownership; cuts are traced data, so no recompile."""
        from .domain import balance_cuts, cuts_fp_from_planes
        ncols = _BALANCE_COLS
        x = np.asarray(self.fields["ipos"][:, 0])
        alive = np.asarray(self._alive())
        cols = (x[alive].astype(np.uint64) * np.uint64(ncols)
                >> np.uint64(32)).astype(np.int64)
        hist = np.bincount(cols, minlength=ncols)
        cuts = balance_cuts(hist, self.mesh.devices.size)
        self.cuts_planes = cuts
        self._cuts_dev = jnp.asarray(
            cuts_fp_from_planes(cuts, ncols))

    # ---------------- main loop ----------------
    def run(self, max_steps: int = 10 ** 9):
        """run.cpp:331-822 protocol, every stage distributed.  The
        stage ORDER is single-sited in core/step_protocol
        (run_protocol), shared with the single-device loop; this
        class provides the distributed stage implementations via the
        proto_* adapters below."""
        from ..core.step_protocol import run_protocol
        return run_protocol(self, max_steps)

    # ---------- step-protocol adapters (core/step_protocol) -------
    def proto_drift(self, ti_next):
        a0 = self.atime()
        self._drift_all(ti_next)
        if self.on_drift is not None:
            # lightcone crossings etc. (lightcone.cpp rides the
            # drift exactly like the single-device loop)
            self.on_drift(self, a0, self.atime())

    def proto_forces(self, is_pm, first):
        """Forces (exchange + PM on PM steps + tree every step); PM
        steps first re-cut the slab boundaries to the drifted
        particle load."""
        if is_pm:
            # reference redraws the box shift at each full domain
            # decomposition, i.e. every PM step (run.cpp:426-428)
            self._apply_random_offset()
        if is_pm and self.balance_domains \
                and self.mesh.devices.size > 1 and not first:
            self._rebalance_cuts()
        self._forces(with_pm=is_pm, first=first)
        self._wt("Tree")
        if self.has_gas:
            # distributed SPH on the freshly slab-owned gas
            # (run.cpp:482-505; predictors use last-step accels)
            self._gas_density_hydro(first)
        if self.hierarchical and not first:
            # per-level closing kicks with active-source forces
            # (the forces-stage gacc is superseded per level)
            self._hier_second_half()

    def proto_sources(self, is_pm, first):
        if not (self.has_gas and not first
                and (self.cooling_on or self.sfr_on)):
            return
        times = self.times
        if is_pm:
            # sigma-based winds refresh vdisp once per PM step
            # (run.cpp:662-663)
            self._update_vdisp_slab()
            # excursion-set J21 recomputed at PM cadence
            # (run.cpp:653-660 uvbg block)
            if self.excursion is not None:
                self.excursion_step()
        # per-row dtime: the particle's OWN bin dloga when the bin
        # is at a kick boundary, else 0 (sfr_eff.cpp
        # cooling_and_starformation get_dloga_for_bin — the global
        # min-bin dloga under-applies the eEOS relaxation and lets
        # shock-heated SF gas run away)
        hubble = float(self.CP.hubble_function(self.atime()))
        dt_tab = np.array(
            [self.timeline.get_dloga_for_bin(
                b, times.ti_current) / hubble
             for b in range(TIMEBINS + 1)], np.float32)
        dt_tab *= active_bins_mask(times.ti_current)
        dt_rows = jnp.asarray(dt_tab)[jnp.clip(
            self.fields["tbin"].astype(jnp.int32), 1,
            TIMEBINS)]
        self._gas_source_terms(dt_rows)
        self._wt("Cooling")
        # black holes: accretion/feedback/swallow/mergers
        self._slab_blackhole_step(dt_rows)
        self._wt("BH")
        # stellar mass + metal return (metal_return.cpp)
        self._slab_metal_return()
        self._wt("MetalReturn")

    def proto_snapshot(self, atime):
        if self.on_snapshot:
            self.on_snapshot(self, atime)

    def proto_checkpoint(self, cb, atime):
        cb(self, atime)

    def proto_pre_timestep(self):
        pass

    def proto_bad_timestep(self, bad):
        raise RuntimeError(f"{bad} bad timesteps at step "
                           f"{self.step_count}")

    # ---------------- host-side views ----------------
    def gather_alive(self) -> dict:
        """Host dict of alive rows + 64-bit ids (tests/outputs)."""
        out = collect_alive({k: v for k, v in self.fields.items()})
        out["id"] = ((out.pop("id_hi").astype(np.uint64)
                      << np.uint64(32))
                     | out.pop("id_lo").astype(np.uint64))
        return out
