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
from .pfft import pm_forces_slab


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
    walltime: object = None
    balance_domains: bool = False  # cost-balanced slab cuts
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
    # distributed subgrid sources (elementwise; winds/BH/metal-return
    # stay single-device — they need neighbour passes or row spawns)
    cooling_on: bool = False
    sfr_on: bool = False
    coolpar: object = None
    treecool: object = None
    sfrpar: object = None
    coolunits: object = None
    rng_key: object = None
    star_count: int = 0

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
            for name in ("met", "sfr", "grho", "birtha"):
                f[name] = jax.device_put(zs.copy(), sh)
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
        key = (with_pm, first, self.caps.key())
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
            key = (with_pm, first, caps.key())

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

        def body(fields, cuts):
            fields, xinfo = exchange(fields, ndev, caps.kcap,
                                     cuts_in=cuts)
            alive = fields["mass"] > 0
            ps = None
            pm_lost = jnp.zeros((), jnp.int32)
            if with_pm:
                gpm, ps, pm_lost = pm_forces_slab(
                    fields["ipos"], fields["mass"], cfg_pm, ndev,
                    halo=2, mask=alive, want_power=True,
                    cuts_in=cuts, route_kcap=caps.pm_kcap)
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

    def _forces(self, with_pm: bool, first: bool = False):
        """Run the force program, regrowing static caps on overflow."""
        for _ in range(8):
            prog = self._force_program(with_pm, first)
            if self.balance_domains and self.mesh.devices.size > 1:
                out = prog(self.fields, self._cuts_dev)
            else:
                out = prog(self.fields)
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
                egywt = new_egywt
                if maxdiff < 1e-3:
                    stop = True
            mg("entropy", entropy)
            mg("egywt", jnp.maximum(egywt, 1e-35))
            self._entropy_is_u = False
            entvar = jnp.maximum(f["entropy"], 1e-35) ** (1.0 / GAMMA)

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
        hfields = {
            "ipos": f["ipos"], "mass": mass_gas, "vel": vel_p,
            "hsml": f["hsml"], "density": f["density"],
            "eomdensity": eom, "entvar": entvar, "pressure": press,
            "divvel": f["divv"], "curlvel": f["curlv"],
            "dhsml_egy": f["dhsml_egy"], "dloga": zs,
            "decoupled": jnp.zeros(press.shape[0], bool),
            "f1": f1, "egyrho": eom, "dhsml": f["dhsml_egy"],
        }
        (hacc, dts_raw, mvsig), hinfo = hydro_slab(
            self.mesh, hfields, par, tf, spec=self.kernel,
            caps=self._hydro_caps, cuts_in=cuts)
        hub_a2 = tf["hubble_a2"]
        dts = dts_raw * GAMMA_MINUS1 / (
            hub_a2 * jnp.maximum(f["density"], 1e-35)
            ** GAMMA_MINUS1)
        f["hacc"] = jnp.where(is_gas[:, None], hacc, f["hacc"])
        mg("dts", dts)
        mg("mvsig", mvsig)
        self._wt("SPHHydro")

    def _gas_source_terms(self, dtime: float):
        """Strang-split cooling + star formation on the sharded gas
        (cooling_and_starformation, run.cpp:604-681 — ELEMENTWISE
        per-particle work, so it shards with zero communication).

        Star formation converts whole gas rows in place (ptype flip,
        make_particle_star); generation-split SPAWNS need new rows and
        are not supported multi-chip — require Generations == 1."""
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
        mass_gas = jnp.where(is_gas, f["mass"], 0.0)

        if self.sfr_on:
            if self.sfrpar.Generations != 1:
                raise NotImplementedError(
                    "--mesh star formation requires Generations=1 "
                    "(whole-row conversions; splits spawn rows)")
            if self.rng_key is None:
                self.rng_key = jax.random.PRNGKey(42)
            self.rng_key, sub = jax.random.split(self.rng_key)
            res = starformation_step(
                sub, f["density"], f["egywt"], f["entropy"],
                mass_gas, f["ne"], f["met"], f["gen"], dtime, a3inv,
                redshift, uvbg, self.sfrpar, self.coolpar,
                self.coolunits, is_gas, gradrho_mag=f["grho"],
                hsml=f["hsml"])
            f["entropy"] = jnp.where(is_gas, res.entropy,
                                     f["entropy"])
            f["ne"] = jnp.where(is_gas, res.ne, f["ne"])
            f["met"] = jnp.where(is_gas, res.metallicity, f["met"])
            f["sfr"] = jnp.where(is_gas, res.sfr, f["sfr"])
            conv = is_gas & res.form_star & res.convert_whole
            f["ptyp"] = jnp.where(conv, jnp.int32(4), f["ptyp"])
            f["birtha"] = jnp.where(conv, jnp.float32(atime),
                                    f["birtha"])
            self.star_count += int(jnp.sum(conv.astype(jnp.int32)))
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
                ne_init=f["ne"], metallicity=f["met"])
            u_new = u_cgs / cu.uu_in_cgs
            ent = jnp.where(is_gas & (dfac > 0),
                            u_new / jnp.maximum(dfac, 1e-35),
                            f["entropy"])
            f["entropy"] = ent
            f["ne"] = jnp.where(is_gas, ne, f["ne"])

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

    def _apply_half_kick(self):
        gk, hk, dte = gravkick_tables(self.CP, self.timeline,
                                      self.times)
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
            f["vel"] = f["vel"] + f["hacc"] * hkf[:, None]
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
        """run.cpp:331-822 protocol, every stage distributed."""
        first = self.step_count == 0
        while max_steps > 0:
            max_steps -= 1
            times = self.times
            self._wt("Misc")
            if not first:
                ti_next = find_next_kick(times.ti_current,
                                         times.mintimebin)
                ti_next = min(ti_next,
                              times.pm_start + times.pm_length)
                self._drift_all(ti_next)
                self._wt("Drift")
            is_pm = times.is_pm()

            # forces (exchange + PM on PM steps + tree every step);
            # PM steps first re-cut the slab boundaries to the
            # drifted particle load
            if is_pm and self.balance_domains \
                    and self.mesh.devices.size > 1 and not first:
                self._rebalance_cuts()
            self._forces(with_pm=is_pm, first=first)
            self._wt("Tree")
            if self.has_gas:
                # distributed SPH on the freshly slab-owned gas
                # (run.cpp:482-505; predictors use last-step accels)
                self._gas_density_hydro(first)

            if not first:
                self._apply_half_kick()
            update_kick_times(times)
            if is_pm and not first:
                self._apply_pm_half_kick()

            # Strang-split sources after the kick (run.cpp:604-681)
            if self.has_gas and not first \
                    and (self.cooling_on or self.sfr_on):
                dloga_src = self.timeline.get_dloga_for_bin(
                    max(times.mintimebin, 1), times.ti_current)
                hubble = float(self.CP.hubble_function(self.atime()))
                self._gas_source_terms(dloga_src / hubble)
                self._wt("Cooling")

            sp = self.timeline.find_current_sync_point(
                times.ti_current)
            if sp is not None and sp.write_snapshot:
                if self.on_snapshot:
                    self.on_snapshot(self, self.atime())
                self.snapshots.append(self.atime())
                self._wt("Snapshot")

            if self.timeline.find_next_sync_point(times.ti_current) \
                    is None:
                break

            bad = self._find_timesteps(first_step=first)
            self._wt("Timeline")
            if bad:
                raise RuntimeError(f"{bad} bad timesteps at step "
                                   f"{self.step_count}")
            self._apply_half_kick()
            if is_pm:
                self._apply_pm_half_kick()
            self.step_count += 1
            first = False
            if self.on_step:
                self.on_step(self)
        return self

    # ---------------- host-side views ----------------
    def gather_alive(self) -> dict:
        """Host dict of alive rows + 64-bit ids (tests/outputs)."""
        out = collect_alive({k: v for k, v in self.fields.items()})
        out["id"] = ((out.pop("id_hi").astype(np.uint64)
                      << np.uint64(32))
                     | out.pop("id_lo").astype(np.uint64))
        return out
