"""Gas physics stages for the Simulation driver (run.cpp gas sections).

Extends the DM TreePM loop with, per step (matching run.cpp:458-681):
  * gas-tree density with adaptive smoothing lengths  (run.cpp:488)
  * hydro accelerations                               (run.cpp:505)
  * hydro kick + entropy update in apply_half_kick
  * Strang-split source terms after the kick: cooling, star formation
    (gas->star conversion via ptype flip), subgrid winds
    (run.cpp:604-681)

Gas rows occupy the array prefix [0, ngas); stars converted from gas
keep their row (ptype 0 -> 4) so all shapes stay static.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.particles import GAS, STAR
from .utils.constants import (GAMMA, GAMMA_MINUS1, HYDROGEN_MASSFRAC,
                              LIGHTCGS)
from .ops.tree import build_octree
from .sph.kernels import CUBIC, KERNELS, desnumngb
from .sph.density import density as sph_density, make_gas_payload
from .sph.hydro import (HydroParams, hydro_walk, balsara_f1,
                        pressure_predict)
from .physics.cooling_rates import CoolingParams, TreeCool, UVBG
from .physics.sfr import (SFRParams, CoolingUnits, starformation_step,
                          entropy_to_u)
from .physics.winds import WindParams, winds_subgrid_step, winds_decay, \
    is_decoupled

# max split-spawns handled by the on-device star-conversion path per
# step; more (or a full free-slot pool) falls back to the host path.
_KSPAWN = 512


def _sf_stats_reduce(gas_alive, sfr, form, whole, mstar, dtime,
                     mask_full):
    """All per-step SF bookkeeping reductions in ONE device program:
    one host pull instead of six (each pull is a full tunnel
    round-trip on the axon TPU).  Returns
    [sfr_sum, sm_sum, spawned_mass, n_sf, n_act, dt_sum,
     n_split, n_whole, n_free] as f32 (counts < 2^24 — exact)."""
    f = jnp.float32
    return jnp.stack([
        jnp.sum(jnp.where(gas_alive, sfr, 0.0)).astype(f),
        jnp.sum(jnp.where(gas_alive, sfr * dtime, 0.0)).astype(f),
        jnp.sum(jnp.where(gas_alive & form, mstar, 0.0)).astype(f),
        jnp.sum(gas_alive & (sfr > 0)).astype(f),
        jnp.sum(gas_alive & (dtime > 0)).astype(f),
        jnp.sum(jnp.where(gas_alive, dtime, 0.0)).astype(f),
        jnp.sum(form & ~whole).astype(f),
        jnp.sum(form & whole).astype(f),
        jnp.sum(~mask_full).astype(f)])


def _convert_stars_kernel(kspawn, ipos, vel, hsml, tb, idlo, idhi,
                          mass, mask, ptype, birth, enr, m0, smet,
                          gen, sfr, delay, bhm, bhmd, gmet,
                          form, whole, mstar, atime):
    """Device-side gas->star conversion (make_particle_star +
    slots_split_particle analog, sfr_eff.cpp:604).  The host path
    (`GasPhysics._convert_stars`) pulls+pushes ~20 full-length arrays
    over the tunnel every SF step; this does the same masked updates
    as one jitted program.  kspawn is a static cap on split spawns —
    the caller guarantees n_split <= kspawn and enough free rows.

    Semantics mirror the host path exactly: whole conversions flip
    the gas row in place; splits copy the parent row onto the first
    free (dead) rows in ascending order, take mass_of_star, bump the
    parent generation, and tag the child ID with the generation in
    the top byte."""
    n = mask.shape[0]
    ngas = sfr.shape[0]
    conv_w = form & whole
    conv_s = form & ~whole
    full_w = jnp.zeros((n,), bool).at[:ngas].set(conv_w)
    gmet_full = jnp.zeros((n,), gmet.dtype).at[:ngas].set(gmet)
    at32 = jnp.asarray(atime, birth.dtype)

    # --- whole conversions: flip in place ---
    ptype = jnp.where(full_w, STAR, ptype)
    birth = jnp.where(full_w, at32, birth)
    enr = jnp.where(full_w, 0.0, enr)
    m0 = jnp.where(full_w, mass, m0)
    smet = jnp.where(full_w, gmet_full, smet)
    sfr = jnp.where(conv_w, 0.0, sfr)

    # --- split spawns onto the first free rows ---
    nspawn = jnp.sum(conv_s)
    src = jnp.nonzero(conv_s, size=kspawn, fill_value=ngas)[0]
    lane = jnp.arange(kspawn) < nspawn
    free = jnp.nonzero(~mask, size=kspawn, fill_value=n)[0]
    dst = jnp.where(lane, free, n)            # n = out of bounds -> drop
    srcc = jnp.minimum(src, ngas - 1)         # clamped gather index
    src_w = jnp.where(lane, src, n)
    ms = jnp.where(lane, mstar[srcc], 0.0)
    gen_child = gen[srcc] + 1

    # parent: loses the star mass, generation bumps
    mass = mass.at[src_w].add(-ms, mode="drop")
    gen = gen.at[src_w].set(jnp.where(lane, gen_child, 0),
                            mode="drop")
    # child row: copy of the parent, stellar bookkeeping reset
    mask = mask.at[dst].set(True, mode="drop")
    ptype = ptype.at[dst].set(STAR, mode="drop")
    mass = mass.at[dst].set(jnp.where(lane, mstar[srcc], 0.0),
                            mode="drop")
    ipos = ipos.at[dst].set(ipos[srcc], mode="drop")
    vel = vel.at[dst].set(vel[srcc], mode="drop")
    hsml = hsml.at[dst].set(hsml[srcc], mode="drop")
    tb = tb.at[dst].set(tb[srcc], mode="drop")
    idlo = idlo.at[dst].set(idlo[srcc], mode="drop")
    idhi = idhi.at[dst].set(
        idhi[srcc] | (gen_child.astype(jnp.uint32) << 24),
        mode="drop")
    birth = birth.at[dst].set(at32, mode="drop")
    enr = enr.at[dst].set(0.0, mode="drop")
    m0 = m0.at[dst].set(ms, mode="drop")
    smet = smet.at[dst].set(gmet[srcc], mode="drop")
    # reused gas-prefix rows become stars: scrub stale gas state
    dst_g = jnp.where(dst < ngas, dst, n)
    sfr = sfr.at[dst_g].set(0.0, mode="drop")
    delay = delay.at[dst_g].set(0.0, mode="drop")
    bhm = bhm.at[dst_g].set(0.0, mode="drop")
    bhmd = bhmd.at[dst_g].set(0.0, mode="drop")

    return (ipos, vel, hsml, tb, idlo, idhi, mass, mask, ptype,
            birth, enr, m0, smet, gen, sfr, delay, bhm, bhmd)


def _metal_return_act(mask, ptype, birth, last, ag, tg, atime,
                      min_window):
    """Device-side enrichment-activity decision (metal_return.cpp
    metal_return_priv->StellarAges gating): stellar ages from a
    precomputed t(a) grid, activity = age window since last
    enrichment > min_window.  Returns (count, act mask, ages)."""
    t1 = jnp.interp(jnp.maximum(jnp.asarray(atime, jnp.float32),
                                ag[0]), ag, tg)
    t0 = jnp.interp(jnp.maximum(birth, ag[0]), ag, tg)
    age = jnp.where(birth > 0, t1 - t0, 0.0)
    star = mask & (ptype == STAR) & (birth > 0)
    act = star & (age - last > min_window)
    return jnp.sum(act), act, age


def _metal_return_gather(nbkt, act, age, zmet, m0, totret, last):
    """Gather the per-active-star scalars into a pow2 bucket on
    device — the host loop then sees KB, not the full arrays."""
    n = act.shape[0]
    idx = jnp.nonzero(act, size=nbkt, fill_value=n)[0]
    c = jnp.minimum(idx, n - 1)
    return idx, zmet[c], last[c], age[c], m0[c], totret[c]


def _metal_return_apply(idx, lane, updm, mret, zret, last, totret,
                        last_new, totret_new, sipos, shsml, fw,
                        gipos, gmass, alive, metallicity, mass,
                        m0_s, boxsize, kernel, metal_return_step):
    """Apply one enrichment round on device: scatter the updated
    enrichment clocks, kernel-scatter the ejecta onto gas
    (metal_return_step), and subtract the returned mass from the
    stars with the 10%-of-birth-mass floor."""
    n = mass.shape[0]
    ngg = gmass.shape[0]
    tgt_u = jnp.where(lane & updm, idx, n)
    last = last.at[tgt_u].set(last_new, mode="drop")
    totret = totret.at[tgt_u].set(totret_new, mode="drop")
    dm, dz = metal_return_step(sipos, shsml, mret, zret, fw,
                               gipos, gmass, alive, boxsize, kernel)
    old_gmass = jnp.maximum(gmass, 1e-35)
    new_metal = jnp.where(
        alive, (metallicity * gmass + dz) / (old_gmass + dm),
        metallicity)
    new_mass = mass.at[:ngg].add(jnp.where(alive, dm, 0.0))
    idx_c = jnp.minimum(idx, n - 1)
    cur = new_mass[idx_c]
    val = jnp.maximum(cur - mret, 0.1 * m0_s)
    tgt = jnp.where(lane, idx, n)
    new_mass = new_mass.at[tgt].set(val, mode="drop")
    return last, totret, new_metal, new_mass


@dataclass
class GasState:
    """SoA gas fields for the [0, ngas) prefix rows."""

    ngas: int
    entropy: jax.Array
    density: jax.Array
    egy_wt_density: jax.Array
    dhsml_egy: jax.Array
    div_vel: jax.Array
    curl_vel: jax.Array
    hydro_accel: jax.Array
    dt_entropy: jax.Array
    max_signal_vel: jax.Array
    dt_hsml: jax.Array
    ne: jax.Array
    metallicity: jax.Array
    sfr: jax.Array
    delay_time: jax.Array
    generation: jax.Array
    vdisp: jax.Array
    # star bookkeeping, FULL-length [ntot] (stars live either on a
    # flipped gas row or on a spawned row beyond the real particles —
    # the slots_split_particle analog, slotsmanager.cpp:103):
    birth_a: jax.Array          # formation scale factor (0 = not star)
    last_enrich_myr: jax.Array  # stellar age already enriched, Myr
    mass0: jax.Array            # stellar mass at formation
    total_returned: jax.Array   # cumulative returned mass fraction
    # black hole rows, FULL-length [ntot] (usually gas rows flipped
    # to ptype BH in place, but resumed snapshots place type-5 rows
    # beyond the gas prefix):
    bh_mass: jax.Array          # subgrid BH mass (0 = not BH)
    bh_mdot: jax.Array          # last accretion rate
    # helium reionization flag (cooling_qso_lightup)
    heiii: jax.Array = None     # bool: HeIII-ionized
    star_metallicity: jax.Array = None  # [ntot] metallicity at birth
    # excursion-set reionization (uvbg.cpp)
    local_j21: jax.Array = None  # per-gas J21
    zreion_p: jax.Array = None   # per-gas reionization redshift (-1)
    # |GradRho| from the density pass (h2 SF criterion input)
    gradrho_mag: jax.Array = None

    @classmethod
    def create(cls, ngas: int, entropy0,
               ntot: int = None) -> "GasState":
        """ntot: full particle-array length (>= ngas); the star
        bookkeeping arrays span it so spawned star rows beyond the
        gas prefix are covered."""
        if ntot is None:
            ntot = ngas
        z = lambda: jnp.zeros(ngas, jnp.float32)
        zt = lambda: jnp.zeros(ntot, jnp.float32)
        return cls(
            ngas=ngas, entropy=jnp.asarray(entropy0, jnp.float32),
            density=z(), egy_wt_density=z(), dhsml_egy=z(),
            div_vel=z(), curl_vel=z(),
            hydro_accel=jnp.zeros((ngas, 3), jnp.float32),
            dt_entropy=z(), max_signal_vel=z(), dt_hsml=z(),
            ne=jnp.ones(ngas, jnp.float32), metallicity=z(), sfr=z(),
            delay_time=z(), generation=jnp.zeros(ngas, jnp.int32),
            vdisp=jnp.full(ngas, 100.0, jnp.float32),
            birth_a=zt(), last_enrich_myr=zt(), mass0=zt(),
            total_returned=zt(), bh_mass=zt(), bh_mdot=zt(),
            heiii=jnp.zeros(ngas, bool), star_metallicity=zt(),
            local_j21=z(),
            zreion_p=jnp.full(ngas, -1.0, jnp.float32),
            gradrho_mag=z())


@dataclass
class GasPhysics:
    """Configuration + stage implementations for gas."""

    cooling_on: bool = False
    sfr_on: bool = False
    winds_on: bool = False
    density_independent_sph: bool = True
    eta: float = 1.0
    ngb_deviation: float = 2.0
    art_bulk_visc: float = 0.75
    density_contrast_limit: float = 100.0
    kernel: object = CUBIC
    coolpar: Optional[CoolingParams] = None
    treecool: Optional[TreeCool] = None
    sfrpar: Optional[SFRParams] = None
    windpar: Optional[WindParams] = None
    coolunits: Optional[CoolingUnits] = None
    metal_return_on: bool = False
    metals: object = None        # physics.metal_return.MetalReturn
    min_enrich_window_myr: float = 1.0
    bh_on: bool = False
    bhpar: object = None         # physics.blackhole.BHParams
    bh_dynfric_on: bool = False
    zreion_table: object = None  # uv_fluctuations.ZreionTable
    metal_cool: object = None    # uv_fluctuations.MetalCoolingTable
    helium: object = None        # helium_reion.HeliumReion
    excursion: object = None     # excursion.ExcursionSetParams
    j21_coeffs: object = None    # uv_fluctuations.J21Coeffs
    excursion_zstop: float = 5.0
    units: object = None         # utils.units.UnitSystem
    rng_key: jax.Array = None

    def __post_init__(self):
        if self.rng_key is None:
            self.rng_key = jax.random.PRNGKey(42)

    def next_key(self):
        self.rng_key, sub = jax.random.split(self.rng_key)
        return sub

    def _get_jit(self, name, make_fn, **jit_kw):
        """Cached per-instance jit wrapper: the subgrid physics params
        (sp/coolpar/cu/windpar — plain mutable dataclasses, constant
        for a run) are closed over as compile-time constants, so the
        whole source step runs as ONE fused XLA program instead of
        hundreds of eager dispatches over the axon tunnel."""
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_jit_cache", cache)
        fn = cache.get(name)
        if fn is None:
            fn = jax.jit(make_fn(), **jit_kw)
            cache[name] = fn
        return fn

    # ---------- density + hydro ----------
    def density_hydro(self, sim, gas: GasState, active=None):
        """Gas-tree density + hydro with deep-tree retry: a blocked
        neighbour walk refuses truncated leaves (TreeTooShallow), and
        dense SF clumps can overflow bottom-level cells — rebuild with
        more levels until the walk is exact (sticky across steps).

        active: optional host bool mask over ALL particles — density
        and hydro walk only the active gas (the reference queues
        ActiveParticles only, run.cpp:488-505); inactive rows keep
        their stored hsml/density/accel until their bin next syncs.
        Sources are always the full gas set at predicted quantities.
        """
        from .ops.treewalk import TreeTooShallow
        extra = getattr(self, "_gas_tree_levels_extra", 0)
        while True:
            try:
                gas2 = self._density_hydro_once(
                    sim, gas, min(sim.gravity.tree_nlevels + extra, 20),
                    active=active)
                self._gas_tree_levels_extra = extra
                return gas2
            except TreeTooShallow:
                if sim.gravity.tree_nlevels + extra >= 20:
                    raise
                extra += 1

    def _density_hydro_once(self, sim, gas: GasState, nlv: int,
                            active=None):
        """Gas-tree density (adaptive hsml) then hydro force.

        Uses drift-time-predicted velocity and entropy (VelPred /
        EntVarPred, density.c semantics): with individual timesteps
        neighbours' kicked quantities live at their own Ti_kick, so
        they are advanced to the common drift time by signed kick
        factors before entering the walks.
        """
        from .core.integrate import predictor_tables
        p = sim.particles
        ng = gas.ngas
        gas_alive = (p.mask & (p.ptype == GAS))[:ng]
        ipos_g = p.ipos[:ng]
        gk, hk, de, gk_pm = predictor_tables(sim.CP, sim.timeline,
                                             sim.times)
        bins = p.timebin[:ng].astype(jnp.int32)
        vel_g = (p.vel[:ng]
                 + p.grav_accel[:ng] * gk[bins][:, None]
                 + p.grav_pm[:ng] * jnp.float32(gk_pm)
                 + gas.hydro_accel * hk[bins][:, None])
        ent_pred = gas.entropy + gas.dt_entropy * de[bins]
        # floor: prediction must never drive entropy negative
        ent_pred = jnp.maximum(ent_pred, 0.25 * gas.entropy)
        mass_g = jnp.where(gas_alive, p.mass[:ng], 0.0)
        entvar = jnp.maximum(ent_pred, 1e-35) ** (1.0 / GAMMA)

        # active-only walk set (run.cpp:488-505 ActiveParticles):
        # inactive rows keep their stored state; the duplicate-row
        # padding trick (gather min(sel, ng-1), scatter mode=drop)
        # keeps all shapes pow2-bucketed
        asel_np = np.asarray(gas_alive) if active is None else \
            (np.asarray(active)[:ng] & np.asarray(gas_alive))
        n_act = int(asel_np.sum())
        n_alive = int(np.asarray(gas_alive).sum())
        if n_act == 0:
            return gas
        sub_act = active is not None and n_act < n_alive
        if sub_act:
            sel = np.nonzero(asel_np)[0]
            nbkt = max(64, 1 << (n_act - 1).bit_length())
            sel_p = np.full(nbkt, ng, dtype=np.int64)
            sel_p[:n_act] = sel
            selj = jnp.asarray(sel_p)
            gidx = jnp.minimum(selj, ng - 1)

        tree = build_octree(ipos_g, mass_g, gas_alive, sim.boxsize,
                            nlevels=nlv,
                            ncrit=sim.gravity.tree_ncrit,
                            hsml=p.hsml[:ng])
        payload = make_gas_payload(tree, vel_g, entvar)
        if not hasattr(self, "_density_caps"):
            self._density_caps = {}
        if sub_act:
            t_ipos, t_vel, t_ent = (ipos_g[gidx], vel_g[gidx],
                                    entvar[gidx])
            hsml0 = np.asarray(p.hsml[:ng])[np.minimum(sel_p, ng - 1)]
        else:
            t_ipos, t_vel, t_ent = ipos_g, vel_g, entvar
            hsml0 = np.asarray(p.hsml[:ng])
        dout = sph_density(tree, payload, t_ipos, t_vel, t_ent,
                           hsml0, sim.boxsize,
                           self.kernel, eta=self.eta,
                           ngb_deviation=self.ngb_deviation,
                           do_egy_density=self.density_independent_sph,
                           ncrit=sim.gravity.tree_ncrit,
                           caps=self._density_caps,
                           engine=os.environ.get(
                               "SHENQI_SPH_ENGINE", "stencil"))
        if sub_act:
            def mg(old, new):
                return old.at[selj].set(jnp.asarray(new), mode="drop")
            hsml = mg(p.hsml[:ng], dout.hsml)
            gas = dataclasses.replace(
                gas, density=mg(gas.density, dout.density),
                egy_wt_density=mg(gas.egy_wt_density,
                                  dout.egy_wt_density),
                dhsml_egy=mg(gas.dhsml_egy,
                             dout.dhsml_egy_density_factor),
                div_vel=mg(gas.div_vel, dout.div_vel),
                curl_vel=mg(gas.curl_vel, dout.curl_vel),
                dt_hsml=mg(gas.dt_hsml, dout.dt_hsml),
                gradrho_mag=mg(gas.gradrho_mag, jnp.linalg.norm(
                    jnp.asarray(dout.grad_rho), axis=-1)))
        else:
            hsml = jnp.asarray(dout.hsml)
            gas = dataclasses.replace(
                gas, density=jnp.asarray(dout.density),
                egy_wt_density=jnp.asarray(dout.egy_wt_density),
                dhsml_egy=jnp.asarray(dout.dhsml_egy_density_factor),
                div_vel=jnp.asarray(dout.div_vel),
                curl_vel=jnp.asarray(dout.curl_vel),
                dt_hsml=jnp.asarray(dout.dt_hsml),
                gradrho_mag=jnp.linalg.norm(
                    jnp.asarray(dout.grad_rho), axis=-1))
        # store hsml back on particles
        new_hsml = p.hsml.at[:ng].set(hsml)
        sim.particles = dataclasses.replace(p, hsml=new_hsml)

        # ---- hydro force ----
        atime = sim.atime()
        hubble = float(sim.CP.hubble_function(atime))
        # par stays at default atime/hubble: it is jit-static, and the
        # real time factors ride in dynamically (tf) so the walk
        # compiles once, not once per step
        par = HydroParams(boxsize=sim.boxsize,
                          art_bulk_visc_const=self.art_bulk_visc,
                          density_contrast_limit=(
                              self.density_contrast_limit),
                          density_independent_sph=(
                              self.density_independent_sph))
        from .sph.hydro import hydro_time_factors
        tf = hydro_time_factors(atime, hubble)
        eom_dens = (gas.egy_wt_density
                    if self.density_independent_sph else gas.density)
        press = pressure_predict(jnp.maximum(eom_dens, 1e-35), entvar)
        cs = jnp.sqrt(GAMMA * press / jnp.maximum(eom_dens, 1e-35))
        f1 = balsara_f1(gas.div_vel, gas.curl_vel, cs, hsml,
                        tf["fac_mu"])
        a3inv = 1.0 / atime ** 3
        decoupled = (is_decoupled(gas.delay_time, gas.density, a3inv,
                                  self.windpar)
                     if (self.winds_on and self.windpar) else
                     jnp.zeros(ng, bool))

        # rebuild the tree with final hsml for correct hmax culling
        tree = build_octree(ipos_g, mass_g, gas_alive, sim.boxsize,
                            nlevels=nlv,
                            ncrit=sim.gravity.tree_ncrit, hsml=hsml)
        order = tree.order
        # per-row timebin dloga feeds the viscosity limiter
        # (hydratree2.hpp:334-343: dloga = 2*max(bin_i, bin_j); without
        # it a cold close pair's viscous kick can overshoot in one
        # step and ratchet u unboundedly — the star-small a=0.111
        # blow-up).  Bin 0 (fresh rows) gives dloga=0 = limiter off,
        # matching the reference's first-step semantics.
        from .core.timeline import TIMEBINS
        dl_bin = np.zeros(TIMEBINS + 1, np.float32)
        for b in range(1, TIMEBINS + 1):
            dl_bin[b] = sim.timeline.get_dloga_for_bin(
                b, sim.times.ti_current)
        dloga_tab = jnp.asarray(dl_bin)[jnp.clip(bins, 0, TIMEBINS)]
        payload_h = {
            "ipos": tree.ipos_s, "mass": tree.mass_s,
            "hsml": hsml[order], "vel": vel_g[order],
            "density": gas.density[order],
            "eomdensity": eom_dens[order],
            "entvar": entvar[order], "pressure": press[order],
            "divvel": gas.div_vel[order],
            "curlvel": gas.curl_vel[order],
            "dhsml_egy": gas.dhsml_egy[order],
            "dloga": dloga_tab[order],
            "decoupled": decoupled[order],
        }
        targets = {
            "ipos": ipos_g, "vel": vel_g, "hsml": hsml,
            "mass": mass_g, "density": gas.density,
            "egyrho": eom_dens, "entvar": entvar, "pressure": press,
            "f1": f1, "dhsml": gas.dhsml_egy, "dloga": dloga_tab,
        }
        tvalid_h = gas_alive & (hsml > 0)
        if sub_act:
            targets = {k: v[gidx] for k, v in targets.items()}
            tvalid_h = tvalid_h[gidx]
        t_len = int(targets["hsml"].shape[0])
        from .sph.hydro import hydro_walk_blocked, hydro_walk_dense

        def oracle_patch(hres, tovf):
            """Re-do flagged targets with the dense all-sources walk
            (sph/density._oracle_patch protocol; the vmapped tree
            walk OOMs at production source counts)."""
            from .sph.hydro import HydroResult
            sel_all = np.nonzero(np.asarray(tovf))[0]
            acc, dts, mvs = (hres.accel, hres.dt_entropy,
                             hres.max_signal_vel)
            for c0 in range(0, len(sel_all), 256):
                sel = sel_all[c0:c0 + 256]
                nov = len(sel)
                nbkt = max(16, 1 << (nov - 1).bit_length())
                sel_pp = np.full(nbkt, t_len, dtype=np.int64)
                sel_pp[:nov] = sel
                seljp = jnp.asarray(sel_pp)
                gidxp = jnp.minimum(seljp, t_len - 1)
                lane = jnp.asarray(np.arange(nbkt) < nov)
                tsub = {k: v[gidxp] for k, v in targets.items()}
                tsub["hsml"] = jnp.where(lane, tsub["hsml"], 0.0)
                hs = hydro_walk_dense(payload_h, tsub, par,
                                      self.kernel, tf=tf)
                acc = acc.at[seljp].set(hs.accel, mode="drop")
                dts = dts.at[seljp].set(hs.dt_entropy, mode="drop")
                mvs = mvs.at[seljp].set(hs.max_signal_vel,
                                        mode="drop")
            return HydroResult(accel=acc, dt_entropy=dts,
                               max_signal_vel=mvs)

        def finish(hres):
            """Mask decoupled/dead rows and merge into the gas state
            (subset rows scatter over the stored full-set values)."""
            if sub_act:
                msub = (gas_alive & ~decoupled)[gidx]
                acc_n = jnp.where(msub[:, None], hres.accel, 0.0)
                dts_n = jnp.where(msub, hres.dt_entropy, 0.0)
                return dataclasses.replace(
                    gas,
                    hydro_accel=gas.hydro_accel.at[selj].set(
                        acc_n, mode="drop"),
                    dt_entropy=gas.dt_entropy.at[selj].set(
                        dts_n, mode="drop"),
                    max_signal_vel=gas.max_signal_vel.at[selj].set(
                        jnp.asarray(hres.max_signal_vel),
                        mode="drop"))
            accel = jnp.where((gas_alive & ~decoupled)[:, None],
                              hres.accel, 0.0)
            dts = jnp.where(gas_alive & ~decoupled,
                            hres.dt_entropy, 0.0)
            return dataclasses.replace(
                gas, hydro_accel=accel, dt_entropy=dts,
                max_signal_vel=jnp.asarray(hres.max_signal_vel))

        sph_engine = os.environ.get("SHENQI_SPH_ENGINE", "stencil")
        if sph_engine == "stencil":
            # grid-stencil hydro (sph/stencil_hydro.py): no octree
            # traversal; the tree above is kept for the oracle patch
            from .sph.stencil_hydro import stencil_hydro_walk
            if not hasattr(self, "_hydro_stencil_caps"):
                self._hydro_stencil_caps = {}
            mass_src = jnp.where(decoupled | ~gas_alive, 0.0, mass_g)
            fields = jnp.stack(
                [mass_src, hsml, vel_g[:, 0], vel_g[:, 1],
                 vel_g[:, 2], gas.density, eom_dens, entvar, press,
                 gas.div_vel, gas.curl_vel, gas.dhsml_egy,
                 dloga_tab], axis=1).astype(jnp.float32)
            hres, cover, n_cover = stencil_hydro_walk(
                ipos_g, fields, targets, par, spec=self.kernel,
                tier_cache=self._hydro_stencil_caps, tf=tf,
                tvalid=tvalid_h)
            if n_cover:
                hres = oracle_patch(hres, cover)
            return finish(hres)

        maxl = getattr(self, "_hydro_maxl", 64)
        if not hasattr(self, "_hydro_nb_map"):
            self._hydro_nb_map = {}
        nb = self._hydro_nb_map.get(t_len)
        while True:
            hres, hinfo = hydro_walk_blocked(
                tree, payload_h, targets, par, self.kernel,
                ncrit=sim.gravity.tree_ncrit, maxl=maxl, nb=nb,
                tf=tf)
            if bool(hinfo["leaf_truncated"]):
                from .ops.treewalk import TreeTooShallow
                raise TreeTooShallow(
                    "hydro: leaf > ncrit; rebuild a deeper octree")
            grew = False
            if bool(hinfo["list_overflow"]):
                if maxl < 2048:
                    maxl *= 2
                    grew = True
                else:
                    # overflow tail at the HBM-bounded cap: re-do just
                    # those targets with the per-particle oracle (see
                    # sph/density._oracle_patch)
                    hres = oracle_patch(hres,
                                        hinfo["target_overflow"])
            if bool(hinfo["block_overflow"]):
                nb0 = nb or max(2 * ((t_len + 63) // 64), 8)
                nb = (1 << (nb0 - 1).bit_length()) * 2
                grew = True
            if not grew:
                break
        self._hydro_maxl = maxl
        self._hydro_nb_map[t_len] = nb
        return finish(hres)

    def setup_density_indep_entropy(self, sim, gas: GasState,
                                    u_init: float) -> GasState:
        """Pressure-entropy IC fixed point (init.cpp:403-449
        setup_density_indep_entropy): iterate
        entropy = (g-1) u / (EgyWtDensity/a^3)^(g-1)  followed by an
        EgyWtDensity recomputation until the density converges
        (rel 1e-3, <=100 iters).  Starts from EgyWtDensity = Density,
        which the reference found converges best."""
        from .sph.density import density_walk_blocked
        from .utils.constants import GAMMA_MINUS1 as GM1

        p = sim.particles
        ng = gas.ngas
        gas_alive = (p.mask & (p.ptype == GAS))[:ng]
        ipos_g = p.ipos[:ng]
        mass_g = jnp.where(gas_alive, p.mass[:ng], 0.0)
        hsml = p.hsml[:ng]
        a3 = sim.atime() ** 3
        egywt = jnp.maximum(gas.density, 1e-35)
        tree = build_octree(ipos_g, mass_g, gas_alive, sim.boxsize,
                            nlevels=sim.gravity.tree_nlevels,
                            ncrit=sim.gravity.tree_ncrit)
        order = tree.order
        vel0 = jnp.zeros((ng, 3), jnp.float32)
        maxl = 128
        blk = 64
        stop = False
        entropy = gas.entropy
        for j in range(100):
            entropy = (GM1 * u_init
                       / jnp.maximum(egywt / a3, 1e-35) ** GM1)
            entvar = jnp.maximum(entropy, 1e-35) ** (1.0 / GAMMA)
            payload = {"ipos": tree.ipos_s, "mass": tree.mass_s,
                       "vel": vel0[order], "entvar": entvar[order]}
            while True:
                res, info = density_walk_blocked(
                    tree, payload, ipos_g, vel0, hsml, sim.boxsize,
                    self.kernel, ncrit=sim.gravity.tree_ncrit,
                    maxl=maxl, block=blk)
                if not bool(info["list_overflow"]):
                    break
                if maxl < 2048:
                    maxl *= 2
                elif blk > 8:
                    blk //= 2
                else:
                    raise RuntimeError("init density list overflow")
            new_egywt = jnp.maximum(res.egy_rho, 1e-35) \
                / jnp.maximum(entvar, 1e-35)
            if stop:
                egywt = new_egywt
                break
            maxdiff = float(jnp.max(jnp.where(
                gas_alive,
                jnp.abs(new_egywt - egywt)
                / jnp.maximum(new_egywt, 1e-35), 0.0)))
            egywt = new_egywt
            if maxdiff < 1e-3:
                stop = True     # one more iteration, then stop
        return dataclasses.replace(gas, entropy=entropy,
                                   egy_wt_density=egywt)

    # ---------- source terms (Strang split) ----------
    def source_terms(self, sim, gas: GasState, dtime):
        """Cooling + star formation + winds after the kick.

        dtime is per-row (the particle's own timebin dloga/hubble,
        zero when the row's bin is not at a kick boundary — the
        reference applies sources to ACTIVE particles only,
        sfr_eff.cpp cooling_and_starformation) or a scalar.
        """
        if not (self.cooling_on or self.sfr_on):
            return gas, 0
        p = sim.particles
        ng = gas.ngas
        gas_alive = (p.mask & (p.ptype == GAS))[:ng]
        dtime = jnp.broadcast_to(
            jnp.asarray(dtime, jnp.float32), gas.entropy.shape)
        atime = sim.atime()
        a3inv = 1.0 / atime ** 3
        redshift = 1.0 / atime - 1.0
        uvbg = (self.treecool.uvbg(redshift, self.coolpar)
                if self.treecool else UVBG())
        if (self.excursion is not None and self.j21_coeffs is not None
                and redshift > self.excursion_zstop):
            # excursion-set per-particle J21 UVB (cooling_uvfluc.cpp
            # get_local_UVBG_from_J21 branch)
            from .physics.uv_fluctuations import uvbg_from_j21
            uvbg = uvbg_from_j21(uvbg, gas.local_j21, gas.zreion_p,
                                 redshift, self.excursion.AlphaUV,
                                 self.j21_coeffs,
                                 fbar=self.coolpar.fBar
                                 if self.coolpar else 0.17)
        elif self.zreion_table is not None:
            # fluctuating UVB: per-particle rates gated on z_reion
            from .core.particles import ipos_to_float
            from .physics.uv_fluctuations import local_uvbg
            pos = ipos_to_float(p.ipos[:ng], sim.boxsize)
            uvbg = local_uvbg(uvbg, self.zreion_table.zreion(pos),
                              redshift)
        # HeII long-mean-free-path heating for not-yet-ionized gas
        extra_heat = 0.0
        if self.helium is not None and self.helium.during(redshift):
            from .utils.constants import GRAVITY, HUBBLE
            h0 = sim.CP.HubbleParam * HUBBLE
            rho_crit_b = (3 * h0 * h0 / (8 * np.pi * GRAVITY)
                          * sim.CP.OmegaBaryon)
            lm = self.helium.lmfp_heating_per_gram(redshift,
                                                   rho_crit_b)
            extra_heat = jnp.where(gas.heiii, 0.0,
                                   jnp.float32(lm))

        if self.sfr_on:
            sf_jit = self._get_jit("sf_step", lambda: (
                lambda key, density, egywt, entropy, mass, ne, met,
                gen, dtime, a3inv, redshift, uvbg, is_gas,
                gradrho_mag, hsml, pids, extra_heat:
                starformation_step(
                    key, density, egywt, entropy, mass, ne, met,
                    gen, dtime, a3inv, redshift, uvbg, self.sfrpar,
                    self.coolpar, self.coolunits, is_gas,
                    gradrho_mag=gradrho_mag, hsml=hsml, pids=pids,
                    extra_heat=extra_heat)))
            res = sf_jit(
                self.next_key(), gas.density, gas.egy_wt_density,
                gas.entropy, p.mass[:ng], gas.ne, gas.metallicity,
                gas.generation, dtime, a3inv, redshift, uvbg,
                gas_alive, gas.gradrho_mag, p.hsml[:ng],
                p.id_lo[:ng], extra_heat)
            gas = dataclasses.replace(
                gas, entropy=res.entropy, ne=res.ne,
                metallicity=res.metallicity, sfr=res.sfr)

            # per-step SF statistics for sfr.txt (sfr_eff.cpp
            # write_sfr_txt inputs) + star-conversion dispatch
            # counters: ONE packed device reduction, one host pull
            stats_jit = self._get_jit("sf_stats",
                                      lambda: _sf_stats_reduce)
            sv = np.asarray(stats_jit(
                gas_alive, res.sfr, res.form_star, res.convert_whole,
                res.mass_of_star, dtime, p.mask))
            n_split, n_whole = int(sv[6]), int(sv[7])
            n_free = int(sv[8])
            if n_split == 0 and n_whole == 0:
                nstars = 0
            elif n_split <= _KSPAWN and n_free >= n_split:
                nstars = self._convert_stars_device(
                    sim, gas, res, atime, n_split, n_whole)
            else:
                if n_free < n_split:
                    self._grow_star_capacity(
                        sim, gas, max(n_split - n_free, 1))
                nstars = self._convert_stars(sim, gas, res, atime)

            unit_sfr = max(self.sfrpar.UnitSfr_in_solar_per_year,
                           1e-35)
            n_sf, n_act = int(sv[3]), int(sv[4])
            self.last_sfr_stats = {
                "total_sm": float(sv[1]) / unit_sfr,
                "totsfrrate": float(sv[0]),
                "rate_in_msunperyear": float(sv[0]),
                "total_sum_mass_stars": float(sv[2]),
                "avg_dtime": float(sv[5]) / max(n_act, 1),
                "total_sum_part": n_sf,
                "tot_newstars": nstars}

            if self.winds_on and self.windpar:
                from .physics.winds import (WIND_SUBGRID,
                                            winds_star_feedback)
                if self.windpar.has(WIND_SUBGRID):
                    sm = res.sfr * dtime / jnp.maximum(
                        self.sfrpar.UnitSfr_in_solar_per_year, 1e-35)
                    wsg_jit = self._get_jit("winds_subgrid", lambda: (
                        lambda key, vel3, ent, dens, delay, mass, sm,
                        vdisp, atime, a3inv, eligible, pids:
                        winds_subgrid_step(
                            key, vel3, ent, dens, delay, mass, sm,
                            vdisp, atime, a3inv, self.windpar,
                            eligible=eligible, pids=pids)))
                    wres = wsg_jit(
                        self.next_key(), sim.particles.vel[:ng],
                        gas.entropy, gas.density, gas.delay_time,
                        sim.particles.mass[:ng], sm, gas.vdisp, atime,
                        a3inv,
                        # reference queues gas that formed mass but
                        # did NOT convert (sfr_eff.cpp:271 newstar<0
                        # -> flag -2); converting rows become stars
                        # and must not be wind-kicked
                        eligible=(gas_alive & (res.sfr > 0)
                                  & ~res.form_star),
                        pids=sim.particles.id_lo[:ng])
                    vel3, ent, delay0 = (wres.vel, wres.entropy,
                                         wres.delay_time)
                else:
                    # non-subgrid: new stars kick their gas
                    # neighbours (sfr_wind_feedback).  The star count
                    # varies per step — pad to a power-of-two bucket
                    # (mass-0 lanes kick nothing) so the dense pair
                    # kernel compiles O(log) times, not once per count
                    if nstars == 0:
                        # no new stars -> zero kicks; only the
                        # delay-time decay below applies
                        vel3 = sim.particles.vel[:ng]
                        ent, delay0 = gas.entropy, gas.delay_time
                        sidx = None
                    else:
                        sidx = np.nonzero(
                            np.asarray(res.form_star))[0]
                    ns0 = 0 if sidx is None else len(sidx)
                    if ns0:
                        nbkt = max(8, 1 << (max(ns0, 1) - 1)
                                   .bit_length())
                        sidx = np.pad(sidx, (0, nbkt - ns0))
                        smask = jnp.asarray(
                            np.arange(nbkt) < ns0)
                        p2 = sim.particles
                        # split spawns carry mass_of_star, not the
                        # parent's full mass (sfr_wind_copy uses the
                        # star's mass)
                        star_m = jnp.where(res.convert_whole,
                                           p2.mass[:ng],
                                           res.mass_of_star)
                        wsf_jit = self._get_jit(
                            "winds_star_fb", lambda: (
                                lambda key, sipos, shsml, smass,
                                svdisp, gipos, gmass, gvel, ent,
                                dens, delay, elig, atime, a3inv:
                                winds_star_feedback(
                                    key, sipos, shsml, smass,
                                    svdisp, gipos, gmass, gvel,
                                    ent, dens, delay, elig,
                                    sim.boxsize, atime, a3inv,
                                    self.windpar)))
                        vel3, ent, delay0 = wsf_jit(
                            self.next_key(), p2.ipos[sidx],
                            jnp.maximum(p2.hsml[sidx], 1e-3),
                            jnp.where(smask, star_m[sidx], 0.0),
                            gas.vdisp[sidx],
                            p2.ipos[:ng], p2.mass[:ng], p2.vel[:ng],
                            gas.entropy, gas.density,
                            gas.delay_time,
                            gas_alive & ~res.form_star,
                            atime, a3inv)
                vel_new = sim.particles.vel.at[:ng].set(vel3)
                sim.particles = dataclasses.replace(sim.particles,
                                                    vel=vel_new)
                wd_jit = self._get_jit("winds_decay", lambda: (
                    lambda delay0, dens, a3inv, dtime:
                    winds_decay(delay0, dens, a3inv, dtime,
                                self.windpar)))
                delay = wd_jit(delay0, gas.density, a3inv, dtime)
                gas = dataclasses.replace(gas, entropy=ent,
                                          delay_time=delay)
            return gas, nstars
        elif self.cooling_on:
            # pure radiative cooling via the implicit solver
            from .physics.cooling_rates import do_cooling
            cu = self.coolunits
            dens_phys = gas.density * a3inv
            u = gas.entropy * entropy_to_u(
                jnp.maximum(gas.egy_wt_density
                            if self.density_independent_sph
                            else gas.density, 1e-35), a3inv)
            u_cgs, ne = do_cooling(
                u * cu.uu_in_cgs, dens_phys * cu.density_in_phys_cgs,
                dtime * cu.tt_in_s, 1 - HYDROGEN_MASSFRAC, redshift,
                uvbg, self.coolpar,
                min_egyspec_cgs=self.sfrpar.min_egyspec()
                * cu.uu_in_cgs if self.sfrpar else 0.0,
                ne_init=gas.ne, metallicity=gas.metallicity,
                metal_cool=self.metal_cool, extra_heat=extra_heat)
            u_new = u_cgs / cu.uu_in_cgs
            dfac = entropy_to_u(jnp.maximum(
                gas.egy_wt_density if self.density_independent_sph
                else gas.density, 1e-35), a3inv)
            upd = gas_alive & (dfac > 0) & (dtime > 0)
            ent = jnp.where(upd, u_new / jnp.maximum(dfac, 1e-35),
                            gas.entropy)
            ne = jnp.where(upd, ne, gas.ne)
            return dataclasses.replace(gas, entropy=ent, ne=ne), 0
        return gas, 0

    # ---------- metal return (metal_return.cpp analog) ----------
    def _age_grid_device(self, sim):
        """t(a) grid as device arrays for the jitted age/activity
        program (same grid `_age_myr` caches on host)."""
        dg = getattr(self, "_t_grid_dev", None)
        if dg is None:
            if getattr(self, "_t_grid", None) is None:
                ag = np.geomspace(0.01, 1.0, 257)
                tg = np.zeros_like(ag)
                for i in range(1, len(ag)):
                    tg[i] = tg[i - 1] + sim.CP.age_myr(ag[i - 1],
                                                       ag[i])
                self._t_grid = (ag, tg)
            ag, tg = self._t_grid
            dg = (jnp.asarray(ag, jnp.float32),
                  jnp.asarray(tg, jnp.float32))
            object.__setattr__(self, "_t_grid_dev", dg)
        return dg

    def _age_myr(self, sim, a0, a1):
        """Vectorized cosmic-time difference via a cached t(a) grid."""
        grid = getattr(self, "_t_grid", None)
        if grid is None:
            a_lo = min(float(np.min(a0[a0 > 0])) if np.any(a0 > 0)
                       else 0.01, 0.01)
            ag = np.geomspace(a_lo, 1.0, 257)
            tg = np.zeros_like(ag)
            for i in range(1, len(ag)):
                tg[i] = tg[i - 1] + sim.CP.age_myr(ag[i - 1], ag[i])
            grid = (ag, tg)
            self._t_grid = grid
        ag, tg = grid
        t0 = np.interp(np.maximum(a0, ag[0]), ag, tg)
        t1 = np.interp(np.maximum(a1, ag[0]), ag, tg)
        return t1 - t0

    def metal_return(self, sim, gas: GasState) -> GasState:
        """Return stellar ejecta mass+metals to neighbouring gas.

        Mirrors libgadget/metal_return.cpp: per star, integrate the
        IMF-weighted AGB+SNII yields plus the Sn1a DTD over the age
        window since the last enrichment, then scatter the returned
        mass kernel-weighted onto gas within the star's smoothing
        length (stellar density pass approximated by the stored hsml
        of the progenitor gas particle this round).
        """
        if not (self.metal_return_on and self.metals):
            return gas
        p = sim.particles
        ng = gas.ngas
        ntot = p.n
        atime = sim.atime()
        # stars live on flipped gas rows OR spawned rows past the
        # real particles — scan the full array.  The activity
        # decision runs ON DEVICE (one scalar pull); the heavy
        # full-array pulls of the old host path cost seconds per
        # step over the axon tunnel.
        ag, tg = self._age_grid_device(sim)
        act_jit = self._get_jit("mr_act", lambda: (
            lambda mask, ptype, birth, last, atime:
            _metal_return_act(mask, ptype, birth, last, ag, tg,
                              atime, self.min_enrich_window_myr)))
        nact_d, act_d, age_d = act_jit(p.mask, p.ptype, gas.birth_a,
                                       gas.last_enrich_myr, atime)
        ns0 = int(nact_d)
        if ns0 == 0:
            return gas
        # pow2 bucket so the dense pair kernels compile O(log) times
        # rather than once per distinct active-star count
        nbkt = max(8, 1 << (ns0 - 1).bit_length())
        lane = np.arange(nbkt) < ns0

        from functools import partial
        from .physics.blackhole import bh_gas_environment
        from .physics.metal_return import metal_return_step
        gather_jit = self._get_jit(
            f"mr_gather_{nbkt}",
            lambda: partial(_metal_return_gather, nbkt))
        idx_d, zmet_s, last_s, age_s, m0_s, totret_s = gather_jit(
            act_d, age_d, gas.star_metallicity, gas.mass0,
            gas.total_returned, gas.last_enrich_myr)

        # kernel-weight environment: a star with no gas inside its
        # hsml cannot scatter; defer its enrichment to a later step
        # so returned mass is conserved by construction
        gas_alive = (p.mask & (p.ptype == GAS))[:ng]
        idx_c = jnp.minimum(idx_d, ntot - 1)
        star_ipos = p.ipos[idx_c]
        star_hsml = jnp.where(jnp.asarray(lane),
                              jnp.maximum(p.hsml[idx_c], 1e-3), 0.0)
        gmass = jnp.where(gas_alive, p.mass[:ng], 0.0)
        env_jit = self._get_jit("mr_env", lambda: (
            lambda sipos, shsml, gipos, gmass, dens, gvel, alive:
            bh_gas_environment(sipos, shsml, gipos, gmass, dens,
                               gvel, alive, sim.boxsize)))
        env = env_jit(star_ipos, star_hsml, p.ipos[:ng], gmass,
                      gas.density, p.vel[:ng], gas_alive)
        # ONE small pull: per-star subset scalars + kernel weights
        fw, zmet_s, last_h, age_s, m0_s, totret_h = [
            np.array(x) for x in jax.device_get(
                (env.feedback_weight, zmet_s, last_s, age_s, m0_s,
                 totret_s))]
        has_ngb = fw > 1e-30

        h = sim.CP.HubbleParam
        mret = np.zeros(nbkt, np.float32)
        zret = np.zeros(nbkt, np.float32)
        upd = np.zeros(nbkt, bool)
        for j in range(ns0):
            if not has_ngb[j]:
                continue
            mfrac, zfrac, _ = self.metals.star_return(
                float(zmet_s[j]), float(last_h[j]), float(age_s[j]),
                h)
            # cap: never return more than 90% of the birth mass total
            mfrac = min(mfrac, max(0.9 - totret_h[j], 0.0))
            mret[j] = mfrac * m0_s[j]
            zret[j] = min(zfrac, mfrac) * m0_s[j]
            totret_h[j] += mfrac
            last_h[j] = age_s[j]
            upd[j] = True
        apply_jit = self._get_jit("mr_apply", lambda: (
            lambda idx, lane, updm, mret, zret, last, totret,
            last_new, totret_new, sipos, shsml, fw, gipos, gmass,
            alive, metallicity, mass, m0_s:
            _metal_return_apply(
                idx, lane, updm, mret, zret, last, totret, last_new,
                totret_new, sipos, shsml, fw, gipos, gmass, alive,
                metallicity, mass, m0_s, sim.boxsize, self.kernel,
                metal_return_step)))
        last_u, totret_u, new_metal, new_mass = apply_jit(
            idx_d, jnp.asarray(lane), jnp.asarray(upd),
            jnp.asarray(mret), jnp.asarray(zret),
            gas.last_enrich_myr, gas.total_returned,
            jnp.asarray(last_h), jnp.asarray(totret_h),
            star_ipos, star_hsml, env.feedback_weight,
            p.ipos[:ng], gmass, gas_alive, gas.metallicity, p.mass,
            jnp.asarray(m0_s))
        gas.last_enrich_myr = last_u
        gas.total_returned = totret_u
        if mret.sum() <= 0:
            return gas
        sim.particles = dataclasses.replace(p, mass=new_mass)
        return dataclasses.replace(gas, metallicity=new_metal)

    # ---------- excursion-set reionization (uvbg.cpp analog) -------
    def excursion_step(self, sim, gas: GasState,
                       halo_mass) -> GasState:
        """Run one find_HII_bubbles pass (PM-step cadence while
        redshift > ExcursionSetZStop).  halo_mass: [N] per-particle
        FOF halo mass (0 outside halos), used for escape fractions.
        Updates per-gas local_j21 (max over CIC cells, monotone per
        particle) and zreion_p at first ionization."""
        if self.excursion is None:
            return gas
        atime = sim.atime()
        redshift = 1.0 / atime - 1.0
        if redshift <= self.excursion_zstop:
            return gas
        from .physics.excursion import calculate_uvbg, escape_fractions
        from .utils.units import default_units
        p = sim.particles
        ng = gas.ngas
        units = self.units or default_units()
        fesc = escape_fractions(jnp.asarray(halo_mass), self.excursion,
                                units.UnitMass_in_g,
                                sim.CP.HubbleParam)
        sfr = jnp.zeros(p.n, jnp.float32).at[:ng].set(gas.sfr)
        res = calculate_uvbg(p.ipos, p.mass, p.ptype, sfr, fesc,
                             atime, sim.CP, units,
                             sim.boxsize, self.excursion, mask=p.mask)
        j21g = res.j21_particles[:ng]
        # readout keeps the particle's maximum J21 (uvbg.cpp:461-472)
        newj = jnp.maximum(gas.local_j21, j21g)
        newz = jnp.where((gas.zreion_p < 0) & (j21g > 0),
                         jnp.float32(redshift), gas.zreion_p)
        sim.excursion_xhi = (float(res.vol_weighted_xhi),
                             float(res.mass_weighted_xhi))
        return dataclasses.replace(gas, local_j21=newj, zreion_p=newz)

    # ---------- HeII reionization (cooling_qso_lightup analog) -----
    def helium_step(self, sim, gas: GasState, group_masses,
                    group_cm) -> GasState:
        """QSO bubble HeIII ionization at FOF cadence
        (do_heiii_reionization).  group_masses/group_cm: FOF catalog.
        """
        if self.helium is None or self.coolunits is None:
            return gas
        atime = sim.atime()
        redshift = 1.0 / atime - 1.0
        if not self.helium.during(redshift):
            return gas
        p = sim.particles
        ng = gas.ngas
        gas_alive = np.asarray(p.mask[:ng]) & (
            np.asarray(p.ptype[:ng]) == GAS)
        from .core.particles import ipos_to_float
        pos = np.asarray(ipos_to_float(p.ipos[:ng], sim.boxsize))
        rng = np.random.RandomState(
            int(jax.random.randint(self.next_key(), (), 0, 2 ** 31)))
        heiii, ent, nion = self.helium.turn_on_quasars(
            rng, atime, group_masses, group_cm, pos, gas.density,
            gas_alive, gas.heiii, gas.entropy, sim.boxsize,
            self.coolunits.uu_in_cgs)
        if nion == 0:
            return gas
        return dataclasses.replace(gas, heiii=jnp.asarray(heiii),
                                   entropy=jnp.asarray(ent))

    # ---------- black holes (blackhole.cpp analog) ----------
    def seed_bh(self, sim, gas: GasState, rows) -> GasState:
        """Convert the given gas rows to black holes (fof_seed
        conversion step: the chosen gas particle becomes the BH and
        keeps its dynamic mass; subgrid mass starts at the seed)."""
        from .core.particles import BH
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        if rows.size == 0:
            return gas
        p = sim.particles
        ptype = np.array(p.ptype)
        ptype[rows] = BH
        sim.particles = dataclasses.replace(p,
                                            ptype=jnp.asarray(ptype))
        bhm = np.array(gas.bh_mass)
        bhm[rows] = self.bhpar.SeedBlackHoleMass
        return dataclasses.replace(gas, bh_mass=jnp.asarray(bhm))

    def blackhole_step(self, sim, gas: GasState, dtime):
        """Accretion, feedback, swallowing, mergers, dyn. friction.

        BH rows live in the gas prefix (gas flipped to ptype BH via
        seed_bh).  Mirrors blackhole.cpp's three passes: environment
        gather -> accretion/feedback scatter -> swallow arbitration.
        """
        from .core.particles import BH
        from .physics.blackhole import (
            bh_gas_environment, bh_accretion, bh_thermal_feedback,
            bh_swallow_gas, bh_mergers, bh_soundspeed,
            bh_drag_accel, dynamical_friction)
        if not (self.bh_on and self.bhpar):
            return gas
        p = sim.particles
        ng = gas.ngas
        # device-side BH census: one small pull instead of two
        # full-array pulls per step (BHs are absent for most of a
        # run and never more than a handful here)
        cnt_jit = self._get_jit("bh_census", lambda: (
            lambda mask, ptype: (
                jnp.sum(mask & (ptype == BH)),
                jnp.nonzero(mask & (ptype == BH), size=64,
                            fill_value=mask.shape[0])[0])))
        nbh_d, idx_d = jax.device_get(cnt_jit(p.mask, p.ptype))
        nbh = int(nbh_d)
        if nbh == 0:
            return gas
        if nbh <= 64:
            idx = np.asarray(idx_d)[:nbh]
        else:   # huge BH population: host fallback
            bh_rows = np.asarray(p.mask) & (np.asarray(p.ptype)
                                            == BH)
            idx = np.nonzero(bh_rows)[0]
        # per-BH dtime: the BH's own bin dloga when active, else 0
        # (blackhole.cpp integrates Mdot over get_dloga_for_bin)
        dtime = jnp.broadcast_to(jnp.asarray(dtime, jnp.float32),
                                 gas.entropy.shape)[idx]
        atime = sim.atime()
        a3inv = 1.0 / atime ** 3
        gas_alive = (p.mask & (p.ptype == GAS))[:ng]
        gmass = jnp.where(gas_alive, p.mass[:ng], 0.0)
        hsml_bh = jnp.maximum(
            p.hsml[idx] * self.bhpar.BlackHoleNgbFactor, 1e-3)
        hsml_bh = jnp.minimum(
            hsml_bh, self.bhpar.BlackHoleMaxAccretionRadius)

        def _bh_phys(key, bh_ipos, hsml_bh, bh_vel, bhm, bh_dynmass,
                     dtime_bh, gipos, gmass, gdens, gentropy, gvel,
                     alive, atime, a3inv):
            # env gather -> accretion -> feedback -> swallow draw,
            # fused into one program (the dense nbh x ngas pair
            # intermediates never hit HBM unfused)
            env = bh_gas_environment(bh_ipos, hsml_bh, gipos, gmass,
                                     gentropy, gvel, alive,
                                     sim.boxsize)
            mdot = bh_accretion(bhm, bh_vel, env, atime,
                                sim.gravity.G, self.bhpar)
            bhm_new = bhm + mdot * dtime_bh
            c_int = LIGHTCGS / self.bhpar.UnitVelocity_in_cm_per_s
            energy = (self.bhpar.BlackHoleFeedbackFactor * 0.1
                      * mdot * dtime_bh * c_int ** 2)
            dent = bh_thermal_feedback(
                bh_ipos, hsml_bh, energy, env.feedback_weight,
                gipos, gmass, jnp.maximum(gdens, 1e-35), alive,
                sim.boxsize, a3inv)
            swallowed_by, gain = bh_swallow_gas(
                key, bh_ipos, hsml_bh, bhm_new, bh_dynmass, env,
                gipos, gmass, alive, sim.boxsize)
            # accretion-momentum drag (blackhole.cpp:418-429)
            adrag = bh_drag_accel(bh_vel, env.gas_vel, mdot,
                                  bh_dynmass, bhm, atime, self.bhpar)
            return (bhm_new, mdot, dent, swallowed_by, gain,
                    env.entropy, env.density, adrag)

        bhp_jit = self._get_jit("bh_phys", lambda: _bh_phys)
        (bhm_new, mdot, dent, swallowed_by, gain, env_entropy,
         env_density, adrag) = bhp_jit(
            self.next_key(), p.ipos[idx], hsml_bh, p.vel[idx],
            gas.bh_mass[idx], p.mass[idx], dtime, p.ipos[:ng],
            gmass, gas.density, gas.entropy, p.vel[:ng], gas_alive,
            atime, a3inv)
        bh_mass = gas.bh_mass.at[idx].set(bhm_new)
        bh_mdot = gas.bh_mdot.at[idx].set(mdot)
        entropy = jnp.where(gas_alive, gas.entropy + dent,
                            gas.entropy)
        # swallow/merger bookkeeping touches only per-BH smalls and
        # the (rare) eaten rows: pull scalars + idx-sized arrays,
        # never the full mass/mask arrays
        n_eaten = int(jnp.sum(swallowed_by >= 0))
        mass_dev = p.mass
        mask_dev = p.mask
        if n_eaten:
            mass_dev = mass_dev.at[:ng].set(
                jnp.where(swallowed_by >= 0, 0.0, mass_dev[:ng]))
            mask_dev = mask_dev.at[:ng].set(
                jnp.where(swallowed_by >= 0, False, mask_dev[:ng]))
            mass_dev = mass_dev.at[idx].add(gain)

        # BH-BH mergers (host-side; BHs are rare)
        from .core.particles import ipos_to_float
        ids64 = (np.asarray(p.id_hi[idx]).astype(np.uint64) << np.uint64(32)) \
            | np.asarray(p.id_lo[idx]).astype(np.uint64)
        cs = bh_soundspeed(env_entropy, env_density, atime)
        eaten_by, msub2, mdyn2 = bh_mergers(
            ipos_to_float(np.asarray(p.ipos[idx]), sim.boxsize),
            np.asarray(p.vel[idx]), np.asarray(hsml_bh),
            np.asarray(bhm_new), np.asarray(mass_dev[idx]), ids64,
            atime, np.asarray(cs), sim.boxsize)
        any_merge = bool((eaten_by >= 0).any())
        if any_merge:
            bh_mass = bh_mass.at[idx].set(jnp.asarray(msub2))
            mass_dev = mass_dev.at[idx].set(jnp.asarray(mdyn2))
            dead = idx[eaten_by >= 0]
            mask_dev = mask_dev.at[dead].set(False)
            mass_dev = mass_dev.at[dead].set(0.0)

        if n_eaten or any_merge:
            sim.particles = dataclasses.replace(
                p, mass=mass_dev, mask=mask_dev)

        # accretion-momentum drag kick (blackhole.cpp BH_DRAG)
        if getattr(self.bhpar, "BH_DRAG", 0):
            pall = sim.particles
            dtk = dtime[:, None] if jnp.ndim(dtime) else dtime
            sim.particles = dataclasses.replace(
                pall, vel=pall.vel.at[idx].add(adrag * dtk))

        # dynamical friction from the collisionless background
        if self.bh_dynfric_on:
            from .physics.veldisp import dm_velocity_dispersion
            pall = sim.particles
            coll = np.asarray(pall.mask & (pall.ptype != GAS)
                              & (pall.ptype != BH))
            didx = np.nonzero(coll)[0]
            if didx.size:
                sep = sim.boxsize / max(didx.size, 1) ** (1 / 3)
                sigma, _, rho = dm_velocity_dispersion(
                    pall.ipos[didx], pall.vel[didx], pall.mass[didx],
                    jnp.ones(len(didx), bool), pall.ipos[idx],
                    np.full(idx.size, 2 * sep, np.float32),
                    sim.boxsize, atime,
                    nlevels=sim.gravity.tree_nlevels,
                    ncrit=sim.gravity.tree_ncrit)
                adf = dynamical_friction(pall.vel[idx], rho, sigma,
                                         gas.bh_mass[idx], atime,
                                         sim.gravity.G)
                vel = pall.vel.at[idx].add(adf * dtime[:, None])
                sim.particles = dataclasses.replace(pall, vel=vel)

        return dataclasses.replace(gas, entropy=entropy,
                                   bh_mass=bh_mass, bh_mdot=bh_mdot)

    # ---------- DM velocity dispersion (veldisp2.cpp analog) ----------
    def update_vdisp(self, sim, gas: GasState) -> GasState:
        """Refresh the per-gas DM velocity dispersion used by the
        sigma-based wind models (run.cpp:662-663: once per PM step)."""
        from .physics.winds import WIND_FIXED_EFFICIENCY
        if not (self.winds_on and self.windpar) or \
                self.windpar.has(WIND_FIXED_EFFICIENCY):
            return gas
        from .physics.veldisp import dm_velocity_dispersion
        p = sim.particles
        ng = gas.ngas
        dm_rows = np.asarray(p.mask & (p.ptype == 1))
        if not dm_rows.any():
            return gas
        didx = np.nonzero(dm_rows)[0]
        gas_alive = (p.mask & (p.ptype == GAS))[:ng]
        sigma, _, _ = dm_velocity_dispersion(
            p.ipos[didx], p.vel[didx], p.mass[didx],
            jnp.ones(len(didx), bool), p.ipos[:ng],
            np.maximum(np.asarray(p.hsml[:ng]) * 2, 1e-3),
            sim.boxsize, sim.atime(),
            nlevels=sim.gravity.tree_nlevels,
            ncrit=sim.gravity.tree_ncrit)
        vd = jnp.where(gas_alive, sigma, gas.vdisp)
        return dataclasses.replace(gas, vdisp=vd)

    def _convert_stars_device(self, sim, gas: GasState, res, atime,
                              n_split: int, n_whole: int) -> int:
        """On-device gas->star conversion fast path.  Same semantics
        as `_convert_stars` (the host oracle, kept for the rare
        capacity-growth fallback and for tests) without the ~20
        full-array host round-trips per SF step.  Caller guarantees
        n_split <= _KSPAWN and enough free rows exist."""
        from functools import partial
        p = sim.particles
        kern = self._get_jit(
            "convert_stars",
            lambda: partial(_convert_stars_kernel, _KSPAWN))
        (ipos, vel, hsml, tb, idlo, idhi, mass, mask, ptype,
         birth, enr, m0, smet, gen, sfr, delay, bhm, bhmd) = kern(
            p.ipos, p.vel, p.hsml, p.timebin, p.id_lo, p.id_hi,
            p.mass, p.mask, p.ptype, gas.birth_a,
            gas.last_enrich_myr, gas.mass0, gas.star_metallicity,
            gas.generation, gas.sfr, gas.delay_time, gas.bh_mass,
            gas.bh_mdot, gas.metallicity, res.form_star,
            res.convert_whole, res.mass_of_star, atime)
        sim.particles = dataclasses.replace(
            p, ipos=ipos, vel=vel, hsml=hsml, timebin=tb,
            id_lo=idlo, id_hi=idhi, mass=mass, mask=mask,
            ptype=ptype)
        gas.birth_a = birth
        gas.last_enrich_myr = enr
        gas.mass0 = m0
        gas.star_metallicity = smet
        gas.generation = gen
        gas.sfr = sfr
        gas.delay_time = delay
        gas.bh_mass = bhm
        gas.bh_mdot = bhmd
        if not hasattr(sim, "star_formation_times"):
            sim.star_formation_times = []
        nstars = n_whole + n_split
        sim.star_formation_times.extend([atime] * nstars)
        return nstars

    def _convert_stars(self, sim, gas: GasState, res, atime) -> int:
        """Turn gas into stars (make_particle_star analog,
        sfr_eff.cpp:604 + slots_split_particle, slotsmanager.cpp:103).

        Whole conversions flip the gas row in place; SPLIT spawns
        create a new star row in the spare capacity beyond the real
        particles, take mass_of_star from the parent gas, and bump
        the parent's generation — so one gas particle forms up to
        `Generations` stars, matching the reference's counts.
        """
        convert = np.asarray(res.form_star)
        if not convert.any():
            return 0
        ng = gas.ngas
        p = sim.particles
        whole = np.asarray(res.convert_whole)
        mstar = np.asarray(res.mass_of_star)
        idx_whole = np.nonzero(convert & whole)[0]
        idx_split = np.nonzero(convert & ~whole)[0]

        ptype = np.array(p.ptype)
        mask = np.array(p.mask)
        massv = np.array(p.mass)
        birth = np.array(gas.birth_a)
        enr = np.array(gas.last_enrich_myr)
        m0 = np.array(gas.mass0)
        smet = np.array(gas.star_metallicity)
        gmet = np.asarray(gas.metallicity)
        gen = np.array(gas.generation)
        sfr = np.array(gas.sfr)

        # --- whole conversions: flip in place ---
        ptype[idx_whole] = STAR
        birth[idx_whole] = atime
        enr[idx_whole] = 0.0
        m0[idx_whole] = massv[idx_whole]
        smet[idx_whole] = gmet[idx_whole]
        sfr[idx_whole] = 0.0

        # --- split spawns: new rows on ANY dead slot ---
        # dead rows inside the gas prefix (BH-swallowed gas) are
        # reused before the spare tail and before growing capacity
        # (slots_gc reclaim semantics, slotsmanager.cpp:133): long
        # runs with ongoing SF + swallowing keep a bounded shape
        nspawn = len(idx_split)
        if nspawn:
            free = np.nonzero(~mask)[0]
            if len(free) < nspawn:
                self._grow_star_capacity(
                    sim, gas, max(nspawn - len(free), 1))
                p = sim.particles
                ptype = np.array(p.ptype)
                mask = np.array(p.mask)
                massv = np.array(p.mass)
                birth = np.array(gas.birth_a)
                enr = np.array(gas.last_enrich_myr)
                m0 = np.array(gas.mass0)
                smet = np.array(gas.star_metallicity)
                free = np.nonzero(~mask)[0]
            rows = free[:nspawn]
            # scrub stale gas state on reused gas-prefix rows: the
            # row becomes a star — no SFR, no wind delay, no BH mass
            reused = rows[rows < ng]
            if len(reused):
                ri = jnp.asarray(reused)
                sfr[reused] = 0.0
                gas.delay_time = gas.delay_time.at[ri].set(0.0)
                gas.bh_mass = gas.bh_mass.at[ri].set(0.0)
                gas.bh_mdot = gas.bh_mdot.at[ri].set(0.0)
            ipos = np.array(p.ipos)
            vel = np.array(p.vel)
            hsml = np.array(p.hsml)
            tb = np.array(p.timebin)
            idlo = np.array(p.id_lo)
            idhi = np.array(p.id_hi)

            ms = mstar[idx_split]
            ipos[rows] = ipos[idx_split]
            vel[rows] = vel[idx_split]
            hsml[rows] = hsml[idx_split]
            tb[rows] = tb[idx_split]
            massv[rows] = ms
            massv[idx_split] -= ms
            mask[rows] = True
            ptype[rows] = STAR
            # child id: parent id with the generation in the top byte
            # (the reference reuses the parent ID and tracks the
            # generation separately; the byte keeps ours unique)
            gen_child = gen[idx_split] + 1
            idlo[rows] = idlo[idx_split]
            idhi[rows] = (idhi[idx_split]
                          | (gen_child.astype(np.uint32) << 24))
            gen[idx_split] = gen_child
            birth[rows] = atime
            enr[rows] = 0.0
            m0[rows] = ms
            smet[rows] = gmet[idx_split]

            sim.particles = dataclasses.replace(
                p, ipos=jnp.asarray(ipos), vel=jnp.asarray(vel),
                hsml=jnp.asarray(hsml), timebin=jnp.asarray(tb),
                id_lo=jnp.asarray(idlo), id_hi=jnp.asarray(idhi),
                mass=jnp.asarray(massv), mask=jnp.asarray(mask),
                ptype=jnp.asarray(ptype))
        else:
            sim.particles = dataclasses.replace(
                p, ptype=jnp.asarray(ptype), mass=jnp.asarray(massv))

        gas.birth_a = jnp.asarray(birth)
        gas.last_enrich_myr = jnp.asarray(enr)
        gas.mass0 = jnp.asarray(m0)
        gas.star_metallicity = jnp.asarray(smet)
        gas.generation = jnp.asarray(gen)
        gas.sfr = jnp.asarray(sfr)
        if not hasattr(sim, "star_formation_times"):
            sim.star_formation_times = []
        nstars = len(idx_whole) + nspawn
        sim.star_formation_times.extend([atime] * nstars)
        return nstars

    def _grow_star_capacity(self, sim, gas: GasState, need: int):
        """Double the spare star capacity (SlotsIncreaseFactor
        analog, run.cpp:236): extend every particle array and the
        star bookkeeping arrays with dead rows.  Changes array
        shapes, so jitted steps recompile — rare by construction."""
        p = sim.particles
        old = p.n
        extra = max(old // 8, need, 1024)
        extra = ((extra + 127) // 128) * 128

        def pad(a, fill=0):
            padw = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
            return jnp.asarray(np.pad(np.asarray(a), padw,
                                      constant_values=fill))

        new = {}
        for f in dataclasses.fields(p):
            v = getattr(p, f.name)
            if isinstance(v, jax.Array) and v.ndim >= 1 \
                    and v.shape[0] == old:
                new[f.name] = pad(v)
        sim.particles = dataclasses.replace(p, **new)
        for name in ("birth_a", "last_enrich_myr", "mass0",
                     "total_returned", "star_metallicity"):
            setattr(gas, name, pad(getattr(gas, name)))

    def slots_gc(self, sim, gas: GasState):
        """Compact the spare tail (slots_gc, slotsmanager.cpp:133).

        Dead rows inside the gas prefix stay as reusable spawn slots
        (_convert_stars scans the whole mask); this pass shrinks the
        ARRAYS when the tail beyond the last alive row is > 25% of
        the total — the historical peak no longer fixes the shape.
        Runs at snapshot cadence (run.cpp:704 runs slots_gc before
        outputs); a shrink recompiles the jitted steps, rare by the
        25% hysteresis."""
        p = sim.particles
        mask = np.asarray(p.mask)
        alive_rows = np.nonzero(mask)[0]
        last = int(alive_rows[-1]) + 1 if len(alive_rows) else 0
        n_real = getattr(sim, "n_real", p.n)
        new_n = max(last, n_real, gas.ngas)
        new_n = ((new_n + 127) // 128) * 128
        if new_n >= p.n or (p.n - new_n) < p.n // 4:
            return

        def cut(a):
            return a[:new_n]

        new = {}
        for f in dataclasses.fields(p):
            v = getattr(p, f.name)
            if isinstance(v, jax.Array) and v.ndim >= 1 \
                    and v.shape[0] == p.n:
                new[f.name] = cut(v)
        sim.particles = dataclasses.replace(p, **new)
        for name in ("birth_a", "last_enrich_myr", "mass0",
                     "total_returned", "star_metallicity"):
            v = getattr(gas, name)
            if v is not None and v.shape[0] > new_n:
                setattr(gas, name, cut(v))
