"""Kinetic stellar winds (winds.cpp analog).

Round-1 scope: the SUBGRID wind path (winds_make_after_sf +
wind_do_kick), where the star-forming gas particle itself receives the
kick probabilistically — fully vectorizable with no neighbor walk.
Both velocity scalings are implemented:
  * SH03 fixed efficiency: eta = WindEfficiency,
    v = WindSpeed * a with WindSpeed = sqrt(2 eps_w beta u_SN/(1-beta))
  * VS08 halo-based: eta = sigma0^2/(vphys^2 + 2 utherm),
    v = WindSpeedFactor * vdisp
Decoupled wind particles (DelayTime > 0) skip hydro forces until they
recouple (winds_is_particle_decoupled semantics).

The non-subgrid neighbor-kick treewalk (stars kick surrounding gas)
follows via the block walk engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import GAMMA_MINUS1, SEC_PER_MEGAYEAR

# WindModel flags (winds.h:14-21)
WIND_SUBGRID = 1
WIND_DECOUPLE_SPH = 2
WIND_USE_HALO = 4
WIND_FIXED_EFFICIENCY = 8
WIND_ISOTROPIC = 512
# canonical combinations (gadget/params.cpp:234-243)
WIND_MODEL_SH03 = WIND_SUBGRID | WIND_DECOUPLE_SPH | WIND_FIXED_EFFICIENCY
WIND_MODEL_VS08 = WIND_FIXED_EFFICIENCY
WIND_MODEL_OFJT10 = WIND_USE_HALO | WIND_DECOUPLE_SPH


def _mix32(a, b):
    """Counter-based avalanche hash of two uint32 streams (the
    get_random_number(ID + i) analog, system/rand.c): deterministic
    in the particle ID, so draws are independent of device count and
    row layout — a slab run reproduces the single-device stream."""
    x = (a * jnp.uint32(0x9E3779B9)) ^ (b * jnp.uint32(0x85EBCA6B))
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def idhash_uniform(salt, pid_u32, lane: int):
    """Uniform [0,1) draw keyed by (per-step salt, particle id,
    lane).  salt: uint32 scalar (e.g. jax.random.bits of the step
    key); pid_u32: uint32 array."""
    x = _mix32(pid_u32 + jnp.uint32(lane) * jnp.uint32(0x27D4EB2F),
               jnp.uint32(salt))
    return x.astype(jnp.float32) * jnp.float32(2.0 ** -32)


@dataclass
class WindParams:
    WindModel: int = 0
    WindEfficiency: float = 2.0
    WindEnergyFraction: float = 1.0
    WindSigma0: float = 353.0
    WindSpeedFactor: float = 3.7
    WindThermalFactor: float = 0.0
    MinWindVelocity: float = 0.0
    WindFreeTravelLength: float = 20.0
    WindFreeTravelDensFac: float = 0.1
    MaxWindFreeTravelTime: float = 60.0    # Myr (converted in init)
    # derived
    WindSpeed: float = 0.0
    WindFreeTravelDensThresh: float = 0.0

    def init(self, factor_sn, egy_spec_sn, phys_dens_thresh,
             unit_time_in_s):
        self.WindSpeed = np.sqrt(2 * self.WindEnergyFraction * factor_sn
                                 * egy_spec_sn / (1 - factor_sn))
        self.MaxWindFreeTravelTime = (self.MaxWindFreeTravelTime
                                      * SEC_PER_MEGAYEAR
                                      / unit_time_in_s)
        self.WindFreeTravelDensThresh = (self.WindFreeTravelDensFac
                                         * phys_dens_thresh)
        return self

    def has(self, flag):
        return (self.WindModel & flag) != 0


def ever_decouple(wp: WindParams) -> bool:
    return wp.has(WIND_DECOUPLE_SPH) and wp.MaxWindFreeTravelTime > 0


def is_decoupled(delay_time, density, a3inv, wp: WindParams):
    """winds_is_particle_decoupled: in the wind phase and still dense."""
    if not ever_decouple(wp):
        return jnp.zeros_like(delay_time, dtype=bool)
    return ((delay_time > 0)
            & (density * a3inv > wp.WindFreeTravelDensThresh))


def wind_params_for(vdisp, atime, wp: WindParams):
    """(kick velocity, efficiency, utherm) per particle
    (get_wind_params math)."""
    vphys = vdisp / atime
    utherm = wp.WindThermalFactor * 1.5 * vphys * vphys
    if wp.has(WIND_FIXED_EFFICIENCY):
        windeff = jnp.full_like(vdisp, wp.WindEfficiency)
        vel = jnp.full_like(vdisp, wp.WindSpeed * atime)
    else:  # WIND_USE_HALO (VS08)
        windeff = wp.WindSigma0 ** 2 / jnp.maximum(
            vphys * vphys + 2 * utherm, 1e-35)
        vel = wp.WindSpeedFactor * vdisp
    vel = jnp.maximum(vel, wp.MinWindVelocity * atime)
    return vel, windeff, utherm


class WindResult(NamedTuple):
    vel: jax.Array          # updated velocities [N,3]
    entropy: jax.Array      # updated entropy
    delay_time: jax.Array   # updated decoupling clocks


def winds_subgrid_step(key, vel3, entropy, density, delay_time, mass,
                       sm, vdisp, atime, a3inv, wp: WindParams,
                       eligible, pids=None) -> WindResult:
    """Subgrid wind kicks after star formation (winds_make_after_sf).

    sm: stellar mass formed this step per particle; eligible: gas mask.
    pids: optional uint32 particle ids — when given, all draws are
    keyed by (step salt, id) like the reference's get_random_number(ID)
    (winds.cpp:542), so the kick decisions are independent of row
    layout and device count (slab runs reproduce the same stream).
    """
    if not wp.has(WIND_SUBGRID) or wp.WindModel == 1:  # nowind
        return WindResult(vel3, entropy, delay_time)
    kick_v, windeff, utherm = wind_params_for(vdisp, atime, wp)
    pw = windeff * sm / jnp.maximum(mass, 1e-35)
    prob = 1 - jnp.exp(-pw)
    if pids is not None:
        salt = jax.random.bits(key, dtype=jnp.uint32)
        u_kick = idhash_uniform(salt, pids, 0)
        # isotropic direction from two id-keyed uniforms
        z = 2.0 * idhash_uniform(salt, pids, 1) - 1.0
        phi = 2.0 * jnp.pi * idhash_uniform(salt, pids, 2)
        s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        dirs = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z],
                         axis=-1)
        do_kick = (u_kick < prob) & eligible & (kick_v > 0)
    else:
        k1, k2 = jax.random.split(key)
        do_kick = (jax.random.uniform(k1, mass.shape) < prob) \
            & eligible & (kick_v > 0)
        # random isotropic direction
        dirs = jax.random.normal(k2, vel3.shape)
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1,
                                                  keepdims=True),
                                  1e-20)
    vel_new = vel3 + jnp.where(do_kick[:, None],
                               kick_v[:, None] * dirs, 0.0)
    enttou = (density * a3inv) ** GAMMA_MINUS1 / GAMMA_MINUS1
    ent_new = entropy + jnp.where(do_kick, utherm
                                  / jnp.maximum(enttou, 1e-35), 0.0)
    if ever_decouple(wp):
        delay = wp.WindFreeTravelLength / jnp.maximum(kick_v / atime,
                                                      1e-35)
        delay = jnp.minimum(delay, wp.MaxWindFreeTravelTime)
        delay_new = jnp.where(do_kick, delay, delay_time)
    else:
        delay_new = delay_time
    return WindResult(vel_new, ent_new, delay_new)


def winds_star_feedback(key, star_ipos, star_hsml, star_mass,
                        star_vdisp, gas_ipos, gas_mass, gas_vel,
                        gas_entropy, gas_density, gas_delay,
                        gas_alive, boxsize, atime, a3inv,
                        wp: WindParams, gas_pids=None,
                        star_pids=None, total_weight=None):
    """Non-subgrid winds: new stars kick neighbouring gas
    (sfr_wind_feedback_ngbiter, winds.cpp:514-566).

    Two passes over the dense [Ngas x Nstar] pair grid (new stars per
    step are few): (1) total eligible gas mass within each star's
    Hsml (wk=1 weighting, VS08); (2) per pair, kick probability
    p = windeff * M_star / TotalWeight; a gas particle hit by several
    stars takes the NEAREST one (the reference's post-walk kick
    arbitration).  Kicked gas gains an isotropic random velocity of
    magnitude v, thermal energy utherm, and a decoupling delay time.

    gas_pids/star_pids (uint32, optional): when given, every random
    draw is keyed by (step salt, particle id) via idhash_uniform —
    the get_random_number(ID) scheme of winds.cpp:542, which makes
    the draw stream independent of row layout (slab runs reproduce
    the single-device stream exactly).  total_weight (optional):
    externally supplied per-star eligible-mass sums (the distributed
    caller psums these across devices); computed locally when None.

    Returns (vel, entropy, delay_time) updated arrays.
    """
    import jax
    from ..core.particles import POS_SCALE
    ns = star_ipos.shape[0]
    ng = gas_ipos.shape[0]
    if ns == 0:
        return gas_vel, gas_entropy, gas_delay
    to_f = jnp.float32(boxsize / POS_SCALE)
    dist = (gas_ipos[:, None, :] - star_ipos[None, :, :]).astype(
        jnp.int32).astype(jnp.float32) * to_f
    r2 = jnp.sum(dist * dist, axis=-1)                  # [Ng, Ns]
    eligible = gas_alive & (gas_delay <= 0)
    inside = (r2 < (star_hsml[None, :]) ** 2) & eligible[:, None]

    if total_weight is None:
        total_weight = jnp.sum(
            jnp.where(inside, gas_mass[:, None], 0.0), axis=0)  # [Ns]
    v, windeff, utherm = wind_params_for(star_vdisp, atime, wp)

    p = jnp.where(inside & (total_weight[None, :] > 0) & (v[None, :]
                                                          > 0),
                  windeff[None, :] * star_mass[None, :]
                  / jnp.maximum(total_weight[None, :], 1e-35), 0.0)
    if gas_pids is not None:
        salt = jax.random.bits(key, (2,), "uint32")
        mixed = _mix32(gas_pids.astype(jnp.uint32)[:, None],
                       star_pids.astype(jnp.uint32)[None, :])
        u_hit = idhash_uniform(salt[0], mixed, 0)
        u_th = idhash_uniform(salt[1], gas_pids.astype(jnp.uint32), 1)
        u_ph = idhash_uniform(salt[1], gas_pids.astype(jnp.uint32), 2)
    else:
        k1, k2, k3 = jax.random.split(key, 3)
        u_hit = jax.random.uniform(k1, (ng, ns))
        u_th = jax.random.uniform(k2, (ng,))
        u_ph = jax.random.uniform(k3, (ng,))
    hit = u_hit < p
    # nearest hitting star per gas particle
    r2m = jnp.where(hit, r2, jnp.inf)
    best = jnp.argmin(r2m, axis=1)
    kicked = jnp.any(hit, axis=1)
    vkick = v[best]
    ukick = utherm[best]

    theta = jnp.arccos(2 * u_th - 1)
    phi = 2 * jnp.pi * u_ph
    direc = jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                       jnp.sin(theta) * jnp.sin(phi),
                       jnp.cos(theta)], -1)
    kickedf = kicked.astype(jnp.float32)
    vel = gas_vel + (kickedf * vkick)[:, None] * direc
    enttou = jnp.maximum(gas_density * a3inv, 1e-35) ** GAMMA_MINUS1 \
        / GAMMA_MINUS1
    entropy = gas_entropy + jnp.where(kicked, ukick / enttou, 0.0)
    if ever_decouple(wp):
        delay = jnp.minimum(
            wp.WindFreeTravelLength
            / jnp.maximum(vkick / atime, 1e-35),
            wp.MaxWindFreeTravelTime)
        gas_delay = jnp.where(kicked, delay, gas_delay)
    return vel, entropy, gas_delay


def winds_decay(delay_time, density, a3inv, dtime, wp: WindParams):
    """Advance decoupling clocks; recouple when diffuse
    (winds_decoupled_hydro semantics)."""
    if not ever_decouple(wp):
        return delay_time
    delay = jnp.maximum(delay_time - dtime, 0.0)
    recouple = density * a3inv < wp.WindFreeTravelDensThresh
    return jnp.where(recouple, 0.0, delay)
