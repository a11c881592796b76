"""Structure-of-arrays particle state (the partmanager/slotsmanager analog).

TPU-first design decisions (vs the reference's AoS `particle_data` +
per-type slots, libgadget/partmanager.h:9-71, slotsmanager.h:35-131):

* **SoA jnp arrays** — every field is a flat [N] or [N,3] array; the whole
  state is a pytree that flows through jit/shard_map.

* **Fixed-point uint32 positions** (`ipos`): the box maps to the full
  uint32 range, so periodic wrapping is free integer overflow and the
  minimum-image separation is exact: ``(a - b).astype(int32)``.  This is
  the TPU answer to the reference's double positions + NEAREST macro +
  random offset: float32 would lose ~7 digits of box size, int32 keeps 9.7.
  (Gadget-4 uses the same integer-coordinate trick on CPUs.)

* **Type-blocked regions with capacity + masks**: particles of type t live
  in slots [offset[t], offset[t]+capacity[t]); a slot is alive iff its
  entry in `mask` is True.  Per-type extension fields (SPH, star, BH) are
  arrays of the *region's* capacity, index-aligned with the base arrays —
  no PI slot indirection.  Star formation converts gas->star by masking
  out the gas slot and writing a star slot (fixed shapes preserved).

* IDs are stored as two uint32 words (lo, hi) to avoid enabling global
  x64 on TPU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# particle types, matching the reference convention
GAS, DM, NU, UNUSED3, STAR, BH = 0, 1, 2, 3, 4, 5
NTYPES = 6

POS_SCALE = 2.0 ** 32  # integer units across one box length


def float_to_ipos(pos, boxsize):
    """Map float positions [0, box) -> uint32 fixed point.  Host or device."""
    frac = np.asarray(pos, dtype=np.float64) / boxsize
    frac = frac - np.floor(frac)
    return (frac * POS_SCALE).astype(np.int64).astype(np.uint32)


def ipos_to_float(ipos, boxsize, dtype=jnp.float32):
    """uint32 fixed point -> float positions in [0, box)."""
    return (ipos.astype(dtype) * (boxsize / POS_SCALE)).astype(dtype)


def ipos_delta(ipos_a, ipos_b, boxsize, dtype=jnp.float32):
    """Minimum-image separation a-b as float: exact via int32 wraparound."""
    d = (ipos_a - ipos_b).astype(jnp.int32)
    return d.astype(dtype) * jnp.asarray(boxsize / POS_SCALE, dtype)


@jax.tree_util.register_dataclass
@dataclass
class ParticleData:
    """Base per-particle fields (every species).

    Capacity-N arrays; aliveness via `mask`.  `ptype` of dead slots is the
    type of their region (so region invariants hold even for holes).
    """

    ipos: jax.Array        # [N,3] uint32 fixed-point position
    vel: jax.Array         # [N,3] f32 velocity (internal units)
    mass: jax.Array        # [N]   f32
    ptype: jax.Array       # [N]   int8
    mask: jax.Array        # [N]   bool — slot alive?
    id_lo: jax.Array       # [N]   uint32
    id_hi: jax.Array       # [N]   uint32
    timebin: jax.Array     # [N]   int8  — current timestep bin
    hsml: jax.Array        # [N]   f32   — smoothing / neighbor-search length
    # gravity state
    grav_pm: jax.Array     # [N,3] f32 long-range (PM) acceleration
    grav_accel: jax.Array  # [N,3] f32 short-range (tree) acceleration
    potential: jax.Array   # [N]   f32
    old_acc: jax.Array     # [N]   f32 |acc| from previous step (tree opening)

    @property
    def n(self) -> int:
        return self.ipos.shape[0]

    @classmethod
    def zeros(cls, n: int) -> "ParticleData":
        return cls(
            ipos=jnp.zeros((n, 3), jnp.uint32),
            vel=jnp.zeros((n, 3), jnp.float32),
            mass=jnp.zeros((n,), jnp.float32),
            ptype=jnp.zeros((n,), jnp.int8),
            mask=jnp.zeros((n,), bool),
            id_lo=jnp.zeros((n,), jnp.uint32),
            id_hi=jnp.zeros((n,), jnp.uint32),
            timebin=jnp.zeros((n,), jnp.int8),
            hsml=jnp.zeros((n,), jnp.float32),
            grav_pm=jnp.zeros((n, 3), jnp.float32),
            grav_accel=jnp.zeros((n, 3), jnp.float32),
            potential=jnp.zeros((n,), jnp.float32),
            old_acc=jnp.zeros((n,), jnp.float32),
        )

    def set_ids(self, ids: np.ndarray) -> "ParticleData":
        ids = np.asarray(ids, dtype=np.uint64)
        return jax.tree_util.tree_map(
            lambda x: x, self)._replace_ids(ids)

    def _replace_ids(self, ids):
        import dataclasses
        return dataclasses.replace(
            self,
            id_lo=jnp.asarray((ids & 0xFFFFFFFF).astype(np.uint32)),
            id_hi=jnp.asarray((ids >> np.uint64(32)).astype(np.uint32)))

    def ids64(self) -> np.ndarray:
        """Recombine the id words on host as uint64."""
        lo = np.asarray(self.id_lo, dtype=np.uint64)
        hi = np.asarray(self.id_hi, dtype=np.uint64)
        return (hi << np.uint64(32)) | lo


@jax.tree_util.register_dataclass
@dataclass
class SphData:
    """SPH extension fields, index-aligned with the gas region.

    Mirrors the reference's sph_particle_data (slotsmanager.h:97-131).
    """

    entropy: jax.Array         # [Ng] f32 — entropy function A = P/rho^gamma
    density: jax.Array         # [Ng] f32
    egy_wt_density: jax.Array  # [Ng] f32 — pressure-entropy weighted density
    dhsml_egy_density: jax.Array  # [Ng] f32
    dhsml_density: jax.Array   # [Ng] f32 — grad-h correction factor
    div_vel: jax.Array         # [Ng] f32
    curl_vel: jax.Array        # [Ng] f32
    hydro_accel: jax.Array     # [Ng,3] f32
    dt_entropy: jax.Array      # [Ng] f32
    max_signal_vel: jax.Array  # [Ng] f32
    ne: jax.Array              # [Ng] f32 — electron abundance
    metallicity: jax.Array     # [Ng] f32
    metals: jax.Array          # [Ng, 9] f32 — per-species metal masses
    sfr: jax.Array             # [Ng] f32
    delay_time: jax.Array      # [Ng] f32 — wind decoupling
    egyrho_at_kick: jax.Array  # [Ng] f32

    @classmethod
    def zeros(cls, n: int, nmetals: int = 9) -> "SphData":
        f = lambda *shape: jnp.zeros(shape, jnp.float32)
        return cls(
            entropy=f(n), density=f(n), egy_wt_density=f(n),
            dhsml_egy_density=f(n), dhsml_density=f(n),
            div_vel=f(n), curl_vel=f(n), hydro_accel=f(n, 3),
            dt_entropy=f(n), max_signal_vel=f(n), ne=f(n),
            metallicity=f(n), metals=f(n, nmetals), sfr=f(n),
            delay_time=f(n), egyrho_at_kick=f(n),
        )


@jax.tree_util.register_dataclass
@dataclass
class StarData:
    """Star extension fields (slotsmanager.h:78-92 analog)."""

    formation_time: jax.Array   # [Ns] f32 — scale factor at birth
    birth_density: jax.Array    # [Ns] f32
    metallicity: jax.Array      # [Ns] f32
    metals: jax.Array           # [Ns, 9] f32
    last_enrichment: jax.Array  # [Ns] f32 — myr of last metal return
    total_mass_returned: jax.Array  # [Ns] f32

    @classmethod
    def zeros(cls, n: int, nmetals: int = 9) -> "StarData":
        f = lambda *shape: jnp.zeros(shape, jnp.float32)
        return cls(formation_time=f(n), birth_density=f(n),
                   metallicity=f(n), metals=f(n, nmetals),
                   last_enrichment=f(n), total_mass_returned=f(n))


@jax.tree_util.register_dataclass
@dataclass
class BHData:
    """Black-hole extension fields (slotsmanager.h:35-73 analog)."""

    bh_mass: jax.Array        # [Nb] f32 — subgrid mass
    mdot: jax.Array           # [Nb] f32
    density: jax.Array        # [Nb] f32
    formation_time: jax.Array # [Nb] f32
    mtrack: jax.Array         # [Nb] f32
    swallow_id_lo: jax.Array  # [Nb] uint32
    swallow_id_hi: jax.Array  # [Nb] uint32
    swallowed: jax.Array      # [Nb] bool
    mseed: jax.Array          # [Nb] f32
    kinetic_energy: jax.Array # [Nb] f32 — accumulated kinetic feedback

    @classmethod
    def zeros(cls, n: int) -> "BHData":
        f = lambda *shape: jnp.zeros(shape, jnp.float32)
        u = lambda *shape: jnp.zeros(shape, jnp.uint32)
        return cls(bh_mass=f(n), mdot=f(n), density=f(n),
                   formation_time=f(n), mtrack=f(n),
                   swallow_id_lo=u(n), swallow_id_hi=u(n),
                   swallowed=jnp.zeros((n,), bool), mseed=f(n),
                   kinetic_energy=f(n))


@dataclass
class RegionLayout:
    """Static (host-side) region layout: offsets/capacities per type."""

    offsets: np.ndarray     # [NTYPES] int
    capacities: np.ndarray  # [NTYPES] int

    @classmethod
    def create(cls, counts: Dict[int, int],
               alloc_factor: float = 1.0) -> "RegionLayout":
        caps = np.zeros(NTYPES, dtype=np.int64)
        for t, c in counts.items():
            caps[t] = int(np.ceil(c * (alloc_factor if t != DM else 1.0)))
        # round capacities to multiples of 128 for TPU-friendly shapes
        caps = np.where(caps > 0, ((caps + 127) // 128) * 128, 0)
        offs = np.concatenate([[0], np.cumsum(caps)[:-1]])
        return cls(offsets=offs, capacities=caps)

    @property
    def total(self) -> int:
        return int(self.offsets[-1] + self.capacities[-1])

    def region(self, t: int) -> slice:
        return slice(int(self.offsets[t]),
                     int(self.offsets[t] + self.capacities[t]))


@dataclass
class SimState:
    """Everything the integrator evolves (a pytree of SoA blocks)."""

    particles: ParticleData
    layout: RegionLayout
    sph: Optional[SphData] = None
    star: Optional[StarData] = None
    bh: Optional[BHData] = None

    def ntype(self, t: int):
        """Number of live particles of type t (device scalar)."""
        sl = self.layout.region(t)
        return jnp.sum(self.particles.mask[sl].astype(jnp.int32))
