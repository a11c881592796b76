"""Glass pre-IC generation (libgenic/glass.cpp analog).

Evolves random particles under REVERSED PM gravity with damped steps:
mutual repulsion relaxes them into a glass-like configuration with
sub-Poisson noise.  Same scheme as the reference glass_evolve: PM-only
force, velocity = -force * damping, fixed step count.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.particles import float_to_ipos, POS_SCALE
from ..gravity.pm import PMConfig, pm_forces


def make_glass(ngrid: int, boxsize: float, seed: int = 1,
               nsteps: int = 30, nmesh: int = None):
    """Return glass particle positions [ngrid^3, 3] (internal units)."""
    nmesh = nmesh or ngrid
    n = ngrid ** 3
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0, boxsize, (n, 3))
    cfg = PMConfig(nmesh=nmesh, boxsize=boxsize, G=1.0, asmth=0.0)
    mass = jnp.ones(n, jnp.float32)

    ipos = jnp.asarray(float_to_ipos(pos, boxsize))
    # damping scaled so typical first-step moves are ~ mean separation
    sep = boxsize / ngrid
    for i in range(nsteps):
        accel, _, _ = pm_forces(ipos, mass, cfg, want_potential=False)
        amax = float(jnp.max(jnp.linalg.norm(accel, axis=-1)))
        if amax <= 0:
            break
        damping = jnp.float32(0.3 * sep / amax)
        disp = -accel * damping
        dx_fp = disp * jnp.float32(POS_SCALE / boxsize)
        ipos = ipos + dx_fp.astype(jnp.int32).astype(jnp.uint32)
    return np.asarray(ipos, dtype=np.float64) * (boxsize / POS_SCALE)
