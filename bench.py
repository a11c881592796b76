"""Benchmark: particle-steps/sec of the PM KDK step on the local device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric (BASELINE.json) is particle-steps/sec/chip on the
dm-50-512 config (512^3 particles, Nmesh 1024).  That full size does not
fit one v5e chip yet; this benchmark runs the largest PM-only problem
that fits and scales the metric per chip.  The reference publishes no
absolute numbers (BASELINE.md), so vs_baseline is reported against the
first recorded value of this benchmark when available.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from shenqi_tpu.gravity.pm import PMConfig, pm_forces
    from shenqi_tpu.core.particles import float_to_ipos, POS_SCALE

    npart_side = int(os.environ.get("BENCH_NPART_SIDE", 128))
    nmesh = int(os.environ.get("BENCH_NMESH", 256))
    nsteps = int(os.environ.get("BENCH_NSTEPS", 5))
    box = 50000.0

    n = npart_side ** 3
    rng = np.random.RandomState(0)
    # quasi-uniform: lattice + jitter (realistic CIC scatter pattern)
    grid = (np.arange(npart_side) + 0.5) * (box / npart_side)
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    pos += rng.uniform(-0.3, 0.3, pos.shape) * (box / npart_side)
    ipos = jnp.asarray(float_to_ipos(pos % box, box))
    vel = jnp.zeros((n, 3), jnp.float32)
    mass = jnp.full(n, 1.0, jnp.float32)

    cfg = PMConfig(nmesh=nmesh, boxsize=box, G=43007.1, asmth=1.5)

    @jax.jit
    def step(ipos, vel, mass, kick_fac, drift_fac):
        accel, _, _ = pm_forces(ipos, mass, cfg, want_potential=False)
        vel = vel + accel * kick_fac
        dx = vel * drift_fac * jnp.float32(POS_SCALE / box)
        ipos = ipos + dx.astype(jnp.int32).astype(jnp.uint32)
        return ipos, vel

    kick = jnp.float32(1e-4)
    drift = jnp.float32(1e-4)
    # warmup/compile
    ipos, vel = step(ipos, vel, mass, kick, drift)
    ipos.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(nsteps):
        ipos, vel = step(ipos, vel, mass, kick, drift)
    ipos.block_until_ready()
    dt = time.perf_counter() - t0

    ps_per_sec = n * nsteps / dt
    baseline_file = os.path.join(os.path.dirname(__file__),
                                 "BENCH_BASELINE.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f).get("value", 0)
        if base > 0:
            vs_baseline = ps_per_sec / base
    else:
        with open(baseline_file, "w") as f:
            json.dump({"value": ps_per_sec,
                       "config": f"{npart_side}^3 PM nmesh={nmesh}"}, f)

    print(json.dumps({
        "metric": f"pm-kdk particle-steps/sec ({npart_side}^3, "
                  f"nmesh={nmesh})",
        "value": ps_per_sec,
        "unit": "particle-steps/sec/chip",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
