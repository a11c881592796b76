#!/usr/bin/env python
"""Post-hoc halo cross-check for the 32^3 mesh certification: the
in-run FOF (FOFHaloMinLength=32) finds no halos at 32^3 resolution,
so run FOF with a lower min length on the FINAL snapshots of the
single-device and mesh8 runs and compare catalogs halo by halo —
identical ICs, so position agreement shows up as mass agreement.

Usage: dm32_fof_crosscheck.py [workroot] ; appends to RESULT.txt.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from shenqi_tpu.io.bigfile import BigFile
from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.fof.fof import fof


def halos(snap, boxsize, min_length=12):
    bf = BigFile(snap)
    pos = np.asarray(bf["1/Position"].read())
    n = len(pos)
    ipos = jnp.asarray(float_to_ipos(pos % boxsize, boxsize))
    mean_sep = boxsize / np.cbrt(n)
    groups = fof(ipos, jnp.zeros((n, 3), jnp.float32),
                 jnp.ones(n, jnp.float32),
                 np.ones(n, np.int8), np.ones(n, bool),
                 boxsize, mean_sep, linking_length=0.2,
                 min_length=min_length)
    m = np.asarray(groups.masses)[: int(groups.ngroups)]
    return np.sort(m)[::-1], n


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dm32"
    lines = []

    def log(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    box = 64000.0
    snaps = {}
    for tag in ("single", "mesh8"):
        out = os.path.join(root, tag, "output")
        parts = sorted(p for p in os.listdir(out)
                       if p.startswith("PART_"))
        snaps[tag] = os.path.join(out, parts[-1])
    m1, n1 = halos(snaps["single"], box)
    m2, n2 = halos(snaps["mesh8"], box)
    ok = n1 == n2
    log(f"FOF(minlen=12) on final snapshots: "
        f"single {len(m1)} halos / {n1} parts, "
        f"mesh8 {len(m2)} halos / {n2} parts")
    okc = abs(len(m1) - len(m2)) <= max(1, 0.1 * max(len(m1), 1))
    log(f"halo count (10%): {'PASS' if okc else 'FAIL'}")
    ok &= okc
    nh = min(len(m1), len(m2), 20)
    if nh:
        r = m2[:nh] / np.maximum(m1[:nh], 1e-30)
        okf = bool(np.all(np.abs(r - 1) < 0.1))
        log(f"top-{nh} halo masses ratio "
            f"[{r.min():.3f}, {r.max():.3f}] (10%): "
            f"{'PASS' if okf else 'FAIL'}")
        ok &= okf
    log("FOF-CROSSCHECK: " + ("PASS" if ok else "FAIL"))
    with open(os.path.join(root, "RESULT.txt"), "a") as f:
        f.write("\n".join(lines) + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
