#!/usr/bin/env python
"""dm-small END-TO-END ON THE 8-DEVICE MESH from the CLI (--mesh 8).

The multi-chip product certification (round-2 VERDICT Missing #1 /
next-round #4): the same reference example that passes single-device
must run distributed — slab exchange + slab PM/pencil FFT + refined
slab tree gravity + sharded snapshots + slab FOF — driven by
`cli.gadget_main --mesh 8` on an 8-virtual-device CPU mesh, and its
P(k)/FOF outputs must meet the same acceptance criteria
(examples/dm-small/check_results.py), plus a cross-check against the
single-device run's outputs when present.

Usage: python validation/dm_small_mesh.py [workdir] [single_dev_out]
Writes <workdir>/RESULT.txt; exit 0 on pass.
"""

import os
import sys

# 8 virtual CPU devices BEFORE any jax/backend initialization
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                      "5")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

from dm_small import GENIC, GADGET, EX, check_power, check_hmf  # noqa


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dm_small_mesh"
    single_out = sys.argv[2] if len(sys.argv) > 2 else \
        "/tmp/dm_small_val/output"
    os.makedirs(work, exist_ok=True)
    gp = os.path.join(work, "paramfile.genic")
    with open(gp, "w") as f:
        f.write(GENIC.format(out=work, ex=EX))
    pp = os.path.join(work, "paramfile.gadget")
    with open(pp, "w") as f:
        f.write(GADGET.format(out=work))

    from shenqi_tpu.cli.genic_main import run_genic
    from shenqi_tpu.cli.gadget_main import run_gadget
    lines = []

    def log(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    log(f"devices: {jax.devices()}")
    assert len(jax.devices()) >= 8, "need 8 virtual CPU devices"
    icdone = os.path.join(work, "IC", ".complete")
    if os.path.exists(icdone):
        log("ICs already present, skipping genic.")
    else:
        log("Generating ICs...")
        run_genic(gp)
        open(icdone, "w").write("ok\n")
    log("Running dm-small on the 8-device mesh (z=9 -> z=3)...")
    run_gadget(pp, mesh_devices=8)

    outdir = os.path.join(work, "output")
    ok = True
    ok &= check_power(outdir, 0.1, rtol=0.08, log=log)
    ok &= check_power(outdir, 0.2, rtol=0.19, log=log)
    ok &= check_power(outdir, 0.25, rtol=0.21, maxi=5, log=log)
    ok &= check_hmf(os.path.join(outdir, "PIG_002"), log=log)

    # cross-check vs the single-device run's outputs (same ICs)
    if os.path.isdir(single_out):
        from shenqi_tpu.io.bigfile import BigFile
        for a in (0.15, 0.2, 0.25):
            f1 = os.path.join(single_out,
                              f"powerspectrum-{a:.4f}.txt")
            f2 = os.path.join(outdir, f"powerspectrum-{a:.4f}.txt")
            if not (os.path.exists(f1) and os.path.exists(f2)):
                continue
            d1 = np.loadtxt(f1)
            d2 = np.loadtxt(f2)
            nb = min(len(d1), len(d2), 12)
            r = d2[:nb, 1] / np.maximum(d1[:nb, 1], 1e-30)
            okp = bool(np.all(np.abs(r - 1) < 0.05))
            log(f"mesh-vs-single P(k) a={a}: ratio "
                f"[{r.min():.3f}, {r.max():.3f}] (5%) -> "
                f"{'PASS' if okp else 'FAIL'}")
            ok &= okp
        p1 = os.path.join(single_out, "PIG_002")
        p2 = os.path.join(outdir, "PIG_002")
        if os.path.isdir(p1) and os.path.isdir(p2):
            m1 = np.asarray(BigFile(p1)["FOFGroups/Mass"].read())
            m2 = np.asarray(BigFile(p2)["FOFGroups/Mass"].read())
            nh = min(len(m1), len(m2), 20)
            r = m2[:nh] / np.maximum(m1[:nh], 1e-30)
            okf = bool(np.all(np.abs(r - 1) < 0.1))
            log(f"mesh-vs-single top-{nh} FOF masses: ratio "
                f"[{r.min():.3f}, {r.max():.3f}] (10%) -> "
                f"{'PASS' if okf else 'FAIL'}")
            ok &= okf

    log("OVERALL: " + ("PASS" if ok else "FAIL"))
    with open(os.path.join(work, "RESULT.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
