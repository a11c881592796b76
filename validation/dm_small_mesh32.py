#!/usr/bin/env python
"""dm-small pipeline END-TO-END at 32^3 on the 8-device mesh, with a
single-device run of the SAME ICs as the parity reference.

Why reduced resolution: the full 64^3 dm-small on the 8-VIRTUAL-device
CPU mesh costs ~130 s/step on this 1-core container (~12 h for z=9->3)
— it cannot complete inside a round.  This script certifies the same
thing at a scale that finishes: the complete CLI product path
(genic -> gadget_main --mesh 8: slab exchange + balanced cuts + routed
slab PM/pencil FFT + refined slab gravity + slab FOF + sharded
snapshots) on a reference-shaped example, with the BINDING acceptance
being mesh-vs-single-device output parity:
  * P(k) at a=0.15/0.2/0.25 within 5% bin-by-bin (first 12 bins);
  * top-20 FOF halo masses within 10%;
  * halo count within 10%;
plus an informational large-scale P(k)-vs-linear envelope at a=0.1.

Usage: python validation/dm_small_mesh32.py [workroot]
Writes <workroot>/RESULT.txt; exit 0 on pass.
"""

import os
import sys

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

from dm_small import GENIC, GADGET, EX, check_power  # noqa


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dm32"
    lines = []

    def log(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    from shenqi_tpu.cli.genic_main import run_genic
    from shenqi_tpu.cli.gadget_main import run_gadget

    genic32 = GENIC.replace("Ngrid = 64", "Ngrid = 32")
    gadget32 = GADGET.replace("Nmesh = 128", "Nmesh = 64")
    runs = {}
    for tag, mesh_devices in (("single", None), ("mesh8", 8)):
        work = os.path.join(root, tag)
        os.makedirs(work, exist_ok=True)
        gp = os.path.join(work, "paramfile.genic")
        with open(gp, "w") as f:
            f.write(genic32.format(out=work, ex=EX))
        pp = os.path.join(work, "paramfile.gadget")
        with open(pp, "w") as f:
            f.write(gadget32.format(out=work))
        done = os.path.join(work, "output",
                            "powerspectrum-0.2500.txt")
        if os.path.exists(done):
            log(f"[{tag}] output exists; skipping rerun")
        else:
            log(f"[{tag}] generating ICs...")
            run_genic(gp)
            log(f"[{tag}] running z=9 -> z=3"
                + (f" on {mesh_devices}-device mesh"
                   if mesh_devices else " single-device") + "...")
            if mesh_devices:
                run_gadget(pp, mesh_devices=mesh_devices)
            else:
                run_gadget(pp)
        runs[tag] = os.path.join(work, "output")

    ok = True
    # informational large-scale envelope at the IC-adjacent output
    check_power(runs["single"], 0.1, rtol=0.12, log=log)

    # BINDING: mesh-vs-single parity
    for a in (0.15, 0.2, 0.25):
        f1 = os.path.join(runs["single"], f"powerspectrum-{a:.4f}.txt")
        f2 = os.path.join(runs["mesh8"], f"powerspectrum-{a:.4f}.txt")
        d1 = np.loadtxt(f1)
        d2 = np.loadtxt(f2)
        nb = min(len(d1), len(d2), 12)
        r = d2[:nb, 1] / np.maximum(d1[:nb, 1], 1e-30)
        okp = bool(np.all(np.abs(r - 1) < 0.05))
        log(f"mesh-vs-single P(k) a={a}: ratio "
            f"[{r.min():.3f}, {r.max():.3f}] (5%) -> "
            f"{'PASS' if okp else 'FAIL'}")
        ok &= okp

    from shenqi_tpu.io.bigfile import BigFile
    m1 = np.asarray(
        BigFile(os.path.join(runs["single"], "PIG_002"))
        ["FOFGroups/Mass"].read())
    m2 = np.asarray(
        BigFile(os.path.join(runs["mesh8"], "PIG_002"))
        ["FOFGroups/Mass"].read())
    okc = abs(len(m1) - len(m2)) <= 0.1 * max(len(m1), 1)
    log(f"halo counts single={len(m1)} mesh={len(m2)} (10%) -> "
        f"{'PASS' if okc else 'FAIL'}")
    ok &= okc
    nh = min(len(m1), len(m2), 20)
    if nh:
        r = m2[:nh] / np.maximum(m1[:nh], 1e-30)
        okf = bool(np.all(np.abs(r - 1) < 0.1))
        log(f"mesh-vs-single top-{nh} FOF masses: ratio "
            f"[{r.min():.3f}, {r.max():.3f}] (10%) -> "
            f"{'PASS' if okf else 'FAIL'}")
        ok &= okf
    else:
        log("no in-run halos at FOFHaloMinLength=32 (32^3 "
            "resolution): see dm32_fof_crosscheck.py for the "
            "low-min-length halo comparison")

    log("OVERALL: " + ("PASS" if ok else "FAIL"))
    with open(os.path.join(root, "RESULT.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
