#!/usr/bin/env python
"""Patchy-reionization Zreion table generator
(tools/make_HI_reionization_table.py analog): the Battaglia et al.
2013 correlation between large-scale overdensity and reionization
redshift, written as the `Zreion_Table` bigfile the UV-fluctuation
module reads (shenqi_tpu.physics.uv_fluctuations.ZreionTable.load).

  z_re(x) = z_mid + (1 + z_mid) * F^-1[ B(k) W_R(k) delta(k) ]
  B(k) = (1/1.686) / (1 + k/k0)^0.564,  k0 = 0.185 h/Mpc

The density structure at z_mid comes from OUR genic displacement
pipeline (Zel'dovich at the paramfile's seed/spectrum — the same
realization as the simulation ICs, where the reference runs a
separate FastPM solve), CIC-deposited on the table mesh.

Usage: make_HI_reionization_table.py --genic PARAMFILE --output OUT
       [--resolution 1.0] [--redshift 7.5]
"""

import argparse
import os
import shutil
import sys
import tempfile

# host-side pre-processing tool: the Ngrid^3 displacement solve is
# tiny — run on CPU, never dial an accelerator (override with
# SHENQI_TOOL_DEVICE=<platform>)
os.environ["JAX_PLATFORMS"] = os.environ.get("SHENQI_TOOL_DEVICE",
                                             "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms",
                  os.environ.get("SHENQI_TOOL_DEVICE", "cpu"))


def tophat(R, k):
    rk = R * k
    mask = rk == 0
    rk = np.where(mask, 1.0, rk)
    ans = 3.0 / rk ** 3 * (np.sin(rk) - rk * np.cos(rk))
    return np.where(mask, 1.0, ans)


def bofk(k):
    """Battaglia 2013 overdensity -> z_re bias."""
    b0 = 1.0 / 1.686
    k0 = 0.185
    al = 0.564
    return b0 / (1 + k / k0) ** al


def generate_zreion_file(paramfile, output, redshift=7.5,
                         resolution=1.0):
    if os.path.exists(output):
        raise IOError(f"Refusing to write to existing file: {output}")
    from make_class_power import read_paramfile
    from shenqi_tpu.io.bigfile import BigFile
    from shenqi_tpu.cli.genic_main import run_genic

    cfg = read_paramfile(paramfile)
    cm_per_mpc = 3.085678e24
    box_mpc = cfg["BoxSize"] * cfg["UnitLength_in_cm"] / cm_per_mpc
    nmesh = int(box_mpc / resolution)
    nmesh -= nmesh % 8
    print(f"BoxSize = {box_mpc:g} Mpc/h, Redshift = {redshift:g}, "
          f"Nmesh = {nmesh}")

    # density structure at z_mid: rerun OUR genic at that redshift
    tmp = tempfile.mkdtemp(prefix="zreion_")
    try:
        lines = []
        with open(paramfile) as f:
            for line in f:
                key = line.split("=")[0].strip()
                if key in ("Redshift", "OutputDir", "FileBase",
                           "ProduceGas", "NgridNu"):
                    continue
                lines.append(line.rstrip("\n"))
        lines += [f"Redshift = {redshift}", f"OutputDir = {tmp}",
                  "FileBase = ZRIC", "ProduceGas = 0"]
        pf2 = os.path.join(tmp, "paramfile.genic")
        with open(pf2, "w") as f:
            f.write("\n".join(lines) + "\n")
        run_genic(pf2)
        bf = BigFile(os.path.join(tmp, "ZRIC"))
        pos = np.asarray(bf["1/Position"].read())
        box = cfg["BoxSize"]

        from get_xgrids import _cic3d
        grid = _cic3d(pos % box, np.ones(len(pos)), box, nmesh)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    delta = grid / max(grid.mean(), 1e-300) - 1.0
    dk = np.fft.rfftn(delta)
    kf = 2 * np.pi / box_mpc                  # h/Mpc fundamental
    kx = np.fft.fftfreq(nmesh, 1.0 / nmesh)[:, None, None]
    ky = np.fft.fftfreq(nmesh, 1.0 / nmesh)[None, :, None]
    kz = np.arange(nmesh // 2 + 1)[None, None, :]
    kk = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2) * kf
    dk *= tophat(resolution, kk) * bofk(kk) * (1 + redshift)
    zre = np.fft.irfftn(dk, s=(nmesh,) * 3,
                        axes=(0, 1, 2)) + redshift
    print(f"zreion mean = {zre.mean():g}, "
          f"range [{zre.min():g}, {zre.max():g}]")

    out = BigFile(output, create=True)
    blk = out.create_block("Zreion_Table", "f8", zre.size)
    blk.write(0, zre.ravel())
    blk.attrs["BoxSize"] = box_mpc
    blk.attrs["Redshift"] = redshift
    blk.attrs["TopHatFilterSize"] = resolution
    blk.attrs["Nmesh"] = nmesh
    blk.flush()
    # reference-format compatibility block (BoxSize/Nmesh make it
    # redundant; the reference writes it too)
    bins = np.linspace(0, box_mpc, nmesh)
    bb = out.create_block("XYZ_bins", "f8", nmesh)
    bb.write(0, bins)
    bb.flush()
    print("done. written at", output)


if __name__ == "__main__":
    ap = argparse.ArgumentParser("make_HI_reionization_table.py")
    ap.add_argument("--output", required=True)
    ap.add_argument("--genic", required=True)
    ap.add_argument("--resolution", type=float, default=1.0)
    ap.add_argument("--redshift", type=float, default=7.5)
    ns = ap.parse_args()
    generate_zreion_file(output=ns.output, paramfile=ns.genic,
                         resolution=ns.resolution,
                         redshift=ns.redshift)
