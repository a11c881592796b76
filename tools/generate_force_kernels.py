"""Generate the short-range force-kernel tables for the TreePM split.

Port of the reference's ``tools/generate-force-kernels.py`` (which
measured the PM pair force with pmesh/nbodykit): the short-range force
window must complement the *actual* discrete PM force — CIC
deconvolution and the finite-difference gradient make it differ from
the continuum erfc by a few 1e-3 in the matching region.

shenqi_tpu calibrates this window at run time against its own PM
solver (`shenqi_tpu.gravity.window.calibrated_window_table` — unit
point source deposited on the mesh, radial force read out over many
directions and sub-cell phases).  This tool exposes that calibration
as the reference tool's artifacts:

  * ``shortrange-force-kernels-<split>.txt`` — 5 columns
    ``x(mesh units)  w_pot_1d  w_force_1d  w_pot_erf  w_force_erf``
    (same header/layout as the reference's table; the *_1d columns
    are the measured complement, the *_erf columns the analytic
    Gadget-2 kernels for comparison);
  * ``shortrange-kernels.c`` — the table as a C ``const double``
    array compilable against the reference's gravity.c;
  * optional ``diagnostics-<split>.png`` — measured vs erfc kernels.

The measured potential window integrates the measured force window,
``w_pot(r) = r * \\int_r^\\inf w_force(s)/s^2 ds`` (the PM potential is
not separately read out), with the analytic erfc tail beyond the
table range — exact for the complement of any radial force field.

Usage::

    python tools/generate_force_kernels.py 1.25 [outdir] \
        [--nmesh 128] [--plot]
"""
from __future__ import annotations

import argparse
import os
import sys

# host-side calibration tool: a 128^3 PM solve is tiny — run on CPU,
# never dial an accelerator (override with SHENQI_TOOL_DEVICE=tpu).
# Env alone is not enough under the axon sitecustomize; also update
# jax.config before first device use.
os.environ["JAX_PLATFORMS"] = os.environ.get("SHENQI_TOOL_DEVICE",
                                             "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms",
                  os.environ.get("SHENQI_TOOL_DEVICE", "cpu"))


def measured_kernels(split: float, nmesh: int, nsamples_dir: int = 96):
    """Return (r_cells, w_pot_1d, w_force_1d, w_pot_erf, w_force_erf)."""
    from scipy.special import erfc
    from shenqi_tpu.gravity.window import calibrated_window_table

    dx, wf = calibrated_window_table(split, nmesh=nmesh,
                                     nsamples_dir=nsamples_dir)
    wf = np.asarray(wf, np.float64)
    r = np.arange(len(wf)) * dx

    u = r * 0.5 / split
    w_force_erf = erfc(u) + 2 * u / np.sqrt(np.pi) * np.exp(-u * u)
    w_pot_erf = erfc(u)

    # w_pot(r) = r * int_r^inf wf(s)/s^2 ds  (trapezoid on the table,
    # erfc closed form past the last entry where wf == erfc-kernel)
    s = r[1:]
    integrand = wf[1:] / s ** 2
    tail = w_pot_erf[-1] / r[-1]            # int_{rmax}^inf = erfc/r
    seg = (integrand[:-1] + integrand[1:]) * 0.5 * dx
    cum = np.concatenate([
        np.cumsum(seg[::-1])[::-1], [0.0]])  # int_{s_i}^{rmax}
    w_pot_1d = np.concatenate([[1.0], s * (cum + tail)])
    return r, w_pot_1d, wf, w_pot_erf, w_force_erf


def to_c(table: np.ndarray, name: str, header: str) -> str:
    """Render an [n, k] table as a C const double[][k] initializer."""
    rows = ",\n".join(
        "{ %s}" % ",".join("%.15e" % v for v in row) for row in table)
    return ("// # %s\nconst double %s[][%d] = {\n%s\n};\n"
            % (header, name, table.shape[1], rows))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("split", type=float,
                    help="force split scale (Asmth) in mesh cells")
    ap.add_argument("prefix", nargs="?", default=".",
                    help="output directory")
    ap.add_argument("--nmesh", type=int, default=128,
                    help="calibration mesh size per side")
    ap.add_argument("--plot", action="store_true",
                    help="also write diagnostics-<split>.png")
    ns = ap.parse_args(argv)

    r, wp1, wf1, wpe, wfe = measured_kernels(ns.split, ns.nmesh)
    table = np.array([r, wp1, wf1, wpe, wfe]).T
    header = ("x(in mesh units) w_pot_1d(x) w_force_1d(x) "
              "[erfc + other terms] w_pot_erf(x) w_force_erf(x) "
              "split=%.2f" % ns.split)

    os.makedirs(ns.prefix, exist_ok=True)
    txt = os.path.join(ns.prefix,
                       "shortrange-force-kernels-%.2f.txt" % ns.split)
    np.savetxt(txt, table, header=header)
    cpath = os.path.join(ns.prefix, "shortrange-kernels.c")
    with open(cpath, "w") as f:
        f.write(to_c(table, "shortrange_force_kernels", header))
    print(f"wrote {txt} and {cpath}")

    if ns.plot:
        from matplotlib.figure import Figure
        from matplotlib.backends.backend_agg import FigureCanvasAgg
        fig = Figure(figsize=(8, 4))
        FigureCanvasAgg(fig)
        ax = fig.add_subplot(121)
        ax.set_title("force window (split=%g)" % ns.split)
        ax.plot(r, wf1, label="measured")
        ax.plot(r, wfe, ":", label="erfc")
        ax.legend()
        ax = fig.add_subplot(122)
        ax.set_title("measured / erfc - 1")
        good = wfe > 1e-6
        ax.plot(r[good], wf1[good] / wfe[good] - 1)
        ax.set_ylim(-0.05, 0.05)
        ax.grid()
        png = os.path.join(ns.prefix,
                           "diagnostics-%.2f.png" % ns.split)
        fig.savefig(png, dpi=150)
        print(f"wrote {png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
