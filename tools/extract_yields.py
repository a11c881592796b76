"""Regenerate stellar yield tables in raw C-array form.

Port of the reference's ``tools/extract_yields.py``: parse the
published Karakas 2010 / Doherty 2014 AGB yield tables and the
Kobayashi 2006 SNII table, and print them as C static arrays (the
format the reference compiles into ``libgadget/metal_tables.h``).

Unlike the reference tool this one is a thin CLI over the runtime
loaders in :mod:`shenqi_tpu.physics.metal_return` — shenqi_tpu parses
the published data files directly at run time, so the C dump exists
only for users migrating back to (or cross-checking against) the
reference's compiled tables.

Usage::

    python tools/extract_yields.py [--yield-dir data_yields] \
        [--which agb|snii|both] [-o metal_tables.h]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from shenqi_tpu.physics.metal_return import (  # noqa: E402
    SPECIES, YieldTable, load_agb_yields, load_snii_yields)


def _rows(arr2d: np.ndarray, fstr: str) -> str:
    """[nmass, nmet] array -> comma-separated C rows (one mass/line)."""
    return "\n".join(
        "".join((fstr + ",") % v for v in row) for row in arr2d)


def _filter_agb(tab: YieldTable):
    """The reference's AGB table drops M >= 8 (SNII territory) and the
    Z=0.001 bin that only exists for the large-mass Doherty models."""
    mkeep = tab.masses < 8.0
    zkeep = (tab.metallicities > 0.002) | (tab.metallicities < 0.0009)
    return mkeep, zkeep


def format_for_c(name: str, tab: YieldTable, agb: bool = True) -> str:
    """Render one YieldTable as the reference's C-array block.

    Row order matches the reference: mass-major, metallicity-minor
    (reference tools/extract_yields.py format_c_array iterates masses
    outer, metallicities inner); our tables are [nmet, nmass] so each
    2-D slab is transposed before formatting.
    """
    if agb:
        mkeep, zkeep = _filter_agb(tab)
    else:
        mkeep = np.ones(len(tab.masses), bool)
        zkeep = np.ones(len(tab.metallicities), bool)
    masses = tab.masses[mkeep]
    mets = tab.metallicities[zkeep]

    def sel(a):  # [nmet, nmass] -> [nmass_kept, nmet_kept]
        return a[np.ix_(zkeep, mkeep)].T

    uname = name.upper()
    parts = [
        f"#define {uname}_NMET {len(mets)}",
        f"#define {uname}_NMASS {len(masses)}",
        "static const double %s_masses[%s_NMASS] = { %s };" % (
            name, uname, ",".join("%.2f" % m for m in masses)),
        "static const double %s_metallicities[%s_NMET] = { %s };" % (
            name, uname, ",".join("%.4f" % z for z in mets)),
        "static const double %s_total_mass[%s_NMET*%s_NMASS] = {\n%s\n};"
        % (name, uname, uname, _rows(sel(tab.ejected), "%.3f")),
        "",
        "static const double %s_total_metals[%s_NMET*%s_NMASS] = {\n%s\n};"
        % (name, uname, uname, _rows(sel(tab.total_metal), "%.3e")),
        "",
        "static const double %s_yield[NSPECIES][%s_NMET*%s_NMASS] = {\n%s\n};"
        % (name, uname, uname,
           "{" + "\n},\n{\n".join(
               _rows(sel(tab.yields[sp]), "%.6e") for sp in SPECIES)
           + "}"),
        "",
    ]
    return "\n".join(parts)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--yield-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "data_yields"),
        help="directory holding agb/ tables + snii_kabayashi_2006.txt")
    ap.add_argument("--which", choices=("agb", "snii", "both"),
                    default="both")
    ap.add_argument("-o", "--output", default=None,
                    help="output file (default: stdout)")
    ns = ap.parse_args(argv)

    blocks = [f"#define NSPECIES {len(SPECIES)}",
              "/* species order: %s */" % ", ".join(SPECIES), ""]
    if ns.which in ("agb", "both"):
        blocks.append(format_for_c(
            "agb", load_agb_yields(ns.yield_dir), agb=True))
    if ns.which in ("snii", "both"):
        blocks.append(format_for_c(
            "snii", load_snii_yields(ns.yield_dir), agb=False))
    text = "\n".join(blocks)
    if ns.output:
        with open(ns.output, "w") as f:
            f.write(text)
        print(f"wrote {ns.output} ({len(text)} bytes)")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
