"""Combined TreePM gravity: PM long-range + tree short-range.

The gravpm_force + grav_short_tree pairing (libgadget/run.cpp:538-566):
total gravity = PM force (k-space Gaussian-smoothed at Asmth) + tree
force (erfc-windowed complement within Rcut).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pm import PMConfig, pm_forces
from .shortrange import ShortRangeParams, treegrav
from ..ops.tree import build_octree


class GravityConfig(NamedTuple):
    boxsize: float
    nmesh: int
    G: float
    asmth: float = 1.5
    rcut_cells: float = 6.0
    err_tol_force_acc: float = 0.002
    bh_opening_angle: float = 0.175
    use_bh: int = 0
    softening: float = 1.0     # spline softening h
    tree_nlevels: int = 8
    tree_ncrit: int = 32
    # 'exact': PM-calibrated window table; 'erfc': analytic
    window_type: str = "exact"
    # 'stencil': production engine (grid-stencil direct P3M,
    # stencil.py — exact P2P inside rcut, no octree); 'refined':
    # sub-block drop + packed source tables (shortrange_refined.py);
    # 'blocked': round-2 padded block engine; 'perparticle':
    # reference-semantics vmapped walk (CPU/tests)
    engine: str = "stencil"
    refine_sub: int = 32
    block: int = 128
    maxi: int = 1024
    maxl: int = 512

    def pm(self) -> PMConfig:
        return PMConfig(nmesh=self.nmesh, boxsize=self.boxsize, G=self.G,
                        asmth=self.asmth)

    def short(self, use_bh=None) -> ShortRangeParams:
        cellsize = self.boxsize / self.nmesh
        return ShortRangeParams(
            boxsize=self.boxsize, cellsize=cellsize,
            rcut=self.rcut_cells * cellsize, asmth=self.asmth,
            err_tol_force_acc=self.err_tol_force_acc,
            bh_opening_angle=self.bh_opening_angle,
            use_bh=self.use_bh if use_bh is None else use_bh,
            softening=self.softening, G=self.G)


def default_softening(boxsize: float, npart_total: int,
                      fraction: float = 1.0 / 30) -> float:
    """Spline softening h = 2.8 * (fraction * mean interparticle sep),
    the reference default (gravity.h:24-26, FractionalGravitySoftening)."""
    mean_sep = boxsize / np.cbrt(npart_total)
    return 2.8 * fraction * mean_sep


def get_window_tables(cfg: GravityConfig, form: str = "poly"):
    """Host-side: calibrate (or fetch cached) the short-range window.

    Must be called outside jit: the calibration itself runs PM solves.
    """
    if cfg.window_type == "exact":
        if form == "poly":
            from .window import window_polynomials
            return window_polynomials(cfg.asmth)
        from .window import window_arrays
        return window_arrays(cfg.asmth)
    return None


@partial(jax.jit, static_argnames=("cfg", "first_step"))
def _treepm_forces_impl(ipos, mass, alive, oldacc, window_tables,
                        cfg: GravityConfig, first_step: bool = False):
    accel_pm, pot_pm, ps = pm_forces(ipos, mass, cfg.pm(), mask=alive)
    tree = build_octree(ipos, mass, alive, cfg.boxsize,
                        nlevels=cfg.tree_nlevels, ncrit=cfg.tree_ncrit)
    sp = cfg.short(use_bh=1 if first_step else None)
    accel_tree, pot_tree, nint = treegrav(tree, ipos, oldacc, sp,
                                          window_tables)
    pot = pot_pm + pot_tree
    return accel_pm, accel_tree, pot, ps


def treepm_forces(ipos, mass, alive, oldacc, cfg: GravityConfig,
                  first_step: bool = False, window_tables=None):
    """Full gravity at all particle positions.

    Returns (accel_pm [N,3], accel_tree [N,3], potential [N], power).
    oldacc: |acc|/G from the previous step (relative-acc criterion);
    first_step=True forces the BH angle criterion (TreeUseBH=2 behavior,
    gadget/params.cpp:93).
    """
    if window_tables is None:
        window_tables = get_window_tables(cfg)
    return _treepm_forces_impl(ipos, mass, alive, oldacc, window_tables,
                               cfg, first_step)
