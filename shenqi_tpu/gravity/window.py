"""Short-range force window calibrated against the PM solver.

The erfc window is only the continuum ideal: the actual PM force also
carries CIC deconvolution and finite-difference-kernel effects, so the
exact complement differs from erfc by a few 1e-3 in the matching region
— enough to break the 0.002 force-accuracy budget.  The reference ships
a pre-generated table (libgadget/shortrange-kernel.c, produced by
tools/generate-force-kernels.py, which measures the PM pair force with
pmesh).  Here the same calibration is run against *this repo's* PM
implementation: deposit a unit point mass, solve, read out the radial
force at many directions, and tabulate

    W_force(r) = 1 - F_pm(r) / F_newton(r)

direction-averaged, in units of mesh cells.  The table is cached per
(asmth, window-resolution) in-process.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .pm import PMConfig, pm_forces
from ..core.particles import float_to_ipos

NTAB = 512
RMAX_CELLS = 15.0


@lru_cache(maxsize=4)
def calibrated_window_table(asmth: float, nmesh: int = 128,
                            nsamples_dir: int = 96,
                            seed: int = 12345):
    """Measure 1 - F_pm/F_newton on a radial grid (mesh-cell units).

    Returns (dx_cells, force_window[NTAB]) with entries for
    r = i * dx_cells mesh cells; entry 0 is 1.0 (no suppression at r=0).
    """
    box = float(nmesh)  # box units = mesh cells
    G = 1.0
    cfg = PMConfig(nmesh=nmesh, boxsize=box, G=G, asmth=asmth)

    rng = np.random.RandomState(seed)
    # average over source sub-cell offsets (CIC phase) and directions.
    # The radial MEAN must be unbiased to ~1e-4: with few samples the
    # anisotropic scatter (~1e-3) aliases into a systematic force bias
    # that accumulates over hundreds of KDK steps (seen as excess
    # small-scale power in dm-small).  The reference's table used
    # 48 shifts x 48 directions on a 512^3 mesh
    # (tools/generate-force-kernels.py); 16 x 96 at 128^3 gives a
    # comparable standard error.
    nsrc = 16
    dx = RMAX_CELLS / (NTAB - 1)
    radii = np.arange(1, NTAB) * dx
    # random directions, antithetic for symmetry
    dirs = rng.normal(size=(nsamples_dir // 2, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = np.concatenate([dirs, -dirs])

    acc_radial = np.zeros((len(radii), len(dirs)))
    for s in range(nsrc):
        src = box / 2 + rng.uniform(0, 1, 3)
        targets = (src[None, None, :]
                   + radii[:, None, None] * dirs[None, :, :])
        tpos = targets.reshape(-1, 3) % box
        pos = np.concatenate([[src], tpos])
        # unit mass at src, zero-mass test particles elsewhere
        mass = np.zeros(len(pos), np.float32)
        mass[0] = 1.0
        ipos = jnp.asarray(float_to_ipos(pos, box))
        accel, _, _ = pm_forces(ipos, jnp.asarray(mass), cfg,
                                want_potential=False)
        acc = np.asarray(accel[1:], dtype=np.float64).reshape(
            len(radii), len(dirs), 3)
        acc_radial += np.einsum("rds,ds->rd", acc, -dirs) / nsrc
    # radial newton force magnitude toward the source
    f_newton = G / radii ** 2
    ratio = acc_radial.mean(axis=1) / f_newton
    window = 1.0 - ratio
    window = np.concatenate([[1.0], window])
    # clamp the tail to zero (beyond ~2 asmth*sqrt(ln big) it vanishes)
    window = np.clip(window, 0.0, None)
    # smooth the far tail where the measurement is noise-dominated:
    # blend to erfc beyond r = 8 asmth
    from scipy.special import erfc
    r = np.arange(NTAB) * dx
    u = r * 0.5 / asmth
    w_erfc = erfc(u) + 2 * u / np.sqrt(np.pi) * np.exp(-u * u)
    blend = r > 6.0 * asmth
    window[blend] = w_erfc[blend]
    return dx, window.astype(np.float32)


def window_arrays(asmth: float):
    """(dx_cells, force_window, pot_window) as jnp arrays."""
    from scipy.special import erfc
    dx, wf = calibrated_window_table(asmth)
    r = np.arange(NTAB) * dx
    u = r * 0.5 / asmth
    wp = erfc(u).astype(np.float32)
    return float(dx), jnp.asarray(wf), jnp.asarray(wp)


def window_polynomials(asmth: float, degree: int = None,
                       xmax_cells: float = None):
    """Chebyshev fits of the calibrated window (TPU-friendly form).

    Table GATHERS with large index arrays crash the axon TPU worker;
    a Chebyshev evaluated by Clenshaw recursion is pure
    fused-multiply-add, faster on the VPU.  degree=None picks the
    smallest degree whose fit residual is within 3e-4 of the degree-29
    residual floor — the polynomial then adds nothing on top of the
    calibration's own error bar.

    xmax_cells truncates the fit range (default: the full 15-cell
    table).  Pairs only reach rcut (6 cells) plus block-bbox slop;
    fitting over [0, 9] instead of [0, 15] drops the auto degree from
    ~12 to ~8 — the Clenshaw is per-pair work in the hot dense pass —
    while the cut sets the window (already erfc(3) ~ 2e-5 there) to
    zero beyond, matching the reference's hard rcut semantics
    (gravshort-tree.c RCUT).

    Returns a PolyWindow(xmax_cells, cf [deg+1], cp [deg+1]) whose
    polynomials take the scaled coordinate t = 2*(r_cells/xmax) - 1.
    """
    dx, wf, wp = window_arrays(asmth)
    wf = np.asarray(wf, np.float64)
    wp = np.asarray(wp, np.float64)
    x = np.arange(NTAB) * dx
    if xmax_cells is not None:
        keep = x <= xmax_cells
        x, wf, wp = x[keep], wf[keep], wp[keep]
    xmax = x[-1]
    t = 2.0 * (x / xmax) - 1.0
    cheb = np.polynomial.chebyshev

    def fit(w, deg):
        if deg is not None:
            return cheb.chebfit(t, w, deg)
        floor = np.abs(cheb.chebval(t, cheb.chebfit(t, w, 29))
                       - w).max()
        for d in range(8, 30, 2):
            c = cheb.chebfit(t, w, d)
            if np.abs(cheb.chebval(t, c) - w).max() < floor + 3e-4:
                return c
        return cheb.chebfit(t, w, 29)

    cf = fit(wf, degree)
    cp = fit(wp, degree)
    from .shortrange import PolyWindow
    return PolyWindow(xmax=jnp.float32(xmax),
                      cf=jnp.asarray(cf, jnp.float32),
                      cp=jnp.asarray(cp, jnp.float32))
