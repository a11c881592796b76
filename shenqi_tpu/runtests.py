"""Built-in force-accuracy tests: the RestartFlag-99 mode
(runtests.cpp run_gravity_test analog).

Compares, on a snapshot's particles:
  1. pairwise (direct f64) short-range force vs the FULLY OPENED tree
     (ErrTolForceAcc=0, BHOpeningAngle=0) — hard limit maxerr < 0.1;
  2. the configured-accuracy tree vs the opened tree — mean relative
     error must respect 1.2x ErrTolForceAcc;
  3. a larger Rcut (9.5 cells) — mean error must not degrade.

The pairwise reference uses the analytic erfc window, so the tree is
evaluated with window_type='erfc' here regardless of the run setting
(the exact-window variant is validated separately by the window
calibration tests).
"""

from __future__ import annotations

import numpy as np
from scipy.special import erfc

import jax.numpy as jnp


def pairwise_shortrange(pos, mass, soft, G, rcut, cellsize, asmth,
                        boxsize, targets=None, chunk=512):
    """Direct f64 short-range force (grav_short_pair analog).

    Minimum-image within rcut (requires rcut < boxsize/2), spline
    softening, erfc window.  targets: indices to evaluate (default
    all).  Returns accel [T,3].
    """
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    n = len(pos)
    if targets is None:
        targets = np.arange(n)
    out = np.zeros((len(targets), 3))
    for s in range(0, len(targets), chunk):
        tid = targets[s:s + chunk]
        d = pos[None, :, :] - pos[tid][:, None, :]      # [t, n, 3]
        d -= boxsize * np.round(d / boxsize)
        r2 = (d * d).sum(-1)
        r = np.sqrt(r2)
        with np.errstate(divide="ignore", invalid="ignore"):
            fac = np.where(r > 0, mass[None, :] / np.maximum(r, 1e-300)
                           ** 3, 0.0)
            u = r / soft
            h3 = soft ** 3
            fin = mass[None, :] / h3 * (10.666666666667
                                        + u * u * (32.0 * u - 38.4))
            us = np.maximum(u, 1e-10)
            fout = mass[None, :] / h3 * (
                21.333333333333 - 48.0 * u + 38.4 * u * u
                - 10.666666666667 * u ** 3 - 0.066666666667 / us ** 3)
            fsoft = np.where(u < 0.5, fin, fout)
            fac = np.where(r2 < soft * soft, fsoft, fac)
            w = r / cellsize * (0.5 / asmth)
            fw = erfc(w) + 2.0 * w / np.sqrt(np.pi) * np.exp(-w * w)
        fac = np.where((r2 < rcut * rcut) & (r > 0), fac * fw, 0.0)
        out[s:s + chunk] = (d * fac[..., None]).sum(axis=1) * G
    return out


def _accn_err(a, ref):
    """(mean, max) relative error and (mean, max) angle in degrees
    (runtests.cpp check_accns)."""
    na = np.linalg.norm(ref, axis=1)
    scale = np.median(na[na > 0])
    diff = np.linalg.norm(a - ref, axis=1)
    rel = diff / np.maximum(na, 0.05 * scale)
    dots = (a * ref).sum(1) / np.maximum(
        np.linalg.norm(a, axis=1) * na, 1e-300)
    ang = np.degrees(np.arccos(np.clip(dots, -1, 1)))
    ok = na > 0
    return rel[ok].mean(), rel[ok].max(), ang[ok].mean(), ang[ok].max()


def run_gravity_test(pos, mass, cp, boxsize, nmesh, asmth=1.5,
                     rcut_cells=6.0, err_tol_force_acc=0.002,
                     bh_opening_angle=0.175, n_sample=2048, seed=23):
    """RestartFlag-99 gravity accuracy test; returns a result dict and
    raises RuntimeError on hard failures (runtests.cpp:235-370)."""
    from .core.particles import float_to_ipos
    from .ops.tree import build_octree
    from .gravity.shortrange import (ShortRangeParams,
                                     treegrav_targets)
    from .gravity.treepm import default_softening

    n = len(pos)
    rng = np.random.RandomState(seed)
    targets = (np.arange(n) if n <= n_sample
               else rng.choice(n, n_sample, replace=False))
    cellsize = boxsize / nmesh
    rcut = rcut_cells * cellsize
    soft = default_softening(boxsize, n)
    G = cp.GravInternal

    ipos = jnp.asarray(float_to_ipos(np.asarray(pos), boxsize))
    massj = jnp.asarray(np.asarray(mass, np.float32))
    nlv = min(10, max(6, int(np.ceil(np.log(max(n, 8) / 16)
                                     / np.log(8))) + 3))
    tree = build_octree(ipos, massj, massj > 0, boxsize, nlevels=nlv,
                        ncrit=32)
    tpos = ipos[jnp.asarray(targets)]

    pair = pairwise_shortrange(pos, mass, soft, G, rcut, cellsize,
                               asmth, boxsize, targets=targets)

    def tree_force(errtol, bh, use_bh, rc=rcut_cells):
        sp = ShortRangeParams(
            boxsize=boxsize, cellsize=cellsize, rcut=rc * cellsize,
            asmth=asmth, use_bh=use_bh, softening=soft, G=G,
            err_tol_force_acc=errtol, bh_opening_angle=bh)
        oldacc = jnp.asarray(
            np.linalg.norm(pair, axis=1).astype(np.float32) / G)
        acc, _, _ = treegrav_targets(tree, tpos, oldacc, sp, None)
        return np.asarray(acc, np.float64)

    results = {}
    # 1. fully opened tree vs pairwise
    opened = tree_force(errtol=0.0, bh=0.0, use_bh=1)
    m, mx, ma, mxa = _accn_err(opened, pair)
    print(f"Force error, open tree vs pairwise. max: {mx:g} "
          f"mean: {m:g} angle {ma:g} max angle {mxa:g}")
    results["open_vs_pair"] = (m, mx)
    if mx > 0.1:
        raise RuntimeError(
            f"Fully open tree disagrees with pairwise: {mx} > 0.1")

    # 2. configured accuracy vs the opened tree
    acc = tree_force(errtol=err_tol_force_acc, bh=bh_opening_angle,
                     use_bh=0)
    m2, mx2, ma2, mxa2 = _accn_err(acc, opened)
    print(f"Force error, open tree vs tree. max: {mx2:g} "
          f"mean: {m2:g} forcetol: {err_tol_force_acc:g}")
    results["tree_vs_open"] = (m2, mx2)
    if m2 > 1.2 * max(err_tol_force_acc, 5e-3):
        raise RuntimeError(
            f"Average force error underestimated: {m2} > "
            f"1.2*{err_tol_force_acc}")

    # 3. larger Rcut must not be worse on the same short-range target
    pair95 = pairwise_shortrange(pos, mass, soft, G, 9.5 * cellsize,
                                 cellsize, asmth, boxsize,
                                 targets=targets)
    acc95 = tree_force(errtol=err_tol_force_acc, bh=bh_opening_angle,
                       use_bh=0, rc=9.5)
    m3, mx3, _, _ = _accn_err(acc95, pair95)
    print(f"Force error, Rcut=9.5. max: {mx3:g} mean: {m3:g}")
    results["rcut95"] = (m3, mx3)
    if m3 > 10 * max(m2, err_tol_force_acc):
        raise RuntimeError(f"Rcut=9.5 error degraded: {m3}")
    return results
