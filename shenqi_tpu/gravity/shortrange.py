"""Short-range (tree) gravity: vmapped sibling-order tree walk.

Physics identical to the reference short-range solver
(libgadget/gravshort2.hpp:151-360 + gravshort-tree2.cpp:35-68):
  * node discard beyond Rcut (box test on cell center, r2 test on cofm)
  * opening: relative-acceleration criterion mass*len^2 > r^4*ErrTol*aold,
    Barnes-Hut angle len^2/r^2 > theta^2, always-open when inside 0.6*len
  * monopole force with spline-softened Newtonian kernel
  * erfc short-range window: fac *= erfc(u) + 2u/sqrt(pi) exp(-u^2),
    pot *= erfc(u), u = r/(2*Asmth*cellsize); zero beyond the table range
    (r > ~15 cells, cf. gravity.h:33-61)

The walk itself is the TPU redesign: each target particle runs the same
sibling/first-child pointer chase as the reference's visit() loop, but
as a lax.while_loop vmapped over all targets; leaf particle ranges are
contiguous after the Morton sort, so P2P chunks are dynamic slices, not
gathers.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.particles import POS_SCALE
from ..ops.tree import Octree

# beyond this many mesh cells the short-range window is identically zero
# (the reference's NGRAVTAB*dx table range, shortrange-kernel.c)
TABLE_RANGE_CELLS = 511.0 * 2.935420743639786e-02


class PolyWindow(NamedTuple):
    """Chebyshev form of the short-range window (TPU production
    path; see window.window_polynomials)."""
    xmax: jax.Array     # scalar, mesh cells
    cf: jax.Array       # force-window coefficients
    cp: jax.Array       # potential-window coefficients


class ShortRangeParams(NamedTuple):
    boxsize: float
    cellsize: float        # mesh cell size (BoxSize/Nmesh)
    rcut: float            # in internal length units (TreeRcut * cellsize)
    asmth: float           # in mesh cells
    err_tol_force_acc: float = 0.002
    bh_opening_angle: float = 0.175
    use_bh: int = 0        # 1: BH angle only; 0: acceleration criterion
    softening: float = 1.0  # spline softening h (2.8 x Plummer-equivalent)
    G: float = 43007.1


def short_range_window(r, cellsize, asmth, tables=None):
    """(force_window, pot_window); zero beyond the table range.

    With `tables=("poly", xmax, cf, cp)` (window.window_polynomials)
    evaluates Chebyshev fits of the PM-calibrated window — pure FMA,
    the TPU production path (table gathers crash the axon worker).
    With `tables=(dx_cells, wf, wp)` (window.window_arrays) uses
    linear table interpolation, mirroring the reference's
    apply_short_range_window (gravity.h:44-60).  Otherwise the
    analytic erfc window.
    """
    if isinstance(tables, PolyWindow):
        xmax, cf, cp = tables
        x = r / cellsize
        t = jnp.clip(2.0 * (x / xmax) - 1.0, -1.0, 1.0)

        def clenshaw(c):
            b1 = jnp.zeros_like(t)
            b2 = jnp.zeros_like(t)
            for k in range(c.shape[0] - 1, 0, -1):
                b1, b2 = c[k] + 2 * t * b1 - b2, b1
            return c[0] + t * b1 - b2

        inrange = x < xmax
        fw = jnp.clip(clenshaw(cf), 0.0, 1.0)
        pw = jnp.clip(clenshaw(cp), 0.0, 1.0)
        return jnp.where(inrange, fw, 0.0), jnp.where(inrange, pw, 0.0)
    if tables is not None:
        dx, wf, wp = tables
        x = r / cellsize / dx
        i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, wf.shape[0] - 2)
        t = jnp.clip(x - i0, 0.0, 1.0)
        fw = wf[i0] * (1 - t) + wf[i0 + 1] * t
        pw = wp[i0] * (1 - t) + wp[i0 + 1] * t
        inrange = x < wf.shape[0] - 1
        return jnp.where(inrange, fw, 0.0), jnp.where(inrange, pw, 0.0)
    u = r / cellsize * (0.5 / asmth)
    fw = jax.lax.erfc(u) + 2.0 * u / np.sqrt(np.pi) * jnp.exp(-u * u)
    pw = jax.lax.erfc(u)
    inrange = r < TABLE_RANGE_CELLS * cellsize
    return jnp.where(inrange, fw, 0.0), jnp.where(inrange, pw, 0.0)


def spline_force(r2, mass, h):
    """Softened 1/r^3 force factor and potential (Gadget W2 spline).

    Returns (fac, facpot) with force = dx * fac, pot += facpot.
    Matches apply_accn (gravshort2.hpp:326-356).
    """
    r = jnp.sqrt(r2)
    rinv = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-35), 0.0)
    fac_newton = mass * rinv * rinv * rinv
    pot_newton = -mass * rinv

    u = r / h
    h3_inv = 1.0 / (h * h * h)
    fac_in = mass * h3_inv * (10.666666666667 + u * u * (32.0 * u - 38.4))
    wp_in = -2.8 + u * u * (5.333333333333 + u * u * (6.4 * u - 9.6))
    u_safe = jnp.maximum(u, 1e-10)
    fac_out = mass * h3_inv * (21.333333333333 - 48.0 * u + 38.4 * u * u
                               - 10.666666666667 * u ** 3
                               - 0.066666666667 / u_safe ** 3)
    wp_out = (-3.2 + 0.066666666667 / u_safe
              + u * u * (10.666666666667
                         + u * (-16.0 + u * (9.6 - 2.133333333333 * u))))
    fac_soft = jnp.where(u < 0.5, fac_in, fac_out)
    wp = jnp.where(u < 0.5, wp_in, wp_out)
    pot_soft = mass / h * wp

    soft = r2 < h * h
    return (jnp.where(soft, fac_soft, fac_newton),
            jnp.where(soft, pot_soft, pot_newton))


def _nearest(d, boxsize):
    """Minimum-image for float separations."""
    return d - boxsize * jnp.round(d / boxsize)


P2P_CHUNK = 64  # leaf particles processed per slice (contiguous)


@partial(jax.jit, static_argnames=("params",))
def treegrav_targets(tree: Octree, target_ipos, target_oldacc,
                     params: ShortRangeParams, window_tables=None):
    """Short-range force + potential at arbitrary target positions.

    Returns (accel [T,3], pot [T], ninteract [T]).  The result includes
    the self-interaction of a target that coincides with a source
    particle only through the softened kernel at r=0, where the force is
    zero (the potential keeps the self term, like the reference).
    """
    box = params.boxsize
    rcut2 = params.rcut * params.rcut

    ipos_s = tree.ipos_s
    mass_s = tree.mass_s
    n = ipos_s.shape[0]
    # pad sorted arrays so fixed-size dynamic slices never clamp away data
    ipos_pad = jnp.concatenate(
        [ipos_s, jnp.zeros((P2P_CHUNK, 3), jnp.uint32)])
    mass_pad = jnp.concatenate([mass_s, jnp.zeros(P2P_CHUNK, jnp.float32)])

    def one_target(tpos_i, oldacc):
        tpos = tpos_i.astype(jnp.float32) * jnp.float32(box / POS_SCALE)
        aold = params.err_tol_force_acc * oldacc

        def p2p_chunks(pstart, pcount, acc, pot, nint):
            """Direct sum over a leaf's contiguous particle range."""
            nchunk = (pcount + P2P_CHUNK - 1) // P2P_CHUNK

            def chunk_body(c, carry):
                acc, pot, nint = carry
                s = pstart + c * P2P_CHUNK
                pp = jax.lax.dynamic_slice(ipos_pad, (s, 0),
                                           (P2P_CHUNK, 3))
                pm = jax.lax.dynamic_slice(mass_pad, (s,), (P2P_CHUNK,))
                live = (jnp.arange(P2P_CHUNK) + c * P2P_CHUNK) < pcount
                pm = jnp.where(live, pm, 0.0)
                dx = (pp - tpos_i).astype(jnp.int32).astype(jnp.float32) \
                    * jnp.float32(box / POS_SCALE)
                r2 = jnp.sum(dx * dx, axis=-1)
                fac, facpot = spline_force(r2, pm, params.softening)
                r = jnp.sqrt(r2)
                fw, pw = short_range_window(r, params.cellsize,
                                            params.asmth, window_tables)
                acc = acc + jnp.sum(dx * (fac * fw)[:, None], axis=0)
                pot = pot + jnp.sum(facpot * pw)
                return acc, pot, nint + jnp.sum(live.astype(jnp.int32))

            return jax.lax.fori_loop(0, nchunk, chunk_body,
                                     (acc, pot, nint))

        def body(state):
            no, acc, pot, nint = state
            cen = tree.center[no]
            length = tree.length[no]
            cofm = tree.cofm[no]
            nmass = tree.mass[no]

            dxc = _nearest(cofm - tpos, box)
            r2 = jnp.sum(dxc * dxc)

            # --- discard test (rcut) ---
            eff = params.rcut + 0.5 * length
            dcen = jnp.abs(_nearest(cen - tpos, box))
            discard = (r2 > rcut2) & jnp.any(dcen > eff)

            # --- opening test ---
            open_acc = (params.use_bh == 0) & \
                (nmass * length * length > r2 * r2 * aold)
            bh2 = params.bh_opening_angle ** 2
            open_bh = length * length > r2 * bh2
            inside = jnp.all(dcen < 0.6 * length)
            open_node = open_acc | open_bh | inside

            is_leaf = tree.is_leaf[no]
            has_child = tree.child[no] >= 0

            # case 1: discard -> sibling
            # case 2: accept monopole -> sibling
            # case 3: open leaf -> P2P over range -> sibling
            # case 4: open internal -> first child
            use_mono = (~discard) & (~open_node)
            do_p2p = (~discard) & open_node & (is_leaf | ~has_child)
            descend = (~discard) & open_node & (~is_leaf) & has_child

            fac, facpot = spline_force(r2, nmass, params.softening)
            r = jnp.sqrt(r2)
            fw, pw = short_range_window(r, params.cellsize, params.asmth,
                                        window_tables)
            acc = acc + jnp.where(use_mono, 1.0, 0.0) * dxc * (fac * fw)
            pot = pot + jnp.where(use_mono, facpot * pw, 0.0)
            nint = nint + use_mono.astype(jnp.int32)

            acc, pot, nint = jax.lax.cond(
                do_p2p,
                lambda a: p2p_chunks(tree.pstart[no], tree.pcount[no],
                                     *a),
                lambda a: a,
                (acc, pot, nint))

            no_next = jnp.where(descend, tree.child[no],
                                tree.sibling[no])
            return no_next, acc, pot, nint

        def cond(state):
            return state[0] >= 0

        init = (tree.root_child, jnp.zeros(3, jnp.float32),
                jnp.float32(0.0), jnp.int32(0))
        _, acc, pot, nint = jax.lax.while_loop(cond, body, init)
        return acc * params.G, pot * params.G, nint

    return jax.vmap(one_target)(target_ipos, target_oldacc)


def treegrav(tree: Octree, ipos, oldacc, params: ShortRangeParams,
             window_tables=None):
    """Force at the (original-order) particle positions."""
    return treegrav_targets(tree, ipos, oldacc, params, window_tables)
