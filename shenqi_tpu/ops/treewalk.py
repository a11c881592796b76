"""Generic vectorized neighbor tree walk (the treewalk2 engine analog).

The reference's central abstraction (libgadget/treewalk2.h:203,
localtreewalk2.h:379-437) is a templated per-particle tree walk whose
`ngbiter` visits every neighbor within a search radius.  Here the same
protocol is a higher-order JAX function: a vmapped lax.while_loop over
the Octree's sibling/first-child order; leaf ranges are contiguous after
the Morton sort, so neighbor "iteration" is vectorized dynamic slices of
the sorted source payload, folded through a user accumulator.

No export/import machinery is needed on one chip; the multi-chip version
re-runs the same walk against ghost source slabs (exchange.py).

Usage:
    walk = NeighborWalk(accum_init=..., accumulate=fn, symmetric=False)
    out = walk.run(tree, payload_sorted, target_ipos, target_radius,
                   target_extra, boxsize)

accumulate(carry, target_extra, tpos_f, src, dist, r2, live) -> carry
  * src: pytree chunk of the sorted payload ([K] leaves)
  * dist: [K,3] minimum-image vector pointing from source to target
    (reference get_distance convention: input.Pos - other.Pos)
  * live: [K] bool — in-range validity mask (range only; the radius cut
    is the accumulator's job, matching ngbiter semantics)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .tree import Octree
from ..core.particles import POS_SCALE

CHUNK = 64


def _slice_payload(payload, start, size):
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, start, size, axis=0),
        payload)


def _pad_payload(payload, pad):
    def _pad(a):
        w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, w)
    return jax.tree_util.tree_map(_pad, payload)


def _nearest(d, boxsize):
    return d - boxsize * jnp.round(d / boxsize)


def run_walk(tree: Octree, payload, target_ipos, target_radius,
             target_extra, carry0, accumulate, boxsize: float,
             symmetric: bool = False):
    """Functional form of the neighbor walk (see module docstring).

    carry0: pytree of per-target initial accumulators, leading dim T.
    """
    payload_p = _pad_payload(payload, CHUNK)
    to_f = jnp.float32(boxsize / POS_SCALE)

    def one_target(tipos, radius, extra, carry_init):
        tpos = tipos.astype(jnp.float32) * to_f

        def leaf_chunks(pstart, pcount, carry):
            nchunk = (pcount + CHUNK - 1) // CHUNK

            def chunk_body(c, carry):
                s = pstart + c * CHUNK
                src = _slice_payload(payload_p, s, CHUNK)
                live = (jnp.arange(CHUNK) + c * CHUNK) < pcount
                dist = (tipos[None, :] - src["ipos"]).astype(
                    jnp.int32).astype(jnp.float32) * to_f
                r2 = jnp.sum(dist * dist, axis=-1)
                return accumulate(carry, extra, tpos, src, dist, r2,
                                  live)

            return jax.lax.fori_loop(0, nchunk, chunk_body, carry)

        def body(state):
            no, carry = state
            cen = tree.center[no]
            length = tree.length[no]
            dc = jnp.abs(_nearest(cen - tpos, boxsize))
            dbox = jnp.maximum(dc - 0.5 * length, 0.0)
            d2 = jnp.sum(dbox * dbox)
            r = radius
            if symmetric:
                r = jnp.maximum(radius, tree.hmax[no])
            overlap = d2 < r * r

            is_leaf = tree.child[no] < 0
            do_leaf = overlap & is_leaf
            descend = overlap & (~is_leaf)

            carry = jax.lax.cond(
                do_leaf,
                lambda c: leaf_chunks(tree.pstart[no], tree.pcount[no],
                                      c),
                lambda c: c,
                carry)
            no_next = jnp.where(descend, tree.child[no],
                                tree.sibling[no])
            return no_next, carry

        def cond(state):
            return state[0] >= 0

        _, carry = jax.lax.while_loop(cond, body,
                                      (tree.root_child, carry_init))
        return carry

    return jax.vmap(one_target)(target_ipos, target_radius,
                                target_extra, carry0)
