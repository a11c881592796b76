"""Morton (Z-order) keys from fixed-point positions.

The locality role of the reference's Peano-Hilbert keys
(libgadget/utils/peano.cpp): sorting by key makes every octree cell a
contiguous index range.  Morton is used instead of Hilbert because the
key<->cell-geometry mapping is pure bit arithmetic (cheap on the VPU);
the slightly worse locality only affects cache behavior, not
correctness of the range property.

Keys are 30 bits (10 per dimension) in uint32: depth-10 octrees address
1024^3 cells, plenty below the ncrit leaf cutoff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MORTON_BITS = 10            # bits per dimension
MAX_DEPTH = MORTON_BITS


def _expand_bits10(v):
    """Spread the low 10 bits of v so there are 2 zeros between bits."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_key(ipos) -> jax.Array:
    """30-bit Morton key from uint32 fixed-point positions [N,3].

    Takes the top 10 bits of each coordinate.  x is the most significant
    axis (matches the cell-decode below).
    """
    top = (ipos >> jnp.uint32(32 - MORTON_BITS))
    kx = _expand_bits10(top[:, 0])
    ky = _expand_bits10(top[:, 1])
    kz = _expand_bits10(top[:, 2])
    return (kx << jnp.uint32(2)) | (ky << jnp.uint32(1)) | kz


def _compact_bits10(v):
    """Inverse of _expand_bits10."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x09249249)
    v = (v | (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v | (v >> 8)) & jnp.uint32(0x030000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x3FF)
    return v


def morton_key_pair(ipos):
    """60-bit Morton key as two 30-bit words (hi, lo) [N] uint32.

    hi interleaves bits 31..22 of each coordinate (the classic 30-bit
    key), lo interleaves bits 21..12 — together 20 bits/dim, matching
    the reference's 63-bit Peano capability class
    (libgadget/utils/peano.h:7-8, 21 bits/dim) closely enough for
    depth-20 octrees (1M^3 cells).  Sort with lexsort((lo, hi)).
    """
    hi = morton_key(ipos)
    mid = (ipos >> jnp.uint32(32 - 2 * MORTON_BITS))
    kx = _expand_bits10(mid[:, 0])
    ky = _expand_bits10(mid[:, 1])
    kz = _expand_bits10(mid[:, 2])
    lo = (kx << jnp.uint32(2)) | (ky << jnp.uint32(1)) | kz
    return hi, lo


def key_pair_prefix(hi, lo, level: int):
    """(prefix_hi, prefix_lo) identifying the level-`level` cell.

    level <= 10 uses hi only (prefix_lo forced 0 so comparisons work
    uniformly); deeper levels append lo bits.
    """
    if level <= MAX_DEPTH:
        return hi >> jnp.uint32(3 * (MAX_DEPTH - level)), \
            jnp.zeros_like(lo)
    return hi, lo >> jnp.uint32(3 * (2 * MAX_DEPTH - level))


def key_pair_to_cell(hi, lo, level: int):
    """Decode a (hi, lo) pair into integer cell coords at `level`.

    Returns [N,3] int32 in [0, 2^level).
    """
    if level <= MAX_DEPTH:
        return key_to_cell(hi, level)
    chi = key_to_cell(hi, MAX_DEPTH)
    # key_to_cell shifts by (MAX_DEPTH - level) internally; feed it
    # lo as-is with the sub-level depth
    clo = key_to_cell(lo, level - MAX_DEPTH)
    return (chi << (level - MAX_DEPTH)) + clo


def key_to_cell(key, level: int):
    """Decode a Morton key prefix at `level` into integer cell coords.

    Returns [N,3] int32 cell indices in [0, 2^level).
    """
    pref = key >> jnp.uint32(3 * (MAX_DEPTH - level))
    # pref has `level` bits per dimension, interleaved
    x = _compact_bits10(pref >> jnp.uint32(2))
    y = _compact_bits10(pref >> jnp.uint32(1))
    z = _compact_bits10(pref)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
