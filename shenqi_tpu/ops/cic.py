"""Cloud-in-cell mass assignment and readout on a periodic mesh.

The XLA analog of the reference's pm_iterate CIC deposit/readout
(libgadget/petapm.cpp): deposit is 8 scatter-adds (one per cell corner),
readout is 8 gathers.  Positions arrive as uint32 fixed point; converting
to cell coordinates is a single multiply.

Weights are continuous across cell boundaries, so float32 cell fractions
are safe even though the fixed-point -> float conversion rounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.particles import POS_SCALE


def _cell_coords(ipos, nmesh):
    """Fixed-point positions -> (base cell index [N,3], fraction [N,3])."""
    # x in [0, nmesh): use f32; the product ipos * (nmesh / 2^32) < nmesh
    x = ipos.astype(jnp.float32) * jnp.float32(nmesh / POS_SCALE)
    i0 = jnp.floor(x)
    frac = x - i0
    i0 = i0.astype(jnp.int32)
    # guard the pathological x == nmesh rounding case
    i0 = jnp.where(i0 >= nmesh, nmesh - 1, i0)
    return i0, frac


def cic_deposit(ipos, weights, nmesh: int, mask=None) -> jax.Array:
    """Deposit `weights` (e.g. masses) onto an [nmesh]^3 mesh with CIC.

    Returns the mesh (float32).  Masked-out particles deposit nothing.
    """
    i0, f = _cell_coords(ipos, nmesh)
    w = weights.astype(jnp.float32)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    mesh = jnp.zeros((nmesh, nmesh, nmesh), jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - f[:, 0]) if dx == 0 else f[:, 0]
        ix = (i0[:, 0] + dx) % nmesh
        for dy in (0, 1):
            wy = (1.0 - f[:, 1]) if dy == 0 else f[:, 1]
            iy = (i0[:, 1] + dy) % nmesh
            for dz in (0, 1):
                wz = (1.0 - f[:, 2]) if dz == 0 else f[:, 2]
                iz = (i0[:, 2] + dz) % nmesh
                mesh = mesh.at[ix, iy, iz].add(
                    w * wx * wy * wz, mode="promise_in_bounds")
    return mesh


def cic_deposit_slab(ipos, weights, nmesh: int, nloc: int, halo: int,
                     x0, mask=None) -> jax.Array:
    """CIC deposit into an x-slab buffer of [nloc + 2*halo, N, N].

    The buffer covers global x-planes [x0 - halo, x0 + nloc + halo)
    (mod nmesh); x0 is this device's first owned plane (traced scalar).
    Particles whose base plane falls outside the buffer are dropped —
    the caller guarantees (via domain exchange) they don't exist.
    The distributed analog of the reference's region meshbuf deposit
    (libgadget/petapm.cpp:79-87): per-rank local deposit, boundary
    planes later shipped to their owners.
    """
    i0, f = _cell_coords(ipos, nmesh)
    w = weights.astype(jnp.float32)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    nbuf = nloc + 2 * halo
    relx = jnp.mod(i0[:, 0] - (x0 - halo), nmesh)
    inbuf = relx < nbuf - 1          # dx=1 must stay in the buffer
    w = jnp.where(inbuf, w, 0.0)
    relx = jnp.where(inbuf, relx, 0)
    buf = jnp.zeros((nbuf, nmesh, nmesh), jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - f[:, 0]) if dx == 0 else f[:, 0]
        ix = relx + dx
        for dy in (0, 1):
            wy = (1.0 - f[:, 1]) if dy == 0 else f[:, 1]
            iy = (i0[:, 1] + dy) % nmesh
            for dz in (0, 1):
                wz = (1.0 - f[:, 2]) if dz == 0 else f[:, 2]
                iz = (i0[:, 2] + dz) % nmesh
                buf = buf.at[ix, iy, iz].add(
                    w * wx * wy * wz, mode="promise_in_bounds")
    return buf


def cic_readout_slab(buf, ipos, nmesh: int, halo: int, x0,
                     mask=None) -> jax.Array:
    """Interpolate from an extended x-slab buffer [nloc+2*halo, N, N].

    Mirrors cic_deposit_slab's layout: plane p of the buffer is global
    plane (x0 - halo + p) mod nmesh.
    """
    nbuf = buf.shape[0]
    i0, f = _cell_coords(ipos, nmesh)
    relx = jnp.mod(i0[:, 0] - (x0 - halo), nmesh)
    inbuf = relx < nbuf - 1
    relx = jnp.where(inbuf, relx, 0)
    out = jnp.zeros(ipos.shape[0], jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - f[:, 0]) if dx == 0 else f[:, 0]
        ix = relx + dx
        for dy in (0, 1):
            wy = (1.0 - f[:, 1]) if dy == 0 else f[:, 1]
            iy = (i0[:, 1] + dy) % nmesh
            for dz in (0, 1):
                wz = (1.0 - f[:, 2]) if dz == 0 else f[:, 2]
                iz = (i0[:, 2] + dz) % nmesh
                out = out + buf[ix, iy, iz] * (wx * wy * wz)
    out = jnp.where(inbuf, out, 0.0)
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out


def cic_readout(mesh, ipos, mask=None) -> jax.Array:
    """Interpolate mesh values back to particle positions with CIC."""
    nmesh = mesh.shape[0]
    i0, f = _cell_coords(ipos, nmesh)
    out = jnp.zeros(ipos.shape[0], jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - f[:, 0]) if dx == 0 else f[:, 0]
        ix = (i0[:, 0] + dx) % nmesh
        for dy in (0, 1):
            wy = (1.0 - f[:, 1]) if dy == 0 else f[:, 1]
            iy = (i0[:, 1] + dy) % nmesh
            for dz in (0, 1):
                wz = (1.0 - f[:, 2]) if dz == 0 else f[:, 2]
                iz = (i0[:, 2] + dz) % nmesh
                out = out + mesh[ix, iy, iz] * (wx * wy * wz)
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out


def cic_deposit_brick(ipos, weights, nmesh: int, nxl: int, nyl: int,
                      halo: int, x0, y0, mask=None) -> jax.Array:
    """CIC deposit into an (x, y) brick buffer
    [nxl + 2*halo, nyl + 2*halo, N] — the 2-D procgrid analog of
    cic_deposit_slab (petapm.cpp:217-255 2-D processor grid regions).

    The buffer covers global planes [x0 - halo, x0 + nxl + halo) x
    [y0 - halo, y0 + nyl + halo) (mod nmesh); particles whose base
    cell falls outside deposit nothing (the domain/route layer
    guarantees they don't exist).
    """
    i0, f = _cell_coords(ipos, nmesh)
    w = weights.astype(jnp.float32)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    nxb = nxl + 2 * halo
    nyb = nyl + 2 * halo
    relx = jnp.mod(i0[:, 0] - (x0 - halo), nmesh)
    rely = jnp.mod(i0[:, 1] - (y0 - halo), nmesh)
    inbuf = (relx < nxb - 1) & (rely < nyb - 1)
    w = jnp.where(inbuf, w, 0.0)
    relx = jnp.where(inbuf, relx, 0)
    rely = jnp.where(inbuf, rely, 0)
    buf = jnp.zeros((nxb, nyb, nmesh), jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - f[:, 0]) if dx == 0 else f[:, 0]
        ix = relx + dx
        for dy in (0, 1):
            wy = (1.0 - f[:, 1]) if dy == 0 else f[:, 1]
            iy = rely + dy
            for dz in (0, 1):
                wz = (1.0 - f[:, 2]) if dz == 0 else f[:, 2]
                iz = (i0[:, 2] + dz) % nmesh
                buf = buf.at[ix, iy, iz].add(
                    w * wx * wy * wz, mode="promise_in_bounds")
    return buf


def cic_readout_brick(buf, ipos, nmesh: int, halo: int, x0, y0,
                      mask=None) -> jax.Array:
    """Interpolate from an extended brick buffer (cic_deposit_brick
    layout): plane (p, q) is global ((x0-halo+p) mod N,
    (y0-halo+q) mod N)."""
    nxb, nyb = buf.shape[0], buf.shape[1]
    i0, f = _cell_coords(ipos, nmesh)
    relx = jnp.mod(i0[:, 0] - (x0 - halo), nmesh)
    rely = jnp.mod(i0[:, 1] - (y0 - halo), nmesh)
    inbuf = (relx < nxb - 1) & (rely < nyb - 1)
    relx = jnp.where(inbuf, relx, 0)
    rely = jnp.where(inbuf, rely, 0)
    out = jnp.zeros(ipos.shape[0], jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - f[:, 0]) if dx == 0 else f[:, 0]
        ix = relx + dx
        for dy in (0, 1):
            wy = (1.0 - f[:, 1]) if dy == 0 else f[:, 1]
            iy = rely + dy
            for dz in (0, 1):
                wz = (1.0 - f[:, 2]) if dz == 0 else f[:, 2]
                iz = (i0[:, 2] + dz) % nmesh
                out = out + buf[ix, iy, iz] * (wx * wy * wz)
    out = jnp.where(inbuf, out, 0.0)
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out
