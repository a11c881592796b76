"""2-D processor-grid pencil FFT + PM forces (petapm procgrid analog).

The 1-D slab decomposition (parallel/pfft.py) caps the device count at
the number of mesh x-planes over the halo width.  The reference builds
a 2-D processor grid for exactly this reason
(libgadget/petapm.cpp:217-255).  Here devices form a (d1, d2) Mesh
with axes (AX1, AX2); device (i1, i2) owns the real-space brick
[N/d1, N/d2, N] (x-slab i1, y-slab i2, full z).

Forward r2c, three local FFTs + two single-axis all_to_all transposes:
  1. local rfft over z                  [nx, ny, K]   (K = N/2+1,
     zero-padded to K2 = d2*ceil(K/d2) so the transpose tiles)
  2. all_to_all over AX2 (z <-> y)      [nx, N, K2/d2]
  3. local fft over y
  4. all_to_all over AX1 (y <-> x)      [N, N/d1, K2/d2]
  5. local fft over x
k-pencil layout: kx full, ky sharded over AX1, kz sharded over AX2
(padded kz lanes are exactly zero).  The inverse reverses the chain.

PM forces compose with the 1-D x-slab particle domain: device
(i1, i2) holds any 1/d2 share of x-slab i1's particles; deposit rows
route to their y-slab owner within the AX2 group with the round-trip
layout exchange (domain.route_rows), forces come back the same lanes.
Halo merges ride two ppermute rings (x then y — corner mass arrives
through the two-hop chain).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..gravity.pm import _kpos_1d

AX1 = "dpx"
AX2 = "dpy"


def make_mesh2d(d1: int, d2: int) -> Mesh:
    devs = np.asarray(jax.devices()[: d1 * d2]).reshape(d1, d2)
    return Mesh(devs, (AX1, AX2))


def _pad_k(n: int, d2: int):
    k = n // 2 + 1
    k2 = ((k + d2 - 1) // d2) * d2
    return k, k2


def pfft2d_r2c(brick, n: int, ax1: str = AX1, ax2: str = AX2):
    """[N/d1, N/d2, N] real brick -> [N, N/d1, K2/d2] k-pencil."""
    d1 = jax.lax.psum(1, ax1)
    d2 = jax.lax.psum(1, ax2)
    nxl, nyl, _ = brick.shape
    k, k2 = _pad_k(n, d2)
    zk = jnp.fft.rfft(brick, axis=2)               # [nx, ny, K]
    if k2 > k:
        zk = jnp.pad(zk, ((0, 0), (0, 0), (0, k2 - k)))
    yk = jax.lax.all_to_all(zk, ax2, split_axis=2, concat_axis=1,
                            tiled=True)            # [nx, N, K2/d2]
    yk = jnp.fft.fft(yk, axis=1)
    xk = jax.lax.all_to_all(yk, ax1, split_axis=1, concat_axis=0,
                            tiled=True)            # [N, N/d1, K2/d2]
    return jnp.fft.fft(xk, axis=0)


def pfft2d_c2r(pencil, n: int, ax1: str = AX1, ax2: str = AX2):
    """Inverse of pfft2d_r2c: k-pencil -> [N/d1, N/d2, N] real."""
    d2 = jax.lax.psum(1, ax2)
    k, k2 = _pad_k(n, d2)
    yk = jnp.fft.ifft(pencil, axis=0)              # [N, N/d1, K2/d2]
    yk = jax.lax.all_to_all(yk, ax1, split_axis=0, concat_axis=1,
                            tiled=True)            # [N/d1, N, K2/d2]
    zk = jnp.fft.ifft(yk, axis=1)
    zk = jax.lax.all_to_all(zk, ax2, split_axis=1, concat_axis=2,
                            tiled=True)            # [N/d1, N/d2, K2]
    return jnp.fft.irfft(zk[:, :, :k], n=n, axis=2)


def pencil_kvec2d(n: int, ax1: str = AX1, ax2: str = AX2):
    """(kx [N,1,1], ky [1,N/d1,1], kz [1,1,K2/d2], kz_valid) for this
    device's pencil chunk; kz_valid masks the zero-padded lanes."""
    d1 = jax.lax.psum(1, ax1)
    d2 = jax.lax.psum(1, ax2)
    i1 = jax.lax.axis_index(ax1)
    i2 = jax.lax.axis_index(ax2)
    k, k2 = _pad_k(n, d2)
    kx = _kpos_1d(n)[:, None, None]
    ky_idx = i1 * (n // d1) + jnp.arange(n // d1, dtype=jnp.float32)
    ky = jnp.where(ky_idx <= n // 2, ky_idx,
                   ky_idx - n)[None, :, None]
    kz_idx = i2 * (k2 // d2) + jnp.arange(k2 // d2)
    kz = kz_idx.astype(jnp.float32)[None, None, :]
    kz_valid = (kz_idx < k)[None, None, :]
    return kx, ky, kz, kz_valid


def measure_power_pencil2d(rho_k, cfg, ax1: str = AX1,
                           ax2: str = AX2):
    """Distributed P(k) on the 2-D pencil layout (same binning math
    as pfft.measure_power_pencil / gravpm.cpp:326)."""
    from ..gravity.pm import PowerSpectrum

    n = cfg.nmesh
    nbins = cfg.nbins_power or n
    kx, ky, kz, kz_valid = pencil_kvec2d(n, ax1, ax2)
    k2 = kx * kx + ky * ky + kz * kz

    def sinc(x):
        return jnp.where(jnp.abs(x) > 1e-6, jnp.sin(x)
                         / jnp.where(jnp.abs(x) > 1e-6, x, 1.0), 1.0)

    w_arg = (2 * np.pi / (2 * n))
    invwindow = 1.0 / jnp.maximum(
        (sinc(kx * w_arg) * sinc(ky * w_arg)
         * sinc(kz * w_arg)) ** 2, 1e-12)
    m = rho_k.real ** 2 + rho_k.imag ** 2
    w = jnp.where((kz == 0) | (kz == n // 2), 1.0, 2.0)
    w = jnp.where(kz_valid, w, 0.0)
    w = jnp.broadcast_to(w, m.shape)
    keff = jnp.sqrt(k2)
    binsperunit = (nbins - 1) / np.log(np.sqrt(3.) * n / 2.)
    kint = jnp.floor(binsperunit * 0.5 * jnp.log(
        jnp.where(k2 > 0, k2, 1.0))).astype(jnp.int32)
    kint = jnp.where((k2 > 0) & kz_valid, kint, nbins)
    kint = jnp.clip(kint, 0, nbins)
    flat = jnp.broadcast_to(kint, m.shape).ravel()
    power = jax.ops.segment_sum(
        (w * m * invwindow * invwindow).ravel(), flat,
        num_segments=nbins + 1)[:nbins]
    nmodes = jax.ops.segment_sum(w.ravel(), flat,
                                 num_segments=nbins + 1)[:nbins]
    ksum = jax.ops.segment_sum((w * keff).ravel(), flat,
                               num_segments=nbins + 1)[:nbins]
    norm = jnp.sum(jnp.where((k2 == 0) & kz_valid, m, 0.0))
    for ax in (ax1, ax2):
        power = jax.lax.psum(power, ax)
        nmodes = jax.lax.psum(nmodes, ax)
        ksum = jax.lax.psum(ksum, ax)
        norm = jax.lax.psum(norm, ax)
    kmean = jnp.where(nmodes > 0, ksum / jnp.maximum(nmodes, 1), 0.0)
    return PowerSpectrum(k=kmean, power=power, nmodes=nmodes,
                         norm=norm)


def _ring_merge(buf, nloc: int, halo: int, axis_name: str, ndev: int):
    """Fold the two halo shells of `buf` (leading axis) into the ring
    neighbors' interiors; returns the [nloc, ...] interior."""
    if ndev > 1:
        to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
        to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
        from_right = jax.lax.ppermute(buf[:halo], axis_name, to_left)
        from_left = jax.lax.ppermute(buf[nloc + halo:], axis_name,
                                     to_right)
        core = buf[halo: halo + nloc]
        core = core.at[:halo].add(from_left)
        core = core.at[nloc - halo:].add(from_right)
    else:
        core = buf[halo: halo + nloc]
        core = core.at[:halo].add(buf[nloc + halo:])
        core = core.at[nloc - halo:].add(buf[:halo])
    return core


def _ring_extend(core, nloc: int, halo: int, axis_name: str,
                 ndev: int):
    """Borrow `halo` shells from the ring neighbors along the leading
    axis: [nloc, ...] -> [nloc + 2*halo, ...]."""
    if ndev > 1:
        to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
        to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
        lo_ext = jax.lax.ppermute(core[nloc - halo:], axis_name,
                                  to_right)
        hi_ext = jax.lax.ppermute(core[:halo], axis_name, to_left)
    else:
        lo_ext = core[nloc - halo:]
        hi_ext = core[:halo]
    return jnp.concatenate([lo_ext, core, hi_ext])


def pm_forces_brick(ipos_local, mass_local, cfg, d1: int, d2: int,
                    halo: int = 2, mask=None, want_power: bool = False,
                    route_kcap: int = 0, ax1: str = AX1,
                    ax2: str = AX2):
    """PM forces on the (d1, d2) procgrid: per-device memory
    O(N^3 / (d1 d2)) mesh + O(N/d1/d2) particles.

    Particle domain: x-slabs over AX1 (device (i1, *) holds only
    x-slab i1 rows, split anyhow over AX2).  Deposit rows route to
    their y-slab owner inside the AX2 group (route_rows), brick
    deposit + two-ring halo merge, pencil FFT, transfer, per-axis
    inverse + two-ring halo borrow, brick readout, route back.

    Returns (accel, ps, route_lost).
    """
    from ..ops.cic import cic_deposit_brick, cic_readout_brick
    from .domain import route_rows, route_back

    n = cfg.nmesh
    if n % d1 or n % d2:
        raise ValueError(f"nmesh {n} not divisible by ({d1},{d2})")
    nxl, nyl = n // d1, n // d2
    if halo > min(nxl, nyl):
        raise ValueError(f"halo {halo} > brick ({nxl},{nyl})")
    i1 = jax.lax.axis_index(ax1)
    i2 = jax.lax.axis_index(ax2)
    x0 = (i1 * nxl).astype(jnp.int32)
    y0 = (i2 * nyl).astype(jnp.int32)

    alive = mask if mask is not None else (mass_local > 0)
    route_state = None
    lost = jnp.zeros((), jnp.int32)
    ipos_dep, mass_dep, dep_mask = ipos_local, mass_local, alive
    if d2 > 1:
        l2 = int(np.log2(d2))
        if 2 ** l2 != d2:
            raise ValueError(f"d2 {d2} must be a power of two")
        ydest = (ipos_local[:, 1] >> jnp.uint32(32 - l2)
                 ).astype(jnp.int32)
        stay = alive & (ydest == i2)
        kcap = route_kcap or ipos_local.shape[0]
        recv, rvalid, route_state, lost = route_rows(
            {"ipos": ipos_local, "mass": mass_local}, ydest, alive,
            d2, kcap, ax2)
        ipos_dep = jnp.concatenate([ipos_local, recv["ipos"]])
        mass_dep = jnp.concatenate([mass_local, recv["mass"]])
        dep_mask = jnp.concatenate([stay, rvalid])

    buf = cic_deposit_brick(ipos_dep, mass_dep, n, nxl, nyl, halo,
                            x0, y0, mask=dep_mask)
    # merge x halos first (full y-buffer columns ride along, so
    # corner mass reaches the diagonal owner via the second ring)
    buf = _ring_merge(buf, nxl, halo, ax1, d1)
    buf = jnp.moveaxis(
        _ring_merge(jnp.moveaxis(buf, 1, 0), nyl, halo, ax2, d2),
        0, 1)                                       # [nxl, nyl, N]

    rho_k = pfft2d_r2c(buf, n, ax1, ax2)
    ps = measure_power_pencil2d(rho_k, cfg, ax1, ax2) if want_power \
        else None

    kx, ky, kz, kz_valid = pencil_kvec2d(n, ax1, ax2)
    k2 = kx * kx + ky * ky + kz * kz

    def sinc(x):
        return jnp.where(jnp.abs(x) > 1e-6, jnp.sin(x)
                         / jnp.where(jnp.abs(x) > 1e-6, x, 1.0), 1.0)

    w = (2 * np.pi / (2 * n))
    invwindow = 1.0 / jnp.maximum(
        (sinc(kx * w) * sinc(ky * w) * sinc(kz * w)) ** 2, 1e-12)
    asmth2 = (2 * np.pi * cfg.asmth / n) ** 2
    pot_factor = -cfg.G / (np.pi * cfg.boxsize)
    fac = (pot_factor * n ** 3) * jnp.exp(-k2 * asmth2) \
        / jnp.where(k2 > 0, k2, 1.0) * invwindow * invwindow
    fac = jnp.where((k2 > 0) & kz_valid, fac, 0.0)
    pot_k = rho_k * fac

    def diff_kernel(wv):
        return (8.0 * jnp.sin(wv) - jnp.sin(2.0 * wv)) / 6.0

    accel = []
    for kj in (kx, ky, kz):
        ffac = -diff_kernel(kj * (2 * np.pi / n)) * (n / cfg.boxsize)
        fbrick = pfft2d_c2r((1j * ffac) * pot_k, n, ax1, ax2)
        # borrow halos: y first, then x (so the x-shipped strips
        # already carry the y extensions -> corners covered)
        ext = jnp.moveaxis(
            _ring_extend(jnp.moveaxis(fbrick, 1, 0), nyl, halo, ax2,
                         d2), 0, 1)
        ext = _ring_extend(ext, nxl, halo, ax1, d1)
        accel.append(cic_readout_brick(ext, ipos_dep, n, halo, x0,
                                       y0, mask=dep_mask))
    accel = jnp.stack(accel, axis=-1)
    if route_state is not None:
        C = ipos_local.shape[0]
        acc_back = route_back(accel[C:], route_state, ax2)
        accel = jnp.where(stay[:, None], accel[:C], acc_back)
    return accel, ps, lost


# ---------------- procgrid on the FLAT domain axis ----------------
# The product slab loop runs every stage over ONE named device axis
# ("dp", x-slab domains over all D devices).  The reference keeps the
# same separation: domains are a 1-D Peano order while the PM mesh is
# a (d1, d2) processor grid, with a layout exchange between them
# (petapm.cpp:217-255 + the region exchange).  These variants run the
# 2-D pencil FFT INSIDE the flat axis via axis_index_groups (AX1 =
# fixed i2 subgroups, AX2 = fixed i1 subgroups), and route deposit
# rows from the domain layout to their (i1, i2) brick owner with ONE
# full-axis route_rows — which also makes cost-balanced domains work
# unchanged.

def _groups_ax1(d1, d2):
    return [[a * d2 + j for a in range(d1)] for j in range(d2)]


def _groups_ax2(d1, d2):
    return [[a * d2 + j for j in range(d2)] for a in range(d1)]


def _ring_pairs(d1, d2, axis: int, shift: int):
    """Global (src, dst) pairs shifting by +1 along procgrid axis."""
    pairs = []
    for a in range(d1):
        for j in range(d2):
            src = a * d2 + j
            if axis == 1:
                dst = ((a + shift) % d1) * d2 + j
            else:
                dst = a * d2 + (j + shift) % d2
            pairs.append((src, dst))
    return pairs


def _ring_merge_dp(buf, nloc, halo, axis_name, d1, d2, which):
    """_ring_merge over a procgrid sub-axis of the flat axis."""
    nd = d1 if which == 1 else d2
    if nd == 1:
        core = buf[halo: halo + nloc]
        core = core.at[:halo].add(buf[nloc + halo:])
        core = core.at[nloc - halo:].add(buf[:halo])
        return core
    to_prev = _ring_pairs(d1, d2, which, -1)
    to_next = _ring_pairs(d1, d2, which, +1)
    from_next = jax.lax.ppermute(buf[:halo], axis_name, to_prev)
    from_prev = jax.lax.ppermute(buf[nloc + halo:], axis_name,
                                 to_next)
    core = buf[halo: halo + nloc]
    core = core.at[:halo].add(from_prev)
    core = core.at[nloc - halo:].add(from_next)
    return core


def _ring_extend_dp(core, nloc, halo, axis_name, d1, d2, which):
    """_ring_extend over a procgrid sub-axis of the flat axis."""
    nd = d1 if which == 1 else d2
    if nd == 1:
        return jnp.concatenate([core[nloc - halo:], core,
                                core[:halo]])
    to_prev = _ring_pairs(d1, d2, which, -1)
    to_next = _ring_pairs(d1, d2, which, +1)
    lo = jax.lax.ppermute(core[nloc - halo:], axis_name, to_next)
    hi = jax.lax.ppermute(core[:halo], axis_name, to_prev)
    return jnp.concatenate([lo, core, hi])


def pfft2d_r2c_dp(brick, n: int, d1: int, d2: int,
                  axis_name: str = "dp"):
    """pfft2d_r2c with both transposes as grouped all_to_alls."""
    nxl, nyl, _ = brick.shape
    k, k2 = _pad_k(n, d2)
    zk = jnp.fft.rfft(brick, axis=2)
    if k2 > k:
        zk = jnp.pad(zk, ((0, 0), (0, 0), (0, k2 - k)))
    yk = jax.lax.all_to_all(zk, axis_name, split_axis=2,
                            concat_axis=1, tiled=True,
                            axis_index_groups=_groups_ax2(d1, d2))
    yk = jnp.fft.fft(yk, axis=1)
    xk = jax.lax.all_to_all(yk, axis_name, split_axis=1,
                            concat_axis=0, tiled=True,
                            axis_index_groups=_groups_ax1(d1, d2))
    return jnp.fft.fft(xk, axis=0)


def pfft2d_c2r_dp(pencil, n: int, d1: int, d2: int,
                  axis_name: str = "dp"):
    k, k2 = _pad_k(n, d2)
    yk = jnp.fft.ifft(pencil, axis=0)
    yk = jax.lax.all_to_all(yk, axis_name, split_axis=0,
                            concat_axis=1, tiled=True,
                            axis_index_groups=_groups_ax1(d1, d2))
    zk = jnp.fft.ifft(yk, axis=1)
    zk = jax.lax.all_to_all(zk, axis_name, split_axis=1,
                            concat_axis=2, tiled=True,
                            axis_index_groups=_groups_ax2(d1, d2))
    return jnp.fft.irfft(zk[:, :, :k], n=n, axis=2)


def pencil_kvec2d_dp(n: int, d1: int, d2: int,
                     axis_name: str = "dp"):
    me = jax.lax.axis_index(axis_name)
    i1 = me // d2
    i2 = me % d2
    k, k2 = _pad_k(n, d2)
    kx = _kpos_1d(n)[:, None, None]
    ky_idx = (i1 * (n // d1)
              + jnp.arange(n // d1, dtype=jnp.float32))
    ky = jnp.where(ky_idx <= n // 2, ky_idx,
                   ky_idx - n)[None, :, None]
    kz_idx = i2 * (k2 // d2) + jnp.arange(k2 // d2)
    kz = kz_idx.astype(jnp.float32)[None, None, :]
    kz_valid = (kz_idx < k)[None, None, :]
    return kx, ky, kz, kz_valid


def measure_power_pencil2d_dp(rho_k, cfg, d1: int, d2: int,
                              axis_name: str = "dp"):
    """measure_power_pencil2d with flat-axis reductions."""
    from ..gravity.pm import PowerSpectrum

    n = cfg.nmesh
    nbins = cfg.nbins_power or n
    kx, ky, kz, kz_valid = pencil_kvec2d_dp(n, d1, d2, axis_name)
    k2 = kx * kx + ky * ky + kz * kz

    def sinc(x):
        return jnp.where(jnp.abs(x) > 1e-6, jnp.sin(x)
                         / jnp.where(jnp.abs(x) > 1e-6, x, 1.0), 1.0)

    w_arg = (2 * np.pi / (2 * n))
    invwindow = 1.0 / jnp.maximum(
        (sinc(kx * w_arg) * sinc(ky * w_arg)
         * sinc(kz * w_arg)) ** 2, 1e-12)
    m = rho_k.real ** 2 + rho_k.imag ** 2
    w = jnp.where((kz == 0) | (kz == n // 2), 1.0, 2.0)
    w = jnp.where(kz_valid, w, 0.0)
    w = jnp.broadcast_to(w, m.shape)
    keff = jnp.sqrt(k2)
    binsperunit = (nbins - 1) / np.log(np.sqrt(3.) * n / 2.)
    kint = jnp.floor(binsperunit * 0.5 * jnp.log(
        jnp.where(k2 > 0, k2, 1.0))).astype(jnp.int32)
    kint = jnp.where((k2 > 0) & kz_valid, kint, nbins)
    kint = jnp.clip(kint, 0, nbins)
    flat = jnp.broadcast_to(kint, m.shape).ravel()
    power = jax.ops.segment_sum(
        (w * m * invwindow * invwindow).ravel(), flat,
        num_segments=nbins + 1)[:nbins]
    nmodes = jax.ops.segment_sum(w.ravel(), flat,
                                 num_segments=nbins + 1)[:nbins]
    ksum = jax.ops.segment_sum((w * keff).ravel(), flat,
                               num_segments=nbins + 1)[:nbins]
    norm = jnp.sum(jnp.where((k2 == 0) & kz_valid, m, 0.0))
    power = jax.lax.psum(power, axis_name)
    nmodes = jax.lax.psum(nmodes, axis_name)
    ksum = jax.lax.psum(ksum, axis_name)
    norm = jax.lax.psum(norm, axis_name)
    kmean = jnp.where(nmodes > 0, ksum / jnp.maximum(nmodes, 1), 0.0)
    return PowerSpectrum(k=kmean, power=power, nmodes=nmodes,
                         norm=norm)


def pm_forces_brick_dp(ipos_local, mass_local, cfg, d1: int, d2: int,
                       halo: int = 2, mask=None,
                       want_power: bool = False,
                       route_kcap: int = 0, axis_name: str = "dp",
                       nu_k=None, nu_fac=None):
    """PM forces on the (d1, d2) procgrid from the product's flat
    1-D domain axis: ONE full-axis route_rows ships every row to its
    (x-brick, y-brick) owner (so cost-balanced domains need no
    special casing), then brick deposit + two-ring halo merges +
    grouped pencil FFT + transfer + per-axis inverse + brick readout,
    and the forces route back to the senders.

    Returns (accel, ps, route_lost)."""
    from ..ops.cic import cic_deposit_brick, cic_readout_brick
    from .domain import route_rows, route_back

    n = cfg.nmesh
    if n % d1 or n % d2:
        raise ValueError(f"nmesh {n} not divisible by ({d1},{d2})")
    l1, l2 = int(np.log2(d1)), int(np.log2(d2))
    if 2 ** l1 != d1 or 2 ** l2 != d2:
        raise ValueError(f"procgrid ({d1},{d2}) must be powers of 2")
    nxl, nyl = n // d1, n // d2
    if halo > min(nxl, nyl):
        raise ValueError(f"halo {halo} > brick ({nxl},{nyl})")
    ndev = d1 * d2
    me = jax.lax.axis_index(axis_name)
    i1 = me // d2
    i2 = me % d2
    x0 = (i1 * nxl).astype(jnp.int32)
    y0 = (i2 * nyl).astype(jnp.int32)

    alive = mask if mask is not None else (mass_local > 0)
    xdest = ((ipos_local[:, 0] >> jnp.uint32(32 - l1))
             if l1 else jnp.zeros(ipos_local.shape[0], jnp.uint32))
    ydest = ((ipos_local[:, 1] >> jnp.uint32(32 - l2))
             if l2 else jnp.zeros(ipos_local.shape[0], jnp.uint32))
    dest = (xdest * d2 + ydest).astype(jnp.int32)
    stay = alive & (dest == me)
    kcap = route_kcap or ipos_local.shape[0]
    recv, rvalid, route_state, lost = route_rows(
        {"ipos": ipos_local, "mass": mass_local}, dest, alive,
        ndev, kcap, axis_name)
    ipos_dep = jnp.concatenate([ipos_local, recv["ipos"]])
    mass_dep = jnp.concatenate([mass_local, recv["mass"]])
    dep_mask = jnp.concatenate([stay, rvalid])

    buf = cic_deposit_brick(ipos_dep, mass_dep, n, nxl, nyl, halo,
                            x0, y0, mask=dep_mask)
    buf = _ring_merge_dp(buf, nxl, halo, axis_name, d1, d2, 1)
    buf = jnp.moveaxis(
        _ring_merge_dp(jnp.moveaxis(buf, 1, 0), nyl, halo,
                       axis_name, d1, d2, 2), 0, 1)

    rho_k = pfft2d_r2c_dp(buf, n, d1, d2, axis_name)
    kx, ky, kz, kz_valid = pencil_kvec2d_dp(n, d1, d2, axis_name)
    if nu_fac is not None:
        kmag = jnp.sqrt(kx * kx + ky * ky + kz * kz) \
            * jnp.float32(2 * np.pi / cfg.boxsize)
        rho_k = rho_k * jnp.interp(kmag, nu_k, nu_fac)
    ps = measure_power_pencil2d_dp(rho_k, cfg, d1, d2, axis_name) \
        if want_power else None

    k2 = kx * kx + ky * ky + kz * kz

    def sinc(x):
        return jnp.where(jnp.abs(x) > 1e-6, jnp.sin(x)
                         / jnp.where(jnp.abs(x) > 1e-6, x, 1.0), 1.0)

    w_arg = (2 * np.pi / (2 * n))
    invwindow = 1.0 / jnp.maximum(
        (sinc(kx * w_arg) * sinc(ky * w_arg)
         * sinc(kz * w_arg)) ** 2, 1e-12)
    asmth2 = (2 * np.pi * cfg.asmth / n) ** 2
    pot_factor = -cfg.G / (np.pi * cfg.boxsize)
    fac = (pot_factor * n ** 3) * jnp.exp(-k2 * asmth2) \
        / jnp.where(k2 > 0, k2, 1.0) * invwindow * invwindow
    fac = jnp.where((k2 > 0) & kz_valid, fac, 0.0)
    pot_k = rho_k * fac

    def diff_kernel(wv):
        return (8.0 * jnp.sin(wv) - jnp.sin(2.0 * wv)) / 6.0

    accel = []
    for kj in (kx, ky, kz):
        ffac = -diff_kernel(kj * (2 * np.pi / n)) * (n / cfg.boxsize)
        fbrick = pfft2d_c2r_dp((1j * ffac) * pot_k, n, d1, d2,
                               axis_name)
        ext = jnp.moveaxis(
            _ring_extend_dp(jnp.moveaxis(fbrick, 1, 0), nyl, halo,
                            axis_name, d1, d2, 2), 0, 1)
        ext = _ring_extend_dp(ext, nxl, halo, axis_name, d1, d2, 1)
        accel.append(cic_readout_brick(ext, ipos_dep, n, halo, x0,
                                       y0, mask=dep_mask))
    accel = jnp.stack(accel, axis=-1)
    C = ipos_local.shape[0]
    acc_back = route_back(accel[C:], route_state, axis_name)
    accel = jnp.where(stay[:, None], accel[:C], acc_back)
    return accel, ps, lost
