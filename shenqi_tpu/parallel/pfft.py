"""Distributed pencil FFT over a 1-D device mesh (heFFTe analog).

The reference distributes its PM FFT with heFFTe pencil decomposition
over MPI (libgadget/petapm.cpp uses depends/heffte).  On TPU the same
dataflow is a shard_map program over ICI:

  forward (r2c), input x-slabs [N/D, N, N] real per device:
    1. local 2-D rfft over the (y, z) axes        -> [N/D, N, K]
    2. all_to_all transpose x <-> y               -> [N,  N/D, K]
    3. local 1-D fft along x (now fully resident) -> kx-complete pencil

  inverse (c2r) reverses the three steps.

The k-space pencil layout is [kx (full N), ky (local N/D shard),
kz (half K=N/2+1)]; `pencil_kvec` hands each device its ky range via
axis_index, so transfer functions apply locally with no communication.

All collectives are a single all_to_all per transform — the minimum
data motion for a distributed FFT — and ride the ICI mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gravity.pm import _kpos_1d


def pfft_r2c(x_slab, axis_name: str = "dp"):
    """Forward distributed real FFT.

    x_slab: [N/D, N, N] real, this device's x-slab (axis 0 sharded).
    Returns the k-pencil [N, N/D, K] complex (axis 1 = local ky).
    """
    nd = jax.lax.psum(1, axis_name)
    nloc, n, _ = x_slab.shape
    # 1. local 2-D r2c over (y, z)
    yk = jnp.fft.rfftn(x_slab, axes=(1, 2))        # [N/D, N, K]
    k = yk.shape[-1]
    # 2. transpose x <-> y: split the full y axis into D chunks and
    #    exchange so each device ends up with all x for its y chunk
    yk = yk.reshape(nloc, nd, n // nd, k)
    xk = jax.lax.all_to_all(yk, axis_name, split_axis=1,
                            concat_axis=0, tiled=False)
    # [D, N/D, N/D, K] -> [N, N/D, K]
    xk = xk.reshape(n, n // nd, k)
    # 3. 1-D fft along the now-complete x axis
    return jnp.fft.fft(xk, axis=0)


def pfft_c2r(pencil, n: int, axis_name: str = "dp"):
    """Inverse of pfft_r2c: k-pencil [N, N/D, K] -> x-slab [N/D, N, N]."""
    nd = jax.lax.psum(1, axis_name)
    k = pencil.shape[-1]
    xk = jnp.fft.ifft(pencil, axis=0)              # [N, N/D, K]
    xk = xk.reshape(nd, n // nd, n // nd, k)
    yk = jax.lax.all_to_all(xk, axis_name, split_axis=0,
                            concat_axis=1, tiled=False)
    # [N/D, D, N/D, K] -> [N/D, N, K]
    yk = yk.reshape(n // nd, n, k)
    return jnp.fft.irfftn(yk, s=(n, n), axes=(1, 2))


def pencil_kvec(n: int, axis_name: str = "dp"):
    """Integer wavenumber arrays matching the pencil layout.

    Returns (kx [N,1,1], ky [1,N/D,1], kz [1,1,K]) for this device.
    """
    nd = jax.lax.psum(1, axis_name)
    di = jax.lax.axis_index(axis_name)
    nloc = n // nd
    kx = _kpos_1d(n)[:, None, None]
    ky_idx = di * nloc + jnp.arange(nloc, dtype=jnp.float32)
    ky = jnp.where(ky_idx <= n // 2, ky_idx, ky_idx - n)[None, :, None]
    kz = _kpos_1d(n, half=True)[None, None, :]
    return kx, ky, kz


def _pm_transfer_chain(rho_k, cfg, axis_name: str = "dp"):
    """k-space Green's function on the pencil layout.

    Returns (pot_k pencil, (kx, ky, kz)).  Same math as
    gravity.pm.pm_forces (gravpm.cpp:379 potential transfer): CIC
    deconvolution squared, exp(-k^2 asmth^2)/k^2, G normalization.
    """
    n = cfg.nmesh
    kx, ky, kz = pencil_kvec(n, axis_name)
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
    fac = jnp.where(k2 > 0, fac, 0.0)
    return rho_k * fac, (kx, ky, kz)


def measure_power_pencil(rho_k, cfg, axis_name: str = "dp"):
    """Distributed P(k) accumulation on the k-pencil layout.

    Same binning math as gravity.pm.measure_power
    (powerspectrum_add_mode, libgadget/gravpm.cpp:326): log-k2 bins,
    hermitian weight 2 off the kz=0 / kz=N/2 planes, CIC window
    deconvolution squared.  Each device bins its local ky chunk; one
    psum per array yields the global sums on every device.

    Returns a PowerSpectrum namedtuple (replicated scalars/arrays).
    """
    from ..gravity.pm import PowerSpectrum

    n = cfg.nmesh
    nbins = cfg.nbins_power or n
    kx, ky, kz = pencil_kvec(n, axis_name)
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
    w = jnp.broadcast_to(w, m.shape)
    keff = jnp.sqrt(k2)
    binsperunit = (nbins - 1) / np.log(np.sqrt(3.) * n / 2.)
    kint = jnp.floor(binsperunit * 0.5 * jnp.log(
        jnp.where(k2 > 0, k2, 1.0))).astype(jnp.int32)
    kint = jnp.where(k2 > 0, kint, nbins)
    kint = jnp.clip(kint, 0, nbins)

    flat = kint.ravel()
    power = jax.ops.segment_sum(
        (w * m * invwindow * invwindow).ravel(), flat,
        num_segments=nbins + 1)[:nbins]
    nmodes = jax.ops.segment_sum(w.ravel(), flat,
                                 num_segments=nbins + 1)[:nbins]
    ksum = jax.ops.segment_sum((w * keff).ravel(), flat,
                               num_segments=nbins + 1)[:nbins]
    norm = jnp.sum(jnp.where(k2 == 0, m, 0.0))
    power = jax.lax.psum(power, axis_name)
    nmodes = jax.lax.psum(nmodes, axis_name)
    ksum = jax.lax.psum(ksum, axis_name)
    norm = jax.lax.psum(norm, axis_name)
    kmean = jnp.where(nmodes > 0, ksum / jnp.maximum(nmodes, 1), 0.0)
    return PowerSpectrum(k=kmean, power=power, nmodes=nmodes,
                         norm=norm)


def _deposit_slab_routed(ipos_local, mass_local, cfg, ndev: int,
                         axis_name: str, halo: int, mask,
                         cuts_in, route_kcap: int):
    """Shared CIC deposit onto the uniform FFT slab (+ ring halo
    reduction), with the cost-balanced-domain row routing.  Returns
    (slab, ipos_dep, dep_mask, stay, route_state, pm_lost): the
    deposit context pm_forces_slab's readout needs to route forces
    back to the particle domain."""
    from ..ops.cic import cic_deposit_slab
    from .domain import route_rows

    n = cfg.nmesh
    if n % ndev:
        raise ValueError(f"nmesh {n} not divisible by ndev {ndev}")
    nloc = n // ndev
    if halo > nloc:
        raise ValueError(f"halo {halo} > slab {nloc}")
    me = jax.lax.axis_index(axis_name)
    x0 = (me * nloc).astype(jnp.int32)

    pm_lost = jnp.zeros((), jnp.int32)
    route_state = None
    stay = None
    ipos_dep, mass_dep, dep_mask = ipos_local, mass_local, mask
    if cuts_in is not None and ndev > 1:
        l = int(np.log2(ndev))
        alive = mask if mask is not None else (mass_local > 0)
        udest = (ipos_local[:, 0] >> jnp.uint32(32 - l)
                 ).astype(jnp.int32)
        stay = alive & (udest == me)
        kcap = route_kcap or ipos_local.shape[0]
        recv, rvalid, route_state, pm_lost = route_rows(
            {"ipos": ipos_local, "mass": mass_local}, udest, alive,
            ndev, kcap, axis_name)
        ipos_dep = jnp.concatenate([ipos_local, recv["ipos"]])
        mass_dep = jnp.concatenate([mass_local, recv["mass"]])
        dep_mask = jnp.concatenate([stay, rvalid])

    buf = cic_deposit_slab(ipos_dep, mass_dep, n, nloc, halo, x0,
                           mask=dep_mask)
    to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
    if ndev > 1:
        # my planes below x0 belong to the left neighbor's interior
        from_right = jax.lax.ppermute(buf[:halo], axis_name, to_left)
        from_left = jax.lax.ppermute(buf[nloc + halo:], axis_name,
                                     to_right)
        slab = buf[halo: halo + nloc]
        slab = slab.at[:halo].add(from_left)
        slab = slab.at[nloc - halo:].add(from_right)
    else:
        slab = buf[halo: halo + nloc]
        slab = slab.at[:halo].add(buf[nloc + halo:])
        slab = slab.at[nloc - halo:].add(buf[:halo])
    return slab, ipos_dep, dep_mask, stay, route_state, pm_lost


def measure_cdm_power_slab(ipos_local, mass_local, cfg, ndev: int,
                           axis_name: str = "dp", halo: int = 2,
                           mask=None, cuts_in=None,
                           route_kcap: int = 0):
    """Distributed deposit + one FFT + P(k) binning only: the CDM
    (particle) power sourcing the neutrino linear response
    (measure_power_spectrum, gravpm.cpp:360 — taken BEFORE the nu
    factor multiplies the modes).  The slab analog of
    gravity.pm.measure_cdm_power.  Returns (PowerSpectrum, pm_lost)
    with both replicated across devices."""
    slab, _, _, _, _, pm_lost = _deposit_slab_routed(
        ipos_local, mass_local, cfg, ndev, axis_name, halo, mask,
        cuts_in, route_kcap)
    rho_k = pfft_r2c(slab, axis_name)
    return measure_power_pencil(rho_k, cfg, axis_name), pm_lost


def pm_depose_slab(ipos_local, mass_local, cfg, ndev: int,
                   axis_name: str = "dp", halo: int = 2,
                   mask=None, cuts_in=None, route_kcap: int = 0):
    """Deposit half of the PM solve: exchange-routed CIC deposit +
    one r2c + the PRE-nu-factor CDM P(k) (measure_power_spectrum,
    gravpm.cpp:360).  Returns the density modes AND the deposit
    context so `pm_forces_from_rhok` can finish the solve later in
    the step WITHOUT a second deposit/FFT — the reference does P(k)
    measurement and force transfer on one deposit inside one solve;
    splitting here lets the host update the neutrino linear-response
    tables between the two halves (advisor r3 #1: a distributed
    massive-nu run used to pay exchange + deposit + FFT twice per PM
    step).

    Returns (rho_k, ps, ctx) with
    ctx = (ipos_dep, dep_mask, stay, perm, flat, pm_lost)."""
    slab, ipos_dep, dep_mask, stay, route_state, pm_lost = \
        _deposit_slab_routed(ipos_local, mass_local, cfg, ndev,
                             axis_name, halo, mask, cuts_in,
                             route_kcap)
    rho_k = pfft_r2c(slab, axis_name)
    ps = measure_power_pencil(rho_k, cfg, axis_name)
    C = ipos_local.shape[0]
    if route_state is None:
        # uniform slabs: no routing; synthesize an identity context
        perm = jnp.arange(C, dtype=jnp.int32)
        flat = jnp.zeros((C,), jnp.int32)
        stay = jnp.ones((C,), bool)
    else:
        perm, flat, _kcap = route_state
    return rho_k, ps, (ipos_dep, dep_mask, stay, perm, flat,
                       pm_lost)


def pm_forces_from_rhok(rho_k, ipos_dep, dep_mask, stay, perm, flat,
                        cfg, ndev: int, C: int, route_kcap: int,
                        axis_name: str = "dp", halo: int = 2,
                        nu_k=None, nu_fac=None,
                        want_power: bool = False, routed=True):
    """Force half of the PM solve on an already-deposited rho_k
    (pm_depose_slab): optional neutrino response factor, POST-factor
    P(k), Green's function + gradient, readout at the deposited
    positions, and the route-back to the senders' row order."""
    from ..ops.cic import cic_readout_slab
    from .domain import route_back

    n = cfg.nmesh
    nloc = n // ndev
    me = jax.lax.axis_index(axis_name)
    x0 = (me * nloc).astype(jnp.int32)
    to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    to_right = [(i, (i + 1) % ndev) for i in range(ndev)]

    if nu_fac is not None:
        kx, ky, kz = pencil_kvec(n, axis_name)
        kmag = jnp.sqrt(kx * kx + ky * ky + kz * kz) \
            * jnp.float32(2 * np.pi / cfg.boxsize)
        fac = jnp.interp(kmag, nu_k, nu_fac)
        rho_k = rho_k * fac
    ps = measure_power_pencil(rho_k, cfg, axis_name) if want_power \
        else None
    pot_k, (kx, ky, kz) = _pm_transfer_chain(rho_k, cfg, axis_name)

    def diff_kernel(wv):
        return (8.0 * jnp.sin(wv) - jnp.sin(2.0 * wv)) / 6.0

    accel = []
    for kj in (kx, ky, kz):
        ffac = -diff_kernel(kj * (2 * np.pi / n)) * (n / cfg.boxsize)
        fslab = pfft_c2r((1j * ffac) * pot_k, n, axis_name)
        if ndev > 1:
            lo_ext = jax.lax.ppermute(fslab[nloc - halo:], axis_name,
                                      to_right)
            hi_ext = jax.lax.ppermute(fslab[:halo], axis_name,
                                      to_left)
        else:
            lo_ext = fslab[nloc - halo:]
            hi_ext = fslab[:halo]
        ext = jnp.concatenate([lo_ext, fslab, hi_ext])
        accel.append(cic_readout_slab(ext, ipos_dep, n, halo, x0,
                                      mask=dep_mask))
    accel = jnp.stack(accel, axis=-1)
    if routed:
        state = (perm, flat, route_kcap)
        acc_back = route_back(accel[C:], state, axis_name)
        accel = jnp.where(stay[:, None], accel[:C], acc_back)
    return accel, ps


def pm_forces_slab(ipos_local, mass_local, cfg, ndev: int,
                   axis_name: str = "dp", halo: int = 2,
                   mask=None, want_power: bool = False,
                   cuts_in=None, route_kcap: int = 0,
                   nu_k=None, nu_fac=None):
    """Fully distributed PM forces: per-device memory O(N^3/D).

    Requires the slab domain invariant (parallel.domain): this
    device's particles lie in x-slab `me` up to CIC fuzz.  Deposit
    goes into the local slab + `halo` boundary planes which are
    ppermute'd to the ring neighbors (the petapm.cpp:79-87 region
    exchange, reduced to a ring because domains ARE mesh slabs);
    readout borrows `halo` planes back.  No full-mesh psum, no force
    all_gather (replaces the round-1 pfft.py:104,137 hotspots).

    Cost-balanced domains (cuts_in given): particles live in
    VARIABLE x-slabs, so deposit rows are first routed to their
    uniform FFT-slab owner with the round-trip layout exchange
    (domain.route_rows — the full petapm region-exchange analog,
    particle domain <-> FFT pencil domain) and the readout forces
    travel back the same lanes.  route_kcap bounds routed rows per
    device pair; overflow is counted in the returned pm_lost (the
    caller regrows), never silently dropped.

    nu_k/nu_fac (both [NK] f32, replicated): massive-neutrino linear
    response — multiply the density modes by interp(|k|, nu_k,
    nu_fac) = 1 + f_nu delta_nu/delta_cdm BEFORE the P(k) measurement
    and the potential transfer, exactly like gravity.pm.pm_forces'
    nu_factor mesh (gravpm.cpp:202-209 apply_neutrino_power).

    Returns (accel, ps, pm_lost) with ps None unless want_power.
    """
    from ..ops.cic import cic_readout_slab
    from .domain import route_back

    n = cfg.nmesh
    nloc = n // ndev
    me = jax.lax.axis_index(axis_name)
    x0 = (me * nloc).astype(jnp.int32)
    to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    to_right = [(i, (i + 1) % ndev) for i in range(ndev)]

    slab, ipos_dep, dep_mask, stay, route_state, pm_lost = \
        _deposit_slab_routed(ipos_local, mass_local, cfg, ndev,
                             axis_name, halo, mask, cuts_in,
                             route_kcap)

    rho_k = pfft_r2c(slab, axis_name)              # [N, N/D, K]
    if nu_fac is not None:
        kx, ky, kz = pencil_kvec(n, axis_name)
        kmag = jnp.sqrt(kx * kx + ky * ky + kz * kz) \
            * jnp.float32(2 * np.pi / cfg.boxsize)
        fac = jnp.interp(kmag, nu_k, nu_fac)
        rho_k = rho_k * fac
    ps = measure_power_pencil(rho_k, cfg, axis_name) if want_power \
        else None
    pot_k, (kx, ky, kz) = _pm_transfer_chain(rho_k, cfg, axis_name)

    def diff_kernel(wv):
        return (8.0 * jnp.sin(wv) - jnp.sin(2.0 * wv)) / 6.0

    accel = []
    for kj in (kx, ky, kz):
        ffac = -diff_kernel(kj * (2 * np.pi / n)) * (n / cfg.boxsize)
        fslab = pfft_c2r((1j * ffac) * pot_k, n, axis_name)
        if ndev > 1:
            lo_ext = jax.lax.ppermute(fslab[nloc - halo:], axis_name,
                                      to_right)
            hi_ext = jax.lax.ppermute(fslab[:halo], axis_name,
                                      to_left)
        else:
            lo_ext = fslab[nloc - halo:]
            hi_ext = fslab[:halo]
        ext = jnp.concatenate([lo_ext, fslab, hi_ext])
        accel.append(cic_readout_slab(ext, ipos_dep, n, halo, x0,
                                      mask=dep_mask))
    accel = jnp.stack(accel, axis=-1)
    if route_state is not None:
        C = ipos_local.shape[0]
        acc_back = route_back(accel[C:], route_state, axis_name)
        accel = jnp.where(stay[:, None], accel[:C], acc_back)
    return accel, ps, pm_lost


def pm_forces_pencil(ipos_local, mass_local, cfg, axis_name: str = "dp"):
    """Multi-chip PM forces with the pencil-distributed FFT.

    Same physics as gravity.pm.pm_forces (gravpm.cpp transfer chain:
    CIC deconvolution^2, exp(-k^2 asmth^2)/k^2 Green's function, 4-pt
    finite-difference gradient) but every FFT runs 1/D-distributed.

    Deposit is still a psum into the full mesh (each device holds the
    whole real grid); each device then takes its own x-slab into the
    pencil transform, so FFT compute and transpose bandwidth scale.
    Runs inside shard_map with particle arrays sharded over axis_name.
    """
    from ..ops.cic import cic_deposit, cic_readout
    from ..gravity.pm import _cic_invwindow, _k2_int

    n = cfg.nmesh
    nd = jax.lax.psum(1, axis_name)
    di = jax.lax.axis_index(axis_name)
    nloc = n // nd

    mesh_local = cic_deposit(ipos_local, mass_local, n)
    mesh_full = jax.lax.psum(mesh_local, axis_name)
    my_slab = jax.lax.dynamic_slice_in_dim(mesh_full, di * nloc, nloc,
                                           axis=0)

    rho_k = pfft_r2c(my_slab, axis_name)           # [N, N/D, K]

    kx, ky, kz = pencil_kvec(n, axis_name)
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
    fac = jnp.where(k2 > 0, fac, 0.0)
    pot_k = rho_k * fac

    def diff_kernel(wv):
        return (8.0 * jnp.sin(wv) - jnp.sin(2.0 * wv)) / 6.0

    accel = []
    for kj in (kx, ky, kz):
        ffac = -diff_kernel(kj * (2 * np.pi / n)) * (n / cfg.boxsize)
        fslab = pfft_c2r((1j * ffac) * pot_k, n, axis_name)
        # regain the full force grid for readout at arbitrary
        # (Morton-sharded) particle positions
        fmesh = jax.lax.all_gather(fslab, axis_name, axis=0,
                                   tiled=True)
        accel.append(cic_readout(fmesh, ipos_local))
    return jnp.stack(accel, axis=-1)
