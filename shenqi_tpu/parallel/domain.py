"""Slab domain decomposition + particle exchange over a 1-D device mesh.

The TPU-native analog of the reference's domain layer
(libgadget/domain.cpp toptree segments, exchange.hpp batched
MPI_Alltoallv migration, treewalk2.h:307-362 export/import ghosts):

  * Space is cut into D equal x-slabs (D = power-of-two device count).
    Device d owns fixed-point positions with x >> (32-log2 D) == d.
    Slabs align with the PM mesh's x-planes, so the FFT decomposition
    and the particle decomposition coincide — no layout exchange is
    needed between deposit and transform (the role of
    petapm.cpp:79-87's pencil exchange).
  * Each device holds a FIXED-CAPACITY row block [C]; dead rows have
    mass 0.  Static shapes are what XLA needs; capacity headroom plays
    the role of the reference's PartAllocFactor (run.cpp:236).
  * `exchange` migrates rows to their owner slab with one
    all_to_all of [D, K] bucketed rows — the mpsort/alltoallv analog
    (exchange.hpp:88-152).  K bounds migrants per (src,dst) pair per
    call; overflow is counted, never silently dropped at the send
    side (unsent rows stay put and move on a later call).
  * `halo_exchange` ships boundary strips of width w to the two slab
    neighbors with a ppermute ring — the ghost/export analog.  Local
    physics (tree walk, SPH) then runs on [local + ghosts] with no
    further communication.

All functions run INSIDE shard_map over `axis_name`; arrays are the
per-device blocks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _log2(ndev: int) -> int:
    l = int(np.log2(ndev))
    if 2 ** l != ndev:
        raise ValueError(f"device count {ndev} must be a power of two")
    return l


def slab_index(ipos_x, ndev: int, cuts_in=None):
    """Owner device of fixed-point x coordinates.

    Uniform slabs (cuts_in None): exact bit shift.  Cost-balanced
    slabs: cuts_in is the sorted [ndev-1] uint32 array of interior
    slab boundaries (domain.cpp:620 domain_assign_topleaves_balanced
    analog) and ownership is a searchsorted rank.
    """
    if cuts_in is not None:
        return jnp.searchsorted(jnp.asarray(cuts_in), ipos_x,
                                side="right").astype(jnp.int32)
    l = _log2(ndev)
    if l == 0:
        return jnp.zeros(ipos_x.shape, jnp.int32)
    return (ipos_x >> jnp.uint32(32 - l)).astype(jnp.int32)


def balance_cuts(plane_costs, ndev: int):
    """Choose x-column slab boundaries that equalize cost.

    plane_costs: host [nplanes] per-x-column cost histogram (particle
    counts or weighted work; columns are uniform x-bins at any
    power-of-two granularity — they need NOT be mesh planes, since
    the PM deposit reaches the uniform FFT layout through the
    route_rows layout exchange).  Returns cut_planes [ndev+1] ints
    with cut_planes[0]=0, cut_planes[ndev]=nplanes, each slab >= 1
    column, cumulative cost per slab as equal as column granularity
    allows — the slab analog of the reference's balanced topleaf
    segment assignment (libgadget/domain.cpp:620).
    """
    plane_costs = np.asarray(plane_costs, np.float64)
    nplanes = len(plane_costs)
    if nplanes < ndev:
        raise ValueError(f"{nplanes} planes < {ndev} devices")
    cum = np.cumsum(plane_costs)
    total = cum[-1]
    cuts = [0]
    for d in range(1, ndev):
        target = total * d / ndev
        c = int(np.searchsorted(cum, target)) + 1
        c = max(c, cuts[-1] + 1)
        c = min(c, nplanes - (ndev - d))
        cuts.append(c)
    cuts.append(nplanes)
    return np.asarray(cuts, np.int64)


def cuts_fp_from_planes(cut_planes, nplanes: int):
    """Interior fixed-point boundaries [ndev-1] from plane cuts.

    nplanes must divide 2^32 (power-of-two mesh) so boundaries are
    exactly representable — the mesh-plane alignment invariant.
    """
    if (1 << 32) % nplanes:
        raise ValueError(f"nplanes {nplanes} must divide 2^32")
    step = (1 << 32) // nplanes
    inner = np.asarray(cut_planes, np.int64)[1:-1]
    return (inner * step).astype(np.uint32)


def slab_lo(me, ndev: int):
    """First fixed-point x owned by device `me` (traced scalar)."""
    l = _log2(ndev)
    return (me.astype(jnp.uint32) << jnp.uint32(32 - l)) if l else \
        jnp.uint32(0)


def _compact_first(mask, cap: int):
    """Indices of up to `cap` rows where mask is set (stable order).

    Returns (idx [cap] int32, valid [cap] bool, n_lost) — n_lost rows
    had the mask set but did not fit.
    """
    perm = jnp.argsort(jnp.where(mask, 0, 1).astype(jnp.int8),
                       stable=True)
    idx = perm[:cap]
    valid = mask[perm[:cap]]
    n_lost = jnp.sum(mask) - jnp.sum(valid)
    return idx.astype(jnp.int32), valid, n_lost


def exchange(fields: dict, ndev: int, kcap: int,
             axis_name: str = "dp", cuts_in=None):
    """Migrate rows to their owner slab (domain_exchange analog).

    fields: dict of [C, ...] arrays; must contain 'ipos' (uint32
    [C,3]) and 'mass' (f32 [C], 0 = dead row).  Rows whose x-slab is
    not this device are sent there (up to `kcap` per destination);
    received rows fill dead slots.  Returns (new_fields, info) with
    info = {'unsent': rows that exceeded kcap and stayed,
            'dropped': alive rows lost to capacity overflow,
            'n_alive': global alive count} — all psum'd scalars.
    """
    ipos, mass = fields["ipos"], fields["mass"]
    C = ipos.shape[0]
    me = jax.lax.axis_index(axis_name)
    alive = mass > 0
    dest = slab_index(ipos[:, 0], ndev, cuts_in)
    dest = jnp.where(alive, dest, me)
    leaving = alive & (dest != me)

    # stable-sort rows by destination; non-leaving rows to the end
    key = jnp.where(leaving, dest, ndev)
    perm = jnp.argsort(key.astype(jnp.int32), stable=True)
    ksort = key[perm]
    start = jnp.searchsorted(ksort, jnp.arange(ndev, dtype=ksort.dtype))
    rank = jnp.arange(C) - start[jnp.minimum(ksort, ndev - 1)]
    is_mig = ksort < ndev
    sendable = is_mig & (rank < kcap)
    unsent = jnp.sum(is_mig & ~sendable)
    flat = jnp.where(sendable, ksort * kcap + rank, ndev * kcap)

    new_fields = {}
    recvs = {}
    for name, a in fields.items():
        buf = jnp.zeros((ndev * kcap + 1,) + a.shape[1:], a.dtype)
        send = buf.at[flat].set(a[perm])[:ndev * kcap]
        send = send.reshape((ndev, kcap) + a.shape[1:])
        recvs[name] = jax.lax.all_to_all(
            send, axis_name, split_axis=0, concat_axis=0)

    # sent rows die locally; merge receives into free slots
    sent = jnp.zeros(C, bool).at[perm].set(sendable)
    mass_kept = jnp.where(sent, 0.0, mass)
    merged_mass = jnp.concatenate(
        [mass_kept, recvs["mass"].reshape(-1)])
    alive_m = merged_mass > 0
    perm2 = jnp.argsort(jnp.where(alive_m, 0, 1).astype(jnp.int8),
                        stable=True)[:C]
    for name, a in fields.items():
        merged = jnp.concatenate(
            [mass_kept if name == "mass" else a,
             recvs[name].reshape((ndev * kcap,) + a.shape[1:])])
        new_fields[name] = merged[perm2]
    dropped = jnp.maximum(jnp.sum(alive_m) - C, 0)
    info = {
        "unsent": jax.lax.psum(unsent, axis_name),
        "dropped": jax.lax.psum(dropped, axis_name),
        "n_alive": jax.lax.psum(
            jnp.sum(new_fields["mass"] > 0), axis_name),
    }
    return new_fields, info


def _halo_a2a(fields: dict, width_fp: int, ndev: int, gcap: int,
              axis_name: str, cuts_in=None):
    """General ghost exchange: one bucketed all_to_all shipping each
    boundary row to EVERY slab within `width_fp` of it — the
    arbitrary-rank export analog of treewalk2.h:307-362 (the ring is
    a 2-neighbor specialization).  No width restriction: each
    (src,dst) pair owns a private bucket, so a row in reach of
    several slabs is delivered to each exactly once and can never
    arrive twice.

    Returns (ghosts [ndev*gcap, ...], n_lost psum'd).
    """
    ipos, mass = fields["ipos"], fields["mass"]
    C = ipos.shape[0]
    gcap = min(gcap, C)
    l = _log2(ndev)
    slab_fp = 1 << (32 - l)
    me = jax.lax.axis_index(axis_name)
    alive = mass > 0
    x = ipos[:, 0]

    n_lost = jnp.zeros((), jnp.int32)
    send = {name: jnp.zeros((ndev, gcap) + a.shape[1:], a.dtype)
            for name, a in fields.items()}
    for d in range(ndev):
        # periodic uint32 distance from x to slab d's interval
        # [lo, lo+size): 0 inside; else min of the two walk directions
        if cuts_in is None:
            lo = jnp.uint32(d) << jnp.uint32(32 - l)
            size = jnp.uint32(slab_fp)
        else:
            cuts = jnp.asarray(cuts_in)
            lo = cuts[d - 1] if d > 0 else jnp.uint32(0)
            hi = cuts[d] if d < ndev - 1 else jnp.uint32(0)
            size = hi - lo                   # uint32 wrap: last slab
        a_off = x - lo                       # uint32 exact wrap
        inside = a_off < size
        d_below = jnp.uint32(0) - a_off      # x up to lo
        d_above = a_off - (size - jnp.uint32(1))
        dist = jnp.where(inside, jnp.uint32(0),
                         jnp.minimum(d_below, d_above))
        need = alive & (dist < jnp.uint32(width_fp)) & (d != me)
        idx, val, lost = _compact_first(need, gcap)
        n_lost = n_lost + lost
        for name, arr in fields.items():
            rows = arr[idx]
            if name == "mass":
                rows = jnp.where(val, rows, 0.0)
            send[name] = send[name].at[d].set(rows)

    ghosts = {}
    for name, a in fields.items():
        recv = jax.lax.all_to_all(send[name], axis_name,
                                  split_axis=0, concat_axis=0)
        ghosts[name] = recv.reshape((ndev * gcap,) + a.shape[1:])
    return ghosts, jax.lax.psum(n_lost, axis_name)


def halo_exchange(fields: dict, width_fp: int, ndev: int, gcap: int,
                  axis_name: str = "dp", cuts_in=None):
    """Ship boundary strips of fixed-point width `width_fp` to the two
    slab neighbors (the ghost/export-import analog of
    treewalk2.h:307-362; slab domains only need their two neighbors
    when width < slab width).  When the halo is too wide for the ring
    (2*width > (ndev-1)*slab — deep clustering, void hsml), falls
    back to the general bucketed all_to_all exchange (_halo_a2a).

    gcap is clamped to the row capacity C (a strip can never hold
    more rows than the device owns).
    Returns (ghosts, n_lost): ghosts is a dict of [2*gcap, ...] arrays
    (left-neighbor ghosts then right-neighbor ghosts, mass 0 for
    unused rows; [ndev*gcap] on the all_to_all path); n_lost counts
    boundary rows that exceeded gcap (psum'd).
    """
    l = _log2(ndev)
    slab_fp = 1 << (32 - l) if l else 1 << 32
    # a strip wider than one slab needs ghosts from further neighbors:
    # hop h ships the strip that lies between (h-1) and h slabs away
    nhops = int(np.ceil(width_fp / slab_fp))
    # the ring delivers via left and right hop chains; a row may reach
    # the same destination from both directions (duplicate ghost mass)
    # unless 2*width <= (ndev-1)*slab — past that, use the general
    # exchange
    # cost-balanced cuts: strips are per-device intervals, not the
    # uniform ring geometry — always take the general exchange
    if ndev > 1 and cuts_in is not None:
        return _halo_a2a(fields, width_fp, ndev, gcap, axis_name,
                         cuts_in)
    if ndev > 1 and 2 * width_fp > (ndev - 1) * slab_fp:
        return _halo_a2a(fields, width_fp, ndev, gcap, axis_name)
    ipos, mass = fields["ipos"], fields["mass"]
    gcap = min(gcap, ipos.shape[0])
    me = jax.lax.axis_index(axis_name)
    off = ipos[:, 0] - slab_lo(me, ndev)       # uint32, wraps exactly
    alive = mass > 0

    if ndev == 1:
        # periodic wrap makes self-ghosts unnecessary on one device:
        # min-image distances already see every local particle once
        ghosts = {
            name: jnp.zeros((2 * gcap,) + a.shape[1:], a.dtype)
            for name, a in fields.items()}
        return ghosts, jnp.zeros((), jnp.int32)

    parts = {name: [] for name in fields}
    n_lost = jnp.zeros((), jnp.int32)
    for h in range(1, nhops + 1):
        # strip going LEFT h hops: off < width - (h-1)*slab (whole
        # slab once past hop 1); symmetric for right
        w_lo = min(width_fp - (h - 1) * slab_fp, slab_fp)
        near_lo = alive & (off < jnp.uint32(w_lo))
        near_hi = alive & (off >= jnp.uint32(slab_fp - w_lo))
        idx_lo, val_lo, lost_lo = _compact_first(near_lo, gcap)
        idx_hi, val_hi, lost_hi = _compact_first(near_hi, gcap)
        to_left = [(i, (i - h) % ndev) for i in range(ndev)]
        to_right = [(i, (i + h) % ndev) for i in range(ndev)]
        for name, a in fields.items():
            send_lo = a[idx_lo]
            send_hi = a[idx_hi]
            if name == "mass":
                send_lo = jnp.where(val_lo, send_lo, 0.0)
                send_hi = jnp.where(val_hi, send_hi, 0.0)
            # my low strip -> h-left neighbor; so I receive MY
            # right-side ghosts from my h-right neighbor's low strip
            from_right = jax.lax.ppermute(send_lo, axis_name, to_left)
            from_left = jax.lax.ppermute(send_hi, axis_name, to_right)
            parts[name].extend([from_left, from_right])
        n_lost = n_lost + lost_lo + lost_hi
    ghosts = {name: jnp.concatenate(chunks)
              for name, chunks in parts.items()}
    return ghosts, jax.lax.psum(n_lost, axis_name)


def route_rows(fields: dict, dest, valid, ndev: int, kcap: int,
               axis_name: str = "dp"):
    """Round-trip layout exchange: ship rows to `dest` devices.

    The petapm region/pencil layout-exchange analog
    (libgadget/petapm.cpp:79-87): rows are delivered to another
    LAYOUT (e.g. the uniform FFT slab) for a computation whose
    per-row results then travel back with `route_back` — unlike
    `exchange`, nothing migrates permanently and the sender keeps
    its rows.

    fields: dict of [C, ...] arrays; dest [C] int32 target device;
    valid [C] rows eligible to ship.  Rows with dest == me are NOT
    shipped (callers use them in place).  kcap bounds rows per
    (src,dst) pair; overflow rows stay (psum-counted, never dropped
    silently).

    Returns (recv dict of [ndev*kcap, ...], rvalid [ndev*kcap] bool,
    state, n_lost) — state feeds route_back.
    """
    C = dest.shape[0]
    me = jax.lax.axis_index(axis_name)
    leaving = valid & (dest != me)
    key = jnp.where(leaving, dest, ndev)
    perm = jnp.argsort(key.astype(jnp.int32), stable=True)
    ksort = key[perm]
    start = jnp.searchsorted(
        ksort, jnp.arange(ndev, dtype=ksort.dtype))
    rank = jnp.arange(C) - start[jnp.minimum(ksort, ndev - 1)]
    is_mig = ksort < ndev
    sendable = is_mig & (rank < kcap)
    n_lost = jnp.sum(is_mig & ~sendable)
    flat = jnp.where(sendable, ksort * kcap + rank, ndev * kcap)

    recv = {}
    for name, a in fields.items():
        buf = jnp.zeros((ndev * kcap + 1,) + a.shape[1:], a.dtype)
        send = buf.at[flat].set(a[perm])[:ndev * kcap]
        send = send.reshape((ndev, kcap) + a.shape[1:])
        recv[name] = jax.lax.all_to_all(
            send, axis_name, split_axis=0, concat_axis=0
        ).reshape((ndev * kcap,) + a.shape[1:])
    vsend = jnp.zeros(ndev * kcap + 1, jnp.int32).at[flat].set(
        sendable.astype(jnp.int32))[:ndev * kcap]
    rvalid = jax.lax.all_to_all(
        vsend.reshape(ndev, kcap), axis_name, split_axis=0,
        concat_axis=0).reshape(-1) > 0
    state = (perm, flat, kcap)
    return recv, rvalid, state, jax.lax.psum(n_lost, axis_name)


def route_back(res, state, axis_name: str = "dp"):
    """Return per-row results of a route_rows delivery to the senders.

    res: [ndev*kcap, ...] computed for the received rows (same row
    order as route_rows' recv).  Returns [C, ...] in the SENDER's
    original row order; rows that were not shipped get zeros.
    """
    perm, flat, kcap = state
    ndev = res.shape[0] // kcap
    send = res.reshape((ndev, kcap) + res.shape[1:])
    back = jax.lax.all_to_all(send, axis_name, split_axis=0,
                              concat_axis=0)
    backf = back.reshape((ndev * kcap,) + res.shape[1:])
    padded = jnp.concatenate(
        [backf, jnp.zeros((1,) + res.shape[1:], res.dtype)])
    res_perm = padded[flat]                  # rows in perm order
    C = flat.shape[0]
    return jnp.zeros((C,) + res.shape[1:], res.dtype).at[perm].set(
        res_perm)


# ---------------------------------------------------------------------------
# host-side helpers


def distribute_slabs(mesh: Mesh, fields: dict, capacity: int = None,
                     headroom: float = 1.5, block: int = 128,
                     cuts_in=None):
    """Partition global host arrays into per-slab fixed-capacity
    blocks and place them sharded over the mesh.

    fields: dict of [N, ...] numpy/jax arrays with 'ipos' and 'mass'.
    Returns (sharded_fields, capacity).  Rows within each slab are
    Morton-sorted (the local sort invariant the octree build relies
    on for block quality).
    """
    from ..ops.morton import morton_key

    ndev = mesh.devices.size
    _log2(ndev)
    ipos = np.asarray(fields["ipos"])
    n = ipos.shape[0]
    if cuts_in is not None:
        dest = np.searchsorted(np.asarray(cuts_in), ipos[:, 0],
                               side="right").astype(np.int32)
    else:
        dest = np.asarray(slab_index(jnp.asarray(ipos[:, 0]), ndev))
    keys = np.asarray(morton_key(jnp.asarray(ipos)))
    order = np.lexsort((keys, dest))
    counts = np.bincount(dest, minlength=ndev)
    if capacity is None:
        capacity = int(np.ceil(counts.max() * headroom))
        capacity = ((capacity + block - 1) // block) * block
    if counts.max() > capacity:
        raise ValueError(
            f"slab occupancy {counts.max()} exceeds capacity "
            f"{capacity}")
    offs = np.concatenate([[0], np.cumsum(counts)])
    out = {}
    for name, a in fields.items():
        a = np.asarray(a)[order]
        buf = np.zeros((ndev, capacity) + a.shape[1:], a.dtype)
        for d in range(ndev):
            buf[d, : counts[d]] = a[offs[d]: offs[d + 1]]
        flat = buf.reshape((ndev * capacity,) + a.shape[1:])
        spec = P("dp", *([None] * (a.ndim - 1)))
        out[name] = jax.device_put(
            jnp.asarray(flat), NamedSharding(mesh, spec))
    return out, capacity


def collect_alive(fields: dict):
    """Gather sharded fields to host and strip dead rows (tests/IO)."""
    mass = np.asarray(fields["mass"])
    alive = mass > 0
    return {name: np.asarray(a)[alive] for name, a in fields.items()}
