"""Distributed slab FOF vs single-device FOF labels.

The VERDICT 'done' criterion: 8-device FOF labels identical to the
single-device labels on a clustered configuration (cross-rank linking,
fof.cpp:368-482 analog).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.fof.fof import fof_label
from shenqi_tpu.fof.slab import make_fof_slab
from shenqi_tpu.parallel.sharded import make_mesh
from shenqi_tpu.parallel.domain import distribute_slabs

BOX = 1000.0


def _config(n=4000, seed=11):
    rng = np.random.RandomState(seed)
    # clumps deliberately straddling slab boundaries (x = k*BOX/8)
    pos = np.concatenate([
        rng.uniform(0, BOX, (n // 2, 3)),
        rng.normal([125, 300, 300], 12, (n // 8, 3)) % BOX,
        rng.normal([250, 700, 200], 10, (n // 8, 3)) % BOX,
        rng.normal([500, 500, 500], 15, (n // 8, 3)) % BOX,
        # filament crossing several slabs in x
        np.stack([rng.uniform(300, 900, n - n // 2 - 3 * (n // 8)),
                  np.full(n - n // 2 - 3 * (n // 8), 111.0)
                  + rng.normal(0, 2, n - n // 2 - 3 * (n // 8)),
                  np.full(n - n // 2 - 3 * (n // 8), 222.0)
                  + rng.normal(0, 2, n - n // 2 - 3 * (n // 8))],
                 axis=-1) % BOX,
    ])
    return pos


def test_slab_fof_matches_single_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    pos = _config()
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    mean_sep = BOX / np.cbrt(n)
    b = 0.2 * mean_sep * 4  # generous so clumps + filament link up

    # single-device reference labels -> min-pid per component
    lbl1 = np.asarray(fof_label(jnp.asarray(ipos),
                                jnp.ones(n, bool), b, BOX,
                                nlevels=8, ncrit=32))
    # canonicalize: min pid of each component
    ref = np.zeros(n, np.uint32)
    for root in np.unique(lbl1):
        sel = lbl1 == root
        ref[sel] = np.min(np.nonzero(sel)[0])

    mesh = make_mesh(8)
    fields = {
        "ipos": ipos,
        "mass": np.ones(n, np.float32),
        "pid": np.arange(n, dtype=np.int32),
    }
    sharded, C = distribute_slabs(mesh, fields, block=64)
    run = make_fof_slab(mesh, b, BOX, nlevels=8, ncrit=32)
    glabel, info = run(sharded)
    assert int(info["halo_lost"]) == 0
    assert int(info["block_overflow"]) == 0
    assert int(info["list_overflow"]) == 0
    assert int(info["local_unconverged"]) == 0
    assert int(info["global_unconverged"]) == 0

    glabel = np.asarray(glabel)
    pid = np.asarray(sharded["pid"])
    mass = np.asarray(sharded["mass"])
    alive = mass > 0
    got = np.full(n, 0xFFFFFFFF, np.uint32)
    got[pid[alive]] = glabel[alive]
    assert (got != 0xFFFFFFFF).all()
    np.testing.assert_array_equal(got, ref)
    # the filament spans slabs: needs >1 reconciliation round
    assert int(info["rounds"]) >= 1


def test_slab_fof_matches_single_device_balanced_cuts():
    """Same parity on a COST-BALANCED domain: ghost strips must
    follow the actual ownership cuts (domain.balance_cuts), or
    boundary clumps never co-reside and merges are missed."""
    from shenqi_tpu.parallel.domain import (balance_cuts,
                                            cuts_fp_from_planes)
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    pos = _config(seed=13)
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    mean_sep = BOX / np.cbrt(n)
    b = 0.2 * mean_sep * 4

    lbl1 = np.asarray(fof_label(jnp.asarray(ipos),
                                jnp.ones(n, bool), b, BOX,
                                nlevels=8, ncrit=32))
    ref = np.zeros(n, np.uint32)
    for root in np.unique(lbl1):
        sel = lbl1 == root
        ref[sel] = np.min(np.nonzero(sel)[0])

    ncols = 4096
    cols = (ipos[:, 0].astype(np.uint64) * np.uint64(ncols)
            >> np.uint64(32)).astype(np.int64)
    cuts_pl = balance_cuts(np.bincount(cols, minlength=ncols), 8)
    cuts_in = cuts_fp_from_planes(cuts_pl, ncols)

    mesh = make_mesh(8)
    fields = {
        "ipos": ipos,
        "mass": np.ones(n, np.float32),
        "pid": np.arange(n, dtype=np.int32),
    }
    sharded, C = distribute_slabs(mesh, fields, block=64,
                                  cuts_in=cuts_in)
    run = make_fof_slab(mesh, b, BOX, nlevels=8, ncrit=32,
                        with_cuts=True)
    glabel, info = run(sharded, jnp.asarray(cuts_in))
    assert int(info["halo_lost"]) == 0
    assert int(info["global_unconverged"]) == 0

    glabel = np.asarray(glabel)
    pid = np.asarray(sharded["pid"])
    alive = np.asarray(sharded["mass"]) > 0
    got = np.full(n, 0xFFFFFFFF, np.uint32)
    got[pid[alive]] = glabel[alive]
    assert (got != 0xFFFFFFFF).all()
    np.testing.assert_array_equal(got, ref)


def test_slab_fof_invariant_under_random_offset():
    """A global uint32 box shift (RandomParticleOffset semantics,
    run.cpp:426-428) must not change FOF group membership: linking is
    periodic, and the PM-step exchange re-homes shifted rows before
    FOF runs.  Certifies the slab ghost machinery under the shift."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    pos = _config(seed=17)
    n = len(pos)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    mean_sep = BOX / np.cbrt(n)
    b = 0.2 * mean_sep * 4
    mesh = make_mesh(8)
    run = make_fof_slab(mesh, b, BOX, nlevels=8, ncrit=32)

    def labels(ip):
        fields = {"ipos": ip, "mass": np.ones(n, np.float32),
                  "pid": np.arange(n, dtype=np.int32)}
        sharded, _ = distribute_slabs(mesh, fields, block=64)
        glabel, info = run(sharded)
        assert int(info["halo_lost"]) == 0
        glabel = np.asarray(glabel)
        pid = np.asarray(sharded["pid"])
        alive = np.asarray(sharded["mass"]) > 0
        got = np.full(n, -1, np.int64)
        got[pid[alive]] = glabel[alive]
        # canonicalize labels to the min member pid per group
        out = np.full(n, -1, np.int64)
        for root in np.unique(got):
            sel = got == root
            out[sel] = np.min(np.nonzero(sel)[0])
        return out

    base = labels(ipos)
    # an awkward shift: straddles slab boundaries and wraps the box
    off = (np.array([0.37, 0.81, 0.05]) * 2 ** 32).astype(
        np.int64).astype(np.uint32)
    shifted = (ipos.astype(np.uint32) + off[None, :])
    np.testing.assert_array_equal(base, labels(shifted))


def test_distributed_group_reduction_matches_host_compile():
    """compile_groups_slab_distributed (device-side reduction routed
    by label ownership, fof.cpp:903 mpsort-by-MinID analog) must
    reproduce the host-side compile_groups_from_slab catalog."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from shenqi_tpu.fof.slab import (compile_groups_from_slab,
                                     compile_groups_slab_distributed)
    pos = _config(seed=23)
    n = len(pos)
    rng = np.random.RandomState(4)
    ipos = np.asarray(float_to_ipos(pos, BOX))
    mean_sep = BOX / np.cbrt(n)
    b = 0.2 * mean_sep * 4
    mesh = make_mesh(8)
    fields = {
        "ipos": ipos,
        "mass": rng.uniform(0.5, 2.0, n).astype(np.float32),
        "vel": rng.normal(0, 5, (n, 3)).astype(np.float32),
        "ptyp": (rng.randint(0, 2, n) * 1).astype(np.int32),
        "pid": np.arange(n, dtype=np.int32),
    }
    sharded, C = distribute_slabs(mesh, fields, block=64)
    run = make_fof_slab(mesh, b, BOX, nlevels=8, ncrit=32)
    glabel, info = run({"ipos": sharded["ipos"],
                        "mass": sharded["mass"],
                        "pid": sharded["pid"]})
    assert int(info["halo_lost"]) == 0

    host_groups, host_pid = compile_groups_from_slab(
        glabel, sharded, BOX, min_length=8)
    dist_groups, dist_pid = compile_groups_slab_distributed(
        mesh, glabel, sharded, BOX, min_length=8, kcap=4096)

    assert dist_groups.ngroups == host_groups.ngroups
    G = dist_groups.ngroups
    assert G > 2

    def canon(g):
        key = np.lexsort((np.round(g.cm[:, 2], 3),
                          np.round(g.cm[:, 1], 3),
                          np.round(g.cm[:, 0], 3), -g.lengths))
        return key

    kh, kd = canon(host_groups), canon(dist_groups)
    np.testing.assert_array_equal(host_groups.lengths[kh],
                                  dist_groups.lengths[kd])
    np.testing.assert_allclose(dist_groups.masses[kd],
                               host_groups.masses[kh], rtol=2e-5)
    # CMs agree (periodic): f32 device sums vs f64 host sums
    dcm = dist_groups.cm[kd] - host_groups.cm[kh]
    dcm -= BOX * np.round(dcm / BOX)
    bad = np.abs(dcm).max(axis=1) > 1e-2 * mean_sep
    if bad.any():
        i = np.argmax(np.abs(dcm).max(axis=1))
        print("BAD PAIRING?", i, host_groups.lengths[kh][i],
              dist_groups.lengths[kd][i], host_groups.cm[kh][i],
              dist_groups.cm[kd][i])
    assert np.abs(dcm).max() < 1e-2 * mean_sep
    np.testing.assert_allclose(dist_groups.vel[kd],
                               host_groups.vel[kh], rtol=5e-4,
                               atol=1e-3)
    np.testing.assert_allclose(dist_groups.mass_by_type[kd],
                               host_groups.mass_by_type[kh],
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(dist_groups.length_by_type[kd],
                                  host_groups.length_by_type[kh])

    # per-row membership partitions are identical: compare group ids
    # through each catalog's canonical order
    np.testing.assert_array_equal(host_pid, dist_pid)
    inv_h = np.zeros(G + 1, np.int64)
    inv_h[host_groups.group_id[host_groups.group_id > 0]] = 0  # touch
    remap_h = np.zeros(G + 1, np.int64)
    remap_h[1 + kh] = np.arange(1, G + 1)
    remap_d = np.zeros(G + 1, np.int64)
    remap_d[1 + kd] = np.arange(1, G + 1)
    np.testing.assert_array_equal(remap_h[host_groups.group_id],
                                  remap_d[dist_groups.group_id])
