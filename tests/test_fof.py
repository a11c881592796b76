"""FOF halo finder tests (mirrors reference test_fof coverage)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.fof.fof import fof, fof_label, compile_groups

BOX = 60000.0


def _ipos(pos):
    return jnp.asarray(float_to_ipos(pos, BOX))


def test_fof_line():
    """A chain of closely spaced particles links into one group, even
    across the periodic wrap (reference test_fof line test)."""
    n = 100
    spacing = 50.0
    pos = np.zeros((n, 3))
    pos[:, 0] = (np.arange(n) * spacing) % BOX
    pos[:, 1] = BOX / 2
    pos[:, 2] = BOX / 2
    # chain crossing the box boundary
    pos[:, 0] = (pos[:, 0] + BOX - spacing * n / 2) % BOX
    vel = np.zeros((n, 3), np.float32)
    mass = np.ones(n, np.float32)
    ptype = np.ones(n, np.int8)
    alive = np.ones(n, bool)
    groups = fof(_ipos(pos), vel, mass, ptype, alive, BOX,
                 mean_separation=spacing / 0.15,  # b = 0.2*sep > spacing
                 linking_length=0.2, min_length=32)
    assert groups.ngroups == 1
    assert groups.lengths[0] == n
    assert groups.masses[0] == pytest.approx(n, rel=1e-5)
    assert np.all(groups.group_id == 1)


def test_fof_two_clumps_and_noise():
    """Two tight clumps above min_length plus sparse noise below it."""
    rng = np.random.RandomState(5)
    n1, n2, nn = 200, 100, 50
    mean_sep = BOX / 30
    b = 0.2 * mean_sep
    c1 = np.array([BOX / 4] * 3)
    c2 = np.array([3 * BOX / 4] * 3)
    pos = np.concatenate([
        c1 + rng.uniform(-b, b, (n1, 3)) * 0.3,
        c2 + rng.uniform(-b, b, (n2, 3)) * 0.3,
        rng.uniform(0, BOX, (nn, 3)),
    ]) % BOX
    n = len(pos)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = np.full(n, 2.0, np.float32)
    ptype = np.ones(n, np.int8)
    alive = np.ones(n, bool)
    groups = fof(_ipos(pos), vel, mass, ptype, alive, BOX,
                 mean_separation=mean_sep, min_length=32)
    assert groups.ngroups == 2
    # sorted by length desc
    assert groups.lengths[0] == n1
    assert groups.lengths[1] == n2
    np.testing.assert_allclose(groups.masses, [2.0 * n1, 2.0 * n2],
                               rtol=1e-5)
    # centers of mass near the clump centers
    np.testing.assert_allclose(groups.cm[0], c1, atol=b)
    np.testing.assert_allclose(groups.cm[1], c2, atol=b)
    # noise particles unassigned
    assert (groups.group_id[n1 + n2:] == 0).all()


def test_fof_cm_periodic_wrap():
    """A clump straddling the box corner gets the right CM."""
    rng = np.random.RandomState(6)
    n = 64
    pos = (rng.uniform(-200, 200, (n, 3))) % BOX  # around the origin
    vel = np.zeros((n, 3), np.float32)
    mass = np.ones(n, np.float32)
    ptype = np.ones(n, np.int8)
    alive = np.ones(n, bool)
    groups = fof(_ipos(pos), vel, mass, ptype, alive, BOX,
                 mean_separation=1000.0, min_length=32)
    assert groups.ngroups == 1
    cm = groups.cm[0]
    # CM should be near the origin/corner, not near BOX/2
    d = cm - 0
    d -= BOX * np.round(d / BOX)
    assert np.linalg.norm(d) < 300


def test_fof_secondary_attach():
    """Gas particles attach to the group of their nearest DM."""
    rng = np.random.RandomState(7)
    ndm, ngas = 100, 40
    c = np.array([BOX / 2] * 3)
    pos_dm = c + rng.uniform(-100, 100, (ndm, 3))
    pos_gas = c + rng.uniform(-150, 150, (ngas, 3))
    pos = np.concatenate([pos_dm, pos_gas]) % BOX
    n = len(pos)
    vel = np.zeros((n, 3), np.float32)
    mass = np.ones(n, np.float32)
    ptype = np.concatenate([np.ones(ndm), np.zeros(ngas)]).astype(np.int8)
    alive = np.ones(n, bool)
    groups = fof(_ipos(pos), vel, mass, ptype, alive, BOX,
                 mean_separation=2000.0, min_length=32)
    assert groups.ngroups == 1
    assert (groups.group_id == 1).all()
    assert groups.length_by_type[0, 0] == ngas
    assert groups.length_by_type[0, 1] == ndm
    assert groups.lengths[0] == n


def test_fof_label_engines_agree():
    """Blocked and per-particle link engines give identical labels."""
    rng = np.random.RandomState(7)
    box = 20000.0
    ncl, per = 8, 50
    centers = rng.uniform(0, box, (ncl, 3))
    pos = np.vstack([(centers.repeat(per, 0)
                      + rng.normal(0, 40, (ncl * per, 3))) % box,
                     rng.uniform(0, box, (300, 3))])
    n = len(pos)
    ipos = jnp.asarray(float_to_ipos(pos, box))
    alive = np.ones(n, bool)
    alive[5] = False
    b = 0.2 * box / n ** (1 / 3)
    la = np.asarray(fof_label(ipos, alive, b, box, engine="blocked"))
    lb = np.asarray(fof_label(ipos, alive, b, box,
                              engine="perparticle"))
    assert np.array_equal(la, lb)
