"""Reference-exact IC phases: mt19937 + pmic_fill_gaussian_gadget."""

import numpy as np

from shenqi_tpu.genic.gadget_field import (MT19937Batch,
                                           gadget_gaussian_field)


def test_mt19937_reference_vector():
    """First outputs of init_genrand(5489) — the canonical MT vector."""
    rng = MT19937Batch(np.array([5489], np.uint32))
    got = [int(rng.next_u32()[0]) for _ in range(5)]
    assert got == [3499211612, 581869302, 3890346734, 3586334585,
                   545404204]


def test_mt19937_batch_lockstep_across_twists():
    rb = MT19937Batch(np.array([1, 181170, 99], np.uint32))
    batch = np.stack([rb.next_u32() for _ in range(1300)])
    for k, s in enumerate([1, 181170, 99]):
        rs = MT19937Batch(np.array([s], np.uint32))
        col = np.array([rs.next_u32()[0] for _ in range(1300)])
        assert (batch[:, k] == col).all()


def test_field_hermitian_and_normalized():
    dk = gadget_gaussian_field(181170, 32)
    x = np.fft.irfftn(dk, s=(32, 32, 32), axes=(0, 1, 2))
    back = np.fft.rfftn(x, axes=(0, 1, 2))
    assert np.abs(back - dk).max() < 1e-9
    assert abs(float((np.abs(dk) ** 2).mean()) - 1.0) < 0.05
    assert dk[0, 0, 0] == 0
    # deterministic in the seed
    dk2 = gadget_gaussian_field(181170, 32)
    assert (dk == dk2).all()
    dk3 = gadget_gaussian_field(181171, 32)
    assert not (dk3 == dk).all()


def test_field_unitary_and_invert():
    dk = gadget_gaussian_field(7, 16, unitary=True)
    amps = np.abs(dk)
    # every mode has |d| = 1, except the 8 self-conjugate modes which
    # keep only ampl*cos(phase) (pmesh.h:158-162) and the DC zero
    mask = np.ones_like(amps, bool)
    n = 16
    for i in (0, n // 2):
        for j in (0, n // 2):
            for k in (0, n // 2):
                mask[i, j, k] = False
    assert np.allclose(amps[mask], 1.0)
    assert (amps[~mask] <= 1.0 + 1e-12).all()
    dki = gadget_gaussian_field(7, 16, unitary=True, invert_phase=True)
    assert np.allclose(dki[mask], -dk[mask])
