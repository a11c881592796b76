"""Pallas TPU kernel for the short-range P2P dense evaluation.

The XLA block evaluation first GATHERS every block's leaf sources into
an [nblocks, maxl*ncrit] table in HBM and then streams it through
lax.scan — paying the gather's HBM round trip and materializing the
table.  Leaf particle runs are CONTIGUOUS in the Morton-sorted arrays,
and so are each block's targets (cell-anchored blocks), so this kernel
replaces the gather with direct HBM->VMEM DMAs:

  per grid program (= one target block of 128 contiguous targets):
    1. DMA the targets to VMEM;
    2. loop over the block's leaf list in QUADS (4 leaves x ncrit=32
       sources = one 128-lane tile), double-buffered: DMA the next
       quad's 4 contiguous source runs while computing the current;
    3. accumulate spline-softened, window-multiplied pair forces in
       VMEM; emit [128,3] accel + [128] potential.

The short-range window is the Chebyshev PolyWindow evaluated by
Clenshaw recursion (pure FMA; table gathers crash the axon worker).
Positions are uint32 fixed point: the periodic separation is the
int32 reinterpretation of the uint32 difference (exact wraparound).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.particles import POS_SCALE

NCRIT = 32           # leaf capacity (sources per leaf slot)
QUAD = 4             # leaves per tile: QUAD*NCRIT = 128 lanes
BLK = 128            # targets per block
NSCAL = 5


def _clenshaw(t, coeffs):
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for k in range(len(coeffs) - 1, 0, -1):
        b1, b2 = coeffs[k] + 2.0 * t * b1 - b2, b1
    return coeffs[0] + t * b1 - b2


def _p2p_kernel(nquads_ref, tgt_start_ref, quad_ps_ref, quad_pc_ref,
                scal_ref, cfw_ref, cpw_ref,
                ipos_hbm, mass_hbm, acc_ref, pot_ref,
                tgt_pos_s, src_pos_s, src_mass_s, sems):
    b = pl.program_id(0)
    to_f = scal_ref[0]           # boxsize / 2^32
    soft = scal_ref[1]
    inv_cellxmax = scal_ref[2]   # 1 / (cellsize * window_xmax)
    g = scal_ref[3]

    tdma = pltpu.make_async_copy(
        ipos_hbm.at[pl.ds(tgt_start_ref[b], BLK)], tgt_pos_s,
        sems.at[2, 0])
    tdma.start()
    tdma.wait()
    tgt = tgt_pos_s[:, :]                             # [BLK,3] u32

    nq = nquads_ref[b]

    def dmas(slot, q):
        out = []
        for j in range(QUAD):
            ps = quad_ps_ref[b, q * QUAD + j]
            out.append(pltpu.make_async_copy(
                ipos_hbm.at[pl.ds(ps, NCRIT)],
                src_pos_s.at[slot, pl.ds(j * NCRIT, NCRIT)],
                sems.at[slot, 2 * j]))
            out.append(pltpu.make_async_copy(
                mass_hbm.at[pl.ds(ps, NCRIT)],
                src_mass_s.at[slot, pl.ds(j * NCRIT, NCRIT)],
                sems.at[slot, 2 * j + 1]))
        return out

    def start(slot, q):
        for c in dmas(slot, q):
            c.start()

    def wait(slot, q):
        for c in dmas(slot, q):
            c.wait()

    @pl.when(nq > 0)
    def _():
        start(0, 0)

    cfw = [cfw_ref[i] for i in range(cfw_ref.shape[0])]
    cpw = [cpw_ref[i] for i in range(cpw_ref.shape[0])]

    def body(q, carry):
        acc, pot = carry
        slot = q % 2

        @pl.when(q + 1 < nq)
        def _():
            start(1 - slot, q + 1)

        wait(slot, q)
        spos = src_pos_s[slot, :, :]                  # [128,3] u32
        smass = src_mass_s[slot, :]                   # [128]
        # lane validity: lane l belongs to leaf l // NCRIT
        sub = jax.lax.broadcasted_iota(jnp.int32, (QUAD, NCRIT), 1)
        pcs = jnp.stack([quad_pc_ref[b, q * QUAD + j]
                         for j in range(QUAD)])       # [QUAD]
        live = (sub < pcs[:, None]).reshape(QUAD * NCRIT)

        d = spos[None, :, :] - tgt[:, None, :]        # u32 wrap
        dx = pltpu.bitcast(d, jnp.int32).astype(jnp.float32) * to_f
        r2 = jnp.sum(dx * dx, axis=-1)                # [BLK,128]
        r = jnp.sqrt(r2)
        rinv = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-35), 0.0)
        m = jnp.where(live[None, :], smass[None, :], 0.0)
        fac_n = m * rinv * rinv * rinv
        pot_n = -m * rinv
        u = r / soft
        h3i = 1.0 / (soft * soft * soft)
        fin = m * h3i * (10.666666666667 + u * u * (32.0 * u - 38.4))
        us = jnp.maximum(u, 1e-10)
        fout = m * h3i * (21.333333333333 - 48.0 * u + 38.4 * u * u
                          - 10.666666666667 * u ** 3
                          - 0.066666666667 / us ** 3)
        wpi = -2.8 + u * u * (5.333333333333
                              + u * u * (6.4 * u - 9.6))
        wpo = (-3.2 + 0.066666666667 / us
               + u * u * (10.666666666667
                          + u * (-16.0 + u * (9.6
                                              - 2.133333333333 * u))))
        insoft = r2 < soft * soft
        fac = jnp.where(insoft, jnp.where(u < 0.5, fin, fout), fac_n)
        fpot = jnp.where(insoft, (m / soft)
                         * jnp.where(u < 0.5, wpi, wpo), pot_n)
        x = r * inv_cellxmax                          # in [0, 1+)
        t = jnp.clip(2.0 * x - 1.0, -1.0, 1.0)
        inrange = x < 1.0
        fw = jnp.where(inrange, jnp.clip(_clenshaw(t, cfw), 0.0, 1.0),
                       0.0)
        pw = jnp.where(inrange, jnp.clip(_clenshaw(t, cpw), 0.0, 1.0),
                       0.0)
        fall = fac * fw
        acc = acc + jnp.sum(dx * fall[:, :, None], axis=1)
        pot = pot + jnp.sum(fpot * pw, axis=1)
        return acc, pot

    acc0 = jnp.zeros((BLK, 3), jnp.float32)
    pot0 = jnp.zeros((BLK,), jnp.float32)
    acc, pot = jax.lax.fori_loop(0, nq, body, (acc0, pot0))
    acc_ref[0, :, :] = acc * g
    # pot block is sublane-padded to 8 rows (TPU tiling rule)
    pot_ref[0, 0, :] = pot * g


def p2p_blocked(ipos_s, mass_s, tgt_start, nquads, quad_ps, quad_pc,
                boxsize, softening, cellsize, window, G,
                interpret=False):
    """Launch the P2P kernel.

    ipos_s/mass_s: Morton-sorted particle arrays, PADDED by >= NCRIT
    rows at the end (dead rows have zero mass).
    tgt_start [nb]: first sorted index of each block's 128 targets.
    nquads [nb]: number of valid source quads per block.
    quad_ps/quad_pc [nb, maxq*QUAD]: per-leaf-slot source run start
    and count (count 0 for padding slots).
    window: gravity.shortrange.PolyWindow.
    Returns (acc [nb, BLK, 3], pot [nb, BLK]) in G-multiplied units.
    """
    nb = tgt_start.shape[0]
    maxq = quad_ps.shape[1] // QUAD
    xmax = float(window.xmax)
    scal = jnp.asarray([boxsize / float(POS_SCALE), softening,
                        1.0 / (cellsize * xmax), G, 0.0], jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # ipos (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # mass (HBM)
        ],
        out_specs=(
            pl.BlockSpec((1, BLK, 3), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, BLK), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((BLK, 3), jnp.uint32),
            pltpu.VMEM((2, QUAD * NCRIT, 3), jnp.uint32),
            pltpu.VMEM((2, QUAD * NCRIT), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2 * QUAD)),
        ],
    )
    acc, pot = pl.pallas_call(
        _p2p_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, BLK, 3), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, BLK), jnp.float32),
        ),
        interpret=interpret,
    )(nquads.astype(jnp.int32), tgt_start.astype(jnp.int32),
      quad_ps.astype(jnp.int32), quad_pc.astype(jnp.int32),
      scal, window.cf, window.cp, ipos_s, mass_s)
    return acc, pot[:, 0, :]
