"""Pallas TPU kernel for the short-range packed dense evaluation.

The XLA evaluation streams the packed [nblocks, S] source tables
through lax.scan with masked elementwise math — every intermediate
([batch, blk, chunk] separations, windows, spline factors) makes an
HBM round trip between fused subgraphs.  This kernel fuses the ENTIRE
pair interaction (minimum-image separation, spline softening,
Chebyshev window, force/potential accumulation) into one
VMEM-resident program per target block, with Pallas auto-pipelining
the per-block source tables HBM->VMEM across grid steps.

Layouts obey the TPU (8,128) tiling rules:
  targets   tx/ty/tz   [nb, 1, BLK]       (targets on sublanes after
                                            the in-kernel reshape)
  sources   sx/sy/sz/sm [nb, S//SCH, SCH] (SCH lanes per inner step)
  output    acc [nb, BLK, 3] f32, pot [nb, 8, BLK] (row 0 used)

BLK is parametric: 128 for the round-2 padded schedule, 32 for the
refined packed schedule's sub-blocks (a [32, 512] pair tile is 4x4
native (8,128) tiles).

Positions are uint32 fixed point: the periodic separation is the
int32 reinterpretation of the uint32 difference (exact wraparound),
computed per component to keep every array 2-D in the kernel.

Pair math matches gravity.shortrange_refined._pair_fac: ONE rsqrt,
otherwise pure FMA (sqrt/divide run ~7x slower on the VPU; the spline
1/u^3 and 1/u terms fold exactly into rinv^3 and rinv).

`want_pot=False` (the production per-step path — the tree potential
is only consumed by energy statistics) skips the potential window
polynomial and accumulation entirely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.particles import POS_SCALE

BLK = 128            # default targets per block
SCH = 512            # source lanes per inner step


def _clenshaw(t, coeffs):
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for k in range(len(coeffs) - 1, 0, -1):
        b1, b2 = coeffs[k] + 2.0 * t * b1 - b2, b1
    return coeffs[0] + t * b1 - b2


def _make_kernel(want_pot: bool, sch: int, blk: int):
    def kernel(scal_ref, cfw_ref, cpw_ref,
               tx_ref, ty_ref, tz_ref,
               sx_ref, sy_ref, sz_ref, sm_ref,
               *out_refs):
        to_f = scal_ref[0]
        soft = scal_ref[1]
        inv_cellxmax = scal_ref[2]
        g = scal_ref[3]
        nrows = sx_ref.shape[1]          # S // sch

        cfw = [cfw_ref[i] for i in range(cfw_ref.shape[0])]
        cpw = [cpw_ref[i] for i in range(cpw_ref.shape[0])]

        tx = tx_ref[0, 0, :].reshape(blk, 1)     # u32 [blk,1]
        ty = ty_ref[0, 0, :].reshape(blk, 1)
        tz = tz_ref[0, 0, :].reshape(blk, 1)

        hinv = 1.0 / soft
        h3i = hinv * hinv * hinv

        def body(s, carry):
            ax, ay, az, pot = carry
            sx = sx_ref[0, s, :].reshape(1, sch)
            sy = sy_ref[0, s, :].reshape(1, sch)
            sz = sz_ref[0, s, :].reshape(1, sch)
            m = sm_ref[0, s, :].reshape(1, sch)

            def sep(a, b):
                d = a - b                          # u32 wrap [blk,sch]
                return pltpu.bitcast(d, jnp.int32).astype(jnp.float32) \
                    * to_f

            dx = sep(sx, tx)
            dy = sep(sy, ty)
            dz = sep(sz, tz)
            r2 = dx * dx + dy * dy + dz * dz
            rinv = jnp.where(r2 > 0, jax.lax.rsqrt(r2), 0.0)
            r = r2 * rinv
            rinv3 = rinv * rinv * rinv
            fac_n = m * rinv3
            u = r * hinv
            fin = m * h3i * (10.666666666667
                             + u * u * (32.0 * u - 38.4))
            fout = (m * h3i * (21.333333333333 - 48.0 * u
                               + 38.4 * u * u
                               - 10.666666666667 * u ** 3)
                    - 0.066666666667 * m * rinv3)
            insoft = r2 < soft * soft
            fac = jnp.where(insoft, jnp.where(u < 0.5, fin, fout),
                            fac_n)
            x = r * inv_cellxmax
            t = jnp.clip(2.0 * x - 1.0, -1.0, 1.0)
            inrange = x < 1.0
            fw = jnp.where(inrange,
                           jnp.clip(_clenshaw(t, cfw), 0.0, 1.0), 0.0)
            fall = fac * fw
            ax = ax + jnp.sum(dx * fall, axis=1, keepdims=True)
            ay = ay + jnp.sum(dy * fall, axis=1, keepdims=True)
            az = az + jnp.sum(dz * fall, axis=1, keepdims=True)
            if want_pot:
                pot_n = -m * rinv
                wpi = -2.8 + u * u * (5.333333333333
                                      + u * u * (6.4 * u - 9.6))
                wpo = (-3.2 + u * u * (10.666666666667
                                       + u * (-16.0 + u * (9.6
                                              - 2.133333333333 * u))))
                fpot = jnp.where(
                    insoft,
                    m * hinv * jnp.where(u < 0.5, wpi, wpo)
                    + jnp.where(u < 0.5, 0.0,
                                0.066666666667 * m * rinv),
                    pot_n)
                pw = jnp.where(inrange,
                               jnp.clip(_clenshaw(t, cpw), 0.0, 1.0),
                               0.0)
                pot = pot + jnp.sum(fpot * pw, axis=1, keepdims=True)
            return ax, ay, az, pot

        z = jnp.zeros((blk, 1), jnp.float32)
        ax, ay, az, pot = jax.lax.fori_loop(0, nrows, body,
                                            (z, z, z, z))
        acc_ref = out_refs[0]
        acc_ref[0, :, 0] = ax[:, 0] * g
        acc_ref[0, :, 1] = ay[:, 0] * g
        acc_ref[0, :, 2] = az[:, 0] * g
        if want_pot:
            out_refs[1][0, 0, :] = pot[:, 0] * g
    return kernel


@partial(jax.jit, static_argnames=("boxsize", "softening", "cellsize",
                                   "G", "interpret", "want_pot",
                                   "sch", "blk"))
def p2p_blocked(tgt_ipos, src_ipos, src_mass, boxsize, softening,
                cellsize, window, G, interpret=False,
                want_pot=True, sch=SCH, blk=BLK):
    """Fused P2P over pre-gathered/packed per-block source tables.

    tgt_ipos [nb, blk, 3] uint32; src_ipos [nb, S, 3] uint32 with
    S % sch == 0; src_mass [nb, S] f32 (zero for masked lanes).
    window: gravity.shortrange.PolyWindow.
    Returns (acc [nb, blk, 3], pot [nb, blk] or None), G-multiplied.
    """
    nb, S = src_mass.shape
    assert S % sch == 0, (S, sch)
    nrows = S // sch
    # window.xmax may be a traced array (window is a jit argument):
    # keep it symbolic instead of float()ing it.
    inv_cellxmax = (1.0 / (cellsize
                           * window.xmax.astype(jnp.float32))
                    ).astype(jnp.float32)
    scal = jnp.stack([jnp.float32(boxsize / float(POS_SCALE)),
                      jnp.float32(softening), inv_cellxmax,
                      jnp.float32(G)])
    tx = tgt_ipos[:, :, 0].reshape(nb, 1, blk)
    ty = tgt_ipos[:, :, 1].reshape(nb, 1, blk)
    tz = tgt_ipos[:, :, 2].reshape(nb, 1, blk)
    sx = src_ipos[:, :, 0].reshape(nb, nrows, sch)
    sy = src_ipos[:, :, 1].reshape(nb, nrows, sch)
    sz = src_ipos[:, :, 2].reshape(nb, nrows, sch)
    sm = src_mass.reshape(nb, nrows, sch)

    tspec = pl.BlockSpec((1, 1, blk), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nrows, sch), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((1, blk, 3), lambda b, *_: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((nb, blk, 3), jnp.float32)]
    if want_pot:
        out_specs.append(pl.BlockSpec((1, 8, blk),
                                      lambda b, *_: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nb, 8, blk),
                                              jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[tspec, tspec, tspec, sspec, sspec, sspec, sspec],
        out_specs=tuple(out_specs),
    )
    out = pl.pallas_call(
        _make_kernel(want_pot, sch, blk),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(scal, window.cf, window.cp, tx, ty, tz, sx, sy, sz, sm)
    if want_pot:
        return out[0], out[1][:, 0, :]
    return out[0], None
