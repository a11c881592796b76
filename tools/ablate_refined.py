"""Ablate the refined-eval pipeline: which stage eats the time?

Builds one realistic batch worth of inputs (from a real traversal at
INSTR_SIDE^3) and times jitted variants:
  dense   : pair pass only, pre-packed random sources
  pack    : classify + search + source gather only
  search  : binary search only
  classify: keep-mask only
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from bench import _clustered
from shenqi_tpu.gravity.shortrange import ShortRangeParams, \
    spline_force, short_range_window
from shenqi_tpu.gravity.window import window_polynomials
from shenqi_tpu.gravity.shortrange_refined import (
    _blocks_traverse_count, _sub_bbox, _keep_mask, _leaf_pcount,
    _next_pow2)
from shenqi_tpu.ops.blockwalk import auto_block_level
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.core.particles import float_to_ipos, POS_SCALE

side = int(os.environ.get("INSTR_SIDE", 64))
box = 50000.0
pos = _clustered(side, box)
n = len(pos)
nmesh = 2 * side
ipos = jnp.asarray(float_to_ipos(pos, box))
mass = jnp.full(n, 1.0, jnp.float32)
cellsize = box / nmesh
sp = ShortRangeParams(boxsize=box, cellsize=cellsize,
                      rcut=6 * cellsize, asmth=1.5, use_bh=0,
                      softening=box / side / 30 * 2.8, G=43007.1)
wt = window_polynomials(sp.asmth)
auto_lv = max(6, int(np.ceil(np.log(max(n, 8) / 16) / np.log(8))) + 3)
tree = build_octree(ipos, mass, mass > 0, box, nlevels=auto_lv,
                    ncrit=32)
oldacc = jnp.full(n, 100.0, jnp.float32)

T, block, sub, ncrit = n, 128, 32, 32
level = auto_block_level(T, block)
nb = _next_pow2((T + 127) // 128 + max(T // 256, 1))
(tgt_idx, tgt_valid, lists, _kb, order_s, diag, _qt, _qs,
 _qc) = _blocks_traverse_count(
    tree, oldacc, jnp.zeros(0, bool), sp, T, block, level, nb,
    1024, 512, False, sub, ncrit)
jax.block_until_ready(tgt_idx)
print("diag", [int(x) for x in np.asarray(diag)], flush=True)

nsub = block // sub
nbs = nb * nsub
bbs = int(os.environ.get("BBS", 1024))
pcap = 2048
sel = jnp.sort(order_s[:bbs])
rcut2 = sp.rcut * sp.rcut
to_f = jnp.float32(box / POS_SCALE)
PCH = 512

b = sel // nsub
s = sel % nsub
leaf_ids = lists.leaf_ids[b]
n_leaves = lists.n_leaves[b]
rows = (b[:, None] * block + s[:, None] * sub
        + jnp.arange(sub, dtype=jnp.int32)[None, :])
tidx = tgt_idx.reshape(-1)[rows]
tval = tgt_valid.reshape(-1)[rows]
tgt = tree.ipos_s[tidx]
jax.block_until_ready(tgt)
ML = leaf_ids.shape[1]


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:14s} {dt*1e3:8.1f} ms", flush=True)
    return out


@jax.jit
def classify(tgt, tval, leaf_ids, n_leaves):
    lo, hi, live = _sub_bbox(tgt, tval, sub, box)
    return _keep_mask(tree, leaf_ids, n_leaves, lo, hi, live, box,
                      rcut2)[:, 0, :]


lk = timeit("classify", classify, tgt, tval, leaf_ids, n_leaves)


@jax.jit
def pack(lk, leaf_ids):
    pc = _leaf_pcount(tree, leaf_ids, ncrit)
    cnt = jnp.where(lk, pc, 0)
    S = ML
    cum = jnp.cumsum(cnt, axis=1)
    total = cum[:, -1]
    cumf = cum.reshape(-1)
    cntf = cnt.reshape(-1)
    rowoff = (jnp.arange(bbs, dtype=jnp.int32) * S)[:, None]
    p = jnp.arange(pcap, dtype=jnp.int32)[None, :]
    seg = jnp.zeros((bbs, pcap), jnp.int32)
    step = 1 << (S - 1).bit_length()
    while step:
        cand = seg + step
        cval = cumf[rowoff + jnp.minimum(cand, S) - 1]
        seg = jnp.where((cand <= S) & (cval <= p), cand, seg)
        step //= 2
    segc = jnp.minimum(seg, S - 1)
    excl = cumf[rowoff + segc] - cntf[rowoff + segc]
    j = p - excl
    valid = p < total[:, None]
    leaff = leaf_ids.reshape(-1)
    rowml = (jnp.arange(bbs, dtype=jnp.int32) * ML)[:, None]
    leaf_id = jnp.maximum(leaff[rowml + segc], 0)
    pidx = jnp.clip(tree.pstart[leaf_id] + j, 0, n - 1)
    spos = tree.ipos_s[pidx]
    smass = jnp.where(valid, tree.mass_s[pidx], 0.0)
    return spos, smass


spos, smass = timeit("pack", pack, lk, leaf_ids)


@jax.jit
def search_only(lk, leaf_ids):
    pc = _leaf_pcount(tree, leaf_ids, ncrit)
    cnt = jnp.where(lk, pc, 0)
    S = ML
    cum = jnp.cumsum(cnt, axis=1)
    cumf = cum.reshape(-1)
    rowoff = (jnp.arange(bbs, dtype=jnp.int32) * S)[:, None]
    p = jnp.arange(pcap, dtype=jnp.int32)[None, :]
    seg = jnp.zeros((bbs, pcap), jnp.int32)
    step = 1 << (S - 1).bit_length()
    while step:
        cand = seg + step
        cval = cumf[rowoff + jnp.minimum(cand, S) - 1]
        seg = jnp.where((cand <= S) & (cval <= p), cand, seg)
        step //= 2
    return seg


timeit("search", search_only, lk, leaf_ids)


@jax.jit
def dense(tgt, spos, smass):
    def chunk(carry, c):
        acc = carry
        sl = jax.lax.dynamic_slice_in_dim(spos, c * PCH, PCH, axis=1)
        sm = jax.lax.dynamic_slice_in_dim(smass, c * PCH, PCH, axis=1)
        d = sl[:, None, :, :] - tgt[:, :, None, :]
        dx = jax.lax.bitcast_convert_type(
            d, jnp.int32).astype(jnp.float32) * to_f
        r2 = jnp.sum(dx * dx, axis=-1)
        fac, _ = spline_force(r2, sm[:, None, :], sp.softening)
        r = jnp.sqrt(r2)
        fw, _ = short_range_window(r, sp.cellsize, sp.asmth, wt)
        acc = acc + jnp.sum(dx * (fac * fw)[..., None], axis=2)
        return acc, None

    acc0 = jnp.zeros((bbs, sub, 3), jnp.float32)
    acc, _ = jax.lax.scan(chunk, acc0, jnp.arange(pcap // PCH))
    return acc


timeit("dense", dense, tgt, spos, smass)


@jax.jit
def dense_erfc(tgt, spos, smass):
    def chunk(carry, c):
        acc = carry
        sl = jax.lax.dynamic_slice_in_dim(spos, c * PCH, PCH, axis=1)
        sm = jax.lax.dynamic_slice_in_dim(smass, c * PCH, PCH, axis=1)
        d = sl[:, None, :, :] - tgt[:, :, None, :]
        dx = jax.lax.bitcast_convert_type(
            d, jnp.int32).astype(jnp.float32) * to_f
        r2 = jnp.sum(dx * dx, axis=-1)
        fac, _ = spline_force(r2, sm[:, None, :], sp.softening)
        r = jnp.sqrt(r2)
        fw, _ = short_range_window(r, sp.cellsize, sp.asmth, None)
        acc = acc + jnp.sum(dx * (fac * fw)[..., None], axis=2)
        return acc, None

    acc0 = jnp.zeros((bbs, sub, 3), jnp.float32)
    acc, _ = jax.lax.scan(chunk, acc0, jnp.arange(pcap // PCH))
    return acc


timeit("dense_erfc", dense_erfc, tgt, spos, smass)
print(f"(per small tier: x{(nbs - nbs // 8) / bbs:.0f} batches)",
      flush=True)
