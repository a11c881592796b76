"""Instrument the blocked gravity path at the bench config.

Reports, for 128^3 clustered (or INSTR_SIDE^3):
  * per-step phase times: PM, tree build, traversal, dense eval
  * per-block list stats: n_nodes, n_leaves, actual packed sources
  * simulated sub-block MAC refinement: how many of the union list's
    leaves each 16/32-target sub-block would (a) drop (beyond rcut),
    (b) accept as monopole, (c) open for P2P — and the packed P2P
    pairs/target that remain.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/instr_grav.py
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

from bench import _clustered
from shenqi_tpu.gravity.pm import PMConfig, pm_forces
from shenqi_tpu.gravity.shortrange import ShortRangeParams
from shenqi_tpu.gravity.shortrange_blocked import (
    treegrav_blocked, _device_blocks_and_traverse, _next_pow2)
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.ops.blockwalk import auto_block_level
from shenqi_tpu.core.particles import float_to_ipos, POS_SCALE

side = int(os.environ.get("INSTR_SIDE", 128))
box = 50000.0
pos = _clustered(side, box)
n = len(pos)
nmesh = 2 * side
ipos = jnp.asarray(float_to_ipos(pos, box))
mass = jnp.full(n, 1.0, jnp.float32)
cellsize = box / nmesh
cfg = PMConfig(nmesh=nmesh, boxsize=box, G=43007.1, asmth=1.5)
sp = ShortRangeParams(boxsize=box, cellsize=cellsize,
                      rcut=6 * cellsize, asmth=1.5, use_bh=1,
                      softening=box / side / 30 * 2.8, G=43007.1)
auto_lv = max(6, int(np.ceil(np.log(max(n, 8) / 16) / np.log(8))) + 3)
nlevels = int(os.environ.get("BENCH_TREE_LEVELS", auto_lv))
maxi = int(os.environ.get("BENCH_MAXI", 1024))
maxl = int(os.environ.get("BENCH_MAXL", 512))
blk = 128

print(f"n={n} nlevels={nlevels} maxi={maxi} maxl={maxl}", flush=True)

def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s} {dt*1e3:10.1f} ms", flush=True)
    return out, dt

# ---- phase timings ----
(treeo, t_tree) = timeit("tree build", lambda: build_octree(
    ipos, mass, mass > 0, box, nlevels=nlevels, ncrit=32))
(accpm, t_pm) = timeit("pm forces", lambda: pm_forces(
    ipos, mass, cfg, want_potential=False)[0])

# seed oldacc with a strict-BH first pass
tier_cache, caps_cache = {}, {}
acc0, _, _ = treegrav_blocked(
    treeo, jnp.zeros(n, jnp.float32), sp, None, n_targets=n,
    block=blk, maxi=maxi, maxl=maxl, ncrit=32, blocking="device",
    tier_cache=tier_cache, caps_cache=caps_cache, want_pot=False)
oldacc = jnp.linalg.norm(accpm + acc0, axis=-1) / jnp.float32(sp.G)
jax.block_until_ready(oldacc)
sp_rel = sp._replace(use_bh=0)
maxi_g = max(maxi, caps_cache.get("maxi", 0))
maxl_g = max(maxl, caps_cache.get("maxl", 0))

T = n
level = auto_block_level(T, blk)
nb = _next_pow2((T + blk - 1) // blk + max(T // (2 * blk), 1))
print(f"block level={level} nb={nb} maxi_g={maxi_g} maxl_g={maxl_g}",
      flush=True)

def trav():
    return _device_blocks_and_traverse(
        treeo, oldacc, jnp.zeros(0, bool), sp_rel, T, blk, level, nb,
        maxi_g, maxl_g, False)

(tr_out, t_trav) = timeit("blocks+traverse", trav)
tgt_idx, tgt_valid, lists, order_b, diag = tr_out
print("diag [bovf,wovf,max_nn,max_nl,ni_small,nl_small]:",
      np.asarray(diag), flush=True)

def full():
    a, _, _ = treegrav_blocked(
        treeo, oldacc, sp_rel, None, n_targets=n, block=blk,
        maxi=maxi, maxl=maxl, ncrit=32, blocking="device",
        tier_cache=tier_cache, caps_cache=caps_cache, want_pot=False)
    return a

(_, t_full) = timeit("full shortrange (trav+eval)", full)
print(f"dense eval residual ~ {1e3*(t_full - t_trav):.1f} ms",
      flush=True)

# ---- host analysis ----
nn = np.asarray(lists.n_nodes)
nl = np.asarray(lists.n_leaves)
node_ids = np.asarray(lists.node_ids)
leaf_ids = np.asarray(lists.leaf_ids)
tgt_idx_h = np.asarray(tgt_idx)
tgt_valid_h = np.asarray(tgt_valid)
pcount = np.asarray(treeo.pcount)
pstart = np.asarray(treeo.pstart)
cofm = np.asarray(treeo.cofm)
nmassa = np.asarray(treeo.mass)
nlen = np.asarray(treeo.length)
ipos_s = np.asarray(treeo.ipos_s)
oldacc_h = np.asarray(oldacc)[np.asarray(treeo.order)]

occ = tgt_valid_h.sum(1)
live = occ > 0
print(f"blocks: {nb} live {live.sum()} lane occupancy "
      f"mean {occ[live].mean():.1f}", flush=True)
for name, arr in [("n_nodes", nn[live]), ("n_leaves", nl[live])]:
    q = np.percentile(arr, [50, 87.5, 99, 100])
    print(f"{name}: mean {arr.mean():.0f} p50 {q[0]:.0f} "
          f"p87.5 {q[1]:.0f} p99 {q[2]:.0f} max {q[3]:.0f}",
          flush=True)

safe_leaf = np.maximum(leaf_ids, 0)
lp = np.where(leaf_ids >= 0, pcount[safe_leaf], 0)
lane = np.arange(maxl_g)[None, :] < nl[:, None]
lp = np.where(lane, lp, 0)
src_tot = lp.sum(1)
print(f"actual sources/block: mean {src_tot[live].mean():.0f} "
      f"p87.5 {np.percentile(src_tot[live], 87.5):.0f} "
      f"max {src_tot.max()}  (padded = n_leaves*32: mean "
      f"{(nl[live]*32).mean():.0f})", flush=True)
print(f"leaf occupancy mean "
      f"{lp.sum()/np.maximum((nl[live]*32).sum(),1):.2f}", flush=True)

# current per-target cost with the production tier split (7/8 small)
t2 = nb // 8
ordb = np.argsort(nl)
small = ordb[:nb - t2]
ni_small = _next_pow2(int(nn[small].max()) + 1)
nl_small = _next_pow2(int(nl[small].max()) + 1)
cur_small = ni_small + nl_small * 32
cur_big = maxi_g + maxl_g * 32
frac_small = occ[small].sum() / occ.sum()
cur = frac_small * cur_small + (1 - frac_small) * cur_big
print(f"CURRENT pairs/target (tiered, padded): {cur:.0f} "
      f"(small {cur_small}, big {cur_big})", flush=True)

# ---- sub-block refinement simulation ----
err = sp_rel.err_tol_force_acc
rcut = sp.rcut
to_f = box / float(POS_SCALE)

for SUB in (16, 32):
    nsub = blk // SUB
    # sub-block bboxes + aold
    tp = ipos_s[np.clip(tgt_idx_h, 0, n - 1)].astype(np.float64) * to_f
    tv = tgt_valid_h
    tp_s = tp.reshape(nb, nsub, SUB, 3)
    tv_s = tv.reshape(nb, nsub, SUB)
    big = 1e30
    lo = np.where(tv_s[..., None], tp_s, big).min(2)     # [nb,nsub,3]
    hi = np.where(tv_s[..., None], tp_s, -big).max(2)
    ao = np.where(tv_s, err * oldacc_h[np.clip(tgt_idx_h, 0, n - 1)
                                       ].reshape(nb, nsub, SUB), big)
    ao = ao.min(2)                                        # [nb,nsub]
    sub_live = tv_s.any(2)

    lc = cofm[safe_leaf]         # [nb, maxl, 3]
    lm = np.where(lane, nmassa[safe_leaf], 0.0)
    ll = nlen[safe_leaf]
    lcen = np.asarray(treeo.center)[safe_leaf]

    # bbox->point min-image distance, per sub-block x leaf
    drop_ctr = np.zeros(()); mono_ctr = np.zeros(()); p2p_ctr = np.zeros(())
    p2p_pairs = 0.0; tgt_ct = 0.0
    CH = 256
    for b0 in range(0, nb, CH):
        b1 = min(b0 + CH, nb)
        c = 0.5 * (lo[b0:b1, :, None, :] + hi[b0:b1, :, None, :])
        h = 0.5 * (hi[b0:b1, :, None, :] - lo[b0:b1, :, None, :])
        d = lc[b0:b1, None, :, :] - c
        d -= box * np.round(d / box)
        dbox = np.maximum(np.abs(d) - h, 0.0)         # [C,nsub,maxl,3]
        r2min = (dbox ** 2).sum(-1)
        dc = lcen[b0:b1, None, :, :] - c
        dc -= box * np.round(dc / box)
        dbc = np.maximum(np.abs(dc) - h, 0.0)
        dcell = np.maximum(dbc - 0.5 * ll[b0:b1, None, :, None], 0.0)
        drop = (dcell ** 2).sum(-1) > rcut * rcut
        open_acc = (lm[b0:b1, None, :] * ll[b0:b1, None, :] ** 2
                    > np.maximum(r2min, 1e-35) ** 2
                    * ao[b0:b1, :, None])
        inside = (dbc < 0.6 * ll[b0:b1, None, :, None]).all(-1)
        opn = (open_acc | inside) & ~drop
        mono = ~drop & ~opn
        vmask = lane[b0:b1, None, :] & sub_live[b0:b1, :, None]
        drop_ctr = drop_ctr + (drop & vmask).sum()
        mono_ctr = mono_ctr + (mono & vmask).sum()
        p2p_ctr = p2p_ctr + (opn & vmask).sum()
        subocc = tv_s[b0:b1].sum(2)                  # [C,nsub]
        p2p_pairs += ((opn & vmask) * lp[b0:b1, None, :]).sum(1).sum()
        tgt_ct += subocc.sum()
    tot = drop_ctr + mono_ctr + p2p_ctr
    nlive_sub = sub_live.sum()
    print(f"SUB={SUB}: of union leaf list per sub-block: "
          f"drop {drop_ctr/tot:.2f} mono {mono_ctr/tot:.2f} "
          f"p2p {p2p_ctr/tot:.2f}", flush=True)
    # per-target: monopoles (nodes + leaf monos) + packed p2p
    mono_per_sub = mono_ctr / nlive_sub
    p2p_src_per_sub = p2p_pairs / nlive_sub
    # packed p2p pairs per target = p2p sources of its sub-block
    node_per_tgt = frac_small * ni_small + (1 - frac_small) * maxi_g
    est = node_per_tgt + mono_per_sub + p2p_src_per_sub
    print(f"  est pairs/target after refine: nodes {node_per_tgt:.0f} "
          f"+ leaf-mono {mono_per_sub:.0f} + packed p2p "
          f"{p2p_src_per_sub:.0f} = {est:.0f}  "
          f"(vs current {cur:.0f}, {cur/est:.1f}x)", flush=True)
