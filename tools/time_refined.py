"""Time old blocked vs refined short-range engines on the TPU."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
from functools import partial
import jax.numpy as jnp

from bench import _clustered
from shenqi_tpu.gravity.pm import PMConfig, pm_forces
from shenqi_tpu.gravity.shortrange import ShortRangeParams
from shenqi_tpu.gravity.shortrange_blocked import treegrav_blocked
from shenqi_tpu.gravity.shortrange_refined import treegrav_refined
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.core.particles import float_to_ipos

side = int(os.environ.get("INSTR_SIDE", 64))
which = os.environ.get("WHICH", "both")
sub = int(os.environ.get("SUB", 32))
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
maxi = 1024
maxl = 512
print(f"n={n}", flush=True)

tree = build_octree(ipos, mass, mass > 0, box, nlevels=nlevels,
                    ncrit=32)
accpm, _, _ = pm_forces(ipos, mass, cfg, want_potential=False)
tc0, cc0 = {}, {}
acc0, _, _ = treegrav_blocked(tree, jnp.zeros(n, jnp.float32), sp,
                              None, n_targets=n, block=128, maxi=maxi,
                              maxl=maxl, ncrit=32, blocking="device",
                              tier_cache=tc0, caps_cache=cc0,
                              want_pot=False)
oldacc = jnp.linalg.norm(accpm + acc0, axis=-1) / jnp.float32(sp.G)
jax.block_until_ready(oldacc)
sp_rel = sp._replace(use_bh=0)
from shenqi_tpu.gravity.window import window_polynomials
wt = window_polynomials(sp.asmth) if os.environ.get("WT", "1") != "0" \
    else None


def timeit(label, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:24s} {dt*1e3:10.1f} ms "
          f"({n/dt:.3g} part/s)", flush=True)


if which in ("both", "old"):
    tc, cc = {}, {}
    def old():
        a, _, _ = treegrav_blocked(
            tree, oldacc, sp_rel, wt, n_targets=n, block=128,
            maxi=maxi, maxl=maxl, ncrit=32, blocking="device",
            tier_cache=tc, caps_cache=cc, want_pot=False)
        return a
    timeit("blocked (old)", old)

trav_kind = os.environ.get("TRAVERSAL")
eng = os.environ.get("ENGINE")

if which in ("both", "refined"):
    tc2, cc2 = {}, {}
    def ref():
        a, _, _ = treegrav_refined(
            tree, oldacc, sp_rel, wt, n_targets=n, block=128,
            maxi=maxi, maxl=maxl, ncrit=32, sub=sub,
            tier_cache=tc2, caps_cache=cc2, want_pot=False,
            traversal=trav_kind, engine=eng)
        return a
    timeit(f"refined sub={sub} trav={trav_kind} eng={eng}", ref)
    a_old, _, _ = treegrav_blocked(
        tree, oldacc, sp_rel, wt, n_targets=n, block=128,
        maxi=maxi, maxl=maxl, ncrit=32, blocking="device",
        tier_cache={}, caps_cache={}, want_pot=False)
    a_new, _, _ = treegrav_refined(
        tree, oldacc, sp_rel, wt, n_targets=n, block=128,
        maxi=maxi, maxl=maxl, ncrit=32, sub=sub,
        tier_cache=tc2, caps_cache=cc2, want_pot=False)
    d = np.linalg.norm(np.asarray(a_new) - np.asarray(a_old), axis=1)
    s = np.median(np.linalg.norm(np.asarray(a_old), axis=1))
    print(f"engine diff p50 {np.percentile(d/s,50):.2e} "
          f"p99 {np.percentile(d/s,99):.2e} max {(d/s).max():.2e}",
          flush=True)

if which == "detail":
    from shenqi_tpu.gravity.shortrange_refined import (
        _blocks_traverse_count, _refined_eval, _next_pow2)
    from shenqi_tpu.ops.blockwalk import auto_block_level
    T = n
    level = auto_block_level(T, 128)
    nb = _next_pow2((T + 127) // 128 + max(T // 256, 1))
    from shenqi_tpu.gravity.shortrange_refined import _infer_nlevels
    tk = trav_kind or "walk"
    nlv = _infer_nlevels(tree.center.shape[0], n) if tk == "bfs" else 0
    def trav():
        return _blocks_traverse_count(
            tree, oldacc, jnp.zeros(0, bool), sp_rel, T, 128, level,
            nb, maxi, maxl, False, sub, 32, traversal=tk,
            fcap=int(os.environ.get("FCAP", 2048)), nlevels=nlv)
    out = trav(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = trav(); jax.block_until_ready(out)
    print(f"traverse+count {(time.perf_counter()-t0)/3*1e3:.1f} ms",
          flush=True)
    (tgt_idx, tgt_valid, lists, keepbits, leaf_meta, order_s, diag,
     qtab) = out
    d = [int(x) for x in np.asarray(diag)]
    print("diag", d, flush=True)
    nbs = nb * (128 // sub)
    from shenqi_tpu.gravity.shortrange_refined import (_round_cap,
                                                       tier_bounds)
    bounds = tier_bounds(nbs)
    pcaps = []
    hi = 0
    for c in d[4:8]:
        hi = max(hi, _round_cap(c + 1))
        pcaps.append(hi)
    print(f"nbs={nbs} tier quad counts {d[4:8]} pcaps {pcaps}",
          flush=True)
    engv = eng or "xla"
    lo = 0
    for ti, (b, cap) in enumerate(zip(bounds, pcaps)):
        ns = b - lo
        if ns <= 0:
            lo = b
            continue
        selq = jnp.sort(order_s[lo:b])
        lo = b
        def ev():
            return _refined_eval(tree, lists, tgt_idx, tgt_valid,
                                 keepbits, selq, qtab, leaf_meta,
                                 sp_rel, wt, 32, sub,
                                 cap, ns, 128,
                                 batch=int(os.environ.get("BBS",
                                                          1024)),
                                 has_nodes=d[2] > 0,
                                 want_pot=False, engine=engv)
        o = ev(); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(3):
            o = ev(); jax.block_until_ready(o)
        print(f"eval t{ti} (qcap {cap}, {ns} subs) "
              f"{(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

if which == "parts":
    # piecewise timing of the traverse+count program's stages
    from shenqi_tpu.gravity.shortrange_refined import (
        _next_pow2, build_quad_table, packed_counts)
    from shenqi_tpu.ops.blockwalk import (auto_block_level,
                                          make_blocks_device,
                                          block_traverse)
    T = n
    block = 128
    level = auto_block_level(T, block)
    nb = _next_pow2((T + 127) // 128 + max(T // 256, 1))

    def timeto(label, fn, reps=3):
        out = fn(); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(); jax.block_until_ready(out)
        print(f"{label:18s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms",
              flush=True)
        return out

    tgt_rows = jnp.arange(n, dtype=jnp.int32)
    tvalid = tree.mass_s > 0
    mk = jax.jit(make_blocks_device, static_argnums=(3, 4, 5))
    out = timeto("make_blocks", lambda: mk(
        tree, tgt_rows, tvalid, block, level, nb, sp.boxsize))
    bb_lo, bb_hi, tgt_idx, tgt_valid, b_ovf = out
    aold = jnp.full(nb, 1e30, jnp.float32)
    maxl2 = int(os.environ.get("MAXL2", 1024))
    bt = partial(block_traverse, maxi=1024, maxl=maxl2,
                 mode="gravity")
    out2 = timeto("walk", lambda: bt(
        tree, bb_lo, bb_hi, jnp.zeros(nb, jnp.float32), aold,
        sp.boxsize, sp.rcut, 0.175 ** 2, 0))
    lists = out2
    out3 = timeto("quad_build", lambda: build_quad_table(tree, 32))
    qtab, qstart, qcn = out3
    tgt_u32 = tree.ipos_s[tgt_idx.reshape(-1)].reshape(nb, block, 3)
    pk = jax.jit(packed_counts, static_argnums=(5, 6))
    timeto("packed_counts", lambda: pk(
        tree, lists, tgt_u32, tgt_valid, sp_rel, 32, 32, qstart,
        qcn))
    timeto("tree_build", lambda: build_octree(
        ipos, mass, mass > 0, box, nlevels=nlevels, ncrit=32))

if which == "stencil":
    from shenqi_tpu.gravity.stencil import stencilgrav
    tc3, cc3 = {}, {}
    def sten():
        a, _, _ = stencilgrav(ipos, mass, sp_rel, wt, sub=sub,
                              tier_cache=tc3, caps_cache=cc3)
        return a
    timeit("stencil", sten)
    a_old, _, _ = treegrav_blocked(
        tree, oldacc, sp_rel, wt, n_targets=n, block=128,
        maxi=maxi, maxl=maxl, ncrit=32, blocking="device",
        tier_cache={}, caps_cache={}, want_pot=False)
    a_new = sten()
    d = np.linalg.norm(np.asarray(a_new) - np.asarray(a_old), axis=1)
    s = np.median(np.linalg.norm(np.asarray(a_old), axis=1))
    print(f"stencil-vs-blocked p50 {np.percentile(d/s,50):.2e} "
          f"p99 {np.percentile(d/s,99):.2e}", flush=True)

if which == "stendetail":
    # piecewise timing of the stencil engine's stages
    from shenqi_tpu.gravity import stencil as st
    from shenqi_tpu.gravity.shortrange_refined import (_round_cap,
                                                       _next_pow2,
                                                       tier_bounds)
    W = int(os.environ.get("W", 7))
    k = int(np.ceil(np.log2(sp.boxsize / sp.rcut)))
    k = min(k, 10)
    CAND = _next_pow2(W ** 3)
    T = ((n + sub - 1) // sub) * sub
    nbs = T // sub

    def timeto(label, fn, reps=3):
        out = fn(); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(); jax.block_until_ready(out)
        print(f"{label:24s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms",
              flush=True)
        return out

    TBC = _next_pow2(T // sub + max(T // (2 * sub), 64))
    while True:
        out = timeto("stencil_count", lambda: st._stencil_count(
            ipos, mass, jnp.zeros(0, bool), sp_rel, k, sub, W, CAND,
            T, False, TBC))
        d = [int(x) for x in np.asarray(out[-1])]
        if d[6] <= TBC:
            break
        TBC = _next_pow2(d[6])
    (order, ipos_s, qtab, qmeta, tgt_idx, tgt_valid, qst, qcn,
     qst_n, qcn_n, order_s, cover, diag) = out
    nbs = TBC
    print(f"diag tiers={d[:4]} n_cover={d[4]} cn_max={d[5]} "
          f"tb={d[6]}/{TBC}", flush=True)
    pcaps = []
    hi = 0
    for c in d[:4]:
        hi = max(hi, _round_cap(c + 1))
        pcaps.append(hi)
    ncap = _round_cap(d[5] + 1)
    print(f"nbs={nbs} pcaps={pcaps} ncap={ncap}", flush=True)
    lo = 0
    for ti, (b, cap) in enumerate(zip(tier_bounds(nbs), pcaps)):
        ns = b - lo
        if ns <= 0:
            lo = b
            continue
        selq = jnp.sort(order_s[lo:b])
        lo = b
        timeto(f"eval t{ti} (q{cap}, {ns})",
               lambda: st._stencil_eval(
                   ipos_s, qtab, tgt_idx, tgt_valid, qst, qcn, selq,
                   sp_rel, wt, sub, cap, ns, batch=1024,
                   want_pot=False, engine="xla", qst_n=qst_n,
                   qcn_n=qcn_n, ncap=ncap))
