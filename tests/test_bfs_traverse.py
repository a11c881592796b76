"""Frontier (BFS) traversal vs the sequential sibling walk.

Both must emit the SAME sets of accepted monopole nodes and opened
leaves per block — the schedules differ, the tree logic must not.
"""

import numpy as np
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.ops.blockwalk import (block_traverse,
                                      block_traverse_bfs,
                                      make_blocks_from_tree)
from tests.test_tree import random_particles, BOX


def _setup(n=900, seed=7, nlevels=6, ncrit=8):
    pos, mass = random_particles(n, seed=seed, clustered=True)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    tree = build_octree(ipos, jnp.asarray(mass),
                        jnp.ones(n, bool), BOX,
                        nlevels=nlevels, ncrit=ncrit)
    bb_lo, bb_hi, tgt_idx, tgt_valid, nb = make_blocks_from_tree(
        tree, n, 64, BOX)
    return tree, bb_lo, bb_hi, nb, nlevels


def _sets(ids, counts):
    out = []
    ids = np.asarray(ids)
    counts = np.asarray(counts)
    for b in range(ids.shape[0]):
        out.append(frozenset(ids[b, :counts[b]].tolist()))
    return out


def test_bfs_matches_walk_gravity():
    tree, bb_lo, bb_hi, nb, nlevels = _setup()
    cell = BOX / 32
    aold = jnp.full(nb, 1e-3, jnp.float32)
    rad = jnp.zeros(nb, jnp.float32)
    kw = dict(boxsize=BOX, rcut=6.0 * cell, bh2=0.175 ** 2,
              use_bh=0, maxi=2048, maxl=1024, mode="gravity")
    l_dfs = block_traverse(tree, bb_lo, bb_hi, rad, aold, **kw)
    l_bfs, ovf = block_traverse_bfs(tree, bb_lo, bb_hi, rad, aold,
                                    nlevels=nlevels, **kw)
    assert not bool(ovf)
    assert not bool(jnp.any(l_dfs.overflow))
    np.testing.assert_array_equal(np.asarray(l_bfs.n_nodes),
                                  np.asarray(l_dfs.n_nodes))
    np.testing.assert_array_equal(np.asarray(l_bfs.n_leaves),
                                  np.asarray(l_dfs.n_leaves))
    assert _sets(l_bfs.node_ids, l_bfs.n_nodes) == \
        _sets(l_dfs.node_ids, l_dfs.n_nodes)
    assert _sets(l_bfs.leaf_ids, l_bfs.n_leaves) == \
        _sets(l_dfs.leaf_ids, l_dfs.n_leaves)
    # leaf lists come back pstart-sorted (refined packing invariant)
    pst = np.asarray(tree.pstart)
    lids = np.asarray(l_bfs.leaf_ids)
    for b in range(lids.shape[0]):
        k = int(np.asarray(l_bfs.n_leaves)[b])
        if k > 1:
            assert (np.diff(pst[lids[b, :k]]) > 0).all()


def test_bfs_matches_walk_neighbor():
    tree, bb_lo, bb_hi, nb, nlevels = _setup(seed=8)
    rad = jnp.full(nb, BOX / 24, jnp.float32)
    aold = jnp.zeros(nb, jnp.float32)
    kw = dict(boxsize=BOX, rcut=0.0, bh2=0.0, use_bh=1,
              maxi=8, maxl=1024, mode="neighbor")
    l_dfs = block_traverse(tree, bb_lo, bb_hi, rad, aold, **kw)
    l_bfs, ovf = block_traverse_bfs(tree, bb_lo, bb_hi, rad, aold,
                                    nlevels=nlevels, **kw)
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(l_bfs.n_leaves),
                                  np.asarray(l_dfs.n_leaves))
    assert _sets(l_bfs.leaf_ids, l_bfs.n_leaves) == \
        _sets(l_dfs.leaf_ids, l_dfs.n_leaves)
