"""On-device connected components over padded edge lists.

The reference hops to CPU scipy for CC
(/root/reference/pcdet/models/model_utils/graph_utils.py:40-53). On TPU we
run iterative min-label propagation with pointer jumping (a.k.a. label
hooking + path compression), entirely inside jit: O(log N) rounds on typical
radius graphs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def connected_components(e_src, e_dst, num_nodes, e_mask=None, max_iters=64):
    """Label connected components of an undirected graph.

    Args:
        e_src, e_dst: [E] int32 endpoints (direction irrelevant); padded
            edges may use -1 or be masked out with ``e_mask``.
        num_nodes: static int — number of nodes N (padded nodes allowed;
            isolated nodes keep their own label).
        e_mask: [E] bool or None.
        max_iters: safety bound on propagation rounds.

    Returns:
        labels: [N] int32 — smallest reachable node id per node. Use
        :func:`compact_labels` for dense 0..C-1 component ids.
    """
    e = e_src.shape[0]
    if e_mask is None:
        e_mask = (e_src >= 0) & (e_dst >= 0)
    else:
        e_mask = e_mask & (e_src >= 0) & (e_dst >= 0)
    src = jnp.where(e_mask, e_src, 0).astype(jnp.int32)
    dst = jnp.where(e_mask, e_dst, 0).astype(jnp.int32)

    labels0 = jnp.arange(num_nodes, dtype=jnp.int32)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        ls = labels[src]
        ld = labels[dst]
        m = jnp.minimum(ls, ld)
        # hook: every node adopts the min label among itself and its edges
        new = labels
        new = new.at[src].min(jnp.where(e_mask, m, jnp.int32(2**31 - 1)))
        new = new.at[dst].min(jnp.where(e_mask, m, jnp.int32(2**31 - 1)))
        # pointer jumping: compress label chains (N-sized gathers are cheap
        # next to the E-sized hook, so jump aggressively to cut rounds)
        new = new[new]
        new = new[new]
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), 0))
    return labels


@functools.partial(jax.jit, static_argnames=("n_pull", "max_iters"))
def connected_components_knn(idx, mask, n_pull=2, max_iters=64):
    """Connected components straight from a kNN/radius neighbor table.

    Args:
        idx: [N, K] int32 neighbor ids of node n (row n), -1/masked allowed.
        mask: [N, K] bool.

    Per round: ``n_pull`` pull steps (each node adopts the min label over
    its own neighbor list — pure [N, K] gathers) followed by one push step
    (neighbors adopt my label — a single scatter-min), with pointer jumping
    after each. Pulls cover the forward edge direction at gather speed, so
    the expensive scatter only has to carry labels across asymmetric-kNN
    pairs: ~3x faster than edge-list hooking at Waymo chunk sizes, and it
    uses BOTH edge directions (an (a, b) pair where only a lists b still
    merges), unlike a deduplicated undirected edge list built from one side.
    """
    n = idx.shape[0]
    big = jnp.int32(2 ** 31 - 1)
    idx_pad = jnp.where(mask, idx, n).astype(jnp.int32)  # scatter target pad row
    idx_g = jnp.where(mask, idx, 0).astype(jnp.int32)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = labels
        for _ in range(n_pull):
            ln = jnp.where(mask, new[idx_g], big)
            new = jnp.minimum(new, jnp.min(ln, axis=1))
            new = new[new]
            new = new[new]
        padded = jnp.concatenate([new, jnp.array([big], jnp.int32)])
        pushed = padded.at[idx_pad].min(new[:, None])
        new = jnp.minimum(new, pushed[:n])
        new = new[new]
        new = new[new]
        return new, jnp.any(new != labels), it + 1

    labels0 = jnp.arange(n, dtype=jnp.int32)
    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), 0))
    return labels


def compact_labels(labels, num_nodes=None, node_valid=None):
    """Relabel CC roots to dense component ids 0..C-1 (ordered by root id).

    Returns (component [N] int32, num_components traced int32). Invalid
    (padded) nodes get component -1.
    """
    n = labels.shape[0]
    if node_valid is None:
        node_valid = jnp.ones(n, dtype=bool)
    is_root = (labels == jnp.arange(n, dtype=jnp.int32)) & node_valid
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # dense id per root position
    comp = rank[labels]
    comp = jnp.where(node_valid, comp, -1)
    num_components = jnp.sum(is_root.astype(jnp.int32))
    return comp.astype(jnp.int32), num_components
