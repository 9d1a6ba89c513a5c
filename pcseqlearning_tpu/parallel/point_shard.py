"""Point-sharded neighbor search with ICI halo exchange — the multi-chip
path for whole-sequence point clouds.

The reference processes a 210-sweep sequence (~3e7 points) as ONE tensor on
one GPU (SURVEY §5 long-context scaling); the TPU upgrade path shards the
point table across chips and exchanges boundary halos so radius queries
stay local (SURVEY §5: "shard the point table across chips and implement
halo exchange for radius queries with ppermute over ICI").

Layout: points sort by x on host and split into D contiguous slabs of equal
count. Under shard_map each device extracts fixed-capacity boundary strips
(points within ``radius`` of its slab edges), `ppermute`s them to its ring
neighbors over ICI, builds the hash grid over local+halo points, and
queries its local points. Neighbor ids returned are GLOBAL row indices.

Ring wraparound halos (device 0 <-> D-1) are spatially distant by
construction (x-sorted slabs), so the exact distance test discards them.
Strips beyond ``halo_cap`` truncate (documented, like cell_cap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P


def shard_points_by_x(fxyz, num_shards, radius=None):
    """Host prep: x-sort and split into equal-count slabs.

    Returns (points [D, N_loc, 4], gids [D, N_loc], valid [D, N_loc]);
    ``gids[d, i]`` is the original row of each slot, -1 for padding.

    When ``radius`` is given, asserts every slab is wider than it: halos
    come only from immediate ring neighbors, so a slab thinner than the
    query radius would silently drop true neighbors two slabs away
    (ADVICE r2)."""
    n = len(fxyz)
    order = np.argsort(fxyz[:, 1], kind="stable").astype(np.int64)
    n_loc = -(-n // num_shards)
    pad = num_shards * n_loc - n
    if radius is not None and num_shards > 1 and n >= num_shards:
        xs = fxyz[order, 1]
        bounds = xs[[min(d * n_loc, n - 1) for d in range(num_shards)] + [n - 1]]
        widths = np.diff(bounds)
        if (widths <= radius).any():
            raise ValueError(
                f"x-slab widths {widths.tolist()} must all exceed the query "
                f"radius {radius}: dense regions make immediate-neighbor halo "
                "exchange incomplete — use fewer shards or width-based slabs"
            )
    fxyz_s = np.concatenate([fxyz[order], np.full((pad, fxyz.shape[1]), 1e8, fxyz.dtype)])
    gids = np.concatenate([order, np.full(pad, -1, np.int64)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return (
        fxyz_s.reshape(num_shards, n_loc, -1),
        gids.reshape(num_shards, n_loc).astype(np.int32),
        valid.reshape(num_shards, n_loc),
    )


def _compact_strip(points, ids, sel, cap):
    """Fixed-cap compaction of selected rows (order-free)."""
    n = points.shape[0]
    order = jnp.argsort(~sel)  # selected rows first
    take = order[:cap]
    return points[take], ids[take], sel[take]


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "k", "halo_cap", "cell_cap")
)
def sharded_radius_neighbors(points, gids, valid, radius, mesh, axis="dp",
                             k=16, halo_cap=4096, cell_cap=48):
    """Radius k-NN over an x-sharded point table.

    points [D, N_loc, 4] (frame, x, y, z); gids [D, N_loc] global row ids;
    valid [D, N_loc]. Returns (neighbor_gids [D, N_loc, k], dist2, mask,
    num_halo_truncated [D] — per-device count of boundary-strip points that
    exceeded ``halo_cap`` and were dropped from the exchanged halo) aligned
    to the sharded layout.
    """
    from ..ops import hash_graph

    D = mesh.shape[axis]
    if D == 1:
        # single-device mesh: the ring would return a device's own strips,
        # duplicating points into its grid (ADVICE r2) — plain local query
        idx, d2, mask = hash_graph.radius_graph(
            points[0], points[0], radius, k,
            ref_valid=valid[0], query_valid=valid[0], cell_cap=cell_cap,
        )
        n_loc = points.shape[1]
        out_gids = jnp.where(mask, gids[0][jnp.clip(idx, 0, n_loc - 1)], -1)
        return out_gids[None], d2[None], mask[None], jnp.zeros(1, jnp.int32)
    radius = jnp.asarray(radius, points.dtype)

    def local(pts, ids, val):
        pts, ids, val = pts[0], ids[0], val[0]
        x = pts[:, 1]
        big = jnp.asarray(1e8, pts.dtype)
        xmin = jnp.min(jnp.where(val, x, big))
        xmax = jnp.max(jnp.where(val, x, -big))
        left_sel = val & (x <= xmin + radius)
        right_sel = val & (x >= xmax - radius)
        n_trunc = (
            jnp.maximum(jnp.sum(left_sel.astype(jnp.int32)) - halo_cap, 0)
            + jnp.maximum(jnp.sum(right_sel.astype(jnp.int32)) - halo_cap, 0)
        )
        lp, li, lv = _compact_strip(pts, ids, left_sel, halo_cap)
        rp, ri, rv = _compact_strip(pts, ids, right_sel, halo_cap)

        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]
        # my right strip becomes the right neighbor's left halo, and vice
        # versa — two ppermutes over the ICI ring
        halo_from_left = tuple(jax.lax.ppermute(t, axis, fwd) for t in (rp, ri, rv))
        halo_from_right = tuple(jax.lax.ppermute(t, axis, bwd) for t in (lp, li, lv))

        all_pts = jnp.concatenate([pts, halo_from_left[0], halo_from_right[0]])
        all_ids = jnp.concatenate([ids, halo_from_left[1], halo_from_right[1]])
        all_val = jnp.concatenate([val, halo_from_left[2], halo_from_right[2]])

        grid = hash_graph.build_hash_grid(all_pts, radius, all_val)
        idx, d2, mask = hash_graph.radius_neighbors(
            grid, pts, radius, k, query_valid=val, cell_cap=cell_cap
        )
        n_all = all_pts.shape[0]
        out_gids = jnp.where(mask, all_ids[jnp.clip(idx, 0, n_all - 1)], -1)
        return out_gids[None], d2[None], mask[None], n_trunc[None]

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
    )(points, gids, valid)


def _rank_in_sorted(sorted_vals, queries):
    """Dense rank of each query in a sorted array (first-occurrence index
    compression): returns (rank [Q], found [Q])."""
    pos = jnp.searchsorted(sorted_vals, queries)
    pos = jnp.clip(pos, 0, sorted_vals.shape[0] - 1)
    found = sorted_vals[pos] == queries
    first = jnp.concatenate(
        [jnp.array([True]), sorted_vals[1:] != sorted_vals[:-1]]
    )
    dense = jnp.cumsum(first.astype(jnp.int32)) - 1
    return jnp.where(found, dense[pos], -1), found


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "k", "halo_cap", "cell_cap")
)
def sharded_connected_components(points, gids, valid, radius, mesh, axis="dp",
                                 k=16, halo_cap=4096, cell_cap=48):
    """Connected components of the radius graph over an x-sharded point
    table — the multi-chip realization of ClusterProposal's hot stage
    (SURVEY §5: "shard the point table across chips ... halo exchange for
    radius queries with ppermute over ICI").

    Two-level distributed CC (the classic local-CC + boundary-merge
    decomposition, laid out for SPMD):

    1. each device builds local+halo table (ring ``ppermute`` of boundary
       strips, as in :func:`sharded_radius_neighbors`), runs the fused
       kNN-table label propagation (`connected_components_knn`) over its
       WHOLE table, and converts root slots to global point ids;
    2. every strip/halo point emits an equivalence pair
       ``(gid, local_root_gid)``; pairs ``all_gather`` over the axis
       (4*halo_cap*D rows — tiny next to the point table) and every device
       runs the same replicated merge: compact the gid universe by
       sort + dense-rank, CC over the bipartite (point, root) pair graph,
       min-gid representative per merged component;
    3. each local point reroots through the merge table with a
       ``searchsorted`` lookup (components that never touch a slab
       boundary keep their local root).

    Every edge of the global radius graph is covered: an intra-slab edge is
    local on its home device; a cross-slab edge (u, v) has u inside v's
    boundary strip (slab width > radius, asserted host-side in
    ``shard_points_by_x``), so it is a local-halo edge on the other home
    device. The k-cap approximates the graph the same way the single-chip
    path does; with no truncation the partition equals the single-table CC
    exactly (tested in tests/test_multichip.py).

    Returns (root_gid [D, N_loc] int32 — global root point id per local
    point, -1 for padding; num_halo_truncated [D]).
    """
    from ..ops import connected_components as cc
    from ..ops import hash_graph

    D = mesh.shape[axis]
    if D == 1:
        idx, _, mask = hash_graph.radius_graph(
            points[0], points[0], radius, k,
            ref_valid=valid[0], query_valid=valid[0], cell_cap=cell_cap,
        )
        lab = cc.connected_components_knn(idx, mask)
        root = jnp.where(valid[0], gids[0][lab], -1).astype(jnp.int32)
        return root[None], jnp.zeros(1, jnp.int32)
    radius = jnp.asarray(radius, points.dtype)
    big = jnp.int32(2 ** 31 - 1)

    def local(pts, ids, val):
        pts, ids, val = pts[0], ids[0], val[0]
        n_loc = pts.shape[0]
        x = pts[:, 1]
        fbig = jnp.asarray(1e8, pts.dtype)
        xmin = jnp.min(jnp.where(val, x, fbig))
        xmax = jnp.max(jnp.where(val, x, -fbig))
        left_sel = val & (x <= xmin + radius)
        right_sel = val & (x >= xmax - radius)
        n_trunc = (
            jnp.maximum(jnp.sum(left_sel.astype(jnp.int32)) - halo_cap, 0)
            + jnp.maximum(jnp.sum(right_sel.astype(jnp.int32)) - halo_cap, 0)
        )
        lp, li, lv = _compact_strip(pts, ids, left_sel, halo_cap)
        rp, ri, rv = _compact_strip(pts, ids, right_sel, halo_cap)

        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]
        halo_l = tuple(jax.lax.ppermute(t, axis, fwd) for t in (rp, ri, rv))
        halo_r = tuple(jax.lax.ppermute(t, axis, bwd) for t in (lp, li, lv))

        all_pts = jnp.concatenate([pts, halo_l[0], halo_r[0]])
        all_ids = jnp.concatenate([ids, halo_l[1], halo_r[1]]).astype(jnp.int32)
        all_val = jnp.concatenate([val, halo_l[2], halo_r[2]])

        # 1. local CC over the whole local+halo table
        grid = hash_graph.build_hash_grid(all_pts, radius, all_val)
        idx, _, mask = hash_graph.radius_neighbors(
            grid, all_pts, radius, k, query_valid=all_val, cell_cap=cell_cap
        )
        lab = cc.connected_components_knn(idx, mask)
        root_gid = jnp.where(all_val, all_ids[lab], -1).astype(jnp.int32)

        # 2. boundary equivalence pairs: my own strips (their root HERE is
        # the home-side root) + received halos (their root here is the
        # remote-side root) -> (gid, root_gid), -1-padded
        n_halo = halo_l[2].shape[0] + halo_r[2].shape[0]
        strip_slots = jnp.concatenate([
            _compact_strip(jnp.arange(n_loc)[:, None], li * 0, left_sel, halo_cap)[0][:, 0],
            _compact_strip(jnp.arange(n_loc)[:, None], ri * 0, right_sel, halo_cap)[0][:, 0],
            jnp.arange(n_loc, n_loc + n_halo),
        ])
        strip_ok = jnp.concatenate([lv, rv, halo_l[2], halo_r[2]])
        pg = jnp.where(strip_ok, all_ids[strip_slots], -1)
        pr = jnp.where(strip_ok, root_gid[strip_slots], -1)
        pairs = jnp.stack([pg, pr], axis=1)  # [4H, 2]
        allp = jax.lax.all_gather(pairs, axis).reshape(-1, 2)  # [4H*D, 2]

        # 3. replicated merge over the small boundary graph
        pmask = allp[:, 0] >= 0
        vals = jnp.where(
            jnp.tile(pmask, 2), jnp.concatenate([allp[:, 0], allp[:, 1]]), big
        )
        svals = jnp.sort(vals)
        r_g, _ = _rank_in_sorted(svals, jnp.where(pmask, allp[:, 0], big))
        r_r, _ = _rank_in_sorted(svals, jnp.where(pmask, allp[:, 1], big))
        n_small = svals.shape[0]
        mlab = cc.connected_components(r_g, r_r, n_small, e_mask=pmask)
        # node id order == sorted gid order, so min label == min gid; gid
        # of small-node i = first-occurrence value at dense rank i
        first = jnp.concatenate(
            [jnp.array([True]), svals[1:] != svals[:-1]]
        )
        node_gid = jnp.full(n_small, big).at[
            jnp.cumsum(first.astype(jnp.int32)) - 1
        ].min(svals)
        final_of_node = node_gid[mlab]

        # 4. reroot local points through the merge table
        my_root = root_gid[:n_loc]
        rr, found = _rank_in_sorted(svals, jnp.where(val, my_root, big))
        merged = jnp.where(
            found & val, final_of_node[jnp.clip(rr, 0, n_small - 1)], my_root
        )
        return merged.astype(jnp.int32)[None], n_trunc[None]

    # check_vma=False: the CC while_loops seed their label carry with an
    # unvarying arange, which the varying-manual-axes checker rejects even
    # though every collective here is explicit and correct
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )(points, gids, valid)
