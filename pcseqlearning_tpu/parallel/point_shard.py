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
