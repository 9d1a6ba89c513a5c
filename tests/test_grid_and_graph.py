import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.ops import grid_utils as gu
from pcseqlearning_tpu.ops import hash_graph as hg
from pcseqlearning_tpu.ops import connected_components as cc


def _brute_radius(ref, query, radius, slack=0.0):
    """O(N*M) oracle over 4D (frame, x, y, z) coords, same-frame only.
    ``slack`` loosens the boundary to absorb f32 summation-order ties."""
    d2 = ((query[:, None, :].astype(np.float64) - ref[None, :, :].astype(np.float64)) ** 2).sum(-1)
    same_frame = np.round(query[:, None, 0]) == np.round(ref[None, :, 0])
    return (d2 <= (radius + slack) * (radius + slack)) & same_frame


def test_unique_rows(rng):
    coords = rng.randint(-5, 5, size=(300, 4)).astype(np.int32)
    inverse, num_groups, _ = gu.unique_rows(jnp.asarray(coords))
    inverse = np.asarray(inverse)
    uniq = np.unique(coords, axis=0)
    assert int(num_groups) == len(uniq)
    # all rows in a group identical; distinct groups differ
    for g in range(int(num_groups)):
        rows = coords[inverse == g]
        assert len(rows) > 0
        assert (rows == rows[0]).all()


def test_grid_sample_mean(rng):
    pts = rng.rand(500, 4).astype(np.float32)
    pts[:, 0] = rng.randint(0, 3, 500)  # frame ids
    out = gu.grid_sample_mean(jnp.asarray(pts), [0.25, 0.25, 0.25])
    inv = np.asarray(out["inverse"])
    bxyz = np.asarray(out["bxyz"])
    for g in np.unique(inv):
        np.testing.assert_allclose(bxyz[g], pts[inv == g].mean(0), rtol=1e-4, atol=1e-5)


def test_radius_graph_matches_bruteforce(rng):
    n, m = 400, 300
    ref = rng.rand(n, 4).astype(np.float32) * 4
    ref[:, 0] = rng.randint(0, 3, n)
    query = rng.rand(m, 4).astype(np.float32) * 4
    query[:, 0] = rng.randint(0, 3, m)
    radius = 0.5
    k = 16
    idx, d2, mask = hg.radius_graph(jnp.asarray(ref), jnp.asarray(query), radius, k, cell_cap=64)
    idx, d2, mask = np.asarray(idx), np.asarray(d2), np.asarray(mask)

    must = _brute_radius(ref, query, radius, slack=-1e-4)   # strictly inside
    may = _brute_radius(ref, query, radius, slack=1e-4)     # inside + boundary
    for i in range(m):
        inner = np.where(must[i])[0]
        outer = set(np.where(may[i])[0].tolist())
        got = set(idx[i][mask[i]].tolist())
        assert got <= outer, f"query {i}: spurious neighbor"
        if len(inner) <= k:
            assert set(inner.tolist()) - got == set() or len(got) == k, f"query {i}"
        else:
            # K-cap: the strictly-nearest K (excluding boundary ties) present
            td2 = ((query[i] - ref[inner]) ** 2).sum(-1)
            order = inner[np.argsort(td2)]
            strict = [j for j in order[:k] if td2[np.argsort(td2)][:k].max() < (radius - 1e-4) ** 2]
            assert set(order[: max(len(strict), 0)].tolist()) - got == set() or len(got) == k
        # sorted by distance
        dd = d2[i][mask[i]]
        assert np.all(np.diff(dd) >= -1e-6)


def test_radius_graph_padded_rows(rng):
    n, m = 128, 64
    ref = rng.rand(n, 4).astype(np.float32)
    ref[:, 0] = 0
    query = rng.rand(m, 4).astype(np.float32)
    query[:, 0] = 0
    ref_valid = np.arange(n) < 100
    query_valid = np.arange(m) < 50
    idx, d2, mask = hg.radius_graph(
        jnp.asarray(ref), jnp.asarray(query), 0.3, 8,
        ref_valid=jnp.asarray(ref_valid), query_valid=jnp.asarray(query_valid), cell_cap=64,
    )
    idx, mask = np.asarray(idx), np.asarray(mask)
    assert not mask[50:].any()
    assert np.all(idx[mask] < 100)
    must = _brute_radius(ref[:100], query[:50], 0.3, slack=-1e-4)
    may = _brute_radius(ref[:100], query[:50], 0.3, slack=1e-4)
    for i in range(50):
        got = set(idx[i][mask[i]].tolist())
        assert got <= set(np.where(may[i])[0].tolist())
        inner = set(np.where(must[i])[0].tolist())
        if len(inner) <= 8:
            assert inner <= got or len(got) == 8


def test_cross_frame_query_via_frame_shift(rng):
    """The registration contract: shift query frame coord to the target frame."""
    n = 200
    ref = rng.rand(n, 4).astype(np.float32)
    ref[:, 0] = 5  # target frame
    query = rng.rand(n, 4).astype(np.float32)
    query[:, 0] = 3
    shifted = query.copy()
    shifted[:, 0] = 5
    idx, d2, mask = hg.radius_graph(jnp.asarray(ref), jnp.asarray(shifted), 0.25, 1, cell_cap=64)
    idx, mask = np.asarray(idx), np.asarray(mask)
    oracle = _brute_radius(ref, shifted, 0.25, slack=-1e-4)
    for i in range(n):
        nbrs = np.where(oracle[i])[0]
        if len(nbrs):
            td2 = ((shifted[i] - ref[nbrs]) ** 2).sum(-1)
            assert mask[i, 0] and idx[i, 0] == nbrs[np.argmin(td2)]
        else:
            assert not mask[i, 0]


def test_coord_lookup(rng):
    coords = np.unique(rng.randint(0, 20, size=(300, 4)), axis=0).astype(np.int32)
    n = len(coords)
    table = hg.build_coord_table(jnp.asarray(coords))
    # query half existing, half missing
    q_exist = coords[rng.choice(n, 50)]
    q_missing = coords[rng.choice(n, 50)].copy()
    q_missing[:, 3] += 1000
    out_e = np.asarray(hg.coord_lookup(table, jnp.asarray(q_exist)))
    out_m = np.asarray(hg.coord_lookup(table, jnp.asarray(q_missing)))
    assert np.all(out_e >= 0)
    assert np.all((coords[out_e] == q_exist).all(-1))
    assert np.all(out_m == -1)


def test_connected_components_vs_scipy(rng):
    import scipy.sparse as sp

    n = 300
    pts = rng.rand(n, 4).astype(np.float32)
    pts[:, 0] = 0
    idx, _, mask = hg.radius_graph(jnp.asarray(pts), jnp.asarray(pts), 0.12, 16, cell_cap=64)
    e_ref, e_query, e_mask = hg.edges_from_neighbors(idx, mask)
    labels = cc.connected_components(e_ref, e_query, n, e_mask)
    comp, num_comp = cc.compact_labels(labels)
    comp = np.asarray(comp)

    # scipy oracle on the same brute-force graph
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    adj = sp.csr_matrix((d2 <= 0.12 * 0.12))
    n_ref, ref_labels = sp.csgraph.connected_components(adj, directed=False)
    assert int(num_comp) == n_ref
    # same partition up to relabeling
    mapping = {}
    for a, b in zip(comp.tolist(), ref_labels.tolist()):
        assert mapping.setdefault(a, b) == b


def test_cc_padded_nodes(rng):
    # edges among first 10 nodes in a chain; nodes 10..19 padded/isolated
    e_src = jnp.asarray(np.arange(9), dtype=jnp.int32)
    e_dst = jnp.asarray(np.arange(1, 10), dtype=jnp.int32)
    labels = cc.connected_components(e_src, e_dst, 20)
    valid = jnp.asarray(np.arange(20) < 10)
    comp, num = cc.compact_labels(labels, node_valid=valid)
    comp = np.asarray(comp)
    assert int(num) == 1
    assert np.all(comp[:10] == 0)
    assert np.all(comp[10:] == -1)


def test_radius_graph_schedules_agree(rng, monkeypatch):
    """The vectorized and streamed candidate scans must produce identical
    neighbor sets."""
    from pcseqlearning_tpu.ops import hash_graph as hg2

    n, m = 300, 200
    ref = rng.rand(n, 4).astype(np.float32) * 3
    ref[:, 0] = 0
    query = rng.rand(m, 4).astype(np.float32) * 3
    query[:, 0] = 0
    a = hg2.radius_graph(jnp.asarray(ref), jnp.asarray(query), 0.4, 8, cell_cap=48)
    monkeypatch.setattr(hg2, "_VECTORIZE_MAX_SLOTS", 0)
    hg2.radius_neighbors._clear_cache()
    b = hg2.radius_graph(jnp.asarray(ref), jnp.asarray(query), 0.4, 8, cell_cap=48)
    monkeypatch.undo()
    hg2.radius_neighbors._clear_cache()
    for i in range(m):
        sa = set(np.asarray(a[0])[i][np.asarray(a[2])[i]].tolist())
        sb = set(np.asarray(b[0])[i][np.asarray(b[2])[i]].tolist())
        assert sa == sb, i


def test_connected_components_knn_matches_edge_list(rng):
    """Pull-push CC over neighbor tables must match scipy on the same
    symmetrized graph (including asymmetric-kNN pairs, which a one-sided
    deduplicated edge list can drop)."""
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg

    from pcseqlearning_tpu.ops import connected_components as cc

    n, k = 500, 4
    pts = rng.rand(n, 2).astype(np.float32) * 10
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1)
    idx = order[:, 1:k + 1].astype(np.int32)
    mask = np.take_along_axis(d2, idx, 1) < 1.0

    labels = np.asarray(cc.connected_components_knn(jnp.asarray(idx), jnp.asarray(mask)))
    rows = np.repeat(np.arange(n), k)[mask.reshape(-1)]
    cols = idx.reshape(-1)[mask.reshape(-1)]
    g = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    n_ref, lab_ref = csg.connected_components(g, directed=False)

    assert len(np.unique(labels)) == n_ref
    # same partition: every reference component maps to exactly one label
    for c in range(n_ref):
        assert len(np.unique(labels[lab_ref == c])) == 1
