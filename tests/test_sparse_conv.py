import jax.numpy as jnp
import numpy as np
import jax

HI = jax.lax.Precision.HIGHEST

from pcseqlearning_tpu.ops import sparse_conv as sc


def _make_sparse(rng, n_active=40, shape=(8, 8, 8), cin=4, batch=2, cap=64):
    coords = set()
    while len(coords) < n_active:
        b = rng.randint(0, batch)
        z, y, x = rng.randint(0, shape[0]), rng.randint(0, shape[1]), rng.randint(0, shape[2])
        coords.add((b, z, y, x))
    coords = np.array(sorted(coords), np.int32)
    feats = rng.randn(len(coords), cin).astype(np.float32)
    pad = cap - len(coords)
    coords_p = np.concatenate([coords, -np.ones((pad, 4), np.int32)])
    feats_p = np.concatenate([feats, np.zeros((pad, cin), np.float32)])
    valid = np.arange(cap) < len(coords)
    st = sc.SparseTensor(
        jnp.asarray(feats_p), jnp.asarray(coords_p), jnp.asarray(valid), shape, batch
    )
    return st, coords, feats


def _dense_from_sparse(coords, feats, shape, batch, cin):
    dense = np.zeros((batch,) + shape + (cin,), np.float32)
    for c, f in zip(coords, feats):
        dense[c[0], c[1], c[2], c[3]] += f
    return dense


def _dense_conv3d(dense, w, stride=1, padding=1):
    """Oracle: scipy-free direct dense conv. w: [K, cin, cout] in
    itertools.product order over (dz, dy, dx) of kernel 3."""
    b, D, H, W, cin = dense.shape
    cout = w.shape[-1]
    k = 3
    pd = np.pad(dense, ((0, 0), (padding, padding), (padding, padding), (padding, padding), (0, 0)))
    oD = (D + 2 * padding - k) // stride + 1
    oH = (H + 2 * padding - k) // stride + 1
    oW = (W + 2 * padding - k) // stride + 1
    out = np.zeros((b, oD, oH, oW, cout), np.float32)
    ki = 0
    for dz in range(k):
        for dy in range(k):
            for dx in range(k):
                sub = pd[:, dz : dz + oD * stride : stride, dy : dy + oH * stride : stride, dx : dx + oW * stride : stride]
                out += sub @ w[ki]
                ki += 1
    return out


def test_subm_conv_matches_dense(rng):
    st, coords, feats = _make_sparse(rng)
    w = rng.randn(27, 4, 6).astype(np.float32) * 0.1
    out = sc.subm_conv3d(st, jnp.asarray(w), precision=HI)
    dense = _dense_from_sparse(coords, feats, st.spatial_shape, st.batch_size, 4)
    ref = _dense_conv3d(dense, w, stride=1, padding=1)
    got = np.asarray(out.features)
    for i, c in enumerate(coords):
        np.testing.assert_allclose(got[i], ref[c[0], c[1], c[2], c[3]], rtol=1e-3, atol=1e-4)
    assert not np.asarray(out.valid)[len(coords):].any()


def test_sparse_conv_stride2_matches_dense(rng):
    st, coords, feats = _make_sparse(rng)
    w = rng.randn(27, 4, 6).astype(np.float32) * 0.1
    out = sc.sparse_conv3d(st, jnp.asarray(w), stride=2, padding=1, out_cap=128, precision=HI)
    dense = _dense_from_sparse(coords, feats, st.spatial_shape, st.batch_size, 4)
    ref = _dense_conv3d(dense, w, stride=2, padding=1)
    oc = np.asarray(out.coords)
    ov = np.asarray(out.valid)
    got = np.asarray(out.features)
    # every active output matches the dense conv
    for i in np.nonzero(ov)[0]:
        b, z, y, x = oc[i]
        np.testing.assert_allclose(got[i], ref[b, z, y, x], rtol=1e-3, atol=1e-4)
    # every nonzero dense output is in the active set
    active = {tuple(c) for c in oc[ov].tolist()}
    nz = np.argwhere(np.abs(ref).max(-1) > 1e-6)
    for c in nz:
        assert tuple(c) in active


def test_sparse_maxpool(rng):
    st, coords, feats = _make_sparse(rng)
    out = sc.sparse_maxpool3d(st, kernel_size=3, stride=2, padding=1, out_cap=128)
    dense = _dense_from_sparse(coords, feats, st.spatial_shape, st.batch_size, 4)
    oc = np.asarray(out.coords)
    ov = np.asarray(out.valid)
    got = np.asarray(out.features)
    pd = np.pad(dense, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), constant_values=-np.inf)
    occ = np.zeros(dense.shape[:-1], bool)
    for c in coords:
        occ[c[0], c[1], c[2], c[3]] = True
    occ_p = np.pad(occ, ((0, 0), (1, 1), (1, 1), (1, 1)))
    for i in np.nonzero(ov)[0]:
        b, z, y, x = oc[i]
        window = pd[b, 2 * z : 2 * z + 3, 2 * y : 2 * y + 3, 2 * x : 2 * x + 3]
        wocc = occ_p[b, 2 * z : 2 * z + 3, 2 * y : 2 * y + 3, 2 * x : 2 * x + 3]
        assert wocc.any()
        ref = np.where(wocc[..., None], window, -np.inf).reshape(-1, 4).max(0)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5)


def test_inverse_conv_roundtrip_shape(rng):
    st, coords, feats = _make_sparse(rng)
    w_down = rng.randn(27, 4, 8).astype(np.float32) * 0.1
    down = sc.sparse_conv3d(st, jnp.asarray(w_down), stride=2, padding=1, out_cap=128, precision=HI)
    w_up = rng.randn(27, 8, 4).astype(np.float32) * 0.1
    up = sc.sparse_inverse_conv3d(down, st, jnp.asarray(w_up), stride=2, padding=1, precision=HI)
    assert up.features.shape == st.features.shape
    assert np.array_equal(np.asarray(up.coords), np.asarray(st.coords))
    # inverse conv of nonzero input produces nonzero output on the fine set
    assert np.abs(np.asarray(up.features)[np.asarray(st.valid)]).max() > 0


def test_to_dense(rng):
    st, coords, feats = _make_sparse(rng)
    dense = np.asarray(sc.to_dense(st))
    ref = _dense_from_sparse(coords, feats, st.spatial_shape, st.batch_size, 4)
    np.testing.assert_allclose(dense, ref, atol=1e-6)


def test_dense_table_matches_hash_lookup(rng):
    """The dense scatter/gather coord table and the sorted-hash lookup must
    resolve identical rulebooks (the dense path is the TPU fast path; the
    hash path serves grids beyond PCSEQ_DENSE_TABLE_CAP)."""
    from pcseqlearning_tpu.ops import hash_graph

    st, coords, feats = _make_sparse(rng, n_active=50, shape=(6, 9, 7), batch=3, cap=96)
    offs = np.asarray(sc.kernel_offsets(3)) - 1
    v = st.coords.shape[0]
    q = np.asarray(st.coords)[None, :, :].repeat(27, 0).astype(np.int32)
    q[..., 1:4] += offs[:, None, :]
    q = q.reshape(-1, 4)
    qv = np.asarray(jnp.broadcast_to(st.valid[None, :], (27, v))).reshape(-1)

    tab = sc._dense_coord_table(st)
    got_dense = np.asarray(sc._dense_lookup(
        tab, st.spatial_shape, st.batch_size, jnp.asarray(q), jnp.asarray(qv)))
    table = hash_graph.build_coord_table(st.coords, st.valid)
    got_hash = np.asarray(hash_graph.coord_lookup(table, jnp.asarray(q), jnp.asarray(qv)))
    np.testing.assert_array_equal(got_dense, got_hash)


def test_shared_rulebook_matches_fresh(rng):
    """subm_conv3d with a precomputed (stage-shared) rulebook must equal the
    self-built path."""
    st, coords, feats = _make_sparse(rng)
    w = rng.randn(27, 4, 6).astype(np.float32) * 0.1
    rb = sc.build_subm_rulebook(st, 3)
    a = sc.subm_conv3d(st, jnp.asarray(w), precision=HI)
    b = sc.subm_conv3d(st, jnp.asarray(w), precision=HI, rulebook=rb)
    np.testing.assert_allclose(np.asarray(a.features), np.asarray(b.features), atol=0)
