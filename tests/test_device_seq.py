"""Device-resident sequence table (utils/device_seq.py): on-device chunk
slices and frame tables must reproduce the host pack exactly, including
the end-of-table slot offset introduced by dynamic_slice clamping."""

import numpy as np

from pcseqlearning_tpu.utils.device_seq import DeviceSeq, get_device_seq


def _seq(num_frames=5, per_frame=(100, 37, 260, 1, 80)):
    rng = np.random.RandomState(1)
    rows = []
    for f in range(num_frames):
        n = per_frame[f]
        fx = np.concatenate(
            [np.full((n, 1), f, np.float32), rng.rand(n, 3).astype(np.float32) * 20],
            axis=1,
        )
        rows.append(fx)
    fxyz = np.concatenate(rows)
    return fxyz, fxyz[:, 0].astype(np.int64)


def test_chunk_slices_match_host():
    fxyz, frame = _seq()
    ds = DeviceSeq(fxyz, frame)
    assert ds.ok
    for f0, f1 in [(0, 2), (2, 4), (4, 6), (0, 5)]:
        win, valid, length, off = ds.chunk(f0, f1)
        m = (frame >= f0) & (frame < f1)
        assert length == int(m.sum())
        got = np.asarray(win)[off: off + length]
        np.testing.assert_allclose(got, fxyz[m], rtol=0, atol=0)
        v = np.asarray(valid)
        assert v[off: off + length].all()
        assert not v[:off].any() and not v[off + length:].any()


def test_chunk_end_of_table_offset():
    """The LAST chunk's bucketed cap can exceed the table tail;
    dynamic_slice clamps the start and the rows shift to slot ``off``."""
    fxyz, frame = _seq(num_frames=3, per_frame=(400, 400, 3))
    ds = DeviceSeq(fxyz, frame)
    win, valid, length, off = ds.chunk(2, 3)
    assert length == 3
    got = np.asarray(win)[off: off + 3]
    np.testing.assert_allclose(got, fxyz[frame == 2])


def test_frame_table_matches_host():
    fxyz, frame = _seq()
    ds = DeviceSeq(fxyz, frame)
    tab, tval, p_cap = ds.frame_table()
    tab, tval = np.asarray(tab), np.asarray(tval)
    for f in range(5):
        rows = fxyz[frame == f]
        assert tval[f, : len(rows)].all() and not tval[f, len(rows):].any()
        np.testing.assert_allclose(tab[f, : len(rows)], rows)
        assert (tab[f, len(rows):] == 1e8).all()


def test_aux_frame_table():
    fxyz, frame = _seq()
    ds = DeviceSeq(fxyz, frame)
    vals = (np.arange(len(frame)) % 3 == 0)
    at = np.asarray(ds.aux_frame_table(vals))
    for f in range(5):
        m = frame == f
        assert (at[f, : m.sum()] == vals[m]).all()
        assert not at[f, m.sum():].any()


def test_unsorted_layout_falls_back():
    fxyz, frame = _seq()
    perm = np.random.RandomState(0).permutation(len(frame))
    sd = {}
    assert get_device_seq(sd, fxyz[perm], frame[perm]) is None
    # sorted layout activates and is cached by identity
    sd = {}
    ds = get_device_seq(sd, fxyz, frame)
    assert ds is not None and get_device_seq(sd, fxyz, frame) is ds


def test_pack_components_device_matches_host():
    import jax.numpy as jnp

    from pcseqlearning_tpu.preprocessing.tracking_batched import (
        pack_components, pack_components_device)

    rng = np.random.RandomState(3)
    n, C, P = 500, 8, 16
    xyz = rng.rand(n, 3).astype(np.float32) * 10
    comp = rng.randint(0, C, n)
    keep = rng.rand(n) > 0.3
    h_xyz, h_mask = pack_components(xyz, comp, keep, C, P)
    d_xyz, d_mask = pack_components_device(
        jnp.asarray(xyz), jnp.asarray(comp.astype(np.int32)),
        jnp.asarray(keep), C, P)
    np.testing.assert_array_equal(np.asarray(d_mask), h_mask)
    np.testing.assert_allclose(np.asarray(d_xyz), h_xyz, atol=0)
    # padded rows arrive as comp=-1 AND keep=False in the device path —
    # they must match the host pack over the kept subset
    comp2 = comp.copy()
    keep2 = keep.copy()
    comp2[:100] = -1
    keep2[:100] = False
    h_xyz2, h_mask2 = pack_components(xyz, np.clip(comp2, 0, None), keep2, C, P)
    d_xyz2, d_mask2 = pack_components_device(
        jnp.asarray(xyz), jnp.asarray(comp2.astype(np.int32)),
        jnp.asarray(keep2), C, P)
    np.testing.assert_array_equal(np.asarray(d_mask2), h_mask2)
    np.testing.assert_allclose(np.asarray(d_xyz2), h_xyz2, atol=0)


def test_compact_and_from_device():
    import jax.numpy as jnp

    fxyz, frame = _seq()
    ds = DeviceSeq(fxyz, frame)
    keep = (np.arange(len(frame)) % 3 != 0)
    flat2 = ds.compact(jnp.asarray(keep), int(keep.sum()))
    host_kept = fxyz[keep]
    np.testing.assert_allclose(np.asarray(flat2)[: keep.sum()], host_kept)
    assert (np.asarray(flat2)[keep.sum():] == 1e8).all()
    ds2 = DeviceSeq.from_device(flat2, frame[keep], host_key=host_kept)
    assert ds2.ok and ds2.matches(host_kept)
    tab, tval, p_cap = ds2.frame_table()
    tab = np.asarray(tab)
    for f in range(5):
        rows = host_kept[frame[keep] == f]
        np.testing.assert_allclose(tab[f, : len(rows)], rows)


def test_compact2_matches_single():
    import jax.numpy as jnp

    fxyz, frame = _seq()
    ds = DeviceSeq(fxyz, frame)
    k1 = (np.arange(len(frame)) % 2 == 0)
    k2 = (np.arange(len(frame)) % 5 != 0)
    a, b = ds.compact2(jnp.asarray(k1), int(k1.sum()),
                       jnp.asarray(k2), int(k2.sum()))
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(ds.compact(jnp.asarray(k1), int(k1.sum()))))
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(ds.compact(jnp.asarray(k2), int(k2.sum()))))
