"""Pallas kernel oracles: the fused pair_min must match the XLA
composition on CPU (fallback) and in Pallas interpret mode (the
compiled-kernel semantics without TPU hardware)."""

import numpy as np
import jax
import jax.numpy as jnp


def _case(C=4, P=128, Q=256, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.rand(C, P, 3).astype(np.float32) * 10
    b = rng.rand(C, Q, 3).astype(np.float32) * 10
    am = rng.rand(C, P) > 0.2
    bm = rng.rand(C, Q) > 0.2
    am[1] = False  # one fully-masked component per side
    bm[C - 1] = False
    return a, b, am, bm


def _oracle(a, b, am, bm):
    d2 = np.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)
    d2f = np.where(bm[:, None, :], d2, np.inf)
    d2b = np.where(am[:, :, None], d2, np.inf)
    return d2f.min(2), d2f.argmin(2), d2b.min(1), d2b.argmin(1)


def test_pair_min_fallback_matches_oracle():
    from pcseqlearning_tpu.ops.pallas_tpu import pair_min

    a, b, am, bm = _case()
    fd, fi, bd, bi = map(np.asarray, pair_min(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(am), jnp.asarray(bm)))
    ofd, ofi, obd, obi = _oracle(a, b, am, bm)
    fin = np.isfinite(ofd)
    assert np.allclose(fd[fin], ofd[fin], atol=1e-4)
    assert (np.isinf(fd) == np.isinf(ofd)).all()
    # argmins may differ only at exact ties — verify by distance value
    took = np.take_along_axis(
        np.sum((a[:, :, None] - b[:, None]) ** 2, -1), fi[..., None], 2)[..., 0]
    assert np.allclose(took[fin], ofd[fin], atol=1e-4)
    binf = np.isfinite(obd)
    assert np.allclose(bd[binf], obd[binf], atol=1e-4)


def test_pair_min_pallas_interpret_matches_oracle():
    """Run the actual kernel (same BlockSpecs as the TPU path) through the
    Pallas interpreter."""
    from pcseqlearning_tpu.ops import pallas_tpu as pt

    a, b, am, bm = _case(C=2, P=128, Q=128, seed=1)
    C, P, _ = a.shape
    Q = b.shape[1]
    at = jnp.asarray(np.concatenate([np.swapaxes(a, 1, 2), np.zeros((C, 1, P), np.float32)], 1))
    bt = jnp.asarray(np.concatenate([np.swapaxes(b, 1, 2), np.zeros((C, 1, Q), np.float32)], 1))
    fd, fi, bd, bi = map(np.asarray, pt._pallas_pair_min(
        at, bt, jnp.asarray(am.astype(np.float32)), jnp.asarray(bm.astype(np.float32)),
        interpret=True,
    ))
    ofd, ofi, obd, obi = _oracle(a, b, am, bm)
    fin = np.isfinite(ofd)
    assert np.allclose(fd[fin], ofd[fin], atol=1e-4)
    binf = np.isfinite(obd)
    assert np.allclose(bd[binf], obd[binf], atol=1e-4)
    assert (fi == ofi)[fin].mean() > 0.99  # ties aside


def test_radius_scan_sorted_oracle(rng):
    """Pallas sorted-grid radius scan vs brute force (interpret mode).

    Small shapes keep the interpret-mode compile affordable; the TPU path
    is exercised by the bench and by scan_tpu-style drives."""
    from pcseqlearning_tpu.ops.pallas_scan import radius_neighbors_sorted

    n = 300
    fxyz = np.concatenate([
        rng.randint(0, 2, (n, 1)).astype(np.float32),
        rng.rand(n, 2).astype(np.float32) * 8 - 4,
        rng.randn(n, 1).astype(np.float32),
    ], axis=1)
    valid = rng.rand(n) > 0.15
    r, k = 1.0, 4
    idx, d2, mask, ntrunc = radius_neighbors_sorted(
        jnp.asarray(fxyz), jnp.asarray(fxyz), r, k, F=2, X=16, Y=16,
        ref_valid=jnp.asarray(valid), query_valid=jnp.asarray(valid),
        W=256, Bq=128, interpret=True,
    )
    idx, d2, mask = map(np.asarray, (idx, d2, mask))
    assert int(ntrunc) == 0
    for q in range(0, n, 7):
        if not valid[q]:
            assert not mask[q].any()
            continue
        diff = fxyz[:, 1:4] - fxyz[q, 1:4]
        dd = (diff ** 2).sum(1)
        cand = np.where(valid & (fxyz[:, 0] == fxyz[q, 0]) & (dd <= r * r + 1e-9))[0]
        want = np.sort(dd[cand])[:k]
        got = np.sort(d2[q][mask[q]])
        assert len(got) == len(want)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_connected_components_radius_oracle(rng):
    """Fused Pallas radius-CC vs scipy csgraph (interpret mode)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components as scipy_cc
    from pcseqlearning_tpu.ops.pallas_scan import connected_components_radius

    n = 400
    fxyz = np.concatenate([
        rng.randint(0, 2, (n, 1)).astype(np.float32),
        rng.rand(n, 2).astype(np.float32) * 10 - 5,
        rng.randn(n, 1).astype(np.float32) * 0.5,
    ], axis=1)
    valid = rng.rand(n) > 0.12
    r = 0.9
    comp, num, ntrunc = connected_components_radius(
        jnp.asarray(fxyz), jnp.asarray(valid), r, F=2, X=16, Y=16,
        W=256, Bq=128, interpret=True,
    )
    comp = np.asarray(comp)
    assert int(ntrunc) == 0
    d2 = ((fxyz[None, :, 1:4] - fxyz[:, None, 1:4]) ** 2).sum(-1)
    adj = ((d2 <= r * r) & (fxyz[None, :, 0] == fxyz[:, None, 0])
           & valid[None, :] & valid[:, None])
    ncc, lab = scipy_cc(sp.csr_matrix(adj), directed=False)
    lv, cv = lab[valid], comp[valid]
    m1, m2 = {}, {}
    for a, b in zip(lv, cv):
        assert m1.setdefault(a, b) == b and m2.setdefault(b, a) == a
    assert (comp[~valid] == -1).all()
    assert len(set(lv)) == int(num)


def test_connected_components_radius_unaligned_bucket(rng):
    """n divisible by 128 but not by Bq=256: the label-table size must
    round up to the block granularity (reference-scale regression — a
    851,300-row chunk crashed the ltab scatter)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components as scipy_cc
    from pcseqlearning_tpu.ops.pallas_scan import connected_components_radius

    n = 384  # m_pad = 512 > old n_pad = 384
    fxyz = np.concatenate([
        np.zeros((n, 1), np.float32),
        rng.rand(n, 2).astype(np.float32) * 8 - 4,
        np.zeros((n, 1), np.float32),
    ], axis=1)
    valid = np.ones(n, bool)
    r = 0.8
    comp, num, ntrunc = connected_components_radius(
        jnp.asarray(fxyz), jnp.asarray(valid), r, F=1, X=16, Y=16,
        W=256, Bq=256, interpret=True,
    )
    comp = np.asarray(comp)
    d2 = ((fxyz[None, :, 1:4] - fxyz[:, None, 1:4]) ** 2).sum(-1)
    ncc, lab = scipy_cc(sp.csr_matrix(d2 <= r * r), directed=False)
    m1, m2 = {}, {}
    for a, b in zip(lab, comp):
        assert m1.setdefault(a, b) == b and m2.setdefault(b, a) == a
    assert ncc == int(num)


def test_cc_prep_finish_adaptive_matches_fixed(rng):
    """Two-phase adaptive CC (cc_prep -> host W pick -> cc_finish) must
    reproduce the fixed-W single-dispatch partition, and max_window must
    bound every block's union span (so the chosen W never truncates)."""
    from pcseqlearning_tpu.ops import pallas_scan

    n = 384
    fxyz = np.concatenate([
        rng.randint(0, 2, (n, 1)).astype(np.float32),
        rng.rand(n, 2).astype(np.float32) * 8 - 4,
        rng.randn(n, 1).astype(np.float32) * 0.4,
    ], axis=1)
    valid = rng.rand(n) > 0.1
    r = 0.8
    comp_fix, num_fix, _ = pallas_scan.connected_components_radius(
        jnp.asarray(fxyz), jnp.asarray(valid), r, F=2, X=16, Y=16,
        W=512, Bq=128, interpret=True,
    )
    state, max_win = pallas_scan.cc_prep(
        jnp.asarray(fxyz), jnp.asarray(valid), r, F=2, X=16, Y=16, Bq=128)
    assert int(max_win) <= n
    comp_ad, num_ad, ntrunc = pallas_scan.cc_finish(
        state, max_win, n, Bq=128, interpret=True)
    assert int(ntrunc) == 0
    assert int(num_ad) == int(num_fix)
    ca, cf = np.asarray(comp_ad), np.asarray(comp_fix)
    m1, m2 = {}, {}
    for a, b in zip(ca[valid], cf[valid]):
        assert m1.setdefault(a, b) == b and m2.setdefault(b, a) == a
