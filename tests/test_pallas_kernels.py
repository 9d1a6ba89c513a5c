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
