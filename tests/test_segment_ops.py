import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.ops import segment_ops as so


def test_segment_mean_empty_segments(rng):
    data = jnp.asarray(rng.randn(100, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 7, 100))
    out = so.segment_mean(data, ids, 10)
    ref = np.zeros((10, 3), np.float32)
    for s in range(7):
        m = np.asarray(ids) == s
        if m.any():
            ref[s] = np.asarray(data)[m].mean(0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
    # segments 7..9 are empty -> exactly zero
    assert np.all(np.asarray(out)[7:] == 0)


def test_weighted_segment_mean(rng):
    data = jnp.asarray(rng.randn(50).astype(np.float32))
    w = jnp.asarray(rng.rand(50).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 5, 50))
    out = so.weighted_segment_mean(data, w, ids, 5)
    for s in range(5):
        m = np.asarray(ids) == s
        ref = (np.asarray(data)[m] * np.asarray(w)[m]).sum() / (np.asarray(w)[m].sum() + 1e-6)
        np.testing.assert_allclose(np.asarray(out)[s], ref, rtol=1e-4)


def test_truncated_segment_mean_matches_reference_semantics(rng):
    # reference: mean, clamp to mean +- trunc, re-mean (registration_utils.py:44-58)
    data = np.concatenate([rng.randn(80).astype(np.float32), np.array([100.0], np.float32)])
    ids = np.zeros(81, np.int64)
    out = so.truncated_segment_mean(jnp.asarray(data), jnp.asarray(ids), 1, trunc_dist=0.3)
    mean0 = data.mean()
    clamped = np.clip(data, mean0 - 0.3, mean0 + 0.3)
    np.testing.assert_allclose(np.asarray(out)[0], clamped.mean(), rtol=1e-5)


def test_segment_median(rng):
    data = rng.randn(200).astype(np.float32)
    ids = rng.randint(0, 9, 200)
    out = np.asarray(so.segment_median(jnp.asarray(data), jnp.asarray(ids), 12))
    for s in range(12):
        vals = np.sort(data[ids == s])
        if len(vals) == 0:
            assert out[s] == -1e10
        else:
            # reference picks element at index deg//2 of the sorted run
            assert out[s] == vals[len(vals) // 2]


def test_segment_median_int():
    data = jnp.asarray(np.array([5, 3, 3, 9, 7], np.int32))
    ids = jnp.asarray(np.array([0, 0, 0, 2, 2]))
    out = np.asarray(so.segment_median(data, ids, 3))
    assert out[0] == 3  # sorted [3,3,5] -> idx 1
    assert out[1] == -1  # empty int segment
    assert out[2] == 9  # sorted [7,9] -> idx 1


def test_segment_min_max_or(rng):
    data = jnp.asarray(rng.randn(30).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 3, 30))
    mn = np.asarray(so.segment_min_or(data, ids, 5, fill=-7.0))
    mx = np.asarray(so.segment_max_or(data, ids, 5, fill=-7.0))
    assert np.all(mn[3:] == -7.0) and np.all(mx[3:] == -7.0)
    for s in range(3):
        m = np.asarray(ids) == s
        assert np.isclose(mn[s], np.asarray(data)[m].min())
        assert np.isclose(mx[s], np.asarray(data)[m].max())
