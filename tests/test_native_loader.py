import numpy as np
import pytest

from pcseqlearning_tpu.datasets.native_loader import AsyncNpyPool, PrefetchIterator


def test_native_npy_roundtrip(tmp_path, rng):
    pool = AsyncNpyPool(workers=2)
    arrays = {
        "f32": rng.rand(100, 8).astype(np.float32),
        "f64": rng.rand(7).astype(np.float64),
        "i64": rng.randint(0, 100, (5, 3)).astype(np.int64),
        "i32": rng.randint(0, 100, (4,)).astype(np.int32),
        "u8": (rng.rand(6, 2) * 255).astype(np.uint8),
    }
    paths = {}
    for name, arr in arrays.items():
        p = tmp_path / f"{name}.npy"
        np.save(p, arr)
        paths[name] = p
    # batch submit then collect — exercises concurrency
    tickets = {n: pool.submit(p) for n, p in paths.items()}
    for name, t in tickets.items():
        out = pool.get(t)
        np.testing.assert_array_equal(out, arrays[name])
        assert out.dtype == arrays[name].dtype


def test_native_loader_is_native():
    pool = AsyncNpyPool()
    assert pool.native, "libnpy_loader.so missing — run csrc/build.sh"


def test_native_loader_error(tmp_path):
    pool = AsyncNpyPool(workers=1)
    if not pool.native:
        pytest.skip("native lib unavailable")
    with pytest.raises(IOError):
        pool.load(tmp_path / "missing.npy")


def test_prefetch_iterator():
    src = list(range(20))
    out = list(PrefetchIterator(iter(src), depth=4))
    assert out == src
