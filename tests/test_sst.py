import jax
import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.models.backbones_sst import SSTBackbone, flat2window, window2flat


def test_flat2window_roundtrip(rng):
    p, c = 200, 8
    feats = jnp.asarray(rng.randn(p, c).astype(np.float32))
    xy = jnp.asarray(rng.randint(0, 48, (p, 2)).astype(np.int32))
    valid = jnp.asarray(rng.rand(p) > 0.2)
    wf, wm, mapping = flat2window(feats, xy, valid, window_size=12,
                                  num_windows_cap=64, window_cap=200)
    back = window2flat(wf, mapping, p)
    np.testing.assert_allclose(
        np.asarray(back)[np.asarray(valid)], np.asarray(feats)[np.asarray(valid)], atol=1e-6
    )
    # window grouping correct: same window id iff same coarse cell
    win_id = np.asarray(mapping[0])
    cells = np.asarray(xy) // 12
    v = np.asarray(valid)
    for i in range(p):
        for j in range(i + 1, p):
            if v[i] and v[j]:
                same_cell = (cells[i] == cells[j]).all()
                assert (win_id[i] == win_id[j]) == same_cell


def test_sst_backbone_forward(rng):
    p, c = 128, 16
    model = SSTBackbone(dim=32, num_blocks=2, window_size=8, num_heads=4,
                        grid_size=(64, 64), window_cap=64, num_windows_cap=128)
    batch = {
        "voxel_features": jnp.asarray(rng.randn(p, c).astype(np.float32)),
        "voxel_coords": jnp.asarray(
            np.stack([rng.randint(0, 2, p), np.zeros(p), rng.randint(0, 64, p),
                      rng.randint(0, 64, p)], 1).astype(np.int32)),
        "voxel_valid": jnp.asarray(np.arange(p) < 100),
        "batch_size": 2,
    }
    variables = jax.jit(lambda a: model.init(jax.random.PRNGKey(0), {**a, "batch_size": 2}, train=False))(
        {k: v for k, v in batch.items() if k != "batch_size"}
    )
    out = jax.jit(lambda v, a: model.apply(v, {**a, "batch_size": 2}, train=False)["pillar_features"])(
        variables, {k: v for k, v in batch.items() if k != "batch_size"}
    )
    out = np.asarray(out)
    assert out.shape == (p, 32)
    assert np.isfinite(out).all()
    assert np.abs(out[:100]).max() > 0
    assert np.abs(out[100:]).max() == 0  # padding stays zero
