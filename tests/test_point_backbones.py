"""Point-family backbones (round 2): KPConvNet, the GraphConvNet variants
(PointConvNet/VolumeConvNet/PointGroupNet/PointPlaneNet/PointNet2RepSurf),
and RepsurfDynamicVFE — forward shape/finiteness + umbrella oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _batch(n=256, c=2, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.randint(0, 2, n)
    pts[:, 1:4] = rng.rand(n, 3) * np.array([8, 8, 2]) - np.array([4, 4, 1])
    return {
        "point_bxyz": jnp.asarray(pts),
        "point_feat": jnp.asarray(rng.rand(n, c).astype(np.float32)),
        "point_valid": jnp.asarray(np.arange(n) < n - 10),
        "batch_size": 2,
    }


def test_kpconv_net_forward():
    from pcseqlearning_tpu.models.backbones_kpconv import KPConvNet

    b = _batch()
    m = KPConvNet(channels=(16, 32), base_cell=0.4, nsample=8, out_channels=24)
    v = m.init(jax.random.PRNGKey(0), b, train=True)
    out, _ = m.apply(v, b, train=True, mutable=["batch_stats"])
    f = np.asarray(out["point_features"])
    assert f.shape == (256, 24)
    assert np.isfinite(f).all()
    assert np.abs(f).sum() > 0
    # padded rows zeroed
    assert np.allclose(f[-5:], 0)


@pytest.mark.parametrize("variant", [
    "PointConvNet", "VolumeConvNet", "PointGroupNet", "PointPlaneNet", "PointNet2RepSurf",
])
def test_graph_conv_net_variants(variant):
    from pcseqlearning_tpu.models.backbones_graph import GraphConvNet

    b = _batch(seed=1)
    m = GraphConvNet(variant=variant, channels=(16, 32), base_cell=0.4, nsample=8, out_channels=24)
    v = m.init(jax.random.PRNGKey(0), b, train=True)
    out, _ = m.apply(v, b, train=True, mutable=["batch_stats"])
    f = np.asarray(out["point_features"])
    assert f.shape == (256, 24) and np.isfinite(f).all() and np.abs(f).sum() > 0


def test_umbrella_surface_features_plane():
    """Points on the z=0 plane: umbrella normals must be ~(0,0,1)."""
    from pcseqlearning_tpu.models.vfe import umbrella_surface_features

    rng = np.random.RandomState(0)
    xyz = np.zeros((128, 3), np.float32)
    xyz[:, :2] = rng.rand(128, 2) * 4
    out = np.asarray(umbrella_surface_features(
        jnp.asarray(xyz), jnp.zeros(128, jnp.int32), jnp.ones(128, bool), k=8))
    assert out.shape == (128, 10)
    normals = out[:, :3]
    assert (normals[:, 2] > 0.97).mean() > 0.9  # flat plane -> +z normals


def test_repsurf_dynamic_vfe_forward():
    from pcseqlearning_tpu.models.vfe import RepsurfDynamicVFE

    b = _batch(seed=2)
    m = RepsurfDynamicVFE(
        voxel_size=(0.4, 0.4, 0.4), point_cloud_range=(-4, -4, -1, 4, 4, 1),
        voxel_cap=512, mlp_channels=(16, 24),
    )
    v = m.init(jax.random.PRNGKey(0), b, train=True)
    out, _ = m.apply(v, b, train=True, mutable=["batch_stats"])
    vf = np.asarray(out["voxel_features"])
    assert vf.shape[1] == 24 + 10  # mlp out + repsurf channels
    assert np.isfinite(vf).all()
    assert np.asarray(out["voxel_valid"]).sum() > 0


def test_temporal_vfe_sequence_edges():
    from pcseqlearning_tpu.models.vfe import TemporalVFE

    rng = np.random.RandomState(0)
    # two sweeps of the same 32 points shifted by 0.1 -> cross-sweep NN
    base = rng.rand(32, 3).astype(np.float32) * 5
    pts = np.concatenate([
        np.concatenate([np.zeros((32, 1)), base], 1),
        np.concatenate([np.ones((32, 1)), base + 0.1], 1),
    ]).astype(np.float32)
    bd = {"point_bxyz": jnp.asarray(pts), "point_feat": jnp.zeros((64, 1)),
          "batch_size": 2}
    m = TemporalVFE(voxel_size=(0.1,) * 3, point_cloud_range=(0, 0, 0, 5, 5, 5), voxel_cap=64)
    out = m.apply(m.init(jax.random.PRNGKey(0), bd), bd)
    ok = np.asarray(out["sequence_edge_valid"])
    dst = np.asarray(out["sequence_edge_dst"])
    # sweep-0 points link to their shifted twin in sweep 1
    assert ok[:32].all()
    assert (dst[:32] == np.arange(32) + 32).mean() > 0.9
    # sweep-1 points have no next sweep
    assert not ok[32:].any()
