import jax
import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.models.blocks import (
    EdgeConvBlock, GraphAttentionBlock, KPConvBlock, MessagePassingBlock,
)
from pcseqlearning_tpu.models.backbones_point import PointNet2MSG


def _graph(rng, n=64, k=8):
    feats = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    xyz = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (n, k)).astype(np.int32))
    mask = jnp.asarray(rng.rand(n, k) > 0.3)
    valid = jnp.asarray(np.arange(n) < 56)
    return feats, xyz, idx, mask, valid


def test_edge_conv(rng):
    feats, xyz, idx, mask, valid = _graph(rng)
    m = EdgeConvBlock(out_channels=32, mlp=(16,))
    v = m.init(jax.random.PRNGKey(0), feats, idx, mask, valid, train=True)
    out = m.apply(v, feats, idx, mask, valid, train=False)
    out = np.asarray(out)
    assert out.shape == (64, 32) and np.isfinite(out).all()
    assert np.abs(out[~np.asarray(valid)]).max() == 0


def test_message_passing(rng):
    feats, xyz, idx, mask, valid = _graph(rng)
    e_src = jnp.asarray(rng.randint(0, 64, 256).astype(np.int32))
    e_dst = jnp.asarray(rng.randint(0, 64, 256).astype(np.int32))
    e_mask = jnp.asarray(rng.rand(256) > 0.2)
    m = MessagePassingBlock(out_channels=24)
    v = m.init(jax.random.PRNGKey(0), feats, feats, xyz, xyz, e_src, e_dst, e_mask, train=True)
    out = np.asarray(m.apply(v, feats, feats, xyz, xyz, e_src, e_dst, e_mask, train=False))
    assert out.shape == (64, 24) and np.isfinite(out).all()


def test_graph_attention(rng):
    feats, xyz, idx, mask, valid = _graph(rng)
    m = GraphAttentionBlock(out_channels=32, num_heads=4)
    v = m.init(jax.random.PRNGKey(0), feats, idx, mask, valid)
    out = np.asarray(m.apply(v, feats, idx, mask, valid))
    assert out.shape == (64, 32) and np.isfinite(out).all()


def test_kpconv(rng):
    feats, xyz, idx, mask, valid = _graph(rng)
    m = KPConvBlock(out_channels=32, num_kernel_points=9, sigma=0.5)
    v = m.init(jax.random.PRNGKey(0), feats, xyz, idx, mask, valid, train=True)
    out = np.asarray(m.apply(v, feats, xyz, idx, mask, valid, train=False))
    assert out.shape == (64, 32) and np.isfinite(out).all()


def test_pointnet2_backbone(rng):
    n = 256
    batch = {
        "point_bxyz": jnp.asarray(np.concatenate(
            [rng.randint(0, 2, (n, 1)), rng.rand(n, 3) * 10], 1).astype(np.float32)),
        "point_feat": jnp.asarray(rng.rand(n, 1).astype(np.float32)),
    }
    m = PointNet2MSG(npoints=(64, 16), radii=(1.0, 2.0), nsamples=(8, 8), channels=(16, 32))
    v = jax.jit(lambda b: m.init(jax.random.PRNGKey(0), b, train=True))(batch)
    out = jax.jit(lambda v, b: m.apply(v, b, train=False, mutable=False)["point_features"])(v, batch)
    out = np.asarray(out)
    assert out.shape[0] == n and np.isfinite(out).all()
