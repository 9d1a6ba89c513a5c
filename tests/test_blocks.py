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


# ---- assigners + kernel-indexed message passing (grid conv family) --------

def test_grid_assigners_oracle(rng):
    """Assigner indices match a direct numpy port of the reference loops
    (assigners.py: GridAssigner:68-85, Grid3x3Assigner:87-110,
    GeometricAssigner:112-131, GridVolumeAssigner:44-65)."""
    from pcseqlearning_tpu.models.blocks import (
        compute_conv3d_positions, geometric_assigner, grid3x3_assigner,
        grid_assigner, grid_volume_assigner,
    )

    E = 200
    rel_c = rng.randint(-1, 2, (E, 3))
    want = np.zeros(E, np.int64)
    for i in (2, 1, 0):
        want = want * 3 + (np.sign(rel_c[:, i]) + 1)
    got = np.asarray(grid_assigner(jnp.asarray(rel_c.astype(np.int32))))
    assert (got == want).all()
    assert got.min() >= 0 and got.max() < 27

    rel_x = (rng.rand(E, 3).astype(np.float32) - 0.5) * 0.4
    hv = np.asarray([0.1, 0.1, 0.05], np.float32)
    want = np.zeros(E, np.int64)
    for i in (2, 1, 0):
        s = np.sign(rel_x[:, i])
        s[(rel_x[:, i] < hv[i]) & (rel_x[:, i] > -hv[i])] = 0
        want = want * 3 + (s + 1)
    got = np.asarray(grid3x3_assigner(jnp.asarray(rel_x), hv))
    assert (got == want).all()

    kp = compute_conv3d_positions([0.2, 0.2, 0.1])
    d = np.linalg.norm(rel_x[:, None, :] - np.asarray(kp)[None], axis=-1)
    want = d.argmin(1)
    got = np.asarray(geometric_assigner(jnp.asarray(rel_x), kp))
    assert (got == want).all()

    vm = rng.rand(64) > 0.5
    e_q = rng.randint(0, 64, E)
    got = np.asarray(grid_volume_assigner(
        jnp.asarray(rel_c.astype(np.int32)), jnp.asarray(vm), jnp.asarray(e_q)))
    base = np.zeros(E, np.int64)
    for i in (2, 1, 0):
        base = base * 3 + (np.sign(rel_c[:, i]) + 1)
    assert (got == 2 * base + vm[e_q]).all()
    assert got.max() < 54


def test_kernel_message_passing_oracle(rng):
    """Segment-sum-then-einsum == the reference's per-edge gather_mm oracle
    (message_passing_v2.message_passing_naive:66-78)."""
    from pcseqlearning_tpu.models.blocks import KernelMessagePassing

    N, M, E, K, cin, cout = 40, 24, 300, 9, 8, 12
    feats = rng.randn(N, cin).astype(np.float32)
    e_ref = rng.randint(0, N, E).astype(np.int32)
    e_query = rng.randint(0, M, E).astype(np.int32)
    e_kernel = rng.randint(0, K, E).astype(np.int32)
    e_mask = rng.rand(E) > 0.25
    e_weight = rng.rand(E).astype(np.float32)

    m = KernelMessagePassing(out_channels=cout, num_kernels=K)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(e_kernel),
               jnp.asarray(e_ref), jnp.asarray(e_query), M, jnp.asarray(e_mask),
               jnp.asarray(e_weight))
    out = np.asarray(m.apply(v, jnp.asarray(feats), jnp.asarray(e_kernel),
                             jnp.asarray(e_ref), jnp.asarray(e_query), M,
                             jnp.asarray(e_mask), jnp.asarray(e_weight)))
    w = np.asarray(v["params"]["kernel_weights"])
    want = np.zeros((M, cout), np.float32)
    for e in range(E):
        if e_mask[e]:
            want[e_query[e]] += (feats[e_ref[e]] * e_weight[e]) @ w[e_kernel[e]]
    assert np.abs(out - want).max() < 1e-4, np.abs(out - want).max()


def test_grid_conv_block_runs(rng):
    from pcseqlearning_tpu.models.blocks import GridConvBlock, grid_assigner

    N, M, E = 40, 24, 200
    feats = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    e_ref = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
    e_query = jnp.asarray(rng.randint(0, M, E).astype(np.int32))
    rel = jnp.asarray(rng.randint(-1, 2, (E, 3)).astype(np.int32))
    e_kernel = grid_assigner(rel)
    e_mask = jnp.asarray(rng.rand(E) > 0.2)
    q_valid = jnp.asarray(np.arange(M) < 20)
    m = GridConvBlock(out_channels=16)
    v = m.init(jax.random.PRNGKey(0), feats, e_kernel, e_ref, e_query, M,
               e_mask, q_valid, train=True)
    out = np.asarray(m.apply(v, feats, e_kernel, e_ref, e_query, M, e_mask,
                             q_valid, train=False))
    assert out.shape == (M, 16) and np.isfinite(out).all()
    assert np.abs(out[20:]).max() == 0


def test_ball_positions(rng):
    from pcseqlearning_tpu.models.blocks import compute_ball_positions

    kp = np.asarray(compute_ball_positions(15, radius=0.9))
    assert kp.shape == (15, 3)
    assert (np.linalg.norm(kp, axis=-1) <= 0.9 + 1e-5).all()
    d = np.linalg.norm(kp[:, None] - kp[None, :], axis=-1)
    d[np.arange(15), np.arange(15)] = 1e9
    assert d.min() > 0.2  # FPS spreads the points out
