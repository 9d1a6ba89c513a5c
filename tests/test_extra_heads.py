import jax
import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.models.extra_heads import (
    EmbedSegHead, PointIntraPartOffsetHead, PrimitiveHead, VoxelSegHead, lovasz_softmax,
)


def test_part_offset_targets(rng):
    coords = jnp.asarray(np.concatenate(
        [np.zeros((50, 1)), rng.rand(50, 3) * 4 - 2], 1).astype(np.float32))
    gt = jnp.asarray(np.array([[0, 0, 0, 2, 2, 2, 0, 1]], np.float32))
    labels, part = PointIntraPartOffsetHead.build_targets(coords, gt)
    labels, part = np.asarray(labels), np.asarray(part)
    inside = (np.abs(np.asarray(coords)[:, 1:4]) < 1.0).all(1)
    assert (labels[inside] == 1).all()
    assert (labels[~inside] == 0).all()
    # part coords: canonical box coords in [0,1], center point -> 0.5
    xyz = np.asarray(coords)[:, 1:4]
    expect = np.clip(xyz / 2 + 0.5, 0, 1)
    np.testing.assert_allclose(part[inside], expect[inside], atol=1e-5)


def test_voxel_seg_head_and_lovasz(rng):
    n, nc = 64, 5
    batch = {
        "voxel_features": jnp.asarray(rng.randn(n, 16).astype(np.float32)),
        "voxel_valid": jnp.asarray(np.arange(n) < 50),
    }
    m = VoxelSegHead(num_classes=nc)
    v = m.init(jax.random.PRNGKey(0), batch, train=True)
    out = m.apply(v, batch, train=False)
    labels = jnp.asarray(rng.randint(0, nc, n))
    loss = VoxelSegHead.loss(out, labels, batch["voxel_valid"], use_lovasz=True)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # perfect predictions -> lovasz ~ 0
    perfect = jax.nn.one_hot(labels, nc) * 1.0
    lv = lovasz_softmax(perfect, labels, batch["voxel_valid"])
    assert float(lv) < 0.05


def test_embed_seg_discriminative(rng):
    n, d = 60, 8
    inst = np.repeat(np.arange(3), 20)
    # well-separated embeddings -> low loss
    embed = jnp.asarray((rng.randn(n, d) * 0.05 + inst[:, None] * 10).astype(np.float32))
    loss_good = EmbedSegHead.discriminative_loss(embed, jnp.asarray(inst), jnp.ones(n, bool), 3)
    # collapsed embeddings -> high loss
    embed_bad = jnp.asarray(rng.randn(n, d).astype(np.float32) * 0.01)
    loss_bad = EmbedSegHead.discriminative_loss(embed_bad, jnp.asarray(inst), jnp.ones(n, bool), 3)
    assert float(loss_good) < float(loss_bad)


def test_primitive_head(rng):
    n = 32
    batch = {
        "voxel_features": jnp.asarray(rng.randn(n, 10).astype(np.float32)),
        "voxel_valid": jnp.ones(n, bool),
    }
    m = PrimitiveHead()
    v = m.init(jax.random.PRNGKey(0), batch, train=True)
    out = m.apply(v, batch, train=False)
    nrm = np.linalg.norm(np.asarray(out["primitive_normal_preds"]), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
    gt_n = np.asarray(out["primitive_normal_preds"])
    loss = PrimitiveHead.loss(out, jnp.asarray(gt_n), jnp.ones(n, bool))
    assert float(loss) < 1e-5  # identical normals -> zero loss
