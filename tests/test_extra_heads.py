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


def test_hybrid_seg_head_and_losses(rng):
    import jax
    import jax.numpy as jnp
    from pcseqlearning_tpu.models.extra_heads import (
        HybridSegHead, ImplicitReconstructionHead, PointSequenceReconstructionHead)

    n = 128
    bd = {
        "point_features": jnp.asarray(rng.rand(n, 16).astype(np.float32)),
        "point_coords": jnp.asarray(
            np.concatenate([np.zeros((n, 1)), rng.rand(n, 3) * 4], 1).astype(np.float32)),
        "point_valid": jnp.ones(n, bool),
    }
    head = HybridSegHead(num_classes=5)
    v = head.init(jax.random.PRNGKey(0), bd, train=True)
    out, _ = head.apply(v, dict(bd), train=True, mutable=["batch_stats"])
    labels = jnp.asarray(rng.randint(0, 5, n))
    l = HybridSegHead.loss(out, labels, out["point_valid"])
    assert np.isfinite(float(l)) and float(l) > 0

    rec = ImplicitReconstructionHead(latent=(16,), num_samples_per_dim=2)
    v = rec.init(jax.random.PRNGKey(0), dict(bd), train=True)
    out, _ = rec.apply(v, dict(bd), train=True, mutable=["batch_stats"])
    assert out["rec_occupancy_logits"].shape == (n, 8)
    l = ImplicitReconstructionHead.loss(out)
    assert np.isfinite(float(l))

    seq = PointSequenceReconstructionHead(latent=(16,), num_predicted_points=4)
    v = seq.init(jax.random.PRNGKey(0), dict(bd), train=True)
    out, _ = seq.apply(v, dict(bd), train=True, mutable=["batch_stats"])
    assert out["rec_pred_nbrhood"].shape == (n, 4, 3)
    l = PointSequenceReconstructionHead.loss(out)
    assert np.isfinite(float(l)) and float(l) >= 0


def test_ohem_losses(rng):
    import jax.numpy as jnp
    from pcseqlearning_tpu.utils.loss_utils import ohem_ce_loss, ohem_reg_loss

    logits = jnp.asarray(rng.randn(100, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, 100))
    l = ohem_ce_loss(logits, labels, jnp.ones(100, bool), thresh=0.7)
    assert np.isfinite(float(l)) and float(l) > 0
    # confident-correct rows contribute nothing
    easy = jnp.asarray(np.eye(4, dtype=np.float32)[np.zeros(50, int)] * 50)
    l2 = ohem_ce_loss(easy, jnp.zeros(50, jnp.int32), jnp.ones(50, bool), thresh=0.7, min_kept=0.0)
    assert float(l2) < 1e-3

    r = ohem_reg_loss(jnp.ones((4, 2)), jnp.zeros((4, 2)),
                      jnp.asarray([0.0, 0.4, 1.0, 3.0]), {0.3: 2.0, 2.0: 5.0})
    assert abs(float(r) - np.mean([1, 2, 2, 5])) < 1e-5


def test_implicit_recon_visibility_labels():
    """Pin the spherical-projection occupancy semantics (reference
    compute_occupancy, implicit_reconstruction_head.py:81-117): a sample
    IN FRONT of its matched return (projection < rho) is free (label 0); a
    sample AT/BEYOND the return is occupied (label 1)."""
    import jax.numpy as jnp
    from pcseqlearning_tpu.models.extra_heads import ImplicitReconstructionHead

    bd_base = {
        "point_coords": jnp.asarray([[0.0, 10.0, 0.0, 0.0]]),  # rho = 10
        "point_valid": jnp.ones(1, bool),
        # sample 0 in front of the return (proj 9 < 10 -> free),
        # sample 1 just beyond it (proj 10.1 >= 10 -> occupied)
        "rec_sample_xyz": jnp.asarray([[[9.0, 0.0, 0.0], [10.1, 0.0, 0.0]]]),
    }
    right = dict(bd_base, rec_occupancy_logits=jnp.asarray([[-8.0, 8.0]]))
    wrong = dict(bd_base, rec_occupancy_logits=jnp.asarray([[8.0, -8.0]]))
    l_right = float(ImplicitReconstructionHead.loss(right))
    l_wrong = float(ImplicitReconstructionHead.loss(wrong))
    assert l_right < 1e-3, l_right
    assert l_wrong > 1.0, l_wrong
