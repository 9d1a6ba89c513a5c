"""VolumeSampler (models/sampler_utils.py) and PCAVolume
(models/volume_utils.py) against numpy oracles — reference semantics from
/root/reference/pcdet/models/model_utils/sampler_utils.py:134-224 and
volume_utils.py:27-84."""

import numpy as np
import pytest


def _np_volume_sampler(pts, voxel_size, stride, downsample_times, z_padding):
    """Oracle: replicate over the (2*stride[2]-1)^3 stencil, bin on the
    fine grid, keep sublattice-aligned occupied voxels."""
    s0, s1, s2 = stride
    offs = np.array([
        [dx / s0 * voxel_size[0], dy / s1 * voxel_size[1], dz / s2 * voxel_size[2]]
        for dx in range(-s2 + 1, s2)
        for dy in range(-s2 + 1, s2)
        for dz in range(-s2 + 1, s2)
    ])
    rep = (pts[None, :, 1:4] + offs[:, None, :]).reshape(-1, 3)
    b = np.tile(pts[:, 0], len(offs))
    fine = np.asarray(voxel_size) / np.asarray(downsample_times)
    origin = rep.min(0)
    coords = np.floor((rep - origin) / fine).astype(np.int64)
    key = np.concatenate([b[:, None].astype(np.int64), coords], axis=1)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    zp = 0 if z_padding == -1 else z_padding
    keep = (
        (uniq[:, 1] % downsample_times[0] == 0)
        & (uniq[:, 2] % downsample_times[1] == 0)
        & (uniq[:, 3] % downsample_times[2] == zp)
    )
    means = np.zeros((len(uniq), 3))
    for d in range(3):
        means[:, d] = np.bincount(inv, weights=rep[:, d], minlength=len(uniq))
    means /= np.bincount(inv, minlength=len(uniq))[:, None]
    return uniq[keep], means[keep], origin, fine


@pytest.mark.parametrize("stride,dst,zp", [([1, 1, 1], [1, 1, 1], 1),
                                           ([2, 2, 2], [2, 2, 2], 0),
                                           ([2, 2, 2], [2, 2, 1], -1)])
def test_volume_sampler_matches_numpy(stride, dst, zp):
    import jax.numpy as jnp

    from pcseqlearning_tpu.models.sampler_utils import VolumeSampler

    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [np.zeros((64, 1)), rng.rand(64, 3) * 4.0], axis=1).astype(np.float32)
    voxel_size = [0.8, 0.8, 0.8]
    samp = VolumeSampler(model_cfg=dict(
        VOXEL_SIZE=voxel_size, STRIDE=stride, DOWNSAMPLE_TIMES=dst, Z_PADDING=zp))
    out = samp(jnp.asarray(pts))
    got_coords = np.asarray(out.bcoords)[np.asarray(out.valid)]
    got_bxyz = np.asarray(out.bxyz)[np.asarray(out.valid)]
    want_coords, want_means, origin, fine = _np_volume_sampler(
        pts, voxel_size, stride, dst, zp)

    def key(c):
        return c[:, 0] * 10**9 + c[:, 1] * 10**6 + c[:, 2] * 10**3 + c[:, 3]

    got_key = key(got_coords.astype(np.int64))
    want_key = key(want_coords)
    assert len(got_key) == len(want_key)
    go, wo = np.argsort(got_key), np.argsort(want_key)
    np.testing.assert_array_equal(got_key[go], want_key[wo])
    np.testing.assert_allclose(
        got_bxyz[go, 1:4], want_means[wo], rtol=1e-4, atol=1e-4)
    # bcenter sits mid-cell on the fine grid
    centers = np.asarray(out.bcenter)[np.asarray(out.valid)][go, 1:4]
    np.testing.assert_allclose(
        centers, origin + (want_coords[wo, 1:4] + 0.5) * fine, rtol=1e-4, atol=1e-4)


def test_pca_volume_matches_numpy():
    import jax.numpy as jnp

    from pcseqlearning_tpu.models.sampler_utils import VoxelCenterSampler
    from pcseqlearning_tpu.models.volume_utils import PCAVolume

    rng = np.random.RandomState(1)
    # two well-separated anisotropic blobs
    blob_a = rng.randn(200, 3) * np.array([1.0, 0.2, 0.05]) + np.array([2.0, 2.0, 2.0])
    blob_b = rng.randn(200, 3) * np.array([0.1, 0.8, 0.3]) + np.array([14.0, 2.0, 2.0])
    base = np.concatenate(
        [np.zeros((400, 1)), np.concatenate([blob_a, blob_b])], axis=1
    ).astype(np.float32)

    vs = [8.0, 8.0, 8.0]  # each blob falls in one voxel
    ref = VoxelCenterSampler(model_cfg=dict(GRID_SIZE=vs))
    out = ref(jnp.asarray(base))
    refd = dict(bcenter=out[0], valid=out[1])
    vol = PCAVolume(model_cfg=dict(VOXEL_SIZE=vs, KERNEL_OFFSET=0))
    res = vol(refd, jnp.asarray(base))

    v = np.asarray(res["valid"]) & np.asarray(res["volume_mask"])
    got_mean = np.asarray(res["bxyz"])[v][:, 1:4]
    got_vol = np.asarray(res["volume"])[v]
    got_vals = np.asarray(res["eigvals"])[v]
    got_vecs = np.asarray(res["eigvecs"])[v]
    got_pmin = np.asarray(res["l1_proj_min"])[v]
    got_pmax = np.asarray(res["l1_proj_max"])[v]
    assert v.sum() == 2

    # oracle per blob (order by x)
    order = np.argsort(got_mean[:, 0])
    for slot, blob in zip(order, [blob_a, blob_b]):
        np.testing.assert_allclose(got_vol[slot], len(blob))
        np.testing.assert_allclose(got_mean[slot], blob.mean(0), atol=1e-4)
        d = blob - blob.mean(0)
        cov = d.T @ d / len(blob)
        w_vals, w_vecs = np.linalg.eigh(cov)
        np.testing.assert_allclose(got_vals[slot], w_vals, rtol=1e-3, atol=1e-5)
        # eigvectors up to sign
        dots = np.abs(np.sum(got_vecs[slot] * w_vecs, axis=0))
        np.testing.assert_allclose(dots, 1.0, atol=1e-3)
        proj = d @ got_vecs[slot]
        np.testing.assert_allclose(got_pmin[slot], proj.min(0), atol=1e-3)
        np.testing.assert_allclose(got_pmax[slot], proj.max(0), atol=1e-3)


def test_pca_volume_feeds_volume_graph():
    """End-to-end: PCAVolume output carries the exact fields VolumeGraph
    needs for PCA-extent-aware edge weights."""
    import jax.numpy as jnp

    from pcseqlearning_tpu.models.graph_utils import VolumeGraph
    from pcseqlearning_tpu.models.sampler_utils import VoxelCenterSampler
    from pcseqlearning_tpu.models.volume_utils import PCAVolume

    rng = np.random.RandomState(2)
    base = np.concatenate(
        [np.zeros((300, 1)), rng.rand(300, 3) * 6.0], axis=1).astype(np.float32)
    vs = [2.0, 2.0, 2.0]
    out = VoxelCenterSampler(model_cfg=dict(GRID_SIZE=vs))(jnp.asarray(base))
    refd = dict(bxyz=out[0], bcenter=out[0], valid=out[1])
    refd = PCAVolume(model_cfg=dict(VOXEL_SIZE=vs, KERNEL_OFFSET=0))(
        refd, jnp.asarray(base))
    g = VolumeGraph(dict(VOXEL_SIZE=vs, KERNEL_OFFSET=1, REF_KEY="bxyz"))
    e_src, e_dst, w, mask = g(refd, refd)
    assert w is not None
    w = np.asarray(w)[np.asarray(mask)]
    assert len(w) > 0 and (w >= 0).all() and (w <= 1.0 + 1e-6).all()
