"""Coverage for the remaining op/data surface: knn_point, select_top_k,
query_ball_point2, augmentations (host + on-device distributional checks),
config factory, tuple concat, and IO roundtrips."""

import jax
import jax.numpy as jnp
import numpy as np

from dh3d_tpu import config as cfglib, ops
from dh3d_tpu.data import augment, io
from dh3d_tpu.nn.model import concat_tuple_clouds


def test_knn_point_squared_dists(rng):
    xyz1 = rng.randn(2, 32, 3).astype(np.float32)
    xyz2 = rng.randn(2, 8, 3).astype(np.float32)
    d, idx = ops.knn_point(4, jnp.asarray(xyz1), jnp.asarray(xyz2))
    full = np.sum((xyz2[:, :, None] - xyz1[:, None]) ** 2, -1)
    expect_d = np.sort(full, axis=-1)[..., :4]
    np.testing.assert_allclose(np.asarray(d), expect_d, atol=1e-4)


def test_select_top_k_ascending(rng):
    dist = rng.rand(1, 5, 20).astype(np.float32)
    d, idx = ops.select_top_k(6, jnp.asarray(dist))
    np.testing.assert_allclose(
        np.asarray(d), np.sort(dist, axis=-1)[..., :6], atol=1e-6
    )
    assert (np.diff(np.asarray(d), axis=-1) >= 0).all()


def test_query_ball_point2_per_query_radii(rng):
    xyz1 = rng.randn(1, 64, 3).astype(np.float32)
    xyz2 = rng.randn(1, 4, 3).astype(np.float32)
    radii = np.array([[0.5, 1.0, 2.0, 0.1]], np.float32)
    idx, cnt = ops.query_ball_point2(8, jnp.asarray(xyz1), jnp.asarray(xyz2),
                                     jnp.asarray(radii))
    d = np.sqrt(np.sum((xyz2[0][:, None] - xyz1[0][None]) ** 2, -1))
    for j in range(4):
        inside = np.where(d[j] < radii[0, j])[0]
        expect = np.sum(d[j] < radii[0, j])
        assert int(cnt[0, j]) == min(expect, expect)  # cnt caps at nsample
        got = np.asarray(idx[0, j][: min(8, len(inside))])
        if len(inside):
            np.testing.assert_array_equal(got, inside[:8][: len(got)])


def test_host_augmentations_shapes_and_distributions(rng):
    pts = rng.randn(500, 3).astype(np.float64)
    for name in ["Jitter", "Shift", "Rotate1D", "RotateSmall", "Scale"]:
        augs = augment.get_augmentations_from_list([name])
        assert len(augs) == 1
        out = augs[0].apply(pts.copy(), rng)
        assert out.shape == pts.shape
    # RotateZ preserves z and norms
    rot = augment.RotateZ().apply(pts.copy(), rng)
    np.testing.assert_allclose(rot[:, 2], pts[:, 2], atol=1e-12)
    np.testing.assert_allclose(
        np.linalg.norm(rot[:, :2], axis=1),
        np.linalg.norm(pts[:, :2], axis=1), atol=1e-9,
    )


def test_jax_augment_matches_host_semantics(rng):
    pts = jnp.asarray(rng.randn(200, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out = augment.jax_augment(key, pts, ["Rotate1D", "Jitter", "RotateSmall"])
    assert out.shape == pts.shape
    # rotation-only preserves norms
    rot = augment.jax_rotate_z(key, pts)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rot), axis=1),
        np.linalg.norm(np.asarray(pts), axis=1), atol=1e-4,
    )


def test_config_presets_and_roundtrip(tmp_path):
    for name in ["basic_config", "detection_config", "global_config"]:
        cfg = cfglib.get_config(name)
        assert cfg.num_points == 8192
        assert cfg.missing_key is None  # silent-None dotdict
    cfg = cfglib.get_config("global_config")
    p = tmp_path / "config.json"
    cfglib.save_config(cfg, str(p))
    cfg2 = cfglib.load_config(str(p))
    assert cfg2.gl_dims == [256]
    assert cfg2.num_neg == 8


def test_concat_tuple_clouds():
    cfg = cfglib.get_config("global_config")
    cfg.num_points = 16
    anchor = jnp.zeros((2, 16, 3))
    pos = jnp.ones((2, 32, 3))       # 2 pos per anchor, flattened
    neg = jnp.full((2, 8 * 16, 3), 2.0)
    otherneg = jnp.full((2, 16, 3), 3.0)
    out = concat_tuple_clouds(cfg, anchor, pos, neg, otherneg)
    assert out.shape == (2 + 4 + 16 + 2, 16, 3)
    np.testing.assert_allclose(np.asarray(out[:2]), 0)
    np.testing.assert_allclose(np.asarray(out[2:6]), 1)
    np.testing.assert_allclose(np.asarray(out[-2:]), 3)


def test_bin_io_roundtrip(tmp_path, rng):
    pts = rng.randn(100, 3).astype(np.float32)
    f = tmp_path / "cloud.bin"
    io.write_to_bin(pts, str(f))
    back = io.load_single_pcfile(str(f), dim=3)
    np.testing.assert_array_equal(back, pts)
    desc = rng.randn(10, 131).astype(np.float32)
    f2 = tmp_path / "desc.bin"
    io.write_to_bin(desc, str(f2))
    np.testing.assert_array_equal(io.load_descriptor_bin(str(f2), 131), desc)


def test_get_fixednum_pcd_pads_and_crops(rng):
    # undersized with sentinel padding
    small = rng.randn(50, 3).astype(np.float32) * 0.1  # dense -> no outliers
    out, ori = io.get_fixednum_pcd(small, 80, randsample=False, rng=rng)
    assert out.shape == (80, 3)
    assert (out[ori:] == 100000).all()
    # oversized
    big = rng.randn(300, 3).astype(np.float32) * 0.1
    out, ori = io.get_fixednum_pcd(big, 100, rng=rng)
    assert out.shape == (100, 3)
    assert ori == 100
