"""Backprojection / normals / subsampling tests against closed-form planes
(SURVEY.md §5.1)."""
import jax
import jax.numpy as jnp
import numpy as np

from icra20_hand_object_pose_tpu.ops import camera, preprocess

FX, FY, CX, CY = 300.0, 300.0, 64.0, 48.0
H, W = 96, 128


def plane_depth(n, d):
    """Depth image of plane n.x = d (n_z > 0) under intrinsics above."""
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    rx = (u - CX) / FX
    ry = (v - CY) / FY
    # p = z*(rx, ry, 1); n.p = d -> z = d / (n.(rx,ry,1))
    denom = n[0] * rx + n[1] * ry + n[2]
    return (d / denom).astype(np.float32)


def test_backproject_project_roundtrip():
    depth = jnp.asarray(plane_depth(np.array([0.1, -0.05, 1.0]), 0.6))
    cloud = camera.backproject(depth, FX, FY, CX, CY)
    uv, z = camera.project(cloud.reshape(-1, 3), FX, FY, CX, CY)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    np.testing.assert_allclose(np.asarray(uv[:, 0]).reshape(H, W), u, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[:, 1]).reshape(H, W), v, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z).reshape(H, W), np.asarray(depth), atol=1e-5)


def test_grid_normals_on_plane():
    n_gt = np.array([0.2, 0.1, 1.0])
    n_gt = n_gt / np.linalg.norm(n_gt)
    depth = jnp.asarray(plane_depth(n_gt, 0.5))
    cloud = camera.backproject(depth, FX, FY, CX, CY)
    valid = depth > 0
    normals = camera.grid_normals(cloud, valid)
    inner = np.asarray(normals)[2:-2, 2:-2]
    # camera-facing orientation -> normal is -n_gt (points toward camera)
    cos = inner @ (-n_gt)
    assert cos.mean() > 0.999


def test_preprocess_static_shapes_and_weights():
    n_gt = np.array([0.0, 0.0, 1.0])
    depth = plane_depth(n_gt, 0.5)
    depth[:, : W // 2] = 0.0  # half the image invalid
    sc = preprocess.preprocess_frame(
        jax.random.key(0), jnp.asarray(depth),
        fx=FX, fy=FY, cx=CX, cy=CY,
        depth_min=0.1, depth_max=2.0, n_points=1024, render_factor=2,
    )
    assert sc.points.shape == (1024, 3)
    assert sc.normals.shape == (1024, 3)
    assert sc.weights.shape == (1024,)
    assert sc.depth.shape == (H // 2, W // 2)
    w = np.asarray(sc.weights)
    assert set(np.unique(w)).issubset({0.0, 1.0})
    assert w.sum() > 1000  # plenty of valid pixels available
    pts = np.asarray(sc.points)[w > 0]
    np.testing.assert_allclose(pts[:, 2], 0.5, atol=1e-4)
    assert np.all(pts[:, 0] >= -CX / FX * 0.5 - 1e-3)  # in frustum


def test_preprocess_few_valid_pixels_pads():
    depth = np.zeros((H, W), np.float32)
    depth[40:50, 60:70] = 0.5  # only 100 valid pixels
    sc = preprocess.preprocess_frame(
        jax.random.key(0), jnp.asarray(depth),
        fx=FX, fy=FY, cx=CX, cy=CY,
        depth_min=0.1, depth_max=2.0, n_points=512,
    )
    w = np.asarray(sc.weights)
    assert 0 < w.sum() <= 100
    # padded points are far away
    assert np.all(np.asarray(sc.points)[w == 0] > 1e5)


def test_extra_invalid_mask():
    depth = plane_depth(np.array([0.0, 0.0, 1.0]), 0.5)
    mask = np.zeros((H, W), bool)
    mask[:, W // 2:] = True
    sc = preprocess.preprocess_frame(
        jax.random.key(0), jnp.asarray(depth),
        fx=FX, fy=FY, cx=CX, cy=CY,
        depth_min=0.1, depth_max=2.0, n_points=256,
        extra_invalid=jnp.asarray(mask),
    )
    pts = np.asarray(sc.points)[np.asarray(sc.weights) > 0]
    # all surviving points in left half: x < (W/2 - CX)/FX * z
    assert np.all(pts[:, 0] < (W / 2 - CX) / FX * 0.5 + 1e-3)


def test_downsample_depth_min_pool():
    d = np.full((8, 8), 2.0, np.float32)
    d[0, 0] = 1.0
    v = d > 0
    dd, vv = preprocess.downsample_depth(jnp.asarray(d), jnp.asarray(v), 4)
    assert dd.shape == (2, 2)
    assert float(dd[0, 0]) == 1.0  # min-pool keeps foreground
    assert np.all(np.asarray(vv))


def test_preprocess_jits():
    depth = jnp.asarray(plane_depth(np.array([0.0, 0.0, 1.0]), 0.5))
    f = jax.jit(
        lambda k, d: preprocess.preprocess_frame(
            k, d, fx=FX, fy=FY, cx=CX, cy=CY,
            depth_min=0.1, depth_max=2.0, n_points=512,
        )
    )
    sc = f(jax.random.key(0), depth)
    assert sc.points.shape == (512, 3)


def test_speckle_mask_removes_isolated_outliers():
    """Grid statistical outlier removal (SURVEY.md §2 L2): isolated
    flying pixels are dropped, coherent surfaces (incl. their edge
    pixels) survive."""
    import jax.numpy as jnp

    from icra20_hand_object_pose_tpu.ops.preprocess import speckle_mask

    H, W = 32, 32
    depth = np.zeros((H, W), np.float32)
    depth[8:24, 8:24] = 0.5                  # a coherent plane patch
    depth[2, 2] = 0.5                        # isolated speckle (valid, alone)
    depth[16, 16] = 0.9                      # flying pixel inside the patch
    valid = depth > 0
    kept = np.asarray(speckle_mask(
        jnp.asarray(depth), jnp.asarray(valid), tau=0.02, min_neighbors=2))
    assert not kept[2, 2], "isolated speckle must be removed"
    assert not kept[16, 16], "flying pixel must be removed"
    assert kept[8, 8] and kept[8, 23] and kept[15, 15], \
        "plane interior and edges must survive"
    # everything kept was valid to begin with
    assert not np.any(kept & ~valid)


def test_preprocess_frame_outlier_gate():
    """outlier_tau > 0 drops speckle before subsampling; 0 keeps it."""
    import jax
    import jax.numpy as jnp

    from icra20_hand_object_pose_tpu.ops.preprocess import preprocess_frame

    H, W = 48, 64
    depth = np.zeros((H, W), np.float32)
    depth[16:36, 20:48] = 0.5
    # a cluster of isolated flying pixels far in front
    for i, (r, c) in enumerate([(4, 4), (4, 10), (10, 4), (40, 55)]):
        depth[r, c] = 0.3
    kw = dict(fx=58.0, fy=58.0, cx=32.0, cy=24.0, depth_min=0.1,
              depth_max=2.0, n_points=256, render_factor=1)
    key = jax.random.key(0)
    sc_off = preprocess_frame(key, jnp.asarray(depth), outlier_tau=0.0, **kw)
    sc_on = preprocess_frame(key, jnp.asarray(depth), outlier_tau=0.02, **kw)
    # with the gate on, no subsampled point sits at the speckle depth
    z_on = np.asarray(sc_on.points)[np.asarray(sc_on.weights) > 0][:, 2]
    assert np.all(np.abs(z_on - 0.5) < 0.05)
    assert not np.asarray(sc_on.valid_full)[4, 4]
    assert np.asarray(sc_off.valid_full)[4, 4]


def test_neutral_class_tracks_excluded_measurements():
    """SceneCloud.neutral/neutral_full mark pixels the camera measured in
    range that segmentation excluded (extra_invalid drop, speckle), and
    NOT out-of-range/missing pixels; the low-res mask is an any-pool of
    the full-res one (a cell inherits the class from any constituent)."""
    depth = plane_depth(np.array([0.0, 0.0, 1.0]), 0.5)
    depth[:8, :8] = 0.0                      # sensor dropout: not neutral
    mask = np.zeros((H, W), bool)
    mask[:, W // 2:] = True                  # e.g. hand drop: neutral
    sc = preprocess.preprocess_frame(
        jax.random.key(0), jnp.asarray(depth),
        fx=FX, fy=FY, cx=CX, cy=CY,
        depth_min=0.1, depth_max=2.0, n_points=256,
        extra_invalid=jnp.asarray(mask), render_factor=4,
    )
    nf = np.asarray(sc.neutral_full)
    assert nf[:, W // 2:].all(), "dropped measured pixels must be neutral"
    assert not nf[8:, : W // 2].any(), "kept pixels must not be neutral"
    assert not nf[:8, :8].any(), "no-return pixels must not be neutral"
    # low-res any-pool: cells straddling the half-image boundary included
    nl = np.asarray(sc.neutral)
    assert nl.shape == (H // 4, W // 4)
    assert nl[:, (W // 2) // 4:].all()
    assert not nl[2:, : (W // 2) // 4 - 1].any()


def test_downsample_mask_any():
    m = np.zeros((8, 8), bool)
    m[3, 5] = True
    out = np.asarray(preprocess.downsample_mask_any(jnp.asarray(m), 4))
    assert out.shape == (2, 2) and out[0, 1] and out.sum() == 1
