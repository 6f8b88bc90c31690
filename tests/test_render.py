"""Depth renderer tests: analytic planes, splat-vs-raster consistency,
batched==loop (SURVEY.md §3 "Offscreen depth renderer" rebuild)."""
import jax
import jax.numpy as jnp
import numpy as np

from icra20_hand_object_pose_tpu.ops import render
from icra20_hand_object_pose_tpu.utils import meshio, se3

FX = FY = 120.0
CX, CY = 64.0, 48.0
H, W = 96, 128
CAM = dict(fx=FX, fy=FY, cx=CX, cy=CY, height=H, width=W)


def test_splat_plane_depth():
    # dense grid of points on plane z=0.5 spanning the frustum
    xs = np.linspace(-0.25, 0.25, 200)
    ys = np.linspace(-0.19, 0.19, 160)
    g = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
    pts = np.concatenate([g, np.full((len(g), 1), 0.5)], -1).astype(np.float32)
    d = render.splat_depth(jnp.asarray(pts), jnp.ones(len(pts)), **CAM)
    dn = np.asarray(d)
    filled = np.isfinite(dn)
    assert filled.mean() > 0.95
    np.testing.assert_allclose(dn[filled], 0.5, atol=1e-5)


def test_splat_zbuffer_keeps_nearest():
    pts = np.array([[0.0, 0.0, 0.8], [0.0, 0.0, 0.5]], np.float32)
    d = render.splat_depth(jnp.asarray(pts), jnp.ones(2), **CAM)
    assert abs(float(d[int(CY), int(CX)]) - 0.5) < 1e-6


def test_splat_ignores_padding_and_behind():
    pts = np.array([[0.0, 0.0, 0.5], [0.0, 0.0, -0.5], [0.0, 0.0, 0.4]], np.float32)
    w = jnp.asarray([1.0, 1.0, 0.0])  # third is padding despite being nearer
    d = render.splat_depth(jnp.asarray(pts), w, **CAM)
    assert abs(float(d[int(CY), int(CX)]) - 0.5) < 1e-6


def test_raster_box_front_face():
    mesh = meshio.make_box((0.2, 0.2, 0.1))
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.6  # front face at z=0.55
    v = jnp.asarray(mesh.vertices @ T[:3, :3].T + T[:3, 3])
    d = render.raster_depth(v, jnp.asarray(mesh.faces), **CAM)
    dn = np.asarray(d)
    c = dn[int(CY), int(CX)]
    np.testing.assert_allclose(c, 0.55, atol=1e-4)
    # projected half-extent: 0.1/0.55*120 ~ 21.8 px
    assert np.isfinite(dn[int(CY), int(CX + 20)])
    assert not np.isfinite(dn[int(CY), int(CX + 30)])


def test_splat_matches_raster_on_sphere():
    mesh = meshio.make_icosphere(0.06, 3)
    T = se3.make_pose(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.5]))
    v = se3.transform_points(T, jnp.asarray(mesh.vertices))
    d_ref = np.asarray(render.raster_depth(v, jnp.asarray(mesh.faces), **CAM))
    pts, _ = mesh.sample_surface(8000, seed=0)
    p = se3.transform_points(T, jnp.asarray(pts))
    d_splat = np.asarray(render.splat_depth(p, jnp.ones(len(pts)), **CAM))
    both = np.isfinite(d_ref) & np.isfinite(d_splat)
    assert both.sum() > 0.8 * np.isfinite(d_ref).sum()
    # splat dilates the silhouette by ~1px where the depth gradient is
    # steep; compare interior pixels only
    from scipy.ndimage import binary_erosion
    interior = binary_erosion(np.isfinite(d_ref), iterations=2) & both
    assert interior.sum() > 200
    np.testing.assert_allclose(d_splat[interior], d_ref[interior], atol=0.015)


def test_splat_batched_matches_loop():
    mesh = meshio.make_test_object("box")
    pts, _ = mesh.sample_surface(1000, seed=1)
    keys = jax.random.split(jax.random.key(0), 4)
    base = se3.make_pose(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.5]))
    Ts = jnp.stack([se3.perturb_pose(k, base, 0.3, 0.02) for k in keys])
    P = se3.transform_points(Ts, jnp.asarray(pts))  # [4,N,3]
    batched = render.splat_depth_batched(P, jnp.ones(1000), **CAM)
    for i in range(4):
        single = render.splat_depth(P[i], jnp.ones(1000), **CAM)
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(single))


def test_render_jit_compiles_once():
    mesh = meshio.make_test_object("box")
    pts = jnp.asarray(mesh.sample_surface(500, seed=2)[0])
    f = jax.jit(lambda p: render.splat_depth(p, jnp.ones(500), **CAM))
    a = f(pts + jnp.asarray([0.0, 0.0, 0.5]))
    b = f(pts + jnp.asarray([0.01, 0.0, 0.5]))
    assert a.shape == b.shape == (H, W)


def test_splat_pool_matches_scatter_loop():
    """The pooled splat must be bitwise-identical to the naive
    footprint-scatter loop it replaced (min commutes with dilation),
    including points whose CENTER falls off-image within the radius."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n, H, W = 400, 37, 53
    fx = fy = 40.0; cx, cy = W / 2, H / 2
    pts = np.stack([
        rng.uniform(-1.0, 1.0, n), rng.uniform(-0.7, 0.7, n),
        rng.uniform(0.3, 1.2, n)], -1).astype(np.float32)
    w = (rng.random(n) > 0.1).astype(np.float32)

    def naive(points_cam, weights, radius):
        z = points_cam[:, 2]
        valid = (z > 1e-6) & (weights > 0)
        safe_z = jnp.where(valid, z, 1.0)
        ui = jnp.round(points_cam[:, 0] / safe_z * fx + cx).astype(jnp.int32)
        vi = jnp.round(points_cam[:, 1] / safe_z * fy + cy).astype(jnp.int32)
        zbuf = jnp.full((H * W + 1,), jnp.inf, jnp.float32)
        zval = jnp.where(valid, z, jnp.inf)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                uu, vv = ui + dx, vi + dy
                inb = valid & (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
                flat = jnp.where(inb, vv * W + uu, H * W)
                zbuf = zbuf.at[flat].min(zval, mode="drop")
        return zbuf[: H * W].reshape(H, W)

    for radius in (0, 1, 2):
        got = render.splat_depth(
            jnp.asarray(pts), jnp.asarray(w), fx=fx, fy=fy, cx=cx, cy=cy,
            height=H, width=W, radius=radius,
        )
        want = naive(jnp.asarray(pts), jnp.asarray(w), radius)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
