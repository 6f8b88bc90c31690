"""Mesh IO and primitives (SURVEY.md §3 Dataset I/O rebuild)."""
import numpy as np

from icra20_hand_object_pose_tpu.utils import meshio


def test_box_geometry():
    m = meshio.make_box((0.1, 0.2, 0.3))
    assert m.num_vertices == 8 and m.num_faces == 12
    ext = m.vertices.max(0) - m.vertices.min(0)
    np.testing.assert_allclose(ext, [0.1, 0.2, 0.3], atol=1e-6)
    # outward normals: n . centroid-direction > 0 for a centered convex solid
    fn = m.face_normals()
    centers = m.vertices[m.faces].mean(axis=1)
    assert np.all(np.sum(fn * centers, axis=-1) > 0)


def test_sphere_sampling():
    m = meshio.make_icosphere(0.05, 2)
    pts, nrm = m.sample_surface(2000, seed=0)
    r = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.05, rtol=0.02)
    # normals roughly radial
    cos = np.sum(nrm * pts / r[:, None], axis=-1)
    assert cos.mean() > 0.97


def test_obj_roundtrip(tmp_path):
    m = meshio.make_test_object("box")
    p = tmp_path / "box.obj"
    meshio.save_obj(m, str(p))
    m2 = meshio.load_obj(str(p))
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_ply_ascii(tmp_path):
    m = meshio.make_box()
    lines = ["ply", "format ascii 1.0",
             f"element vertex {m.num_vertices}",
             "property float x", "property float y", "property float z",
             f"element face {m.num_faces}",
             "property list uchar int vertex_indices", "end_header"]
    for v in m.vertices:
        lines.append(f"{v[0]} {v[1]} {v[2]}")
    for f in m.faces:
        lines.append(f"3 {f[0]} {f[1]} {f[2]}")
    p = tmp_path / "box.ply"
    p.write_text("\n".join(lines) + "\n")
    m2 = meshio.load_ply(str(p))
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_ply_binary(tmp_path):
    import struct
    m = meshio.make_box()
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {m.num_vertices}\n"
              "property float x\nproperty float y\nproperty float z\n"
              f"element face {m.num_faces}\n"
              "property list uchar int vertex_indices\nend_header\n").encode()
    body = b""
    for v in m.vertices:
        body += struct.pack("<fff", *v)
    for f in m.faces:
        body += struct.pack("<Biii", 3, *f)
    p = tmp_path / "box_bin.ply"
    p.write_bytes(header + body)
    m2 = meshio.load_ply(str(p))
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_vertex_normals_sphere():
    m = meshio.make_icosphere(1.0, 2)
    vn = m.vertex_normals()
    cos = np.sum(vn * (m.vertices / np.linalg.norm(m.vertices, axis=-1, keepdims=True)), -1)
    assert cos.min() > 0.95


def test_capsule_merged():
    m = meshio.make_capsule(0.01, 0.05)
    assert m.num_faces > 50
    z = m.vertices[:, 2]
    assert z.min() < -0.005 and z.max() > 0.055


def _signed_volume(m):
    v, f = m.vertices.astype(np.float64), m.faces
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    return np.einsum("ij,ij->", a, np.cross(b, c)) / 6.0


def _half_edge_violations(m):
    """Watertight + consistently wound: every directed edge appears exactly
    once and its reverse exists."""
    from collections import Counter

    cnt = Counter()
    for tri in m.faces:
        for i in range(3):
            cnt[(int(tri[i]), int(tri[(i + 1) % 3]))] += 1
    return sum(
        1 for (a, b), n in cnt.items() if n != 1 or cnt.get((b, a), 0) != 1
    )


def test_concave_primitives_watertight_outward():
    """The concave validation set (VERDICT r1): watertight, consistent
    winding, outward normals (positive signed volume, exact where known)."""
    for kind, expect in [
        ("lbracket", (0.08 * 0.025 + 0.055 * 0.025) * 0.05),
        ("tee", (0.09 * 0.03 + 0.05 * 0.03) * 0.05),
        ("mug", None),
    ]:
        m = meshio.make_test_object(kind)
        assert _half_edge_violations(m) == 0, kind
        vol = _signed_volume(m)
        assert vol > 0, f"{kind}: inward normals (vol={vol:.2e})"
        if expect is not None:
            np.testing.assert_allclose(vol, expect, rtol=1e-5)


def test_mug_is_hollow():
    """The cavity must exist: mug volume well below the solid of revolution."""
    hollow = _signed_volume(meshio.make_mug(handle=False))
    solid = np.pi * 0.035**2 * 0.09
    assert hollow < 0.5 * solid


def test_asym_object_has_no_symmetry():
    """The accuracy-eval object: watertight, outward, and NO 180-degree
    rotational symmetry (flips must displace the surface by >> the dense
    ADD-S floor, so metric floors can't hide on it)."""
    m = meshio.make_test_object("asym")
    assert _half_edge_violations(m) == 0
    assert _signed_volume(m) > 0
    pts, _ = m.sample_surface(2048, seed=0)
    from scipy.spatial import cKDTree
    tree = cKDTree(pts)
    for axis in range(3):
        R = -np.eye(3)
        R[axis, axis] = 1.0  # 180-deg rotation about principal axis
        d, _ = tree.query(pts @ R.T, k=1)
        # >3mm: any flip sits far above the ~1mm dense ADD-S floor
        assert d.mean() > 0.003, f"axis {axis} flip nearly symmetric"
