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
