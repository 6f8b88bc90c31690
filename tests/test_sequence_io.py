"""Dataset IO: PNG codec (pure-Python + native), sequence round-trip,
prefetch loader ordering."""
import numpy as np
import pytest

from icra20_hand_object_pose_tpu.datasets import (
    SyntheticSequenceConfig, generate_sequence,
)
from icra20_hand_object_pose_tpu.datasets.sequence import (
    RecordedSequence, save_sequence,
)
from icra20_hand_object_pose_tpu.models import make_t42_hand
from icra20_hand_object_pose_tpu.utils import meshio, pngio
from icra20_hand_object_pose_tpu.utils.config import CameraIntrinsics


def test_png16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 65535, size=(37, 53), dtype=np.uint16)
    p = str(tmp_path / "x.png")
    pngio.write_png16(p, img)
    back = pngio.read_png_gray(p)
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, img)


def test_png_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as f:
        f.write(b"not a png at all")
    with pytest.raises(ValueError, match="not a PNG"):
        pngio.read_png_gray(p)


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    cam = CameraIntrinsics(width=64, height=48, fx=58.0, fy=58.0,
                           cx=32.0, cy=24.0)
    mesh = meshio.make_test_object("box")
    hand = make_t42_hand(points_per_link=64)
    frames = generate_sequence(
        mesh, hand, SyntheticSequenceConfig(n_frames=3, camera=cam)
    )
    root = str(tmp_path_factory.mktemp("seq"))
    save_sequence(frames, cam, root)
    return root, cam, frames


def test_sequence_roundtrip(seq_dir):
    root, cam, frames = seq_dir
    seq = RecordedSequence(root, use_native=False)
    assert len(seq) == 3
    assert seq.camera.fx == pytest.approx(cam.fx)
    fr = seq[1]
    # quantization error bounded by depth_scale/2
    valid = frames[1].depth > 0
    assert np.max(np.abs(fr.depth[valid] - frames[1].depth[valid])) <= (
        cam.depth_scale * 0.5 + 1e-6
    )
    np.testing.assert_allclose(fr.pose_gt, frames[1].pose_gt, atol=1e-6)
    np.testing.assert_allclose(fr.hand_q, frames[1].hand_q, atol=1e-6)


def test_native_decoder_matches_python(seq_dir):
    from icra20_hand_object_pose_tpu import native

    if not native.available():
        pytest.skip(f"native build unavailable: {native.build_error()}")
    root, cam, frames = seq_dir
    seq = RecordedSequence(root, use_native=False)
    path = seq._depth_files[0]
    np.testing.assert_array_equal(
        native.read_png16(path), pngio.read_png_gray(path)
    )


def test_native_prefetch_order_and_values(seq_dir):
    from icra20_hand_object_pose_tpu import native

    if not native.available():
        pytest.skip(f"native build unavailable: {native.build_error()}")
    root, cam, frames = seq_dir
    seq = RecordedSequence(root, use_native=True)
    out = list(seq)
    assert [f.index for f in out] == [0, 1, 2]
    for fr, ref in zip(out, frames):
        valid = ref.depth > 0
        assert np.max(np.abs(fr.depth[valid] - ref.depth[valid])) <= (
            cam.depth_scale * 0.5 + 1e-6
        )


def test_native_prefetch_many(tmp_path):
    """Loader with more frames than the ahead window, odd sizes."""
    from icra20_hand_object_pose_tpu import native

    if not native.available():
        pytest.skip(f"native build unavailable: {native.build_error()}")
    rng = np.random.default_rng(1)
    paths, imgs = [], []
    for i in range(20):
        img = rng.integers(0, 65535, size=(11 + i, 17), dtype=np.uint16)
        p = str(tmp_path / f"{i:03d}.png")
        pngio.write_png16(p, img)
        paths.append(p)
        imgs.append(img)
    loader = native.PrefetchLoader(paths, n_threads=3, ahead=4)
    got = list(loader)
    loader.close()
    assert len(got) == 20
    for a, b in zip(got, imgs):
        np.testing.assert_array_equal(a, b)


def test_png_rgb_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(21, 33, 3), dtype=np.uint8)
    p = str(tmp_path / "c.png")
    pngio.write_png_rgb(p, img)
    back = pngio.read_png_rgb(p)
    np.testing.assert_array_equal(back, img)


def test_rgb_stream_loaded(seq_dir):
    """Synthetic sequences carry a shaded RGB stream; save/load must
    round-trip it (VERDICT r1 item 7)."""
    root, cam, frames = seq_dir
    assert frames[0].rgb is not None and frames[0].rgb.shape == (48, 64, 3)
    seq = RecordedSequence(root, use_native=False)
    fr = seq[0]
    np.testing.assert_array_equal(fr.rgb, frames[0].rgb)


def test_rgb_absent_is_none(tmp_path):
    cam = CameraIntrinsics(width=32, height=24, fx=30.0, fy=30.0,
                           cx=16.0, cy=12.0)
    mesh = meshio.make_test_object("box")
    frames = generate_sequence(
        mesh, None, SyntheticSequenceConfig(n_frames=1, camera=cam)
    )
    frames = [f._replace(rgb=None) for f in frames]
    root = str(tmp_path / "norgb")
    save_sequence(frames, cam, root)
    seq = RecordedSequence(root, use_native=False)
    assert seq[0].rgb is None


def test_convert_reference_dataset(tmp_path, seq_dir):
    """Released-layout tree -> our layout -> RecordedSequence loads it."""
    import sys
    sys.path.insert(0, "scripts")
    try:
        from convert_reference_dataset import convert
    finally:
        sys.path.pop(0)
    root, cam, frames = seq_dir
    # build a fake released tree: different dir names + numbering
    src = tmp_path / "released"
    (src / "depth").mkdir(parents=True)
    (src / "rgb").mkdir()
    (src / "annotated_poses").mkdir()
    import shutil
    for i in range(3):
        shutil.copyfile(f"{root}/depth/{i:06d}.png", src / "depth" / f"{i+7}.png")
        shutil.copyfile(f"{root}/rgb/{i:06d}.png", src / "rgb" / f"{i+7}.png")
        shutil.copyfile(f"{root}/pose_gt/{i:06d}.txt",
                        src / "annotated_poses" / f"{i+7}.txt")
    shutil.copyfile(f"{root}/cam_K.txt", src / "cam_K.txt")
    dst = str(tmp_path / "converted")
    n = convert(str(src), dst)
    assert n == 3
    seq = RecordedSequence(dst, use_native=False)
    assert len(seq) == 3
    fr = seq[1]
    orig = RecordedSequence(root, use_native=False)[1]
    np.testing.assert_allclose(fr.depth, orig.depth, atol=1e-6)
    np.testing.assert_array_equal(fr.rgb, orig.rgb)
    np.testing.assert_allclose(fr.pose_gt, orig.pose_gt, atol=1e-6)
