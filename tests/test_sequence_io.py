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
