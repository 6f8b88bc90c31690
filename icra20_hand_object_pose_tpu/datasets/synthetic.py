"""Synthetic grasp-sequence generator.

The reference validates against its released RGB-D dataset of objects
grasped by a Yale OpenHand T42 (SURVEY.md §5). That dataset is not
available in this environment, so this module generates equivalent
sequences with EXACT ground truth: the object and posed hand meshes are
triangle-rasterized (ops/render.raster_depth — perspective-correct,
generator-grade) into depth frames, optionally with sensor noise and
dropout, as a hand-held object translates/rotates through the sequence.

Ground truth being exact makes ADD/ADD-S measurable to machine
precision — the parity strategy of SURVEY.md §5 items 2-4.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models.hand import HandModel
from ..ops import render
from ..utils import meshio, se3
from ..utils.config import CameraIntrinsics


@dataclass
class SensorModel:
    """Realistic depth-sensor error model (VERDICT r3 item 3).

    The r1-r3 synthetic frames used flat Gaussian noise + dropout only —
    a favorable regime: the real data path reads 16-bit millimeter PNGs
    (quantized), structured-light/ToF noise grows ~quadratically with
    range, and depth edges jitter laterally by a fraction of a pixel.
    This model applies, in order:

      1. lateral edge jitter: each pixel reads its depth from a
         position offset by ~N(0, edge_sigma_px) pixels — flat surfaces
         are unaffected (neighbor depth ~= own depth), silhouette and
         step edges wobble by sub-pixel amounts like a real sensor;
      2. axial noise sigma(z) = noise_sigma * (z / z_ref)^2 (Kinect-
         style; z_ref keeps `noise_sigma` meaning "sigma at 0.5 m");
      3. quantization to `quantize` meters (1 mm = the 16-bit PNG LSB);
      4. `dropout` fraction of pixels invalidated.
    """
    noise_sigma: float = 0.001   # meters at z_ref
    z_ref: float = 0.5           # meters; sigma reference range
    depth_sq_noise: bool = True  # sigma grows (z/z_ref)^2; False = flat
    quantize: float = 0.001      # meters; 0 disables (16-bit mm PNG LSB)
    edge_sigma_px: float = 0.5   # lateral jitter stddev in pixels
    dropout: float = 0.02


def apply_sensor_model(
    depth: np.ndarray, sm: SensorModel, rng: np.random.Generator
) -> np.ndarray:
    """Apply the SensorModel to a clean depth render (0 = invalid)."""
    d = np.asarray(depth, np.float32).copy()
    H, W = d.shape
    if sm.edge_sigma_px > 0:
        dv = np.rint(rng.normal(0, sm.edge_sigma_px, d.shape)).astype(np.int64)
        du = np.rint(rng.normal(0, sm.edge_sigma_px, d.shape)).astype(np.int64)
        vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        v2 = np.clip(vv + dv, 0, H - 1)
        u2 = np.clip(uu + du, 0, W - 1)
        d = d[v2, u2]
    valid = d > 0
    if sm.noise_sigma > 0:
        sig = sm.noise_sigma
        if sm.depth_sq_noise:
            sig = sig * np.square(np.maximum(d, 0.0) / sm.z_ref)
        d = np.where(valid, d + rng.normal(0, 1.0, d.shape) * sig, 0.0)
    if sm.quantize > 0:
        d = np.where(valid, np.rint(d / sm.quantize) * sm.quantize, 0.0)
    if sm.dropout > 0:
        d = np.where(rng.random(d.shape) < sm.dropout, 0.0, d)
    return d.astype(np.float32)


class SyntheticFrame(NamedTuple):
    depth: np.ndarray        # [H,W] float32 meters, 0 = invalid
    pose_gt: np.ndarray      # [4,4] object model->camera
    hand_base: np.ndarray    # [4,4] hand base->camera
    hand_q: np.ndarray       # [J] nominal joint angles
    rgb: np.ndarray | None = None  # [H,W,3] uint8 shaded color stream


def shade_depth_rgb(depth: np.ndarray) -> np.ndarray:
    """Synthetic color stream: Lambertian shading of the depth surface.

    The released reference dataset is RGB-D; synthetic sequences carry an
    equivalent color channel so the RGB IO/visualization path is
    exercised end to end (VERDICT r1 item 7). Host-side numpy.
    """
    d = np.asarray(depth, np.float32)
    valid = d > 0
    dz = np.where(valid, d, np.nan)
    gy, gx = np.gradient(dz)
    gx = np.nan_to_num(gx)
    gy = np.nan_to_num(gy)
    # surface normal ∝ (-gx, -gy, px_scale); fixed scale ≈ depth/f per px
    nz = np.full_like(d, 2e-3)
    norm = np.sqrt(gx * gx + gy * gy + nz * nz)
    light = np.asarray([0.3, -0.5, 0.81], np.float32)
    lam = (-gx * light[0] - gy * light[1] + nz * light[2]) / np.maximum(norm, 1e-12)
    shade = np.clip(0.25 + 0.75 * np.clip(lam, 0.0, 1.0), 0.0, 1.0)
    base = np.asarray([180, 170, 150], np.float32)  # warm gray material
    img = shade[..., None] * base[None, None]
    img = np.where(valid[..., None], img, 12.0)
    return np.clip(img, 0, 255).astype(np.uint8)


@dataclass
class SyntheticSequenceConfig:
    n_frames: int = 8
    camera: CameraIntrinsics = field(default_factory=CameraIntrinsics)
    object_start: np.ndarray | None = None   # [4,4]; default 0.5m ahead
    step_rot_deg: float = 2.0                # per-frame object rotation
    step_trans: float = 0.004                # per-frame translation (m)
    hand_q: tuple = (0.45, 0.45)             # grasp closure angles
    hand_q_true_offset: float = 0.05         # actual-vs-nominal joint error
    noise_sigma: float = 0.001               # depth noise (m)
    dropout: float = 0.02                    # invalid-pixel fraction
    sensor: SensorModel | None = None        # realistic sensor model;
                                             # supersedes noise_sigma/dropout
    hand_base_err_mm: float = 0.0            # hand-mount calibration error:
    hand_base_err_deg: float = 0.0           # the REPORTED hand_base is
                                             # off the true one by this
                                             # much (fixed per sequence —
                                             # calibration error, not noise)
    seed: int = 0


def default_object_pose(z: float = 0.5) -> np.ndarray:
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.0, 0.0, z]
    return T


def render_frame(
    object_mesh: meshio.Mesh,
    object_pose: np.ndarray,
    hand: HandModel | None,
    hand_base: np.ndarray,
    hand_q: np.ndarray,
    cam: CameraIntrinsics,
    *,
    noise_sigma: float = 0.0,
    dropout: float = 0.0,
    rng: np.random.Generator | None = None,
    sensor: SensorModel | None = None,
) -> np.ndarray:
    """Exact depth render of object + posed hand, with sensor model.

    `sensor` (a SensorModel) supersedes the legacy flat
    noise_sigma/dropout arguments: quantization, depth^2 noise growth,
    and lateral edge jitter included."""
    scene = object_mesh.transformed(object_pose)
    if hand is not None:
        scene = scene.merged(hand.merged_mesh(np.asarray(hand_q)).transformed(hand_base))
    d = render.raster_depth(
        jnp.asarray(scene.vertices, jnp.float32),
        jnp.asarray(scene.faces, jnp.int32),
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        height=cam.height, width=cam.width,
    )
    d = np.array(d)  # writable host copy
    d[~np.isfinite(d)] = 0.0
    if rng is None:
        rng = np.random.default_rng(0)
    if sensor is not None:
        return apply_sensor_model(d, sensor, rng)
    if noise_sigma > 0:
        d = np.where(d > 0, d + rng.normal(0, noise_sigma, d.shape), 0.0)
    if dropout > 0:
        d = np.where(rng.random(d.shape) < dropout, 0.0, d)
    return d.astype(np.float32)


def render_frame_fast(
    object_mesh: meshio.Mesh,
    object_pose: np.ndarray,
    hand: HandModel | None,
    hand_base: np.ndarray,
    hand_q: np.ndarray,
    cam: CameraIntrinsics,
    *,
    n_points: int = 16384,
    noise_sigma: float = 0.0,
    rng: np.random.Generator | None = None,
    sensor: SensorModel | None = None,
) -> np.ndarray:
    """Splat-rendered synthetic depth (dense surface samples, z-min
    scatter). ~100x cheaper to compile than `render_frame`'s exact
    triangle raster at VGA — use for benchmarks and perf smoke tests
    where photometric exactness is irrelevant."""
    pts, _ = object_mesh.sample_surface(n_points, seed=7)
    T = np.asarray(object_pose, np.float32)
    pts = pts @ T[:3, :3].T + T[:3, 3]
    if hand is not None:
        hm = hand.merged_mesh(np.asarray(hand_q))
        hp, _ = hm.sample_surface(n_points // 2, seed=8)
        B = np.asarray(hand_base, np.float32)
        pts = np.concatenate([pts, hp @ B[:3, :3].T + B[:3, 3]])
    pts_j = jnp.asarray(pts, jnp.float32)
    d = render.splat_depth(
        pts_j, jnp.ones(pts_j.shape[0], jnp.float32),
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        height=cam.height, width=cam.width, radius=2,
    )
    d = np.array(d)
    d[~np.isfinite(d)] = 0.0
    if sensor is not None:
        if rng is None:
            rng = np.random.default_rng(0)
        return apply_sensor_model(d, sensor, rng)
    if noise_sigma > 0:
        if rng is None:
            rng = np.random.default_rng(0)
        d = np.where(d > 0, d + rng.normal(0, noise_sigma, d.shape), 0.0)
    return d.astype(np.float32)


def hand_base_for_grasp(object_pose: np.ndarray, offset: float = 0.10) -> np.ndarray:
    """Grasp from the side: palm on the camera's -x side of the object,
    hand +z (finger direction) pointing at the object, finger-separation
    axis (hand x) along the camera view axis — so one finger sits between
    the camera and the object, partially occluding it. This reproduces
    the finger-occlusion scenario the reference is built around without
    the palm blocking the whole view."""
    T = np.asarray(object_pose, np.float32)
    c = T[:3, 3]
    x_h = np.array([0.0, 0.0, -1.0], np.float32)   # toward camera
    y_h = np.array([0.0, 1.0, 0.0], np.float32)
    z_h = np.array([1.0, 0.0, 0.0], np.float32)    # palm -> object
    R = np.stack([x_h, y_h, z_h], axis=1)
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = R
    out[:3, 3] = c - z_h * offset
    return out


def generate_sequence(
    object_mesh: meshio.Mesh,
    hand: HandModel | None,
    cfg: SyntheticSequenceConfig,
) -> list[SyntheticFrame]:
    """A rigid grasp moving through space: hand and object move together
    (the grasped-object scenario of the reference), exact GT every frame."""
    rng = np.random.default_rng(cfg.seed)
    pose = (
        np.asarray(cfg.object_start, np.float32)
        if cfg.object_start is not None
        else default_object_pose()
    )
    q_nom = np.asarray(cfg.hand_q, np.float32)
    q_true = q_nom + cfg.hand_q_true_offset
    frames = []
    step_w = rng.normal(size=3)
    step_w = step_w / np.linalg.norm(step_w) * np.radians(cfg.step_rot_deg)
    step_v = rng.normal(size=3)
    step_v = step_v / np.linalg.norm(step_v) * cfg.step_trans
    delta = np.asarray(
        se3.se3_exp(jnp.asarray(np.concatenate([step_w, step_v]), jnp.float32))
    )
    # hand-mount CALIBRATION error: one fixed perturbation per sequence
    # between the true base (renders the depth) and the reported base
    # (handed to the estimator) — systematic, unlike per-frame noise
    base_err = np.eye(4, dtype=np.float32)
    if cfg.hand_base_err_mm > 0 or cfg.hand_base_err_deg > 0:
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * np.radians(cfg.hand_base_err_deg)
        v = rng.normal(size=3)
        v = v / np.linalg.norm(v) * (cfg.hand_base_err_mm * 1e-3)
        base_err = np.asarray(se3.se3_exp(
            jnp.asarray(np.concatenate([w, v]), jnp.float32)
        ))
    for i in range(cfg.n_frames):
        hb_true = hand_base_for_grasp(pose)
        hb_reported = (base_err @ hb_true).astype(np.float32)
        depth = render_frame(
            object_mesh, pose, hand, hb_true, q_true, cfg.camera,
            noise_sigma=cfg.noise_sigma, dropout=cfg.dropout, rng=rng,
            sensor=cfg.sensor,
        )
        frames.append(
            SyntheticFrame(
                depth=depth, pose_gt=pose.copy(), hand_base=hb_reported,
                hand_q=q_nom, rgb=shade_depth_rgb(depth),
            )
        )
        # rigid motion about the object's own center
        c = pose[:3, 3].copy()
        A = np.eye(4, dtype=np.float32)
        A[:3, 3] = c
        B = np.eye(4, dtype=np.float32)
        B[:3, 3] = -c
        pose = (A @ delta @ B @ pose).astype(np.float32)
    return frames
