"""Device-mesh utilities and the multi-object library sweep.

TPU-native scaling layer (SURVEY.md §3 parallelism table; BASELINE
config 5). The reference is single-process C++ with no distribution;
the two data-parallel axes this rebuild shards over a TPU slice are:

  - the PARTICLE axis of one tracked object's swarm (Estimator(mesh=...)
    -> shard_map over "p"; per-iteration global-best agreement is a tiny
    all_gather over ICI — ops/pso.py `swarm_best`), and
  - the OBJECT axis of a model-library sweep: every object of the
    dataset tracked concurrently, one vmapped frame program partitioned
    over the mesh with NO cross-object communication (pure DP over ICI).

Both run on a virtual CPU mesh for testing
(XLA_FLAGS=--xla_force_host_platform_device_count=N, SURVEY.md §5.5).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.estimator import Estimator, FrameResult, _ckpt_path
from ..models.hand import HandModel
from ..models.object_model import ObjectModel
from ..utils.config import EstimatorConfig


def make_mesh(n_devices: int | None = None, axis_name: str = "p") -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


class SweepState(NamedTuple):
    """Per-object tracker state, batched: the whole library's resumable
    state is one small pytree (SURVEY.md §6 checkpoint/resume)."""
    poses: jax.Array        # [O,4,4]
    fitness: jax.Array      # [O]
    initialized: jax.Array  # [O] bool
    key: jax.Array
    frame_idx: jax.Array    # int32


class SweepResult(NamedTuple):
    poses: jax.Array        # [O,4,4]
    fitness: jax.Array      # [O]
    coverage: jax.Array     # [O]
    reinitialized: jax.Array  # [O] bool — which objects re-registered


class LibrarySweep:
    """Track O objects concurrently, object axis sharded over a mesh.

    Unlike the reference (one PoseEstimator process per object, run
    sequentially), the whole library is ONE jit: model tensors are
    stacked [O,...], the frame program is vmapped over the object axis,
    and jit in/out shardings place each object's tracker on its mesh
    shard. Re-initialization is decided per object ON DEVICE (traced
    uniform_rot/sigma vectors), so mixed track/re-init batches need no
    host round-trip or re-compile.
    """

    def __init__(
        self,
        objects: Sequence[ObjectModel],
        hand: HandModel | None,
        cfg: EstimatorConfig = EstimatorConfig(),
        mesh: Mesh | None = None,
        axis_name: str = "obj",
        particle_axis: str | None = None,
        nn_fn=None,
    ):
        """With a 2-D mesh and `particle_axis` set (e.g.
        Mesh(devices.reshape(4, 2), ("obj", "p")), particle_axis="p"), the
        sweep composes BOTH data-parallel axes: each object's swarm is
        additionally sharded over the particle axis, with the per-
        iteration global-best agreement as an all_gather over "p" within
        each object's device column — objects over one ICI dimension,
        particles over the other."""
        if not objects:
            raise ValueError("need at least one object")
        shapes = {
            (o.model_pts.shape, o.render_pts.shape) for o in objects
        }
        if len(shapes) != 1:
            raise ValueError(
                "objects must share model/render point counts; build them "
                "with the same ObjectModel(model_points=, render_points=)"
            )
        self.objects = list(objects)
        self.n_objects = len(objects)
        self.cfg = cfg
        self.mesh = mesh
        self.axis_name = axis_name
        self.particle_axis = particle_axis
        if particle_axis is not None:
            if mesh is None or particle_axis not in mesh.axis_names:
                raise ValueError(
                    f"particle_axis {particle_axis!r} needs a mesh with that "
                    f"axis (got {mesh.axis_names if mesh else None})"
                )
            if self.n_objects % mesh.shape[axis_name]:
                raise ValueError(
                    f"{self.n_objects} objects not divisible by mesh axis "
                    f"{axis_name}={mesh.shape[axis_name]}"
                )
        # one estimator provides the traced frame program; its per-object
        # tensors are passed explicitly (vmapped axis 0)
        self._est = Estimator(objects[0], hand, cfg, nn_fn=nn_fn)
        if particle_axis is not None:
            # make _frame_step emit the cross-shard global-best all_gather
            # over the particle axis (it runs inside our shard_map below)
            self._est.mesh = mesh
            self._est.axis_name = particle_axis
        self._model_pts = jnp.stack([o.model_pts for o in objects])
        self._model_normals = jnp.stack([o.model_normals for o in objects])
        self._render_pts = jnp.stack([o.render_pts for o in objects])
        self._render_normals = jnp.stack([o.render_normals for o in objects])
        self._render_w = jnp.stack([o.render_w for o in objects])
        self._diameters = np.asarray([o.diameter for o in objects], np.float32)

        obj_sharding = (
            NamedSharding(mesh, P(axis_name)) if mesh is not None else None
        )
        kwargs = {}
        if obj_sharding is not None:
            repl = NamedSharding(mesh, P())
            kwargs = dict(
                in_shardings=(
                    obj_sharding,  # keys
                    obj_sharding,  # depths
                    obj_sharding,  # prev poses
                    obj_sharding,  # hand bases
                    obj_sharding,  # hand qs
                    (obj_sharding,) * 5,  # object tensors
                    obj_sharding,  # rot_sigma [O]
                    obj_sharding,  # trans_sigma [O]
                    obj_sharding,  # uniform_rot [O]
                    obj_sharding,  # roi_radius [O]
                ),
                out_shardings=FrameResult(
                    pose=obj_sharding, fitness=obj_sharding,
                    coverage=obj_sharding, fitness_trace=obj_sharding,
                    n_scene=obj_sharding,
                    hyp_poses=obj_sharding, hyp_fitness=obj_sharding,
                ),
            )
        if particle_axis is not None:
            # 2-D path: one shard_map over (obj, particle) — object args
            # sharded over `axis_name`, replicated over `particle_axis`;
            # inside, each shard runs its slice of objects (vmap) with a
            # per-shard slice of each swarm (_frame_step's axis_name RNG
            # fold + all_gather global best over the particle axis).
            from jax import shard_map

            n_p = mesh.shape[particle_axis]

            def sweep2d(
                keys, depths, prev_poses, hand_bases, hand_qs, obj_tensors,
                rot_sigma, trans_sigma, uniform_rot, roi_radius,
                n_particles: int, pso_iters: int,
            ):
                if n_particles % n_p:
                    raise ValueError(
                        f"particles={n_particles} not divisible by mesh "
                        f"axis {particle_axis}={n_p}"
                    )

                def local(*args10):
                    fn = partial(
                        self._est._frame_step,
                        n_particles=n_particles // n_p,
                        pso_iters=pso_iters,
                    )
                    return jax.vmap(fn)(*args10)

                sm = shard_map(
                    local, mesh=mesh,
                    in_specs=(P(axis_name),) * 10,
                    out_specs=P(axis_name), check_vma=False,
                )
                return sm(
                    keys, depths, prev_poses, hand_bases, hand_qs,
                    obj_tensors, rot_sigma, trans_sigma, uniform_rot,
                    roi_radius,
                )

            self._sweep_jit = jax.jit(sweep2d, static_argnums=(10, 11))
        else:
            # pjit with in_shardings forbids kwargs: statics go positional
            self._sweep_jit = jax.jit(
                self._sweep_step, static_argnums=(10, 11), **kwargs
            )

    def _sweep_step(
        self, keys, depths, prev_poses, hand_bases, hand_qs, obj_tensors,
        rot_sigma, trans_sigma, uniform_rot, roi_radius,
        n_particles: int, pso_iters: int,
    ) -> FrameResult:
        fn = partial(
            self._est._frame_step, n_particles=n_particles, pso_iters=pso_iters
        )
        return jax.vmap(fn)(
            keys, depths, prev_poses, hand_bases, hand_qs, obj_tensors,
            rot_sigma, trans_sigma, uniform_rot, roi_radius,
        )

    # -- public API ----------------------------------------------------------

    def init_state(self, seed: int = 0) -> SweepState:
        O = self.n_objects
        return SweepState(
            poses=jnp.tile(jnp.eye(4)[None], (O, 1, 1)),
            fitness=jnp.zeros((O,)),
            initialized=jnp.zeros((O,), bool),
            key=jax.random.key(seed),
            frame_idx=jnp.asarray(0, jnp.int32),
        )

    def step(
        self,
        state: SweepState,
        depths: jax.Array,      # [O,H,W] meters
        hand_bases: jax.Array | None = None,  # [O,4,4]
        hand_qs: jax.Array | None = None,     # [O,J]
    ) -> tuple[SweepState, SweepResult]:
        """One frame for every object in the library."""
        cfg = self.cfg
        O = self.n_objects
        key, sub = jax.random.split(state.key)
        keys = jax.random.split(sub, O)
        if hand_bases is None:
            hand_bases = jnp.tile(jnp.eye(4)[None], (O, 1, 1))
        if hand_qs is None:
            J = self._est.hand.n_joints if self._est.hand is not None else 1
            hand_qs = jnp.zeros((O, J))
        tr = cfg.tracker
        # per-object re-init decision (device-side, no recompile)
        need_init = (~state.initialized) | (
            state.fitness < tr.fitness_reinit_threshold
        )
        rot_sigma = jnp.where(need_init, tr.reinit_rot_sigma, cfg.pso.rot_sigma)
        trans_sigma = jnp.where(
            need_init, tr.reinit_trans_sigma, cfg.pso.trans_sigma
        )
        roi_track = np.maximum(
            1.5 * self._diameters, 3.0 * cfg.pso.trans_sigma
        )
        roi_radius = jnp.where(need_init, jnp.inf, jnp.asarray(roi_track))
        out = self._sweep_jit(
            keys, depths, state.poses, hand_bases, hand_qs,
            (self._model_pts, self._model_normals,
             self._render_pts, self._render_normals, self._render_w),
            rot_sigma.astype(jnp.float32), trans_sigma.astype(jnp.float32),
            need_init, roi_radius.astype(jnp.float32),
            cfg.pso.particles, cfg.pso.iters,
        )
        new_state = SweepState(
            poses=out.pose,
            fitness=out.fitness,
            initialized=jnp.ones((O,), bool),
            key=key,
            frame_idx=state.frame_idx + 1,
        )
        return new_state, SweepResult(
            poses=out.pose, fitness=out.fitness, coverage=out.coverage,
            reinitialized=need_init,
        )

    # -- checkpoint / resume -------------------------------------------------

    def save_state(self, state: SweepState, path: str) -> None:
        np.savez(
            _ckpt_path(path),
            poses=np.asarray(state.poses),
            fitness=np.asarray(state.fitness),
            initialized=np.asarray(state.initialized),
            key=np.asarray(jax.random.key_data(state.key)),
            frame_idx=np.asarray(state.frame_idx),
        )

    def load_state(self, path: str) -> SweepState:
        z = np.load(_ckpt_path(path))
        return SweepState(
            poses=jnp.asarray(z["poses"]),
            fitness=jnp.asarray(z["fitness"]),
            initialized=jnp.asarray(z["initialized"]),
            key=jax.random.wrap_key_data(jnp.asarray(z["key"])),
            frame_idx=jnp.asarray(z["frame_idx"]),
        )
