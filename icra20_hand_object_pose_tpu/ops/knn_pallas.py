"""Fused nearest-neighbor Pallas kernel — the flagship TPU kernel.

Replaces the reference's per-point PCL KdTreeFLANN queries (SURVEY.md §3
"KD-tree NN correspondence") for large clouds. The plain-jnp path
(ops/knn.py) materializes the full [P,Ns,Nm] distance tensor in HBM —
4 GB at 512x4096x2048 f32 — and is therefore HBM-bandwidth bound. This
kernel streams Nm in tiles through VMEM, keeps the running (min, argmin)
resident in the output block, and never materializes the matrix
(SURVEY.md §8 hard part 2):

    grid = (P, Ns/TS, Nm/TM), Nm innermost;
    per step: one [TS,8]x[8,TM] MXU contraction + VPU row-min/argmin,
    merged into the [TS] running best that lives in the revisited
    output block across the whole Nm sweep.

The kernel computes argmin over m of (|r_m|^2 - 2 q.r_m) — the |q|^2
term is constant per query row, so it is added once at the end only to
report true squared distances. f32 throughout: at bf16 the expansion
cancels catastrophically at millimeter scales and flips neighbors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_COORD = 1e6  # ref padding sentinel: far from any real point


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nn_kernel(q_ref, r_ref, d2_ref, idx_ref, *, tile_m: int, n_tiles_m: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        d2_ref[...] = jnp.full_like(d2_ref, jnp.inf)
        idx_ref[...] = jnp.zeros_like(idx_ref)

    q = q_ref[0]  # [TS, 8]
    r = r_ref[0]  # [TM, 8]
    # cross term on the MXU: [TS,8] x [TM,8]^T
    cross = jax.lax.dot_general(
        q, r, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                  # [TS, TM]
    r2 = jnp.sum(r * r, axis=-1)                       # [TM]
    part = r2[None, :] - 2.0 * cross                   # [TS, TM]

    local_min = jnp.min(part, axis=1)                  # [TS]
    local_arg = jnp.argmin(part, axis=1).astype(jnp.int32) + j * tile_m

    cur = d2_ref[0]
    better = local_min < cur
    d2_ref[0] = jnp.where(better, local_min, cur)
    idx_ref[0] = jnp.where(better, local_arg, idx_ref[0])

    @pl.when(j == n_tiles_m - 1)
    def _():
        q2 = jnp.sum(q * q, axis=-1)
        d2_ref[0] = jnp.maximum(d2_ref[0] + q2, 0.0)


@functools.partial(jax.jit, static_argnames=("tile_s", "tile_m", "interpret"))
def nn_batched(
    query: jax.Array,  # [P, Ns, 3]
    ref: jax.Array,    # [P, Nm, 3]
    *,
    tile_s: int = 256,
    tile_m: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused batched NN: returns (idx [P,Ns] int32, sqdist [P,Ns])."""
    P, Ns, _ = query.shape
    Nm = ref.shape[1]
    ts = min(tile_s, _round_up(Ns, 8))
    tm = min(tile_m, _round_up(Nm, 128))
    ns_p = _round_up(Ns, ts)
    nm_p = _round_up(Nm, tm)

    qp = jnp.pad(
        query.astype(jnp.float32),
        ((0, 0), (0, ns_p - Ns), (0, 5)),
    )
    rp = jnp.pad(
        ref.astype(jnp.float32),
        ((0, 0), (0, nm_p - Nm), (0, 5)),
        constant_values=_PAD_COORD,
    )
    # zero the coordinate padding of ref (only the POINT padding is sentinel)
    rp = rp.at[:, :Nm, 3:].set(0.0)

    n_tiles_m = nm_p // tm
    grid = (P, ns_p // ts, n_tiles_m)

    kernel = functools.partial(_nn_kernel, tile_m=tm, n_tiles_m=n_tiles_m)
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ts, 8), lambda p, i, j: (p, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8), lambda p, i, j: (p, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ts), lambda p, i, j: (p, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), lambda p, i, j: (p, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, ns_p), jnp.float32),
            jax.ShapeDtypeStruct((P, ns_p), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * ns_p * nm_p * 8,
            bytes_accessed=4 * P * (ns_p * 8 + nm_p * 8 * (ns_p // ts) + 2 * ns_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, rp)
    return idx[:, :Ns], d2[:, :Ns]


def make_nn_fn(*, tile_s: int = 256, tile_m: int = 1024, interpret: bool | None = None):
    """An `nn_fn(query [Ns,3], ref [Nm,3]) -> (idx, d2)` drop-in for
    ops/icp.py, backed by the fused kernel. Safe under vmap (the particle
    axis becomes the kernel's P grid dimension via the pallas batching
    rule). interpret=None auto-selects interpreter mode off-TPU so tests
    run on the CPU mesh (SURVEY.md §5 item 5)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def nn_fn(query: jax.Array, ref: jax.Array):
        idx, d2 = nn_batched(
            query[None], ref[None], tile_s=tile_s, tile_m=tile_m,
            interpret=interpret,
        )
        return idx[0], d2[0]

    return nn_fn
