"""Fused NN + gather kernel: returns matched coords+normals directly.

ref pack rows: [one, x, y, z, nx, ny, nz, zero]; query rows [x,y,z,0...].
Outputs: chan [P, 8, ns_p] rows = [d2, mx, my, mz, mnx, mny, mnz, _].
"""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 1e6
def _ru(x, m): return ((x + m - 1) // m) * m

def make_kernel(tile_m, n_tiles_m):
    def _kernel(q_ref, r_ref, chan_ref, idx_ref):
        j = pl.program_id(2)
        @pl.when(j == 0)
        def _():
            chan_ref[...] = jnp.full_like(chan_ref, jnp.inf)
            idx_ref[...] = jnp.zeros_like(idx_ref)
        q = q_ref[0]          # [8, TS] rows x,y,z,0..
        r = r_ref[0]          # [8, TM] rows 1,x,y,z,nx,ny,nz,0
        acc = None
        for c in range(3):
            diff = r[c + 1][:, None] - q[c][None, :]
            acc = diff * diff if acc is None else acc + diff * diff
        lm = jnp.min(acc, axis=0, keepdims=True)          # [1, TS]
        la = jnp.argmin(acc, axis=0, keepdims=True).astype(jnp.int32)  # [1,TS]
        iota_m = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
        onehot = (iota_m == la).astype(jnp.bfloat16)      # [TM, TS] exact
        # double-bf16 selection: exact onehot x (hi + lo) splits of r keep
        # full f32 coordinate precision at 1/3 the HIGHEST-precision cost
        r_hi = r.astype(jnp.bfloat16)
        r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        sel = (
            jax.lax.dot_general(r_hi, onehot, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(r_lo, onehot, dn,
                                  preferred_element_type=jnp.float32)
        )                                                  # [8, TS]
        row = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 0)
        cand = jnp.where(row == 0, jnp.broadcast_to(lm, sel.shape), sel)
        cur = chan_ref[0]
        better = lm < cur[0:1]                             # [1, TS]
        chan_ref[0] = jnp.where(jnp.broadcast_to(better, cur.shape), cand, cur)
        idx_ref[0] = jnp.where(
            jnp.broadcast_to(better, cur.shape),
            jnp.broadcast_to(la + j * tile_m, cur.shape), idx_ref[0])
    return _kernel

@functools.partial(jax.jit, static_argnames=("tile_s","tile_m","interpret"))
def nn_gather_batched(query, ref_pts, ref_normals, *, tile_s=2048, tile_m=512,
                      interpret=False):
    Pq, Ns, _ = query.shape
    P, Nm, _ = ref_pts.shape
    ts = min(tile_s, _ru(Ns, 128)); tm = min(tile_m, _ru(Nm, 128))
    ns_p, nm_p = _ru(Ns, ts), _ru(Nm, tm)
    qt = jnp.pad(query.astype(jnp.float32), ((0,0),(0,ns_p-Ns),(0,5))).transpose(0,2,1)
    ones = jnp.ones((P, Nm, 1), jnp.float32)
    zeros = jnp.zeros((P, Nm, 1), jnp.float32)
    packed = jnp.concatenate(
        [ones, ref_pts.astype(jnp.float32), ref_normals.astype(jnp.float32), zeros],
        axis=-1)                                           # [P, Nm, 8]
    rt = jnp.pad(packed, ((0,0),(0,nm_p-Nm),(0,0)))
    if nm_p > Nm:
        rt = rt.at[:, Nm:, 1:4].set(_PAD)
    rt = rt.transpose(0, 2, 1)                             # [P, 8, nm_p]
    kernel = make_kernel(tm, nm_p//tm)
    q_index = (lambda p,i,j: (0,0,i)) if Pq == 1 else (lambda p,i,j: (p,0,i))
    chan, idx = pl.pallas_call(
        kernel, grid=(P, ns_p//ts, nm_p//tm),
        in_specs=[
            pl.BlockSpec((1,8,ts), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,8,tm), lambda p,i,j:(p,0,j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1,8,ts), lambda p,i,j:(p,0,i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,8,ts), lambda p,i,j:(p,0,i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P,8,ns_p), jnp.float32),
            jax.ShapeDtypeStruct((P,8,ns_p), jnp.int32),
        ],
        interpret=interpret,
    )(qt, rt)
    d2 = chan[:, 0, :Ns]
    matched = chan[:, 1:4, :Ns].transpose(0, 2, 1)
    mnormal = chan[:, 4:7, :Ns].transpose(0, 2, 1)
    return matched, mnormal, d2, idx[:, 0, :Ns]

if __name__ == "__main__":
    key = jax.random.key(0)
    P, Ns, Nm = 512, 2048, 1024
    q = jax.random.normal(jax.random.fold_in(key,2), (1, Ns, 3)) * 0.04
    r = jax.random.normal(jax.random.fold_in(key,3), (P, Nm, 3)) * 0.04
    rn = jax.random.normal(jax.random.fold_in(key,4), (P, Nm, 3))
    def oracle(q, r):
        d = jnp.sum((q[:,:,None,:]-r[:,None,:,:])**2, -1)
        return jnp.argmin(d,-1), jnp.min(d,-1)
    oi, od = oracle(q, r[:8])
    m, mn, d2, idx = nn_gather_batched(q, r[:8], rn[:8])
    print("idx match:", float(jnp.mean((idx==oi).astype(jnp.float32))))
    print("d2 err:", float(jnp.max(jnp.abs(d2-od))))
    gm = jnp.take_along_axis(r[:8], oi[...,None], axis=1)
    gn = jnp.take_along_axis(rn[:8], oi[...,None], axis=1)
    print("matched err:", float(jnp.max(jnp.abs(m-gm))))
    print("normal err:", float(jnp.max(jnp.abs(mn-gn))))
    def timeit(fn, n=20, tag=""):
        out = fn(0); _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        t0=time.time()
        for i in range(n): out = fn(i)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        print(f"{tag}: {(time.time()-t0)/n*1000:.2f}ms")
    qs = [q + i*1e-6 for i in range(4)]
    timeit(lambda i: nn_gather_batched(qs[i%4], r, rn), tag="fused nn+gather")
    from icra20_hand_object_pose_tpu.ops.knn_pallas import nn_batched
    def nn_then_gather(i):
        idx, d2 = nn_batched(qs[i%4], r)
        m = jnp.take_along_axis(r, idx[...,None], axis=1)
        mn = jnp.take_along_axis(rn, idx[...,None], axis=1)
        return m, mn, d2
    timeit(nn_then_gather, tag="nn + xla gathers")
