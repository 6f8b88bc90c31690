import time, jax, jax.numpy as jnp, numpy as np, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from _knn_exp4 import nn_batched4, _ru, _PAD

key = jax.random.key(0)
P, Ns, Nm = 512, 2048, 1024
q = jax.random.normal(jax.random.fold_in(key,2), (P, Ns, 3)) * 0.04
r = jax.random.normal(jax.random.fold_in(key,3), (P, Nm, 3)) * 0.04
qs = [q + i*1e-6 for i in range(4)]

def timeit(fn, n=30, tag=""):
    out = fn(0)  # compile
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.time()
    for i in range(n):
        out = fn(i)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.time() - t0) / n
    print(f"{tag}: {dt*1000:.2f}ms")
    return dt

# 1. jnp dense reference
@jax.jit
def jnp_nn(q, r):
    d = jnp.sum(q*q,-1)[:,:,None] - 2*jnp.einsum('pnd,pmd->pnm',q,r,precision=jax.lax.Precision.HIGHEST) + jnp.sum(r*r,-1)[:,None,:]
    return jnp.argmin(d,-1), jnp.min(d,-1)
timeit(lambda i: jnp_nn(qs[i%4], r), tag="jnp dense HIGHEST")

# 2. pallas v4, tile variants
for ts, tm in ((512,512),(2048,512),(2048,1024),(1024,1024)):
    timeit(lambda i: nn_batched4(qs[i%4], r, tile_s=ts, tile_m=tm, prec="highest"),
           tag=f"pallas-mxu ts={ts} tm={tm}")

# 3. VPU broadcast-diff variant
def make_vpu_kernel(tile_m, n_tiles_m):
    def _kernel(q_ref, r_ref, d2_ref, idx_ref):
        j = pl.program_id(2)
        @pl.when(j == 0)
        def _():
            d2_ref[...] = jnp.full_like(d2_ref, jnp.inf)
            idx_ref[...] = jnp.zeros_like(idx_ref)
        q = q_ref[0]   # [8, TS]
        r = r_ref[0]   # [8, TM]
        acc = None
        for c in range(3):
            diff = r[c][:, None] - q[c][None, :]      # [TM, TS]
            acc = diff*diff if acc is None else acc + diff*diff
        lm = jnp.min(acc, axis=0, keepdims=True)
        la = jnp.argmin(acc, axis=0, keepdims=True).astype(jnp.int32) + j * tile_m
        cur_d = d2_ref[0]
        better = lm < cur_d
        d2_ref[0] = jnp.where(better, jnp.broadcast_to(lm, cur_d.shape), cur_d)
        idx_ref[0] = jnp.where(better, jnp.broadcast_to(la, cur_d.shape), idx_ref[0])
    return _kernel

@functools.partial(jax.jit, static_argnames=("tile_s","tile_m"))
def nn_vpu(query, ref, *, tile_s=2048, tile_m=512):
    P, Ns, _ = query.shape
    Nm = ref.shape[1]
    ts = min(tile_s, _ru(Ns, 128)); tm = min(tile_m, _ru(Nm, 128))
    ns_p, nm_p = _ru(Ns, ts), _ru(Nm, tm)
    qt = jnp.pad(query.astype(jnp.float32), ((0,0),(0,ns_p-Ns),(0,5))).transpose(0,2,1)
    rt = jnp.pad(ref.astype(jnp.float32), ((0,0),(0,nm_p-Nm),(0,5)), constant_values=_PAD)
    rt = rt.at[:, :Nm, 3:].set(0.0).transpose(0,2,1)
    kernel = make_vpu_kernel(tm, nm_p//tm)
    d2, idx = pl.pallas_call(
        kernel, grid=(P, ns_p//ts, nm_p//tm),
        in_specs=[
            pl.BlockSpec((1,8,ts), lambda p,i,j:(p,0,i), memory_space=pltpu.VMEM),
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
    )(qt, rt)
    return idx[:, 0, :Ns], d2[:, 0, :Ns]

ridx, rd2 = jnp_nn(qs[0][:8], r[:8])
vidx, vd2 = nn_vpu(qs[0][:8], r[:8])
print("vpu match:", float(jnp.mean((vidx==ridx).astype(jnp.float32))),
      "d2err:", float(jnp.max(jnp.abs(vd2-rd2))))
for ts, tm in ((2048,512),(2048,1024),(1024,512)):
    timeit(lambda i: nn_vpu(qs[i%4], r, tile_s=ts, tile_m=tm), tag=f"pallas-vpu ts={ts} tm={tm}")
