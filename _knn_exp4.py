import time, jax, jax.numpy as jnp, numpy as np, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 1e6
def _ru(x, m): return ((x + m - 1) // m) * m

def make_kernel(tile_m, n_tiles_m, ts, prec):
    def _kernel(q_ref, r_ref, d2_ref, idx_ref):
        j = pl.program_id(2)
        @pl.when(j == 0)
        def _():
            d2_ref[...] = jnp.full_like(d2_ref, jnp.inf)
            idx_ref[...] = jnp.zeros_like(idx_ref)
        q = q_ref[0]          # [8, TS]
        r = r_ref[0]          # [8, TM]
        cross = jax.lax.dot_general(r, q, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)   # [TM, TS]
        r2 = jnp.sum(r * r, axis=0, keepdims=True)    # [1, TM]
        part = r2.T - 2.0 * cross                     # [TM, TS]
        lm = jnp.min(part, axis=0, keepdims=True)     # [1, TS]
        la = jnp.argmin(part, axis=0, keepdims=True).astype(jnp.int32) + j * tile_m
        cur_d = d2_ref[0]                              # [8, TS]
        cur_i = idx_ref[0]
        better = lm < cur_d                            # broadcast [8, TS]
        d2_ref[0] = jnp.where(better, jnp.broadcast_to(lm, cur_d.shape), cur_d)
        idx_ref[0] = jnp.where(better, jnp.broadcast_to(la, cur_i.shape), cur_i)
        @pl.when(j == n_tiles_m - 1)
        def _f2():
            q2 = jnp.sum(q * q, axis=0, keepdims=True)
            d2_ref[0] = jnp.maximum(d2_ref[0] + q2, 0.0)
    return _kernel

@functools.partial(jax.jit, static_argnames=("tile_s","tile_m","prec","interpret"))
def nn_batched4(query, ref, *, tile_s=512, tile_m=512, prec="highest", interpret=False):
    P, Ns, _ = query.shape
    Nm = ref.shape[1]
    ts = min(tile_s, _ru(Ns, 128))
    tm = min(tile_m, _ru(Nm, 128))
    ns_p = _ru(Ns, ts); nm_p = _ru(Nm, tm)
    qt = jnp.pad(query.astype(jnp.float32), ((0,0),(0,ns_p-Ns),(0,5))).transpose(0,2,1)
    rt = jnp.pad(ref.astype(jnp.float32), ((0,0),(0,nm_p-Nm),(0,5)), constant_values=_PAD)
    rt = rt.at[:, :Nm, 3:].set(0.0).transpose(0,2,1)
    n_tiles_m = nm_p // tm
    grid = (P, ns_p // ts, n_tiles_m)
    pr = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH,
          "default": jax.lax.Precision.DEFAULT}[prec]
    kernel = make_kernel(tm, n_tiles_m, ts, pr)
    d2, idx = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, ts), lambda p,i,j: (p,0,i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tm), lambda p,i,j: (p,0,j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1,8,ts), lambda p,i,j: (p,0,i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,8,ts), lambda p,i,j: (p,0,i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, 8, ns_p), jnp.float32),
            jax.ShapeDtypeStruct((P, 8, ns_p), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2*P*ns_p*nm_p*8, bytes_accessed=4*P*(ns_p*8+nm_p*8*(ns_p//ts)+2*ns_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qt, rt)
    return idx[:, 0, :Ns], d2[:, 0, :Ns]

if __name__ == "__main__":
    key = jax.random.key(0)
    P, Ns, Nm = 512, 2048, 1024
    center = jnp.asarray([0.02, -0.01, 0.55])
    q = center + jax.random.normal(jax.random.fold_in(key,2), (P, Ns, 3)) * 0.04
    r = center + jax.random.normal(jax.random.fold_in(key,3), (P, Nm, 3)) * 0.04
    def ref_nn(q, r):
        d = jnp.sum((q[:,:,None,:]-r[:,None,:,:])**2, -1)
        return jnp.argmin(d,-1), jnp.min(d,-1)
    ridx, rd2 = jax.jit(ref_nn)(q[:8], r[:8]); jax.block_until_ready(rd2)
    for prec in ("highest", "default"):
        for recenter in (False, True):
            qq, rr = (q - center, r - center) if recenter else (q, r)
            idx, d2 = nn_batched4(qq[:8], rr[:8], prec=prec)
            m = float(jnp.mean((idx==ridx).astype(jnp.float32)))
            de = float(jnp.max(jnp.abs(d2-rd2)))
            print(f"prec={prec} recenter={recenter}: idx match={m:.5f} d2 err={de:.2e}")
    for prec in ("highest",):
        for ts, tm in ((512,512),(1024,512),(2048,512),(1024,1024),(2048,1024)):
            idx, d2 = nn_batched4(q, r, tile_s=ts, tile_m=tm, prec=prec); jax.block_until_ready(d2)
            t0=time.time(); n=10
            for _ in range(n):
                idx, d2 = nn_batched4(q, r, tile_s=ts, tile_m=tm, prec=prec); jax.block_until_ready(d2)
            print(f"prec={prec} ts={ts} tm={tm}: {(time.time()-t0)/n*1000:.2f}ms")
