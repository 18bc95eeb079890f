"""Microbenchmark: per-lane SUBLANE gather inside a Mosaic kernel.

Question: does `jnp.take_along_axis(tab, idx, axis=0)` (tab (R,128) in
VMEM, idx (S,128) per-lane row indices) lower to something fast, or is a
one-hot matmul / select-loop the only viable lookup at R rows?

This decides the large-grid sweep design (transport/sweepxl): R = minor
rows = n^2/128 reaches 128-512 at 128^3-256^3, where the round-3
select-loop is O(R) per substep and the one-hot matmul is O(R*128).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512          # table rows
S = 64           # index rows (lanes = S*128)
ITERS = 256      # chained iterations inside the kernel


def kern_gather(tab_ref, idx_ref, out_ref):
    idx = idx_ref[...]
    tab = tab_ref[...]

    def body(i, acc):
        ix = (idx + i) % R
        return acc + jnp.take_along_axis(tab, ix, axis=0)

    out_ref[...] = jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((S, 128), jnp.float32))


def kern_select(tab_ref, idx_ref, out_ref):
    idx = idx_ref[...]
    tab = tab_ref[...]

    def body(i, acc):
        ix = (idx + i) % R
        v = jnp.zeros((S, 128), jnp.float32)
        for r in range(R):
            v = v + jnp.where(ix == r, tab[r][None, :], 0.0)
        return acc + v

    out_ref[...] = jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((S, 128), jnp.float32))


def kern_onehot(tab_ref, idx_ref, out_ref):
    # one-hot matmul: (S*?, R) @ (R, 128) then per-lane col select is not
    # needed here since cols align; this measures the MXU path cost
    acc = jnp.zeros((S, 128), jnp.float32)
    idx = idx_ref[...]
    tab = tab_ref[...]
    for i in range(ITERS):
        ix = (idx + i) % R
        # can't form (S,128,R) one-hot cheaply per lane-col; emulate the
        # real usage: lanes flattened to (1, S*128), one-hot rows (R,)
        # -> out rows = tab rows: cost R * 128 * (S*128) MACs
        ixf = ix.reshape(1, S * 128)
        sub = jax.lax.broadcasted_iota(jnp.int32, (R, S * 128), 0)
        A = jnp.where(sub == ixf, 1.0, 0.0)
        # gather value = sum_r A[r,l] * tab[r, l%128]: need tab bcast per
        # lane col; approximate with fixed col pattern (cost-equivalent)
        tl = jnp.broadcast_to(tab[:, :128], (R, 128))
        prod = jax.lax.dot_general(A.T, tl, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc += prod.reshape(S, 128, 128)[:, :, 0:1] * 0 + prod.reshape(
            S * 128, 128)[:, 0].reshape(S, 128)
    out_ref[...] = acc


def run(kern, name):
    tab = jnp.asarray(np.random.rand(R, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, R, (S, 128)), jnp.int32)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
    )
    try:
        o = f(tab, idx)
        float(o.sum())
    except Exception as e:
        print(f"{name}: FAILED: {str(e)[:300]}")
        return
    t0 = time.perf_counter()
    o = f(tab, idx)
    s = float(o.sum())
    dt = time.perf_counter() - t0
    n_gather = S * 128 * ITERS
    print(f"{name}: {dt*1e3:.2f} ms for {n_gather} gathers "
          f"-> {n_gather/dt/1e9:.2f} Ge/s (sum {s:.3e})")


if __name__ == "__main__":
    run(kern_gather, f"take_along_axis axis=0 (R={R})")
    run(kern_select, f"select-loop (R={R})")
