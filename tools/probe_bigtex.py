"""Mosaic capability probe for the round-5 big-texture gather design.

Validates, on real TPU hardware, the three primitives the HBM-windowed
texture gather needs before megakernel.py grows the feature:

  1. vector reduce (jnp.min over an (8,128) tile) -> scalar usable as a
     dynamic DMA offset (pl.ds) from an ANY-space (HBM) ref;
  2. a lax.while_loop whose body issues that DMA and carries (8,128) f32
     masks ("served") until every lane's request is satisfied;
  3. lane-wise take_along_axis gathers against the DMA'd scratch rows.

Prints per-config timings (windowed gather over a megapixel-scale table)
so the window size WN can be chosen from data.  Run:
  python tools/probe_bigtex.py            # correctness + timing on TPU
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 8, 128


def _kernel(idx_ref, tab_ref, out_ref, scr, sem, *, wn: int, n_rows: int,
            taps: int):
    shape = (ROWS, LANES)
    out = [jnp.zeros(shape, jnp.float32) for _ in range(taps)]
    idx = [idx_ref[k, 0] for k in range(taps)]
    lane = [jnp.bitwise_and(i, 127) for i in idx]
    row = [jnp.right_shift(i, 7) for i in idx]
    served = [jnp.zeros(shape, jnp.float32) for _ in range(taps)]

    def cond(c):
        return sum(jnp.sum(1.0 - s) for s in c[taps:]) > 0.5

    def body(c):
        out = list(c[:taps])
        served = list(c[taps:])
        big = jnp.float32(1e9)
        rmin = jnp.min(
            functools.reduce(
                jnp.minimum,
                [jnp.where(s > 0.5, big, r.astype(jnp.float32))
                 for r, s in zip(row, served)]))
        rmin = jnp.minimum(rmin, float(n_rows - wn)).astype(jnp.int32)
        cp = pltpu.make_async_copy(
            tab_ref.at[pl.ds(rmin, wn), :], scr, sem)
        cp.start()
        cp.wait()
        for r_ in range(wn):
            brow = jnp.broadcast_to(scr[r_:r_ + 1, :], shape)
            for k in range(taps):
                g = jnp.take_along_axis(brow, lane[k], axis=1)
                m = (row[k] == rmin + r_) & (served[k] < 0.5)
                out[k] = out[k] + jnp.where(m, g, 0.0)
                served[k] = jnp.maximum(
                    served[k], jnp.where(m, 1.0, 0.0))
        return tuple(out) + tuple(served)

    res = jax.lax.while_loop(cond, body, tuple(out) + tuple(served))
    acc = functools.reduce(jnp.add, res[:taps])
    out_ref[0, :, :] = acc


def run(n_rows=8192, wn=16, taps=4, spread=64, blocks=512, iters=20):
    """spread = how many distinct rows a block's lanes touch (coherence)."""
    key = jax.random.PRNGKey(0)
    tab = jax.random.uniform(key, (n_rows, LANES), jnp.float32)
    # per-block base row + per-lane jitter within `spread` rows
    kb, kj = jax.random.split(key)
    base = jax.random.randint(kb, (blocks, 1, 1), 0, n_rows - spread - 1)
    jit_r = jax.random.randint(kj, (taps, blocks, ROWS, LANES), 0, spread)
    lane_i = jax.random.randint(kj, (taps, blocks, ROWS, LANES), 0, LANES)
    idx = ((base[None] + jit_r) * LANES + lane_i).astype(jnp.int32)

    grid = (blocks,)
    f = pl.pallas_call(
        functools.partial(_kernel, wn=wn, n_rows=n_rows, taps=taps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((taps, 1, ROWS, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((blocks, ROWS, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wn, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )

    def call(idx):
        return f(idx.reshape(taps, blocks, ROWS, LANES), tab)

    jf = jax.jit(call)
    out = np.asarray(jf(idx))
    # oracle
    tabn = np.asarray(tab).reshape(-1)
    idxn = np.asarray(idx)
    want = tabn[idxn].sum(axis=0)
    err = np.abs(out - want).max()
    jax.block_until_ready(jf(idx))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(idx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    lanes_total = blocks * ROWS * LANES
    print(f"n_rows={n_rows} wn={wn} taps={taps} spread={spread} "
          f"blocks={blocks}: err={err:.2e} {dt*1e3:.3f} ms "
          f"= {lanes_total/dt/1e6:.1f} Mlane-samples/s")
    return err


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    e = run(n_rows=512, wn=8, taps=1, spread=4, blocks=64, iters=5)
    assert e < 1e-6, e
    e = run(n_rows=8192, wn=16, taps=4, spread=16, blocks=512)
    assert e < 1e-5, e
    for wn in (8, 16, 32):
        for spread in (8, 64, 256):
            run(n_rows=8192, wn=wn, taps=4, spread=spread, blocks=512)
