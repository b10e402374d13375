#!/usr/bin/env python3
"""Measure the MSM payload-gather floor (VERDICT r4 item 3: measure, don't
argue).

The Pippenger per-window payload gather (parallel/msm.py step 1) is the
measured MSM floor (~14.5 ms/window at 2^20, PERF.md r4). Two candidate
formulations are probed against XLA's gather on the real chip:

1. `jnp.take` row gather at several row widths — is XLA's gather row-count
   bound or byte bound? (If byte-bound, shrinking the payload row from 3
   coords to 2 — z is constant 1 for affine inputs — would win ~1/3.)
2. A Pallas kernel issuing one async DMA per row from HBM, double-buffered
   at configurable depth — the "overlap the gather with the segscan" idea.
   Its ceiling is the per-descriptor issue rate: if that is below XLA's
   per-row rate, the fused-gather segscan kernel CANNOT beat the current
   sort -> take -> segscan pipeline and the floor stands proven.

Run on TPU:  python tools/bench_gather_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(x):
    flat = x
    while flat.ndim > 1:
        flat = flat[0]
    return np.asarray(flat[:1])


def _device_payload(N, W):
    """Payload synthesized ON DEVICE (a host-random payload would ship
    N*W*4 bytes through the dev box's slow tunnel before measuring)."""
    @jax.jit
    def mk():
        r = jax.lax.broadcasted_iota(jnp.uint32, (N, W), 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, (N, W), 1)
        return r * np.uint32(2654435761) ^ (c * np.uint32(40503))
    return mk()


def bench_xla_take(N=1 << 20, W=64, M=1 << 20, iters=5):
    rng = np.random.default_rng(0)
    pay = _device_payload(N, W)
    idxs = [jnp.asarray(rng.permutation(N).astype(np.int32)[:M])
            for _ in range(2)]

    REP = 8

    @jax.jit
    def take_chain(p, i):
        """REP serially-dependent gathers; returns a few bytes (fetching a
        slice of the big output pulls the WHOLE buffer through the dev-box
        tunnel, which is what stalled the first version of this probe)."""
        o = None
        for _ in range(REP):
            o = jnp.take(p, i, axis=0)
            i = i ^ (o[0, 0] >> np.uint32(31)).astype(jnp.int32)
        return o[0, :1]

    out = take_chain(pay, idxs[0])
    fetch(out)
    best = float("inf")
    for t in range(iters):
        t0 = time.perf_counter()
        out = take_chain(pay, idxs[t % 2])
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    rate = REP * M / best
    print(f"xla_take      W={W:4d} ({4*W:4d}B/row): {best/REP*1e3:8.2f} ms "
          f"-> {rate/1e6:7.2f} Mrows/s  {rate*4*W/1e9:7.1f} GB/s",
          flush=True)
    return rate


def dma_gather_call(N, W, M, Cb, depth, interpret=False):
    """Pallas per-row DMA gather: grid over M/Cb chunks; each chunk issues
    `depth`-deep double-buffered row DMAs from the HBM payload and XORs the
    rows into an accumulator (compute cost ~nil; measures DMA issue+drain).
    Buffer slots are STATIC (the loop body unrolls `depth` slots per
    iteration) — a traced slot index in `.at[slot]` crashes the Mosaic
    compiler on this toolchain."""
    G = M // Cb
    assert Cb % depth == 0

    def body(idx_ref, pay_ref, out_ref, scratch, acc, sems):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        def get_dma(slot, r):
            return pltpu.make_async_copy(
                pay_ref.at[pl.ds(idx_ref[g * Cb + r], 1), :],
                scratch.at[slot],
                sems.at[slot],
            )

        for j in range(depth):
            get_dma(j, j).start()

        def loop(it, acc_v):
            base = it * depth
            for j in range(depth):
                get_dma(j, base + j).wait()
                v = scratch[j]

                @pl.when(base + j + depth < Cb)
                def _(j=j, base=base):
                    get_dma(j, base + j + depth).start()

                acc_v = acc_v ^ v
            return acc_v

        acc[...] = jax.lax.fori_loop(0, Cb // depth, loop, acc[...])

        @pl.when(g == G - 1)
        def _():
            out_ref[...] = acc[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, 1, W), jnp.uint32),
            pltpu.VMEM((1, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.uint32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def bench_dma_gather(N=1 << 20, W=64, M=1 << 18, Cb=1 << 12, depth=8,
                     iters=5):
    rng = np.random.default_rng(1)
    pay = _device_payload(N, W)
    idxs = [jnp.asarray(rng.permutation(N).astype(np.int32)[:M])
            for _ in range(2)]
    kern = jax.jit(dma_gather_call(N, W, M, Cb, depth))
    out = kern(idxs[0], pay)
    fetch(out)
    best = float("inf")
    for t in range(iters):
        i = idxs[t % 2] ^ (out[0, 0] >> np.uint32(31)).astype(jnp.int32)
        fetch(i)
        t0 = time.perf_counter()
        out = kern(i, pay)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    rate = M / best
    print(f"dma_gather    W={W:4d} depth={depth:2d}: {best*1e3:8.2f} ms "
          f"({M} rows) -> {rate/1e6:7.2f} Mrows/s  {rate*4*W/1e9:7.1f} GB/s",
          flush=True)
    return rate


def main():
    print(f"backend: {jax.default_backend()}  dev: {jax.devices()[0]}",
          flush=True)
    for W in (32, 40, 64, 128):
        bench_xla_take(W=W)
    for depth in (2, 8, 16):
        try:
            bench_dma_gather(W=128, depth=depth)  # HBM row DMA needs 128-lane-aligned rows
        except Exception as e:
            print(f"dma_gather depth={depth} failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
