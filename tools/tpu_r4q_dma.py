"""Round-4 TPU batch Q: per-row DMA-issue cost inside a Pallas kernel.

The remaining wave-loop lever is a fused Pallas chunk kernel that DMAs
each ray's cluster row HBM->VMEM itself (skipping the XLA gather's
materialized output and the MT intermediates). Its feasibility hangs
on ONE number: what does issuing R independent 4.6 KB row copies cost
in-kernel? (2048 rows per chunk-wave; at >=1 us/row the design is dead
— the round-3 note flagged exactly this risk.)

Two variants, each its own subprocess (pallas compile poisoning):
  serial: start+wait per row — issue latency fully exposed;
  pipe:   NBUF-deep start-ahead double buffering — issue cost
          overlapped with transfer.
Reported as ns/row and effective GB/s vs the 145 GB/s gather engine.

    python tools/tpu_r4q_dma.py 2>&1 | tee /tmp/tpu_r4q.log
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, sys, time, functools
sys.path.insert(0, {repo!r})
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VARIANT = {variant!r}
K, W = 10987, 9 * 128       # real cluster-row table geometry
R = 4096                    # rows copied per kernel invocation
NBUF = 8

rng = np.random.default_rng(0)
# 3D: scalar LEADING-dim indexing is the legal form for both DMA ends
# (a pl.ds slice of 1 on the tiled sublane dim fails "aligned to
# tiling (8)"); each (1, W) buffer pads to (8, W) internally.
table = jnp.asarray(rng.random((K, 1, W)), jnp.float32)
idx = jnp.asarray(rng.integers(0, K, size=(R,)), jnp.int32)


def kernel(idx_ref, table_ref, out_ref, scratch, sems):
    def mk(i, slot):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[i]],
            scratch.at[slot],
            sems.at[slot],
        )

    def consume(slot, acc):
        # a vector.load at a DYNAMIC sublane offset is Mosaic-illegal
        # ("dynamic load with unaligned indices") — select the slot row
        # with a one-hot mask over the whole scratch instead
        oh = jax.lax.broadcasted_iota(jnp.int32, (NBUF, 1), 0) == slot
        # where-select, not multiply: 0 x uninitialized-slot garbage
        # (NaN in interpret mode) would poison the sum
        return acc + jnp.sum(
            jnp.where(oh, scratch[:, 0, :128], 0.0), axis=0, keepdims=True
        )

    if VARIANT == "serial":
        def body(i, acc):
            slot = jax.lax.rem(i, NBUF)
            dma = mk(i, slot)
            dma.start()
            dma.wait()
            return consume(slot, acc)
        acc = jax.lax.fori_loop(0, R, body, jnp.zeros((1, 128), jnp.float32))
    else:  # pipe
        for i in range(NBUF):  # static prologue
            mk(i, i).start()

        def body(i, acc):
            slot = jax.lax.rem(i, NBUF)
            mk(i, slot).wait()
            acc = consume(slot, acc)

            @pl.when(i + NBUF < R)
            def _():
                mk(i + NBUF, jax.lax.rem(i + NBUF, NBUF)).start()

            return acc
        acc = jax.lax.fori_loop(0, R, body, jnp.zeros((1, 128), jnp.float32))
    out_ref[:, :] = acc


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays in HBM
    out_specs=pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[
        pltpu.VMEM((NBUF, 1, W), jnp.float32),
        pltpu.SemaphoreType.DMA((NBUF,)),
    ],
)

fn = jax.jit(lambda idx, table: pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    grid_spec=grid_spec,
)(idx, table))

out = jax.block_until_ready(fn(idx, table))
best = 1e9
for _ in range(5):
    t0 = time.time()
    out = jax.block_until_ready(fn(idx, table))
    best = min(best, time.time() - t0)
ns_row = best / R * 1e9
gb = R * W * 4 / 1e9
print(json.dumps(dict(variant=VARIANT, ms=round(best * 1e3, 3),
                      ns_per_row=round(ns_row, 0),
                      eff_gbps=round(gb / best, 1),
                      checksum=float(np.asarray(out).sum()))), flush=True)
"""

if __name__ == "__main__":
    for variant in ("serial", "pipe"):
        code = CHILD.format(repo=os.path.dirname(HERE), variant=variant)
        print(f"=== r4q dma {variant} ===", flush=True)
        subprocess.run([sys.executable, "-c", code], timeout=2400)
