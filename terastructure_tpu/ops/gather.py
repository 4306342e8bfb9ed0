"""DMA block-gather kernel: minibatch packed-row gather at HBM bandwidth.

XLA's row gather on v5e is latency-bound (~1 us/row): gathering a
B=4096 x W=25088 minibatch from the packed genotype matrix costs ~4 ms
(benchmarks/profile_bign.py gather_plain_ms) — a large share of a big-N
SVI step. This kernel issues one HBM->HBM DMA per *block* of `block`
consecutive rows, `blocks_in_flight` copies concurrently, so the gather
runs at copy bandwidth instead of one-row-at-a-time latency.

Single-row slices of a tiled int8 HBM memref are illegal in Mosaic
("slice shape along dimension 0 must be aligned to tiling (8)"), which
is why the unit is an 8-row-aligned block, not a row — the same reason
the fused path's in-kernel gather works on SNP groups
(ops/fused_step.py). Sampling block starts uniformly keeps the SVI
gamma estimate unbiased (every SNP equally likely; see
SVIConfig.snp_group); it trades per-draw independence for bandwidth
exactly like snp_group=8, minus the 10x reshape-copy penalty of the
XLA grouped gather.

Block starts arrive by scalar prefetch (known before the grid body
runs); source and destination live in ANY (HBM) memory space — nothing
transits VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(starts_ref, src_ref, out_ref, sem, *, block, in_flight):
    i = pl.program_id(0)

    def copy(r):
        # Multiply the prefetched BLOCK index by `block` here, inside
        # the kernel, so Mosaic can prove the HBM slice start divisible
        # by the (8, 128) tiling; a row start computed outside arrives
        # as an opaque scalar and fails layout inference.
        s = starts_ref[i * in_flight + r] * block
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(s, block)],
            out_ref.at[pl.ds((i * in_flight + r) * block, block)],
            sem.at[r],
        )

    for r in range(in_flight):
        copy(r).start()
    for r in range(in_flight):
        copy(r).wait()


@functools.partial(jax.jit,
                   static_argnames=("block", "blocks_in_flight", "interpret"))
def gather_row_blocks(src, starts, *, block: int = 8,
                      blocks_in_flight: int = 16, interpret: bool = False):
    """src: (L, W) HBM-resident; starts: (G,) int32 BLOCK indices in
    [0, L // block) (row start = starts[g] * block — kept in block
    units so the kernel's in-body multiply proves Mosaic tiling
    alignment), with G % blocks_in_flight == 0. Returns (G*block, W)
    where out[g*block + r] == src[starts[g]*block + r]."""
    g = starts.shape[0]
    w = src.shape[1]
    if g % blocks_in_flight:
        raise ValueError(
            f"G={g} must be a multiple of blocks_in_flight={blocks_in_flight}")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g // blocks_in_flight,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((blocks_in_flight,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, block=block,
                          in_flight=blocks_in_flight),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g * block, w), src.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), src)
