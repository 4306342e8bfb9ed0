"""Fused Pallas TPU kernels for the SVI hot loop.

The dense path (ops/stats_dense.py) materializes (B, N) float32
intermediates (allele counts, mixture ratios) in HBM every local
iteration — ~40 MB per iteration at the TGP config. These kernels unpack
the 2-bit genotypes *in VMEM* and fuse the divide into the two matmuls,
so per-iteration HBM traffic drops to the packed bytes (B*N/4) plus the
exp-Elog-theta factor (N*K): ~25x less.

Planar trick: a packed byte holds individuals (4w..4w+3); extracting bit
plane s via `(bytes >> 2s) & 3` yields individuals {4w+s : w} — a
strided slice, not an interleave. We pre-shape u as `u_planes (4, W, K)`
with `u_planes[s, w] = u[4w+s]` (one transpose per step, outside the
kernel), so each kernel tile processes four (TB, TW) planes with pure
shift/mask unpacking and plane-local matmuls. Gamma statistics come back
in the same planar layout and are re-interleaved outside.

Two kernels (separate because their accumulation axes differ and Pallas
output revisits must be grid-consecutive):
  - lambda-stats: grid (B/TB, W/TW), accumulate l0/l1 (B, K) over the
    fast W axis;
  - gamma-stats: grid (W/TW, B/TB), accumulate g_planes (4, W, K) over
    the fast B axis.

Shapes must satisfy B % TB == 0 and W % TW == 0 — the engine pads
individuals (MISSING codes) and the batch accordingly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default tiles: TB x (4*TW) individuals-per-tile; tuned on v5e.
DEF_TB = 256
DEF_TW = 512

_EPS = 1e-30


def u_to_planes(u: jnp.ndarray) -> jnp.ndarray:
    """(N, K) -> (4, W, K) planar layout; requires N % 4 == 0."""
    n, k = u.shape
    return u.reshape(n // 4, 4, k).transpose(1, 0, 2)


def planes_to_flat(g: jnp.ndarray) -> jnp.ndarray:
    """(4, W, K) -> (N, K) inverse of u_to_planes."""
    _, w, k = g.shape
    return g.transpose(1, 0, 2).reshape(4 * w, k)


def _plane_counts(bytes_blk, s, dtype):
    """Allele-count matrices for bit plane s of a packed byte block."""
    # Mosaic on v5e restricts u8 vector compare/cast ops — unpack in i32.
    x = (bytes_blk.astype(jnp.int32) >> (2 * s)) & 0x3
    missing = x == 3
    xf = x.astype(jnp.float32)
    a1 = jnp.where(missing, 0.0, xf).astype(dtype)
    a0 = jnp.where(missing, 0.0, 2.0 - xf).astype(dtype)
    return a1, a0


def _ratios_tile(blk, up_ref, t_cat, dtype, approx_div=False):
    """Shared tile core: planar counts -> big-dot ratios.

    blk (TB, TW) bytes, t_cat (2TB, K); returns (r (2TB, 4TW), u_cat
    (4TW, K)) — one D-dot instead of 8 small ones (MXU launch latency
    dominates at K=8; see fused_step.one_pass).

    approx_div divides with the VPU's fast reciprocal approximation
    (~2^-12 relative error) instead of the exact divide — safe for the
    big-N SUBSAMPLED solve iterations, whose lambda already carries
    ~1/sqrt(sub_n) statistical noise; exact passes keep the true divide.
    """
    u_cat = up_ref[:].reshape(-1, up_ref.shape[-1]).astype(dtype)  # (4TW,K)
    counts = [_plane_counts(blk, s, dtype) for s in range(4)]
    a_cat = jnp.concatenate(
        [jnp.concatenate([c[0] for c in counts], axis=1),
         jnp.concatenate([c[1] for c in counts], axis=1)], axis=0)
    d = jax.lax.dot_general(
        t_cat, u_cat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (2TB, 4TW)
    if approx_div:
        r = (a_cat.astype(jnp.float32)
             * pl.reciprocal(d + _EPS, approx=True)).astype(dtype)
    else:
        r = (a_cat.astype(jnp.float32) / (d + _EPS)).astype(dtype)
    return r, u_cat


def _lambda_kernel(bytes_ref, up_ref, t1_ref, t0_ref, l0_ref, l1_ref,
                   *, dtype, approx_div=False):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        l0_ref[:] = jnp.zeros_like(l0_ref)
        l1_ref[:] = jnp.zeros_like(l1_ref)

    tb = t1_ref.shape[0]
    t_cat = jnp.concatenate(
        [t1_ref[:].astype(dtype), t0_ref[:].astype(dtype)], axis=0)
    r, u_cat = _ratios_tile(bytes_ref[:], up_ref, t_cat, dtype,
                            approx_div=approx_div)
    acc = jnp.dot(r, u_cat, preferred_element_type=jnp.float32)  # (2TB, K)
    l0_ref[:] += acc[:tb]
    l1_ref[:] += acc[tb:]


def _gamma_kernel(bytes_ref, up_ref, t1_ref, t0_ref, g_ref, *, dtype):
    i = pl.program_id(1)                  # fast axis: batch tiles

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    t_cat = jnp.concatenate(
        [t1_ref[:].astype(dtype), t0_ref[:].astype(dtype)], axis=0)
    r, _ = _ratios_tile(bytes_ref[:], up_ref, t_cat, dtype)
    tw = up_ref.shape[1]
    k = up_ref.shape[2]
    g_ref[:] += jax.lax.dot_general(
        r, t_cat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(4, tw, k)


def _tiles(b, w, tb, tw):
    if b % tb or w % tw:
        raise ValueError(f"B={b} W={w} must be divisible by tiles ({tb},{tw})")
    return b // tb, w // tw


def pick_tiles(b: int, w: int) -> tuple[int, int]:
    """Largest supported tile sizes dividing (B, W)."""
    tb = next((t for t in (256, 128, 64, 32, 16, 8) if b % t == 0), None)
    tw = next((t for t in (512, 256, 128) if w % t == 0), None)
    if tb is None or tw is None:
        raise ValueError(
            f"B={b} needs a divisor in 8..256 and W={w} in 128/256/512; "
            "pad the batch/individuals (engine does this automatically)")
    return tb, tw


@functools.partial(jax.jit, static_argnames=("tb", "tw", "dtype", "interpret",
                                             "approx_div"))
def lambda_stats_packed(rows, u_planes, t1, t0, *, tb=DEF_TB, tw=DEF_TW,
                        dtype=jnp.bfloat16, interpret=False,
                        approx_div=False):
    """Raw lambda statistics from packed genotype rows.

    rows: (B, W) uint8; u_planes: (4, W, K) f32; t1/t0: (B, K) f32.
    Returns (l0_raw, l1_raw) (B, K) f32 — caller multiplies by t1/t0.
    """
    b, w = rows.shape
    k = u_planes.shape[-1]
    nb, nw = _tiles(b, w, tb, tw)
    kern = functools.partial(_lambda_kernel, dtype=dtype,
                             approx_div=approx_div)
    l0, l1 = pl.pallas_call(
        kern,
        grid=(nb, nw),
        in_specs=[
            pl.BlockSpec((tb, tw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tw, k), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
        ],
        interpret=interpret,
    )(rows, u_planes, t1, t0)
    return l0, l1


@functools.partial(jax.jit, static_argnames=("tb", "tw", "dtype", "interpret"))
def gamma_stats_packed(rows, u_planes, t1, t0, *, tb=DEF_TB, tw=DEF_TW,
                       dtype=jnp.bfloat16, interpret=False):
    """Raw gamma statistics (planar): (4, W, K) f32 = sum_b r^T t.

    Caller re-interleaves via planes_to_flat and multiplies by u.
    """
    b, w = rows.shape
    k = u_planes.shape[-1]
    nb, nw = _tiles(b, w, tb, tw)
    kern = functools.partial(_gamma_kernel, dtype=dtype)
    g = pl.pallas_call(
        kern,
        grid=(nw, nb),
        in_specs=[
            pl.BlockSpec((tb, tw), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tw, k), lambda j, i: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tw, k), lambda j, i: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, w, k), jnp.float32),
        interpret=interpret,
    )(rows, u_planes, t1, t0)
    return g


def _batch_stats_kernel(bytes_ref, up_ref, t1_ref, t0_ref,
                        g_ref, l0_ref, l1_ref, *, tb, dtype):
    """Fused lambda+gamma statistics: one unpack + one D-dot per tile.

    Grid (nw, nb) — w-tiles slow, batch-tiles fast. gamma accumulates in
    its (4, tw, K) block over the fast batch axis (grid-consecutive
    revisits); lambda accumulates into a full-(B, K) block (the same
    block every iteration, trivially consecutive) at dynamic row offset
    i*tb, initialized during the first w-tile sweep."""
    j = pl.program_id(0)                  # slow axis: w tiles
    i = pl.program_id(1)                  # fast axis: batch tiles

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    t_cat = jnp.concatenate(
        [t1_ref[:].astype(dtype), t0_ref[:].astype(dtype)], axis=0)
    r, u_cat = _ratios_tile(bytes_ref[:], up_ref, t_cat, dtype)
    tw = up_ref.shape[1]
    k = up_ref.shape[2]
    g_ref[:] += jax.lax.dot_general(
        r, t_cat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(4, tw, k)
    acc = jnp.dot(r, u_cat, preferred_element_type=jnp.float32)  # (2TB, K)
    sl = pl.ds(i * tb, tb)

    @pl.when(j == 0)
    def _():
        l0_ref[sl] = jnp.zeros((tb, k), jnp.float32)
        l1_ref[sl] = jnp.zeros((tb, k), jnp.float32)

    l0_ref[sl] += acc[:tb]
    l1_ref[sl] += acc[tb:]


@functools.partial(jax.jit, static_argnames=("tb", "tw", "dtype", "interpret"))
def batch_stats_fused_packed(rows, u, t1, t0, *, tb, tw,
                             dtype=jnp.bfloat16, interpret=False):
    """All sufficient stats from packed rows in ONE kernel.

    Semantically identical to batch_stats_packed, but the genotype
    unpack and the D = T·Uᵀ dot (half the matmul FLOPs of a stats pass)
    are shared between the lambda and gamma accumulations instead of
    recomputed by two separate kernels.

    Measured SLOWER than the two-kernel pair on v5e (13.4 vs 12.5 ms at
    N=100K B=4096 K=10, benchmarks/profile_bign.py): at K<<128 the
    matmuls are lane-padding-bound, so saving the D recompute buys less
    than the per-tile lambda read-modify-write costs. Kept as the
    reference fusion (it wins when K ~ 128 makes the D-dot dominant).

    Returns (gamma_stat (N, K), l0 (B, K), l1 (B, K)).
    """
    u_planes = u_to_planes(u)
    b, w = rows.shape
    k = u_planes.shape[-1]
    nb, nw = _tiles(b, w, tb, tw)
    kern = functools.partial(_batch_stats_kernel, tb=tb, dtype=dtype)
    g, l0, l1 = pl.pallas_call(
        kern,
        grid=(nw, nb),
        in_specs=[
            pl.BlockSpec((tb, tw), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tw, k), lambda j, i: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, tw, k), lambda j, i: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, w, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
        ],
        interpret=interpret,
    )(rows, u_planes, t1, t0)
    gamma_stat = u * planes_to_flat(g)
    return gamma_stat, t1 * l0, t0 * l1


def _batch_stats_v2_kernel(bytes_ref, up_ref, t1_ref, t0_ref,
                           g_ref, l0p_ref, l1p_ref, *, dtype,
                           approx_div=False):
    """Fused lambda+gamma stats, v2: lambda comes out as PER-W-TILE
    PARTIALS instead of read-modify-write accumulation.

    Grid (nw, nb) — w-tiles slow, batch-tiles fast. gamma accumulates in
    its (4, tw, K) block over the fast batch axis (grid-consecutive
    revisits, like _gamma_kernel); each (j, i) tile writes its lambda
    contribution to its OWN (1, tb, K) slot of an (nw, B, K) output —
    no revisits at all, so no first-sweep zeroing and no dynamic-slice
    RMW (what made _batch_stats_kernel lose to the two-kernel pair).
    The caller reduces the partials over the nw axis (nw*B*K f32, ~8 MB
    at config-5 shapes — one cheap XLA sum)."""
    i = pl.program_id(1)                  # fast axis: batch tiles

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    tb = t1_ref.shape[0]
    t_cat = jnp.concatenate(
        [t1_ref[:].astype(dtype), t0_ref[:].astype(dtype)], axis=0)
    r, u_cat = _ratios_tile(bytes_ref[:], up_ref, t_cat, dtype,
                            approx_div=approx_div)
    tw = up_ref.shape[1]
    k = up_ref.shape[2]
    g_ref[:] += jax.lax.dot_general(
        r, t_cat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(4, tw, k)
    acc = jnp.dot(r, u_cat, preferred_element_type=jnp.float32)  # (2TB, K)
    l0p_ref[:] = acc[:tb][None]
    l1p_ref[:] = acc[tb:][None]


@functools.partial(jax.jit, static_argnames=("tb", "tw", "dtype", "interpret",
                                             "approx_div"))
def batch_stats_fused_v2_packed(rows, u, t1, t0, *, tb, tw,
                                dtype=jnp.bfloat16, interpret=False,
                                approx_div=False):
    """All sufficient stats from packed rows in one kernel, v2 layout.

    Same semantics as batch_stats_packed / batch_stats_fused_packed;
    shares the genotype unpack and the D = T·Uᵀ dot between the lambda
    and gamma accumulations (3 MXU dots + 1 unpack per tile vs the
    pair's 4 + 2) without the v1 fused kernel's lambda RMW overhead.

    Returns (gamma_stat (N, K), l0 (B, K), l1 (B, K)).
    """
    u_planes = u_to_planes(u)
    b, w = rows.shape
    k = u_planes.shape[-1]
    nb, nw = _tiles(b, w, tb, tw)
    kern = functools.partial(_batch_stats_v2_kernel, dtype=dtype,
                             approx_div=approx_div)
    g, l0p, l1p = pl.pallas_call(
        kern,
        grid=(nw, nb),
        in_specs=[
            pl.BlockSpec((tb, tw), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tw, k), lambda j, i: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, tw, k), lambda j, i: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, k), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, k), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, w, k), jnp.float32),
            jax.ShapeDtypeStruct((nw, b, k), jnp.float32),
            jax.ShapeDtypeStruct((nw, b, k), jnp.float32),
        ],
        interpret=interpret,
    )(rows, u_planes, t1, t0)
    gamma_stat = u * planes_to_flat(g)
    return gamma_stat, t1 * l0p.sum(axis=0), t0 * l1p.sum(axis=0)


def decode_count_planes(rows, dtype=jnp.bfloat16):
    """Packed rows -> pre-decoded allele-count planes (XLA, one pass).

    rows: (B, W) uint8. Returns (a1, a0) each (B, 4, W) `dtype` with
    a1[b, s, w] = count for individual 4w+s (exact: counts are {0,1,2},
    missing -> 0 in both planes). The (B, 4, W) layout lets Pallas tiles
    slice (tb, 4, tw) blocks whose reshape (tb, 4*tw) matches u_planes'
    (4, tw, K) -> (4tw, K) row order — no transpose anywhere.

    Purpose (VERDICT r2 #8): the big-N subsampled solve re-unpacks the
    same bytes every coordinate-ascent iteration; the unpack chain
    (shift/mask/compare/cast/selects) is the VPU-bound share of the
    iteration (docs/design.md). Decoding ONCE costs one extra HBM
    round-trip of 2*B*4W*2 bytes, repaid local_iters times.
    """
    x = rows.astype(jnp.int32)
    planes = jnp.stack([(x >> (2 * s)) & 0x3 for s in range(4)], axis=1)
    missing = planes == 3
    xf = planes.astype(jnp.float32)
    a1 = jnp.where(missing, 0.0, xf).astype(dtype)
    a0 = jnp.where(missing, 0.0, 2.0 - xf).astype(dtype)
    return a1, a0


def _lambda_acat_kernel(a1_ref, a0_ref, up_ref, t1_ref, t0_ref,
                        l0_ref, l1_ref, *, dtype, approx_div=False):
    """lambda-stats from pre-decoded count planes (no in-kernel unpack)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        l0_ref[:] = jnp.zeros_like(l0_ref)
        l1_ref[:] = jnp.zeros_like(l1_ref)

    tb = t1_ref.shape[0]
    tw = up_ref.shape[1]
    k = up_ref.shape[2]
    t_cat = jnp.concatenate(
        [t1_ref[:].astype(dtype), t0_ref[:].astype(dtype)], axis=0)
    u_cat = up_ref[:].reshape(4 * tw, k).astype(dtype)
    a_cat = jnp.concatenate(
        [a1_ref[:].reshape(tb, 4 * tw), a0_ref[:].reshape(tb, 4 * tw)],
        axis=0)                                           # (2TB, 4TW)
    d = jax.lax.dot_general(
        t_cat, u_cat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (2TB, 4TW)
    if approx_div:
        r = (a_cat.astype(jnp.float32)
             * pl.reciprocal(d + _EPS, approx=True)).astype(dtype)
    else:
        r = (a_cat.astype(jnp.float32) / (d + _EPS)).astype(dtype)
    acc = jnp.dot(r, u_cat, preferred_element_type=jnp.float32)
    l0_ref[:] += acc[:tb]
    l1_ref[:] += acc[tb:]


@functools.partial(jax.jit, static_argnames=("tb", "tw", "dtype", "interpret",
                                             "approx_div"))
def lambda_stats_acat(a1, a0, u_planes, t1, t0, *, tb=DEF_TB, tw=DEF_TW,
                      dtype=jnp.bfloat16, interpret=False,
                      approx_div=False):
    """lambda_stats_packed on pre-decoded (B, 4, W) count planes."""
    b = a1.shape[0]
    w = a1.shape[2]
    k = u_planes.shape[-1]
    nb, nw = _tiles(b, w, tb, tw)
    kern = functools.partial(_lambda_acat_kernel, dtype=dtype,
                             approx_div=approx_div)
    l0, l1 = pl.pallas_call(
        kern,
        grid=(nb, nw),
        in_specs=[
            pl.BlockSpec((tb, 4, tw), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 4, tw), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tw, k), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
        ],
        interpret=interpret,
    )(a1, a0, u_planes, t1, t0)
    return l0, l1


def local_solve_acat(rows, u, lamb_b, *, beta_a, beta_b, local_iters,
                     local_tol, tb, tw, dtype=jnp.bfloat16,
                     interpret=False, stat_scale=1.0, approx_div=False,
                     accel=False):
    """local_solve_packed with the counts decoded ONCE up front.

    Same math, same returns; the schedule iterates lambda_stats_acat
    over the pre-decoded planes instead of re-unpacking rows each pass.
    """
    from terastructure_tpu.models.psd import elog_beta
    from terastructure_tpu.ops.stats_dense import solve_schedule

    u_planes = u_to_planes(u)
    a1, a0 = decode_count_planes(rows)

    def iterate(lam):
        e1, e0 = elog_beta(lam)
        t1, t0 = jnp.exp(e1), jnp.exp(e0)
        l0, l1 = lambda_stats_acat(
            a1, a0, u_planes, t1, t0, tb=tb, tw=tw, dtype=dtype,
            interpret=interpret, approx_div=approx_div)
        return jnp.stack([beta_a + stat_scale * t1 * l0,
                         beta_b + stat_scale * t0 * l1], axis=-1)

    return solve_schedule(iterate, lamb_b, local_iters=local_iters,
                          local_tol=local_tol, accel=accel)


def local_solve_packed(rows, u, lamb_b, *, beta_a, beta_b, local_iters,
                       local_tol, tb, tw, dtype=jnp.bfloat16,
                       interpret=False, stat_scale=1.0, approx_div=False,
                       accel=False):
    """Pallas-backed local coordinate ascent; mirrors
    stats_dense.local_solve but consumes packed rows directly.

    u: (N, K) with N % 4 == 0 (padded); returns converged lamb_b (B,K,2).
    stat_scale rescales the individual-summed statistics — the big-N
    inner-loop subsample path passes N/Ns so lambda magnitudes match the
    full-population solve (engine.step_core_packed).
    """
    from terastructure_tpu.models.psd import elog_beta
    from terastructure_tpu.ops.stats_dense import solve_schedule

    u_planes = u_to_planes(u)

    def iterate(lam):
        e1, e0 = elog_beta(lam)
        t1, t0 = jnp.exp(e1), jnp.exp(e0)
        l0, l1 = lambda_stats_packed(
            rows, u_planes, t1, t0, tb=tb, tw=tw, dtype=dtype,
            interpret=interpret, approx_div=approx_div)
        return jnp.stack([beta_a + stat_scale * t1 * l0,
                         beta_b + stat_scale * t0 * l1], axis=-1)

    return solve_schedule(iterate, lamb_b, local_iters=local_iters,
                          local_tol=local_tol, accel=accel)


def batch_stats_packed(rows, u, t1, t0, *, tb, tw, dtype=jnp.bfloat16,
                       interpret=False):
    """All sufficient stats from packed rows (converged t1/t0).

    Returns (gamma_stat (N, K), l0 (B, K), l1 (B, K)) matching
    stats_dense.batch_stats semantics (lambda stats already scaled by t).
    """
    u_planes = u_to_planes(u)
    l0, l1 = lambda_stats_packed(
        rows, u_planes, t1, t0, tb=tb, tw=tw, dtype=dtype,
        interpret=interpret)
    g = gamma_stats_packed(
        rows, u_planes, t1, t0, tb=tb, tw=tw, dtype=dtype,
        interpret=interpret)
    gamma_stat = u * planes_to_flat(g)
    return gamma_stat, t1 * l0, t0 * l1
