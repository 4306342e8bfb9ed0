"""Headline benchmark: SNP-updates/s/chip on the TGP-shape config.

Engine config: the flagship fused one-kernel-per-step path
(kernel='auto' -> fused on TPU), lambda_mode='local', float32 compute
(measured >= bf16 on v5e for this kernel), batch 4096 (fixed per-step
overheads amortize; 1.0M SNP-updates/s on one v5e chip vs ~7K for the
same-algorithm numpy/BLAS baseline).

Prints ONE JSON line:
  {"metric": "snp_updates_per_s_per_chip", "value": N, "unit": "SNP-updates/s",
   "vs_baseline": R}

Config: BASELINE.json #3 shape — N=2,504 individuals x L=1,000,000 SNPs,
K=8 (synthetic PSD draw; TGP itself is not available in-environment), SVI
minibatch 4096 SNPs/step. One "SNP-update" = one sampled SNP's full local
phi/lambda solve plus its share of the global gamma update (the unit the
reference loop processes per inner iteration, SURVEY.md §3.1).

vs_baseline: BASELINE.json has "published": {} (no machine-readable
reference numbers), so the baseline is the same algorithm executed by a
numpy/BLAS CPU implementation (same math, same early-exit local solve,
same shapes) measured in this run on this host — a reproducible stand-in
for the reference's multicore CPU C++ binary.

Env knobs: BENCH_L (default 1_000_000), BENCH_STEPS (default 100),
BENCH_DTYPE (float32|bfloat16, default float32).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Pin the BLAS thread pool BEFORE numpy loads: the CPU baseline swung 2x
# across rounds (2,413 vs 1,484 upd/s on the same config) purely from
# host-load-dependent OpenBLAS threading (VERDICT r3 weak #6).
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "8")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- speed-of-light model (VERDICT r2 weak #7) --------------------------
# TPU v5e ("v5 lite") peaks: 197 TFLOP/s bf16 MXU (f32-accumulated
# matmul runs at ~half), 819 GB/s HBM, VPU = 8x128 lanes x 4 ALUs at
# ~1.5 GHz (~6e12 elementwise ops/s). Public numbers (cloud.google.com
# /tpu/docs v5e spec; jax-ml.github.io/scaling-book part 2).
V5E_MXU_F32_FLOPS = 98.5e12
V5E_VPU_OPS = 6.0e12
V5E_HBM_BPS = 819e9


def roofline_step_s(cfg, w):
    """Lower bound on one fused-kernel SVI step (seconds).

    Counts the irreducible work of the flagship kernel at this config
    (ops/fused_step.py; as of round 3 the int8 acat pre-decode fits
    B=4096 x W=640, so the per-pass unpack term below OVERSTATES the
    VPU bound there — harmless, the MXU term dominates either way):
      - MXU: D-dot + stat-dot per coordinate-ascent pass plus the final
        g-dot, all contracting over K; K«128 means the systolic array
        streams 128-wide with K/128 occupancy (lane padding is
        irreducible without batching multiple steps, which the
        sequential Robbins-Monro update forbids).
      - VPU: the 2-bit unpack (shift/mask/compare/cast/select per
        genotype, both allele planes) every pass (nothing is cached at
        this shape) plus the phi-ratio divides.
      - HBM: one read of the packed minibatch rows.
    The bound is max(mxu, vpu, hbm) — they overlap on real hardware.
    """
    b, k, i = cfg.batch_size, cfg.k, cfg.local_iters
    # measured: tol never early-exits; accel runs i-2 looped + 2
    # unrolled passes + the extrapolation (elementwise, free at this
    # bound) + final stats pass = the same i+1 total sweeps
    passes = i + 1
    macs = (2 * passes + 1) * (2 * b) * (4 * w) * k
    mxu_s = 2 * macs / (V5E_MXU_F32_FLOPS * min(k / 128.0, 1.0))
    unpack_ops = 8 * b * (4 * w) * passes
    div_ops = 2 * (2 * b) * (4 * w) * passes
    vpu_s = (unpack_ops + div_ops) / V5E_VPU_OPS
    hbm_s = b * w / V5E_HBM_BPS
    return max(mxu_s, vpu_s, hbm_s)


def numpy_step_factory(cfg, packed, n):
    """Same-algorithm CPU baseline (numpy + scipy digamma + BLAS matmuls)."""
    import scipy.special as sps

    from terastructure_tpu.data.pack import unpack2bit
    from terastructure_tpu.models.psd import MISSING

    rng = np.random.default_rng(0)
    b = cfg.batch_size

    def step(gamma, lamb, t):
        idx = rng.integers(0, lamb.shape[0], size=b)
        xb = unpack2bit(packed[idx], n)                    # (B, N)
        mask = xb != MISSING
        a1 = np.where(mask, xb, 0).astype(np.float32)
        a0 = np.where(mask, 2 - xb, 0).astype(np.float32)
        u = np.exp(sps.digamma(gamma) - sps.digamma(gamma.sum(1, keepdims=True)))
        lam = lamb[idx]
        delta, it = np.inf, 0
        while it < cfg.local_iters and delta > cfg.local_tol:
            tot = sps.digamma(lam.sum(-1))
            t1 = np.exp(sps.digamma(lam[..., 0]) - tot)
            t0 = np.exp(sps.digamma(lam[..., 1]) - tot)
            d1 = t1 @ u.T + 1e-30
            d0 = t0 @ u.T + 1e-30
            l0 = t1 * ((a1 / d1) @ u)
            l1 = t0 * ((a0 / d0) @ u)
            new = np.stack([cfg.beta_a + l0, cfg.beta_b + l1], -1)
            delta = np.abs(new - lam).mean() / (np.abs(lam).mean() + 1.0)
            lam = new
            it += 1
        tot = sps.digamma(lam.sum(-1))
        t1 = np.exp(sps.digamma(lam[..., 0]) - tot)
        t0 = np.exp(sps.digamma(lam[..., 1]) - tot)
        r1 = a1 / (t1 @ u.T + 1e-30)
        r0 = a0 / (t0 @ u.T + 1e-30)
        s = u * (r1.T @ t1 + r0.T @ t0)
        lamb[idx] = lam
        rho = (cfg.tau0 + t) ** (-cfg.kappa)
        gamma = (1 - rho) * gamma + rho * (
            cfg.alpha_value + (lamb.shape[0] / b) * s
        )
        return gamma, lamb

    return step


def main():
    n, k = 2504, 8
    l = int(os.environ.get("BENCH_L", 1_000_000))
    # NOTE: XLA compile time of the step-chunk grows steeply with chunk
    # length at L=1M (~165 s for 50 steps on v5e); 50 keeps the whole
    # bench inside the driver budget while amortizing per-chunk overhead.
    steps = int(os.environ.get("BENCH_STEPS", 50))
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.data.simulate import simulate_psd
    from terastructure_tpu.data.pack import pack2bit

    batch = int(os.environ.get("BENCH_BATCH", 4096))
    # Default = the SVIConfig defaults (accel7 since round 4);
    # BENCH_ACCEL=0 + BENCH_ITERS=16 time the plain reference schedule.
    accel = os.environ.get("BENCH_ACCEL", "1") not in ("", "0")
    iters = int(os.environ.get("BENCH_ITERS",
                               7 if accel else 16))
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=batch, seed=0,
                    compute_dtype=dtype, local_accel=accel,
                    local_iters=iters)

    cache = f"/tmp/terabench_{n}x{l}k{k}_s0.npy"
    if os.path.exists(cache):
        t0 = time.time()
        packed = np.load(cache)
        log(f"loaded cached sim {cache} in {time.time()-t0:.1f}s")
        return _run(cfg, packed, n, steps)

    log(f"simulating {n}x{l} K={k} genotypes ...")
    t0 = time.time()
    # Simulate in SNP chunks to bound host memory (x is n*l bytes).
    rng = np.random.default_rng(0)
    g = rng.gamma(2.0, 1.0, size=(n, k))
    theta = (g / g.sum(1, keepdims=True)).astype(np.float32)
    packed = np.empty((l, (n + 3) // 4), dtype=np.uint8)
    chunk = 65536
    for j0 in range(0, l, chunk):
        j1 = min(j0 + chunk, l)
        beta = rng.beta(1.0, 1.0, size=(j1 - j0, k)).astype(np.float32)
        p = np.clip(theta @ beta.T, 0, 1)                  # (n, chunk)
        # Binomial(2, p) as a sum of two uniform-threshold draws — much
        # faster than np.random.binomial at this scale.
        x = (
            (rng.random(p.shape, dtype=np.float32) < p).astype(np.int8)
            + (rng.random(p.shape, dtype=np.float32) < p).astype(np.int8)
        ).T                                                # (chunk, n)
        packed[j0:j1] = pack2bit(x)
    # Width-pad to 128 bytes (as svi.driver.fit does) so the fused
    # kernel path engages; padding decodes as MISSING.
    wpad = (-packed.shape[1]) % 128
    if wpad:
        packed = np.pad(packed, ((0, 0), (0, wpad)), constant_values=0xFF)
    log(f"simulated in {time.time()-t0:.1f}s")
    try:
        np.save(cache, packed)
        log(f"cached sim at {cache}")
    except OSError as e:
        log(f"sim cache write skipped: {e}")
    return _run(cfg, packed, n, steps)


def _run(cfg, packed, n, steps):
    l, k = cfg.l, cfg.k
    # ---- TPU path -------------------------------------------------------
    import jax
    import jax.numpy as jnp
    from terastructure_tpu.svi import engine

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    state = engine.init_state(cfg)
    packed_dev = jax.device_put(packed)
    run_chunk = engine.make_run_chunk(cfg, steps)

    t0 = time.time()
    # Two warm calls: the first compiles; the second re-specializes for
    # donated input buffers (observed on the axon backend). A host
    # transfer, not just block_until_ready, is the reliable sync here.
    state = run_chunk(state, packed_dev)
    float(state.gamma[0, 0])
    state = run_chunk(state, packed_dev)
    float(state.gamma[0, 0])
    log(f"compile+warmup {time.time()-t0:.1f}s")

    # Steady-state measurement: several chunk dispatches back-to-back
    # with ONE final host sync — exactly how the fit loop runs between
    # rfreq evals. A single synced chunk pays the full ~33 ms tunnel
    # round-trip per dispatch (measured: 1.93 ms/step at 1 chunk vs
    # 1.50 at 8 pipelined, chunk-length ladder in docs/design.md);
    # pipelining overlaps it with device execution.
    nchunks = int(os.environ.get("BENCH_CHUNKS", 8))
    t0 = time.time()
    for _ in range(nchunks):
        state = run_chunk(state, packed_dev)
    float(state.gamma[0, 0])
    dt = time.time() - t0
    tpu_rate = cfg.batch_size * steps * nchunks / dt
    log(f"TPU: {nchunks}x{steps} steps in {dt:.2f}s -> "
        f"{tpu_rate:,.0f} SNP-updates/s")

    # Like-for-like with rounds 1-3 (VERDICT r4 weak #2): one chunk,
    # one host sync — pays the full per-dispatch tunnel round-trip.
    # Reported alongside the pipelined headline so cross-round
    # comparisons never depend on knowing which methodology ran.
    single_dt = np.inf
    for _ in range(3):
        t0 = time.time()
        state = run_chunk(state, packed_dev)
        float(state.gamma[0, 0])
        single_dt = min(single_dt, time.time() - t0)
    single_rate = cfg.batch_size * steps / single_dt
    log(f"TPU single-sync: {steps} steps in {single_dt:.2f}s -> "
        f"{single_rate:,.0f} SNP-updates/s (r1-r3 methodology)")

    # ---- CPU numpy baseline (same algorithm) ---------------------------
    # The baseline always runs the reference's PLAIN 16-pass local solve
    # (the accel lever is ours, not the reference's) with the pinned
    # BLAS thread pool above, so vs_baseline compares against a stable
    # stand-in for the reference C++ loop.
    base_cfg = cfg.replace(local_accel=False, local_iters=16)
    base_steps = int(os.environ.get("BENCH_BASE_STEPS", 5))
    gamma_np = np.asarray(engine.init_state(cfg).gamma, dtype=np.float32)
    lamb_np = np.ones((l, k, 2), dtype=np.float32)
    np_step = numpy_step_factory(base_cfg, packed, n)
    gamma_np, lamb_np = np_step(gamma_np, lamb_np, 0)      # warmup
    t0 = time.time()
    for t in range(1, base_steps + 1):
        gamma_np, lamb_np = np_step(gamma_np, lamb_np, t)
    base_dt = time.time() - t0
    base_rate = cfg.batch_size * base_steps / base_dt
    log(f"CPU baseline: {base_steps} steps in {base_dt:.2f}s -> "
        f"{base_rate:,.0f} SNP-updates/s")

    bound_s = roofline_step_s(cfg, packed.shape[1])
    achieved_s = cfg.batch_size / tpu_rate
    roofline_frac = round(bound_s / achieved_s, 3)
    log(f"roofline: bound {bound_s*1e3:.2f} ms/step vs achieved "
        f"{achieved_s*1e3:.2f} ms/step -> {roofline_frac:.0%} of "
        f"speed-of-light (MXU K/128-padding bound)")
    print(json.dumps({
        "metric": "snp_updates_per_s_per_chip",
        "value": round(tpu_rate, 1),
        "unit": "SNP-updates/s",
        "vs_baseline": round(tpu_rate / base_rate, 2),
        "roofline_frac": roofline_frac,
        # methodology record (VERDICT r4 weak #2 / ADVICE r4 #4):
        # `value` is pipelined over nchunks dispatches with one final
        # sync; `value_single_sync` is the r1-r3 one-chunk-one-sync
        # number — compare rounds on matching fields.
        "value_single_sync": round(single_rate, 1),
        "nchunks": nchunks,
        "accel": cfg.local_accel,
        "local_iters": cfg.local_iters,
    }))


if __name__ == "__main__":
    main()
