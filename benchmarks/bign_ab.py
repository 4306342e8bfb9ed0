"""Quality + speed A/B for big-N step variants, one consolidated run.

    python benchmarks/bign_ab.py [--n 32768] [--l 10000] [--k 10]
                                 [--b 512] [--steps 4000]

Fits the SAME simulated dataset (same carve, same seed) under each
variant of the big-N per-iteration path and reports validation/heldout
log-lik, theta MAE vs truth, and sustained SNP-updates/s. Variants:

  pair        — two-kernel stats pass (round-2 baseline behavior)
  v2          — fused_v2 stats kernel (shared unpack + D-dot, no RMW)
  v2_approx   — v2 + approx-reciprocal divides in the EXACT stats pass
  stored6     — lambda_mode=stored warm start, local_iters=6
  stored4     — lambda_mode=stored warm start, local_iters=4

axon rules: single process, all compiles batched here, run once in the
background with a generous timeout. Prints one JSON document at the end.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--l", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (smoke runs; interpret mode)")
    ap.add_argument("--variants", default="",
                    help="comma-separated subset of variants to run")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.data import GenotypeData
    from terastructure_tpu.data.pack import pack2bit
    from terastructure_tpu.models import psd
    from terastructure_tpu.svi import fit
    from terastructure_tpu.utils import mean_abs_theta_error
    from terastructure_tpu.utils.profiling import StepMeter

    n, l, k = args.n, args.l, args.k
    rng = np.random.default_rng(args.seed)
    dominant = rng.integers(0, k, size=n)
    conc = np.full((n, k), 0.2)
    conc[np.arange(n), dominant] = 5.0
    g = rng.gamma(conc, 1.0)
    theta = (g / g.sum(1, keepdims=True)).astype(np.float32)
    packed = np.empty((l, (n + 3) // 4), np.uint8)
    for j0 in range(0, l, 2048):
        j1 = min(j0 + 2048, l)
        beta = np.clip(rng.beta(1, 1, size=(j1 - j0, k)), 1e-4,
                       1 - 1e-4).astype(np.float32)
        p = np.clip(theta @ beta.T, 0, 1)
        x = ((rng.random(p.shape, np.float32) < p).astype(np.int8)
             + (rng.random(p.shape, np.float32) < p).astype(np.int8)).T
        packed[j0:j1] = pack2bit(x)

    data = GenotypeData.from_packed(
        packed, n, seed=args.seed, validation_frac=0.005,
        heldout_frac=0.005, max_eval_entries=100_000, eval_snp_pool=1024)

    base = SVIConfig(n=n, l=l, k=k, batch_size=args.b, rfreq=200,
                     max_steps=args.steps, seed=args.seed, kernel="pallas",
                     lambda_mode="local", local_sub_n=8192)
    variants = {
        "pair": base.replace(stats_kernel="pair"),
        "v2": base.replace(stats_kernel="fused_v2"),
        "v2_approx": base.replace(stats_kernel="fused_v2",
                                  stats_approx_div=True),
        # round-2 behavior: re-unpack the 2-bit subsample every ascent
        # pass (decode-once off) — the A/B for cfg.sub_decode_once
        "v2_nodecode": base.replace(stats_kernel="fused_v2",
                                    sub_decode_once=False),
        # Aitken-accelerated local solve (cfg.local_accel): one final
        # delta^2 extrapolation replaces ~10 plain passes
        "accel6": base.replace(stats_kernel="fused_v2",
                               local_accel=True, local_iters=6),
        "accel8": base.replace(stats_kernel="fused_v2",
                               local_accel=True, local_iters=8),
        "stored6": base.replace(stats_kernel="fused_v2",
                                lambda_mode="stored", local_iters=6),
        "stored4": base.replace(stats_kernel="fused_v2",
                                lambda_mode="stored", local_iters=4),
        # warm start + full iteration budget: the tol early-exit decides
        # per-minibatch how many iterations a warm solve actually needs
        "stored16tol": base.replace(stats_kernel="fused_v2",
                                    stats_approx_div=True,
                                    lambda_mode="stored", local_iters=16,
                                    local_tol=1e-4),
        "local16tol3": base.replace(stats_kernel="fused_v2",
                                    stats_approx_div=True,
                                    local_tol=1e-3),
        # fewer subsampled iterations, leaning on the exact final pass
        "iters10": base.replace(stats_kernel="fused_v2",
                                stats_approx_div=True, local_iters=10),
        "iters8": base.replace(stats_kernel="fused_v2",
                               stats_approx_div=True, local_iters=8),
        "iters6": base.replace(stats_kernel="fused_v2",
                               stats_approx_div=True, local_iters=6),
        # smaller subsample for the iterations
        "sub4096": base.replace(stats_kernel="fused_v2",
                                stats_approx_div=True, local_sub_n=4096),
    }
    if args.variants:
        want = args.variants.split(",")
        variants = {k_: v for k_, v in variants.items() if k_ in want}

    out = {"config": {"n": n, "l": l, "k": k, "batch_size": args.b,
                      "max_steps": args.steps, "seed": args.seed},
           "runs": {}}
    for name, cfg in variants.items():
        meter = StepMeter(cfg.batch_size)
        t0 = time.time()
        res = fit(cfg, data, callback=meter)
        th = np.asarray(psd.theta_mean(res.state.gamma))[:n]
        out["runs"][name] = dict(
            steps=res.steps, converged=res.converged,
            validation_ll=round(res.validation_ll, 6),
            heldout_ll=round(res.heldout_ll, 6) if res.heldout_ll else None,
            theta_mae=round(mean_abs_theta_error(th, theta), 5),
            snp_updates_per_s=round(meter.snp_updates_per_s, 1),
            wall_s=round(time.time() - t0, 1))
        print(name, out["runs"][name], file=sys.stderr, flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
