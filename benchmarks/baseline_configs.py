"""Runner for the five BASELINE.json acceptance configs.

    python benchmarks/baseline_configs.py --config 1          # 1Kx10K K=3
    python benchmarks/baseline_configs.py --config 2          # HGDP shape
    python benchmarks/baseline_configs.py --config 3          # TGP shape
    python benchmarks/baseline_configs.py --config 4          # validator
    python benchmarks/baseline_configs.py --config 5 --scale 0.02

Real HGDP/TGP genotypes are not available in-environment (no network);
configs 2/3/5 run synthetic PSD draws at the published shapes
(BASELINE.json:6-10). --scale shrinks N and L proportionally for
smoke runs; config 5 additionally reports the sharded path on however
many devices exist. Prints one JSON line per run.

Big-N simulation costs tens of host-CPU minutes (100K x 100K ~ 40 min)
while the fit is seconds, so the simulated packed matrix + truth theta
are cached under /tmp keyed by shape/seed/missing-frac (--no-sim-cache
to disable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    1: dict(n=1000, l=10_000, k=3, batch=256, name="sim-1Kx10K-K3"),
    2: dict(n=940, l=640_000, k=7, batch=1024, name="hgdp-940x640K-K7"),
    3: dict(n=2504, l=1_000_000, k=8, batch=1024, name="tgp-2504x1M-K8"),
    4: dict(n=500, l=5000, k=3, batch=256, name="validator-500x5K-K3"),
    5: dict(n=1_000_000, l=1_000_000, k=10, batch=4096,
            name="synthetic-1Mx1M-K10"),
}


def _simulate(args, n, l, k):
    """Chunked PSD draw (binomial via two uniform thresholds — fast).

    Returns (packed (l, ceil(n/4)) uint8, theta (n, k) f32, sim_s).
    """
    import numpy as np

    from terastructure_tpu.data.pack import pack2bit

    t0 = time.time()
    rng = np.random.default_rng(args.seed)
    dominant = rng.integers(0, k, size=n)
    conc = np.full((n, k), 0.2)
    conc[np.arange(n), dominant] = 5.0
    theta = np.empty((n, k), np.float32)
    for i in range(0, n, 1 << 16):
        sl = slice(i, min(i + (1 << 16), n))
        g = rng.gamma(conc[sl], 1.0)
        theta[sl] = (g / g.sum(1, keepdims=True)).astype(np.float32)
    packed = np.empty((l, (n + 3) // 4), np.uint8)
    # SNP-chunk size bounded so the (n, chunk) f32 temporaries stay ~2 GB.
    jchunk = max(1024, min(1 << 16, (1 << 29) // max(n, 1)))
    for j0 in range(0, l, jchunk):
        j1 = min(j0 + jchunk, l)
        beta = np.clip(rng.beta(1, 1, size=(j1 - j0, k)), 1e-4,
                       1 - 1e-4).astype(np.float32)
        p = np.clip(theta @ beta.T, 0, 1)
        x = ((rng.random(p.shape, np.float32) < p).astype(np.int8)
             + (rng.random(p.shape, np.float32) < p).astype(np.int8)).T
        if args.missing_frac > 0:
            x[rng.random(x.shape, np.float32) < args.missing_frac] = 3
        packed[j0:j1] = pack2bit(x)
    return packed, theta, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, required=True, choices=CONFIGS)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink N and L by this factor (smoke runs)")
    ap.add_argument("--max-steps", type=int, default=0,
                    help="override step cap (default: until convergence)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init-mode", default="random",
                    choices=["random", "spectral"])
    ap.add_argument("--missing-frac", type=float, default=0.0,
                    help="simulate this fraction of missing genotypes "
                         "(real data is 1-5%% missing)")
    ap.add_argument("--no-sim-cache", dest="sim_cache",
                    action="store_false", default=True,
                    help="disable the /tmp simulation cache")
    ap.add_argument("--fast", action="store_true",
                    help="big-N fast preset: approx-reciprocal stats "
                         "divides (quality A/B in benchmarks/results/"
                         "bigN_quality_ab.json)")
    ap.add_argument("--accel", action="store_true",
                    help="force local_accel on (it is the config default "
                         "since round 4; study in benchmarks/results/"
                         "local_accel_ab.json)")
    ap.add_argument("--no-accel", action="store_true",
                    help="plain reference schedule: local_accel off + "
                         "local_iters=16")
    ap.add_argument("--local-iters", type=int, default=0,
                    help="override local coordinate-ascent iterations")
    args = ap.parse_args()

    spec = CONFIGS[args.config]
    n = max(int(spec["n"] * args.scale), 16)
    l = max(int(spec["l"] * args.scale), 64)
    k = spec["k"]

    import numpy as np

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.data import GenotypeData
    from terastructure_tpu.models import psd
    from terastructure_tpu.utils import mean_abs_theta_error
    from terastructure_tpu.utils.profiling import StepMeter

    cache = (f"/tmp/terasim_{spec['name']}_s{args.seed}"
             f"_{n}x{l}k{k}_m{args.missing_frac}.npz"
             if args.sim_cache else None)
    if cache and os.path.exists(cache):
        t0 = time.time()
        z = np.load(cache)
        packed, theta = z["packed"].copy(), z["theta"]
        sim_s = time.time() - t0
        print(f"loaded cached sim from {cache} ({sim_s:.1f}s)",
              file=sys.stderr)
    else:
        packed, theta, sim_s = _simulate(args, n, l, k)
        if cache:
            np.savez(cache, packed=packed, theta=theta)

    # Packed-native eval carve (data/dataset.py): entry count is capped
    # only by MC-error needs; the UNIQUE eval SNPs are pooled so
    # local-mode scoring (O(N * uniq SNPs) lambda re-solve per check)
    # stays within the step budget without capping entries. Round 5:
    # pool at big L too, not only big N — config #3's unpooled carve
    # spread 200K entries over ~196K unique SNPs, making each rfreq
    # check re-solve ~2x the chunk's own SNP count (the dominant term
    # of the 565.9K-sustained vs 2.1M-steady gap, VERDICT r4 #3). 2048
    # pooled SNPs keep ~100 entries/SNP — the convergence signal's MC
    # error is set by the ENTRY count, which is unchanged.
    t0 = time.time()
    n_eval = min(max(int(0.005 * n * l), 100), 200_000)
    pool = 2048 if (n >= 50_000 or l >= 131_072) else 0
    data = GenotypeData.from_packed(
        packed, n, seed=args.seed,
        validation_frac=0.005, heldout_frac=0.005,
        max_eval_entries=n_eval, eval_snp_pool=pool,
    )
    eval_s = time.time() - t0

    if args.config == 4:
        from terastructure_tpu.data.pack import unpack2bit
        from terastructure_tpu.mcmc.validate import compare_svi_mcmc

        x_dense = unpack2bit(packed, n).T
        rep = compare_svi_mcmc(x_dense, k=k, sampler="nuts",
                               seed=args.seed, n_samples=500, n_warmup=400)
        print(json.dumps(dict(
            config=spec["name"], scale=args.scale,
            theta_mae=round(rep.theta_mae, 5),
            beta_mae=round(rep.beta_mae, 5),
            wall_s=round(time.time() - t0, 1))))
        return

    import jax

    cfg = SVIConfig(
        n=n, l=l, k=k, batch_size=min(spec["batch"], l),
        rfreq=100, max_steps=args.max_steps or 20_000, seed=args.seed,
        snp_group=8, init=args.init_mode,
    )
    if args.fast:
        cfg = cfg.replace(stats_approx_div=True)
    if args.accel:
        cfg = cfg.replace(local_accel=True)
    if args.no_accel:
        cfg = cfg.replace(local_accel=False, local_iters=16)
    if args.local_iters:
        cfg = cfg.replace(local_iters=args.local_iters)
    meter = StepMeter(cfg.batch_size)
    recs = []

    def cb(rec):
        meter(rec)
        recs.append(rec)

    t0 = time.time()
    if len(jax.devices()) > 1:
        from terastructure_tpu.parallel import fit_sharded

        res = fit_sharded(cfg, data, callback=cb)
    else:
        from terastructure_tpu.svi import fit

        res = fit(cfg, data, callback=cb)
    theta_hat = np.asarray(psd.theta_mean(res.state.gamma))[:n]

    # Time-to-quality (VERDICT r4 weak #1): wall seconds until the
    # validation ll first lands within 1e-4 nats of the run's best —
    # the metric that stays comparable across schedule-changing levers
    # (accel vs plain at different pass counts), unlike fixed-step
    # upd/s. Plus the fit-loop phase budget from the driver's per-check
    # chunk_s/eval_s instrumentation.
    lls = [(r["wall_s"], r["validation_ll"]) for r in recs
           if "validation_ll" in r]
    best = max((v for _, v in lls), default=float("nan"))
    wall_to_q = next((w for w, v in lls if v >= best - 1e-4), None)
    phase = dict(
        chunk_s=round(sum(r.get("chunk_s", 0.0) for r in recs), 1),
        eval_s=round(sum(r.get("eval_s", 0.0) for r in recs), 1),
        checks=len(lls),
    )
    print(json.dumps(dict(
        config=spec["name"], scale=args.scale, n=n, l=l, k=k,
        missing_frac=args.missing_frac, init=args.init_mode,
        converged=res.converged, steps=res.steps,
        validation_ll=round(res.validation_ll, 6),
        heldout_ll=round(res.heldout_ll, 6) if res.heldout_ll else None,
        theta_mae_vs_truth=round(mean_abs_theta_error(theta_hat, theta), 5),
        snp_updates_per_s=round(meter.snp_updates_per_s, 1),
        wall_s_to_ll_within_1e4_of_best=(
            round(wall_to_q, 1) if wall_to_q is not None else None),
        fit_phase_budget=phase,
        sim_s=round(sim_s, 1), eval_carve_s=round(eval_s, 1),
        fit_wall_s=round(time.time() - t0, 1),
    )))


if __name__ == "__main__":
    main()
