"""BASELINE.json config #4: NUTS/HMC + SMC on a 500 x 5K subsample vs SVI.

    python benchmarks/validator_bench.py [--sampler nuts|hmc|smc] [--full]

Default runs a quicker 500 x 1K slice; --full runs the whole 500 x 5K
config. Prints a JSON report of label-aligned moment discrepancies.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", default="nuts", choices=["nuts", "hmc", "chees", "smc"])
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chains", type=int, default=0,
                    help="NUTS/HMC chains (default: 4 for --full, 1 quick); "
                         "chains are label-aligned before R-hat/ESS and "
                         "device-sharded when chips allow")
    ap.add_argument("--n-samples", type=int, default=500)
    ap.add_argument("--n-warmup", type=int, default=400)
    ap.add_argument("--cold-start", action="store_true",
                    help="disable the SVI warm-start/preconditioner "
                         "(honesty A/B of the validator)")
    ap.add_argument("--traj-mult", type=float, default=1.0,
                    help="ChEES: sampling-phase trajectory multiplier "
                         "(slow-coordinate R-hat lever)")
    ap.add_argument("--mass-floor", type=float, default=0.25,
                    help="ChEES: floor warmup mass at this fraction of "
                         "the q-variance preconditioner")
    ap.add_argument("--smc-particles", type=int, default=512)
    ap.add_argument("--smc-mutations", type=int, default=2)
    ap.add_argument("--smc-leapfrog", type=int, default=8)
    args = ap.parse_args()

    from terastructure_tpu.data.simulate import simulate_psd
    from terastructure_tpu.mcmc.validate import compare_svi_mcmc

    n, l = (500, 5000) if args.full else (500, 1000)
    _, _, x = simulate_psd(n, l, args.k, seed=args.seed, structured=True)
    t0 = time.time()
    kw = {}
    if args.sampler in ("nuts", "hmc", "chees"):
        chains = args.chains or (16 if args.sampler == "chees"
                                 else 4 if args.full else 1)
        kw = dict(n_samples=args.n_samples, n_warmup=args.n_warmup,
                  n_chains=chains)
        if args.sampler == "chees":
            kw.update(sample_traj_mult=args.traj_mult,
                      mass_floor_frac=args.mass_floor)
    else:
        kw = dict(n_particles=args.smc_particles,
                  n_mutations=args.smc_mutations,
                  n_leapfrog=args.smc_leapfrog, mutation_eps=0.05)
    rep = compare_svi_mcmc(x, k=args.k, sampler=args.sampler,
                           seed=args.seed, warm_start=not args.cold_start,
                           **kw)
    out = dict(
        config=f"{n}x{l} K={args.k}", sampler=args.sampler,
        warm_start=not args.cold_start,
        theta_mae=round(rep.theta_mae, 5), beta_mae=round(rep.beta_mae, 5),
        svi_steps=rep.svi_steps, wall_s=round(time.time() - t0, 1),
    )
    conv = rep.sampler_diag.get("convergence")
    if conv:
        out["convergence"] = {k_: {m: round(v, 3) for m, v in d.items()}
                              for k_, d in conv.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
