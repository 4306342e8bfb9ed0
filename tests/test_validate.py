"""North-star validator: SVI moments agree with NUTS on small K.

Scaled-down version of BASELINE.json config #4 (CI-sized; the full
500 x 5K x K=3 run is benchmarks/validator_bench.py).
"""

import numpy as np

from terastructure_tpu.data import simulate_psd
from terastructure_tpu.mcmc.validate import compare_svi_mcmc


def test_svi_vs_nuts_moments_agree():
    _, _, x = simulate_psd(50, 200, 2, seed=21, structured=True)
    rep = compare_svi_mcmc(
        x, k=2, sampler="nuts", seed=21,
        n_samples=400, n_warmup=300, max_depth=6,
    )
    # theta is well-identified at L=200; beta (per-SNP) is noisier.
    assert rep.theta_mae < 0.05, rep.theta_mae
    assert rep.beta_mae < 0.10, rep.beta_mae


def test_svi_vs_smc_moments_agree():
    _, _, x = simulate_psd(40, 120, 2, seed=22, structured=True)
    rep = compare_svi_mcmc(
        x, k=2, sampler="smc", seed=22,
        n_particles=256, n_mutations=2, n_leapfrog=8, mutation_eps=0.1,
    )
    assert rep.theta_mae < 0.08, rep.theta_mae
    assert rep.beta_mae < 0.12, rep.beta_mae


def test_multichain_validator_reports_convergence():
    _, _, x = simulate_psd(30, 80, 2, seed=23, structured=True)
    from terastructure_tpu.mcmc.validate import mcmc_moments

    theta_m, beta_m, diag = mcmc_moments(
        x, 2, alpha=0.5, sampler="nuts", seed=23,
        n_samples=150, n_warmup=150, n_chains=2, max_depth=6)
    assert "convergence" in diag
    conv = diag["convergence"]
    assert all(v["min_ess"] > 5 for v in conv.values())
    assert theta_m.shape == (30, 2)
