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


def test_particle_ensemble_alignment_recovers_mode():
    """Regression: a particle ensemble split across the K! label modes
    must NOT average to the symmetric collapse (theta -> 1/K). Found
    live: SMC with better mutation mixed between modes and the raw
    ensemble mean gave theta MAE 0.33 vs truth at K=2; aligned, 0.038."""
    from terastructure_tpu.mcmc.validate import align_ensemble

    rng = np.random.default_rng(0)
    n, l, k, p = 30, 50, 2, 64
    base_t = rng.dirichlet(np.ones(k) * 0.5, size=n)      # (n, k)
    base_b = rng.uniform(0.05, 0.95, size=(l, k))
    theta_s = np.repeat(base_t[None], p, axis=0) + rng.normal(0, 0.01, (p, n, k))
    beta_s = np.repeat(base_b[None], p, axis=0) + rng.normal(0, 0.01, (p, l, k))
    flip = rng.random(p) < 0.5
    flip[0] = False
    theta_s[flip] = theta_s[flip][..., ::-1]
    beta_s[flip] = beta_s[flip][..., ::-1]

    raw_err = np.abs(theta_s.mean(0) - base_t).mean()
    assert raw_err > 0.1                     # symmetric collapse visible

    theta_a, beta_a, nfl = align_ensemble(theta_s.copy(), beta_s.copy())
    assert nfl == int(flip.sum())
    assert np.abs(theta_a.mean(0) - base_t).mean() < 0.02
    assert np.abs(beta_a.mean(0) - base_b).mean() < 0.02
