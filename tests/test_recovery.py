"""Simulation-recovery integration test (SURVEY.md §4 item 1).

Generate from the PSD model, fit with SVI, check theta-hat recovers the
truth up to label switching — the reference's primary correctness
methodology (scripts/ + paper figures).
"""

import numpy as np

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.data import GenotypeData, simulate_psd
from terastructure_tpu.models import psd
from terastructure_tpu.svi import fit
from terastructure_tpu.utils import align_columns, mean_abs_theta_error


def test_theta_beta_recovery():
    n, l, k = 150, 1500, 3
    theta_true, beta_true, x = simulate_psd(n, l, k, seed=42, structured=True)
    data = GenotypeData.from_dense(
        x, validation_frac=0.005, heldout_frac=0.005, seed=42)
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=128, rfreq=100,
                    max_steps=3000, seed=42)
    res = fit(cfg, data)

    theta_hat = np.asarray(psd.theta_mean(res.state.gamma))
    err = mean_abs_theta_error(theta_hat, theta_true)
    assert err < 0.05, f"theta recovery error {err}"

    # beta recovery with the theta-matched permutation
    _, perm = align_columns(theta_hat, theta_true)
    beta_hat = np.asarray(psd.beta_mean(res.state.lamb))[:l][:, perm]
    beta_err = float(np.abs(beta_hat - beta_true).mean())
    assert beta_err < 0.08, f"beta recovery error {beta_err}"

    # heldout predictive ll within MC error of the oracle (truth) ll
    h = data.heldout
    p = np.clip((theta_true[h.ind_idx] * beta_true[h.snp_idx]).sum(-1), 1e-6, 1 - 1e-6)
    xx = h.x.astype(np.float64)
    oracle = float(np.mean(
        np.where(xx == 1, np.log(2.0), 0.0)
        + xx * np.log(p) + (2 - xx) * np.log1p(-p)))
    mc_err = 3.0 / np.sqrt(len(h))     # ~3 sigma of per-entry ll spread
    assert res.heldout_ll > oracle - max(0.05, mc_err), (res.heldout_ll, oracle)


def test_multi_seed_stability():
    """Reference workflow: replicates agree after label alignment."""
    n, l, k = 80, 600, 2
    theta_true, _, x = simulate_psd(n, l, k, seed=17, structured=True)
    data = GenotypeData.from_dense(x, validation_frac=0.01, heldout_frac=0, seed=17)
    thetas = []
    for seed in (1, 2):
        cfg = SVIConfig(n=n, l=l, k=k, batch_size=64, rfreq=100,
                        max_steps=1500, seed=seed)
        res = fit(cfg, data)
        thetas.append(np.asarray(psd.theta_mean(res.state.gamma)))
    aligned, _ = align_columns(thetas[1], thetas[0])
    assert np.abs(aligned - thetas[0]).mean() < 0.05


def test_spectral_init_starts_near_truth_and_fits():
    """svi/init.py: the randomized-PCA + soft-kmeans gamma must start
    far closer to the generating theta than a uniform init, and a fit
    from it must reach the same quality as the random-init fit."""
    import jax

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.data.dataset import GenotypeData
    from terastructure_tpu.data.pack import pack2bit
    from terastructure_tpu.data.simulate import simulate_psd
    from terastructure_tpu.models import psd
    from terastructure_tpu.svi import fit
    from terastructure_tpu.svi.init import spectral_gamma
    from terastructure_tpu.utils import mean_abs_theta_error

    theta, beta, x = simulate_psd(200, 2000, 3, seed=4, structured=True)
    packed = pack2bit(x.T)
    g = np.asarray(spectral_gamma(packed, 200, 3, alpha=1 / 3, seed=0))
    th0 = g / g.sum(1, keepdims=True)
    err0 = mean_abs_theta_error(th0, theta)
    assert err0 < 0.15, err0          # uniform init sits at ~0.39

    data = GenotypeData.from_dense(x, validation_frac=0.01,
                                   heldout_frac=0.01, seed=0)
    cfg = SVIConfig(n=200, l=2000, k=3, batch_size=128, rfreq=50,
                    max_steps=4000, seed=0, init="spectral")
    res = fit(cfg, data)
    th = np.asarray(psd.theta_mean(res.state.gamma))
    assert res.converged
    assert mean_abs_theta_error(th, theta) < 0.05
