"""MCMC validator tests: exact conjugate checks + sampler sanity.

With K=1 the PSD model collapses to independent Beta-Binomial conjugacy:
beta_j | x ~ Beta(a + sum_i x_ij, b + sum_i (2 - x_ij)) exactly, giving a
ground-truth posterior to validate HMC/NUTS/SMC against (SURVEY.md §4:
"SVI-vs-NUTS/SMC moment-matching on small K").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from terastructure_tpu.mcmc import PSDPotential, run_hmc, run_nuts, run_smc
from terastructure_tpu.mcmc.potential import init_params


def _conjugate_problem(seed=0, n=40, l=6):
    rng = np.random.default_rng(seed)
    beta_true = rng.uniform(0.2, 0.8, size=l)
    x = rng.binomial(2, np.broadcast_to(beta_true, (n, l))).astype(np.int8)
    a = 1.0 + x.sum(0)
    b = 1.0 + (2 - x).sum(0)
    post_mean = a / (a + b)
    post_var = a * b / ((a + b) ** 2 * (a + b + 1))
    pot = PSDPotential(x=jnp.asarray(x), alpha=1.0)
    return pot, post_mean, post_var


def _beta_samples(pot, samples):
    return np.asarray(jax.nn.sigmoid(samples["z_beta"]))  # (S, L, 1)


def test_hmc_matches_conjugate_posterior():
    pot, post_mean, post_var = _conjugate_problem()
    params0 = init_params(pot, jax.random.PRNGKey(1), k=1)
    samples, info = run_hmc(
        jax.random.PRNGKey(2), pot, params0,
        n_samples=2000, n_warmup=600, n_leapfrog=24,
    )
    beta = _beta_samples(pot, samples)[:, :, 0]
    assert 0.5 < float(info["accept_rate"]) <= 1.0
    np.testing.assert_allclose(beta.mean(0), post_mean, atol=0.03)
    np.testing.assert_allclose(beta.var(0), post_var, rtol=0.6, atol=5e-4)


def test_nuts_matches_conjugate_posterior():
    pot, post_mean, post_var = _conjugate_problem()
    params0 = init_params(pot, jax.random.PRNGKey(3), k=1)
    samples, info = run_nuts(
        jax.random.PRNGKey(4), pot, params0,
        n_samples=500, n_warmup=300, max_depth=6,
    )
    beta = _beta_samples(pot, samples)[:, :, 0]
    assert float(info["divergence_rate"]) < 0.05
    np.testing.assert_allclose(beta.mean(0), post_mean, atol=0.03)
    np.testing.assert_allclose(beta.var(0), post_var, rtol=0.6, atol=5e-4)


def test_nuts_multichain():
    pot, post_mean, _ = _conjugate_problem()
    params0 = init_params(pot, jax.random.PRNGKey(5), k=1, n_chains=2)
    samples, info = run_nuts(
        jax.random.PRNGKey(6), pot, params0,
        n_samples=200, n_warmup=200, max_depth=6, n_chains=2,
    )
    beta = np.asarray(jax.nn.sigmoid(samples["z_beta"]))  # (2, S, L, 1)
    assert beta.shape[0] == 2
    # chains agree with each other and the truth
    np.testing.assert_allclose(beta[0].mean(0), beta[1].mean(0), atol=0.05)
    np.testing.assert_allclose(beta.mean((0, 1))[:, 0], post_mean, atol=0.04)


def test_smc_matches_conjugate_posterior():
    pot, post_mean, post_var = _conjugate_problem(n=30, l=4)
    n_particles = 256
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    # init from the prior: z_beta ~ logit(Beta(1,1)) = logistic(0,1);
    # z_theta ~ log-gamma(alpha)
    zb = jax.scipy.special.logit(
        jax.random.uniform(keys[0], (n_particles, pot.l, 1),
                           minval=1e-4, maxval=1 - 1e-4))
    zt = jnp.log(jax.random.gamma(keys[1], pot.alpha,
                                  (n_particles, pot.n, 1)))
    particles0 = {"z_theta": zt, "z_beta": zb}
    particles, diag = run_smc(
        jax.random.PRNGKey(8), pot.log_prior, pot.log_lik, particles0,
        n_particles=n_particles, n_mutations=3, n_leapfrog=8,
        mutation_eps=0.2,
    )
    assert diag["temps"][-1] >= 1.0 - 1e-6
    beta = np.asarray(jax.nn.sigmoid(particles["z_beta"]))[:, :, 0]
    np.testing.assert_allclose(beta.mean(0), post_mean, atol=0.05)


@pytest.mark.parametrize("sampler", ["hmc", "nuts"])
def test_gaussian_target(sampler):
    """Direct sanity on a correlated 2-D Gaussian."""
    cov = jnp.asarray([[1.0, 0.6], [0.6, 0.5]])
    prec = jnp.linalg.inv(cov)

    def log_prob(params):
        z = params["z"]
        return -0.5 * z @ prec @ z

    params0 = {"z": jnp.zeros(2)}
    if sampler == "hmc":
        samples, _ = run_hmc(jax.random.PRNGKey(0), log_prob, params0,
                             n_samples=2000, n_warmup=500, n_leapfrog=8)
    else:
        samples, _ = run_nuts(jax.random.PRNGKey(0), log_prob, params0,
                              n_samples=2000, n_warmup=500, max_depth=6)
    z = np.asarray(samples["z"])
    emp_cov = np.cov(z.T)
    np.testing.assert_allclose(z.mean(0), [0, 0], atol=0.12)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.15)
