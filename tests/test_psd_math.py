"""Unit tests for model math against scipy references (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import scipy.special as sps
import scipy.stats as sst

from terastructure_tpu.models import psd


def test_elog_dirichlet_vs_scipy(rng):
    gamma = rng.uniform(0.1, 5.0, size=(4, 3))
    got = np.asarray(psd.elog_dirichlet(jnp.asarray(gamma, jnp.float32)))
    want = sps.digamma(gamma) - sps.digamma(gamma.sum(-1, keepdims=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_elog_beta_vs_scipy(rng):
    lamb = rng.uniform(0.2, 8.0, size=(5, 3, 2))
    e1, e0 = psd.elog_beta(jnp.asarray(lamb, jnp.float32))
    tot = sps.digamma(lamb.sum(-1))
    np.testing.assert_allclose(np.asarray(e1), sps.digamma(lamb[..., 0]) - tot, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e0), sps.digamma(lamb[..., 1]) - tot, rtol=1e-4, atol=1e-4)


def test_binomial2_loglik_vs_scipy(rng):
    p = rng.uniform(0.05, 0.95, size=50)
    x = rng.integers(0, 3, size=50)
    got = np.asarray(psd.binomial2_loglik(jnp.asarray(x), jnp.asarray(p, jnp.float32)))
    want = sst.binom.logpmf(x, 2, p)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_means_on_simplex(rng):
    gamma = jnp.asarray(rng.uniform(0.1, 5.0, size=(6, 4)), jnp.float32)
    th = np.asarray(psd.theta_mean(gamma))
    np.testing.assert_allclose(th.sum(-1), 1.0, rtol=1e-6)
    lamb = jnp.asarray(rng.uniform(0.2, 8.0, size=(7, 4, 2)), jnp.float32)
    be = np.asarray(psd.beta_mean(lamb))
    assert ((be > 0) & (be < 1)).all()


def test_data_loglik_masks_missing(rng):
    n, l, k = 4, 6, 2
    theta = rng.dirichlet(np.ones(k), size=n)
    beta = rng.uniform(0.2, 0.8, size=(l, k))
    x = rng.integers(0, 3, size=(n, l)).astype(np.int8)
    x[0, 0] = psd.MISSING
    ll = float(psd.data_loglik(
        jnp.asarray(theta, jnp.float32), jnp.asarray(beta, jnp.float32), jnp.asarray(x)))
    p = theta @ beta.T
    want = 0.0
    for i in range(n):
        for j in range(l):
            if x[i, j] != psd.MISSING:
                want += sst.binom.logpmf(x[i, j], 2, p[i, j])
    np.testing.assert_allclose(ll, want, rtol=1e-4)


def test_variational_predictive_matches_monte_carlo():
    """Closed-form E_q[Binom(2, theta^T beta)] vs brute-force sampling."""
    import numpy as np
    from terastructure_tpu.models import psd

    rng = np.random.default_rng(0)
    m, k = 6, 4
    gamma = rng.uniform(0.3, 8.0, size=(m, k)).astype(np.float32)
    lamb = rng.uniform(0.5, 20.0, size=(m, k, 2)).astype(np.float32)
    p0, p1, p2 = psd.variational_predictive_probs(
        jnp.asarray(gamma), jnp.asarray(lamb))
    probs = np.stack([np.asarray(p0), np.asarray(p1), np.asarray(p2)], -1)
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-5)

    draws = 200_000
    mc = np.zeros((m, 3))
    for i in range(m):
        g = rng.gamma(gamma[i], 1.0, size=(draws, k))
        th = g / g.sum(1, keepdims=True)
        be = rng.beta(lamb[i, :, 0], lamb[i, :, 1], size=(draws, k))
        s = (th * be).sum(1)
        mc[i] = [np.mean((1 - s) ** 2), np.mean(2 * s * (1 - s)),
                 np.mean(s**2)]
    np.testing.assert_allclose(probs, mc, atol=5e-3)

    # log-lik gather agrees with the probs
    x = np.array([0, 1, 2, 2, 1, 0], np.int8)
    ll = np.asarray(psd.variational_predictive_loglik(
        jnp.asarray(gamma), jnp.asarray(lamb), jnp.asarray(x)))
    np.testing.assert_allclose(
        ll, np.log(probs[np.arange(m), x]), rtol=1e-5)

    # plugin and variational agree as q concentrates
    big_g = gamma * 1e4
    big_l = lamb * 1e4
    ll_v = np.asarray(psd.predictive_loglik(
        jnp.asarray(big_g), jnp.asarray(big_l),
        jnp.arange(m), jnp.arange(m), jnp.asarray(x), form="variational"))
    ll_p = np.asarray(psd.predictive_loglik(
        jnp.asarray(big_g), jnp.asarray(big_l),
        jnp.arange(m), jnp.arange(m), jnp.asarray(x), form="plugin"))
    np.testing.assert_allclose(ll_v, ll_p, atol=2e-3)
