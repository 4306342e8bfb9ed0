"""PSD/admixture model math — pure functions, the core of everything.

Model (SURVEY.md §1.1, [HIGH], from Gopalan et al., Nat Genet 48:1587):

    theta_i ~ Dirichlet(alpha * 1_K)          i = 1..N   (admixture props)
    beta_kj ~ Beta(a, b)                      k = 1..K, j = 1..L
    for each allele copy c in {1, 2}:
        z_ijc ~ Categorical(theta_i)
        allele_ijc ~ Bernoulli(beta_{z_ijc, j})
    x_ij = allele_ij1 + allele_ij2            in {0, 1, 2}

Marginally x_ij ~ Binomial(2, theta_i^T beta_.j).

Variational family (SURVEY.md §1.2):
    q(theta_i) = Dirichlet(gamma_i),   gamma:  (N, K)
    q(beta_kj) = Beta(lambda_jk0, lambda_jk1),   lamb: (L, K, 2)
      lamb[..., 0] counts allele-1 ("success"), lamb[..., 1] allele-0.

Everything here is shape-polymorphic and jit/vmap/shard_map-safe.
The reference computes digammas with GSL (`gsl_sf_psi`, SURVEY.md §2);
we use jax.scipy.special.digamma on-device.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

# Genotype codes in the 2-bit packed representation (data/pack.py).
# 0, 1, 2 = minor-allele counts; 3 = missing or held-out entry.
MISSING = 3


def elog_dirichlet(gamma: jnp.ndarray) -> jnp.ndarray:
    """E_q[log theta] for Dirichlet(gamma). gamma: (..., K) -> (..., K)."""
    return digamma(gamma) - digamma(jnp.sum(gamma, axis=-1, keepdims=True))


def elog_beta(lamb: jnp.ndarray):
    """E_q[log beta], E_q[log(1-beta)] for Beta(lamb0, lamb1).

    lamb: (..., 2) -> two arrays of shape lamb.shape[:-1].
    """
    total = digamma(lamb[..., 0] + lamb[..., 1])
    return digamma(lamb[..., 0]) - total, digamma(lamb[..., 1]) - total


def theta_mean(gamma: jnp.ndarray) -> jnp.ndarray:
    """Point estimate theta_hat = gamma / sum(gamma) (SURVEY.md §1.2)."""
    return gamma / jnp.sum(gamma, axis=-1, keepdims=True)


def beta_mean(lamb: jnp.ndarray) -> jnp.ndarray:
    """Point estimate beta_hat = lamb0 / (lamb0 + lamb1). (..., 2) -> (...)."""
    return lamb[..., 0] / (lamb[..., 0] + lamb[..., 1])


def binomial2_loglik(x, p):
    """log Binomial(2, p) pmf at x in {0,1,2}. Broadcasting elementwise.

    This is the predictive used for heldout/validation scoring
    (reference `compute_likelihood`, SURVEY.md §3.3): plug-in
    p = E[theta_i]^T E[beta_.j].
    """
    x = x.astype(p.dtype)
    eps = jnp.finfo(p.dtype).tiny
    p = jnp.clip(p, eps, 1.0 - 1e-7)
    log_coeff = jnp.where(x == 1.0, jnp.log(2.0), 0.0)
    return log_coeff + x * jnp.log(p) + (2.0 - x) * jnp.log1p(-p)


def variational_predictive_probs(gamma_e, lamb_e):
    """PROPER variational predictive for Binomial(2, s), s = theta^T beta:
    p(x) = E_q[Binom(2, s)] in closed form (SURVEY.md §3.3 [LOW] — the
    alternative to the plug-in Binom(2, E[s])).

    Needs only the first two moments of s under q = Dir(gamma) x
    prod_k Beta(lamb_k):

      E[s]  = sum_k E[theta_k] E[beta_k]
      E[s^2] = sum_{k!=k'} E[theta_k theta_k'] E[beta_k]E[beta_k']
             + sum_k E[theta_k^2] E[beta_k^2]
      with Dirichlet cross-moments E[theta_k theta_k'] =
      gamma_k gamma_k' / (g0 (g0+1)) (k != k'), E[theta_k^2] =
      gamma_k (gamma_k+1) / (g0 (g0+1)); Beta second moment
      E[beta^2] = l0 (l0+1) / ((l0+l1)(l0+l1+1)).

    gamma_e: (..., K) rows; lamb_e: (..., K, 2). Returns (p0, p1, p2)
    each (...,): P(x=0), P(x=1), P(x=2) = (E[(1-s)^2], 2E[s(1-s)],
    E[s^2]).
    """
    g0 = jnp.sum(gamma_e, axis=-1)
    l0, l1 = lamb_e[..., 0], lamb_e[..., 1]
    eb = l0 / (l0 + l1)
    eb2 = l0 * (l0 + 1.0) / ((l0 + l1) * (l0 + l1 + 1.0))
    es = jnp.sum(gamma_e * eb, axis=-1) / g0
    denom = g0 * (g0 + 1.0)
    cross = (jnp.sum(gamma_e * eb, axis=-1) ** 2
             - jnp.sum(gamma_e**2 * eb**2, axis=-1)) / denom
    diag = jnp.sum(gamma_e * (gamma_e + 1.0) * eb2, axis=-1) / denom
    es2 = cross + diag
    p2 = es2
    p1 = 2.0 * (es - es2)
    p0 = 1.0 - 2.0 * es + es2
    return p0, p1, p2


def variational_predictive_loglik(gamma_e, lamb_e, x):
    """log p(x) under the proper variational predictive (see
    variational_predictive_probs). gamma_e: (M, K), lamb_e: (M, K, 2),
    x: (M,) in {0,1,2} -> (M,) log-probs."""
    p0, p1, p2 = variational_predictive_probs(gamma_e, lamb_e)
    probs = jnp.stack([p0, p1, p2], axis=-1)
    eps = jnp.finfo(probs.dtype).tiny
    probs = jnp.clip(probs, eps, 1.0)
    xi = x.astype(jnp.int32)
    return jnp.log(jnp.take_along_axis(probs, xi[..., None],
                                       axis=-1)[..., 0])


def predictive_loglik(gamma, lamb, ind_idx, snp_idx, x, form="plugin"):
    """Per-entry predictive log-likelihood for entries (ind_idx, snp_idx).

    gamma: (N, K); lamb: (L, K, 2); indices/x: (M,). Returns (M,) log-probs.
    form: "plugin" (Binom(2, E[theta]^T E[beta]) — reference
    compute_likelihood per SURVEY.md §3.3, default) or "variational"
    (the proper E_q[Binom(2, s)], closed form above). The two agree as
    q concentrates; the variational form is better calibrated early.
    """
    if form == "variational":
        return variational_predictive_loglik(
            gamma[ind_idx], lamb[snp_idx], x)
    th = theta_mean(gamma[ind_idx])              # (M, K)
    be = beta_mean(lamb[snp_idx])                # (M, K)
    p = jnp.sum(th * be, axis=-1)                # (M,)
    return binomial2_loglik(x, p)


def log_dirichlet_prior(theta, alpha):
    """log Dir(theta | alpha * 1_K), theta: (..., K) on the simplex."""
    k = theta.shape[-1]
    log_norm = gammaln(k * alpha) - k * gammaln(alpha)
    return log_norm + jnp.sum((alpha - 1.0) * jnp.log(theta), axis=-1)


def log_beta_prior(beta, a, b):
    """log Beta(beta | a, b) elementwise."""
    log_norm = gammaln(a + b) - gammaln(a) - gammaln(b)
    return log_norm + (a - 1.0) * jnp.log(beta) + (b - 1.0) * jnp.log1p(-beta)


def data_loglik(theta, beta, x, mask=None):
    """Full-data log-likelihood sum log Binomial(2, theta^T beta) at x.

    theta: (N, K); beta: (L, K); x: (N, L) int in {0,1,2} with MISSING=3
    allowed when mask is given (or derived). Used by the MCMC validators'
    potential and by tests.
    """
    p = theta @ beta.T                           # (N, L)
    if mask is None:
        mask = x != MISSING
    ll = binomial2_loglik(jnp.where(mask, x, 0), p)
    return jnp.sum(jnp.where(mask, ll, 0.0))
