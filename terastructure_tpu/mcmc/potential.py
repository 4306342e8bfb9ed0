"""Unconstrained log-posterior for the PSD model — the MCMC target.

The reference has no MCMC; the north star (BASELINE.json:4) adds NUTS/HMC
and SMC as small-K validators of the SVI posterior. We parameterize:

  theta_i = g_i / sum(g_i),  g_ik = exp(z_theta_ik),
    with g_ik ~ Gamma(alpha, 1)  =>  theta_i ~ Dirichlet(alpha 1_K)
    log-density of z (log-gamma + Jacobian): alpha*z - exp(z) - lgamma(alpha)

  beta_jk = sigmoid(z_beta_jk),
    with beta ~ Beta(a, b); density x Jacobian gives
    a*log sigmoid(z) + b*log sigmoid(-z) - logBeta(a, b)

  x_ij ~ Binomial(2, theta_i^T beta_.j) on observed entries.

Everything is a pure function of the flat parameter pytree
{"z_theta": (N, K), "z_beta": (L, K)} — grad/vmap/jit-safe, chains vmap
over a leading axis.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from terastructure_tpu.models.psd import MISSING, binomial2_loglik


def _log_sigmoid(z):
    return -jnp.logaddexp(0.0, -z)


@dataclasses.dataclass(frozen=True)
class PSDPotential:
    """Callable log-posterior (up to a constant) and transforms."""

    x: jnp.ndarray          # (N, L) int8 genotypes, MISSING allowed
    alpha: float
    beta_a: float = 1.0
    beta_b: float = 1.0

    @property
    def n(self):
        return self.x.shape[0]

    @property
    def l(self):
        return self.x.shape[1]

    @property
    def mask(self):
        return self.x != MISSING

    def constrain(self, params):
        """Map unconstrained params -> (theta (N,K), beta (L,K))."""
        g = jnp.exp(params["z_theta"])
        theta = g / jnp.sum(g, axis=-1, keepdims=True)
        beta = jax.nn.sigmoid(params["z_beta"])
        return theta, beta

    def log_prior(self, params):
        zt = params["z_theta"]
        zb = params["z_beta"]
        lp_t = jnp.sum(self.alpha * zt - jnp.exp(zt) - gammaln(self.alpha))
        lp_b = jnp.sum(
            self.beta_a * _log_sigmoid(zb) + self.beta_b * _log_sigmoid(-zb)
        )
        return lp_t + lp_b

    def log_lik(self, params):
        theta, beta = self.constrain(params)
        p = theta @ beta.T                       # (N, L)
        mask = self.mask
        ll = binomial2_loglik(jnp.where(mask, self.x, 0), p)
        return jnp.sum(jnp.where(mask, ll, 0.0))

    def __call__(self, params):
        return self.log_prior(params) + self.log_lik(params)

    def tempered(self, temp):
        """log_prior + temp * log_lik — for SMC likelihood tempering."""

        def f(params):
            return self.log_prior(params) + temp * self.log_lik(params)

        return f

def init_params(pot: PSDPotential, key, k: int, n_chains: int = 0):
    """Unconstrained init: z_theta ~ N(0, 0.1), z_beta ~ N(0, 0.5)."""
    k1, k2 = jax.random.split(key)
    lead = (n_chains,) if n_chains else ()
    return {
        "z_theta": 0.1 * jax.random.normal(k1, lead + (pot.n, k)),
        "z_beta": 0.5 * jax.random.normal(k2, lead + (pot.l, k)),
    }
