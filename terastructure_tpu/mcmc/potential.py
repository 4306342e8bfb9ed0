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


def _acc_dtype():
    """Energy-sum accumulator dtype.

    The MH accept test compares Hamiltonians of magnitude ~N*L*0.6; at
    the validator shapes (500x5000 -> |logp| ~ 2e6) a float32 tree-sum
    carries rounding noise of tens of ulps (~0.1-1 nat), which swamps
    the O(eps^2) integration error the dual-averaging adapts against —
    measured on TPU: eps collapses to ~3e-5 and chains freeze at their
    inits while "accepting" at the 0.8 target. Accumulating the final
    reductions in float64 (dynamics, gradients and matmuls stay f32)
    restores a real acceptance signal. Callers that want this must
    enable jax x64 (mcmc.validate does); without it sums stay f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass(frozen=True)
class PSDPotential:
    """Callable log-posterior (up to a constant) and transforms.

    scale_sigma: the z_theta parameterization carries one UNIDENTIFIED
    direction per individual — the row scale w_i = log sum_k exp(z_ik),
    whose posterior equals its prior (the likelihood sees only theta).
    Under the iid-Gamma prior that direction has variance psi1(K*alpha)
    (~1.6 nats^2 at K*alpha=1) while the data-informed simplex
    directions shrink to ~K/2L (~1e-3 at L=1000) — a >1000x condition
    number that a DIAGONAL mass matrix cannot fix, because the soft
    scale direction mixes into every coordinate of the row. Measured on
    TPU (500x1000 K=3 NUTS): eps adapts to ~1e-4 and chains barely move
    (min ESS ~= n_chains, R-hat in the thousands).

    Setting scale_sigma replaces the scale's implied Gamma(K*alpha, 1)
    prior with log s_i ~ N(0, scale_sigma^2) — pinning the nuisance
    WITHOUT changing the theta/beta posterior. The algebra collapses:
    the Gamma density's -sum_k exp(z_ik) cancels against the removed
    scale density's +e^w (both equal s_i), leaving per row

        alpha * sum_k z_ik - K*alpha * w_i - w_i^2 / (2 sigma^2).

    None keeps the legacy iid-Gamma prior (exact Dirichlet-times-Gamma
    factorization — what SMC's prior-draw initialization matches by
    default)."""

    x: jnp.ndarray          # (N, L) int8 genotypes, MISSING allowed
    alpha: float
    beta_a: float = 1.0
    beta_b: float = 1.0
    scale_sigma: float = None

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
        acc = _acc_dtype()
        if self.scale_sigma is not None:
            k = zt.shape[-1]
            w = jax.scipy.special.logsumexp(zt, axis=-1)
            lp_t = (self.alpha * jnp.sum(zt, dtype=acc)
                    - k * self.alpha * jnp.sum(w, dtype=acc)
                    - jnp.sum(w * w, dtype=acc)
                    / (2.0 * self.scale_sigma**2))
        else:
            lp_t = jnp.sum(
                self.alpha * zt - jnp.exp(zt) - gammaln(self.alpha),
                dtype=acc)
        lp_b = jnp.sum(
            self.beta_a * _log_sigmoid(zb) + self.beta_b * _log_sigmoid(-zb),
            dtype=acc,
        )
        return lp_t + lp_b

    def log_lik(self, params):
        theta, beta = self.constrain(params)
        # precision=HIGHEST: the TPU MXU's default-precision matmul
        # runs bf16 passes, and that noise enters every gradient and
        # Hamiltonian — measured on v5e at 500x1000 K=3: dual averaging
        # collapses eps to ~6e-5 and all 1500 theta coordinates freeze
        # (R-hat > 1.2 on every one), while the identical program on
        # CPU (true f32 matmul) mixes at eps ~0.04 with max R-hat 1.009.
        # The validator's matmuls are small; 3-pass f32 cost is noise.
        p = jnp.matmul(theta, beta.T,
                       precision=jax.lax.Precision.HIGHEST)  # (N, L)
        mask = self.mask
        ll = binomial2_loglik(jnp.where(mask, self.x, 0), p)
        return jnp.sum(jnp.where(mask, ll, 0.0), dtype=_acc_dtype())

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
    # Explicit f32: under x64 (validate enables it for the energy sums)
    # the DYNAMICS stay single precision — only reductions widen.
    zt = 0.1 * jax.random.normal(k1, lead + (pot.n, k), jnp.float32)
    if pot.scale_sigma is not None:
        # Start each row on the pinned shell (w = 0) instead of at
        # w ~ log K, which would sit ~log(K)/sigma^2 up the pin's wall.
        zt = zt - jax.scipy.special.logsumexp(zt, axis=-1, keepdims=True)
    return {
        "z_theta": zt,
        "z_beta": 0.5 * jax.random.normal(k2, lead + (pot.l, k),
                                          jnp.float32),
    }


def q_z_moments(gamma, lamb, *, scale_sigma=None, k_alpha=None):
    """Mean and variance of the unconstrained z under the FITTED
    variational posterior q(theta) = Dir(gamma), q(beta) = Beta(lamb).

    Closed forms (all exact):
      z_theta_k = w + log theta_k with w independent of theta:
        E[log theta_k]  = psi(gamma_k) - psi(gamma_0)
        Var[log theta_k] = psi1(gamma_k) - psi1(gamma_0)
        w ~ N(0, scale_sigma^2) under the pinned prior, or
        w = log Gamma(K alpha, 1) (mean psi(Ka), var psi1(Ka)) legacy —
        the scale's posterior IS its prior, so q need not model it.
      z_beta = logit(beta) = log G(a) - log G(b) for independent gammas:
        E = psi(a) - psi(b),  Var = psi1(a) + psi1(b).

    gamma: (N, K); lamb: (L, K, 2). Returns ({mean tree}, {var tree})
    as float32 jnp arrays shaped like the sampler's params.
    """
    import numpy as np
    from scipy.special import digamma as psi, polygamma

    psi1 = lambda a: polygamma(1, a)
    g = np.asarray(gamma, np.float64)
    g0 = g.sum(-1, keepdims=True)
    mu_t = psi(g) - psi(g0)
    v_t = psi1(g) - psi1(g0)
    if scale_sigma is not None:
        v_t = v_t + scale_sigma**2
    else:
        if k_alpha is None:
            raise ValueError("legacy scale needs k_alpha = K * alpha")
        mu_t = mu_t + psi(k_alpha)
        v_t = v_t + psi1(k_alpha)
    a = np.asarray(lamb[..., 0], np.float64)
    b = np.asarray(lamb[..., 1], np.float64)
    mean = {"z_theta": jnp.asarray(mu_t, jnp.float32),
            "z_beta": jnp.asarray(psi(a) - psi(b), jnp.float32)}
    var = {"z_theta": jnp.asarray(v_t, jnp.float32),
           "z_beta": jnp.asarray(psi1(a) + psi1(b), jnp.float32)}
    return mean, var


def svi_informed_inits(gamma, lamb, key, *, n_chains=0, overdisperse=2.0,
                       scale_sigma=None, k_alpha=None):
    """Chain initializations drawn from the (overdispersed) fitted
    variational posterior, plus a diagonal mass preconditioner.

    Standard ADVI/Pathfinder-style warm-start: chains start inside the
    posterior's typical set instead of trekking there from a cold init,
    and the initial inverse mass is q's z-space variance — which fixes
    the stepsize collapse the cold warmup hits on these extremely
    concentrated posteriors. Only efficiency is affected: the kernel's
    stationary distribution is untouched, and inits are OVERdispersed
    (q-draws scaled by `overdisperse` around the q-mean) so split R-hat
    retains its power to flag SVI-vs-posterior disagreement.

    Returns (params0 with leading chain axis iff n_chains > 1, inv_mass
    pytree without a chain axis).
    """
    mean, var = q_z_moments(gamma, lamb, scale_sigma=scale_sigma,
                            k_alpha=k_alpha)
    n_draws = max(n_chains, 1)
    gam = jnp.asarray(gamma, jnp.float32)
    lam = jnp.asarray(lamb, jnp.float32)
    k1, k2, k3 = jax.random.split(key, 3)
    # Exact q draws in z-space: theta ~ Dir(gamma) via normalized
    # Gammas; w from the scale prior; logit-beta via two Gammas.
    gt = jax.random.gamma(k1, gam, (n_draws,) + gam.shape, jnp.float32)
    log_theta = jnp.log(gt) - jax.scipy.special.logsumexp(
        jnp.log(gt), axis=-1, keepdims=True)
    if scale_sigma is not None:
        w = scale_sigma * jax.random.normal(
            k3, (n_draws,) + gam.shape[:-1], jnp.float32)
    else:
        w = jnp.log(jax.random.gamma(
            k3, float(k_alpha), (n_draws,) + gam.shape[:-1], jnp.float32))
    zt = log_theta + w[..., None]
    ga = jax.random.gamma(k2, lam[..., 0], (n_draws,) + lam.shape[:-1],
                          jnp.float32)
    gb = jax.random.gamma(jax.random.fold_in(k2, 1), lam[..., 1],
                          (n_draws,) + lam.shape[:-1], jnp.float32)
    zb = jnp.log(ga) - jnp.log(gb)
    draws = {"z_theta": zt, "z_beta": zb}
    c = jnp.float32(overdisperse)
    params0 = jax.tree.map(
        lambda d, m: (m + c * (d - m)).astype(jnp.float32), draws,
        {k_: v[None] for k_, v in mean.items()})
    if not n_chains:
        params0 = jax.tree.map(lambda a: a[0], params0)
    return params0, var
