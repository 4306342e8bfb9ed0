"""Small-K validator: compare SVI variational moments against MCMC.

BASELINE.json:4/:9 — "NUTS/HMC + SMC posterior on a subsample vs SVI
moments". Runs SVI and a sampler on the same genotype matrix and reports
label-aligned discrepancies of E[theta] and E[beta].
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.data.dataset import GenotypeData
from terastructure_tpu.mcmc import run_hmc, run_nuts, run_smc
from terastructure_tpu.mcmc.potential import PSDPotential, init_params
from terastructure_tpu.models import psd
from terastructure_tpu.svi import fit
from terastructure_tpu.utils.labels import align_columns


@dataclasses.dataclass
class ValidationReport:
    theta_mae: float          # mean |E_svi[theta] - E_mcmc[theta]| aligned
    beta_mae: float
    theta_svi: np.ndarray
    theta_mcmc: np.ndarray
    beta_svi: np.ndarray
    beta_mcmc: np.ndarray
    sampler_diag: dict
    svi_steps: int


def mcmc_moments(x, k, *, alpha, sampler="nuts", seed=0, n_samples=600,
                 n_warmup=400, **kw):
    """Posterior means of theta/beta under the chosen sampler."""
    pot = PSDPotential(x=jnp.asarray(x), alpha=alpha)
    key = jax.random.PRNGKey(seed)
    if sampler == "smc":
        n_particles = kw.pop("n_particles", 512)
        k1, k2, k3 = jax.random.split(key, 3)
        particles0 = {
            "z_theta": jnp.log(jax.random.gamma(
                k1, alpha, (n_particles, pot.n, k))),
            "z_beta": jax.scipy.special.logit(jax.random.uniform(
                k2, (n_particles, pot.l, k), minval=1e-4, maxval=1 - 1e-4)),
        }
        particles, diag = run_smc(
            k3, pot.log_prior, pot.log_lik, particles0,
            n_particles=n_particles, **kw)
        samples = particles
    else:
        n_chains = kw.pop("n_chains", 1)
        k1, k2 = jax.random.split(key)
        params0 = init_params(pot, k1, k=k,
                              n_chains=n_chains if n_chains > 1 else 0)
        runner = run_nuts if sampler == "nuts" else run_hmc
        samples, diag = runner(
            k2, pot, params0, n_samples=n_samples, n_warmup=n_warmup,
            n_chains=n_chains, **kw)
        if n_chains > 1:
            from terastructure_tpu.mcmc.diagnostics import summarize

            # Diagnose on the CONSTRAINED parameters: unconstrained
            # z_theta coordinates of near-zero theta components wander
            # freely in log space (the likelihood is flat there), which
            # inflates z-space R-hat by orders of magnitude without
            # affecting theta/beta.
            g = jnp.exp(samples["z_theta"])
            theta_s = np.array(g / jnp.sum(g, axis=-1, keepdims=True))
            beta_s = np.array(jax.nn.sigmoid(samples["z_beta"]))
            # Align every chain's component labels to chain 0 BEFORE
            # diagnostics: the PSD posterior is invariant to permuting
            # the K populations, and chains that settled on different
            # labelings are not "unmixed" — un-aligned R-hat conflates
            # the two (VERDICT r1). The permutation comes from the
            # chain-mean theta (Hungarian on column L1 distance) and is
            # applied to theta AND beta (same component axis).
            perms = []
            for c in range(1, theta_s.shape[0]):
                _, perm = align_columns(theta_s[c].mean(axis=0),
                                        theta_s[0].mean(axis=0))
                theta_s[c] = theta_s[c][..., perm]
                beta_s[c] = beta_s[c][..., perm]
                perms.append(perm.tolist())
            constrained = {
                "theta": theta_s,
                "beta": beta_s,
            }
            diag = dict(diag)
            diag["convergence"] = summarize(constrained, max_params=64)
            diag["chain_label_perms"] = perms
            # Moment estimates from the ALIGNED constrained samples
            # (merging chains with mismatched labels would corrupt them).
            theta = theta_s.reshape((-1,) + theta_s.shape[2:])
            beta = beta_s.reshape((-1,) + beta_s.shape[2:])
            return (
                np.asarray(theta.mean(axis=0)),
                np.asarray(beta.mean(axis=0)),
                diag,
            )
    g = jnp.exp(samples["z_theta"])
    theta = g / jnp.sum(g, axis=-1, keepdims=True)
    beta = jax.nn.sigmoid(samples["z_beta"])
    return (
        np.asarray(jnp.mean(theta, axis=0)),
        np.asarray(jnp.mean(beta, axis=0)),
        diag,
    )


def compare_svi_mcmc(
    x: np.ndarray,
    k: int,
    *,
    sampler: str = "nuts",
    svi_config: Optional[SVIConfig] = None,
    seed: int = 0,
    **sampler_kw,
) -> ValidationReport:
    """Fit SVI and run MCMC on the same dense genotype matrix x (N, L)."""
    n, l = x.shape
    cfg = svi_config or SVIConfig(
        n=n, l=l, k=k, batch_size=min(64, l), max_steps=4000,
        rfreq=200, seed=seed,
    )
    data = GenotypeData.from_dense(
        x, validation_frac=0.01, heldout_frac=0.0, seed=seed)
    res = fit(cfg, data)
    theta_svi = np.asarray(psd.theta_mean(res.state.gamma))
    beta_svi = np.asarray(psd.beta_mean(res.state.lamb))[:l]

    theta_mcmc, beta_mcmc, diag = mcmc_moments(
        x, k, alpha=cfg.alpha_value, sampler=sampler, seed=seed,
        **sampler_kw)

    aligned_theta, perm = align_columns(theta_svi, theta_mcmc)
    theta_mae = float(np.abs(aligned_theta - theta_mcmc).mean())
    beta_mae = float(np.abs(beta_svi[:, perm] - beta_mcmc).mean())
    return ValidationReport(
        theta_mae=theta_mae,
        beta_mae=beta_mae,
        theta_svi=aligned_theta,
        theta_mcmc=theta_mcmc,
        beta_svi=beta_svi[:, perm],
        beta_mcmc=beta_mcmc,
        sampler_diag=diag,
        svi_steps=res.steps,
    )
