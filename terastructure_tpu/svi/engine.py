"""The SVI engine — single-device jittable step and step-chunk runner.

TPU-native re-architecture of the reference inference loop
(`SNPSamplingE::infer`, src/snpsamplinge.cc, SURVEY.md §3.1):

  repeat:
    sample SNP minibatch B                      (here: on-device PRNG)
    local step: phi <-> lambda_B to convergence (bounded lax.while_loop,
                                                 all-matmul, ops/stats_dense)
    global step: natural-gradient gamma update scaled by L/|B|,
                 Robbins-Monro rho_t = (tau0+t)^-kappa
    scatter converged lambda_B back into lambda

The *inverted* global/local split (SURVEY.md §7.4) is preserved: gamma
(per-individual) is the stochastically updated global state; lambda_j is
local to the sampled SNP and set by full coordinate ascent.

Design notes (TPU):
  - The packed genotype matrix stays uint8 (L, ceil(N/4)) in HBM; a step
    gathers B rows and unpacks on device (data/pack.unpack2bit_jnp).
  - `make_run_chunk` wraps `nsteps` steps in one lax.fori_loop under a
    single jit, so the host only syncs at validation boundaries (rfreq).
  - RNG: one base PRNGKey, `fold_in(step)` per iteration — reproducible
    and resumable (SURVEY.md §7.4 RNG discipline).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.data.pack import unpack2bit_jnp
from terastructure_tpu.models import psd
from terastructure_tpu.ops import stats_dense as ops


class SVIState(NamedTuple):
    gamma: jnp.ndarray   # (N, K) f32 Dirichlet params
    lamb: jnp.ndarray    # (L, K, 2) f32 Beta params
    t: jnp.ndarray       # () int32 iteration counter
    key: jnp.ndarray     # base PRNGKey (never split in place; fold_in(t))


def init_state(cfg: SVIConfig, *, l_padded=None) -> SVIState:
    """Random gamma init, prior lambda init (reference: gsl rng init [MED])."""
    l = cfg.l if l_padded is None else l_padded
    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_run = jax.random.split(key)
    gamma = (
        cfg.alpha_value
        + cfg.gamma_init_scale
        * jax.random.uniform(k_init, (cfg.n, cfg.k), dtype=jnp.float32)
    )
    lamb = jnp.stack(
        [
            jnp.full((l, cfg.k), cfg.beta_a, dtype=jnp.float32),
            jnp.full((l, cfg.k), cfg.beta_b, dtype=jnp.float32),
        ],
        axis=-1,
    )
    return SVIState(gamma=gamma, lamb=lamb, t=jnp.int32(0), key=k_run)


def _sample_batch(key, l_real, batch_size):
    """Uniform SNP minibatch. Without replacement when L is small enough
    for the O(L) permutation to be cheap; with replacement (still unbiased,
    SURVEY.md §1.2 step 1) at biobank L."""
    if l_real <= 65536:
        return jax.random.choice(
            key, l_real, shape=(batch_size,), replace=False
        ).astype(jnp.int32)
    return jax.random.randint(key, (batch_size,), 0, l_real, dtype=jnp.int32)


def step_on_batch(cfg: SVIConfig, gamma, lamb, xb, idx, t):
    """One SVI update given an unpacked minibatch xb (B, N) and SNP ids idx.

    Pure in (gamma, lamb); shared by the single-device and sharded paths.
    Returns (gamma', lamb').
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    a1, a0 = ops.allele_counts(xb, jnp.float32)
    u = ops.exp_elog_theta(gamma)

    lamb_b = ops.local_solve(
        a1, a0, u, lamb[idx],
        beta_a=cfg.beta_a, beta_b=cfg.beta_b,
        local_iters=cfg.local_iters, local_tol=cfg.local_tol, dtype=dtype,
    )

    t1, t0 = ops.exp_elog_beta(lamb_b)
    stats = ops.batch_stats(a1, a0, u, t1, t0, dtype)

    new_lamb_b = jnp.stack(
        [cfg.beta_a + stats.lam0_stat, cfg.beta_b + stats.lam1_stat], axis=-1
    )
    lamb = lamb.at[idx].set(new_lamb_b)

    rho = jnp.asarray(cfg.rho(t.astype(jnp.float32)), jnp.float32)
    scale = jnp.float32(cfg.l) / jnp.float32(cfg.batch_size)
    gamma_target = cfg.alpha_value + scale * stats.gamma_stat
    gamma = (1.0 - rho) * gamma + rho * gamma_target
    return gamma, lamb


def make_step(cfg: SVIConfig):
    """Build the jittable single-device SVI step: (state, packed) -> state."""

    def step(state: SVIState, packed) -> SVIState:
        gamma, lamb, t, key = state
        kb = jax.random.fold_in(key, t)
        idx = _sample_batch(kb, cfg.l, cfg.batch_size)
        rows = packed[idx]                       # (B, W) uint8 gather
        xb = unpack2bit_jnp(rows, cfg.n)         # (B, N) int8
        gamma, lamb = step_on_batch(cfg, gamma, lamb, xb, idx, t)
        return SVIState(gamma=gamma, lamb=lamb, t=t + 1, key=key)

    return step


def make_run_chunk(cfg: SVIConfig, nsteps: int):
    """jit-compiled runner of `nsteps` SVI steps (one host sync per chunk)."""
    step = make_step(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state: SVIState, packed) -> SVIState:
        def body(_, s):
            return step(s, packed)
        return jax.lax.fori_loop(0, nsteps, body, state)

    return run_chunk


@functools.partial(jax.jit, static_argnames=())
def entry_loglik(gamma, lamb, ind_idx, snp_idx, x):
    """Mean per-entry predictive log-lik on an entry set (validation or
    heldout) — the reference `compute_likelihood` (SURVEY.md §3.3)."""
    ll = psd.predictive_loglik(gamma, lamb, ind_idx, snp_idx, x)
    return jnp.mean(ll)
