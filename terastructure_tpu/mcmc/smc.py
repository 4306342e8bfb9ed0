"""Sequential Monte Carlo — adaptive likelihood tempering, TPU-native.

Particles carry the unconstrained PSD parameters; the temperature ladder
is chosen adaptively by bisecting the next inverse temperature so the
effective sample size (ESS) of the incremental weights stays at
`ess_target` * n_particles (Del Moral et al. 2006 adaptive SMC).
Resampling is systematic; mutation moves are HMC kernels targeting the
tempered posterior. All particles advance in lockstep under vmap — the
particle axis is the natural per-device sharding axis for the validator
(BASELINE.json:4 "particles sharded per-device with collective
resampling": resampling is a gather over the particle axis, which XLA
implements as an all-gather when the axis is sharded).

The host-side outer loop iterates temperature stages (data-dependent
count); each stage is one jitted program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from terastructure_tpu.mcmc.hmc import hmc_kernel


class SMCState(NamedTuple):
    particles: object        # pytree, leading axis = n_particles
    log_weights: jnp.ndarray  # (P,) normalized-ish log weights
    temp: jnp.ndarray        # current inverse temperature in [0, 1]
    key: jnp.ndarray
    log_evidence: jnp.ndarray  # running log normalizing-constant estimate
    eps: jnp.ndarray         # HMC mutation step size (collectively adapted)


def ess(log_w):
    w = jax.nn.softmax(log_w)
    return 1.0 / jnp.sum(w * w)


def systematic_resample(key, log_w, n):
    """Systematic resampling: (P,) log weights -> (n,) parent indices."""
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    pts = (u0 + jnp.arange(n)) / n
    return jnp.searchsorted(cum, pts, side="right").astype(jnp.int32)


def _next_temp(log_lik, temp, ess_target_frac, n_particles):
    """Bisect the largest dtemp in (0, 1-temp] with ESS >= target."""
    target = ess_target_frac * n_particles

    def ess_at(new_temp):
        return ess((new_temp - temp) * log_lik)

    def cond(c):
        lo, hi, it = c
        return (it < 40) & (hi - lo > 1e-6)

    def body(c):
        lo, hi, it = c
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1

    full = jnp.asarray(1.0)
    # If jumping straight to temp=1 keeps ESS above target, do that.
    lo, hi, _ = jax.lax.while_loop(cond, body, (temp, full, 0))
    new = jnp.where(ess_at(full) >= target, full, lo)
    return jnp.maximum(new, temp + 1e-6)


def run_smc(
    key,
    log_prior: Callable,
    log_lik: Callable,
    init_particles,
    *,
    n_particles: int,
    n_mutations: int = 3,
    n_leapfrog: int = 16,
    mutation_eps: float = 0.05,
    ess_target_frac: float = 0.5,
    max_stages: int = 100,
    shard_particles: bool = True,
    inv_mass0=None,
    inv_mass_prior=None,
    target_accept: float = 0.65,
    adapt_eps: bool = True,
):
    """Adaptive tempered SMC from the prior sample `init_particles`.

    Returns (particles, diagnostics) where particles approximate the
    posterior  prior * lik  at temp=1. diagnostics includes the
    log-evidence estimate and the realized temperature ladder.

    shard_particles: place the particle axis on a device mesh
    (mcmc/chains.py). Mutation/weighting stay communication-free; the
    ESS reduction and the resampling gather become the collectives XLA
    derives from the shardings (BASELINE.json:4 "collective resampling").

    adapt_eps: collective step-size adaptation (BASELINE.json:4) — after
    each stage the HMC mutation step size is rescaled from the MEAN
    acceptance across ALL particles (a cross-particle reduction), log-eps
    moving toward target_accept. `mutation_eps` seeds the schedule.
    """
    v_log_lik = jax.vmap(log_lik)
    v_log_prior = jax.vmap(log_prior)

    from terastructure_tpu.mcmc.chains import maybe_shard_leading

    init_particles = maybe_shard_leading(
        init_particles, n_particles, shard_particles)

    @jax.jit
    def stage(state: SMCState):
        ll = v_log_lik(state.particles)
        new_temp = _next_temp(ll, state.temp, ess_target_frac, n_particles)
        dtemp = new_temp - state.temp
        inc = dtemp * ll
        log_w = state.log_weights + inc
        # evidence increment: log mean of incremental weights under the
        # previous (normalized) weights
        prev = jax.nn.log_softmax(state.log_weights)
        log_z_inc = jax.scipy.special.logsumexp(prev + inc)

        k_res, k_mut, key = jax.random.split(state.key, 3)
        parents = systematic_resample(k_res, log_w, n_particles)
        particles = jax.tree.map(lambda x: x[parents], state.particles)

        # Mutate with HMC targeting the tempered posterior.
        def tempered(p):
            return log_prior(p) + new_temp * log_lik(p)

        kernel = hmc_kernel(tempered, n_leapfrog)
        if inv_mass0 is None:
            inv_mass = jax.tree.map(jnp.ones_like, jax.tree.map(
                lambda x: x[0], particles))
        elif inv_mass_prior is None:
            # Preconditioned mutations (e.g. the fitted q's z-variances,
            # potential.q_z_moments): any per-stage-fixed mass is a
            # valid HMC kernel for every tempered target — efficiency
            # only. At the 500x1000 validator shape unit-mass mutations
            # barely move (the same >1000x conditioning that froze
            # NUTS) and SMC collapsed to theta MAE 0.23.
            inv_mass = jax.tree.map(jnp.asarray, inv_mass0)
        else:
            # The tempered target's scales slide from the PRIOR's to
            # the posterior's as temp goes 0 -> 1; a posterior-only
            # mass makes early-stage mutations orders of magnitude too
            # small for the prior-wide particle cloud (measured: theta
            # MAE 0.45 on the 40x120 conjugate-ish test). Geometric
            # interpolation in log-variance tracks the ladder.
            inv_mass = jax.tree.map(
                lambda vp, v1: jnp.exp(
                    (1.0 - new_temp) * jnp.log(jnp.asarray(vp))
                    + new_temp * jnp.log(jnp.asarray(v1))),
                inv_mass_prior, inv_mass0)

        # Mutation rounds with COLLECTIVE step-size adaptation: after
        # each round the pooled (all-particle) acceptance moves log-eps
        # toward target_accept, so eps tracks the sharpening tempered
        # posterior within the stage rather than lagging a stage behind.
        def mut_round(carry, _):
            particles, eps, key = carry
            key, k_round = jax.random.split(key)
            keys = jax.random.split(k_round, n_particles)

            def one(kk, p):
                lp = tempered(p)
                p2, _, acc, _ = kernel(kk, p, lp, eps, inv_mass)
                return p2, acc

            particles, accs = jax.vmap(one)(keys, particles)
            mean_acc = jnp.mean(accs)   # cross-particle reduction
            if adapt_eps:
                eps = jnp.clip(
                    eps * jnp.exp(0.7 * (mean_acc - target_accept)),
                    1e-4, 10.0)
            return (particles, eps, key), mean_acc

        (particles, eps, _), accs = jax.lax.scan(
            mut_round, (particles, state.eps, k_mut), None,
            length=n_mutations)
        mean_acc = jnp.mean(accs)

        return SMCState(
            particles=particles,
            log_weights=jnp.zeros(n_particles),
            temp=new_temp,
            key=key,
            log_evidence=state.log_evidence + log_z_inc,
            eps=eps,
        ), mean_acc

    state = SMCState(
        particles=init_particles,
        log_weights=jnp.zeros(n_particles),
        temp=jnp.asarray(0.0),
        key=key,
        log_evidence=jnp.asarray(0.0),
        eps=jnp.asarray(float(mutation_eps)),
    )
    temps = [0.0]
    acc_rates = []
    eps_trace = []
    for _ in range(max_stages):
        state, acc = stage(state)
        temps.append(float(state.temp))
        acc_rates.append(float(acc))
        eps_trace.append(float(state.eps))
        if temps[-1] >= 1.0 - 1e-9:
            break
    return state.particles, {
        "temps": temps,
        "acceptance": acc_rates,
        "eps": eps_trace,
        "log_evidence": float(state.log_evidence),
        "n_stages": len(temps) - 1,
    }
