"""Device-sharded chains/particles (BASELINE.json:4) and per-chain label
alignment (VERDICT r1 item 3).

Sharding the vmapped chain/particle axis must not change values: same
keys -> same samples whether the axis lives on 1 or 8 devices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from terastructure_tpu.mcmc import run_nuts, run_smc
from terastructure_tpu.mcmc.chains import chain_mesh, maybe_shard_leading

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _gauss_logp(params):
    return -0.5 * jnp.sum(params["x"] ** 2)


def test_chain_mesh_divisor():
    m = chain_mesh(4)
    assert m is not None and m.devices.size == 4
    m = chain_mesh(6)          # largest divisor of 6 that is <= 8 is 6
    assert m.devices.size == 6
    assert chain_mesh(1) is None


def test_sharded_nuts_matches_vmapped():
    key = jax.random.PRNGKey(0)
    init = {"x": jax.random.normal(jax.random.PRNGKey(1), (4, 8))}
    kw = dict(n_samples=200, n_warmup=100, n_chains=4)
    s_ref, d_ref = run_nuts(key, _gauss_logp, init, shard_chains=False, **kw)
    s_sh, d_sh = run_nuts(key, _gauss_logp, init, shard_chains=True, **kw)
    # Samples stream to host (chunked dispatch), so the device-side
    # evidence of chain sharding is the per-chain eps carried through
    # every dispatch: GSPMD must keep its chain axis on the 4-device
    # mesh end-to-end.
    assert len(d_sh["eps"].sharding.device_set) == 4
    # HMC trajectories are chaotic: different compilations (jit layouts)
    # amplify ulp-level differences, so compare POSTERIOR MOMENTS, and
    # require bitwise determinism within the sharded mode itself.
    ref, sh = np.asarray(s_ref["x"]), np.asarray(s_sh["x"])
    assert abs(ref.mean() - sh.mean()) < 0.05
    assert abs(ref.std() - sh.std()) < 0.1
    s_sh2, _ = run_nuts(key, _gauss_logp, init, shard_chains=True, **kw)
    np.testing.assert_array_equal(np.asarray(s_sh2["x"]), sh)


def test_sharded_smc_matches_unsharded():
    key = jax.random.PRNGKey(2)
    n_p = 64
    init = {"x": jax.random.normal(jax.random.PRNGKey(3), (n_p, 4))}

    def log_prior(p):
        return -0.5 * jnp.sum(p["x"] ** 2)

    def log_lik(p):
        return -0.5 * jnp.sum((p["x"] - 1.0) ** 2)

    kw = dict(n_particles=n_p, n_mutations=1, n_leapfrog=4,
              mutation_eps=0.3, max_stages=20)
    p_ref, d_ref = run_smc(key, log_prior, log_lik, init,
                           shard_particles=False, **kw)
    p_sh, d_sh = run_smc(key, log_prior, log_lik, init,
                         shard_particles=True, **kw)
    # Posterior for this conjugate pair: N(0.5, 0.5) per coordinate.
    ref, sh = np.asarray(p_ref["x"]), np.asarray(p_sh["x"])
    assert abs(sh.mean() - 0.5) < 0.15, sh.mean()
    assert abs(ref.mean() - sh.mean()) < 0.2
    p_sh2, _ = run_smc(key, log_prior, log_lik, init,
                       shard_particles=True, **kw)
    np.testing.assert_array_equal(np.asarray(p_sh2["x"]), sh)


def test_chain_alignment_fixes_label_switched_rhat():
    """Two perfectly-mixed chains that settled on permuted labels must
    diagnose clean after alignment (and would look broken without)."""
    from terastructure_tpu.mcmc.diagnostics import summarize
    from terastructure_tpu.utils.labels import align_columns

    rng = np.random.default_rng(0)
    draws, n, k = 400, 20, 3
    base = rng.dirichlet(np.ones(k) * 5, size=n)          # (n, k)
    noise = lambda: rng.normal(0, 0.01, size=(draws, n, k))  # noqa: E731
    c0 = base[None] + noise()
    c1 = (base[None] + noise())[..., [2, 0, 1]]           # label-switched
    stacked = np.stack([c0, c1])                          # (2, draws, n, k)
    bad = summarize({"theta": stacked}, max_params=32)["theta"]["max_rhat"]
    assert bad > 1.5                                      # looks unmixed

    _, perm = align_columns(c1.mean(axis=0), c0.mean(axis=0))
    aligned = np.stack([c0, c1[..., perm]])
    good = summarize({"theta": aligned}, max_params=32)["theta"]["max_rhat"]
    assert good < 1.05, good


def test_ess_detects_unmixed_chains():
    """ADVICE r1 (medium): ESS must NOT over-report for chains at
    different means (B/n term was computed from centered data)."""
    from terastructure_tpu.mcmc.diagnostics import ess, split_rhat

    rng = np.random.default_rng(1)
    x = np.stack([rng.normal(0, 1, 400), rng.normal(10, 1, 400)])
    assert split_rhat(x) > 5
    assert ess(x) < 20, float(ess(x))   # was ~800 before the fix
