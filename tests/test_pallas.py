"""Pallas kernel correctness vs the dense reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.data import GenotypeData, simulate_psd
from terastructure_tpu.data.pack import pack2bit, unpack2bit_jnp
from terastructure_tpu.ops import stats_dense as ops
from terastructure_tpu.ops import stats_pallas as pk
from terastructure_tpu.svi import engine


def _problem(b=16, n=512, k=3, seed=0, missing=True):
    rng = np.random.default_rng(seed)
    hi = 4 if missing else 3
    x = rng.integers(0, hi, size=(b, n)).astype(np.int8)   # (B, N)
    rows = jnp.asarray(pack2bit(x))
    gamma = jnp.asarray(rng.uniform(0.3, 3.0, size=(n, k)), jnp.float32)
    lamb_b = jnp.asarray(rng.uniform(0.5, 4.0, size=(b, k, 2)), jnp.float32)
    return x, rows, gamma, lamb_b


def test_planar_roundtrip():
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    planes = pk.u_to_planes(u)
    assert planes.shape == (4, 16, 3)
    np.testing.assert_array_equal(np.asarray(planes[1, 2]), np.asarray(u[9]))
    np.testing.assert_array_equal(
        np.asarray(pk.planes_to_flat(planes)), np.asarray(u))


def test_lambda_stats_match_dense():
    x, rows, gamma, lamb_b = _problem()
    u = ops.exp_elog_theta(gamma)
    t1, t0 = ops.exp_elog_beta(lamb_b)
    a1, a0 = ops.allele_counts(jnp.asarray(x), jnp.float32)
    want0, want1 = ops.lambda_stats(a1, a0, u, t1, t0)

    tb, tw = pk.pick_tiles(*rows.shape)
    l0, l1 = pk.lambda_stats_packed(
        rows, pk.u_to_planes(u), t1, t0, tb=tb, tw=tw,
        dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(t1 * l0), np.asarray(want0),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t0 * l1), np.asarray(want1),
                               rtol=2e-5, atol=1e-5)


def test_batch_stats_match_dense():
    x, rows, gamma, lamb_b = _problem(b=24, n=1024, k=4, seed=2)
    u = ops.exp_elog_theta(gamma)
    t1, t0 = ops.exp_elog_beta(lamb_b)
    a1, a0 = ops.allele_counts(jnp.asarray(x), jnp.float32)
    want = ops.batch_stats(a1, a0, u, t1, t0)

    tb, tw = pk.pick_tiles(*rows.shape)
    g, l0, l1 = pk.batch_stats_packed(
        rows, u, t1, t0, tb=tb, tw=tw, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want.gamma_stat),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(want.lam0_stat),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(want.lam1_stat),
                               rtol=2e-5, atol=1e-5)


def test_gather_row_blocks_matches_fancy_index():
    from terastructure_tpu.ops.gather import gather_row_blocks

    rng = np.random.default_rng(9)
    src = jnp.asarray(rng.integers(0, 256, size=(64, 256), dtype=np.uint8))
    blocks = jnp.asarray(rng.integers(0, 8, size=32), jnp.int32)
    out = gather_row_blocks(src, blocks, block=8, blocks_in_flight=16,
                            interpret=True)
    idx = (np.asarray(blocks)[:, None] * 8 + np.arange(8)).reshape(-1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src)[idx])


def test_lambda_stats_approx_div_close():
    x, rows, gamma, lamb_b = _problem(b=16, n=1024, k=3, seed=8)
    u = ops.exp_elog_theta(gamma)
    t1, t0 = ops.exp_elog_beta(lamb_b)
    tb, tw = pk.pick_tiles(*rows.shape)
    kw = dict(tb=tb, tw=tw, dtype=jnp.float32, interpret=True)
    l0e, l1e = pk.lambda_stats_packed(rows, pk.u_to_planes(u), t1, t0, **kw)
    l0a, l1a = pk.lambda_stats_packed(rows, pk.u_to_planes(u), t1, t0,
                                      approx_div=True, **kw)
    np.testing.assert_allclose(np.asarray(l0a), np.asarray(l0e),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(l1a), np.asarray(l1e),
                               rtol=5e-3, atol=5e-3)


def test_batch_stats_fused_match_pair():
    """One-kernel fused stats == the two-kernel pair (multi-tile grid:
    b=24 -> 3 batch tiles, n=4096 -> 2 w-tiles, exercising both the
    gamma fast-axis accumulation and the lambda dynamic-slice init)."""
    x, rows, gamma, lamb_b = _problem(b=24, n=4096, k=4, seed=5)
    u = ops.exp_elog_theta(gamma)
    t1, t0 = ops.exp_elog_beta(lamb_b)

    tb, tw = pk.pick_tiles(*rows.shape)
    assert rows.shape[1] // tw > 1 and rows.shape[0] // tb > 1
    g_w, l0_w, l1_w = pk.batch_stats_packed(
        rows, u, t1, t0, tb=tb, tw=tw, dtype=jnp.float32, interpret=True)
    g, l0, l1 = pk.batch_stats_fused_packed(
        rows, u, t1, t0, tb=tb, tw=tw, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_w),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l0_w),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l1_w),
                               rtol=2e-5, atol=1e-5)


def test_batch_stats_fused_v2_match_pair():
    """v2 fused stats (per-w-tile lambda partials) == the two-kernel
    pair on a multi-tile grid (both the gamma fast-axis accumulation and
    the no-revisit lambda partial slots are exercised)."""
    x, rows, gamma, lamb_b = _problem(b=24, n=4096, k=4, seed=6)
    u = ops.exp_elog_theta(gamma)
    t1, t0 = ops.exp_elog_beta(lamb_b)

    tb, tw = pk.pick_tiles(*rows.shape)
    assert rows.shape[1] // tw > 1 and rows.shape[0] // tb > 1
    g_w, l0_w, l1_w = pk.batch_stats_packed(
        rows, u, t1, t0, tb=tb, tw=tw, dtype=jnp.float32, interpret=True)
    g, l0, l1 = pk.batch_stats_fused_v2_packed(
        rows, u, t1, t0, tb=tb, tw=tw, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_w),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l0_w),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l1_w),
                               rtol=2e-5, atol=1e-5)


def test_batch_stats_fused_v2_approx_div_close():
    """stats_approx_div perturbs the exact pass by only the fast-
    reciprocal error (~2^-12 relative)."""
    x, rows, gamma, lamb_b = _problem(b=16, n=2048, k=4, seed=7)
    u = ops.exp_elog_theta(gamma)
    t1, t0 = ops.exp_elog_beta(lamb_b)
    tb, tw = pk.pick_tiles(*rows.shape)
    g_e, l0_e, l1_e = pk.batch_stats_fused_v2_packed(
        rows, u, t1, t0, tb=tb, tw=tw, dtype=jnp.float32, interpret=True)
    g_a, l0_a, l1_a = pk.batch_stats_fused_v2_packed(
        rows, u, t1, t0, tb=tb, tw=tw, dtype=jnp.float32, interpret=True,
        approx_div=True)
    for a, e in ((g_a, g_e), (l0_a, l0_e), (l1_a, l1_e)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=5e-3, atol=5e-3)


def test_full_step_pallas_vs_dense():
    """End-to-end engine step: pallas impl == dense impl (f32, ragged N/B)."""
    n, l, k = 333, 64, 3                       # ragged N on purpose
    _, _, xd = simulate_psd(n, l, k, seed=3, missing_frac=0.05)
    data = GenotypeData.from_dense(xd, validation_frac=0, heldout_frac=0, seed=3)
    packed = jnp.asarray(data.packed)

    cfg_d = SVIConfig(n=n, l=l, k=k, batch_size=20, seed=3, kernel="dense",
                      lambda_mode="stored")
    cfg_p = cfg_d.replace(kernel="pallas")
    s0 = engine.init_state(cfg_d)

    sd = engine.make_step(cfg_d)(s0, packed)

    # pallas path (interpret on CPU)
    kb = jax.random.fold_in(s0.key, s0.t)
    idx = engine._sample_batch(kb, l, 20)
    rows = packed[idx]
    new_lamb_b, gamma_stat = engine.step_core_packed(
        cfg_p, s0.gamma, rows, s0.lamb[idx], interpret=True)
    lp = s0.lamb.at[idx].set(new_lamb_b)
    gp = engine._global_update(cfg_p, s0.gamma, gamma_stat, s0.t, l)

    np.testing.assert_allclose(np.asarray(gp), np.asarray(sd.gamma),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(sd.lamb),
                               rtol=3e-5, atol=3e-5)


def test_pick_tiles_errors():
    with pytest.raises(ValueError):
        pk.pick_tiles(7, 128)
    with pytest.raises(ValueError):
        pk.pick_tiles(16, 100)
    assert pk.pick_tiles(1024, 640) == (256, 128)


def test_lambda_stats_acat_matches_packed():
    """Pre-decoded count-plane kernel == in-kernel-unpack kernel
    (counts {0,1,2} are exact in bf16, so the decode-once path is the
    same math; VERDICT r2 #8 decode-once optimization)."""
    from terastructure_tpu.ops import stats_pallas as pk

    rng = np.random.default_rng(3)
    b, w, k = 32, 256, 5
    rows = jnp.asarray(rng.integers(0, 256, size=(b, w), dtype=np.uint8))
    u = jnp.asarray(rng.uniform(0.05, 1.0, size=(4 * w, k)), jnp.float32)
    t1 = jnp.asarray(rng.uniform(0.1, 1.0, size=(b, k)), jnp.float32)
    t0 = jnp.asarray(rng.uniform(0.1, 1.0, size=(b, k)), jnp.float32)
    up = pk.u_to_planes(u)
    kw = dict(tb=8, tw=128, dtype=jnp.float32, interpret=True)
    want = pk.lambda_stats_packed(rows, up, t1, t0, **kw)
    a1, a0 = pk.decode_count_planes(rows)
    got = pk.lambda_stats_acat(a1, a0, up, t1, t0, **kw)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-6, atol=1e-6)


def test_local_solve_acat_matches_packed():
    from terastructure_tpu.ops import stats_pallas as pk

    rng = np.random.default_rng(4)
    b, w, k = 16, 128, 3
    rows = jnp.asarray(rng.integers(0, 256, size=(b, w), dtype=np.uint8))
    u = jnp.asarray(rng.uniform(0.05, 1.0, size=(4 * w, k)), jnp.float32)
    lamb0 = jnp.asarray(rng.uniform(0.5, 2.0, size=(b, k, 2)), jnp.float32)
    kw = dict(beta_a=1.0, beta_b=1.0, local_iters=6, local_tol=-1.0,
              tb=8, tw=128, dtype=jnp.float32, interpret=True,
              stat_scale=2.0)
    want = pk.local_solve_packed(rows, u, lamb0, **kw)
    got = pk.local_solve_acat(rows, u, lamb0, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_engine_sub_decode_once_matches_off():
    """step_core_packed with sub_decode_once on/off: same trajectory
    (the decode-once path is the same math on the same subsample)."""
    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.svi import engine

    rng = np.random.default_rng(5)
    n, l, k, b = 4096, 64, 3, 16
    rows = jnp.asarray(
        rng.integers(0, 256, size=(b, n // 4), dtype=np.uint8))
    gamma = jnp.asarray(rng.uniform(0.3, 3.0, size=(n, k)), jnp.float32)
    lamb_b = jnp.ones((b, k, 2), jnp.float32)
    key = jax.random.PRNGKey(0)
    outs = {}
    for flag in (True, False):
        cfg = SVIConfig(n=n, l=l, k=k, batch_size=b, local_iters=5,
                        local_sub_n=512, sub_decode_once=flag,
                        local_sub_approx_div=False)
        outs[flag] = engine.step_core_packed(
            cfg, gamma, rows, lamb_b, interpret=True, key=key)
    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[True][1]),
                               np.asarray(outs[False][1]),
                               rtol=1e-6, atol=1e-6)
