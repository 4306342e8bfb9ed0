"""Fused one-kernel-per-step path: correctness vs the dense reference."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.special as sps

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.data import GenotypeData, simulate_psd
from terastructure_tpu.data.pack import pack2bit, unpack2bit_jnp
from terastructure_tpu.ops import fused_step
from terastructure_tpu.ops import stats_dense as ops
from terastructure_tpu.ops import stats_pallas as pk
from terastructure_tpu.svi import engine, fit


def test_inkernel_digamma_matches_scipy(rng):
    # domain floor 1e-3 = aitken_final's lambda floor, the smallest
    # argument the kernel can feed digamma (6 recurrence shifts must
    # still reach the series' x >= 6 validity region from there)
    x = jnp.asarray(
        np.concatenate([rng.uniform(1e-3, 0.05, 200),
                        rng.uniform(0.05, 6.0, 500),
                        rng.uniform(6.0, 5000.0, 500)]), jnp.float32)
    got = np.asarray(fused_step.digamma(x))
    want = sps.digamma(np.asarray(x, np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _problem(b=16, n=512, l=64, k=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 4, size=(l, n)).astype(np.int8)   # (L, N) w/ missing
    packed = jnp.asarray(pack2bit(x))
    gamma = jnp.asarray(rng.uniform(0.3, 3.0, size=(n, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, l, size=b), jnp.int32)
    return x, packed, gamma, idx


def test_fused_matches_dense_cold_start():
    b, n, l, k = 16, 512, 64, 3
    x, packed, gamma, idx = _problem(b, n, l, k)
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=b, local_iters=6,
                    local_tol=-1.0,   # force the full iteration count
                    local_accel=False)  # plain solve on both sides

    # dense reference, cold start from the prior
    xb = unpack2bit_jnp(packed, n)[idx]
    lamb_prior = jnp.stack(
        [jnp.ones((b, k)), jnp.ones((b, k))], axis=-1).astype(jnp.float32)
    want_lamb, want_gstat = engine.step_core_dense(cfg, gamma, xb, lamb_prior)

    u = ops.exp_elog_theta(gamma)
    got_lamb, g = fused_step.fused_local_solve(
        packed[idx], pk.u_to_planes(u), jnp.zeros((b, k, 2), jnp.float32),
        local_iters=6, local_tol=-1.0, beta_a=1.0, beta_b=1.0,
        dtype=jnp.float32, warm_start=False, interpret=True)
    got_gstat = u * pk.planes_to_flat(g)

    np.testing.assert_allclose(np.asarray(got_lamb), np.asarray(want_lamb),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_gstat), np.asarray(want_gstat),
                               rtol=2e-4, atol=2e-4)


def test_fused_warm_start_matches_dense():
    b, n, l, k = 8, 512, 32, 2
    x, packed, gamma, idx = _problem(b, n, l, k, seed=1)
    rng = np.random.default_rng(2)
    lamb_b = jnp.asarray(rng.uniform(0.5, 3.0, (b, k, 2)), jnp.float32)
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=b, local_iters=4,
                    local_tol=-1.0,
                    local_accel=False)  # plain solve on both sides
    xb = unpack2bit_jnp(packed, n)[idx]
    want_lamb, _ = engine.step_core_dense(cfg, gamma, xb, lamb_b)
    u = ops.exp_elog_theta(gamma)
    got_lamb, _ = fused_step.fused_local_solve(
        packed[idx], pk.u_to_planes(u), lamb_b,
        local_iters=4, local_tol=-1.0, beta_a=1.0, beta_b=1.0,
        dtype=jnp.float32, warm_start=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_lamb), np.asarray(want_lamb),
                               rtol=2e-4, atol=2e-4)


def test_fit_local_mode_end_to_end():
    """Full fit with lambda_mode='local': converges, exports real lambda."""
    n, l, k = 64, 256, 2
    theta_true, _, x = simulate_psd(n, l, k, seed=33)
    data = GenotypeData.from_dense(x, validation_frac=0.02,
                                   heldout_frac=0.02, seed=33)
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=32, rfreq=100, max_steps=800,
                    seed=33, lambda_mode="local", kernel="dense")
    res = fit(cfg, data)
    assert np.isfinite(res.validation_ll)
    assert res.heldout_ll is not None and np.isfinite(res.heldout_ll)
    # exported lambda is the converged recomputation, not the prior
    lam = np.asarray(res.state.lamb[:l])
    assert np.abs(lam - 1.0).max() > 1.0

    # matches a stored-mode run's quality (same data/seed)
    cfg2 = cfg.replace(lambda_mode="stored")
    res2 = fit(cfg2, data)
    assert abs(res.heldout_ll - res2.heldout_ll) < 0.05, (
        res.heldout_ll, res2.heldout_ll)


def test_supports_predicate():
    assert fused_step.supports(1024, 640)
    assert not fused_step.supports(1024, 8192)   # rows too big for VMEM
    assert not fused_step.supports(1024, 130)    # W not 128-aligned
    assert not fused_step.supports(13, 128)      # B not 8-aligned


def test_vmem_footprint_model_vs_measured_compiles():
    """The total-footprint model must reject every config measured to
    OOM on v5e and accept every config measured to compile (VERDICT r2
    weak #1: the round-2 acat-only budget accepted B=4096 W=640 pre,
    which the driver bench then crashed on at 121.22 MiB scoped VMEM).
    Ground truth: benchmarks/probe_fused_vmem.py runs on the real chip,
    recorded in benchmarks/results/fused_vmem_probe.json."""
    f32 = jnp.float32
    oomed = [  # (b, w, tw, pre) measured to exceed scoped VMEM
        (4096, 640, 128, True),    # the round-2 bench crash (121.22 MB)
        (4096, 256, 256, False),
        # round-3 probe at the raised 116 MB limit: the pre modes at
        # B=4096 W=256 tw=256 still OOM despite streamed-cast fits
        (4096, 256, 256, "bf16"),
        (4096, 256, 256, "i8"),
        # bf16 acat at the flagship shape (alias True above)
        (4096, 640, 128, "bf16"),
    ]
    for b, w, tw, pre in oomed:
        assert fused_step.kernel_vmem_bytes(
            b, w, 8, tw=tw, pre=pre, dtype=f32) > fused_step.VMEM_SAFE_BYTES

    compiled = [  # measured to compile on v5e (probe grid, 116 MB limit)
        (1024, 640, 128, "bf16"), (2048, 640, 128, "bf16"),
        (4096, 640, 128, False),   # the round-1 flagship bench config
        (4096, 640, 128, "i8"),    # the round-3 flagship (102.09 MB)
        (1024, 1280, 256, "bf16"),
        (1024, 2560, 256, "bf16"),
        (2048, 1280, 128, "bf16"), (2048, 1280, 256, "i8"),
        (4096, 256, 128, "bf16"), (4096, 128, 128, "bf16"),
        (4096, 256, 128, "i8"), (4096, 128, 128, "i8"),
    ]
    for b, w, tw, pre in compiled:
        assert fused_step.kernel_vmem_bytes(
            b, w, 8, tw=tw, pre=pre,
            dtype=f32) <= fused_step.VMEM_SAFE_BYTES, (b, w, tw, pre)

    # every auto-picked config must be one the probe measured compiling
    # (the probe's non-raw mode re-verifies this on hardware)
    for b, w in [(1024, 640), (2048, 640), (4096, 640), (1024, 1280),
                 (2048, 1280), (1024, 2560), (4096, 256), (4096, 128)]:
        assert fused_step.pick_config(b, w, 8) is not None, (b, w)


def test_accel_pick_config_vs_measured_compiles():
    """Accel variant of the probe-consistency check (VERDICT r3 #1:
    hardware-calibrate the +2 _KPAD_UNITS accel charges). Ground truth:
    benchmarks/probe_fused_vmem.py --accel on v5e, recorded in
    benchmarks/results/fused_vmem_probe_accel.json. Measured Mosaic
    crash: the accel tail at a SINGLE w-tile with b>=4096 kills the
    compiler (every acat mode), while nw>=2 at b=4096 and nw=1 at
    b<=2048 compile — pick_config must route around it."""
    f32 = jnp.float32
    # measured-compiling picked configs (probe grid, accel=True)
    compiled = [
        (1024, 640, 128, "bf16"), (2048, 640, 128, "bf16"),
        (4096, 640, 128, "i8"),
        (1024, 1280, 256, "bf16"), (2048, 1280, 128, "bf16"),
        (1024, 2560, 256, "bf16"), (4096, 256, 128, "bf16"),
        (1024, 128, 128, "bf16"), (2048, 128, 128, "bf16"),
    ]
    for b, w, tw, pre in compiled:
        assert fused_step.kernel_vmem_bytes(
            b, w, 8, tw=tw, pre=pre, dtype=f32,
            accel=True) <= fused_step.VMEM_SAFE_BYTES, (b, w, tw, pre)

    # the measured compiler crash: b>=4096 at nw=1 never gets picked
    assert fused_step.pick_config(4096, 128, 8, accel=True) is None
    got = fused_step.pick_config(4096, 256, 8, accel=True)
    assert got is not None and got[0] < 256           # nw >= 2
    # small-b nw=1 is fine
    assert fused_step.pick_config(1024, 128, 8, accel=True) is not None
    # flagship shape keeps its accel config
    assert fused_step.pick_config(4096, 640, 8, accel=True) is not None


def test_pick_config_covers_bench_shapes():
    """Every shape the benches/drivers use must get SOME fused config.
    The flagship B=4096 W=640 shape doesn't fit the bf16 acat scratch
    (99 MB > 96 safe) but DOES fit the exact int8 one (79 MB) — counts
    are {0,1,2} — so it keeps the decode-once win."""
    assert fused_step.pick_config(4096, 640, 8) == (128, "i8")
    assert fused_step.pick_config(1024, 640, 8) == (128, "bf16")
    # HGDP shape: W = ceil(940/4)=235 -> padded 256
    assert fused_step.pick_config(1024, 256, 7) is not None
    # no config fits -> supports() is False and the engine falls back
    assert fused_step.pick_config(8192, 256, 8) is None
    assert not fused_step.supports(8192, 256)


def test_fused_acat_i8_matches_dense():
    """The int8 acat scratch is EXACT (counts {0,1,2}): forcing mode
    'i8' must reproduce the dense step to the same tolerance as auto."""
    b, n, l, k = 16, 512, 64, 3
    x, packed, gamma, idx = _problem(b, n, l, k, seed=7)
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=b, local_iters=6,
                    local_tol=-1.0,
                    local_accel=False)  # plain solve on both sides
    xb = unpack2bit_jnp(packed, n)[idx]
    lamb_prior = jnp.ones((b, k, 2), jnp.float32)
    want_lamb, want_gstat = engine.step_core_dense(cfg, gamma, xb, lamb_prior)
    u = ops.exp_elog_theta(gamma)
    got = {}
    for mode in ("i8", "bf16"):
        got_lamb, g = fused_step.fused_local_solve(
            packed[idx], pk.u_to_planes(u), jnp.zeros((b, k, 2), jnp.float32),
            local_iters=6, local_tol=-1.0, beta_a=1.0, beta_b=1.0,
            dtype=jnp.float32, warm_start=False, interpret=True,
            precompute_acat=mode)
        got[mode] = (np.asarray(got_lamb), np.asarray(u * pk.planes_to_flat(g)))
        np.testing.assert_allclose(got[mode][0], np.asarray(want_lamb),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got[mode][1], np.asarray(want_gstat),
                                   rtol=2e-4, atol=2e-4)
    # i8 and bf16 scratches hold identical values -> bitwise-equal output
    np.testing.assert_array_equal(got["i8"][0], got["bf16"][0])
    np.testing.assert_array_equal(got["i8"][1], got["bf16"][1])


def test_fused_dma_matches_rows_variant():
    """Group-DMA kernel == rows-input kernel on identical group batches."""
    b, n, l, k, g = 32, 512, 128, 3, 8
    rng = np.random.default_rng(4)
    x = rng.integers(0, 4, size=(l, n)).astype(np.int8)
    packed = jnp.asarray(pack2bit(x))
    gamma = jnp.asarray(rng.uniform(0.3, 3.0, size=(n, k)), jnp.float32)
    gidx = jnp.asarray(rng.integers(0, l // g, size=b // g), jnp.int32)
    idx0 = gidx * g
    idx = (idx0[:, None] + jnp.arange(g, dtype=jnp.int32)).reshape(b)

    u = ops.exp_elog_theta(gamma)
    kw = dict(local_iters=5, local_tol=-1.0, beta_a=1.0, beta_b=1.0,
              dtype=jnp.float32, warm_start=False, interpret=True)
    want_lamb, want_g = fused_step.fused_local_solve(
        packed[idx], pk.u_to_planes(u), jnp.zeros((b, k, 2), jnp.float32),
        **kw)
    got_lamb, got_g = fused_step.fused_local_solve_dma(
        idx0, packed, pk.u_to_planes(u), jnp.zeros((b, k, 2), jnp.float32),
        group=g, **kw)
    np.testing.assert_allclose(np.asarray(got_lamb), np.asarray(want_lamb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-5, atol=1e-6)


def test_fused_approx_div_close():
    """Iteration-pass approx reciprocal stays within fast-rcp error of
    the exact solve (final pass is exact either way)."""
    x, packed, gamma, idx = _problem()
    rows = packed[idx]
    u = ops.exp_elog_theta(gamma)
    up = pk.u_to_planes(u)
    lamb0 = jnp.zeros((rows.shape[0], gamma.shape[1], 2), jnp.float32)
    kw = dict(local_iters=8, local_tol=0.0, beta_a=1.0, beta_b=1.0,
              dtype=jnp.float32, interpret=True)
    le, ge = fused_step.fused_local_solve(rows, up, lamb0, **kw)
    la, ga = fused_step.fused_local_solve(rows, up, lamb0,
                                          approx_div=True, **kw)
    np.testing.assert_allclose(np.asarray(la), np.asarray(le),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ge),
                               rtol=5e-3, atol=5e-3)


def _fixed_point_problem(b=64, n=512, k=4, seed=9):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 4, size=(b, n)).astype(np.int8)
    from terastructure_tpu.ops.stats_dense import allele_counts
    a1, a0 = allele_counts(jnp.asarray(x), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.3, 3.0, (n, k)), jnp.float32)
    u = ops.exp_elog_theta(gamma)
    lamb0 = jnp.ones((b, k, 2), jnp.float32)
    return a1, a0, u, lamb0


def test_local_accel_beats_plain16():
    """One Aitken extrapolation after 6 passes lands closer to the
    fixed point than 16 plain passes (the basis for cfg.local_accel;
    numpy study in benchmarks/results/local_accel_ab.json)."""
    a1, a0, u, lamb0 = _fixed_point_problem()

    def solve(iters, accel):
        return ops.local_solve(
            a1, a0, u, lamb0, beta_a=1.0, beta_b=1.0,
            local_iters=iters, local_tol=-1.0, accel=accel)

    ref = np.asarray(solve(300, False))
    err_plain16 = np.abs(np.asarray(solve(16, False)) - ref).mean()
    err_acc6 = np.abs(np.asarray(solve(6, True)) - ref).mean()
    assert err_acc6 < 0.5 * err_plain16, (err_acc6, err_plain16)


def test_fused_accel_matches_dense_accel():
    """cfg.local_accel: the fused kernel's in-loop Aitken extrapolation
    reproduces the dense solve's (same safe-denominator math)."""
    b, n, l, k = 16, 512, 64, 3
    x, packed, gamma, idx = _problem(b, n, l, k, seed=4)
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=b, local_iters=6,
                    local_tol=-1.0, local_accel=True)
    xb = unpack2bit_jnp(packed, n)[idx]
    lamb_prior = jnp.ones((b, k, 2), jnp.float32)
    want_lamb, want_gstat = engine.step_core_dense(cfg, gamma, xb, lamb_prior)
    u = ops.exp_elog_theta(gamma)
    got_lamb, g = fused_step.fused_local_solve(
        packed[idx], pk.u_to_planes(u), jnp.zeros((b, k, 2), jnp.float32),
        local_iters=6, local_tol=-1.0, beta_a=1.0, beta_b=1.0,
        dtype=jnp.float32, warm_start=False, interpret=True, accel=True)
    got_gstat = u * pk.planes_to_flat(g)
    np.testing.assert_allclose(np.asarray(got_lamb), np.asarray(want_lamb),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_gstat), np.asarray(want_gstat),
                               rtol=2e-4, atol=2e-4)


def test_pallas_local_solves_accel_match_dense():
    """local_solve_packed / local_solve_acat with accel == dense accel."""
    b, n, l, k = 16, 512, 64, 3
    x, packed, gamma, idx = _problem(b, n, l, k, seed=5)
    xb = unpack2bit_jnp(packed, n)[idx]
    from terastructure_tpu.ops.stats_dense import allele_counts
    a1, a0 = allele_counts(xb, jnp.float32)
    u = ops.exp_elog_theta(gamma)
    lamb0 = jnp.ones((b, k, 2), jnp.float32)
    want = np.asarray(ops.local_solve(
        a1, a0, u, lamb0, beta_a=1.0, beta_b=1.0,
        local_iters=6, local_tol=-1.0, accel=True))
    tb, tw = pk.pick_tiles(b, packed.shape[1])
    for fn in (pk.local_solve_packed, pk.local_solve_acat):
        got = np.asarray(fn(
            packed[idx], u, lamb0, beta_a=1.0, beta_b=1.0,
            local_iters=6, local_tol=-1.0, tb=tb, tw=tw,
            dtype=jnp.float32, interpret=True, accel=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fit_local_accel_end_to_end():
    """Full fit with local_accel converges to the same quality."""
    n, l, k = 64, 256, 2
    theta_true, _, x = simulate_psd(n, l, k, seed=34)
    data = GenotypeData.from_dense(x, validation_frac=0.02,
                                   heldout_frac=0.02, seed=34)
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=32, rfreq=100, max_steps=800,
                    seed=34, lambda_mode="local", kernel="dense")
    res_plain = fit(cfg, data)
    res_acc = fit(cfg.replace(local_accel=True, local_iters=6), data)
    assert np.isfinite(res_acc.validation_ll)
    assert abs(res_acc.heldout_ll - res_plain.heldout_ll) < 0.05, (
        res_acc.heldout_ll, res_plain.heldout_ll)
