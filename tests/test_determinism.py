"""Determinism property tests (SURVEY.md §5: no shared-memory races in
the JAX design — same seed => bitwise-identical runs, across chunkings
and across restarts)."""

import numpy as np
import jax.numpy as jnp

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.data import GenotypeData, simulate_psd
from terastructure_tpu.svi import engine
from terastructure_tpu.utils.profiling import StepMeter


def _setup(seed):
    n, l, k = 32, 128, 2
    _, _, x = simulate_psd(n, l, k, seed=seed)
    data = GenotypeData.from_dense(x, validation_frac=0, heldout_frac=0, seed=seed)
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=16, seed=seed)
    return cfg, jnp.asarray(data.packed)


def test_same_seed_same_result():
    cfg, packed = _setup(3)
    runs = []
    for _ in range(2):
        chunk = engine.make_run_chunk(cfg, 50)
        s = chunk(engine.init_state(cfg), packed)
        runs.append(np.asarray(s.gamma))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_chunking_invariance():
    cfg, packed = _setup(4)
    s1 = engine.make_run_chunk(cfg, 60)(engine.init_state(cfg), packed)
    s2 = engine.init_state(cfg)
    c = engine.make_run_chunk(cfg, 20)
    for _ in range(3):
        s2 = c(s2, packed)
    np.testing.assert_allclose(np.asarray(s1.gamma), np.asarray(s2.gamma),
                               rtol=1e-6, atol=1e-7)


def test_step_meter():
    m = StepMeter(batch_size=10)
    m({"step": 0, "wall_s": 0.0})
    m({"step": 100, "wall_s": 1.0})
    m({"step": 200, "wall_s": 2.0})
    assert m.summary()["chunks"] == 2
    assert m.snp_updates_per_s > 0
