"""R-hat / ESS diagnostics sanity checks."""

import numpy as np

from terastructure_tpu.mcmc.diagnostics import ess, split_rhat, summarize


def test_rhat_iid_near_one(rng):
    x = rng.normal(size=(4, 500))
    r = split_rhat(x)
    assert 0.99 < float(r) < 1.05


def test_rhat_detects_nonmixing(rng):
    x = rng.normal(size=(4, 500))
    x[0] += 5.0                         # one chain stuck elsewhere
    assert float(split_rhat(x)) > 1.5


def test_ess_iid_close_to_n(rng):
    x = rng.normal(size=(4, 1000))
    e = float(ess(x))
    assert 2000 < e < 6000              # ~4000 total draws


def test_ess_correlated_much_smaller(rng):
    n = 2000
    x = np.empty((2, n))
    for c in range(2):
        z = rng.normal(size=n)
        ar = np.empty(n)
        ar[0] = z[0]
        for t in range(1, n):           # AR(1), rho=0.95
            ar[t] = 0.95 * ar[t - 1] + np.sqrt(1 - 0.95**2) * z[t]
        x[c] = ar
    assert float(ess(x)) < 600


def test_summarize_tree(rng):
    tree = {"a": rng.normal(size=(2, 200, 3)),
            "b": rng.normal(size=(2, 200, 4, 2))}
    rep = summarize(tree)
    assert set(rep) == {"a", "b"}
    assert rep["a"]["max_rhat"] < 1.1
    assert rep["b"]["min_ess"] > 50


def test_rank_normalized_rhat_flags_variance_mismatch():
    """Plain split-R-hat is blind to chains that share a mean but
    differ in VARIANCE; the folded rank-normalized variant (Vehtari et
    al. 2021) must flag it, and must agree ~1 on well-mixed chains."""
    from terastructure_tpu.mcmc.diagnostics import (rank_normalized_rhat,
                                                   split_rhat)

    rng = np.random.default_rng(0)
    good = rng.normal(size=(4, 500))
    assert abs(float(rank_normalized_rhat(good)) - 1.0) < 0.03

    # same mean, 10x variance mismatch between chains
    bad = np.stack([rng.normal(0, 1, 500), rng.normal(0, 1, 500),
                    rng.normal(0, 10, 500), rng.normal(0, 10, 500)])
    assert float(split_rhat(bad)) < 1.2           # fooled
    assert float(rank_normalized_rhat(bad)) > 1.3  # caught by folding
