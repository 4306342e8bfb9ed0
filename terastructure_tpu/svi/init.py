"""Spectral warm initialization for SVI.

Admixture structure is low-rank: E[x]/2 = theta @ beta.T, so the top
K-1 principal components of the (standardized) genotype matrix span the
population structure (Patterson/Price/Reich 2006 — the same fact
EIGENSTRAT and ADMIXTURE's own -P init exploit). A randomized-SVD
sketch of the packed matrix costs two streamed passes of (Lb, N) x
(N, r) MXU matmuls (~80 GFLOP at the TGP shape, well under a second of
chip time), and a soft k-means assignment in PC space gives gamma a
WEAK pull toward the right cluster structure — enough to skip the
random-init wander phase of SVI without biasing the fixed point (the
natural-gradient updates keep full freedom; strength ~5 pseudo-counts
vs the ~2L counts a converged gamma carries).

The reference initializes gamma from uniform random draws
(upstream-relative src/snpsamplinge.cc init, SURVEY.md §1.2 [MED]);
`SVIConfig.init = "random"` (default) preserves that behavior,
"spectral" enables this path (`fit --init-mode spectral`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from terastructure_tpu.data.pack import unpack2bit_jnp
from terastructure_tpu.models.psd import MISSING


def _standardized_block(packed_blk, n):
    """(Lb, W) packed bytes -> (Lb, N) f32 standardized genotypes."""
    x = unpack2bit_jnp(packed_blk, n)                  # (Lb, N) int8
    obs = (x != MISSING)
    xf = jnp.where(obs, x, 0).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(obs, axis=1), 1)
    p = jnp.sum(xf, axis=1) / (2.0 * cnt)              # per-SNP MAF
    p = jnp.clip(p, 1e-4, 1 - 1e-4)
    denom = jnp.sqrt(2.0 * p * (1.0 - p))
    z = (xf - 2.0 * p[:, None]) / denom[:, None]
    return jnp.where(obs, z, 0.0)


def pca_embedding(packed, n, k, *, oversample: int = 8, seed: int = 0,
                  block: int = 65536, l_real=None):
    """Top-(k-1) PC coordinates of the individuals, (N, k-1) f32.

    Randomized range-finder SVD (Halko/Martinsson/Tropp): one pass
    builds Y = M @ Omega (L, r), QR, second pass B = Q^T M (r, N),
    small SVD of B. M is the (L, N) standardized genotype matrix,
    streamed in `block`-SNP slabs; the packed bytes never densify on
    host.
    """
    l_real = int(l_real if l_real is not None else packed.shape[0])
    r = min(max(k - 1, 1) + oversample, n)
    omega = jax.random.normal(jax.random.PRNGKey(seed), (n, r), jnp.float32)

    @jax.jit
    def pass1(blk):
        return _standardized_block(blk, n) @ omega

    ys = [pass1(packed[i:i + block]) for i in range(0, l_real, block)]
    y = jnp.concatenate(ys, axis=0)                    # (L, r)
    q, _ = jnp.linalg.qr(y)                            # tall-skinny QR

    @jax.jit
    def pass2(blk, qb):
        return qb.T @ _standardized_block(blk, n)

    b = jnp.zeros((r, n), jnp.float32)
    for i in range(0, l_real, block):
        b = b + pass2(packed[i:i + block], q[i:i + block])
    _, s, vt = jnp.linalg.svd(b, full_matrices=False)
    dims = max(k - 1, 1)
    # scale by singular values: distances in PC space reflect variance
    return (vt[:dims, :].T * s[:dims]).astype(jnp.float32)


def _kmeans(e, k, seed, iters=25):
    """Tiny k-means with max-min (kmeans++-style) seeding. e: (N, d)."""
    n = e.shape[0]
    key = jax.random.PRNGKey(seed)
    first = jax.random.randint(key, (), 0, n)
    centers = [e[first]]
    d2 = jnp.sum((e - centers[0]) ** 2, axis=1)
    for _ in range(k - 1):
        centers.append(e[jnp.argmax(d2)])
        d2 = jnp.minimum(d2, jnp.sum((e - centers[-1]) ** 2, axis=1))
    c = jnp.stack(centers)                             # (K, d)

    def body(c, _):
        d = jnp.sum((e[:, None, :] - c[None]) ** 2, axis=-1)  # (N, K)
        a = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(a, k, dtype=jnp.float32)
        cnt = jnp.maximum(onehot.sum(0), 1.0)
        return (onehot.T @ e) / cnt[:, None], None

    c, _ = jax.lax.scan(body, c, None, length=iters)
    return c


def spectral_gamma(packed, n, k, *, alpha, seed: int = 0,
                   strength: float = 5.0, l_real=None) -> jnp.ndarray:
    """(N, K) gamma init: alpha + strength * soft cluster assignment."""
    if k < 2:
        return jnp.full((n, k), alpha + strength, jnp.float32)
    e = pca_embedding(packed, n, k, seed=seed, l_real=l_real)
    c = _kmeans(e, k, seed)
    d = jnp.sum((e[:, None, :] - c[None]) ** 2, axis=-1)       # (N, K)
    # temperature = mean distance to the assigned center: soft enough
    # that admixed individuals split mass across nearby clusters
    tau = jnp.maximum(jnp.mean(jnp.min(d, axis=1)), 1e-6)
    soft = jax.nn.softmax(-d / tau, axis=1)
    return (alpha + strength * soft).astype(jnp.float32)
