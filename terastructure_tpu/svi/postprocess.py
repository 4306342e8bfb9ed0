"""compute-beta post-pass: refit every SNP's lambda with theta frozen.

Reference parity: the `-compute-beta` mode (SURVEY.md §3.2) reloads a
converged run's theta and, for each SNP j, runs the local phi/lambda fit
with theta fixed, writing beta.txt. Here it is a lax.map over SNP blocks
reusing the same local_solve kernel — embarrassingly parallel on the SNP
axis (shard over 'snp' for multi-chip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.data.pack import unpack2bit_jnp
from terastructure_tpu.models import psd
from terastructure_tpu.ops import stats_dense as ops


def compute_beta(
    cfg: SVIConfig,
    gamma,
    packed,
    *,
    block: int = 1024,
) -> np.ndarray:
    """Final beta estimates (L, K) given converged gamma (N, K).

    `packed` is the training matrix uint8 (L_padded, W); rows beyond
    cfg.l are ignored. Returns beta posterior means.
    """
    n = cfg.n
    u = ops.exp_elog_theta(jnp.asarray(gamma))
    lp = packed.shape[0]
    nblocks = (lp + block - 1) // block
    pad_rows = nblocks * block - lp
    if pad_rows:
        packed = jnp.concatenate(
            [jnp.asarray(packed),
             jnp.full((pad_rows, packed.shape[1]), 0xFF, jnp.uint8)]
        )
    else:
        packed = jnp.asarray(packed)
    blocks = packed.reshape(nblocks, block, packed.shape[1])

    dtype = jnp.dtype(cfg.compute_dtype)
    lamb0 = jnp.stack(
        [jnp.full((block, cfg.k), cfg.beta_a, jnp.float32),
         jnp.full((block, cfg.k), cfg.beta_b, jnp.float32)],
        axis=-1,
    )

    @jax.jit
    def solve_block(rows):
        xb = unpack2bit_jnp(rows, n)
        a1, a0 = ops.allele_counts(xb, jnp.float32)
        lam = ops.local_solve(
            a1, a0, u, lamb0,
            beta_a=cfg.beta_a, beta_b=cfg.beta_b,
            local_iters=cfg.local_iters, local_tol=cfg.local_tol,
            dtype=dtype,
        )
        t1, t0 = ops.exp_elog_beta(lam)
        stats = ops.batch_stats(a1, a0, u, t1, t0, dtype)
        lam = jnp.stack(
            [cfg.beta_a + stats.lam0_stat, cfg.beta_b + stats.lam1_stat],
            axis=-1,
        )
        return psd.beta_mean(lam)

    out = jax.lax.map(solve_block, blocks)          # (nblocks, block, K)
    return np.asarray(out.reshape(-1, cfg.k)[: cfg.l])
