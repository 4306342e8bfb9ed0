"""Text exports matching the reference's save_model outputs.

The reference writes gamma.txt / theta.txt / lambda.txt / beta.txt tsv
files into the run dir (SNPSamplingE::save_model, SURVEY.md §3.1 [MED
names]) so downstream admixture-plotting tooling can consume them. We
write the same files: row index + id column + values per line.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from terastructure_tpu.models import psd


def _write_matrix(path: str, mat: np.ndarray, ids: Optional[list] = None):
    mat = np.asarray(mat)
    with open(path, "w") as f:
        for i, row in enumerate(mat):
            label = ids[i] if ids is not None else i
            vals = "\t".join(f"{v:.8g}" for v in row)
            f.write(f"{i}\t{label}\t{vals}\n")


def load_matrix(path: str) -> np.ndarray:
    """Read back a matrix written by _write_matrix (skips index/id cols)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            rows.append([float(v) for v in parts[2:]])
    return np.asarray(rows)


def load_model(run_dir: str):
    """Read a text model (gamma.txt + lambda.txt) back as (gamma, lamb).

    The reference's only resume path is reloading its saved text model
    (SNPSamplingE save/load, SURVEY.md §5) — this accepts our exports
    AND reference-format run dirs so a reference run can be continued
    here. Returns (gamma (N, K) f32, lamb (L, K, 2) f32); lamb is None
    when lambda.txt is absent (theta-only model).
    """
    gamma = load_matrix(os.path.join(run_dir, "gamma.txt")).astype(
        np.float32)
    lamb_path = os.path.join(run_dir, "lambda.txt")
    lamb = None
    if os.path.exists(lamb_path):
        flat = load_matrix(lamb_path).astype(np.float32)
        if flat.shape[1] % 2:
            raise ValueError(
                f"lambda.txt has odd column count {flat.shape[1]}")
        lamb = flat.reshape(flat.shape[0], flat.shape[1] // 2, 2)
    return gamma, lamb


def state_from_text_model(run_dir: str, cfg, *, step: int = 0):
    """Build an SVIState initialized from a text model to CONTINUE a fit.

    Missing lambda falls back to the Beta prior (it is re-derived local
    state in lambda_mode='local' anyway). `step` seeds the Robbins-Monro
    schedule — reference text models do not record t, so callers choose
    (0 restarts the schedule; a large value makes updates conservative).
    """
    import jax
    import jax.numpy as jnp

    gamma, lamb = load_model(run_dir)
    if gamma.shape != (cfg.n, cfg.k):
        raise ValueError(
            f"gamma.txt shape {gamma.shape} != config {(cfg.n, cfg.k)}")
    if lamb is None:
        lamb = np.stack(
            [np.full((cfg.l, cfg.k), cfg.beta_a, np.float32),
             np.full((cfg.l, cfg.k), cfg.beta_b, np.float32)], axis=-1)
    elif lamb.shape != (cfg.l, cfg.k, 2):
        raise ValueError(
            f"lambda.txt shape {lamb.shape} != config {(cfg.l, cfg.k, 2)}")
    from terastructure_tpu.svi.engine import SVIState

    return SVIState(
        gamma=jnp.asarray(gamma), lamb=jnp.asarray(lamb),
        t=jnp.int32(step),
        key=jax.random.split(jax.random.PRNGKey(cfg.seed))[1],
    )


def save_model(
    run_dir: str,
    gamma,
    lamb,
    *,
    n: Optional[int] = None,
    l: Optional[int] = None,
    ind_ids=None,
    snp_ids=None,
) -> None:
    """Write gamma/theta/lambda/beta text files (trimmed of padding)."""
    os.makedirs(run_dir, exist_ok=True)
    gamma = np.asarray(gamma)
    lamb = np.asarray(lamb)
    if n is not None:
        gamma = gamma[:n]
    if l is not None:
        lamb = lamb[:l]
    theta = np.asarray(psd.theta_mean(gamma))
    beta = np.asarray(psd.beta_mean(lamb))
    _write_matrix(os.path.join(run_dir, "gamma.txt"), gamma, ind_ids)
    _write_matrix(os.path.join(run_dir, "theta.txt"), theta, ind_ids)
    _write_matrix(
        os.path.join(run_dir, "lambda.txt"),
        lamb.reshape(lamb.shape[0], -1),
        snp_ids,
    )
    _write_matrix(os.path.join(run_dir, "beta.txt"), beta, snp_ids)
