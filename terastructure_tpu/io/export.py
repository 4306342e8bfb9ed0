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
