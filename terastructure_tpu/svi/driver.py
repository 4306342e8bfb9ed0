"""Fit driver: the host-side outer loop with convergence assessment.

Reference behavior reproduced (SURVEY.md §1.2 step 5, §3.1): every `rfreq`
iterations compute validation predictive log-likelihood; declare
convergence when relative improvement stays below `conv_tol` for
`conv_patience` consecutive checks (or it decreases); keep a log-lik trace.
On top of that we emit structured JSONL metrics (SURVEY.md §5) and can
checkpoint via io/checkpoint.py.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from typing import Callable, List, Optional

import jax
import numpy as np

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.data.dataset import GenotypeData
from terastructure_tpu.svi import engine

log = logging.getLogger("terastructure_tpu")


@dataclasses.dataclass
class FitResult:
    state: engine.SVIState
    trace: List[dict]                 # per-check metrics
    converged: bool
    steps: int
    validation_ll: float
    heldout_ll: Optional[float]
    wall_s: float


def fit(
    cfg: SVIConfig,
    data: GenotypeData,
    *,
    state: Optional[engine.SVIState] = None,
    step_fn_factory: Optional[Callable] = None,
    metrics_path: Optional[str] = None,
    callback: Optional[Callable[[dict], None]] = None,
) -> FitResult:
    """Run SVI until convergence or cfg.max_steps.

    `step_fn_factory(cfg, nsteps)` lets the sharded path (parallel/sharded)
    substitute its own chunk runner while reusing this convergence logic.
    """
    assert cfg.n == data.n and cfg.l == data.l, "config/data shape mismatch"
    packed = jax.device_put(np.asarray(data.packed))
    if state is None:
        state = engine.init_state(cfg, l_padded=data.packed.shape[0])

    factory = step_fn_factory or engine.make_run_chunk
    run_chunk = factory(cfg, cfg.rfreq, int(data.packed.shape[0]))

    val = data.validation
    val_args = None
    if val is not None and len(val):
        val_args = (
            jax.device_put(val.ind_idx),
            jax.device_put(val.snp_idx),
            jax.device_put(val.x),
        )

    trace: List[dict] = []
    best_ll = -np.inf
    stall = 0
    converged = False
    t0 = time.time()
    mfile = open(metrics_path, "a") if metrics_path else None

    try:
        while int(state.t) < cfg.max_steps:
            state = run_chunk(state, packed)
            steps_done = int(state.t)
            rec = {
                "step": steps_done,
                "wall_s": round(time.time() - t0, 3),
                "rho": float(cfg.rho(float(steps_done))),
            }
            if val_args is not None:
                ll = float(engine.entry_loglik(state.gamma, state.lamb, *val_args))
                rec["validation_ll"] = ll
                if not np.isfinite(ll):
                    log.error("validation ll is not finite at step %d", steps_done)
                    break
                rel = (ll - best_ll) / (abs(best_ll) + 1e-12)
                if ll > best_ll:
                    best_ll = ll
                stall = stall + 1 if rel < cfg.conv_tol else 0
                if stall >= cfg.conv_patience:
                    converged = True
            trace.append(rec)
            log.info("step %(step)d  val_ll %(validation_ll).6f",
                     {**{"validation_ll": float("nan")}, **rec})
            if mfile:
                mfile.write(json.dumps(rec) + "\n")
                mfile.flush()
            if callback:
                callback(rec)
            if converged:
                break
    finally:
        if mfile:
            mfile.close()

    held_ll = None
    if data.heldout is not None and len(data.heldout):
        held_ll = float(
            engine.entry_loglik(
                state.gamma, state.lamb,
                jax.device_put(data.heldout.ind_idx),
                jax.device_put(data.heldout.snp_idx),
                jax.device_put(data.heldout.x),
            )
        )
    return FitResult(
        state=state,
        trace=trace,
        converged=converged,
        steps=int(state.t),
        validation_ll=float(trace[-1].get("validation_ll", np.nan)) if trace else np.nan,
        heldout_ll=held_ll,
        wall_s=time.time() - t0,
    )
