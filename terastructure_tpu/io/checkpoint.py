"""Orbax checkpoint/resume for SVI state.

The reference's only resume path is reloading the saved text model
(SURVEY.md §5); here checkpoints are sharded-array Orbax saves of the
full SVIState plus the config JSON, so a multi-host run resumes
bitwise-identically (the RNG is a fold_in of (seed, step) — no sampler
state beyond the step counter, SURVEY.md §7.4 RNG discipline).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.svi.engine import SVIState

_STATE_DIR = "state"
_CONFIG_FILE = "config.json"


def save_checkpoint(path: str, state: SVIState, cfg: SVIConfig) -> None:
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(path, _STATE_DIR),
            dict(
                gamma=state.gamma,
                lamb=state.lamb,
                t=state.t,
                key=jax.random.key_data(state.key)
                if jax.dtypes.issubdtype(state.key.dtype, jax.dtypes.prng_key)
                else state.key,
            ),
            force=True,
        )
    with open(os.path.join(path, _CONFIG_FILE), "w") as f:
        f.write(cfg.to_json())


def restore_checkpoint(
    path: str, *, sharding_fn=None
) -> tuple[SVIState, SVIConfig]:
    """Restore (state, config). `sharding_fn(name, arr)` may device_put
    each array with the desired NamedSharding (multi-host resume)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, _CONFIG_FILE)) as f:
        cfg = SVIConfig.from_json(f.read())
    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.join(path, _STATE_DIR))
    key = raw["key"]
    if not jax.dtypes.issubdtype(
        getattr(key, "dtype", np.uint32), jax.dtypes.prng_key
    ):
        key = jax.random.wrap_key_data(np.asarray(key, dtype=np.uint32))
    arrays = {k: raw[k] for k in ("gamma", "lamb")}
    if sharding_fn is not None:
        arrays = {k: sharding_fn(k, v) for k, v in arrays.items()}
    state = SVIState(
        gamma=arrays["gamma"],
        lamb=arrays["lamb"],
        t=np.asarray(raw["t"]).astype(np.int32)[()],
        key=key,
    )
    return state, cfg
