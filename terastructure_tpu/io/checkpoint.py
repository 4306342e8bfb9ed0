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


_ckptr: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _ckptr
    if _ckptr is None:
        _ckptr = ocp.StandardCheckpointer()
    return _ckptr


def wait_until_finished() -> None:
    """Block until any in-flight async save has committed."""
    if _ckptr is not None:
        _ckptr.wait_until_finished()


def save_checkpoint(path: str, state: SVIState, cfg: SVIConfig,
                    block: bool = True) -> None:
    """Save the SVIState + config.

    block=False dispatches the Orbax save ASYNCHRONOUSLY (SURVEY.md §5
    "Orbax async checkpointing"): device arrays are snapshotted and the
    serialization runs on background threads while training continues —
    periodic mid-run saves shouldn't stall the step loop. At most one
    save is in flight (a new save first waits out the previous one);
    call wait_until_finished() (or a final blocking save) before
    reading the checkpoint back."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
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
    if block:
        ckptr.wait_until_finished()


def restore_checkpoint(
    path: str, *, sharding_fn=None
) -> tuple[SVIState, SVIConfig]:
    """Restore (state, config). `sharding_fn(name, arr)` may device_put
    each array with the desired NamedSharding (multi-host resume)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, _CONFIG_FILE)) as f:
        cfg = SVIConfig.from_json(f.read())
    ckptr = _checkpointer()
    ckptr.wait_until_finished()          # a pending async save may be ours
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
