"""Turnkey multi-device fit: mesh construction + sharded chunk runner
plugged into the standard convergence driver.

Single entry point for pod-scale runs:

    from terastructure_tpu.parallel import fit_sharded
    res = fit_sharded(cfg, data)            # mesh auto from jax.devices()

Multi-host: call jax.distributed.initialize() first (see
parallel/multihost.py); every host runs the same program.
"""

from __future__ import annotations

from typing import Optional

import jax

from terastructure_tpu.config import SVIConfig
from terastructure_tpu.data.dataset import GenotypeData
from terastructure_tpu.parallel import mesh as meshlib
from terastructure_tpu.parallel import sharded
from terastructure_tpu.svi import driver


def fit_sharded(
    cfg: SVIConfig,
    data: GenotypeData,
    *,
    mesh: Optional[object] = None,
    stream: bool = False,
    **fit_kw,
) -> driver.FitResult:
    """fit() over a (ind x snp) device mesh (defaults to all devices on
    the 'snp' axis; set cfg.ind_shards/cfg.snp_shards to control).

    stream=True keeps the packed matrix HOST-side (ndarray/np.memmap)
    and double-buffers mesh-sharded minibatches to the devices per step
    (parallel/stream.py) — the executable path for config #5 shapes
    whose packed matrix exceeds aggregate HBM. Bit-identical to the
    resident sharded fit (the host replays the device sample schedule).
    """
    if mesh is None:
        spec = meshlib.choose_mesh_shape(
            len(jax.devices()), cfg.ind_shards, cfg.snp_shards)
        mesh = meshlib.make_mesh(spec)
    state = fit_kw.pop("state", None)

    if stream:
        from terastructure_tpu.parallel import stream as pstream

        plan = sharded.make_plan(cfg, mesh)
        if state is None:
            state = sharded.init_sharded_state(cfg, plan, mesh)
        else:
            state = sharded.shard_state(state, plan, mesh)

        def factory(cfg_, nsteps, l_sample):
            return pstream.make_sharded_stream_chunk(
                cfg_, plan, mesh, nsteps,
                byte_col_offset=data.byte_col_offset)

        return driver.fit(
            cfg, data, state=state, step_fn_factory=factory, stream=True,
            **fit_kw)

    plan, packed = sharded.prepare(cfg, data, mesh)
    if state is None:
        state = sharded.init_sharded_state(cfg, plan, mesh)
    else:
        state = sharded.shard_state(state, plan, mesh)   # e.g. resume

    def factory(cfg_, nsteps, l_sample):
        assert l_sample == plan.l_padded
        return sharded.make_sharded_run_chunk(cfg_, plan, mesh, nsteps)

    return driver.fit(
        cfg, data, state=state, step_fn_factory=factory, packed=packed,
        **fit_kw)
