"""Multi-host initialization helpers.

The reference is single-process (SURVEY.md §2); multi-host here means
`jax.distributed` + the same SPMD program on every host. Individuals
shard across hosts (gamma rows live on the host that owns them — local
natural-gradient updates need no cross-host traffic beyond the small
(B, K) lambda-stat psums), SNPs across the chips within each host (ICI).

Usage (same on every host):

    from terastructure_tpu.parallel import multihost
    multihost.initialize()          # env-driven (TPU pods auto-detect)
    cfg = SVIConfig(..., ind_shards=multihost.process_count())
    res = fit_sharded(cfg, data_shard)

Data loading: each host needs only its individuals' byte-columns of the
packed matrix; `host_byte_slice` gives the [lo, hi) byte range to read.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize with TPU-pod auto-detection defaults."""
    kw = {}
    if coordinator_address is not None:
        kw.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kw)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def host_byte_slice(n: int, ind_shards: int, shard: int) -> tuple[int, int]:
    """[lo, hi) byte columns of the packed matrix owned by `shard`.

    Requires n padded to a multiple of 4*ind_shards (sharded.make_plan).
    """
    w = (n + 3) // 4
    if w % ind_shards:
        raise ValueError(
            f"packed width {w} not divisible by {ind_shards} shards; "
            "pad individuals first (sharded.prepare does this)")
    per = w // ind_shards
    return shard * per, (shard + 1) * per
