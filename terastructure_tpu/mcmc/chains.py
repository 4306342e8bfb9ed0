"""Device-sharding for MCMC chains and SMC particles.

BASELINE.json:4: "chains/particles for the HMC/SMC validators are sharded
per-device with collective resampling and step-size adaptation". Chains
are embarrassingly parallel, so the TPU-native mapping is simply the
vmapped leading axis sharded over a 1-D device mesh — XLA partitions the
per-chain program with zero communication. SMC's particle axis shards the
same way; its resampling gather and ESS/softmax reductions become
all-gathers / psums that XLA inserts automatically from the shardings.

`maybe_shard_leading` is a no-op on a single device, so every sampler
call is written sharding-first and degrades gracefully.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chain"


def chain_mesh(n: int, devices=None):
    """1-D mesh over min(n's largest divisor, device count) devices, or
    None when only one device would be used."""
    devices = list(devices if devices is not None else jax.devices())
    d = min(n, len(devices))
    while d > 1 and n % d:
        d -= 1
    if d <= 1:
        return None
    return Mesh(np.asarray(devices[:d]), (CHAIN_AXIS,))


def shard_leading(tree, mesh):
    """device_put every leaf with its leading axis over the chain mesh."""
    def put(a):
        spec = P(CHAIN_AXIS, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def maybe_shard_leading(tree, n: int, shard: bool):
    """Shard the leading (chain/particle) axis across local devices when
    possible; identity otherwise."""
    if not shard:
        return tree
    mesh = chain_mesh(n)
    if mesh is None:
        return tree
    return shard_leading(tree, mesh)
