"""A/B the DMA row-gather kernel and approx-reciprocal ratios (big-N step).

One consolidated run (axon: batch all compiles, single process):

  python benchmarks/profile_gather_approx.py [--n 100352] [--l 100000]
                                             [--k 10] [--b 4096] [--steps 40]

Measures, on the default backend (intended: 1x TPU v5e):
  - gather_plain / gather_dma: standalone minibatch gather, XLA fancy
    index vs ops/gather.gather_rows (rows_blk concurrent HBM DMAs)
  - step_{base,dma,approx,both}: full pallas/local SVI steps with
    cfg.dma_gather x cfg.local_sub_approx_div toggled

Synthetic uniform packed bytes; perf does not depend on genotype values.
Prints one JSON line with ms per item.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100352)
    ap.add_argument("--l", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--sub-n", type=int, default=8192)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.ops.gather import gather_row_blocks
    from terastructure_tpu.svi import engine

    n, l, k, b = args.n, args.l, args.k, args.b
    w = n // 4
    interpret = jax.default_backend() != "tpu"
    log(f"backend={jax.default_backend()} N={n} L={l} K={k} B={b} "
        f"interpret={interpret}")

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    packed = jax.device_put(rng.integers(0, 256, size=(l, w), dtype=np.uint8))
    sync(packed)
    out = {"backend": jax.default_backend(), "n": n, "l": l, "k": k, "b": b}

    # --- standalone gathers -------------------------------------------
    @jax.jit
    def gather_plain(packed, key):
        idx = jax.random.randint(key, (b,), 0, l, dtype=jnp.int32)
        return jnp.sum(packed[idx], dtype=jnp.int32)

    @jax.jit
    def gather_dma(packed, key):
        blocks = jax.random.randint(
            key, (b // 8,), 0, l // 8, dtype=jnp.int32)
        rows = gather_row_blocks(packed, blocks, block=8,
                                 interpret=interpret)
        return jnp.sum(rows, dtype=jnp.int32)

    out["gather_plain_ms"] = timeit(gather_plain, packed, key)
    out["gather_dma_ms"] = timeit(gather_dma, packed, key)
    log("gathers:", out["gather_plain_ms"], out["gather_dma_ms"])

    # --- full steps ----------------------------------------------------
    def run_steps(cfg, tag):
        st = engine.init_state(cfg)
        chunk = engine.make_run_chunk(cfg, args.steps)
        st = chunk(st, packed)          # compile + warm
        sync(st.gamma)
        st = engine.init_state(cfg)
        t0c = time.perf_counter()
        st = chunk(st, packed)
        sync(st.gamma)
        ms = (time.perf_counter() - t0c) / args.steps * 1e3
        out[tag + "_ms"] = ms
        out[tag + "_updps"] = b / (ms / 1e3)
        log(tag, round(ms, 3), "ms/step ->",
            round(out[tag + "_updps"]), "SNP-upd/s")

    base = SVIConfig(n=n, l=l, k=k, batch_size=b, seed=0, kernel="pallas",
                     lambda_mode="local", local_sub_n=args.sub_n,
                     dma_gather=False, local_sub_approx_div=False)
    run_steps(base, "step_base")
    run_steps(base.replace(dma_gather=True), "step_dma")
    run_steps(base.replace(local_sub_approx_div=True), "step_approx")
    run_steps(base.replace(dma_gather=True, local_sub_approx_div=True),
              "step_both")

    print(json.dumps({m: round(v, 3) if isinstance(v, float) else v
                      for m, v in out.items()}))


if __name__ == "__main__":
    main()
