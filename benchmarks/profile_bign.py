"""Component-level profile of the big-N SVI step (config #5 regime).

One consolidated run (axon: batch all compiles, single process):

  python benchmarks/profile_bign.py [--n 100352] [--l 100000] [--k 10]
                                    [--b 4096] [--steps 20]

Measures, on whatever backend is default (intended: 1x TPU v5e):
  - gather_plain / gather_grouped: the per-step minibatch HBM gather
  - sub_solve: coordinate ascent on the local_sub_n subsample
  - refine: one exact full-N lambda iteration
  - stats_pair / stats_fused: final lambda+gamma statistics pass
    (two-kernel vs one-kernel implementation)
  - step_old: snp_group=1 + two-kernel stats (round-1 behavior)
  - step_new: grouped gather + fused stats (current engine)

Synthetic uniform packed bytes (includes ~25% MISSING); perf does not
depend on genotype values. Prints one JSON line with ms per item.
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
    """Host-transfer sync (block_until_ready lies through the axon tunnel)."""
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
    ap.add_argument("--n", type=int, default=100352)   # % 512 == 0
    ap.add_argument("--l", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--sub-n", type=int, default=8192)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (smoke tests; interpret mode)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.models import psd
    from terastructure_tpu.ops import stats_dense as ops
    from terastructure_tpu.ops import stats_pallas as pk
    from terastructure_tpu.svi import engine

    n, l, k, b = args.n, args.l, args.k, args.b
    w = n // 4
    interpret = jax.default_backend() != "tpu"
    log(f"backend={jax.default_backend()} N={n} L={l} K={k} B={b} "
        f"interpret={interpret}")

    key = jax.random.PRNGKey(0)
    # Host-side byte generation: threefry uint8 on device materializes
    # ~7x the output size in uint32 intermediates (OOMs at 2.5 GB out).
    rng = np.random.default_rng(0)
    packed = jax.device_put(rng.integers(0, 256, size=(l, w), dtype=np.uint8))
    gamma = 0.5 + jax.random.uniform(key, (n, k), dtype=jnp.float32)
    lamb_b0 = jnp.stack([jnp.full((b, k), 1.0, jnp.float32),
                         jnp.full((b, k), 1.0, jnp.float32)], axis=-1)
    sync(packed)
    out = {"backend": jax.default_backend(), "n": n, "l": l, "k": k, "b": b}

    # --- gathers -----------------------------------------------------
    @jax.jit
    def gather_plain(packed, key):
        idx = jax.random.randint(key, (b,), 0, l, dtype=jnp.int32)
        return jnp.sum(packed[idx], dtype=jnp.int32)

    g = 8
    lg = l // g

    @jax.jit
    def gather_grouped(packed, key):
        gidx = jax.random.randint(key, (b // g,), 0, lg, dtype=jnp.int32)
        rows = packed.reshape(lg, g * w)[gidx]
        return jnp.sum(rows, dtype=jnp.int32)

    out["gather_plain_ms"] = timeit(gather_plain, packed, key)
    out["gather_grouped_ms"] = timeit(gather_grouped, packed, key)
    log("gathers:", out["gather_plain_ms"], out["gather_grouped_ms"])

    # --- kernel pieces (fixed row set) -------------------------------
    rows = packed[:b]
    u = ops.exp_elog_theta(gamma)
    tb, tw = pk.pick_tiles(b, w)
    e1, e0 = psd.elog_beta(lamb_b0)
    t1, t0 = jnp.exp(e1), jnp.exp(e0)
    sync((rows, u, t1))

    sub_w = (args.sub_n // 4 // 128) * 128
    idx_w = jax.random.choice(key, w, (sub_w,), replace=False)
    rows_sub = rows[:, idx_w]
    u_sub = u.reshape(w, 4, -1)[idx_w].reshape(4 * sub_w, -1)
    _, tw_sub = pk.pick_tiles(b, sub_w)
    sync(rows_sub)

    def sub_solve(rows_sub, u_sub, lamb):
        return pk.local_solve_packed(
            rows_sub, u_sub, lamb, beta_a=1.0, beta_b=1.0,
            local_iters=16, local_tol=0.0, tb=tb, tw=tw_sub,
            dtype=jnp.bfloat16, interpret=interpret, stat_scale=w / sub_w)

    def refine(rows, u, lamb):
        return pk.local_solve_packed(
            rows, u, lamb, beta_a=1.0, beta_b=1.0,
            local_iters=1, local_tol=0.0, tb=tb, tw=tw,
            dtype=jnp.bfloat16, interpret=interpret)

    def stats_pair(rows, u, t1, t0):
        return pk.batch_stats_packed(rows, u, t1, t0, tb=tb, tw=tw,
                                     dtype=jnp.bfloat16, interpret=interpret)

    def stats_fused(rows, u, t1, t0):
        return pk.batch_stats_fused_packed(
            rows, u, t1, t0, tb=tb, tw=tw,
            dtype=jnp.bfloat16, interpret=interpret)

    def stats_v2(rows, u, t1, t0):
        return pk.batch_stats_fused_v2_packed(
            rows, u, t1, t0, tb=tb, tw=tw,
            dtype=jnp.bfloat16, interpret=interpret)

    def sub_solve_tol(rows_sub, u_sub, lamb):
        return pk.local_solve_packed(
            rows_sub, u_sub, lamb, beta_a=1.0, beta_b=1.0,
            local_iters=16, local_tol=1e-4, tb=tb, tw=tw_sub,
            dtype=jnp.bfloat16, interpret=interpret, stat_scale=w / sub_w)

    out["sub_solve16_ms"] = timeit(jax.jit(sub_solve), rows_sub, u_sub, lamb_b0)
    out["sub_solve_tol_ms"] = timeit(jax.jit(sub_solve_tol),
                                     rows_sub, u_sub, lamb_b0)
    out["refine1_ms"] = timeit(jax.jit(refine), rows, u, lamb_b0)
    out["stats_pair_ms"] = timeit(jax.jit(stats_pair), rows, u, t1, t0)
    out["stats_fused_ms"] = timeit(jax.jit(stats_fused), rows, u, t1, t0)
    out["stats_v2_ms"] = timeit(jax.jit(stats_v2), rows, u, t1, t0)
    log("pieces:", {m: out[m] for m in
                    ("sub_solve16_ms", "sub_solve_tol_ms", "refine1_ms",
                     "stats_pair_ms", "stats_fused_ms", "stats_v2_ms")})

    # --- full steps --------------------------------------------------
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
        log(tag, ms, "ms/step ->", out[tag + "_updps"], "SNP-upd/s")

    base = SVIConfig(n=n, l=l, k=k, batch_size=b, seed=0, kernel="pallas",
                     lambda_mode="local", local_sub_n=args.sub_n)

    run_steps(base.replace(stats_kernel="pair"), "step_pair")
    run_steps(base.replace(stats_kernel="fused_v2"), "step_v2")

    print(json.dumps({m: round(v, 3) if isinstance(v, float) else v
                      for m, v in out.items()}))


if __name__ == "__main__":
    main()
