"""Single-chip shard_map overhead probe — the measurable slice of the
scaling-efficiency target (BASELINE.json:2) on 1 available chip.

    python benchmarks/tpu_overhead.py [--n 100000] [--l 100000] [--k 10]

Runs the SAME work (same shapes, same step count, same kernel ladder)
through (a) the unsharded single-device engine and (b) the sharded path
on a 1x1 mesh — the delta is the shard_map/collective machinery overhead
at fixed per-device work, i.e. the single-chip-measurable component of
scaling efficiency. Writes benchmarks/results/scaling_tpu_1x1_overhead.json.

Throughput-only probe: genotypes are uniform random bytes (the kernels
are content-independent), no eval carve.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--l", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results", "scaling_tpu_1x1_overhead.json"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.data.dataset import GenotypeData
    from terastructure_tpu.data.pack import packed_width
    from terastructure_tpu.parallel import mesh as meshlib
    from terastructure_tpu.parallel import sharded
    from terastructure_tpu.svi import engine

    cfg = SVIConfig(n=args.n, l=args.l, k=args.k,
                    batch_size=args.batch_size, seed=0)
    w = packed_width(args.n)
    w += (-w) % 128
    rng = np.random.default_rng(0)
    packed = rng.integers(0, 255, size=(args.l, w), dtype=np.uint8)

    out = {"backend": jax.default_backend(), "n": args.n, "l": args.l,
           "k": args.k, "batch_size": args.batch_size,
           "steps": args.steps}

    # ---- unsharded single-device engine ------------------------------
    packed_dev = jax.device_put(packed)
    state = engine.init_state(cfg)
    chunk = engine.make_run_chunk(cfg, args.steps)
    t0 = time.time()
    state = chunk(state, packed_dev)
    float(jnp.asarray(state.gamma)[0, 0])
    out["unsharded_compile_s"] = round(time.time() - t0, 1)
    state = engine.init_state(cfg)
    t0 = time.time()
    state = chunk(state, packed_dev)
    float(jnp.asarray(state.gamma)[0, 0])
    dt = time.time() - t0
    out["unsharded_ms_per_step"] = round(dt / args.steps * 1e3, 3)
    out["unsharded_snp_updates_per_s"] = round(
        args.batch_size * args.steps / dt, 1)
    log("unsharded:", out["unsharded_ms_per_step"], "ms/step")
    del packed_dev, state

    # ---- sharded path on a 1x1 mesh (same chip, same work) -----------
    data = GenotypeData(n=args.n, l=args.l, packed=packed)
    mesh = meshlib.make_mesh(meshlib.MeshSpec(1, 1))
    plan, packed_sh = sharded.prepare(cfg, data, mesh)
    st = sharded.init_sharded_state(cfg, plan, mesh)
    run = sharded.make_sharded_run_chunk(cfg, plan, mesh, args.steps)
    t0 = time.time()
    st = run(st, packed_sh)
    float(jnp.asarray(st.gamma)[0, 0])
    out["sharded_1x1_compile_s"] = round(time.time() - t0, 1)
    st = sharded.init_sharded_state(cfg, plan, mesh)
    t0 = time.time()
    st = run(st, packed_sh)
    float(jnp.asarray(st.gamma)[0, 0])
    dt = time.time() - t0
    out["sharded_1x1_ms_per_step"] = round(dt / args.steps * 1e3, 3)
    out["sharded_1x1_snp_updates_per_s"] = round(
        args.batch_size * args.steps / dt, 1)
    out["sharded_over_unsharded"] = round(
        out["sharded_1x1_ms_per_step"] / out["unsharded_ms_per_step"], 4)
    log("sharded 1x1:", out["sharded_1x1_ms_per_step"], "ms/step",
        f"(x{out['sharded_over_unsharded']} of unsharded)")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
