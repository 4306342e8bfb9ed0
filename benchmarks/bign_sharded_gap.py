"""Engine vs sharded-1x1 step throughput at the N=1M resident shape.

VERDICT r3 weak #4: at 1M x 32K K=10 the round-3 sharded mesh-1x1 fit
ran 41% slower than the engine (39.8K vs 67.3K SNP-updates/s) while the
100K x 16K A/B showed the shard_map wrapper itself is free. Round 4
root-caused it to the sharded `_local_step_pk` running the full-N
refinement sweep unconditionally when subsampling (the engine honors
cfg.local_refine_full, default OFF — one extra full-N pass per step)
plus kernel='auto' resolving to the XLA row gather instead of the DMA
block gather (parallel/sharded.py plan_kernels). This harness re-times
both steps on the SAME device-simulated matrix, pure chunk time (no
eval, no convergence glue), to verify the gap is closed.

    python benchmarks/bign_sharded_gap.py [--n 1000448] [--l 32768]
                                          [--steps 200]

axon rules: one process, run once in background. One JSON document.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_448)
    ap.add_argument("--l", type=int, default=32_768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.n, args.l, args.b, args.steps = 2048, 512, 64, 4

    import jax
    import numpy as np

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.data.simulate import simulate_packed_device_resident
    from terastructure_tpu.parallel import mesh as meshlib
    from terastructure_tpu.parallel import sharded
    from terastructure_tpu.svi import engine

    n, l, k, b = args.n, args.l, args.k, args.b
    # Same config biobank_demo.py uses for the resident fits.
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=b, rfreq=100,
                    seed=args.seed, kernel="pallas", lambda_mode="local",
                    stats_approx_div=True, dma_gather_min_l=16384)

    out = {"backend": jax.default_backend(), "n": n, "l": l, "k": k,
           "b": b, "steps": args.steps}

    t0 = time.time()
    pk_dev, _ = simulate_packed_device_resident(n, l, k, seed=args.seed)
    float(np.asarray(jax.device_get(pk_dev[:1, :1]))[0, 0])  # completion fence
    out["sim_s"] = round(time.time() - t0, 1)
    print("sim done", out["sim_s"], "s", file=sys.stderr, flush=True)

    def fence(st):
        # axon's block_until_ready does not wait for remote execution;
        # a scalar device_get is the only reliable completion fence
        # (same convention as profile_fused.py / StepMeter).
        import numpy as _np

        return float(_np.asarray(jax.device_get(st.gamma[:1, :1]))[0, 0])

    def timed(tag, init_fn, chunk_fn, packed):
        st = init_fn()
        st = chunk_fn(st, packed)                       # compile + warm
        fence(st)
        st = init_fn()
        t0 = time.time()
        st = chunk_fn(st, packed)
        fence(st)
        dt = time.time() - t0
        rate = args.steps * b / dt
        out[tag] = {"wall_s": round(dt, 2),
                    "ms_per_step": round(dt / args.steps * 1e3, 3),
                    "snp_updates_per_s": round(rate, 1)}
        print(tag, out[tag], file=sys.stderr, flush=True)

    # --- engine ---------------------------------------------------------
    timed("engine", lambda: engine.init_state(cfg),
          engine.make_run_chunk(cfg, args.steps), pk_dev)

    # --- sharded mesh 1x1 on the same matrix ----------------------------
    mesh = meshlib.make_mesh(meshlib.MeshSpec(ind=1, snp=1),
                             devices=jax.devices()[:1])
    plan = sharded.make_plan(cfg, mesh)
    chunk = sharded.make_sharded_run_chunk(cfg, plan, mesh, args.steps)
    timed("sharded_1x1", lambda: sharded.init_sharded_state(cfg, plan, mesh),
          chunk, pk_dev)

    e = out["engine"]["snp_updates_per_s"]
    s = out["sharded_1x1"]["snp_updates_per_s"]
    out["sharded_over_engine"] = round(s / e, 4)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "bign_sharded_gap.json")
    if jax.default_backend() == "tpu":
        # merge under a timestamped key — never clobber prior rounds'
        # records (a round-5 re-run once flattened the r4 history)
        doc = {}
        if os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
            if "engine" in doc:          # legacy flat layout
                doc = {"legacy": doc}
        doc[f"run_{int(time.time())}"] = out
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
