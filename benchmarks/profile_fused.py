"""A/B the fused-step kernel variants at the TGP headline shape.

    python benchmarks/profile_fused.py [--n 2504] [--l 1000000] [--k 8]

Measures full engine steps (20-step fori chunks, host-transfer synced)
for: baseline round-2 kernel (in-loop unpack, exact divides), acat
pre-decode, acat + approx-div iterations. One process, one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2504)
    ap.add_argument("--l", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.ops import fused_step
    from terastructure_tpu.svi import engine

    n, l, k = args.n, args.l, args.k
    w = (n + 3) // 4
    w += (-w) % 128
    rng = np.random.default_rng(0)
    packed = jax.device_put(
        rng.integers(0, 256, size=(l, w), dtype=np.uint8))
    float(jnp.asarray(packed[0, 0]))  # sync

    out = {"backend": jax.default_backend(), "n": n, "l": l, "k": k}

    def run(cfg, tag):
        st = engine.init_state(cfg)
        chunk = engine.make_run_chunk(cfg, args.steps)
        st = chunk(st, packed)
        float(jnp.asarray(st.gamma)[0, 0])
        st = engine.init_state(cfg)
        t0 = time.perf_counter()
        st = chunk(st, packed)
        float(jnp.asarray(st.gamma)[0, 0])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        out[tag + "_ms"] = round(ms, 3)
        out[tag + "_updps"] = round(cfg.batch_size / (ms / 1e3), 0)
        print(tag, out[tag + "_ms"], "ms", file=sys.stderr, flush=True)

    for b in (1024, 4096):
        base = SVIConfig(n=n, l=l, k=k, batch_size=b, seed=0,
                         kernel="fused", lambda_mode="local")
        # ACAT_OVERRIDE is read at trace time, not a static jit arg —
        # clear the jit cache around the toggle or the later variants
        # reuse the first trace.
        fused_step.ACAT_OVERRIDE = False         # disable pre-decode
        fused_step.fused_local_solve.clear_cache()
        try:
            run(base, f"b{b}_r2base")
        finally:
            fused_step.ACAT_OVERRIDE = None
            fused_step.fused_local_solve.clear_cache()
        run(base, f"b{b}_acat")
        run(base.replace(stats_approx_div=True), f"b{b}_acat_approx")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
