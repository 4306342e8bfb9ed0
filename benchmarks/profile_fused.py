"""A/B the fused-step kernel variants at the TGP headline shape.

    python benchmarks/profile_fused.py [--n 2504] [--l 1000000] [--k 8]
    python benchmarks/profile_fused.py --phases

Measures full engine steps (20-step fori chunks, host-transfer synced)
for: baseline round-2 kernel (in-loop unpack, exact divides), acat
pre-decode, acat + approx-div iterations. One process, one JSON line.

--phases (VERDICT r3 next #6): decompose the flagship step into a
measured phase budget that sums to the achieved time — raw kernel
timed at local_iters in {1, 4, 7, 10, 16} gives the per-ascent-pass
slope and the (launch + acat fill + final stats pass) intercept;
acat-off at iters=1 isolates the fill; the engine-step minus raw-kernel
gap is the XLA glue (row gather, u/digamma, global update). Writes
benchmarks/results/fused_phase_budget.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def phases(args):
    """Measured phase budget of the flagship fused step (see docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from terastructure_tpu.ops import fused_step
    from terastructure_tpu.ops import stats_pallas as pk

    n, k, b = args.n, args.k, min(4096, args.l // 2)
    w = (n + 3) // 4
    w += (-w) % 128
    rng = np.random.default_rng(0)
    rows = jax.device_put(rng.integers(0, 256, size=(b, w), dtype=np.uint8))
    u_planes = jax.device_put(
        rng.uniform(0.1, 1.0, size=(4, w, k)).astype(np.float32))
    lamb0 = jnp.ones((b, k, 2), jnp.float32)
    float(jnp.asarray(u_planes[0, 0, 0]))

    reps = args.steps

    interp = jax.default_backend() != "tpu"

    def time_solve(iters, acat=None, accel=False, tag=""):
        kw = dict(local_iters=iters, local_tol=1e-4, beta_a=1.0,
                  beta_b=1.0, dtype=jnp.float32, warm_start=False,
                  precompute_acat=acat, accel=accel, interpret=interp)

        @jax.jit
        def run(r, u, l0):
            def body(_, carry):
                lamb, g = fused_step.fused_local_solve(r, u, carry[0], **kw)
                return lamb, g
            return jax.lax.fori_loop(
                0, reps, body, (l0, jnp.zeros((4, w, k), jnp.float32)))

        # TWO warm calls (same convention as bench.py): on the axon
        # backend the second call re-specializes, and timing it inflates
        # every ladder point by the re-specialization cost / reps.
        out = run(rows, u_planes, lamb0)
        float(jnp.asarray(out[0])[0, 0, 0])
        out = run(rows, u_planes, lamb0)
        float(jnp.asarray(out[0])[0, 0, 0])
        t0 = time.perf_counter()
        out = run(rows, u_planes, lamb0)
        float(jnp.asarray(out[0])[0, 0, 0])
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{tag or f'iters{iters}'} {ms:.3f} ms", file=sys.stderr,
              flush=True)
        return ms

    res = {"backend": jax.default_backend(), "n": n, "k": k, "b": b,
           "w": w, "reps": reps}
    # per-pass slope + intercept (auto acat mode = the flagship pick)
    for it in (1, 4, 7, 10, 16):
        res[f"kernel_ms_iters{it}"] = round(time_solve(it), 3)
    # acat fill isolation: same 1-iteration solve without the pre-decode
    res["kernel_ms_iters1_noacat"] = round(
        time_solve(1, acat=False, tag="iters1_noacat"), 3)
    res["kernel_ms_iters16_noacat"] = round(
        time_solve(16, acat=False, tag="iters16_noacat"), 3)
    # accel tail: 7 passes + Aitken (2 unrolled) vs plain 7
    res["kernel_ms_iters7_accel"] = round(
        time_solve(7, accel=True, tag="iters7_accel"), 3)

    # least-squares per-pass slope from the auto-acat ladder
    its = np.array([1, 4, 7, 10, 16], np.float64)
    ys = np.array([res[f"kernel_ms_iters{int(i)}"] for i in its])
    slope, intercept = np.polyfit(its, ys, 1)
    res["per_pass_ms"] = round(float(slope), 4)
    res["intercept_ms"] = round(float(intercept), 4)

    # engine-step glue: full engine step minus raw kernel at 16 iters
    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.svi import engine

    l = args.l
    packed = jax.device_put(
        rng.integers(0, 256, size=(l, w), dtype=np.uint8))
    float(jnp.asarray(packed[0, 0]))
    cfg = SVIConfig(n=n, l=l, k=k, batch_size=b, seed=0, kernel="fused",
                    lambda_mode="local")
    st = engine.init_state(cfg)
    chunk = engine.make_run_chunk(cfg, reps)
    st = chunk(st, packed)                 # compile
    float(jnp.asarray(st.gamma)[0, 0])
    st = chunk(st, packed)                 # axon re-specialization
    float(jnp.asarray(st.gamma)[0, 0])
    t0 = time.perf_counter()
    st = chunk(st, packed)
    float(jnp.asarray(st.gamma)[0, 0])
    res["engine_step_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 3)
    # glue vs the kernel timing that matches the engine's actual config
    # (accel7 default since round 4; plain16 when accel is off)
    kernel_ms = (res["kernel_ms_iters7_accel"] if cfg.local_accel
                 and cfg.local_iters == 7 else
                 res.get(f"kernel_ms_iters{cfg.local_iters}",
                         res["kernel_ms_iters16"]))
    res["engine_cfg"] = (f"accel{cfg.local_iters}" if cfg.local_accel
                         else f"plain{cfg.local_iters}")
    res["glue_ms"] = round(res["engine_step_ms"] - kernel_ms, 3)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "fused_phase_budget.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2504)
    ap.add_argument("--l", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--phases", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.phases:
        return phases(args)

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
