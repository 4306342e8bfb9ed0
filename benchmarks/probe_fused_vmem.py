"""Empirically probe which fused-kernel configs compile within scoped VMEM.

Round-3 calibration tool for the kernel footprint model (VERDICT r2 #1):
AOT-compiles `fused_local_solve` over a (B, W) x (tw, precompute_acat)
grid on the real TPU and records fit/OOM per config, so the analytic
`kernel_vmem_bytes` model is checked against ground truth instead of
guesswork. Compile-only (no execution) — each point costs seconds.

Two modes:
  --raw       force every (tw, pre) combination to map the boundary
  (default)   compile exactly what pick_config selects per shape — the
              regression check that the auto path never OOMs

Writes benchmarks/results/fused_vmem_probe.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from terastructure_tpu.ops import fused_step

SHAPES = [
    (1024, 640), (2048, 640), (4096, 640),
    (1024, 1280), (2048, 1280),
    (1024, 2560),
    (4096, 256), (4096, 128), (8192, 256), (8192, 384),
]


def try_compile(b, w, k, dtype, pre=None, tw=None, accel=False):
    rows = jnp.zeros((b, w), jnp.uint8)
    up = jnp.zeros((4, w, k), jnp.float32)
    lamb0 = jnp.zeros((b, k, 2), jnp.float32)
    fused_step.fused_local_solve.clear_cache()
    fused_step.TW_OVERRIDE = tw
    try:
        lowered = jax.jit(
            lambda r, u, l: fused_step.fused_local_solve(
                r, u, l, local_iters=7 if accel else 16, local_tol=1e-4,
                beta_a=1.0, beta_b=1.0, dtype=dtype,
                precompute_acat=pre, accel=accel)
        ).lower(rows, up, lamb0)
        lowered.compile()
        return True, ""
    except ValueError as e:
        # supports() rejected the shape (rows over budget etc.) — not a
        # compile outcome; record and move on
        return None, str(e)[:120]
    except Exception as e:  # noqa: BLE001 — classify compile OOMs
        msg = str(e)
        if ("vmem" in msg.lower() or "memory" in msg.lower()
                or "HTTP 500" in msg):
            return False, msg[:200]
        raise
    finally:
        fused_step.TW_OVERRIDE = None
        fused_step.fused_local_solve.clear_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--raw", action="store_true")
    ap.add_argument("--accel", action="store_true",
                    help="probe the Aitken-accelerated kernel (extra live "
                         "(B,K) iterates in the unrolled tail) — "
                         "calibrates the +2 _KPAD_UNITS the model charges "
                         "accel shapes")
    ap.add_argument("--shapes", default="",
                    help="comma list of BxW to probe (default: full grid)"
                         " — accel compiles cost ~1-2.5 min each on the "
                         "tunnel, so probe the VMEM-boundary shapes only")
    args = ap.parse_args()
    if args.shapes:
        global SHAPES
        SHAPES = [tuple(int(v) for v in s.split("x"))
                  for s in args.shapes.split(",")]
    dtype = jnp.dtype(args.dtype)

    out = []
    for (b, w) in SHAPES:
        if b * w > fused_step.ROWS_VMEM_BUDGET:
            continue
        if args.raw:
            combos = [(pre, tw) for pre in (False, "bf16", "i8")
                      for tw in (512, 256, 128) if w % tw == 0]
        else:
            picked = fused_step.pick_config(b, w, args.k, dtype,
                                            accel=args.accel)
            if picked is None:
                out.append({"b": b, "w": w, "picked": None})
                print(json.dumps(out[-1]), flush=True)
                continue
            combos = [(picked[1], picked[0])]
        for pre, tw in combos:
            est = fused_step.kernel_vmem_bytes(
                b, w, args.k, tw=tw, pre=pre, dtype=dtype,
                accel=args.accel)
            ok, msg = try_compile(b, w, args.k, dtype, pre=pre, tw=tw,
                                  accel=args.accel)
            if ok is None:      # supports() rejected — not a compile outcome
                rec = {"b": b, "w": w, "k": args.k, "pre": pre, "tw": tw,
                       "accel": args.accel, "supported": False}
                out.append(rec)
                print(json.dumps(rec), flush=True)
                continue
            rec = {"b": b, "w": w, "k": args.k, "pre": pre, "tw": tw,
                   "accel": args.accel, "dtype": str(dtype), "compiles": ok,
                   "model_mb": round(est / 2**20, 1),
                   "model_fits": est <= fused_step.VMEM_SAFE_BYTES,
                   "err": msg if not ok else ""}
            out.append(rec)
            print(json.dumps(rec), flush=True)

    name = ("fused_vmem_probe_accel.json" if args.accel
            else "fused_vmem_probe.json")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    unsafe = [r for r in out if r.get("model_fits") and not r.get("compiles", True)]
    print(f"wrote {path}; model-accepted-but-OOM count: {len(unsafe)}",
          file=sys.stderr)
    sys.exit(1 if unsafe else 0)


if __name__ == "__main__":
    main()
