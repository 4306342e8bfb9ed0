"""Pre-build the /tmp simulation caches used by bench.py and
baseline_configs.py, without touching the TPU (JAX_PLATFORMS=cpu).

The big-N simulations are host-CPU-bound (tens of minutes at
100K x 100K) while the fits are seconds-to-minutes on the chip; on the
single-client axon tunnel the TPU must never be shared between
processes, so building the caches in a CPU-only process lets simulation
overlap other TPU work.

    python benchmarks/presim.py --targets bench,config3,config5@0.1
"""

import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import benchmarks.baseline_configs as bc  # noqa: E402


def build_config(config: int, scale: float, seed: int = 0,
                 missing: float = 0.0):
    spec = bc.CONFIGS[config]
    n = max(int(spec["n"] * scale), 16)
    l = max(int(spec["l"] * scale), 64)
    k = spec["k"]
    cache = (f"/tmp/terasim_{spec['name']}_s{seed}"
             f"_{n}x{l}k{k}_m{missing}.npz")
    if os.path.exists(cache):
        print(f"exists: {cache}", flush=True)
        return
    ns = argparse.Namespace(seed=seed, missing_frac=missing)
    t0 = time.time()
    packed, theta, sim_s = bc._simulate(ns, n, l, k)
    np.savez(cache, packed=packed, theta=theta)
    print(f"built {cache} in {time.time()-t0:.0f}s", flush=True)


def build_bench():
    """bench.py's own cache (different key + width padding)."""
    from terastructure_tpu.data.pack import pack2bit

    n, l, k = 2504, 1_000_000, 8
    cache = f"/tmp/terabench_{n}x{l}k{k}_s0.npy"
    if os.path.exists(cache):
        print(f"exists: {cache}", flush=True)
        return
    t0 = time.time()
    rng = np.random.default_rng(0)
    g = rng.gamma(2.0, 1.0, size=(n, k))
    theta = (g / g.sum(1, keepdims=True)).astype(np.float32)
    packed = np.empty((l, (n + 3) // 4), dtype=np.uint8)
    chunk = 65536
    for j0 in range(0, l, chunk):
        j1 = min(j0 + chunk, l)
        beta = rng.beta(1.0, 1.0, size=(j1 - j0, k)).astype(np.float32)
        p = np.clip(theta @ beta.T, 0, 1)
        x = (
            (rng.random(p.shape, dtype=np.float32) < p).astype(np.int8)
            + (rng.random(p.shape, dtype=np.float32) < p).astype(np.int8)
        ).T
        packed[j0:j1] = pack2bit(x)
    wpad = (-packed.shape[1]) % 128
    if wpad:
        packed = np.pad(packed, ((0, 0), (0, wpad)), constant_values=0xFF)
    np.save(cache, packed)
    print(f"built {cache} in {time.time()-t0:.0f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", default="bench,config3,config5@0.1",
                    help="comma list: bench | configN[@scale]")
    args = ap.parse_args()
    for t in args.targets.split(","):
        t = t.strip()
        if t == "bench":
            build_bench()
        elif t.startswith("config"):
            cfg, _, sc = t.partition("@")
            build_config(int(cfg[len("config"):]), float(sc or 1.0))
        else:
            raise SystemExit(f"unknown target {t}")


if __name__ == "__main__":
    main()
