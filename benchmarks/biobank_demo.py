"""Single-chip N=1M demonstrations (config #5's N at one-chip scale).

    python benchmarks/biobank_demo.py [--steps-res 2000] [--steps-str 800]

Two fits at N=1,000,448 individuals (W=250,112 bytes, lane-aligned), K=10:

  resident  — L=32,768 SNPs: the 8.2 GB packed matrix lives in HBM; the
              per-iteration Pallas path with DMA row-gather (1 GB/step
              minibatch) runs at full device speed. This is the per-chip
              compute regime of config #5 (BASELINE.json:10) — at 1M x 1M
              the SNP axis shards across chips, so per-chip L is
              L_total/n_chips and N stays 1M on every chip. The matrix is
              simulated AND eval-carved on device
              (simulate_packed_device_resident + carve_eval_device) — it
              never crosses the host boundary, which through the axon
              tunnel would dominate the run.
  streaming — L=100,000 SNPs: the 25 GB packed matrix exceeds HBM and
              stays host-side (svi/stream.py); double-buffered host->HBM
              batches. Exercises the out-of-core path the full 250 GB
              config #5 would use on a small pod. Simulation runs on
              device then spills to a /tmp memmap cache (one-time d2h).

Simulation runs ON DEVICE (the host PSD draw at this scale costs hours;
the MXU draw is minutes). Bandwidth probes (h2d, d2h) run first —
through the axon tunnel these are the numbers that decide feasibility,
so they are recorded.

axon rules: one process, run once in background, generous timeout.
Prints one JSON document.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1_000_448          # 4*W with W=250,112 (% 128 == 0)
K = 10
L_STREAM = 100_000
L_RES = 32_768
CACHE = "/tmp/biobank_{n}x{l}k{k}_s{seed}"


def _apply_scale(args):
    global N, L_STREAM, L_RES
    if args.n:
        N = args.n
    if args.l_stream:
        L_STREAM = args.l_stream
    if args.l_res:
        L_RES = args.l_res


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def simulate_device(n, l, k, seed):
    """Library device-side PSD draw with progress logging."""
    from terastructure_tpu.data.simulate import simulate_packed_device

    t0 = time.time()

    def prog(j, total):
        if j % (256 * 64) == 0:
            log(f"sim {j}/{total} ({time.time()-t0:.0f}s)")

    packed, theta = simulate_packed_device(n, l, k, seed=seed,
                                           progress=prog)
    return packed, theta, time.time() - t0


def load_or_build(seed):
    """Cached (carved packed memmap, EntrySets, theta) for the L_STREAM
    matrix; resident runs slice the first L_RES rows of the same carve."""
    import numpy as np

    from terastructure_tpu.data.dataset import EntrySet, GenotypeData

    base = CACHE.format(n=N, l=L_STREAM, k=K, seed=seed)
    pk_path, meta_path = base + ".u8", base + ".npz"
    w = N // 4
    if os.path.exists(pk_path) and os.path.exists(meta_path):
        packed = np.memmap(pk_path, dtype=np.uint8, mode="r",
                           shape=(L_STREAM, w))
        z = np.load(meta_path)
        theta = z["theta"]
        ents = {s: EntrySet(z[s + "_i"], z[s + "_j"], z[s + "_x"])
                for s in ("validation", "heldout")}
        sim_s = 0.0
        log(f"loaded cached sim {pk_path}")
    else:
        packed_arr, theta, sim_s = simulate_device(N, L_STREAM, K, seed)
        data = GenotypeData.from_packed(
            packed_arr, N, seed=seed, validation_frac=0.005,
            heldout_frac=0.005, max_eval_entries=200_000,
            eval_snp_pool=2048)
        ents = {"validation": data.validation, "heldout": data.heldout}
        mm = np.memmap(pk_path, dtype=np.uint8, mode="w+",
                       shape=(L_STREAM, w))
        mm[:] = packed_arr
        mm.flush()
        np.savez(meta_path, theta=theta,
                 **{s + "_i": e.ind_idx for s, e in ents.items()},
                 **{s + "_j": e.snp_idx for s, e in ents.items()},
                 **{s + "_x": e.x for s, e in ents.items()})
        del packed_arr
        packed = np.memmap(pk_path, dtype=np.uint8, mode="r",
                           shape=(L_STREAM, w))
    return packed, ents, theta, sim_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-res", type=int, default=2000)
    ap.add_argument("--steps-str", type=int, default=800)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-resident", action="store_true")
    ap.add_argument("--skip-stream", action="store_true")
    ap.add_argument("--batch-str", type=int, default=4096,
                    help="streaming batch size (1 GB/step at 4096; lower "
                         "if the host->device tunnel is the bottleneck)")
    ap.add_argument("--n", type=int, default=0, help="override N (smoke)")
    ap.add_argument("--l-stream", type=int, default=0)
    ap.add_argument("--l-res", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (smoke runs)")
    args = ap.parse_args()
    _apply_scale(args)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.data.dataset import GenotypeData
    from terastructure_tpu.models import psd
    from terastructure_tpu.svi import fit
    from terastructure_tpu.utils import mean_abs_theta_error
    from terastructure_tpu.utils.profiling import StepMeter

    out = {"n": N, "k": K, "backend": jax.default_backend()}

    # --- bandwidth probes (the axon tunnel decides feasibility) -------
    buf = np.random.default_rng(0).integers(0, 255, size=(1 << 28,),
                                            dtype=np.uint8)  # 256 MB
    t0 = time.time()
    d = jax.device_put(buf)
    _ = float(jnp.asarray(d[:1])[0])
    out["h2d_GBps"] = round(buf.nbytes / (time.time() - t0) / 1e9, 2)
    t0 = time.time()
    _ = np.asarray(d)
    out["d2h_GBps"] = round(buf.nbytes / (time.time() - t0) / 1e9, 2)
    del d, buf
    log("bandwidth:", out)

    def run(cfg, data, tag, steps, stream, packed_dev=None, theta=None):
        meter = StepMeter(cfg.batch_size)
        t0 = time.time()
        res = fit(cfg.replace(max_steps=steps), data, stream=stream,
                  packed=packed_dev, callback=meter)
        th = np.asarray(psd.theta_mean(res.state.gamma))[:N]
        wall = time.time() - t0
        rate = meter.snp_updates_per_s
        if not np.isfinite(rate):   # <2 meter callbacks (short runs):
            rate = res.steps * cfg.batch_size / wall  # compile-inclusive
        out[tag] = dict(
            l=cfg.l, steps=res.steps, converged=res.converged,
            validation_ll=round(res.validation_ll, 6),
            heldout_ll=(round(res.heldout_ll, 6)
                        if res.heldout_ll else None),
            theta_mae_vs_truth=round(mean_abs_theta_error(th, theta), 5),
            snp_updates_per_s=round(rate, 1),
            wall_s=round(wall, 1))
        log(tag, out[tag])

    if not args.skip_resident:
        from terastructure_tpu.data.dataset import carve_eval_device
        from terastructure_tpu.data.simulate import (
            simulate_packed_device_resident)

        t0 = time.time()

        def prog(j, total):
            if j % (256 * 16) == 0:
                log(f"sim-res {j}/{total} ({time.time()-t0:.0f}s)")

        pk_dev, theta_res = simulate_packed_device_resident(
            N, L_RES, K, seed=args.seed, progress=prog)
        pk_dev, val, held, pool, eval_rows = carve_eval_device(
            pk_dev, N, validation_frac=0.005, heldout_frac=0.005,
            seed=args.seed, max_eval_entries=200_000, eval_snp_pool=2048)
        out["sim_res_s"] = round(time.time() - t0, 1)
        log("resident sim+carve done:", out["sim_res_s"], "s")
        data_res = GenotypeData(
            n=N, l=L_RES, packed=pk_dev, validation=val, heldout=held,
            eval_row_snps=pool, eval_rows_full=eval_rows)
        cfg = SVIConfig(n=N, l=L_RES, k=K, batch_size=min(4096, L_RES // 2),
                        rfreq=100,
                        seed=args.seed, kernel="pallas",
                        lambda_mode="local", stats_approx_div=True,
                        dma_gather_min_l=16384)
        run(cfg, data_res, "resident_1Mx32K", args.steps_res, False,
            packed_dev=pk_dev, theta=theta_res)
        del pk_dev, data_res, eval_rows

    if not args.skip_stream:
        packed, ents, theta, sim_s = load_or_build(args.seed)
        out["sim_s"] = round(sim_s, 1)
        data_str = GenotypeData(
            n=N, l=L_STREAM, packed=packed, **ents)
        cfg = SVIConfig(n=N, l=L_STREAM, k=K,
                        batch_size=min(args.batch_str, L_STREAM // 2),
                        rfreq=100,
                        seed=args.seed, kernel="pallas",
                        lambda_mode="local", stats_approx_div=True,
                        snp_group=64)
        run(cfg, data_str, "stream_1Mx100K", args.steps_str, True,
            theta=theta)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
