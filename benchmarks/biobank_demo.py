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
    ap.add_argument("--stream-sharded", action="store_true",
                    help="round-3 phase: resident-sharded 1x1 convergence"
                         " + on-chip streaming==resident prefix check")
    ap.add_argument("--prefix-steps", type=int, default=30)
    ap.add_argument("--prefix-batch", type=int, default=256)
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

    def run(cfg, data, tag, steps, stream, packed_dev=None, theta=None,
            mesh=None):
        meter = StepMeter(cfg.batch_size)
        t0 = time.time()
        if mesh is not None:
            from terastructure_tpu.parallel import fit_sharded

            res = fit_sharded(cfg.replace(max_steps=steps), data,
                              mesh=mesh, stream=stream, callback=meter)
        else:
            res = fit(cfg.replace(max_steps=steps), data, stream=stream,
                      packed=packed_dev, callback=meter)
        th = np.asarray(psd.theta_mean(res.state.gamma))[:N]
        wall = time.time() - t0
        rate = meter.snp_updates_per_s
        rec = dict(
            l=cfg.l, steps=res.steps, converged=res.converged,
            validation_ll=round(res.validation_ll, 6),
            heldout_ll=(round(res.heldout_ll, 6)
                        if res.heldout_ll else None),
            theta_mae_vs_truth=round(mean_abs_theta_error(th, theta), 5),
            wall_s=round(wall, 1))
        if not np.isfinite(rate):   # <2 meter callbacks (short runs):
            # compile- and eval-inclusive — a different metric, marked so
            rec["snp_updates_per_s"] = round(
                res.steps * cfg.batch_size / wall, 1)
            rec["rate_compile_inclusive"] = True
        else:
            rec["snp_updates_per_s"] = round(rate, 1)
        out[tag] = rec
        log(tag, rec)
        return res

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
        run(cfg, data_str,
            f"stream_{N // 1000}Kx{L_STREAM // 1000}K",
            args.steps_str, True, theta=theta)

    if args.stream_sharded:
        _stream_sharded_phase(args, out, run)

    print(json.dumps(out, indent=1))


def _stream_sharded_phase(args, out, run):
    """VERDICT r2 item #4: streaming convergence at N=1M.

    The mesh-sharded streamer is bit-identical to the resident sharded
    step by construction (host replays the device sample schedule —
    proven on the CPU mesh in tests/test_stream.py), so streaming
    convergence is established in two measured parts:

      A. a resident SHARDED (mesh 1x1) fit at N=1M x L=32K runs to its
         patience stop — the quality of record (theta MAE, heldout ll);
      B. a streaming prefix at N=1M x L=16K is compared step-for-step
         against the resident sharded chunk on the SAME matrix — the
         on-hardware bitwise check (the CPU test at scale).

    A full streamed N=1M convergence through the axon tunnel is
    transfer-infeasible (h2d ~0.02 GB/s measured; the converged run
    moves ~steps x B x W/4 bytes) — the projection block records the
    wall-clock bound at the measured host-assembly rate and at a real
    host's >=10 GB/s PCIe, per VERDICT r2 #4's instruction to bound and
    say so.
    """
    import jax
    import numpy as np

    from terastructure_tpu.config import SVIConfig
    from terastructure_tpu.data.dataset import GenotypeData, carve_eval_device
    from terastructure_tpu.data.simulate import simulate_packed_device_resident
    from terastructure_tpu.parallel import mesh as meshlib
    from terastructure_tpu.parallel import sharded
    from terastructure_tpu.parallel.stream import make_sharded_stream_chunk

    mesh = meshlib.make_mesh(meshlib.MeshSpec(ind=1, snp=1),
                             devices=jax.devices()[:1])

    # --- A: resident sharded convergence at 1M x 32K -------------------
    t0 = time.time()
    pk_dev, theta_res = simulate_packed_device_resident(
        N, L_RES, K, seed=args.seed)
    pk_dev, val, held, pool, eval_rows = carve_eval_device(
        pk_dev, N, validation_frac=0.005, heldout_frac=0.005,
        seed=args.seed, max_eval_entries=200_000, eval_snp_pool=2048)
    out["sim_res_s"] = round(time.time() - t0, 1)
    data_res = GenotypeData(
        n=N, l=L_RES, packed=pk_dev, validation=val, heldout=held,
        eval_row_snps=pool, eval_rows_full=eval_rows)
    cfg = SVIConfig(n=N, l=L_RES, k=K, batch_size=min(4096, L_RES // 2),
                    rfreq=100, seed=args.seed, kernel="pallas",
                    lambda_mode="local", stats_approx_div=True,
                    dma_gather_min_l=16384)
    run(cfg, data_res,
        f"resident_sharded1x1_{N // 1000}Kx{L_RES // 1000}K",
        args.steps_res, False, theta=theta_res, mesh=mesh)
    del pk_dev, data_res, eval_rows

    # --- B: streaming prefix == resident sharded, on-chip --------------
    packed_host, ents, theta16, _ = load_or_build(args.seed)
    lpre = packed_host.shape[0]
    cfgp = SVIConfig(n=N, l=lpre, k=K, batch_size=args.prefix_batch,
                     rfreq=args.prefix_steps, seed=args.seed,
                     kernel="pallas", lambda_mode="local",
                     stats_approx_div=True, dma_gather_min_l=lpre)
    plan = sharded.make_plan(cfgp, mesh)
    data_p = GenotypeData(n=N, l=lpre, packed=np.asarray(packed_host),
                          **ents)
    t0 = time.time()
    _, packed_dev = sharded.prepare(cfgp, data_p, mesh)
    jax.block_until_ready(packed_dev)
    out["prefix_h2d_s"] = round(time.time() - t0, 1)

    st_res = sharded.init_sharded_state(cfgp, plan, mesh)
    t0 = time.time()
    st_res = sharded.make_sharded_run_chunk(
        cfgp, plan, mesh, args.prefix_steps)(st_res, packed_dev)
    g_res = np.asarray(jax.device_get(st_res.gamma))
    res_s = time.time() - t0
    del packed_dev

    st_str = sharded.init_sharded_state(cfgp, plan, mesh)
    t0 = time.time()
    st_str = make_sharded_stream_chunk(
        cfgp, plan, mesh, args.prefix_steps)(st_str, packed_host)
    g_str = np.asarray(jax.device_get(st_str.gamma))
    str_s = time.time() - t0

    rel = np.abs(g_str - g_res) / (np.abs(g_res) + 1e-30)
    out["prefix_check"] = dict(
        l=lpre, batch=args.prefix_batch, steps=args.prefix_steps,
        bitwise_equal=bool((g_str == g_res).all()),
        max_rel_diff=float(rel.max()),
        resident_wall_s=round(res_s, 1),
        stream_wall_s=round(str_s, 1))
    log("prefix_check", out["prefix_check"])

    # --- C: full-stream wall-clock bound --------------------------------
    rec = out.get(f"resident_sharded1x1_{N // 1000}Kx{L_RES // 1000}K", {})
    steps = rec.get("steps", 0)
    bytes_per_step = 4096 * (N // 4)
    # measured host batch assembly: 4.6 GB/s (results/README.md, r2)
    assemble_s = bytes_per_step / 4.6e9
    compute_s = 4096 / max(rec.get("snp_updates_per_s") or 1.0, 1.0)
    for label, bw in (("tunnel", max(out.get("h2d_GBps", 0.02), 1e-3) * 1e9),
                      ("pcie10", 10e9)):
        per_step = max(assemble_s, bytes_per_step / bw, compute_s)
        out[f"stream_full_bound_{label}_s"] = round(steps * per_step, 1)
    log("projection:", {k: v for k, v in out.items()
                        if k.startswith("stream_full_bound")})


if __name__ == "__main__":
    main()
