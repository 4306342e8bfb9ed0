"""TPU smoke bench: the flagship kernel geometry in <60 s.

VERDICT r2 weak #2: round 2 changed the hot kernel and the headline
bench was only re-run at the round boundary, where it turned out to
CRASH (scoped-VMEM OOM). This script runs bench.py at BENCH_L=65536 —
same B=4096 x W=640 kernel geometry as the L=1M flagship (the kernel
never sees L; only the gather and lambda scatter do) — and appends
rc + upd/s + git rev to benchmarks/results/smoke_log.jsonl.

Run it after every kernel-touching commit:
    python benchmarks/smoke_bench.py
Exit code = bench.py's exit code, so it works as a gate.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "benchmarks", "results", "smoke_log.jsonl")


def main():
    env = dict(os.environ,
               BENCH_L=os.environ.get("BENCH_L", "65536"),
               BENCH_STEPS=os.environ.get("BENCH_STEPS", "50"),
               BENCH_BASE_STEPS="1")
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       env=env, capture_output=True, text=True, cwd=ROOT,
                       timeout=900)
    wall = round(time.time() - t0, 1)
    parsed = None
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
                         capture_output=True, text=True).stdout.strip()
    rec = {"utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "git": rev, "rc": p.returncode, "wall_s": wall,
           "bench_l": int(env["BENCH_L"]), "result": parsed,
           "err_tail": "" if p.returncode == 0 else p.stderr[-500:]}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    sys.exit(p.returncode)


if __name__ == "__main__":
    main()
