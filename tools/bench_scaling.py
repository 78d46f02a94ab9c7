"""Two-parallelism scaling evidence (BASELINE.json north rule).

The sandbox has no multi-executor cluster, so per the task contract the
N vs 4N executor criterion is evidenced by running the identical
pipeline on identical input at local[8] and local[32] in fresh JVMs,
reporting throughput at both and the scaling efficiency
eff = (T_8 / T_32) / (32 / 8)   (1.0 = perfect, target ≥ 0.8).

Writes/updates BENCH.md.  Usage: python3 tools/bench_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time, tempfile
sys.path.insert(0, {repo!r})
from skewer_spark.session import build_session
from skewer_spark.synth import transcripts_df
from skewer_spark.plans.job import run_flat

cpus = int(sys.argv[1])
inp = sys.argv[2]
spark = build_session(master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
base = "/dev/shm" if os.path.isdir("/dev/shm") else None
work = tempfile.mkdtemp(prefix=f"scal{{cpus}}_", dir=base)
# warm the UDF worker pool / JIT
transcripts_df(spark, 8, 50).write.mode("overwrite").parquet(f"{{work}}/w")
run_flat(spark, f"{{work}}/w", f"{{work}}/wo")
best = None
for i in range(1):
    t0 = time.monotonic()
    n = run_flat(spark, inp, f"{{work}}/out{{i}}")
    dt = time.monotonic() - t0
    best = dt if best is None else min(best, dt)
import shutil; shutil.rmtree(work, ignore_errors=True)
print(json.dumps({{"cpus": cpus, "sec": round(best, 2), "rows": n}}))
spark.stop()
"""


def main() -> None:
    # tmpfs work dir: on a real cluster sink IO bandwidth scales with
    # executors (object storage); single-box spinning disk does not — so
    # measuring the N-vs-4N CPU scaling requires memory-speed IO.
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="skewer_scaling_", dir=base)
    inp = os.path.join(work, "transcripts")

    # generate the shared input once (deterministic; parallelism-neutral)
    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "from skewer_spark.session import build_session\n"
        "from skewer_spark.synth import transcripts_df\n"
        "s = build_session(master='local[32]')\n"
        "s.sparkContext.setLogLevel('ERROR')\n"
        "transcripts_df(s, 2000, 2000, partitions=128).write.parquet(%r)\n"
        "s.stop()\n" % (REPO, inp)
    )
    subprocess.run([sys.executable, "-c", gen], check=True,
                   stderr=subprocess.DEVNULL)

    # INTERLEAVE the two parallelism levels so both see the same
    # ambient load (this box's throughput varies over time); keep the
    # min per config across rounds.
    results = {}
    runner = RUNNER.format(repo=REPO)
    for rnd in range(3):
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, "-c", runner, str(cpus), inp],
                check=True, capture_output=True, text=True,
            )
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            print(f"round {rnd}: {r}")
            if cpus not in results or r["sec"] < results[cpus]["sec"]:
                results[cpus] = r

    t8, t32 = results[8]["sec"], results[32]["sec"]
    n = results[8]["rows"]
    eff = (t8 / t32) / (32 / 8)
    rps8, rps32 = round(n / t8), round(n / t32)
    print(f"efficiency: {eff:.3f}")

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    section = f"""
## Scaling evidence (local[8] vs local[32], {stamp})

Sandbox proxy for the N vs 4N executor criterion: identical end-to-end
pipeline (parse → enrich → route → fan-out sinks → aggregates) on the
identical {n:,}-turn deterministic transcript table, fresh JVM per
parallelism level, min of 2 timed runs after UDF-worker warm-up.

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[8]  (N)  | {t8:.2f} | {rps8:,} |
| local[32] (4N) | {t32:.2f} | {rps32:,} |

**Scaling efficiency = (T_8 / T_32) / (32/8) = {eff:.3f}** (target >= 0.8).
"""
    bench_md = os.path.join(REPO, "BENCH.md")
    header = "# BENCH — skewer_spark throughput\n"
    existing = ""
    if os.path.exists(bench_md):
        existing = open(bench_md).read()
        # drop any previous scaling section
        cut = existing.find("## Scaling evidence")
        if cut >= 0:
            existing = existing[:cut].rstrip() + "\n"
    else:
        existing = header
    with open(bench_md, "w") as f:
        f.write(existing + section)
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()
