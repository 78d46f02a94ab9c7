"""Two-parallelism scaling evidence (BASELINE.json north rule).

The sandbox has no multi-executor cluster, so per the task contract the
N vs 4N executor criterion is evidenced by running the identical
pipeline on identical input at local[8] and local[32] in fresh JVMs.

Methodology (this box's CPU weather varies over time, and its 32
hardware threads share memory bandwidth / SMT pipes):

* rounds are INTERLEAVED (8, 32, 8, 32, ...) so both levels see the
  same ambient load; min per level is reported;
* a pure-CPU multiprocessing burn is measured at both levels in the
  same window — that ratio is the box's *hardware ceiling* for 8→32
  scaling (≈3-3.5x, not 4x, because of SMT);
* reported: raw efficiency  eff = (T_8 / T_32) / 4   and
  hardware-normalized efficiency  eff_hw = (T_8 / T_32) / hw_ratio.

Writes/updates BENCH.md.  Usage: python3 tools/bench_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUNDS = int(os.environ.get("SKEWER_SCALING_ROUNDS", "3"))

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
t0 = time.monotonic()
n = run_flat(spark, inp, f"{{work}}/out")
dt = time.monotonic() - t0
import shutil; shutil.rmtree(work, ignore_errors=True)
print(json.dumps({{"cpus": cpus, "sec": round(dt, 2), "rows": n}}))
spark.stop()
"""


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def hw_ratio_sample(work: int = 4_000_000) -> float:
    """Pure-CPU 8-vs-32-process throughput ratio (the hardware ceiling)."""
    rates = {}
    for procs in (8, 32):
        t0 = time.monotonic()
        with mp.Pool(procs) as p:
            p.map(_burn, [work] * procs * 4)
        rates[procs] = (procs * 4 * work) / (time.monotonic() - t0)
    return rates[32] / rates[8]


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="skewer_scaling_", dir=base)
    inp = os.path.join(work, "transcripts")

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

    results: dict = {}
    hw_ratios = []
    runner = RUNNER.format(repo=REPO)
    try:
        for rnd in range(ROUNDS):
            for cpus in (8, 32):
                out = subprocess.run(
                    [sys.executable, "-c", runner, str(cpus), inp],
                    check=True, capture_output=True, text=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                print(f"round {rnd}: {r}", flush=True)
                if cpus not in results or r["sec"] < results[cpus]["sec"]:
                    results[cpus] = r
            hw_ratios.append(hw_ratio_sample())
            print(f"round {rnd}: hw 8->32 ratio {hw_ratios[-1]:.2f}", flush=True)
    finally:
        import shutil
        shutil.rmtree(work, ignore_errors=True)

    t8, t32 = results[8]["sec"], results[32]["sec"]
    n = results[8]["rows"]
    hw = max(hw_ratios)
    eff = (t8 / t32) / 4.0
    eff_hw = (t8 / t32) / hw
    rps8, rps32 = round(n / t8), round(n / t32)
    print(f"efficiency raw={eff:.3f} hw-normalized={eff_hw:.3f} "
          f"(hw ceiling {hw:.2f}x)")

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    section = f"""
## Scaling evidence (local[8] vs local[32], {stamp})

Sandbox proxy for the N vs 4N executor criterion: identical end-to-end
pipeline (parse → enrich → route → routed table → fan-out sinks →
aggregates) on the identical {n:,}-turn deterministic transcript
table, fresh JVM per run, {ROUNDS} interleaved rounds (8, 32, 8, 32, ...),
min per level.  A pure-CPU calibration burn measured in the same window
shows this VM's 32 hardware threads deliver **{hw:.2f}x** the
throughput of 8 (SMT / shared memory bandwidth), which bounds any
job's achievable 8→32 ratio below the nominal 4x.

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[8]  (N)  | {t8:.2f} | {rps8:,} |
| local[32] (4N) | {t32:.2f} | {rps32:,} |

* raw efficiency  = (T_8 / T_32) / 4    = **{eff:.3f}**
* hw-normalized   = (T_8 / T_32) / {hw:.2f} = **{eff_hw:.3f}**  (target >= 0.8)

On a real 4N-executor cluster the denominator is the nominal 4 with
independent memory buses and scaling-out disks; the hw-normalized
figure is the sandbox-faithful estimate of that setting.
"""
    bench_md = os.path.join(REPO, "BENCH.md")
    header = "# BENCH — skewer_spark throughput\n"
    existing = header
    if os.path.exists(bench_md):
        existing = open(bench_md).read()
        cut = existing.find("## Scaling evidence")
        if cut >= 0:
            existing = existing[:cut].rstrip() + "\n"
    with open(bench_md, "w") as f:
        f.write(existing + section)
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()
