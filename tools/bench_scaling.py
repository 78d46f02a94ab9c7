"""Two-parallelism scaling evidence (BASELINE.json north rule).

No multi-executor cluster exists in this sandbox, so the N vs 4N
executor criterion is evidenced with the same job at local[8] vs
local[32] — but this VM's effective CPU grant fluctuates on a timescale
of minutes, so unpaired measurements are noise.  Protocol:

* two RESIDENT SparkSessions (8 and 32 threads, separate JVMs, both
  warmed) run the identical pipeline on identical input in alternating
  back-to-back PAIRS — each pair samples the same weather window;
* per-pair ratio r_k = T8_k / T32_k; report the median and best pair;
* TWO burns sandwiched around every pair calibrate that window's
  hardware ceilings for 8→32: a cache-resident ALU burn (upper,
  ≈ 3-3.5x) and a 64 MB/proc streaming burn (lower, ≈ 2x — shared
  memory buses saturate first); a shuffle-heavy pipeline sits
  between, so the true efficiency is bracketed per pair;
* efficiency raw = r/4, hw-normalized = r/hw_k (conservative: uses
  the ALU ceiling; a real 4N-executor cluster has independent memory
  buses per executor, so its efficiency sits inside the bracket);
* COHERENCE criterion (pre-registered, not outcome-based): a pair is
  valid only if its two T_32 sandwich samples agree within 1.35x and
  its two burn samples agree within 1.35x — disagreement is direct
  evidence the hypervisor grant shifted nonlinearly INSIDE the pair,
  which no first-order correction can cancel (observed: sandwich
  samples 54.9 s vs 14.7 s in one pair).  A pair is ALSO invalid when
  its ratio exceeds the same-window ALU ceiling (× 1.15 tolerance):
  superlinear 8→32 scaling is physically impossible for this pipeline,
  so such a reading means the grant collapsed strictly inside the T_8
  sample and recovered before the next probe (observed 2026-08-22).
  Sampling continues until PAIRS coherent pairs exist or MAX_ATTEMPTS
  runs are spent; incoherent pairs are reported but excluded from the
  median.

Writes/updates BENCH.md.  Usage:
  python3 tools/bench_scaling.py            # 4 pairs, 4M rows
  SKEWER_SCALING_PAIRS=6 python3 tools/bench_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIRS = max(1, int(os.environ.get("SKEWER_SCALING_PAIRS", "4")))
MAX_ATTEMPTS = max(
    PAIRS, int(os.environ.get("SKEWER_SCALING_MAX_ATTEMPTS", "10")))
COHERENCE = float(os.environ.get("SKEWER_SCALING_COHERENCE", "1.35"))
# Superlinearity gate: an 8→32 pipeline ratio cannot legitimately
# exceed the same-window cache-resident ALU ceiling (the
# embarrassingly-parallel best case; the pipeline adds shuffles and a
# serial tail on top).  A ratio above hw_k means the grant collapsed
# strictly INSIDE the T_8 sample and recovered before the next
# sandwich/burn probe — invisible to the three spread checks (observed
# 2026-08-22 04:49 UTC: T_8 119.9 s / 62.3 s vs 28.9 s typical, "eff"
# 3.02 / 1.52 with all spreads green).  Tolerance 1.15 keeps the
# legitimate calm-window pairs that read eff 0.98-1.05.
SUPERLINEAR_TOL = float(
    os.environ.get("SKEWER_SCALING_SUPERLINEAR_TOL", "1.15"))
N_CONVS = int(os.environ.get("SKEWER_SCALING_CONVS", "2000"))
TURNS = int(os.environ.get("SKEWER_SCALING_TURNS", "2000"))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
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
transcripts_df(spark, 8, 50).write.mode("overwrite").parquet(f"{{work}}/w")
run_flat(spark, f"{{work}}/w", f"{{work}}/wo")
# TWO full-size warm-ups: C2 JIT on the real code paths needs big runs
# (observed: run times drop 207s -> 44s -> 19s within one session)
for _w in range(2):
    run_flat(spark, inp, f"{{work}}/warmfull{{_w}}")
    shutil.rmtree(f"{{work}}/warmfull{{_w}}", ignore_errors=True)
print("READY", flush=True)
i = 0
for line in sys.stdin:
    cmd = line.strip()
    if cmd == "quit":
        break
    if cmd == "run":
        i += 1
        out = f"{{work}}/out{{i}}"
        t0 = time.monotonic()
        n = run_flat(spark, inp, out)
        dt = time.monotonic() - t0
        shutil.rmtree(out, ignore_errors=True)
        print(json.dumps({{"sec": round(dt, 2), "rows": n}}), flush=True)
shutil.rmtree(work, ignore_errors=True)
spark.stop()
"""


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _memburn(n: int) -> float:
    # streaming traversal of an array far larger than L3: measures the
    # box's MEMORY-BANDWIDTH scaling, the other end of the ceiling
    # bracket (the pure-Python burn above is cache-resident / ALU-bound)
    import numpy as np

    a = np.arange(n, dtype=np.float64)
    s = 0.0
    for _ in range(3):
        s += float(a.sum())
        a += 1.0
    return s


def _pool_ratio(fn, work: int, reps: int = 3) -> float:
    rates = {}
    for procs in (8, 32):
        t0 = time.monotonic()
        with mp.Pool(procs) as p:
            p.map(fn, [work] * procs * reps)
        rates[procs] = (procs * reps * work) / (time.monotonic() - t0)
    return rates[32] / rates[8]


def hw_ratio_sample(work: int = 3_000_000) -> float:
    """8→32 scaling of a cache-resident ALU burn (upper ceiling)."""
    return _pool_ratio(_burn, work)


def hw_mem_ratio_sample(work: int = 8_000_000) -> float:
    """8→32 scaling of a 64 MB/proc streaming burn (lower ceiling —
    shared memory buses saturate long before 32 threads)."""
    return _pool_ratio(_memburn, work)


class Child:
    def __init__(self, cpus: int, inp: str):
        self.cpus = cpus
        self.proc = subprocess.Popen(
            [sys.executable, "-u", "-c", CHILD.format(repo=REPO),
             str(cpus), inp],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1,
        )

    def _readline(self) -> str:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"child local[{self.cpus}] died")
            line = line.strip()
            if line.startswith("{") or line == "READY":
                return line

    def wait_ready(self) -> None:
        assert self._readline() == "READY"

    def run(self) -> dict:
        self.proc.stdin.write("run\n")
        self.proc.stdin.flush()
        return json.loads(self._readline())

    def quit(self) -> None:
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


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
        "transcripts_df(s, %d, %d, partitions=128).write.parquet(%r)\n"
        "s.stop()\n" % (REPO, N_CONVS, TURNS, inp)
    )
    subprocess.run([sys.executable, "-c", gen], check=True,
                   stderr=subprocess.DEVNULL)

    import shutil
    c8 = Child(8, inp)
    c32 = Child(32, inp)
    pairs = []
    n_rows = None
    try:
        c8.wait_ready()
        c32.wait_ready()
        hw_pre = hw_ratio_sample()
        mem_pre = hw_mem_ratio_sample()
        k = 0
        while k < MAX_ATTEMPTS and sum(1 for p in pairs if p[5]) < PAIRS:
            # SANDWICH design: T32 before AND after the T8 run — the
            # CPU-grant drift is roughly linear on the run timescale,
            # so averaging the two T32 samples cancels it to first
            # order (a plain back-to-back pair puts the window change
            # entirely inside the ratio).  The pure-CPU burn is ALSO
            # sandwiched per pair: when the hypervisor grant collapses
            # the burn ceiling collapses with the pipeline ratio, so
            # eff_k = ratio_k / hw_k stays meaningful — PROVIDED the
            # window held still across the pair, which the coherence
            # checks below test directly.
            r32a = c32.run()
            r8 = c8.run()
            r32b = c32.run()
            hw_post = hw_ratio_sample()
            mem_post = hw_mem_ratio_sample()
            n_rows = r8["rows"]
            t32 = (r32a["sec"] + r32b["sec"]) / 2
            ratio = r8["sec"] / t32
            hw_k = (hw_pre + hw_post) / 2
            mem_k = (mem_pre + mem_post) / 2
            t32_spread = max(r32a["sec"], r32b["sec"]) / max(
                1e-9, min(r32a["sec"], r32b["sec"]))
            hw_spread = max(hw_pre, hw_post) / min(hw_pre, hw_post)
            mem_spread = max(mem_pre, mem_post) / min(mem_pre, mem_post)
            ok = (t32_spread <= COHERENCE and hw_spread <= COHERENCE
                  and mem_spread <= COHERENCE
                  # superlinear = T_8-side grant collapse (see header)
                  and ratio <= hw_k * SUPERLINEAR_TOL)
            hw_pre, mem_pre = hw_post, mem_post
            pairs.append((r8["sec"], t32, ratio, hw_k, ratio / hw_k, ok,
                          mem_k, ratio / mem_k))
            print(f"pair {k}: T8={r8['sec']} T32={t32:.2f} "
                  f"(={r32a['sec']}/{r32b['sec']}) ratio={ratio:.2f} "
                  f"hw={hw_k:.2f} eff={ratio / hw_k:.2f} "
                  f"mem={mem_k:.2f} eff_mem={ratio / mem_k:.2f} "
                  f"{'ok' if ok else 'INCOHERENT'}",
                  flush=True)
            k += 1
    finally:
        c8.quit()
        c32.quit()
        shutil.rmtree(work, ignore_errors=True)

    n_good = sum(1 for p in pairs if p[5])
    good = [p for p in pairs if p[5]]
    if not good:
        # a headline computed from incoherent pairs would record exactly
        # the numbers the protocol declares meaningless — leave BENCH.md
        # untouched and say so
        print(f"NO coherent pairs in {len(pairs)} attempts — the grant "
              "never held still; BENCH.md left unchanged.  Rerun in a "
              "calmer window.")
        sys.exit(3)
    best = max(good, key=lambda p: p[2])
    med_ratio = statistics.median(p[2] for p in good)
    hw = statistics.median(p[3] for p in good)
    # headline = MEDIAN of the per-pair hw-normalized efficiencies over
    # COHERENT pairs (best-pair would cherry-pick a favorable weather
    # window; an incoherent pair measured a moving target and carries
    # no information about the code)
    eff_raw = med_ratio / 4.0
    eff_hw = statistics.median(p[4] for p in good)
    eff_mem = statistics.median(p[7] for p in good)
    med_mem = statistics.median(p[6] for p in good)
    print(f"coherent pairs: {n_good}/{len(pairs)}")
    print(f"best pair: T8={best[0]} T32={best[1]:.2f} ratio={best[2]:.2f}")
    print(f"median ratio={med_ratio:.2f}  hw median={hw:.2f}")
    print(f"efficiency (median) raw={eff_raw:.3f} hw-normalized={eff_hw:.3f}")

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    rows_fmt = f"{n_rows:,}" if n_rows else "?"
    pair_rows = "\n".join(
        f"| {k} | {p[0]:.2f} | {p[1]:.2f} | {p[2]:.2f} | {p[3]:.2f} "
        f"| {p[6]:.2f} | {p[4]:.2f} | {p[7]:.2f} | {'✓' if p[5] else '✗'} |"
        for k, p in enumerate(pairs)
    )

    bench_md = os.path.join(REPO, "BENCH.md")
    existing = "# BENCH — skewer_spark throughput\n"
    history: list[str] = []
    if os.path.exists(bench_md):
        existing = open(bench_md).read()
        cut = existing.find("## Scaling evidence")
        if cut >= 0:
            old_section = existing[cut:]
            existing = existing[:cut].rstrip() + "\n"
            # carry forward the run-history bullets of earlier sessions
            in_hist = False
            for line in old_section.splitlines():
                if line.startswith("### Run history"):
                    in_hist = True
                elif line.startswith("#"):
                    in_hist = False
                elif in_hist and line.startswith("* "):
                    history.append(line)
                elif in_hist and history and line.startswith("  ") \
                        and line.strip():
                    history[-1] += "\n" + line
    history.append(
        f"* {stamp}: {n_good}/{len(pairs)} coherent pairs on {rows_fmt} "
        f"turns — median ratio {med_ratio:.2f}, ALU/bandwidth ceilings "
        f"{hw:.2f}/{med_mem:.2f}, eff bracket "
        f"**[{eff_hw:.2f}, {eff_mem:.2f}]** (per-pair eff: "
        + ", ".join(
            f"{p[4]:.2f}" + ("" if p[5] else "✗") for p in pairs
        )
        + ")"
    )
    hist_block = "\n".join(history)

    section = f"""
## Scaling evidence (local[8] vs local[32], {stamp})

Sandbox proxy for the N vs 4N executor criterion: identical end-to-end
pipeline (parse → enrich → route → routed table → one-pass fan-out →
aggregates) on the identical {rows_fmt}-turn deterministic transcript
table.  Two resident warmed JVMs run back-to-back PAIRS so each pair
samples the same ambient-CPU window (this VM's effective CPU grant
fluctuates by ~2x on a minutes timescale — unpaired numbers are noise).
A pure-CPU calibration burn is sandwiched around every pair and
measures that window's hardware 8→32 ceiling `hw` (SMT + shared memory
bandwidth keep it below the nominal 4x on any single box; a hypervisor
grant collapse drags burn and pipeline down TOGETHER, so the per-pair
normalized efficiency `eff = ratio / hw` stays meaningful in every
window).  COHERENCE (pre-registered validity criterion): a pair counts
only if its two T_32 sandwich samples and each burn's two samples (ALU
and streaming) agree within {COHERENCE:.2f}x — wider spread means the grant shifted
nonlinearly INSIDE the pair, so that pair measured the hypervisor, not
the code — AND its ratio does not exceed the same-window ALU ceiling
× {SUPERLINEAR_TOL:.2f} (superlinear 8→32 scaling is physically impossible for
this pipeline: such a reading means the grant collapsed strictly
inside the T_8 sample and recovered before the next probe); sampling
continues until {PAIRS} coherent pairs exist (max
{MAX_ATTEMPTS} attempts).

TWO ceilings bracket the truth: `hw` is a cache-resident ALU burn
(upper ceiling — assumes the pipeline is pure CPU), `mem` a
64 MB/proc streaming burn (lower ceiling — assumes it is pure memory
bandwidth; shared buses saturate well before 32 threads).  A
shuffle/scan-heavy Spark pipeline sits between, so per pair the true
efficiency lies in [`eff` = ratio/hw, `eff_mem` = ratio/mem].  The
HEADLINE uses the conservative end (`eff`).

| pair | T_8 (s) | T_32 (s) | ratio | hw | mem | eff | eff_mem | coherent |
|---|---|---|---|---|---|---|---|---|
{pair_rows}

(T_32 is the mean of the two sandwich samples around each T_8 run —
linear CPU-grant drift cancels to first order.)

Best coherent pair: T_8={best[0]:.2f}s ({round((n_rows or 0)/best[0]):,} turns/s) vs
T_32={best[1]:.2f}s ({round((n_rows or 0)/best[1]):,} turns/s).

Headline statistic = the MEDIAN per-pair hw-normalized efficiency over
the {n_good}/{len(pairs)} coherent pairs (median raw ratio
**{med_ratio:.2f}**, best pair {best[2]:.2f} reported for
transparency, not used):

* raw efficiency  = median ratio / 4  = **{eff_raw:.3f}**
* hw-normalized   = median eff        = **{eff_hw:.3f}**  (target ≥ 0.8;
  conservative lower bound — ALU ceiling {hw:.2f})
* mem-normalized  = median eff_mem    = **{eff_mem:.3f}**  (upper bound —
  bandwidth ceiling {med_mem:.2f})

On a real 4N-executor cluster the memory buses and disks scale out with
the executors (each executor brings its own), so the single-box
bandwidth ceiling does not apply there; the true cluster efficiency
sits inside [{eff_hw:.2f}, {eff_mem:.2f}].

### Run history

All scaling sessions ever run, oldest first (the section above always
shows the LATEST run; this list is carried forward verbatim):

{hist_block}
"""
    with open(bench_md, "w") as f:
        f.write(existing + section)
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()
