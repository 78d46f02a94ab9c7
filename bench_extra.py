"""Round-6 optimization profiler (guide §1: measure first).

NOT the frozen driver bench — bench.py stays untouched.  This harness
isolates individual declared queries (noop sink, min-of-N, ALU+mem burn
stamps bracketing every sample) and captures .explain("formatted") to
plans/r06/<query>_<tag>.txt so plan claims in OPTIMIZATION_r06.md are
checkable without running Spark.

Usage:
    python3 bench_extra.py q_hot_ngrams q_encode_avro        # time them
    python3 bench_extra.py --explain before q_hot_ngrams     # plans only
    python3 bench_extra.py --stages routed                   # stage probe
    python3 bench_extra.py --repeat 5 q_x                    # more samples

Timings print as one JSON line per query: {"q": ..., "samples": [...],
"best": ..., "burn_alu": ..., "burn_mem": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _burns():
    import numpy as np

    t0 = time.monotonic()
    x = 0
    for i in range(5_000_000):
        x += i * i
    alu = time.monotonic() - t0
    a = np.arange(8_000_000, dtype=np.float64)
    t0 = time.monotonic()
    s = 0.0
    for _ in range(3):
        s += float(a.sum())
        a += 1.0
    mem = time.monotonic() - t0
    assert s >= 0.0 and x >= 0
    return round(alu, 3), round(mem, 3)


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def _session():
    from skewer_spark.session import build_session

    spark = build_session(
        app_name="skewer-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def time_queries(spark, names, repeat, explain_tag=None):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    warm_sf = SF_DIR.rstrip("/").rsplit("/", 1)[0] + "/sf0.001"
    if not os.path.isdir(warm_sf):
        warm_sf = None
    for name in names:
        fn = qs[name]
        if explain_tag is not None:
            os.makedirs(PLANS_DIR, exist_ok=True)
            with open(os.path.join(PLANS_DIR, f"{name}_{explain_tag}.txt"), "w") as f:
                f.write(_explain_str(fn(spark, SF_DIR)))
            print(f"# wrote plan {name}_{explain_tag}.txt")
            continue
        spark.sparkContext.setJobDescription(f"warm {name}")
        if warm_sf:
            materialize(fn(spark, warm_sf))
        samples = []
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} sample {i}")
            t0 = time.monotonic()
            materialize(fn(spark, SF_DIR))
            samples.append(round(time.monotonic() - t0, 3))
        alu, mem = _burns()
        print(json.dumps({
            "q": name, "samples": samples, "best": min(samples),
            "burn_alu": alu, "burn_mem": mem,
        }), flush=True)


def stage_probe_routed(spark, repeat):
    """Decompose the _routed_events chain: scan → lines → parse →
    enrich → route → encoders, each materialized with noop."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from skewer_spark.operators.enrich import enrich
    from skewer_spark.operators.parse import parse_transcripts
    from skewer_spark.operators.route import route
    from skewer_spark.sources.events import event_lines, load_events

    def stages():
        ev = load_events(spark, SF_DIR)
        lines = event_lines(ev)
        parsed = parse_transcripts(lines)
        enriched = enrich(parsed)
        routed = route(enriched)
        from skewer_spark.sinks.encoders import encode_json
        from skewer_spark.sinks.wire import (
            encode_avro, encode_protobuf,
        )
        return {
            "scan": ev,
            "lines": lines,
            "parsed": parsed,
            "enriched": enriched,
            "routed": routed,
            "routed+json": routed.select("turn_idx", encode_json().alias("e")),
            "routed+avro": routed.select(
                "turn_idx", F.lower(F.hex(encode_avro())).alias("e")),
            "routed+pb": routed.select(
                "turn_idx", F.lower(F.hex(encode_protobuf())).alias("e")),
        }

    for label, df in stages().items():
        spark.sparkContext.setJobDescription(f"warm stage {label}")
        materialize(df.limit(1))
        samples = []
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"stage {label} sample {i}")
            t0 = time.monotonic()
            materialize(df)
            samples.append(round(time.monotonic() - t0, 3))
        alu, mem = _burns()
        print(json.dumps({
            "stage": label, "samples": samples, "best": min(samples),
            "burn_alu": alu, "burn_mem": mem,
        }), flush=True)


def main():
    args = sys.argv[1:]
    explain_tag = None
    repeat = 3
    stages = None
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--explain":
            i += 1
            explain_tag = args[i]
        elif a == "--repeat":
            i += 1
            repeat = int(args[i])
        elif a == "--stages":
            i += 1
            stages = args[i]
        else:
            names.append(a)
        i += 1
    spark = _session()
    try:
        alu, mem = _burns()
        print(json.dumps({"burn_alu_start": alu, "burn_mem_start": mem}),
              flush=True)
        if stages == "routed":
            stage_probe_routed(spark, repeat)
        if names:
            time_queries(spark, names, repeat, explain_tag)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
