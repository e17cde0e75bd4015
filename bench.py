"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}.

Mirrors the reference's op_perftest protocol
(/root/reference/src/queries.cpp:13-61): one untimed warmup pass per
query, then N_RUNS timed runs; per query we report q50 (the headline
number in "queries") plus avg/q50/q90/q95 in "extra.quantiles" — the
same quantile surface queries.cpp emits. A forced JVM GC runs before
each timed run: repeated shuffle-heavy jobs otherwise degrade until
ContextCleaner releases stale shuffle/broadcast state (see
dint_spark/session.py), which would measure allocator pressure, not
the query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference parity: op_perftest times 10 runs after an untimed warmup
# (/root/reference/src/queries.cpp:13). With 3 runs q90/q95 degenerated
# to max-of-3 (round-2 ADVICE) and masked a 7× regression once.
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "10"))


def _quantile(xs: list[float], q: float) -> float:
    """Nearest-rank quantile (matches the reference's integer-index pick,
    queries.cpp:25-33) — robust for the tiny N_RUNS sample."""
    s = sorted(xs)
    i = min(len(s) - 1, max(0, round(q * (len(s) - 1))))
    return s[i]


# Co-tenant noise guard: this host's wall times inflate up to ~1.4-3×
# when neighbor VMs load the machine (measured twice across rounds on
# operators whose code had not changed). A bench emitted under load is
# not comparable round-over-round, so the run is annotated — and, when
# SPARK_GRAFT_BENCH_STRICT=1, refused — if the 1-minute load average
# already exceeds LOAD_NOISE_THRESHOLD before Spark even starts.
LOAD_NOISE_THRESHOLD = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "2.0"))


def _host_load() -> "float | None":
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    load_start = _host_load()
    noisy_start = load_start is not None and load_start > LOAD_NOISE_THRESHOLD
    if noisy_start and os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
        print(
            json.dumps(
                {
                    "metric": "headline_query_suite_seconds",
                    "value": None,
                    "unit": "sec",
                    "error": f"host load {load_start} > {LOAD_NOISE_THRESHOLD} "
                             "at start (strict mode): refusing a noise-inflated bench",
                }
            )
        )
        sys.exit(3)

    from dint_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("dint_spark_bench")

    t_build0 = time.perf_counter()
    from dint_spark.engine import get_index

    idx = get_index(spark, sf_dir)  # builds + caches postings/docs/vocab/term_meta
    n_postings = idx.postings.count()
    t_build = time.perf_counter() - t_build0

    headline = [
        "ft_and",
        "ft_or",
        "ft_ranked_or",
        "ft_ranked_and",
        "ft_wand",
        "ft_maxscore",
        "ft_term_meta",
    ]
    qs = E.queries()
    timings: dict[str, float] = {}
    quantiles: dict[str, dict] = {}
    total = 0.0
    for name in headline:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warmup (plan + cache touch), untimed
        runs: list[float] = []
        for _ in range(N_RUNS):
            spark._jvm.System.gc()  # measure the query, not stale JVM state
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        med = _quantile(runs, 0.5)
        timings[name] = round(med, 4)
        quantiles[name] = {
            "avg": round(statistics.fmean(runs), 4),
            "q50": round(med, 4),
            "q90": round(_quantile(runs, 0.9), 4),
            "q95": round(_quantile(runs, 0.95), 4),
            "runs": N_RUNS,
        }
        total += med

    # north-rule headline: queries/sec for the 16-query ranked BM25 batch
    from dint_spark.queryset import QUERY_SET

    n_queries = len(QUERY_SET)
    ranked_qps = n_queries / timings["ft_ranked_or"] if timings["ft_ranked_or"] else 0.0

    # decode-fraction evidence (block_profiler analog, ref
    # block_profiler.hpp:9-64): fraction of handed blocks the WAND
    # kernels actually decode on THIS corpus. The driver sf corpora are
    # ε-flat (every term dense → idf clamped → scores tie), so ~1.0 here
    # is the kernel CORRECTLY routing to the vectorized exhaustive path;
    # the pruning numbers live in BENCH/wand_pruning.json (Zipf corpus).
    from pyspark.sql import functions as F

    from dint_spark.engine import get_block_index, get_norm_slices, get_universe
    from dint_spark.operators.wand_shard import wand_sharded_decode_stats

    from dint_spark.queryset import queries_df

    bidx, codec = get_block_index(spark, sf_dir, "single_packed_dint")
    st = (
        wand_sharded_decode_stats(
            idx, bidx, codec, queries_df(spark),
            idx.num_docs, get_norm_slices(spark, sf_dir),
            universe=get_universe(spark, sf_dir),
        )
        .agg(
            F.sum("blocks_total").alias("t"),
            F.sum("blocks_docs_decoded").alias("d"),
            F.sum("blocks_freqs_decoded").alias("f"),
        )
        .first()
    )
    decode_stats = {
        "blocks_handed": int(st["t"]),
        "docs_decoded_fraction": round(st["d"] / st["t"], 3) if st["t"] else None,
        "freqs_decoded_fraction": round(st["f"] / st["t"], 3) if st["t"] else None,
        "note": "eps-flat driver corpus: exhaustive routing expected; "
                "Zipf pruning evidence in BENCH/wand_pruning.json",
    }

    load_end = _host_load()
    out = {
        "metric": "headline_query_suite_seconds",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extra": {
            "host_load_1m_start": load_start,
            "host_load_1m_end": load_end,
            # keyed on START load only: by the end of a local[32] run the
            # 1-minute average reflects the bench's own executor threads
            # (self-load), which is expected, not co-tenant noise
            "noise_suspect": noisy_start,
            "index_build_sec": round(t_build, 4),
            "n_postings": n_postings,
            "num_docs": idx.num_docs,
            "ranked_or_qps": round(ranked_qps, 2),
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "quantiles": quantiles,
            "decode_stats": decode_stats,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
