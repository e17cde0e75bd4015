"""Guide §1 instrumentation probe (NOT the driver bench — bench.py is frozen).

For each headline query: capture .explain("formatted") to plans/r06/,
count the Spark jobs/stages/tasks a single .collect() costs (via the
status tracker), and time a few runs. Prints one JSON line per query.

Usage: python tools/bench_probe.py [out_suffix] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2:] or None

HEADLINE = [
    "ft_and", "ft_or", "ft_ranked_or", "ft_ranked_and",
    "ft_wand", "ft_maxscore", "ft_term_meta",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dint_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("dint_spark_probe")
    sc = spark.sparkContext
    t0 = time.perf_counter()
    from dint_spark.engine import get_index

    idx = get_index(spark, sf_dir)
    idx.postings.count()
    build_s = time.perf_counter() - t0
    parts = {
        "postings": idx.postings.rdd.getNumPartitions(),
        "docs": idx.docs.rdd.getNumPartitions(),
        "vocab": idx.vocab.rdd.getNumPartitions(),
        "term_meta": idx.term_meta.rdd.getNumPartitions(),
    }
    print(json.dumps({"index_build_sec": round(build_s, 2), "partitions": parts}))

    qs = E.queries()
    names = ONLY or HEADLINE
    tracker = sc.statusTracker()
    for name in names:
        fn = qs[name]
        # plan capture
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"/root/repo/plans/r06/{name}_{SUFFIX}.txt", "w") as f:
            f.write(plan)
        # warmup
        fn(spark, sf_dir).collect()
        runs = []
        jobs_per_run = None
        stages_per_run = None
        tasks_per_run = None
        for i in range(5):
            spark._jvm.System.gc()
            j0 = tracker.getJobIdsForGroup(None)
            tp0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_plan = time.perf_counter() - tp0
            t1 = time.perf_counter()
            df.collect()
            runs.append(time.perf_counter() - t1)
            if i == 0:
                j1 = tracker.getJobIdsForGroup(None)
                new_jobs = sorted(set(j1) - set(j0))
                nstages = 0
                ntasks = 0
                for jid in new_jobs:
                    ji = tracker.getJobInfo(jid)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si is not None and si.numTasks > 0:
                            nstages += 1
                            ntasks += si.numTasks
                jobs_per_run = len(new_jobs)
                stages_per_run = nstages
                tasks_per_run = ntasks
        runs.sort()
        print(json.dumps({
            "query": name,
            "plan_build_sec": round(t_plan, 3),
            "collect_med_sec": round(runs[len(runs) // 2], 3),
            "collect_min_sec": round(runs[0], 3),
            "collect_all": [round(r, 3) for r in runs],
            "jobs": jobs_per_run,
            "stages": stages_per_run,
            "tasks": tasks_per_run,
        }))


if __name__ == "__main__":
    main()
