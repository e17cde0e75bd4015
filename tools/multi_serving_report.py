"""Serving-latency evidence for the multi_packed chooser (VERDICT r4 #6).

multi_packed_dint compresses the 50k-doc corpus 26.6% smaller on docs
(BENCH/multi_dict_50k.json) — but its decoder walks 12 dictionaries
(2 streams × 6 selector classes) where single walks 2, so the query-time
decode cost of the denser format was unmeasured. This harness builds the
SAME corpus under both codecs (resumable IndexBuilder workdirs) and runs
the sharded WAND / MaxScore batches over each, best-of-N per cell with
both variants interleaved round-robin inside one session window (the
documented co-tenant-noise protocol — BENCH/BASELINE.md), so a host-load
swing hits both codecs equally instead of masquerading as a codec delta.

Writes BENCH/multi_serving_50k.json:
  {single|multi} × {wand,maxscore} × {Qsmall,Qbig} wall/qps,
  bpi per codec, loadavg at start/end.

Usage: python tools/multi_serving_report.py [--docs 50000]
       [--queries 500] [--cpus 8] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(script: str, cpus: int, args: list[str], timeout: int = 3000) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=timeout,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{script} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--queries", type=int, default=500)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/dint_scaling")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    idx = {
        "single": os.path.join(args.workdir, "shared_index"),
        "multi": os.path.join(args.workdir, "shared_index_multi"),
    }
    codec = {"single": "single_packed_dint", "multi": "multi_packed_dint"}

    results: dict = {
        "docs": args.docs,
        "cpus": args.cpus,
        "loadavg_start": round(os.getloadavg()[0], 2),
    }
    for name, path in idx.items():
        b = run_job(
            "jobs/build_index.py", args.cpus,
            ["--corpus", f"synth:{args.docs}", "--out", path,
             "--codec", codec[name]],
        )
        results[f"build_{name}"] = {
            "n_postings": b["index"]["n_postings"],
            "docs_bpi": b["index"]["docs_bpi"],
            "freqs_bpi": b["index"]["freqs_bpi"],
            "wall_sec": b["total_wall_sec"],
        }

    qsizes = {"small": args.queries, "big": 4 * args.queries}
    cells: dict[tuple[str, str, str], list[float]] = {}
    # round-robin interleave: (run) × (op) × (size) × (codec) — each
    # single/multi pair measured back-to-back in the same load window
    for _r in range(args.runs):
        for op in ("wand", "maxscore"):
            for sz, q in qsizes.items():
                for name in ("single", "multi"):
                    r = run_job(
                        "jobs/query_batch.py", args.cpus,
                        ["--index", idx[name], "--op", op,
                         "--queries", str(q), "--repeats", "1"],
                    )
                    cells.setdefault((name, op, sz), []).append(r["wall_sec"])
    for (name, op, sz), walls in cells.items():
        best = min(walls)
        results[f"{name}_{op}_{sz}"] = {
            "queries": qsizes[sz],
            "wall_sec_best": round(best, 3),
            "wall_sec_all": [round(w, 3) for w in walls],
            "qps_best": round(qsizes[sz] / best, 2),
        }
    for op in ("wand", "maxscore"):
        for sz in qsizes:
            s = results[f"single_{op}_{sz}"]["wall_sec_best"]
            m = results[f"multi_{op}_{sz}"]["wall_sec_best"]
            results[f"multi_over_single_{op}_{sz}"] = round(m / s, 3)
    results["loadavg_end"] = round(os.getloadavg()[0], 2)

    out = os.path.join(REPO, "BENCH", "multi_serving_50k.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
