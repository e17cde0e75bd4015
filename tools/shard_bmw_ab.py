"""A/B the shard_block_max serving variants (r5 VERDICT ask #2: the
unattributed ft_wand q50 drift vs the always-on artifact join).

Three arms, interleaved in the same load window, N runs each:

  presharded — round-6 serving default: the artifact pre-joined into a
               materialized sharded block index (engine.get_sharded_blocks);
               the batch plan is term-semi-join → cogroup.
  perbatch   — the r5 serving default: per-batch SortMergeJoin of the
               shard_block_max artifact into the exploded blocks frame.
  none       — no artifact: global block_max_weight, straddle pairs ship.

Writes BENCH/r06/shard_bmw_ab.json.
Usage: python tools/shard_bmw_ab.py [--sf /root/testdata/sf0.1] [--runs 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=10)
    args = ap.parse_args()

    from dint_spark.session import get_spark
    from dint_spark.engine import (
        get_block_index,
        get_index,
        get_norm_slices,
        get_shard_bmw,
        get_sharded_blocks,
        get_universe,
    )
    from dint_spark.operators.wand_shard import (
        maxscore_topk_sharded,
        wand_topk_sharded,
    )
    from dint_spark.queryset import queries_df

    spark = get_spark("shard_bmw_ab")
    idx = get_index(spark, args.sf)
    bidx, codec = get_block_index(spark, args.sf, "single_packed_dint")
    slices = get_norm_slices(spark, args.sf)
    uni = get_universe(spark, args.sf)
    sbmw = get_shard_bmw(spark, args.sf)
    sharded = get_sharded_blocks(spark, args.sf)

    def make(op, arm):
        fn = wand_topk_sharded if op == "wand" else maxscore_topk_sharded
        kw = dict(k=10, universe=uni)
        if arm == "presharded":
            kw["sharded_bidx"] = sharded
        elif arm == "perbatch":
            kw["shard_bmw"] = sbmw
        return fn(idx, bidx, codec, queries_df(spark), idx.num_docs,
                  slices, **kw)

    arms = ["presharded", "perbatch", "none"]
    # identical results across arms first (losslessness of the artifact)
    for op in ("wand", "maxscore"):
        ref = sorted(map(tuple, make(op, arms[0]).collect()))
        for arm in arms[1:]:
            got = sorted(map(tuple, make(op, arm).collect()))
            assert got == ref, (op, arm)

    walls: dict = {op: {a: [] for a in arms} for op in ("wand", "maxscore")}
    for _ in range(args.runs):
        for op in ("wand", "maxscore"):
            for arm in arms:  # interleave cells within the window
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                make(op, arm).collect()
                walls[op][arm].append(round(time.perf_counter() - t0, 3))

    def q50(xs):
        return sorted(xs)[len(xs) // 2]

    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:
        load = None
    out = {
        "sf": args.sf,
        "runs": args.runs,
        "host_load_1m_end": load,
        "arms": {
            op: {
                a: {"walls": walls[op][a], "q50": q50(walls[op][a]),
                    "min": min(walls[op][a])}
                for a in arms
            }
            for op in ("wand", "maxscore")
        },
    }
    os.makedirs(os.path.join("BENCH", "r06"), exist_ok=True)
    with open(os.path.join("BENCH", "r06", "shard_bmw_ab.json"), "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
