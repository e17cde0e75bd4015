"""B5 prefix-packing quantification (round-1/2 carryover, VERDICT item 10).

The reference's pack_policy (ref:include/dint/dictionary_building_utils.hpp:
241-293) stores only MAXIMAL dictionary entries: an entry that is a
strict prefix of a longer entry is packed away (represented by an
offset into the longer one). This tool measures what that would save
for OUR learned dictionaries, against three layouts:

  unpacked_fixed   : the reference's in-RAM layout — (capacity)×16 u32
                     matrix rows + size word per entry;
  unpacked_tight   : Σ 4·size(entry) bytes (variable-length rows — what
                     our Parquet model table stores logically);
  packed_tight     : maximal entries at 4·size bytes + 4 bytes
                     (offset,len ref) per packed-away prefix entry;
  parquet_actual   : on-disk bytes of the saved model table (Parquet
                     dictionary+RLE encodings doing their own packing).

Prefix detection uses the sorted-order property: an entry that is a
prefix of ANY other entry is a prefix of its immediate lexicographic
successor — O(K log K) instead of the reference's O(K²) scan.

Usage: python tools/pack_report.py [model_dir]
       (default /tmp/dint_scaling/shared_index/dint_model — the 50k-doc
        scaling corpus model; falls back to learning on sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def pack_stats(patterns: list[np.ndarray]) -> dict:
    key = [tuple(int(x) for x in p) for p in patterns]
    order = sorted(range(len(key)), key=lambda i: key[i])
    packed_away = 0
    for a, b in zip(order[:-1], order[1:]):
        ka, kb = key[a], key[b]
        if len(ka) < len(kb) and kb[: len(ka)] == ka:
            packed_away += 1
    n = len(patterns)
    sizes = np.array([len(p) for p in patterns], dtype=np.int64)
    tight = int(4 * sizes.sum())
    # packed: drop the payload of packed-away entries, keep a 4-byte ref
    away_payload = 0
    for a, b in zip(order[:-1], order[1:]):
        ka, kb = key[a], key[b]
        if len(ka) < len(kb) and kb[: len(ka)] == ka:
            away_payload += 4 * len(ka)
    return {
        "entries": n,
        "prefix_packed_away": packed_away,
        "unpacked_fixed_bytes": n * (16 + 1) * 4,
        "unpacked_tight_bytes": tight,
        "packed_tight_bytes": tight - away_payload + 4 * packed_away,
        "packed_saving_pct": round(
            100.0 * (away_payload - 4 * packed_away) / tight, 2
        )
        if tight
        else 0.0,
    }


def main() -> None:
    model_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/tmp/dint_scaling/shared_index/dint_model"
    )
    from dint_spark.session import get_spark

    spark = get_spark("pack_report")
    from dint_spark.build.dint_build import DintModel, learn_dint_model

    if os.path.isdir(model_dir):
        model = DintModel.load(spark, model_dir)
        src = model_dir
    else:
        from dint_spark.engine import get_index

        idx = get_index(spark, "/root/testdata/sf0.1")
        model = learn_dint_model(idx.postings.select("term_id", "doc_id", "tf"))
        src = "sf0.1 (learned)"

    from dint_spark.build import pack as packmod

    out: dict = {"model": src}
    for stream, d in (("docs", model.docs), ("freqs", model.freqs)):
        pats = [d.matrix[i, : int(d.sizes[i])] for i in range(len(d))]
        st = pack_stats(pats)
        # r5: the REAL compacted tables (build/pack.py implements B5 and
        # B6 with losslessness verified in-process here); table bytes =
        # 4·table_size + 4 per entry for the (offset,len) ref word —
        # same accounting as packed_tight above
        for policy in ("pack", "overlap"):
            table, offsets = packmod.pack_table(pats, policy=policy)
            packmod.verify_table(table, offsets)
            # payload = the flat u32 table; refs = one 4-byte
            # (offset,len) word per ORIGINAL entry (every entry is
            # table-addressed in this layout, unlike packed_tight above
            # which keeps non-prefix payloads in place)
            st[f"{policy}_table_payload_bytes"] = int(4 * table.size)
            st[f"{policy}_table_with_refs_bytes"] = int(
                4 * table.size + 4 * len(offsets)
            )
        out[stream] = st
    # actual parquet size of the model table
    tmp = "/tmp/pack_report_model"
    model.save(spark, tmp)
    out["parquet_actual_bytes"] = sum(
        os.path.getsize(os.path.join(tmp, f))
        for f in os.listdir(tmp)
        if f.endswith(".parquet")
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
