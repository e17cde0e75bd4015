"""Dense sequential ID assignment at scale.

The reference requires *dense* uint32 ids: docIDs in [0, num_docs) used as
array indices (/root/reference/include/ds2i/wand_data.hpp:55-58) and
term-ids as list ordinals (dict_freq_index.hpp:174). A naive
`row_number() OVER (ORDER BY key)` is a single-partition sort — fine at
test scale, fatal at 10^12 rows.

`dense_ids` implements the scale-safe two-level pattern from SURVEY.md §1.5:
range-partition by the ordering key, persist (so both passes observe the
SAME partitioning — RangePartitioner's sampling is not stable across
recomputation), count rows per partition (tiny driver collect: one row per
partition), broadcast the exclusive prefix-sum offsets, then assign
offset + local ordinal inside each sorted partition with mapInPandas.
Total driver traffic: num_partitions integers. No global sort barrier on a
single reducer, no monotonically_increasing_id gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append `id_col` = 0-based dense rank of rows ordered by order_cols.

    Rows must be unique on order_cols (ids would otherwise be assigned
    arbitrarily among duplicates). Returns df columns + id_col (long).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)

    cols = [F.col(c) for c in order_cols]
    part = df.repartitionByRange(num_partitions, *cols).sortWithinPartitions(*cols)
    part = part.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        counts = (
            part.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .count()
            .collect()
        )
        sizes = {r["_pid"]: r["count"] for r in counts}
        offsets: dict[int, int] = {}
        acc = 0
        for pid in range(num_partitions):
            offsets[pid] = acc
            acc += sizes.get(pid, 0)
        bc = spark.sparkContext.broadcast(offsets)

        from pyspark.sql import types as T

        # Fresh StructType — StructType.add mutates in place, and PySpark
        # caches df.schema, so mutating it corrupts `part`'s column list.
        out_schema = T.StructType(
            list(part.schema.fields) + [T.StructField(id_col, T.LongType(), False)]
        )

        def assign(pdf_iter):
            # mapInPandas preserves partition identity & row order within it.
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            base = bc.value[pid]
            for pdf in pdf_iter:
                n = len(pdf)
                pdf = pdf.copy()
                pdf[id_col] = range(base, base + n)
                base += n
                yield pdf

        result = part.mapInPandas(assign, schema=out_schema)
        # NOTE: do NOT coalesce here — a narrow coalesce fuses into the
        # same stage and `assign` would then see the COALESCED partition
        # id, breaking the offset lookup. Callers right-size AFTER a
        # materialization barrier (build_fulltext_index does).
        # Materialization boundary: caller should write/cache before unpersist;
        # we leave the persist in place (small tables) — Spark evicts LRU.
        return result
    except Exception:
        part.unpersist()
        raise
