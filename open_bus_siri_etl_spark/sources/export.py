"""Training-shard export: the pipeline tail that materializes a prepared
corpus as N deterministic, internally-shuffled shard files a data loader
can stream.

Builds on the `shuffle_shards` convention (operators/textstats.py): shard =
content-hash(key) % n_shards — uniform scatter, zero RNG state, exactly
reproducible across runs/clusters; within a shard, rows are ordered by the
hash, which IS the shuffle.  The writer repartitions BY the shard column
into exactly n_shards partitions with an in-partition sort, so each shard
directory holds one file whose row order is the shuffled order — one
balanced exchange total, no global sort, no driver involvement.

At 100 TB: n_shards is sized to the loader fleet (thousands), each shard
writes in parallel from its own executor, and `maxRecordsPerFile` caps
file sizes if shards exceed a single-file sweet spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_shard(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    """Deterministic content-hash shard id + intra-shard shuffle key.

    NULL keys are coalesced to a sentinel before hashing so every row lands
    in exactly one of the ``n_shards`` (md5(NULL) is NULL, which would
    otherwise scatter null-keyed rows into a Hive default partition that
    ``read_shard`` can never return).
    """
    h = F.md5(F.coalesce(F.col(key).cast("string"), F.lit("\x00__null_key__")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    ).alias("shard")
    return df.withColumn("_h", h).withColumn("shard", shard)


SHARD_FORMATS = ("parquet", "orc", "json")


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    key: str,
    n_shards: int = 16,
    max_records_per_file: int | None = None,
    file_format: str = "parquet",
) -> None:
    """Materialize ``df`` as ``out_dir/shard=K/`` files, one file per
    shard (unless ``max_records_per_file`` splits it), rows pre-shuffled
    by content hash within each shard.

    ``file_format``: parquet (default), orc, or json(l) — all built-in
    Spark sinks, so a loader fleet that wants ORC stripes or line-JSON
    shards gets them from the same single-exchange plan.
    """
    if file_format not in SHARD_FORMATS:
        raise ValueError(f"file_format must be one of {SHARD_FORMATS}")
    sharded = (
        with_shard(df, key, n_shards)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("_h", key)
        .drop("_h")
    )
    writer = sharded.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.format(file_format).save(out_dir)


def read_shard(spark, out_dir: str, shard: int, file_format: str = "parquet") -> DataFrame:
    """Read one shard (partition-pruned scan — only that directory).

    The JSON source infers its schema by sampling the layout (one pass per
    read); loaders on a hot path should pass the known schema via
    ``spark.read.schema(...)`` themselves or prefer parquet/orc shards.
    """
    return spark.read.format(file_format).load(out_dir).filter(
        F.col("shard") == shard
    )
