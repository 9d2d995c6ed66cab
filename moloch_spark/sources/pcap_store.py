"""Packet blob store — the capture pcap-writer analog (writer-simple.c,
writer-s3.c re-expressed as a columnar object-store layout).

Packets land in day-partitioned parquet with payloads as a binary
column. Rotation by `maxFileSizeG` (capture/config.c:515) maps to
Spark's maxRecordsPerFile: day partition = index rotation, record cap =
file rotation within the day. The layout is object-store-ready (S3 =
writer-s3) and is the "cold" blob layer hunts and pcap export read."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PARTITION_COL = "capture_day"


def write_packet_blobs(
    packets: DataFrame,
    path: str,
    *,
    ts_col: str = "ts",
    mode: str = "append",
    max_records_per_file: int | None = 1_000_000,
) -> None:
    """Day-partitioned, rotation-capped blob write.

    Repartition on the day first so each task owns whole partitions
    (same small-files rationale as write_sessions); maxRecordsPerFile
    then rotates within a day exactly like maxFileSizeG rotates capture
    files.
    """
    w = (
        packets.withColumn(
            PARTITION_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd")
        )
        .repartition(F.col(PARTITION_COL))
        .write.mode(mode)
        .partitionBy(PARTITION_COL)
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def read_packet_blobs(
    spark: SparkSession, path: str, *, days: list[str] | None = None
) -> DataFrame:
    """Partition-pruned read: a day list (from a session's packetPos
    file numbers) becomes a PartitionFilters-only scan."""
    df = spark.read.parquet(path)
    if days:
        df = df.filter(F.col(PARTITION_COL).isin(days))
    return df
