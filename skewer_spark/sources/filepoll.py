"""File source (the reference's file-poll service analog).

``/root/reference/services/filepoll.go:196-225`` tails files matching a
glob and stamps the filename into ``properties["skewer"]["filename"]``.
Batch analog: ``spark.read.text(glob)`` + ``input_file_name()`` as a
derived column, framed one-message-per-line (the LF framing of
``services/network/tcp.go:273-293``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_MESSAGE_SIZE = 65536  # main.max_input_message_size, conf/defaults.go:235


def read_log_files(
    spark: SparkSession,
    glob: str,
    source_type: str = "filepoll",
) -> DataFrame:
    """Log files → transcript-shaped rows.

    conv_id = file path (the 'connection'), turn_idx = line number
    within the file (RELP txnr analog), text = the line.  Oversized
    lines are dropped like the UDP 64 KiB buffer bound.
    """
    from pyspark.sql import Window

    df = (
        spark.read.text(glob)
        .select(
            "value",
            F.col("_metadata.file_path").alias("_file"),
            # file mtime, NOT wall-clock now(): resumed reruns over the
            # same files are byte-equal (the repo's determinism
            # contract — the reference stamps time.Now() here, which a
            # batch engine must not)
            F.col("_metadata.file_modification_time").alias("_mtime"),
        )
        .filter(F.length("value") <= MAX_MESSAGE_SIZE)
    )
    w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
    return df.select(
        F.col("_file").alias("conv_id"),
        (F.row_number().over(w) - 1).alias("turn_idx"),
        F.lit("system").alias("role"),
        F.col("value").alias("text"),
        F.lit("none").alias("tool"),
        F.col("_mtime").alias("ts"),
        F.lit(source_type).alias("source_type"),
    )


def explode_multiline(df: DataFrame, text_col: str = "text", delim: str = "\n") -> DataFrame:
    """LF framing for multi-line turns (makeLFTCPSplit analog):
    one row per line, trimming trailing ``\\r`` like the reference."""
    lines = F.split(F.col(text_col), delim)
    out = df.select(
        "*", F.posexplode(lines).alias("line_idx", "_line")
    ).drop(text_col)
    return out.withColumn("text", F.regexp_replace("_line", "\r$", "")).drop("_line")
