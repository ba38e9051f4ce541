"""The reference client, Spark-first: filename-substring search over
directories (Search.cpp:169-307).

Reference behavior reproduced (one deliberate deviation: the reference's
print loop drops the separator between repetitions of the LAST name —
the `i < size-1` check sits inside the per-name count loop,
Search.cpp:296-301 — which reads as a bug; format_output space-joins
uniformly):
* input is (directory, word) pairs — the same word broadcast across all
  argv directories (initiateList, Search.cpp:169-181);
* each directory is listed NON-recursively; '.' and '..' are skipped
  (Search.cpp:210-216);
* entries whose name contains the word (case-sensitive substring,
  Search.cpp:220) are counted per name — names collide across
  directories by design (the key is the base name, Search.cpp:221-224);
* output prints each name `count` times, space-separated, in sorted
  name order (Search.cpp:290-303).

Spark-first shape: the directory listing is a tiny driver-side relation
(the reference also materialized it into IN_ITEMS_VEC up front,
MapReduceFramework.cpp:631); everything after is the flagship
filter→count→orderBy→array_repeat pipeline. On a real corpus the listings
relation would be a file-metadata table (or `binaryFile` scan) instead of
os.listdir — the query below is unchanged.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

USAGE = "usage: search <substring> <dir> [<dir> ...]"


def listings_df(spark: SparkSession, dirs: list[str]) -> DataFrame:
    """(dir, name) relation of non-recursive directory entries."""
    rows = []
    for d in dirs:
        try:
            names = os.listdir(d)  # os.listdir never yields '.'/'..'
        except OSError:
            # The reference silently skips directories whose opendir
            # fails (Search.cpp:210) — match that instead of crashing.
            continue
        for name in names:
            # os.listdir surrogate-escapes undecodable filename bytes
            # (PEP 383); surrogates can't cross the driver->JVM UTF-8
            # boundary, so createDataFrame would crash the whole search
            # on one mangled entry. Re-encode with replacement — the
            # file still lists (the C++ reference strstr's raw bytes;
            # a replacement char is the closest faithful rendering).
            safe = name.encode("utf-8", "surrogateescape").decode("utf-8", "replace")
            rows.append((d, safe))
    return spark.createDataFrame(rows or [("", "")], "dir string, name string").where(
        F.col("dir") != ""
    )


def search(spark: SparkSession, word: str, dirs: list[str]) -> DataFrame:
    """The Search query over a listings relation; returns the ordered
    duplicate-expanded single-column result (`file`)."""
    listings = listings_df(spark, dirs)
    counted = (
        listings.where(~F.col("name").isin(".", ".."))
        .where(F.col("name").contains(word))
        .groupBy(F.col("name").alias("file"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.select(
            F.explode(F.array_repeat(F.col("file"), F.col("cnt").cast("int"))).alias("file")
        )
        .orderBy("file")
    )


def format_output(rows: list) -> str:
    """The reference's print format: space-separated names (Search.cpp:290-303)."""
    return " ".join(r.file for r in rows)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:  # substring + at least one directory (Search.cpp:271-275)
        print(USAGE, file=sys.stderr)
        return 1
    from mapreduce__spark.session import get_spark

    spark = get_spark(app_name="mapreduce__spark-search")
    print(format_output(search(spark, argv[0], argv[1:]).collect()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
