"""Source/sink connectors beyond parquet: CSV and JSON round-trips.

The reference's only formats are its custom binary block files and a
text sink (SURVEY.md §2.2 "File formats/connectors"); the engine
surface adds the standard Spark readers/writers. Each round-trip
query writes a table out through the connector and reads it back, so
the oracle (reading the original parquet) proves the connector
preserves content exactly — schema, values, nulls.

Sinks write under ``.tmp_io/`` inside the repo (test scratch; the
driver's read-only testdata is never touched).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table

# WAP publish bookkeeping: a version dir gains the marker file the
# instant it is published (underscore prefix => invisible to Spark's
# directory scans and to *.parquet globs); _gc_old_versions treats
# unmarked dirs as in-progress and leaves them alone until they are
# old enough to be crash leftovers.
_PUBLISH_MARKER = "_PUBLISHED"
_STALE_STAGING_SECS = 24 * 3600

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".tmp_io")


def _scratch(name: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    return os.path.join(_SCRATCH, name)


@query(
    "q_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source: write nation as headered CSV, read it back
    with an explicit schema. Oracle reads the original parquet — the
    round-trip must be lossless."""
    path = _scratch("nation_csv")
    nation = read_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("header", True).csv(path)
    return (
        spark.read.option("header", True)
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .csv(path)
    )


@query(
    "q_json_roundtrip",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source round-trip on region."""
    path = _scratch("region_json")
    region = read_table(spark, sf_dir, "region")
    region.write.mode("overwrite").json(path)
    return (
        spark.read.schema("r_regionkey int, r_name string").json(path)
    )


@query(
    "q_orc_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS acctbal FROM supplier",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round-trip on supplier."""
    path = _scratch("supplier_orc")
    supplier = read_table(spark, sf_dir, "supplier")
    supplier.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.select(
        "s_suppkey", "s_name", "s_nationkey",
        F.round("s_acctbal", 2).alias("acctbal"),
    )


@query(
    "q_partitioned_write",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders WHERE year(o_orderdate) = 1997
    GROUP BY o_orderpriority
    """,
)
def q_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned read.

    Writes orders partitioned by order year, then reads back ONE
    partition — the scan touches only that directory (partition
    pruning, the at-rest layout that makes 100 TB scans affordable;
    the reference's block-extent header pruning, O2/P2, is the same
    idea hand-rolled)."""
    path = _scratch("orders_by_year")
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    (
        orders.write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "q_binaryfile_source",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < 20
    """,
)
def q_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the scan path multimodal corpora use
    (image/audio blobs as whole files). Fixture: the first 20 document
    payloads written as ``doc_<id>.bin`` (driver-side, test scaffolding
    only — at scale the files already exist in object storage). The
    read is the real distributed path: one task per file,
    ``pathGlobFilter`` pruning, doc_id recovered from the file path,
    content hashed JVM-side. Oracle hashes the same payloads from the
    documents table."""
    path = _scratch("docs_bin")
    os.makedirs(path, exist_ok=True)
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
        .collect()
    )
    for row in docs:
        with open(os.path.join(path, f"doc_{row['doc_id']}.bin"), "wb") as f:
            f.write(row["text"].encode("utf-8"))
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.length("content").cast("bigint").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
    )


@query(
    "q_xml_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source round-trip on nation (Spark 4's built-in XML
    data source — rowTag records, schema-on-read). The comment column
    is dropped before writing: XML escaping round-trips free text,
    but the oracle projection keeps the key columns deterministic."""
    path = _scratch("nation_xml")
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.write.format("xml").option("rowTag", "nation").mode(
        "overwrite"
    ).save(path)
    return (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .load(path)
    )


@query(
    "q_text_source",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text source + regex field extraction: orders exported as
    pipe-delimited lines, read back with ``spark.read.text`` and
    parsed JVM-side (regexp_extract — no Python in the parse path).
    This is the classic log-file ingestion shape: schema imposed at
    read time over an unstructured line source."""
    path = _scratch("orders_txt")
    orders = read_table(spark, sf_dir, "orders")
    orders.select(
        F.concat_ws(
            "|",
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.format_number(F.col("o_totalprice"), 2),
        ).alias("value")
    ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", r"^(\d+)\|", 1).cast("bigint").alias(
            "o_orderkey"
        ),
        F.regexp_extract("value", r"^\d+\|([A-Z])\|", 1).alias(
            "o_orderstatus"
        ),
        F.regexp_replace(
            F.regexp_extract("value", r"\|([\d,]+\.\d{2})$", 1), ",", ""
        ).cast("double").alias("o_totalprice"),
    )
    return parsed.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def write_balanced(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    order_cols: list | None = None,
    n_rows: int | None = None,
) -> int:
    """Write parquet with uniformly-sized output files; returns the
    file count.

    The two production failure modes this fixes at 100 TB: thousands
    of KB-sized files per partition (shuffle.partitions-shaped
    output destroys downstream scan planning and NameNode/catalog
    metadata) and single multi-GB files (no read parallelism,
    stragglers on re-ingest). One count() pass sizes the job, then
    either ``repartition(k)`` (round-robin, uniform by construction)
    or — when ``order_cols`` is given — ``repartitionByRange`` so
    files are also range-clustered for min/max skipping, with
    ``maxRecordsPerFile`` as the hard upper bound against range
    skew. The count is one extra scan over the input; on a real
    pipeline the row count usually already exists (Observation /
    previous stage metrics) and can be passed through instead — the
    repartition + bounded-write shape is the point.

    File-count contract: between k and 2k where k = ceil(n/target)
    — round-robin spreads rows within ±(input partitions/2) per
    task, so a task marginally over target splits one extra file;
    every file is hard-capped at target rows.
    """
    import math

    n = df.count() if n_rows is None else n_rows
    k = max(1, math.ceil(n / target_rows_per_file))
    if order_cols:
        # sortWithinPartitions is load-bearing for the clustering
        # contract: repartitionByRange only ROUTES rows — within a
        # partition they sit in shuffle-arrival order, so when
        # maxRecordsPerFile rolls an oversized partition into a
        # second file, unsorted rows would give both files the full
        # key span (min/max skipping defeated exactly in the
        # range-skew case the cap exists for).
        shaped = df.repartitionByRange(k, *order_cols).sortWithinPartitions(
            *order_cols
        )
    else:
        shaped = df.repartition(k)
    (
        shaped.write.option("maxRecordsPerFile", target_rows_per_file)
        .mode("overwrite")
        .parquet(path)
    )
    # file count from listing metadata — no job over the rows
    return len(df.sparkSession.read.parquet(path).inputFiles())


def write_audit_publish(
    df: DataFrame,
    path: str,
    audits: dict,
    target_rows_per_file: int = 1_000_000,
    order_cols: list | None = None,
    n_rows: int | None = None,
) -> dict:
    """Write-Audit-Publish (the Netflix/Iceberg WAP pattern): write
    to a HIDDEN staging directory beside the target (dot-prefixed,
    so Hadoop-style listings and parent-level globs skip it), run
    every audit against the STAGED FILES AS READERS WILL SEE THEM
    (read back from disk — not the in-memory frame, so codec/schema/
    write bugs are also caught), then publish. On audit failure —
    including an audit that RAISES — the staging data is removed and
    whatever was previously published stays untouched and readable.

    ``audits`` maps name -> callable(DataFrame) -> bool over the
    staged read-back. Returns the audit results dict on success;
    raises ValueError naming the failing audits otherwise. Pass
    ``n_rows`` when the row count is already known (pipeline
    metrics) to skip write_balanced's sizing scan.

    Publish semantics on this local FS: once ``path`` is managed by
    this function it is a SYMLINK to a hidden versioned directory,
    and publishing is one atomic rename of a prepared symlink —
    readers can never observe a missing or half-written ``path``.
    The one exception is the FIRST publish over a pre-existing REAL
    directory (not created by this function): that transition uses
    a two-rename swap with a sub-millisecond window where ``path``
    is absent — unavoidable with POSIX renames; at cluster scale
    the publish step is a catalog pointer swap (Iceberg snapshot
    commit) and the write/audit stages are identical.

    Old versions are reclaimed with a one-publish grace period
    (``_gc_old_versions``): a reader that resolved the previous
    symlink target before the flip — e.g. a Spark scan mid-job
    during ``compact_parquet_dir`` — finishes against the retained
    prior version; only generations at least two publishes old are
    deleted. The Iceberg analogue is expire_snapshots(retain_last=2).
    """
    import shutil
    import uuid

    parent = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(path)
    tag = uuid.uuid4().hex[:12]
    version = os.path.join(parent, f".{base}.v-{tag}")
    try:
        write_balanced(
            df,
            version,
            target_rows_per_file,
            order_cols=order_cols,
            n_rows=n_rows,
        )
        spark = df.sparkSession
        staged = spark.read.parquet(version)
        results = {
            name: bool(fn(staged)) for name, fn in audits.items()
        }
    except BaseException:
        shutil.rmtree(version, ignore_errors=True)
        raise
    failed = sorted(n for n, ok in results.items() if not ok)
    if failed:
        shutil.rmtree(version, ignore_errors=True)
        raise ValueError(
            f"write_audit_publish to {path!r} rejected by audits "
            f"{failed}; previously published data is untouched"
        )
    # Record the OUTGOING target before the flip: the GC's grace slot
    # is this explicit pointer, not an mtime ranking — so neither a
    # concurrent publisher's staging dir nor a marked-but-never-
    # current crash leftover can displace the one version in-flight
    # readers may still be scanning.
    prev_target = (
        os.path.realpath(path)
        if os.path.islink(path) or os.path.exists(path)
        else None
    )
    if os.path.islink(path) or not os.path.exists(path):
        # atomic publish: rename a prepared symlink over the old one
        tmplink = os.path.join(parent, f".{base}.lnk-{tag}")
        os.symlink(version, tmplink)
        os.replace(tmplink, path)
    else:
        # pre-existing real directory: one-time two-rename takeover
        replaced = os.path.join(parent, f".{base}.replaced-{tag}")
        os.rename(path, replaced)
        os.symlink(version, path)
        shutil.rmtree(replaced, ignore_errors=True)
    # Mark AFTER the flip: a marked dir therefore WAS current at some
    # point, so "marked and now neither current nor prev" provably
    # means >= 2 publishes old — immediately reclaimable. A crash
    # before the marker leaves the current dir unmarked, which is
    # harmless: GC always skips the current target, and the next
    # publish protects it as prev.
    with open(os.path.join(version, _PUBLISH_MARKER), "w") as fh:
        fh.write(tag)
    # Persist the grace pointer atomically (temp + rename).
    prevfile = os.path.join(parent, f".{base}.gc-prev")
    tmpprev = prevfile + f".tmp-{tag}"
    with open(tmpprev, "w") as fh:
        fh.write(prev_target or "")
    os.replace(tmpprev, prevfile)
    # GRACE-PERIOD GC, not immediate deletion: a reader that resolved
    # the old symlink target before the flip (a Spark scan mid-job)
    # must not hit FileNotFound. The immediately-previous version
    # survives one publish cycle; generations older than that are
    # reclaimed — the local-FS analogue of Iceberg's
    # expire_snapshots(retain_last=2).
    _gc_old_versions(parent, base, current=os.path.realpath(path))
    return results


def _gc_old_versions(parent: str, base: str, current: str,
                     keep_prior: int = 1) -> None:
    """Delete stale ``.{base}.v-*`` version dirs, keeping the current
    publish target plus the ``keep_prior`` most recently modified
    non-current PUBLISHED versions (in-flight readers of the previous
    snapshot finish undisturbed; versions two publishes old are
    reclaimed).

    The grace slot is the EXPLICIT ``.{base}.gc-prev`` pointer the
    publisher records at flip time — the dir that actually WAS the
    symlink target immediately before the current one — never an
    mtime ranking (which a concurrent publisher's staging dir, a
    marked-but-never-current crash leftover, or a pre-marker-era
    version could displace). Beyond {current, prev}: dirs with the
    ``_PUBLISHED`` marker were current once and are now >= 2
    publishes old — reclaimed immediately; unmarked dirs are a
    writer's in-progress staging (protected) until
    ``_STALE_STAGING_SECS`` old, after which they are crash
    leftovers (a successful publish marks, a failed one rmtrees)
    and are swept. ``keep_prior`` retains that many additional
    most-recent marked versions beyond the explicit prev (0 by
    default semantics is covered by the pointer itself)."""
    import shutil
    import time

    keep = {current}
    prevfile = os.path.join(parent, f".{base}.gc-prev")
    try:
        with open(prevfile) as fh:
            recorded = fh.read().strip()
        if recorded:
            keep.add(os.path.realpath(recorded))
    except OSError:
        pass  # first-ever publish, or pre-pointer layout

    prefix = f".{base}.v-"
    published, unmarked = [], []
    for name in os.listdir(parent):
        if not name.startswith(prefix):
            continue
        full = os.path.join(parent, name)
        if os.path.realpath(full) in keep:
            continue
        try:
            mtime = os.path.getmtime(full)
        except OSError:
            continue  # concurrently GC'd by another publisher
        if os.path.exists(os.path.join(full, _PUBLISH_MARKER)):
            published.append((mtime, full))
        else:
            unmarked.append((mtime, full))
    published.sort(reverse=True)
    extra = max(keep_prior - 1, 0)  # prev pointer already holds slot 1
    for _, full in published[extra:]:
        shutil.rmtree(full, ignore_errors=True)
    cutoff = time.time() - _STALE_STAGING_SECS
    for mtime, full in unmarked:
        if mtime < cutoff:
            shutil.rmtree(full, ignore_errors=True)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    order_cols: list | None = None,
) -> tuple[int, int]:
    """Small-files maintenance: rewrite a parquet directory into
    uniformly-sized files (optionally range-clustered) — the
    compaction job every long-running ingest pipeline schedules,
    because streaming/micro-batch sinks accrete KB-sized files that
    destroy scan planning and catalog metadata at 100 TB.

    Runs THROUGH ``write_audit_publish`` with a row-count-preserved
    audit, so concurrent readers never observe a half-compacted
    directory and a failed rewrite can never lose rows. Returns
    (files_before, files_after)."""
    before_df = spark.read.parquet(path)
    files_before = len(before_df.inputFiles())
    n_before = before_df.count()
    write_audit_publish(
        before_df,
        path,
        {"row_count_preserved": lambda d: d.count() == n_before},
        target_rows_per_file=target_rows_per_file,
        order_cols=order_cols,
        n_rows=n_before,  # reuse the count — no second sizing scan
    )
    files_after = len(spark.read.parquet(path).inputFiles())
    return files_before, files_after
