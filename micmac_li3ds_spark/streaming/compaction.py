"""Generation compaction for by-batch-id streaming state directories.

Every streaming job in this package externalizes its accumulated state
as ``<dir>/batch=<k>/part-*.parquet`` — one directory per micro-batch,
written mode=overwrite so a WAL replay is idempotent. On a continuous
feed that layout is O(batches) in FILE COUNT: a year of 30-second
micro-batches is ~1M directories per state dir, and every per-batch
semi-join against the accumulated state must list and plan all of them
— the classic small-files death q_audit_small_files exists to measure
(r15 verdict item 4 named this the one scale gap the streaming family
opened).

``compact_state_dir`` folds the committed batch directories (and the
previous generation, if any) into ONE new generation directory
``<dir>/gen=<g>`` of a few large files, with the same write-then-commit
marker discipline as :class:`~micmac_li3ds_spark.functions.iterate.
DurableLoopState`:

  * the generation's rows carry an extra ``src_batch`` column — the
    batch id each row was first written under. This is what keeps the
    replay-correctness contract exact: ``_read_or_empty(...,
    before_batch=b)`` (state must be STRICTLY EARLIER than the batch
    being processed — the exact-dedup WAL-replay rule) filters the
    generation on ``src_batch < b``, which is bit-identical to the
    batch-dir pruning it replaces.
  * write ``gen=<g>`` first (mode=overwrite — a crashed attempt is
    simply overwritten), THEN create the empty marker
    ``<dir>/_GEN_COMMIT_<g>_<up_to>``. A generation without its marker
    is invisible to readers; marker creation is the atomic commit
    point, and its name records ``up_to`` — readers include only batch
    dirs with ``k >= up_to``, so a crash between commit and prune can
    never double-count a folded batch (the leftover dir is garbage,
    ignored by every reader, removed by the next compaction).
  * prune AFTER the commit: delete the folded ``batch=<k>`` dirs
    (k < up_to) and the superseded older generations + markers.

Readers resolve state as: newest committed generation (if any) +
batch dirs ``k >= up_to`` — see ``resolve_state`` /
``jobs._read_or_empty``. Everything goes through the Hadoop FileSystem
API resolved from the state dir's own scheme, so compaction works on
the object-storage layouts (s3a://, hdfs://) the jobs advertise.

Concurrency contract: one compactor per state dir at a time, run from
outside the stream's foreachBatch (e.g. a scheduled maintenance job).
Compacting MID-FEED is safe with respect to the stream itself: the
stream only ever writes ``batch=<current>`` (never folded — ``up_to``
is capped at the max committed batch id + 1 as listed at compaction
start) and only reads through the generation-aware resolver.

At 100 TB: state rows are small relative to the corpus (fingerprints,
band keys, vectors), so a generation re-write is a seconds-to-minutes
parallel job; ``num_files`` sizes the output (defaults to one file per
``spark.sql.shuffle.partitions`` worth of input dirs, min 1 — callers
with byte-size targets pass an explicit count). File count after
compaction is num_files + O(batches since last compaction), bounded by
compaction cadence instead of feed lifetime.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC_BATCH_COL = "src_batch"
_GEN_RE = re.compile(r"^gen=(\d+)$")
_MARKER_RE = re.compile(r"^_GEN_COMMIT_(\d+)_(\d+)$")


def _fs(spark: SparkSession, path: str):
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(sc._jsc.hadoopConfiguration()), hpath


def list_state(spark: SparkSession, path: str):
    """One listing pass over a state dir. Returns
    ``(batches, gens, markers)`` where ``batches`` maps batch id →
    dir URI, ``gens`` maps generation id → dir URI (committed or not),
    and ``markers`` maps generation id → up_to for COMMITTED
    generations. Missing dir → all empty."""
    fs, hpath = _fs(spark, path)
    batches: dict[int, str] = {}
    gens: dict[int, str] = {}
    markers: dict[int, int] = {}
    if not fs.exists(hpath):
        return batches, gens, markers
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            batches[int(name.split("=", 1)[1])] = st.getPath().toString()
        elif st.isDirectory() and (m := _GEN_RE.match(name)):
            gens[int(m.group(1))] = st.getPath().toString()
        elif (m := _MARKER_RE.match(name)) is not None:
            markers[int(m.group(1))] = int(m.group(2))
    return batches, gens, markers


def newest_generation(gens: dict, markers: dict):
    """(gen_id, dir URI, up_to) of the newest COMMITTED generation, or
    None. A gen dir without its marker is an uncommitted crash leftover
    and is never read."""
    committed = [g for g in markers if g in gens]
    if not committed:
        return None
    g = max(committed)
    return g, gens[g], markers[g]


def resolve_state(
    spark: SparkSession,
    path: str,
    ddl: str,
    before_batch: "int | None" = None,
) -> DataFrame:
    """Generation-aware accumulated-state read: the newest committed
    generation (rows filtered to ``src_batch < before_batch`` when
    set) unioned with the live batch dirs ``k >= up_to`` (same
    ``before_batch`` pruning). Declared schema throughout; empty frame
    of the declared schema when nothing exists yet."""
    batches, gens, markers = list_state(spark, path)
    newest = newest_generation(gens, markers)
    up_to = newest[2] if newest else 0

    parts: list[DataFrame] = []
    if newest is not None:
        gen = spark.read.schema(f"{ddl}, {SRC_BATCH_COL} long").parquet(
            newest[1]
        )
        if before_batch is not None:
            gen = gen.filter(F.col(SRC_BATCH_COL) < before_batch)
        parts.append(gen.drop(SRC_BATCH_COL))
    live = [
        uri
        for k, uri in batches.items()
        if k >= up_to and (before_batch is None or k < before_batch)
    ]
    if live:
        parts.append(spark.read.schema(ddl).parquet(*live))
    if not parts:
        return spark.createDataFrame([], ddl)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_state_dir(
    spark: SparkSession,
    path: str,
    ddl: str,
    num_files: "int | None" = None,
    up_to: "int | None" = None,
) -> dict:
    """Fold committed batch dirs (k < ``up_to``) and the previous
    generation into one new generation. ``up_to`` defaults to max
    batch id present + 1 — i.e. fold everything listed at start; a
    stream writing batch B concurrently is safe because B is not in
    the listing or is >= the cap. Returns a summary dict;
    {"folded_batches": 0, ...} is the no-op case (nothing new to
    fold)."""
    batches, gens, markers = list_state(spark, path)
    newest = newest_generation(gens, markers)
    prev_up_to = newest[2] if newest else 0
    if up_to is None:
        up_to = (max(batches) + 1) if batches else prev_up_to
    if up_to < prev_up_to:
        raise ValueError(
            f"up_to={up_to} would roll back the committed generation "
            f"boundary {prev_up_to}"
        )
    fs, _ = _fs(spark, path)
    Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    # GC batch dirs already behind the committed boundary: leftovers of
    # a crash between a previous commit and its prune, or of a
    # fresh-checkpoint WAL replay rewriting folded ids — invisible to
    # every reader, safe to remove at any time
    for k, uri in list(batches.items()):
        if k < prev_up_to:
            fs.delete(Path(uri), True)
            del batches[k]
    fold = {k: uri for k, uri in batches.items() if prev_up_to <= k < up_to}
    if not fold:
        return {
            "generation": newest[0] if newest else None,
            "folded_batches": 0,
            "up_to": prev_up_to,
        }

    gen_ddl = f"{ddl}, {SRC_BATCH_COL} long"
    parts = []
    if newest is not None:
        parts.append(spark.read.schema(gen_ddl).parquet(newest[1]))
    for k in sorted(fold):
        parts.append(
            spark.read.schema(ddl)
            .parquet(fold[k])
            .withColumn(SRC_BATCH_COL, F.lit(k))
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    if num_files is None:
        shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        num_files = max(1, len(fold) // max(1, shuffle))
    merged = merged.coalesce(num_files)

    new_g = (newest[0] + 1) if newest else 0
    gen_dir = f"{path}/gen={new_g}"
    merged.write.mode("overwrite").parquet(gen_dir)
    # COMMIT: marker creation is the atomic visibility point
    fs.create(Path(f"{path}/_GEN_COMMIT_{new_g}_{up_to}"), True).close()

    # prune AFTER commit — a crash anywhere below leaves only garbage
    # that readers already ignore and the next compaction removes
    for k in sorted(fold):
        fs.delete(Path(fold[k]), True)
    for g, uri in gens.items():
        if g < new_g:
            # marker first: an unmarked gen dir is invisible, so the
            # intermediate state after a crash here stays consistent
            if g in markers:
                fs.delete(
                    Path(f"{path}/_GEN_COMMIT_{g}_{markers[g]}"), False
                )
            fs.delete(Path(uri), True)
    return {
        "generation": new_g,
        "folded_batches": len(fold),
        "up_to": up_to,
        "num_files": num_files,
    }


def auto_compact(
    spark: SparkSession,
    specs: "list[tuple[str, str]]",
    batch_id: int,
    every: "int | None",
) -> None:
    """In-stream compaction cadence: called at the END of a job's
    foreachBatch body with the job's (state_dir, ddl) pairs, folds all
    committed batches every ``every`` micro-batches (no-op when
    ``every`` is None). Safe inside the batch that also wrote state: a
    crash between this fold and the checkpoint commit replays the
    batch, whose strictly-earlier reads filter the generation on
    src_batch and whose rewritten (now-folded) batch dir is invisible
    garbage the next fold GCs — the exact crash states the compaction
    unit tests pin. ``up_to`` is pinned to this batch id + 1 so a
    concurrent listing anomaly can never fold a FUTURE batch's
    replay-pending write."""
    if every is None or every < 1 or (batch_id + 1) % every != 0:
        return
    for path, ddl in specs:
        _batches, gens, markers = list_state(spark, path)
        newest = newest_generation(gens, markers)
        if newest is not None and newest[2] >= batch_id + 1:
            # WAL replay of an already-folded batch: the boundary has
            # moved past us; folding again would be a rollback — skip
            continue
        compact_state_dir(spark, path, ddl, up_to=batch_id + 1)


def state_file_count(spark: SparkSession, path: str) -> int:
    """Data-file count across the state dir (the quantity compaction
    bounds) — parquet part files in batch dirs and generations; markers
    and _SUCCESS excluded."""
    fs, hpath = _fs(spark, path)
    if not fs.exists(hpath):
        return 0
    n = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet") or (
            name.startswith("part-") and not name.endswith(".crc")
        ):
            n += 1
    return n
