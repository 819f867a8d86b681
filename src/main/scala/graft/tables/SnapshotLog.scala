package graft.tables

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iceberg-*style* table layer: partitioned Parquet + an atomic JSON snapshot
  * log (SURVEY.md §7.0/§2.1 S9). No Iceberg jar ships in /opt/spark/jars, so
  * this provides the north rule's observable behaviors directly:
  *
  *  - committed snapshots: data lands in `table/snapshot-N/`, then a manifest
  *    line is appended via atomic rename — readers only ever see committed
  *    snapshots;
  *  - checkpoint/resume: `latestSnapshot(stage)` lets a relaunched job skip
  *    every stage that already committed (reference checkpoint.py:116-157
  *    resume-from-last-phase semantics);
  *  - per-partition lineage: each commit writes one row per task partition
  *    (partition id, row count, xor-of-hash checksum) into a lineage dir —
  *    computed IN the write pass (see commit), never by re-reading the
  *    snapshot;
  *  - O(delta) appends: a manifest entry is either a `full` snapshot or a
  *    `delta` segment; the live table is the last full snapshot plus every
  *    delta after it. `mergeAppend`/`mergeUpsert` write ONLY the new/changed
  *    rows as a delta segment (reference MERGE batches, pipeline.py:416-547)
  *    — round 2 rewrote existing ∪ fresh on every append, an O(table) write
  *    per increment that a standing 100 TB triples table cannot afford.
  *    `commit` remains the compaction path (writes a new full snapshot).
  *  - merge-on-read updates: an upsert delta marks its key columns in the
  *    manifest; `read` then resolves last-writer-wins per key (Iceberg MOR
  *    semantics). Append-only tables skip that window entirely.
  *  - O(delta) merge READS via per-segment key blooms (Iceberg/Delta-style
  *    file-skipping): every keyed segment write builds a bloom filter over
  *    the merge-key hash (a key-column read-back of the just-written
  *    segment — O(delta) for merge deltas) and lands it next to the
  *    segment. `mergeAppend`/
  *    `mergeUpsert` then probe the incoming delta against each live
  *    segment's bloom and anti-join/EXCEPT against ONLY the segments that
  *    might contain an incoming key. In the standing regime (increments
  *    are new conversations → new uuids) a small increment into a huge
  *    table touches ZERO existing segments — without the blooms every
  *    increment re-scans the live table's key column, an O(table) read a
  *    100 TB fact table cannot afford per 20k-turn increment. Bloom
  *    misses are impossible (no false negatives), so pruning never drops
  *    a genuine match; false positives only cost an unnecessary scan.
  *    Segments without a bloom (legacy, or a saturated/oversized
  *    compaction) are always scanned — strictly the old behavior.
  *
  * The driver never holds data rows — lineage aggregation happens in Spark
  * (the driver only collects one (partition, count, checksum) tuple per task
  * partition).
  *
  * Concurrency contract: SINGLE WRITER per table (the reference pipeline is
  * likewise one ingest process per store). Readers are safe against a
  * concurrent writer (manifest renames are atomic; segments are immutable
  * once listed), but two concurrent writers can both claim the same next
  * snapshot id, and `vacuum` deletes segment files a concurrently-started
  * merge may still plan to scan — serialize writes and maintenance
  * (TableApp) behind whatever job scheduler owns the warehouse.
  */
/** @param bloomExpectedItems FLOOR capacity of each segment's key bloom.
  *   The actual capacity is auto-sized to the segment's row count (known
  *   from the lineage accumulator before the bloom job runs), so a large
  *   compacted base stays prunable instead of saturating, while small
  *   deltas never pay for more than the floor.
  * @param bloomMaxItems capacity CEILING: a segment holding more keys than
  *   this writes NO bloom (a saturated bloom flags everything anyway —
  *   "missing = always scan" is the same behavior minus the probe cost).
  *   Bounds bloom bytes at ~28.8 bits/key × ceiling (≈115 MB at the 32M
  *   default) — the driver loads every live segment's bloom per merge.
  * @param bloomFpp per-test false-positive rate AT capacity. A merge makes
  *   deltaRows × segments membership tests and scans every segment with ≥ 1
  *   hit, so the expected number of NEEDLESSLY scanned segments is
  *   ≈ deltaRows × fpp × segments — fpp must sit well under 1/deltaRows for
  *   the typical increment, not at the 1-5% of scan-time bloom defaults
  *   (0.03 at a 10k-row delta flags EVERY segment almost surely). 1e-6
  *   costs ~28.8 bits/key ≈ 3.5 MB per bloom at the 1M default floor
  *   and keeps a 10k-row delta's flag-FP chance at ~1% per segment.
  */
/** @param bloomProbeBudgetBytes cap on the bloom bytes resident on the
  *   driver (and serialized into one probe job's task closures) at any
  *   moment during a merge: segments are probed in GROUPS whose summed
  *   bloom size stays under the budget, each group's blooms dropped before
  *   the next loads. Worst-case transient driver memory is therefore
  *   budget + one bloom (≤ budget + ~115 MB at the bloomMaxItems ceiling),
  *   independent of the live-segment count — without the grouping, a merge
  *   against 32 live max-size segments held ~3.7 GB of blooms in one task
  *   binary. A group still probes in ONE aggregation job over the (persisted)
  *   delta, so the typical table (few live segments, MB-scale blooms) keeps
  *   paying a single job.
  */
class SnapshotLog(spark: SparkSession, baseDir: String,
    autoCompactSegments: Int = 32,
    bloomExpectedItems: Long = 1L * 1000 * 1000,
    bloomFpp: Double = 1e-6,
    bloomMaxItems: Long = 32L * 1000 * 1000,
    bloomProbeBudgetBytes: Long = 512L << 20) {
  import spark.implicits._

  /** (segments scanned, segments live) of the most recent merge — a test/
    * diagnostics hook for the bloom-pruning read path.
    */
  @volatile private[graft] var lastMergeScan: Option[(Int, Int)] = None

  /** (segments scanned, segments live) of the most recent point-lookup read
    * (`readForKeys`/`readForAnyKeys`) — the diagnostics hook for the
    * read-side bloom index.
    */
  @volatile private[graft] var lastLookupScan: Option[(Int, Int)] = None

  private case class Entry(id: Long, kind: String, upsert: Boolean, keys: Seq[String],
      schemaB64: Option[String], committedAtMs: Option[Long] = None, hashV: Int = 1,
      auxKeys: Seq[Seq[String]] = Nil)

  private def tableDir(name: String): Path = Paths.get(baseDir, name)
  private def manifest(name: String): Path = tableDir(name).resolve("_snapshots.json")

  private val idRe = """"snapshot_id":\s*(\d+)""".r
  private val kindRe = """"kind":\s*"(\w+)"""".r
  private val upsertRe = """"upsert":\s*(true|false)""".r
  private val keysRe = """"keys":\s*\[([^\]]*)\]""".r
  private val schemaRe = """"schema_b64":\s*"([A-Za-z0-9+/=]*)"""".r
  private val tsRe = """"committed_at_ms":\s*(\d+)""".r
  private val hashVRe = """"hash_v":\s*(\d+)""".r
  // aux bloom column sets, flat-encoded (multi-column sets joined by "|")
  // so the single-level-array regex style above keeps working
  private val auxKeysRe = """"aux_keys":\s*\[([^\]]*)\]""".r

  /** Parsed manifest entries, ascending by snapshot id. Legacy lines without
    * a `kind` field are full snapshots.
    */
  private def entries(name: String): Seq[Entry] = {
    val m = manifest(name)
    if (!Files.exists(m)) Seq.empty
    else Files.readAllLines(m, UTF_8).asScala.toSeq.filter(_.nonEmpty).flatMap { line =>
      idRe.findFirstMatchIn(line).map { idm =>
        val kind = kindRe.findFirstMatchIn(line).map(_.group(1)).getOrElse("full")
        val upsert = upsertRe.findFirstMatchIn(line).exists(_.group(1) == "true")
        val keys = keysRe.findFirstMatchIn(line).map(_.group(1)).toSeq
          .flatMap(_.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
            .filter(_.nonEmpty))
        val schemaB64 = schemaRe.findFirstMatchIn(line).map(_.group(1))
        val ts = tsRe.findFirstMatchIn(line).map(_.group(1).toLong)
        val hashV = hashVRe.findFirstMatchIn(line).map(_.group(1).toInt).getOrElse(1)
        val auxKeys = auxKeysRe.findFirstMatchIn(line).map(_.group(1)).toSeq
          .flatMap(_.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
            .filter(_.nonEmpty).map(_.split("\\|").toSeq))
        Entry(idm.group(1).toLong, kind, upsert, keys, schemaB64, ts, hashV, auxKeys)
      }
    }.sortBy(_.id)
  }

  /** Committed snapshot/segment ids for a table, ascending. */
  def snapshots(name: String): Seq[Long] = entries(name).map(_.id)

  def latestSnapshot(name: String): Option[Long] = snapshots(name).lastOption

  def snapshotPath(name: String, id: Long): String =
    tableDir(name).resolve(s"snapshot-$id").toString

  /** The live segment set: last full snapshot + every delta after it. */
  private def liveEntries(name: String): Seq[Entry] = {
    val all = entries(name)
    val lastFull = all.lastIndexWhere(_.kind == "full")
    if (lastFull < 0) all else all.drop(lastFull)
  }

  /** Read one segment with its manifest-pinned schema: partition-column
    * TYPE INFERENCE otherwise re-types numeric-looking partition values
    * (e.g. a group_id of "12345" comes back as INT), silently changing the
    * schema AND breaking lineage verification (the write-time row hash used
    * the original types). Legacy entries without a recorded schema fall back
    * to inference.
    */
  private def segDf(name: String, e: Entry): DataFrame = {
    val path = snapshotPath(name, e.id)
    e.schemaB64 match {
      case Some(b64) =>
        val json = new String(java.util.Base64.getDecoder.decode(b64), UTF_8)
        val st = org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        spark.read.schema(st).parquet(path)
      case None => spark.read.parquet(path)
    }
  }

  /** Read the current committed state of a table: union of live segments,
    * with last-writer-wins key resolution when any live segment is an upsert
    * delta (merge-on-read). Append-only tables pay no dedup.
    */
  def read(name: String): Option[DataFrame] =
    resolveSegments(name, liveEntries(name))

  /** TIME TRAVEL: the table as of snapshot `asOf` (the highest committed id
    * ≤ asOf counts — as-of semantics, like Delta's VERSION AS OF). Works for
    * every id still in the manifest: compaction writes a NEW full snapshot
    * without deleting the segments it collapsed, so pre-compaction history
    * stays readable until `vacuum` reclaims it. None when nothing was
    * committed at or before `asOf`, or a segment it needs was vacuumed.
    */
  def readAt(name: String, asOf: Long): Option[DataFrame] = {
    val upTo = entries(name).filter(_.id <= asOf)
    val lastFull = upTo.lastIndexWhere(_.kind == "full")
    val live = if (lastFull < 0) upTo else upTo.drop(lastFull)
    if (live.exists(e => !Files.exists(Paths.get(snapshotPath(name, e.id))))) None
    else resolveSegments(name, live)
  }

  /** TIME TRAVEL by wall clock (Delta's TIMESTAMP AS OF): the state as of
    * the last snapshot committed at or before `ts`. Entries without a
    * recorded commit time (legacy manifests) are treated as older than any
    * timestamp — included, like their ids suggest.
    */
  def readAtTime(name: String, ts: Timestamp): Option[DataFrame] =
    entries(name).filter(_.committedAtMs.forall(_ <= ts.getTime))
      .lastOption.flatMap(e => readAt(name, e.id))

  /** APPEND-ONLY DELTA READ: the rows added strictly after snapshot
    * `afterId` — a union of just the delta segments that landed since, so an
    * incremental consumer folding MERGEABLE state (sketches, counters,
    * partial aggregates) pays O(delta), never O(table). None when the delta
    * is not reconstructable from segments alone and the caller must fall
    * back to a full read: a FULL snapshot landed since (compaction — segment
    * rows ≠ added rows), an UPSERT delta landed since (an updated key would
    * double-count as an addition), or nothing landed since.
    */
  def readSince(name: String, afterId: Long): Option[DataFrame] = {
    val later = entries(name).filter(_.id > afterId)
    if (later.isEmpty || later.exists(e => e.kind == "full" || e.upsert)) None
    else resolveSegments(name, later)
  }

  /** BLOOM-INDEXED POINT LOOKUP: the resolved table filtered to rows whose
    * `keys` tuple is one of `values`, scanning ONLY the live segments whose
    * key bloom (merge-key or aux) might contain one of the literal tuples.
    * The graph-query surface (get_chunk(s), get_entity_info,
    * explore_neighbors) is point lookups by uuid — without this every MCP
    * call reads O(table); with it a lookup into a standing 100 TB table
    * opens only the segments that can hold the key. Blooms have no false
    * negatives, so pruning never hides a row; segments without a usable
    * bloom (legacy, ceiling-skipped, different column set) always scan.
    * None only when the table has no committed state at all.
    */
  def readForKeys(name: String, keys: Seq[String], values: Seq[Seq[Any]]): Option[DataFrame] =
    readForAnyKeys(name, Seq(keys -> values))

  /** Single-column convenience form of `readForKeys`. */
  def readForKey(name: String, key: String, values: Seq[Any]): Option[DataFrame] =
    readForKeys(name, Seq(key), values.map(Seq(_)))

  /** Disjunctive point lookup: rows matching ANY (columns, literal tuples)
    * probe — the 1-hop adjacency shape (`subject_uuid = u OR object_uuid
    * = u` over a triples table carrying aux blooms on both columns). A
    * segment is pruned only when EVERY probe has a usable bloom there and
    * none of its literals hit.
    *
    * Upsert (merge-on-read) tables prune only when every probe's column set
    * IS the merge key set: a row's newer version can move any non-key
    * column's value, so pruning by a non-key probe could hide the segment
    * holding the LATEST version of a matching key and resurface a stale
    * row. Mismatched probes on upsert tables fall back to scanning every
    * live segment (correct, just unpruned). Literal values must match the
    * committed column types (uuids here are strings).
    *
    * The literal hashes are computed with the SAME Catalyst expression the
    * segment writes used (`keyHashCol`, per segment hash version) over a
    * local relation — the optimizer's ConvertToLocalRelation folds that
    * projection on the driver, so probing schedules no cluster job; the
    * blooms themselves load and probe driver-side one at a time (a lookup
    * carries a handful of literals, unlike a merge's delta-side probe job).
    */
  def readForAnyKeys(name: String,
      probes: Seq[(Seq[String], Seq[Seq[Any]])]): Option[DataFrame] = {
    val live = liveEntries(name)
    if (live.isEmpty) return None
    val active = probes.filter(_._2.nonEmpty)
    if (active.isEmpty) {
      lastLookupScan = Some((0, live.size))
      return read(name).map(_.filter(lit(false)))
    }
    val pred = active.map { case (k, vs) => probePredicate(k, vs) }.reduce(_ || _)
    def ci(s: Seq[String]) = s.map(_.toLowerCase(java.util.Locale.ROOT)).sorted
    val mergeKeysCI = live.filter(_.upsert).lastOption.map(e => ci(e.keys))
    val upsertSafe = mergeKeysCI.forall(mk => active.forall(p => ci(p._1) == mk))
    if (!upsertSafe) {
      // non-merge-key probe on a merge-on-read table: neither pruning NOR a
      // per-segment filter is sound — a key's newer version can change any
      // non-key column, so filtering before the last-writer-wins window
      // would let a STALE row (whose newer version no longer matches the
      // predicate) win the window and resurface. Resolve fully, then filter.
      lastLookupScan = Some((live.size, live.size))
      return read(name).map(_.filter(pred))
    }
    val scanned = {
        // literal hashes are computed against each segment's PINNED key
        // column types (a type change between segments would change the
        // hash), cached by (probe, version, key types) — one entry in
        // practice. A segment without a pinned schema always scans.
        val hashCache = scala.collection.mutable
          .Map[(Int, Int, Seq[org.apache.spark.sql.types.DataType]), Option[Array[Long]]]()
        live.filter { e =>
          val v = if (e.hashV >= 2) 2 else 1
          pinnedSchemaOf(e) match {
            case None => true // no pinned schema: must scan
            case Some(schema) =>
              active.indices.exists { pi =>
                lookupBloomPath(name, e, active(pi)._1).flatMap(loadBloom) match {
                  case None => true // no usable bloom: must scan
                  case Some(bf) =>
                    val types = active(pi)._1.map(k =>
                      schema.fields.find(_.name.equalsIgnoreCase(k)).map(_.dataType))
                    if (types.exists(_.isEmpty)) true // column absent: scan
                    else hashCache.getOrElseUpdate((pi, v, types.map(_.get)),
                        literalHashes(schema, active(pi)._1, active(pi)._2, v)) match {
                      case None => true
                      case Some(hs) => hs.exists(bf.mightContainLong)
                    }
                }
              }
          }
        }
      }
    lastLookupScan = Some((scanned.size, live.size))
    resolveSegments(name, scanned, _.filter(pred))
      .orElse(read(name).map(_.filter(lit(false))))
  }

  /** Pinned read schema of a segment, when the manifest recorded one. */
  private def pinnedSchemaOf(e: Entry): Option[org.apache.spark.sql.types.StructType] =
    e.schemaB64.map { b64 =>
      val json = new String(java.util.Base64.getDecoder.decode(b64), UTF_8)
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }

  /** The lookup filter itself: IN for single-column probes (pushes down as
    * parquet IN), OR-of-AND for composite tuples (also pushdown-eligible).
    */
  private def probePredicate(keys: Seq[String], values: Seq[Seq[Any]]): Column =
    if (keys.size == 1) col(keys.head).isin(values.map(_.head): _*)
    else values.map(t => keys.zip(t).map { case (k, v) => col(k) === lit(v) }
      .reduce(_ && _)).reduce(_ || _)

  /** xxhash64 of each literal key tuple, via the same `keyHashCol`
    * expression the write side used, evaluated over a local relation
    * (driver-only after ConvertToLocalRelation). None when a requested
    * column is absent from the pinned schema — the caller then scans.
    */
  private def literalHashes(pinned: org.apache.spark.sql.types.StructType,
      keys: Seq[String], values: Seq[Seq[Any]], v: Int): Option[Array[Long]] = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val fields = keys.map(k => pinned.fields.find(_.name.equalsIgnoreCase(k)))
    if (fields.exists(_.isEmpty)) return None
    val st = StructType(keys.zip(fields).map { case (k, f) =>
      StructField(k, f.get.dataType) })
    val rows: java.util.List[Row] = values.map(t => Row.fromSeq(t)).asJava
    val df = spark.createDataFrame(rows, st)
    Some(df.select(keyHashCol(keys, v).as("h")).as(Encoders.scalaLong).collect())
  }

  /** Commit history of a table as a DataFrame (ascending snapshot_id):
    * id, kind (full|delta), upsert flag, merge keys, commit timestamp, and
    * whether the segment is part of the CURRENT live read set.
    */
  def history(name: String): DataFrame = {
    val liveIds = liveEntries(name).map(_.id).toSet
    entries(name).map(e => (e.id, e.kind, e.upsert, e.keys,
        e.committedAtMs.map(new Timestamp(_)).orNull, liveIds(e.id), e.auxKeys))
      .toDF("snapshot_id", "kind", "upsert", "keys", "committed_at", "live", "aux_keys")
  }

  /** RETENTION: delete every segment older than the last full snapshot (the
    * set unreachable from `read`, kept only for time travel) — data,
    * lineage, and bloom — and rewrite the manifest without those entries.
    * Returns the vacuumed ids. The live read set is never touched, so
    * `read`/merges are unaffected; `readAt` for vacuumed ids returns None.
    */
  def vacuum(name: String): Seq[Long] = {
    val all = entries(name)
    val lastFull = all.lastIndexWhere(_.kind == "full")
    if (lastFull <= 0) return Seq.empty
    val (dead, live) = all.splitAt(lastFull)
    // manifest first (atomic rename): a crash between the two steps leaves
    // orphaned-but-unreferenced files, never a referenced-but-deleted one
    rewriteManifest(name, live.map(_.id).toSet)
    dead.map { e =>
      deleteRecursively(Paths.get(snapshotPath(name, e.id)))
      deleteRecursively(tableDir(name).resolve(s"snapshot-${e.id}-lineage"))
      Files.deleteIfExists(bloomPath(name, e.id))
      e.auxKeys.foreach(s => Files.deleteIfExists(auxBloomPath(name, e.id, s)))
      e.id
    }
  }

  private def rewriteManifest(name: String, keep: Set[Long]): Unit = {
    val m = manifest(name)
    if (!Files.exists(m)) return
    val kept = Files.readAllLines(m, UTF_8).asScala.toSeq.filter { line =>
      line.isEmpty || idRe.findFirstMatchIn(line).forall(x => keep(x.group(1).toLong))
    }
    val tmp = tableDir(name).resolve("_snapshots.json.tmp-vacuum")
    Files.write(tmp, kept.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, m, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The resolved view of a SUBSET of live segments (same union +
    * last-writer-wins window as `read`). Safe for merge pruning: a key's
    * rows hash into the bloom of EVERY segment that holds them, so a
    * key-complete subset resolves those keys exactly as the full view does.
    */
  private def resolveSegments(name: String, live: Seq[Entry],
      perSegment: DataFrame => DataFrame = identity): Option[DataFrame] = {
    if (live.isEmpty) None
    else if (live.size == 1) Some(perSegment(segDf(name, live.head)))
    else {
      val anyUpsert = live.exists(_.upsert)
      if (!anyUpsert)
        Some(live.map(e => perSegment(segDf(name, e)))
          .reduce(_ unionByName _))
      else {
        // perSegment is applied BEFORE the last-writer-wins window, so a
        // point-lookup filter shrinks every segment scan first; callers must
        // only pass key-complete filters (all rows of a key pass or none) —
        // readForAnyKeys' upsert guard enforces that
        val keys = live.filter(_.upsert).last.keys
        val tagged = live.map(e =>
          perSegment(segDf(name, e)).withColumn("_seg", lit(e.id)))
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_seg").desc)
        Some(tagged.reduce(_ unionByName _)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_rn", "_seg"))
      }
    }
  }

  /** Hash version each NEW segment is written with, recorded per entry in
    * the manifest (`hash_v`; absent = 1). v1 hashed xxhash64 over the
    * columns' JSON — a per-row string serialization on EVERY commit, the
    * single largest avoidable CPU term of a 100 TB write. v2 feeds the
    * columns to xxhash64 directly (codegen, no materialized string;
    * measured 2.4× faster at 5M rows). Both versions order columns
    * lexicographically, so partition-column reordering on read-back cannot
    * change the hash. Legacy v1 segments keep verifying and bloom-pruning
    * with v1 expressions — the version travels with the segment.
    */
  private val HashVCurrent = 2

  /** The hash version a frame CAN be written with: multi-arg xxhash64 (v2)
    * rejects MapType anywhere in the schema (Spark disallows hashing maps —
    * their entry order is undefined), while v1's to_json rendering accepts
    * them — so map-bearing frames stay on v1 and just keep paying the JSON
    * cost. One version per segment covers both the row hash and the key
    * hash (keys are a subset of the columns).
    */
  private def writableHashV(schema: org.apache.spark.sql.types.StructType): Int = {
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    if (schema.fields.exists(f => hasMap(f.dataType))) 1 else HashVCurrent
  }

  /** Merge-key hash (same expression on the segment-write side and the
    * merge-probe side), in the given version. Keys order CASE-INSENSITIVELY
    * (ties broken case-sensitively for totality): the key-set guard in
    * `scannedEntries` accepts a caller key set that matches the recorded one
    * case-insensitively, so the hash's column order must be identical for
    * e.g. Seq("ID","g") vs Seq("id","g") — a case-SENSITIVE sort would order
    * those differently ("I" < "g" but "g" < "i"), hash different values, and
    * falsely prune a segment that does hold the incoming keys. (For
    * all-lowercase key sets — every in-repo table — this order equals the
    * old case-sensitive one, so existing segment blooms stay valid.)
    */
  private def keyHashCol(keys: Seq[String], v: Int) = {
    val ordered = keys.sortBy(k => (k.toLowerCase(java.util.Locale.ROOT), k))
    if (v >= 2) xxhash64(ordered.map(col): _*)
    else xxhash64(to_json(struct(ordered.map(col): _*)))
  }

  private def bloomPath(name: String, id: Long): Path =
    tableDir(name).resolve(s"snapshot-$id.bloom")

  /** AUX bloom file for a non-merge-key column set (named by the sorted
    * column list, so lookups find it regardless of the caller's key order).
    */
  private def auxBloomPath(name: String, id: Long, keySet: Seq[String]): Path =
    tableDir(name).resolve(s"snapshot-$id.bloom-" +
      keySet.map(_.toLowerCase(java.util.Locale.ROOT)).sorted.mkString("+"))

  private def loadBloom(p: Path): Option[org.apache.spark.util.sketch.BloomFilter] =
    if (!Files.exists(p)) None
    else {
      val in = Files.newInputStream(p)
      try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in))
      catch { case _: java.io.IOException => None }
      finally in.close()
    }

  private def segBloom(name: String, e: Entry): Option[org.apache.spark.util.sketch.BloomFilter] =
    loadBloom(bloomPath(name, e.id))

  /** The bloom file covering a requested column set on a segment, if any:
    * the merge-key bloom when the sets match (case-insensitively), else a
    * matching aux bloom. None = no usable bloom = the segment must scan.
    */
  private def lookupBloomPath(name: String, e: Entry, req: Seq[String]): Option[Path] = {
    val reqCI = req.map(_.toLowerCase(java.util.Locale.ROOT)).sorted
    def ci(s: Seq[String]) = s.map(_.toLowerCase(java.util.Locale.ROOT)).sorted
    if (e.keys.nonEmpty && ci(e.keys) == reqCI) Some(bloomPath(name, e.id))
    else e.auxKeys.find(s => ci(s) == reqCI).map(s => auxBloomPath(name, e.id, s))
  }

  /** The live segments a merge of `in` must scan: segments whose bloom
    * matches at least one incoming key hash, plus every segment without a
    * usable bloom. A bloom is usable only when the segment's RECORDED merge
    * keys equal the caller's key set (case-insensitive): the bloom hashes
    * the recorded keys' values, so probing it with a different key set
    * hashes different values and could prune a segment that DOES contain
    * the incoming keys — a silent-duplicate/stale-resolution bug for any
    * external caller that merges a public table on a different key set
    * than it was committed with. Mismatched segments fall back to
    * always-scan (correct, just unpruned).
    *
    * Segments probe in groups bounded by `bloomProbeBudgetBytes` (each
    * group = one aggregation job over the persisted delta; blooms load
    * lazily per group and are dropped before the next group loads), so
    * driver memory and per-job task-closure size stay bounded regardless
    * of how many live segments the table has. Each segment's bloom is
    * probed with the hash version IT was written under (one derived column
    * per version present, usually one). Records `lastMergeScan`.
    */
  private def scannedEntries(name: String, in: DataFrame, keys: Seq[String]): Seq[Entry] = {
    val live = liveEntries(name)
    val keySet = keys.map(_.toLowerCase).sorted
    val (candidates, unpruned) = live.partition(e =>
      e.keys.map(_.toLowerCase).sorted == keySet && Files.exists(bloomPath(name, e.id)))
    val hitIds = scala.collection.mutable.Set[Long]()
    val noBloom = scala.collection.mutable.ListBuffer[Entry]()
    def vOf(e: Entry) = if (e.hashV >= 2) 2 else 1
    def probeGroup(group: Seq[(Entry, org.apache.spark.util.sketch.BloomFilter)]): Unit = {
      val probe = group.map(x => vOf(x._1)).distinct.foldLeft(in)((df, v) =>
        df.withColumn(s"__graft_key_hash_v$v", keyHashCol(keys, v)))
      val flags = group.map { case (e, b) =>
        val c = col(s"__graft_key_hash_v${vOf(e)}")
        val hit = udf((h: Long) => b.mightContainLong(h))
        max(when(hit(c), 1).otherwise(0)).as(s"s${e.id}")
      }
      val row = probe.agg(flags.head, flags.tail: _*).first()
      group.indices.foreach { i =>
        if (!row.isNullAt(i) && row.getInt(i) == 1) hitIds += group(i)._1.id
      }
    }
    var group = List.empty[(Entry, org.apache.spark.util.sketch.BloomFilter)]
    var groupBytes = 0L
    candidates.foreach { e =>
      segBloom(name, e) match {
        case None => noBloom += e // unreadable bloom file: always scan
        case Some(b) =>
          val bytes = b.bitSize() / 8
          if (group.nonEmpty && groupBytes + bytes > bloomProbeBudgetBytes) {
            probeGroup(group.reverse)
            group = Nil; groupBytes = 0L
          }
          group ::= (e, b); groupBytes += bytes
      }
    }
    if (group.nonEmpty) probeGroup(group.reverse)
    val scanned = live.filter(e =>
      unpruned.contains(e) || noBloom.contains(e) || hitIds(e.id))
    lastMergeScan = Some((scanned.size, live.size))
    scanned
  }

  /** Write a new FULL snapshot (also the compaction path for delta-fragmented
    * tables): parquet first, manifest append last (atomic rename). Returns
    * the new snapshot id. `bloomKeys` (the table's merge keys, when it has
    * them) makes the snapshot carry a key bloom so later merges can skip it.
    */
  def commit(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
      bloomKeys: Seq[String] = Nil, auxBloomKeys: Seq[Seq[String]] = Nil): Long =
    writeSegment(name, df, partitionBy, kind = "full", upsert = false,
      keys = bloomKeys, auxKeys = auxBloomKeys).get

  /** One write pass that streams rows to parquet while folding per-partition
    * lineage (row count + xor-of-row-hash checksum) into a collection
    * accumulator — one (Int, Long, Long) tuple per task partition reaches the
    * driver, never data rows. Round 2 re-read the whole written snapshot to
    * compute lineage; at 100 TB that second pass costs as much as the stage
    * itself. The row hash is xxhash64 over the row's columns in
    * lexicographic column order (see HashVCurrent for versioning), so
    * `verifyLineage` can recompute it from the committed files regardless of
    * the partition-column reordering that `partitionBy` writes produce on
    * read-back.
    *
    * Accumulator caveat (documented): updates come from the write job's
    * tasks; Spark drops updates from failed attempts, and the df feeds
    * exactly one action here, so counts are exact unless speculative
    * execution races two attempts of one partition — `lineageFor` dedupes by
    * partition id, which also covers that case.
    */
  private def writeSegment(name: String, df: DataFrame, partitionBy: Seq[String],
      kind: String, upsert: Boolean, keys: Seq[String],
      skipIfEmpty: Boolean = false, auxKeys: Seq[Seq[String]] = Nil): Option[Long] = {
    val id = latestSnapshot(name).getOrElse(0L) + 1L
    val dataPath = snapshotPath(name, id)

    val acc = spark.sparkContext
      .collectionAccumulator[(Int, Long, Long)](s"graft-lineage-$name-$id")
    val hashV = writableHashV(df.schema)
    val enriched = df.withColumn("__graft_row_hash", rowHashCol(df.columns, hashV))
    val schema = enriched.schema
    val hashIdx = schema.fieldIndex("__graft_row_hash")
    val counted = enriched.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      new Iterator[Row] {
        private var cnt = 0L
        private var xor = 0L
        private var reported = false
        override def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && !reported) { acc.add((pid, cnt, xor)); reported = true }
          h
        }
        override def next(): Row = {
          val r = it.next()
          cnt += 1
          if (!r.isNullAt(hashIdx)) xor ^= r.getLong(hashIdx)
          r
        }
      }
    }(Encoders.row(schema))

    // PARQUET COLUMN BLOOM FILTERS on the merge-key + aux lookup columns of
    // FULL segments: the pruning level BELOW the segment blooms. Once
    // readForKeys/scannedEntries has resolved which segments might hold a
    // key, the parquet reader's row-group filter (parquet.filter.bloom
    // .enabled — on by default under spark.sql.parquet.filterPushdown)
    // skips the row groups inside a surviving segment whose column bloom
    // rejects the pushed literal, so a point lookup into a multi-row-group
    // base reads only the groups that can hold the key (uuid keys are
    // unsorted, so min/max stats never prune them; low-cardinality chunks
    // stay fully dictionary-encoded and parquet-mr then drops the bloom
    // because dictionary row-group filtering is already exact).
    // FULL segments only, by design: adaptive sizing (the only mode that
    // works without a pre-write NDV, which the write-first single-pass
    // design cannot know) floors at maxBytes/16 = 64 KB per column chunk —
    // nothing against a compacted multi-GB base, but it would break the
    // "append cost ∝ new rows" invariant on small delta segments. Deltas
    // don't need it: the per-segment key blooms already prune them
    // wholesale per lookup, and auto-compaction folds delta history into a
    // bloom-bearing full segment anyway.
    val bloomCols =
      if (kind != "full") Nil
      else (keys ++ auxKeys.flatten)
        .flatMap(k => df.schema.fields.find(_.name.equalsIgnoreCase(k)).map(_.name))
        .distinct
    val writer0 = counted.drop("__graft_row_hash").write.mode("overwrite")
    val writer =
      if (bloomCols.isEmpty) writer0
      else bloomCols.foldLeft(
          writer0.option("parquet.bloom.filter.adaptive.enabled", "true"))(
          (w, c) => w.option(s"parquet.bloom.filter.enabled#$c", "true"))
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataPath)

    // delta merges write FIRST and discard a zero-row segment here — the
    // accumulator already counted the rows during the single write pass, so
    // the anti-join/EXCEPT delta is computed exactly once (an up-front
    // `isEmpty` probe would execute it a second time; at scale the delta
    // against the live table is the expensive half of an append)
    val tuples = acc.value.asScala.toSeq
      .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
    if (skipIfEmpty && tuples.map(_._2).sum == 0L) {
      deleteRecursively(Paths.get(dataPath))
      return None
    }

    // a partitionBy write of an EMPTY stage creates no parquet files (dynamic
    // partitioning has nothing to lay out), which would fail read-back schema
    // inference — land one zero-row schema-bearing file so empty stages
    // commit and resume like any other (e.g. a micro-batch with no facts)
    val hasParquet = {
      val s = Files.walk(Paths.get(dataPath))
      try s.anyMatch(p => p.toString.endsWith(".parquet")) finally s.close()
    }
    val dataSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == "__graft_row_hash"))
    if (!hasParquet) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], dataSchema)
        .coalesce(1).write.mode("append").parquet(dataPath)
    }

    // lineage rows from the accumulated per-partition tuples (dedup by pid:
    // a speculative duplicate attempt must not double-count)
    val now = new Timestamp(System.currentTimeMillis())
    val lineage = tuples.toDF("partition_id", "output_rows", "checksum")
      .select(
        lit(name).as("stage"),
        $"partition_id",
        lit(0L).as("input_rows"),
        $"output_rows",
        $"checksum",
        lit(id).as("snapshot_id"),
        lit(now).as("committed_at"))
    val lineageDir = tableDir(name).resolve(s"snapshot-$id-lineage").toString
    lineage.write.mode("overwrite").parquet(lineageDir)

    // key bloom lands BEFORE the manifest line makes the segment visible
    // (an EMPTY bloom is still written: it makes a zero-row segment
    // skippable, whereas a MISSING bloom means "always scan"). Built by a
    // key-column read-back of the JUST-written segment: a columnar scan of
    // ONLY the key columns — O(delta) for merge deltas, one extra scan at
    // compaction — where treeAggregate merges partial blooms executor-side
    // so the driver receives O(√tasks) partials instead of one full-size
    // bloom per task (an accumulator-in-the-write-pass build ships
    // ~bloom-size bytes per task result: fine at 32 tasks, ~36 GB at a
    // 10k-task cluster write). NOT `stat.bloomFilter`: in Spark 4 that
    // routes through BloomFilterAggregate, which silently clamps capacity
    // to the runtime-filter confs (maxNumItems=4M, maxNumBits=64M bits) —
    // a 5M-row segment's bloom saturates to fpp≈1e-3 and every increment
    // flags every segment (measured: BloomProbe scan went 0/4 → 4/4).
    // capacity auto-sizes to the segment's row count (already known from
    // the lineage tuples — an upper bound on distinct keys), floored at
    // bloomExpectedItems; above bloomMaxItems no bloom is written (missing
    // = always scan, which is what a saturated bloom degrades to anyway)
    val segRows = tuples.map(_._2).sum
    // every requested bloom (the merge-key one plus any AUX lookup-column
    // ones) builds in the SAME single key-column read-back pass: one
    // columnar scan of the union of bloom columns, one treeAggregate over
    // an array of filters — adding a lookup index costs hash CPU, not an
    // extra scan
    val bloomSpecs = (if (keys.nonEmpty) Seq(keys) else Nil) ++ auxKeys
    if (bloomSpecs.nonEmpty && segRows <= bloomMaxItems) {
      val capacity = math.max(bloomExpectedItems, segRows)
      def fresh() = Array.fill(bloomSpecs.size)(
        org.apache.spark.util.sketch.BloomFilter.create(capacity, bloomFpp))
      // zero-row keyed commits (e.g. an empty streaming micro-batch stage)
      // skip the read job; treeAggregate on the empty frame would also
      // return the zero blooms, this just avoids scheduling it
      val bfs =
        if (segRows == 0L) fresh()
        else {
          val hashed = spark.read.schema(dataSchema).parquet(dataPath)
            .select(bloomSpecs.zipWithIndex.map { case (s, i) =>
              keyHashCol(s, hashV).as(s"h$i") }: _*)
          hashed.rdd.treeAggregate(fresh())(
            (arr, row) => {
              var i = 0
              while (i < arr.length) { arr(i).putLong(row.getLong(i)); i += 1 }
              arr
            },
            (a, b) => {
              var i = 0
              while (i < a.length) { a(i).mergeInPlace(b(i)); i += 1 }
              a
            },
            depth = 2)
        }
      bloomSpecs.indices.foreach { i =>
        val p = if (keys.nonEmpty && i == 0) bloomPath(name, id)
          else auxBloomPath(name, id, bloomSpecs(i))
        val out = Files.newOutputStream(p)
        try bfs(i).writeTo(out) finally out.close()
      }
    }

    // aux key sets are recorded even when the row count exceeded the bloom
    // ceiling (like `keys`): a missing bloom FILE means "always scan", and
    // compaction derives the intended layout from the manifest
    appendManifest(name, id, kind, upsert, keys, auxKeys, dataSchema, hashV)
    Some(id)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
      finally s.close()
    }

  /** Row-content hash used for lineage checksums, in the given version
    * (see HashVCurrent): columns in lexicographic name order, stable across
    * the column reordering of partitioned read-back.
    */
  private def rowHashCol(columns: Seq[String], v: Int) =
    if (v >= 2) xxhash64(columns.sorted.map(col): _*)
    else xxhash64(to_json(struct(columns.sorted.map(col): _*)))

  /** Recompute (total rows, global xor checksum) from the COMMITTED files of
    * a segment and compare against the lineage written at commit time —
    * with the hash version the segment's manifest entry records.
    * Partition boundaries differ on read-back, so the comparison is at the
    * order-independent aggregate level — which is exactly the resume
    * integrity question ("are the committed bytes the rows the job saw?").
    */
  def verifyLineage(name: String, id: Long): Boolean = {
    val entry = entries(name).find(_.id == id)
    val committed = entry.map(segDf(name, _))
      .getOrElse(spark.read.parquet(snapshotPath(name, id)))
    val hashV = entry.map(_.hashV).getOrElse(1)
    val actual = committed
      .agg(count(lit(1)).as("rows"),
        coalesce(bit_xor(rowHashCol(committed.columns, hashV)), lit(0L)).as("checksum"))
      .first()
    val recorded = lineage(name) match {
      case None => return false
      case Some(lin) =>
        lin.filter($"snapshot_id" === id)
          .agg(coalesce(sum($"output_rows"), lit(0L)).as("rows"),
            coalesce(bit_xor(when($"output_rows" > 0, $"checksum")), lit(0L)).as("checksum"))
          .first()
    }
    actual.getLong(0) == recorded.getLong(0) && actual.getLong(1) == recorded.getLong(1)
  }

  private def appendManifest(name: String, id: Long, kind: String, upsert: Boolean,
      keys: Seq[String], auxKeys: Seq[Seq[String]],
      schema: org.apache.spark.sql.types.StructType, hashV: Int): Unit = {
    Files.createDirectories(tableDir(name))
    val m = manifest(name)
    val existing =
      if (Files.exists(m)) Files.readAllLines(m, UTF_8).asScala.toSeq else Seq.empty
    val keysJson = keys.map(k => "\"" + k + "\"").mkString("[", ", ", "]")
    // flat-encoded (see auxKeysRe); only appended when present so legacy
    // manifest lines stay byte-identical in format
    val auxJson =
      if (auxKeys.isEmpty) ""
      else auxKeys.map(s => "\"" + s.mkString("|") + "\"")
        .mkString(""", "aux_keys": [""", ", ", "]")
    val schemaB64 = java.util.Base64.getEncoder.encodeToString(schema.json.getBytes(UTF_8))
    // recorded commit time is clamped to be monotone with snapshot id (as
    // Delta monotonizes commit timestamps): readAtTime picks the highest-id
    // entry at-or-before ts and readAt then includes ALL lower-id segments,
    // which is only correct if no lower-id entry carries a LATER timestamp —
    // an NTP step-back between commits would otherwise break as-of reads
    val prevTs = existing.reverseIterator
      .flatMap(l => tsRe.findFirstMatchIn(l).map(_.group(1).toLong))
      .nextOption().getOrElse(0L)
    val entry =
      s"""{"snapshot_id": $id, "table": "$name", "kind": "$kind", "upsert": $upsert, """ +
        s""""keys": $keysJson$auxJson, "schema_b64": "$schemaB64", "hash_v": $hashV, """ +
        s""""committed_at_ms": ${math.max(System.currentTimeMillis(), prevTs)}}"""
    val tmp = tableDir(name).resolve(s"_snapshots.json.tmp-$id")
    Files.write(tmp, (existing :+ entry).mkString("\n").getBytes(UTF_8))
    Files.move(tmp, m, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** All lineage rows for a table across snapshots. */
  def lineage(name: String): Option[DataFrame] = {
    val dirs = snapshots(name).map(id => tableDir(name).resolve(s"snapshot-$id-lineage").toString)
      .filter(p => Files.exists(Paths.get(p)))
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** MERGE-style append (S6 semantics, reference pipeline.py:416-547
    * UNWIND-upsert + dedup-before-write :791-801): rows whose key already
    * exists in the live table are dropped (left_anti); the remainder is
    * written as a DELTA SEGMENT — O(new rows), not O(table). Idempotent:
    * re-running the same append writes nothing. Returns the new segment id
    * (or the current one when nothing new arrived).
    */
  def mergeAppend(name: String, df: DataFrame, keys: Seq[String],
      partitionBy: Seq[String] = Nil, auxBloomKeys: Seq[Seq[String]] = Nil): Long = {
    if (liveEntries(name).isEmpty)
      return commit(name, df.dropDuplicates(keys), partitionBy, bloomKeys = keys,
        auxBloomKeys = auxBloomKeys)
    // the incoming delta feeds TWO jobs now (the bloom probe + the write):
    // persist so the caller's upstream pipeline computes once
    val in = df.dropDuplicates(keys)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val existing = resolveSegments(name, scannedEntries(name, in, keys))
      val fresh = existing match {
        case None => in
        case Some(ex) =>
          in.join(ex.select(keys.map(col): _*), keys, "left_anti")
      }
      // write-first: the anti-join executes ONCE inside the write pass; a
      // zero-row delta is discarded by writeSegment (skipIfEmpty) instead
      // of being probed with a second isEmpty execution
      writeSegment(name, fresh, partitionBy, kind = "delta",
          upsert = false, keys, skipIfEmpty = true, auxKeys = auxBloomKeys) match {
        case None => latestSnapshot(name).get
        case Some(id) =>
          compactIfFragmented(name, autoCompactSegments, partitionBy, keys,
            auxBloomKeys).getOrElse(id)
      }
    } finally in.unpersist(blocking = false)
  }

  /** MERGE with UPDATE semantics (entity-link summary/alias merges): rows
    * whose key is new OR whose content differs from the live row are written
    * as an upsert delta; `read` resolves last-writer-wins per key
    * (merge-on-read). O(changed + new) write. EXCEPT does the change
    * detection null-safely. Idempotent on content.
    */
  def mergeUpsert(name: String, df: DataFrame, keys: Seq[String],
      partitionBy: Seq[String] = Nil, auxBloomKeys: Seq[Seq[String]] = Nil): Long = {
    if (liveEntries(name).isEmpty)
      return commit(name, df.dropDuplicates(keys), partitionBy, bloomKeys = keys,
        auxBloomKeys = auxBloomKeys)
    val in0 = df.dropDuplicates(keys)
    val in = in0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pruning is key-complete (see resolveSegments), so last-writer-wins
      // over the scanned subset resolves every key the delta could touch
      // exactly as the full view does; EXCEPT rows from unrelated keys can
      // never equal an incoming row (row equality implies key equality)
      val existing = resolveSegments(name, scannedEntries(name, in, keys))
      val delta = existing match {
        case None => in
        case Some(ex) => in.except(ex.select(in0.columns.map(col): _*))
      }
      // write-first, as in mergeAppend: EXCEPT executes once, zero-row
      // deltas are discarded inside the single write pass
      writeSegment(name, delta, partitionBy, kind = "delta",
          upsert = true, keys, skipIfEmpty = true, auxKeys = auxBloomKeys) match {
        case None => latestSnapshot(name).get
        case Some(id) =>
          compactIfFragmented(name, autoCompactSegments, partitionBy, keys,
            auxBloomKeys).getOrElse(id)
      }
    } finally in.unpersist(blocking = false)
  }

  /** LSM-style amortized compaction: when the live manifest holds more than
    * `maxSegments` segments, rewrite the resolved table as ONE full snapshot
    * (collapsing the merge-on-read window). Auto-invoked after merge writes,
    * so each row is rewritten at most once per `maxSegments` appends —
    * amortized O(1/maxSegments) extra write per row — and the read path's
    * segment union stays bounded no matter how many increments land.
    */
  def compactIfFragmented(name: String, maxSegments: Int,
      partitionBy: Seq[String] = Nil, bloomKeys: Seq[String] = Nil,
      auxBloomKeys: Seq[Seq[String]] = Nil): Option[Long] =
    if (liveEntries(name).size > maxSegments)
      read(name).map(df => commit(name, df, partitionBy, bloomKeys, auxBloomKeys))
    else None

  /** Read a stage if committed, else compute + commit it (resume semantics).
    * `bloomKeys` = the table's merge keys when later increments will merge
    * into it (the initial full snapshot then carries a skippable key bloom).
    */
  def computeIfAbsent(name: String, partitionBy: Seq[String] = Nil,
      bloomKeys: Seq[String] = Nil,
      auxBloomKeys: Seq[Seq[String]] = Nil)(f: => DataFrame): DataFrame =
    read(name) match {
      case Some(df) => df
      case None =>
        commit(name, f, partitionBy, bloomKeys, auxBloomKeys)
        read(name).get
    }
}
