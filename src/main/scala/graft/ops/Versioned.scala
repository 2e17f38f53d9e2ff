package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** D22 — snapshot-versioned parquet table ("Delta-lite"): commits publish an
  * immutable MANIFEST naming exactly the data files of one snapshot, and the
  * manifest is always written LAST via an atomic rename — so a reader
  * resolves one manifest and reads one complete snapshot, never a mix of
  * two commits and never a half-written one (the same commit discipline as
  * D12's corpus manifest and D11's swap, promoted to a multi-version log).
  * What this buys a 100 TB lake without a table-format dependency:
  *
  *  - time-travel reads: `read(dir, version)` pins any retained snapshot —
  *    the reproducibility contract a training run needs ("the corpus AS OF
  *    the run's manifest"), and what plain directory reads cannot give once
  *    a writer overwrites in place;
  *  - atomic replace: a new commit becomes visible in one rename; concurrent
  *    readers keep whichever snapshot they resolved;
  *  - rollback: a new manifest re-referencing an old snapshot's files —
  *    O(manifest) metadata, no data rewrite;
  *  - vacuum: delete data files no retained manifest references — safe by
  *    construction because references, not directory listings, define the
  *    table.
  *
  * Layout: `dir/data/v<N>-<token>-<i>.parquet` (files never mutated after
  * commit; names are OPAQUE — only the manifest's reference list defines a
  * snapshot), `dir/manifest-v<N>.json` (version, file names, file count).
  *
  * Concurrency (the Delta protocol in miniature): version `N` belongs to
  * whoever PUBLISHES `manifest-v<N>.json` first — publication is an atomic
  * create-if-absent (temp write + no-overwrite rename via `FileContext`,
  * the HDFS put-if-absent primitive; plus a per-dir JVM monitor that closes
  * the local-filesystem exists/rename TOCTOU window for same-process
  * writers). A committer that loses the race RE-RESOLVES the log and
  * - **rebases appends**: re-reads the new latest manifest and republishes
  *   (its files ++ own staged files) at the next version — appends commute,
  *   so both writers' rows land, serialized, no lost files;
  * - **fails replaces** with [[Versioned.ConcurrentWriteException]]: a
  *   replace that raced would clobber a snapshot it never saw — the caller
  *   must decide, not the library. The winner's snapshot is untouched and
  *   the loser's staged files are unreferenced debris vacuum reclaims.
  * Staging dirs, manifest temps, and data-file names all carry a per-commit
  * random token, so concurrent attempts never collide on intermediate
  * paths either. Readers are unrestricted throughout. (On stores whose
  * rename cannot fail-if-present — e.g. S3 without a coordination layer —
  * cross-PROCESS publication needs an external lock, same as Delta's
  * LogStore contract; same-JVM writers are always safe via the monitor.)
  */
object Versioned {

  /** A REPLACE commit lost the publish race to a concurrent committer (see
    * the object doc): the table moved under it, and replacing a snapshot
    * the caller never observed is not safe to retry blindly.
    */
  final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long) = new Path(dir, f"manifest-v$v%d.json")

  /** All committed versions, ascending; empty for a fresh/absent dir. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest-v") && n.endsWith(".json") =>
        n.stripPrefix("manifest-v").stripSuffix(".json").toLong
      }.sorted.toSeq
  }

  private def manifestNode(spark: SparkSession, dir: String,
                           v: Long): com.fasterxml.jackson.databind.JsonNode = {
    val fs = fsOf(spark, new Path(dir))
    val in = fs.open(manifestPath(dir, v))
    val node = try mapper.readTree(in) finally in.close()
    harvestStats(dir, node)
    node
  }

  // ---- D22f: per-file column min/max (data skipping) ----------------------

  /** Per-file column stats are IMMUTABLE (file names are never reused), so
    * one driver cache serves every manifest: seeded by every manifest read
    * ([[manifestNode]] harvests), filled from parquet FOOTERS (metadata-
    * only, no row reads) for files no manifest has described yet — newly
    * staged commits, or a legacy/foreign manifest without a stats block.
    */
  private val fileStatsCache =
    new java.util.concurrent.ConcurrentHashMap[String, com.fasterxml.jackson.databind.JsonNode]()

  private def harvestStats(dir: String,
                           node: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val st = node.path("stats")
    if (st.isObject) {
      val it = st.fields()
      while (it.hasNext) {
        val e = it.next()
        fileStatsCache.putIfAbsent(s"$dir#${e.getKey}", e.getValue)
      }
    }
  }

  /** Min/max per top-level primitive column of one data file, read from the
    * parquet footer on the driver: `{col: {"t": "l|d|s", "min": …,
    * "max": …}}`. A column qualifies only when every row group recorded
    * usable stats (an all-null group contributes nothing and is fine; a
    * group with stats MISSING disqualifies — pruning must never guess).
    * Unsupported types and unreadable files yield no entry — data skipping
    * degrades to reading the file, never to wrong answers.
    */
  private def footerStats(spark: SparkSession, dir: String,
                          name: String): Option[com.fasterxml.jackson.databind.JsonNode] =
    try {
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(dir, s"data/$name"), spark.sparkContext.hadoopConfiguration))
      try {
        val mins = scala.collection.mutable.LinkedHashMap[String, (String, Any, Any)]()
        val bad = scala.collection.mutable.Set[String]()
        reader.getFooter.getBlocks.forEach { block =>
          block.getColumns.forEach { cc =>
            if (cc.getPath.size == 1) {
              val colName = cc.getPath.toDotString
              val st = cc.getStatistics
              if (st == null || st.isEmpty) { bad += colName; () }
              else if (!st.hasNonNullValue) () // all-null group: bounds unchanged
              else {
                val tpe = cc.getPrimitiveType.getPrimitiveTypeName
                val parsed: Option[(String, Any, Any)] = tpe match {
                  case PrimitiveTypeName.INT64 => Some(("l",
                    st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                    st.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
                  case PrimitiveTypeName.INT32 => Some(("l",
                    st.genericGetMin.asInstanceOf[java.lang.Integer].longValue(),
                    st.genericGetMax.asInstanceOf[java.lang.Integer].longValue()))
                  case PrimitiveTypeName.DOUBLE => Some(("d",
                    st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue(),
                    st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue()))
                  case PrimitiveTypeName.FLOAT => Some(("d",
                    st.genericGetMin.asInstanceOf[java.lang.Float].doubleValue(),
                    st.genericGetMax.asInstanceOf[java.lang.Float].doubleValue()))
                  case PrimitiveTypeName.BINARY
                    if cc.getPrimitiveType.getLogicalTypeAnnotation ==
                      org.apache.parquet.schema.LogicalTypeAnnotation.stringType() =>
                    Some(("s",
                      st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8,
                      st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8))
                  case _ => None
                }
                parsed match {
                  case None => bad += colName; ()
                  case Some((t, mn, mx)) =>
                    val merged = mins.get(colName) match {
                      case Some((t0, m0, x0)) if t0 == t =>
                        val lo = (t, m0, mn) match {
                          case ("l", a: Long, b: Long) => math.min(a, b): Any
                          case ("d", a: Double, b: Double) => math.min(a, b): Any
                          case (_, a: String, b: String) => (if (a <= b) a else b): Any
                          case _ => m0
                        }
                        val hiV = (t, x0, mx) match {
                          case ("l", a: Long, b: Long) => math.max(a, b): Any
                          case ("d", a: Double, b: Double) => math.max(a, b): Any
                          case (_, a: String, b: String) => (if (a >= b) a else b): Any
                          case _ => x0
                        }
                        (t, lo, hiV)
                      case _ => (t, mn, mx)
                    }
                    mins.put(colName, merged); ()
                }
              }
            }
          }
        }
        bad.foreach(mins.remove)
        if (mins.isEmpty) None
        else {
          val obj = mapper.createObjectNode()
          mins.foreach { case (c, (t, mn, mx)) =>
            val cn = obj.putObject(c)
            cn.put("t", t)
            (t, mn, mx) match {
              case ("l", a: Long, b: Long) => cn.put("min", a); cn.put("max", b); ()
              case ("d", a: Double, b: Double) => cn.put("min", a); cn.put("max", b); ()
              case (_, a: String, b: String) => cn.put("min", a); cn.put("max", b); ()
              case _ => ()
            }
          }
          Some(obj)
        }
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Resolve stats for `name`: the immutable cache, else one footer read.
    * None (and no cache entry) when the file has no usable stats.
    */
  private def resolveStats(spark: SparkSession, dir: String,
                           name: String): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val k = s"$dir#$name"
    Option(fileStatsCache.get(k)).orElse {
      val computed = footerStats(spark, dir, name)
      computed.foreach(fileStatsCache.put(k, _))
      computed
    }
  }

  /** The committed stats block of one version: file name → column →
    * (type, min, max). Files without usable stats are absent — every
    * consumer must treat absence as "cannot prune". Exposed for specs and
    * external planners; [[prunedRead]] and [[merge]] consume it internally.
    */
  def fileStats(spark: SparkSession, dir: String,
                version: Long = -1L): Map[String, Map[String, (String, Any, Any)]] = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions under $dir")
    val v = if (version > 0) version else vs.last
    val node = manifestNode(spark, dir, v)
    val st = node.path("stats")
    if (!st.isObject) return Map.empty
    val out = scala.collection.mutable.Map[String, Map[String, (String, Any, Any)]]()
    st.fields().forEachRemaining { e =>
      val cols = scala.collection.mutable.Map[String, (String, Any, Any)]()
      e.getValue.fields().forEachRemaining { ce =>
        val t = ce.getValue.get("t").asText()
        val (mn, mx): (Any, Any) = t match {
          case "l" => (ce.getValue.get("min").asLong(), ce.getValue.get("max").asLong())
          case "d" => (ce.getValue.get("min").asDouble(), ce.getValue.get("max").asDouble())
          case _ => (ce.getValue.get("min").asText(), ce.getValue.get("max").asText())
        }
        cols.put(ce.getKey, (t, mn, mx)); ()
      }
      out.put(e.getKey, cols.toMap); ()
    }
    out.toMap
  }

  private def filesOf(node: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
    val files = node.path("files")
    (0 until files.size()).map(files.get(_).asText())
  }

  private def readManifest(spark: SparkSession, dir: String, v: Long): Seq[String] =
    filesOf(manifestNode(spark, dir, v))

  /** D28 — the snapshot's deletion-vector pointers: data file name → dv
    * sidecar name. Empty for dv-free snapshots and pre-D28 manifests.
    */
  def dvsOf(spark: SparkSession, dir: String, v: Long): Map[String, String] = {
    val node = manifestNode(spark, dir, v).path("dvs")
    if (node.isMissingNode) Map.empty
    else {
      val it = node.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText()) }
      b.result()
    }
  }

  /** Read `names` under dir/data with two synthetic columns appended:
    * `_gdv_f` (the file's base name) and `_gdv_p` (the row's ordinal inside
    * that file) — parquet's `_metadata` constant columns, zero extra I/O.
    * The (file, position) pair is the row's physical identity, which is
    * what a deletion vector masks.
    */
  private def readWithPos(spark: SparkSession, dir: String, names: Seq[String],
                          mergeSchema: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val reader =
      if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
    val df = reader.parquet(names.map(n => s"$dir/data/$n"): _*)
    require(!df.columns.contains("_gdv_f") && !df.columns.contains("_gdv_p"),
      "table schema collides with the reserved _gdv_f/_gdv_p columns")
    df.select(col("*"),
      element_at(split(col("_metadata.file_path"), "/"), -1).as("_gdv_f"),
      col("_metadata.row_index").as("_gdv_p"))
  }

  /** The LIVE deletion-vector rows (file, pos) masking `restrict`'s files:
    * each dv sidecar is read once and filtered to the rows whose data file
    * still POINTS at it — a file re-deleted later points at a newer
    * sidecar, so its rows in the older shared sidecar are dead metadata
    * (vacuumable with the manifest that referenced them), never reapplied.
    */
  private def dvRowsFor(spark: SparkSession, dir: String,
                        dvs: Map[String, String],
                        restrict: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val rel = dvs.filter { case (f, _) => restrict.contains(f) }
    val sess = spark
    import sess.implicits._
    if (rel.isEmpty) Seq.empty[(String, Long)].toDF("file", "pos")
    else {
      val pointers = rel.toSeq.toDF("file", "_dv_src")
      spark.read.parquet(rel.values.toSeq.distinct.map(n => s"$dir/data/$n"): _*)
        .select(col("file"), col("pos"),
          element_at(split(col("_metadata.file_path"), "/"), -1).as("_dv_src"))
        .join(broadcast(pointers), Seq("file", "_dv_src"))
        .select("file", "pos")
    }
  }

  /** Read `names` with the snapshot's deletion vectors APPLIED: a
    * broadcast anti-join of the scan against the dv rows on physical
    * (file, position) identity. DV-free reads take the plain-scan branch —
    * a table that never deletes pays zero plan change. The dv side is
    * broadcast by construction: deletion vectors are the SMALL-delete
    * path (GDPR erasure, spot retractions); bulk deletes belong to
    * [[merge]]'s copy-on-write rewrite.
    */
  private def readApplied(spark: SparkSession, dir: String, names: Seq[String],
                          dvs: Map[String, String],
                          mergeSchema: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val rel = dvs.filter { case (f, _) => names.contains(f) }
    if (rel.isEmpty) {
      val reader =
        if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
      reader.parquet(names.map(n => s"$dir/data/$n"): _*)
    } else {
      val mask = dvRowsFor(spark, dir, rel, names)
        .withColumnRenamed("file", "_gdv_f").withColumnRenamed("pos", "_gdv_p")
      readWithPos(spark, dir, names, mergeSchema)
        .join(broadcast(mask), Seq("_gdv_f", "_gdv_p"), "left_anti")
        .drop("_gdv_f", "_gdv_p")
    }
  }

  /** Per-commit random token: staging dirs, manifest temps, and data-file
    * names all embed one, so concurrent commit ATTEMPTS never collide on
    * intermediate paths (only the manifest publish itself is contended,
    * and that is the atomic create-if-absent).
    */
  private def newToken(): String =
    java.util.UUID.randomUUID.toString.replace("-", "").take(8)

  /** Per-dir JVM monitor serializing resolve→publish for same-process
    * writers — closes the exists/rename TOCTOU window local filesystems
    * leave open. Cross-process safety rides on the store's no-overwrite
    * rename (HDFS FileContext contract).
    */
  private val dirLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(dir: String): Object =
    dirLocks.computeIfAbsent(dir, _ => new Object)

  /** The max streaming epoch as of manifest `prior` — a FRESH read of that
    * manifest (never the driver cache, which a concurrent writer in
    * another process can leave stale-low), falling back to the legacy
    * all-manifests scan for pre-max_epoch tables. −1 for an empty log.
    */
  private def priorMaxEpoch(spark: SparkSession, dir: String,
                            prior: Option[Long]): Long = prior match {
    case None => -1L
    case Some(p) =>
      val node = manifestNode(spark, dir, p)
      if (node.has("max_epoch")) node.get("max_epoch").asLong(-1L)
      else versions(spark, dir).map(epochOf(spark, dir, _)).foldLeft(-1L)(math.max)
  }

  /** Atomically publish `manifest-v<v>.json`, claiming version `v`: temp
    * write + no-overwrite rename (`FileContext` + `Options.Rename.NONE`,
    * the HDFS put-if-absent primitive). Returns false — and removes the
    * temp — when some other committer already owns `v`. The epoch carry
    * (see [[maxEpoch]]) derives from the PRIOR manifest read fresh, so a
    * concurrent writer's higher epoch is never laundered away by a stale
    * driver cache.
    */
  private[graft] def publishManifest(spark: SparkSession, dir: String, v: Long,
                                     files: Seq[String], epoch: Long,
                                     prevMax: Long,
                                     dvs: Map[String, String] = Map.empty,
                                     op: String = "commit"): Boolean = {
    val fs = fsOf(spark, new Path(dir))
    val carried = math.max(epoch, prevMax)
    val node = mapper.createObjectNode()
    node.put("version", v)
    // D22i: the operation log — which kind of commit produced this version
    // and when (wall clock at publish) — powers [[history]] and [[readAsOf]]
    node.put("op", op)
    node.put("ts", System.currentTimeMillis())
    node.put("epoch", epoch)
    node.put("max_epoch", carried)
    node.put("n_files", files.size)
    val arr = node.putArray("files")
    files.foreach(arr.add)
    // D28: deletion-vector pointers — data file name → the dv sidecar
    // holding its deleted row positions. Absent for dv-free snapshots, so
    // pre-D28 manifests and tables that never delete pay nothing.
    if (dvs.nonEmpty) {
      val dvNode = node.putObject("dvs")
      dvs.toSeq.sortBy(_._1).foreach { case (f, d) => dvNode.put(f, d) }
    }
    // D22f: per-file column min/max for data skipping. Old files resolve
    // from the immutable cache (seeded by the manifest reads every commit
    // path already performs); only newly staged files pay a footer read —
    // metadata-only, driver-side, manifest-cardinality bounded. A file
    // with no usable stats is simply absent: readers then cannot prune it,
    // never misread it.
    val statsNode = node.putObject("stats")
    files.foreach { n =>
      resolveStats(spark, dir, n).foreach { s =>
        statsNode.set[com.fasterxml.jackson.databind.JsonNode](n, s); ()
      }
    }
    // temp + rename: the manifest appears atomically or not at all — a
    // crash mid-commit leaves data files with NO manifest, which vacuum
    // reclaims and readers never see
    val tmp = new Path(dir, s"_manifest-v$v-${newToken()}.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    finally out.close()
    val target = fs.makeQualified(manifestPath(dir, v))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, spark.sparkContext.hadoopConfiguration)
    val won =
      try { fc.rename(fs.makeQualified(tmp), target,
        org.apache.hadoop.fs.Options.Rename.NONE); true }
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                   _: java.nio.file.FileAlreadyExistsException |
                   _: org.apache.hadoop.fs.PathExistsException => false }
    if (won) maxEpochCache.put(dir, java.lang.Long.valueOf(carried))
    else fs.delete(tmp, false)
    won
  }

  /** Driver-side running max epoch per table dir — saves even the one
    * small manifest read per skipped replay batch. Write-through from
    * [[publishManifest]]; a fresh JVM faults it in from the latest
    * manifest. Soundness of [[epochWriter]]'s replay guard rests on ONE
    * streaming query per table dir owning its epochs (the epochWriter
    * contract): that query's own commits write through, so the cache
    * always holds the true max of the epochs that matter for its guard.
    * It does NOT rest on staleness being conservative — a foreign writer
    * leaving the cache stale-LOW would make `epoch > cachedMax` pass MORE
    * often, weakening the guard — which is why the COMMIT path never
    * trusts the cache (the epoch carry reads the prior manifest fresh,
    * [[priorMaxEpoch]]), and why foreign batch commits carry epoch −1
    * (they can never lower the carried max).
    */
  private val maxEpochCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def invalidateEpochCache(): Unit = maxEpochCache.clear()

  /** The max streaming epoch ever committed to the table, −1 if none:
    * the latest manifest's carried-forward `max_epoch`. Legacy manifests
    * (written before the field existed) fall back to one scan across
    * retained manifests' own `epoch` fields — the pre-r13 guard — so
    * existing tables keep their replay protection.
    */
  def maxEpoch(spark: SparkSession, dir: String): Long =
    Option(maxEpochCache.get(dir)).map(_.longValue).getOrElse {
      val m = versions(spark, dir).lastOption match {
        case None => -1L
        case Some(latest) =>
          val fs = fsOf(spark, new Path(dir))
          val in = fs.open(manifestPath(dir, latest))
          val node = try mapper.readTree(in) finally in.close()
          if (node.has("max_epoch")) node.get("max_epoch").asLong(-1L)
          else versions(spark, dir).map(epochOf(spark, dir, _)).foldLeft(-1L)(math.max)
      }
      maxEpochCache.put(dir, java.lang.Long.valueOf(m))
      m
    }

  /** The streaming epoch recorded in version `v`'s manifest (-1 for plain
    * batch commits).
    */
  def epochOf(spark: SparkSession, dir: String, v: Long): Long = {
    val fs = fsOf(spark, new Path(dir))
    val in = fs.open(manifestPath(dir, v))
    try mapper.readTree(in).path("epoch").asLong(-1L) finally in.close()
  }

  /** D22b — epoch-idempotent `foreachBatch` sink: commit each micro-batch's
    * full result as a new version of the table — a streaming MATERIALIZED
    * VIEW with time travel (every epoch stays pinnable until vacuumed).
    * Structured Streaming replays the last uncommitted epoch after a crash
    * (the checkpoint advances only after foreachBatch returns), so a replay
    * of an epoch the table already holds must be a no-op — otherwise the
    * restart double-publishes. The guard is the manifest's own epoch field:
    * strictly-greater epochs commit, replays skip. ONE streaming query per
    * table dir owns its epochs; interleaved batch committers are safe in
    * BOTH directions (r15, ADVICE r14): they publish epoch −1 so the
    * carried max never regresses, and when a batch commit wins the publish
    * race against an epoch (the underlying [[commit]] is replace-flavored
    * and throws), the writer RE-RESOLVES and retries — the epoch guard
    * re-checks against the fresh max each attempt, so the retry is
    * idempotent and the streaming query no longer dies on an interleaved
    * batch write.
    */
  def epochWriter(dir: String): (DataFrame, Long) => Unit = (df, epoch) => {
    val s = df.sparkSession
    // Guard on the table's MAX epoch, not the latest manifest's own epoch:
    // a rollback() or plain batch commit() interleaved with the streaming
    // sink writes epoch −1 (or an older epoch) into the newest manifest,
    // and a latest-only read of `epoch` would reset the guard — letting a
    // crash-replayed epoch re-commit (double-publish) despite the
    // idempotence contract (ADVICE r11). Since every manifest carries the
    // max forward (`max_epoch`), the read is O(1) — the driver cache, or
    // one field of one manifest on a fresh JVM — and vacuum cannot erase
    // it (ADVICE r12).
    var attempts = 0
    var done = false
    while (!done && attempts < 50) {
      attempts += 1
      if (epoch <= maxEpoch(s, dir)) done = true
      else
        try { commit(s, df, dir, epoch); done = true }
        catch {
          case _: ConcurrentWriteException =>
          // a batch committer won the race mid-epoch: re-resolve (the
          // guard re-reads the fresh max) and retry; the lost attempt's
          // staged files are vacuum debris
        }
    }
    if (!done) sys.error(
      s"epoch $epoch could not publish to $dir after $attempts attempts " +
        "(pathological contention with batch committers)")
  }

  /** A5d×D22 (r15) — streaming CDC MERGE sink: a `foreachBatch` writer that
    * applies each micro-batch of change events to a Versioned table as ONE
    * keyed [[merge]] commit, epoch-guarded for crash replay exactly like
    * [[epochWriter]]. This is what turns the connector's change feed into
    * INCREMENTAL table maintenance at 100 TB: `epochWriter` republishes the
    * whole materialization every epoch (replace semantics — O(table)),
    * while this rewrites only the files containing the epoch's touched
    * keys (O(delta) with D22f min/max pruning on a clustered layout). The
    * first epoch against a non-existent table bootstraps it: the batch is
    * folded per key (last op by `orderCol` wins, trailing deletes drop)
    * and committed as v1.
    *
    * Replay/idempotence: the epoch rides the merge commit's manifest, so a
    * crash-replayed epoch sees `epoch <= max_epoch` and no-ops; a batch
    * committer racing mid-epoch surfaces as [[ConcurrentWriteException]]
    * and the merge RETRIES against the new head (merge re-derives from the
    * head, so the retry is always well-defined — the object doc's rule).
    */
  def epochMergeWriter(dir: String, keyCol: String, orderCol: String,
                       opCol: String = "operation_type",
                       deleteOp: String = "delete"): (DataFrame, Long) => Unit =
    (df, epoch) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val s = df.sparkSession
      var attempts = 0
      var done = false
      while (!done && attempts < 50) {
        attempts += 1
        if (epoch <= maxEpoch(s, dir)) done = true
        else try {
          if (versions(s, dir).isEmpty) {
            val byKey = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).desc)
            val folded = df
              .withColumn("_rn", row_number().over(byKey))
              .where(col("_rn") === 1 && col(opCol) =!= deleteOp)
              .drop("_rn", opCol)
            commit(s, folded, dir, epoch)
          } else merge(s, df, dir, keyCol, orderCol, opCol, deleteOp, epoch)
          done = true
        } catch {
          case _: ConcurrentWriteException =>
          // a batch committer won mid-epoch: re-resolve against the new
          // head (the guard re-reads max_epoch; merge re-derives) and retry
        }
      }
      if (!done) sys.error(
        s"epoch $epoch merge could not publish to $dir after $attempts attempts " +
          "(pathological contention with batch committers)")
    }

  /** Stage `df`'s parquet parts into immutable token-unique names under
    * data/, returning the placed file names. Runs OUTSIDE any lock — the
    * expensive part of a commit is parallel across writers by design; only
    * the manifest publish is contended.
    */
  private def stage(spark: SparkSession, df: DataFrame, dir: String,
                    attempt: Long): Seq[String] = {
    val base = new Path(dir)
    val fs = fsOf(spark, base)
    fs.mkdirs(new Path(base, "data"))
    val tok = newToken()
    val staging = new Path(base, s"_staging-v$attempt-$tok")
    df.write.mode("overwrite").parquet(staging.toString)
    val parts = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val named = parts.zipWithIndex.map { case (p, i) =>
      val target = new Path(base, f"data/v$attempt%d-$tok-$i%05d.parquet")
      if (!fs.rename(p, target)) sys.error(s"could not place ${p.getName} for v$attempt")
      target.getName
    }
    fs.delete(staging, true)
    named.toSeq
  }

  /** Commit `df` as the next version (REPLACE semantics): stage the parquet
    * write, move the part files to immutable names under data/, publish the
    * manifest LAST. Returns the new version number. `epoch` tags streaming
    * commits for [[epochWriter]]'s replay guard.
    *
    * Concurrency: the log head is snapshotted BEFORE staging; if any other
    * committer advances the table before this one publishes — or wins the
    * atomic publish itself — the commit throws
    * [[Versioned.ConcurrentWriteException]] rather than replace a snapshot
    * it never observed (see the object doc). The staged files become
    * unreferenced debris that [[vacuum]] reclaims; the winner is untouched.
    */
  def commit(spark: SparkSession, df: DataFrame, dir: String, epoch: Long = -1L): Long =
    commitAt(spark, df, dir, epoch, versions(spark, dir).lastOption)

  /** [[commit]] against an EXPLICIT observed basis — the seam
    * [[commitWithRetry]] needs: its `derive` reads the snapshot BEFORE the
    * commit call, so the conflict check must be anchored at that read, not
    * re-snapshotted at commit entry (a foreign commit landing between the
    * two would otherwise slip a stale derivation through as a clean
    * replace — the classic lost-update TOCTOU).
    */
  private def commitAt(spark: SparkSession, df: DataFrame, dir: String,
                       epoch: Long, basis: Option[Long]): Long = {
    val v = basis.getOrElse(0L) + 1
    val named = stage(spark, df, dir, v)
    lockFor(dir).synchronized {
      val head = versions(spark, dir).lastOption
      if (head != basis)
        throw new ConcurrentWriteException(
          s"replace of $dir based on v${basis.getOrElse(0L)} lost to a concurrent " +
            s"commit (head is now v${head.getOrElse(0L)}); staged files are " +
            "unreferenced and vacuumable")
      if (!publishManifest(spark, dir, v, named, epoch,
        priorMaxEpoch(spark, dir, basis), op = "replace"))
        throw new ConcurrentWriteException(
          s"replace of $dir lost the v$v manifest publish to a concurrent " +
            "committer in another process; staged files are unreferenced and vacuumable")
    }
    graft.Tables.invalidateSpread(dir)
    v
  }

  /** Commit `df` as an APPEND: the next version's manifest references the
    * previous snapshot's files UNCHANGED plus the newly staged files — the
    * Delta-style append commit. O(new data) write cost however large the
    * table already is, and the file-level delta between two append
    * versions is recoverable from the manifests alone ([[newFiles]]),
    * which is what incremental downstream maintenance consumes.
    *
    * Concurrency: appends commute, so a lost publish race REBASES — the
    * loser re-reads the new latest manifest and republishes (its files ++
    * own staged files) at the next version. Both writers' rows land, in
    * serialized versions, no lost files, no data rewrite on retry (the
    * staged files are version-agnostic; only the manifest is re-derived).
    */
  def append(spark: SparkSession, df: DataFrame, dir: String, epoch: Long = -1L): Long = {
    val named = stage(spark, df, dir,
      versions(spark, dir).lastOption.getOrElse(0L) + 1)
    publishAppendNamed(spark, dir, named, epoch)
  }

  /** The append publish loop over already-staged file names (shared by
    * [[append]] and [[appendChecked]]).
    */
  private def publishAppendNamed(spark: SparkSession, dir: String,
                                 named: Seq[String], epoch: Long): Long = {
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val published = lockFor(dir).synchronized {
        val prior = versions(spark, dir).lastOption
        val v = prior.getOrElse(0L) + 1
        val prevFiles = prior.map(readManifest(spark, dir, _)).getOrElse(Seq.empty)
        // a rebase over a deleteWhere carries the head's dv pointers — the
        // append adds files, it never unmasks rows
        val prevDvs = prior.map(dvsOf(spark, dir, _)).getOrElse(Map.empty[String, String])
        if (publishManifest(spark, dir, v, prevFiles ++ named, epoch,
          priorMaxEpoch(spark, dir, prior), prevDvs, op = "append")) Some(v) else None
      }
      published match {
        case Some(v) => graft.Tables.invalidateSpread(dir); return v
        case None => // another PROCESS claimed the version mid-window; re-resolve
      }
    }
    sys.error(s"append to $dir could not publish after $attempts attempts " +
      "(pathological cross-process contention)")
  }

  /** A data-quality contract rejected a staged write; nothing was
    * published and the staged files were removed. `failures` holds the
    * failing (check, metric) rows.
    */
  final class ContractViolationException(msg: String,
      val failures: Seq[(String, Double)]) extends RuntimeException(msg)

  /** D23×D22 — WRITE-AUDIT-PUBLISH: stage the parquet files, audit the
    * STAGED BYTES with a [[Contracts]] check list, and publish the manifest
    * only if every check passes. Auditing the staged files (not the input
    * plan) means the contract certifies exactly what a reader of the new
    * version will see — re-running the input query could legally produce
    * different rows (non-deterministic sources), and a writer-side bug that
    * corrupts the parquet encoding is caught too. On violation the staged
    * files are deleted and [[ContractViolationException]] carries the
    * failing metrics; the table head never moves — the fail-closed posture
    * a production lakehouse ingest runs (Delta's CHECK constraints, the WAP
    * pattern). Cost at 100 TB: one extra columnar scan of the NEW files
    * only (appends never re-audit history); the check list itself folds to
    * one aggregation pass ([[Contracts.run]]).
    */
  def appendChecked(spark: SparkSession, df: DataFrame, dir: String,
                    checks: Seq[Contracts.Check], epoch: Long = -1L): Long = {
    val named = stage(spark, df, dir,
      versions(spark, dir).lastOption.getOrElse(0L) + 1)
    auditOrAbort(spark, dir, named, checks, "append")
    publishAppendNamed(spark, dir, named, epoch)
  }

  /** [[commit]] (REPLACE semantics) behind the same write-audit-publish
    * gate as [[appendChecked]]: the staged snapshot is audited before the
    * conflict-checked publish; a violation aborts with the head untouched.
    */
  def commitChecked(spark: SparkSession, df: DataFrame, dir: String,
                    checks: Seq[Contracts.Check], epoch: Long = -1L): Long = {
    val basis = versions(spark, dir).lastOption
    val v = basis.getOrElse(0L) + 1
    val named = stage(spark, df, dir, v)
    auditOrAbort(spark, dir, named, checks, "replace")
    lockFor(dir).synchronized {
      val head = versions(spark, dir).lastOption
      if (head != basis)
        throw new ConcurrentWriteException(
          s"checked replace of $dir based on v${basis.getOrElse(0L)} lost to a " +
            s"concurrent commit (head is now v${head.getOrElse(0L)}); staged files " +
            "are unreferenced and vacuumable")
      if (!publishManifest(spark, dir, v, named, epoch, priorMaxEpoch(spark, dir, basis),
        op = "replace"))
        throw new ConcurrentWriteException(
          s"checked replace of $dir lost the v$v manifest publish to a concurrent " +
            "committer in another process; staged files are unreferenced and vacuumable")
    }
    graft.Tables.invalidateSpread(dir)
    v
  }

  /** Audit staged files; on any failing check delete them and throw. */
  private def auditOrAbort(spark: SparkSession, dir: String, named: Seq[String],
                           checks: Seq[Contracts.Check], kind: String): Unit = {
    val staged = spark.read.parquet(named.map(n => s"$dir/data/$n"): _*)
    // bounded collect: one row per check
    val failed = Contracts.run(staged, checks).collect()
      .filter(!_.getAs[Boolean]("pass"))
      .map(r => (r.getAs[String]("check"), r.getAs[Double]("metric")))
    if (failed.nonEmpty) {
      val base = new Path(dir)
      val fs = fsOf(spark, base)
      named.foreach(n => fs.delete(new Path(base, s"data/$n"), false))
      throw new ContractViolationException(
        s"$kind to $dir rejected by contract: " +
          failed.map { case (c, m) => s"$c=$m" }.mkString(", "), failed.toSeq)
    }
  }

  /** The data files version `to` references that version `since` does not
    * (file NAMES are immutable once committed, so set difference over the
    * manifests IS the delta). `since` ≤ 0 means "everything in `to`".
    * Returns None when `to` is not a pure append of `since` — files were
    * REMOVED (a replace commit or a rollback landed in between), so a
    * file-level delta does not describe the change and the caller must
    * fall back to a full read.
    */
  def newFiles(spark: SparkSession, dir: String,
               since: Long, to: Long): Option[Seq[String]] = {
    val toF = readManifest(spark, dir, to)
    // since ≤ 0 is a pure LISTING of `to`'s files (callers use it as file
    // identity, not as rows) — dv masking doesn't change what files exist
    if (since <= 0) return Some(toF.map(n => s"$dir/data/$n"))
    val toDvs = dvsOf(spark, dir, to)
    val sinceF = readManifest(spark, dir, since).toSet
    if (!sinceF.subsetOf(toF.toSet)) return None
    // a deleteWhere in the span keeps the file set identical but changes
    // ROWS — surviving files must keep their dv pointer unchanged, and the
    // added files must be unmasked, for the file-level delta to be exact
    val sinceDvs = dvsOf(spark, dir, since)
    val added = toF.filterNot(sinceF)
    if (sinceF.exists(f => sinceDvs.get(f) != toDvs.get(f)) ||
        added.exists(toDvs.contains)) None
    else Some(added.map(n => s"$dir/data/$n"))
  }

  /** D22e — row-level CHANGE FEED between two committed versions: what a
    * downstream consumer must apply to move its copy of the table from
    * `from` to `to`, emitted as the table's columns plus `_change_type`.
    * The read-side complement of [[merge]]: merge folds a change set INTO
    * the table; this recovers the net change set OUT of the history.
    *
    * File-level pruning is the scale argument: file names are immutable
    * once committed, so only the files the two manifests DISAGREE on are
    * read — an append's feed reads just the appended files, and a 100 TB
    * table whose commit touched 3 files diffs 3 files' rows, never the
    * table. An [[optimize]] (pure rewrite) reads its rewritten files and
    * correctly nets to an EMPTY feed — which is exactly what [[newFiles]]
    * cannot express (it reports None on any non-append), and why
    * incremental consumers that fall back to full recompute today can use
    * the feed instead.
    *
    * Without `keyCol` the feed is the MULTISET diff (hash-aggregate
    * `exceptAll` both ways over the changed-file rows): `insert` rows in
    * `to` but not `from`, `delete` rows gone. With `keyCol` the feed is
    * keyed like a CDC stream: `insert` (key only in `to`), `delete` (key
    * only in `from`), and a changed key emits `update_preimage` +
    * `update_postimage` — defined for key-unique snapshots, the same
    * contract [[merge]] maintains. Schema evolution across the span is
    * reconciled per side (`mergeSchema`) and the sides aligned on the
    * union of columns, missing ones null.
    *
    * `from` ≤ 0 means "from nothing": every row of `to` as `insert`.
    */
  def changeFeed(spark: SparkSession, dir: String, from: Long, to: Long,
                 keyCol: String = null): DataFrame = {
    import org.apache.spark.sql.functions._
    val vs = versions(spark, dir)
    require(vs.contains(to), s"version $to not present under $dir (have $vs)")
    require(from <= 0 || vs.contains(from),
      s"version $from not present under $dir (have $vs)")
    val toF = readManifest(spark, dir, to)
    val fromF = if (from <= 0) Seq.empty[String] else readManifest(spark, dir, from)
    val toDvs = dvsOf(spark, dir, to)
    val fromDvs =
      if (from <= 0) Map.empty[String, String] else dvsOf(spark, dir, from)
    // a file both manifests share but whose dv POINTER moved changed rows
    // without changing name ([[deleteWhere]]) — read it on both sides,
    // each under its own mask; the diff below nets exactly the masked rows
    val dvChanged = toF.toSet.intersect(fromF.toSet)
      .filter(f => fromDvs.get(f) != toDvs.get(f)).toSeq
    val added = toF.filterNot(fromF.toSet) ++ dvChanged
    val removed = fromF.filterNot(toF.toSet) ++ dvChanged
    def readNames(names: Seq[String], dvs: Map[String, String]): Option[DataFrame] =
      if (names.isEmpty) None
      else Some(readApplied(spark, dir, names, dvs, mergeSchema = true))
    val (aOpt, rOpt) = (readNames(added, toDvs), readNames(removed, fromDvs))
    // union of columns, to-side order first; a side missing a column
    // (evolution across the span) surfaces null for it
    val fields = {
      val changedSides = (aOpt.toSeq ++ rOpt.toSeq).flatMap(_.schema.fields)
      val fs = if (changedSides.nonEmpty) changedSides
               else read(spark, dir, to).schema.fields.toSeq // identical manifests
      fs.foldLeft(Vector.empty[org.apache.spark.sql.types.StructField]) {
        (acc, f) => if (acc.exists(_.name == f.name)) acc else acc :+ f
      }
    }
    def align(df: DataFrame) = df.select(fields.map { f =>
      (if (df.columns.contains(f.name)) col(f.name)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
    val outCols = fields.map(f => col(f.name)) :+ col("_change_type")
    def typed(df: DataFrame, t: String) =
      df.withColumn("_change_type", lit(t)).select(outCols: _*)
    (aOpt.map(align), rOpt.map(align)) match {
      case (Some(a), None) => typed(a, "insert")
      case (None, Some(r)) => typed(r, "delete")
      case (None, None) => // identical manifests: a typed empty frame
        typed(spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(fields)), "insert").limit(0)
      case (Some(a), Some(r)) if keyCol == null =>
        typed(a.exceptAll(r), "insert").unionByName(typed(r.exceptAll(a), "delete"))
      case (Some(a), Some(r)) =>
        val dataCols = fields.map(f => col(f.name))
        val pre = r.select(col(keyCol).as("_k"), struct(dataCols: _*).as("_pre"))
        val post = a.select(col(keyCol).as("_k"), struct(dataCols: _*).as("_post"))
        val j = pre.join(post, Seq("_k"), "full_outer")
        val inserts = typed(j.where(col("_pre").isNull)
          .select(fields.map(f => col("_post." + f.name).as(f.name)): _*), "insert")
        val deletes = typed(j.where(col("_post").isNull)
          .select(fields.map(f => col("_pre." + f.name).as(f.name)): _*), "delete")
        val changed = j.where(col("_pre").isNotNull && col("_post").isNotNull &&
          col("_pre") =!= col("_post"))
        val preRows = typed(changed
          .select(fields.map(f => col("_pre." + f.name).as(f.name)): _*), "update_preimage")
        val postRows = typed(changed
          .select(fields.map(f => col("_post." + f.name).as(f.name)): _*), "update_postimage")
        inserts.unionByName(deletes).unionByName(preRows).unionByName(postRows)
    }
  }

  /** Read a snapshot: the pinned `version`, or the latest when ≤ 0. Reads
    * exactly the manifest's files — concurrent commits and un-vacuumed
    * stale files are invisible by construction — with the snapshot's
    * deletion vectors applied ([[deleteWhere]]); dv-free snapshots keep
    * the plain-scan plan.
    *
    * `mergeSchema = true` reconciles schema ACROSS the snapshot's files —
    * the schema-evolution read for append chains whose later appends added
    * columns (earlier rows surface null for them, parquet's standard
    * evolution semantics). Opt-in because reconciliation reads every
    * file's footer up front: cheap per append batch, not something the
    * default read path should pay on a 100 TB table whose schema never
    * moved.
    */
  def read(spark: SparkSession, dir: String, version: Long = -1L,
           mergeSchema: Boolean = false): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions under $dir")
    val v = if (version > 0) version else vs.last
    require(vs.contains(v), s"version $v not present under $dir (have $vs)")
    readApplied(spark, dir, readManifest(spark, dir, v), dvsOf(spark, dir, v),
      mergeSchema)
  }

  /** D22f — stats-pruned range read: rows of a snapshot where `colName` ∈
    * [lo, hi], reading ONLY the files whose committed min/max overlap the
    * range — Delta-style data skipping from the manifest, no footer or
    * data I/O for skipped files. On a D13 range-clustered or D21-bucketed
    * layout this turns a point/range lookup on a 100 TB table into a
    * few-file read; on an unclustered layout every file overlaps and the
    * read degrades to the plain scan + filter, never to a wrong answer
    * (files without stats are always read). The predicate is applied on
    * top, so the result provably equals `read(...).where(between)`.
    */
  def prunedRead(spark: SparkSession, dir: String, colName: String,
                 lo: Any, hi: Any, version: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions under $dir")
    val v = if (version > 0) version else vs.last
    val stats = fileStats(spark, dir, v)
    def overlaps(t: String, mn: Any, mx: Any): Boolean = t match {
      case "l" => toL(mx) >= toL(lo) && toL(mn) <= toL(hi)
      case "d" => toD(mx) >= toD(lo) && toD(mn) <= toD(hi)
      case _ => mx.toString >= lo.toString && mn.toString <= hi.toString
    }
    val files = readManifest(spark, dir, v)
    val keep = files.filter { n =>
      stats.get(n).flatMap(_.get(colName)) match {
        case Some((t, mn, mx)) => overlaps(t, mn, mx)
        case None => true
      }
    }
    val pred = col(colName) >= lit(lo) && col(colName) <= lit(hi)
    // dv note: committed min/max may describe rows a dv has since masked —
    // a SUPERSET bound, so pruning can read an all-dead file but never
    // skips a live row; the dv-applied read below restores exactness.
    if (keep.isEmpty) read(spark, dir, v).where(pred).limit(0)
    else readApplied(spark, dir, keep, dvsOf(spark, dir, v)).where(pred)
  }

  private def toL(a: Any): Long = a match {
    case n: Number => n.longValue()
    case s => s.toString.toLong
  }
  private def toD(a: Any): Double = a match {
    case n: Number => n.doubleValue()
    case s => s.toString.toDouble
  }

  /** Roll the table back to `to`: a NEW manifest (next version) referencing
    * the old snapshot's files — metadata-only, no data rewrite, and the
    * bad intermediate versions stay readable until vacuumed.
    */
  def rollback(spark: SparkSession, dir: String, to: Long): Long = {
    val files = readManifest(spark, dir, to) // throws if `to` was never committed
    // propagate the rolled-to snapshot's epoch so the rollback manifest
    // never weakens epochWriter's replay guard (belt to the max-across-
    // manifests suspenders above — and vacuum can drop old manifests).
    // Concurrency: metadata-only and intent-preserving ("make the latest
    // snapshot be `to`'s"), so a lost publish race re-resolves and retries
    // at the next version — last-writer-wins serialization, like append.
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val published = lockFor(dir).synchronized {
        val prior = versions(spark, dir).lastOption
        val v = prior.getOrElse(0L) + 1
        if (publishManifest(spark, dir, v, files, epochOf(spark, dir, to),
          priorMaxEpoch(spark, dir, prior), dvsOf(spark, dir, to),
          op = "rollback")) Some(v)
        else None
      }
      published match {
        case Some(v) => graft.Tables.invalidateSpread(dir); return v
        case None =>
      }
    }
    sys.error(s"rollback of $dir could not publish after $attempts attempts")
  }

  /** Stage one dv sidecar parquet (columns `file`, `pos`) and return its
    * immutable name under data/. One file per delete commit: the rows are
    * positions, not data — megabytes where the masked table is terabytes —
    * and the read side broadcasts them whole.
    */
  private def stageDv(spark: SparkSession, rows: DataFrame, dir: String,
                      attempt: Long): String = {
    val base = new Path(dir)
    val fs = fsOf(spark, base)
    fs.mkdirs(new Path(base, "data"))
    val tok = newToken()
    val staging = new Path(base, s"_staging-v$attempt-$tok")
    rows.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val name = f"dv-v$attempt%d-$tok.parquet"
    if (!fs.rename(part, new Path(base, s"data/$name")))
      sys.error(s"could not place dv sidecar for v$attempt")
    fs.delete(staging, true)
    name
  }

  /** D28 — deletion-vector DELETE (merge-on-read): mask every current row
    * matching `predicate` by committing a POSITIONAL sidecar — (file, row
    * ordinal) pairs — and pointing the affected data files at it in the
    * next manifest. ZERO data bytes are rewritten: the complement of
    * [[merge]]'s copy-on-write rewrite, and the shape a 100 TB table
    * needs for the small-delete regime (GDPR erasure of a handful of
    * keys, spot retractions, quarantining a bad crawl slice) where
    * rewriting every touched multi-GB file to drop a few rows would
    * dominate the job. Readers ([[read]], [[prunedRead]], [[changeFeed]],
    * [[merge]], [[optimize]]) apply the mask as a broadcast anti-join on
    * physical (file, position) identity — parquet `_metadata` constant
    * columns, no stored row ids, no schema change.
    *
    * Semantics: deletes the rows of the CURRENT snapshot matching the
    * predicate, evaluated on live rows only (already-masked rows stay
    * masked). Re-deleting a file unions positions into a fresh sidecar and
    * repoints the file — the old sidecar's rows for it become dead
    * metadata reclaimed with their manifest by [[vacuum]]. A predicate
    * matching nothing returns the current version, NO new commit. Time
    * travel is exact: pre-delete versions carry no pointer and read the
    * rows back.
    *
    * Maintenance: [[optimize]] MATERIALIZES dvs (compaction reads masked
    * rows out), so dv chains do not accumulate forever; a dv-bearing file
    * at target size materializes when its dead fraction warrants a
    * rewrite. Stats stay superset-sound (see [[prunedRead]]).
    *
    * Concurrency: replace-flavored OCC like [[merge]] — the predicate was
    * evaluated against the observed head, and a concurrent commit may add
    * or rewrite matching rows, so a lost race throws
    * [[ConcurrentWriteException]] and the RETRY re-derives from the new
    * head (deleteWhere's intent is head-independent; the raced attempt's
    * sidecar is vacuum debris).
    */
  def deleteWhere(spark: SparkSession, dir: String, predicate: Column): Long = {
    import org.apache.spark.sql.functions._
    val basis = versions(spark, dir).lastOption
    require(basis.nonEmpty, s"deleteWhere requires an existing table under $dir")
    val files = readManifest(spark, dir, basis.get)
    val dvs = dvsOf(spark, dir, basis.get)
    val mask = dvRowsFor(spark, dir, dvs, files)
      .withColumnRenamed("file", "_gdv_f").withColumnRenamed("pos", "_gdv_p")
    val matches = readWithPos(spark, dir, files)
      .join(broadcast(mask), Seq("_gdv_f", "_gdv_p"), "left_anti")
      .where(predicate)
      .select(col("_gdv_f").as("file"), col("_gdv_p").as("pos"))
      .persist() // two consumers: affected-file discovery + sidecar write
    try {
      val affected = matches.select("file").distinct()
        .collect().map(_.getString(0)).toSeq // manifest-cardinality bound
      if (affected.isEmpty) return basis.get
      // fresh sidecar = new positions ∪ the affected files' LIVE old
      // positions (their pointers move here; unaffected files keep theirs)
      val carried = dvRowsFor(spark, dir, dvs, affected)
      val v = basis.get + 1
      val dvName = stageDv(spark, matches.unionByName(carried), dir, v)
      lockFor(dir).synchronized {
        val head = versions(spark, dir).lastOption
        if (head != basis)
          throw new ConcurrentWriteException(
            s"deleteWhere on $dir based on v${basis.get} lost to a concurrent " +
              s"commit (head is now v${head.getOrElse(0L)}); the staged sidecar " +
              "is vacuumable — retry: it re-derives from the new head")
        if (!publishManifest(spark, dir, v, files, -1L,
          priorMaxEpoch(spark, dir, basis),
          dvs ++ affected.map(_ -> dvName), op = "delete"))
          throw new ConcurrentWriteException(
            s"deleteWhere on $dir lost the v$v manifest publish to a concurrent " +
              "committer in another process; retry")
      }
      graft.Tables.invalidateSpread(dir)
      v
    } finally { matches.unpersist(); () }
  }

  /** D22c — keyed MERGE: apply a change set (upserts + deletes by key) to
    * the latest snapshot, rewriting ONLY the files that contain matched
    * keys, published as ONE OCC commit. This is the lakehouse primitive
    * that turns a CDC feed ([[graft.events.ChangeEvents.changeSet]]) from
    * a full-table query into incremental table maintenance — what a CDC
    * consumer at 100 TB actually runs per batch (Delta/Iceberg MERGE INTO
    * in miniature).
    *
    * `changes` carries the table's columns plus `opCol` (rows whose op
    * equals `deleteOp` remove their key; every other op upserts the row)
    * and is collapsed to ONE net action per key first — highest `orderCol`
    * wins, the same last-op-wins fold as A5d's cdc_apply, so merging a
    * feed slice commutes with folding it (spec-pinned equality).
    *
    * Scale shape: the touched-file discovery scans ONLY (file, key) — a
    * column-pruned pass over the snapshot joined against the delta's key
    * set (Delta's own find-touched-files join; a D13/D21 key-clustered
    * layout lets parquet skip most row groups in that scan). The rewrite
    * then reads ONLY the affected files: survivors = affected-file rows
    * anti-joined on matched keys, plus the net upserts — unaffected files
    * ride into the new manifest BY NAME, zero bytes rewritten. The delta
    * key set persists for its two consumers (§4); the affected-file NAME
    * list is a driver-bounded collect (manifest-cardinality, the same
    * bound every commit's file list already has).
    *
    * Concurrency: replace-flavored (the rewrite invalidates under ANY
    * concurrent commit — an append may add rows for matched keys, so
    * rebasing blindly would resurrect deleted keys): the head observed at
    * entry must still be the head at publish, else
    * [[ConcurrentWriteException]] — and RETRYING the merge is always
    * safe, because merge re-derives everything from the new head (its
    * intent "apply this change set" is head-independent); staged files
    * from the lost attempt are vacuum debris. The raced-retry recipe is
    * spec-demonstrated; [[commitWithRetry]] is the same idiom for plain
    * replaces.
    */
  def merge(spark: SparkSession, changes: DataFrame, dir: String,
            keyCol: String, orderCol: String,
            opCol: String = "operation_type",
            deleteOp: String = "delete",
            epoch: Long = -1L,
            mergeSchema: Boolean = false): Long = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val basis = versions(spark, dir).lastOption
    require(basis.nonEmpty, s"merge requires an existing table under $dir")
    // The authoritative table schema is ALWAYS the mergeSchema-reconciled
    // union across the snapshot's files: a prior evolved commit leaves the
    // table heterogeneous, and inferring from an arbitrary file (parquet's
    // mergeSchema=false behavior) could pick a pre-evolution file and
    // silently DROP the evolved column from every rewritten survivor —
    // permanent data loss once vacuum reclaims the prior version. The
    // caller's `mergeSchema` flag authorizes widening from the CHANGE SET
    // only; it never weakens how the table's own schema is resolved.
    val snap = read(spark, dir, basis.get, mergeSchema = true)
    val cols = snap.schema.fieldNames.toSeq
    require(!cols.contains(opCol),
      s"table schema already has '$opCol' — pass a distinct opCol")
    // D22c schema evolution (opt-in, Delta's autoMerge in miniature): extra
    // DATA columns on the change set (anything beyond the snapshot schema,
    // the op marker, and a non-schema orderCol) widen the table; survivors
    // from rewritten files null-fill them and files the merge does not
    // touch ride by name — their rows surface null through mergeSchema
    // reads, parquet's standard evolution semantics (the D22 append path's
    // contract, applied to upserts). Off by default: an unexpected column
    // on a change feed is usually a BUG, and silently widening a 100 TB
    // table should take an explicit flag.
    val newCols =
      if (!mergeSchema) Seq.empty
      else changes.schema.fields
        .filterNot(f => cols.contains(f.name) || f.name == opCol || f.name == orderCol)
        .toSeq
    if (!mergeSchema) {
      val extra = changes.schema.fieldNames
        .filterNot(n => cols.contains(n) || n == opCol || n == orderCol)
      require(extra.isEmpty,
        s"change set carries columns not in the table schema: ${extra.toSeq.sorted} — " +
          "pass mergeSchema = true to evolve the table, or drop them")
      // … and must carry EVERY table column: with the table schema resolved
      // across all files, a change set minted against a pre-evolution view
      // would otherwise fail deep in analysis (or, before r16's fix, lose
      // the evolved column outright). Fail here, naming the gap.
      val missing = cols.filterNot(changes.schema.fieldNames.contains)
      require(missing.isEmpty,
        s"change set omits table columns: ${missing.sorted} (the table may have " +
          "been evolved by a prior commit) — include them, or pass " +
          "mergeSchema = true to null-fill omitted columns on upserts")
    }
    val targetCols = cols ++ newCols.map(_.name)
    // null-fill types resolve against snapshot ∪ change columns — needed in
    // BOTH directions under mergeSchema: a change set may omit a column a
    // prior append evolved in, and a touched file may predate it
    val fillType = (snap.schema.fields ++ newCols)
      .map(f => f.name -> f.dataType).toMap
    // net action per key: last op in orderCol wins (ties broken by the
    // caller's orderCol being unique per key, as event ids are)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).desc)
    val net = changes
      .withColumn("_rn", row_number().over(byKey))
      .where(col("_rn") === 1)
      .drop("_rn")
      .persist() // two consumers: touched-file scan + survivor anti-join/upserts
    try {
      val keys = net.select(col(keyCol)).distinct()
      // D22f pruning: files whose committed key min/max cannot contain any
      // change key never enter the touched-file scan — on a range-clustered
      // layout the (file, key) pass reads a handful of files instead of the
      // snapshot. Files without long-typed key stats stay candidates.
      val basisFiles = readManifest(spark, dir, basis.get)
      val stats = fileStats(spark, dir, basis.get)
      val bounded = basisFiles.flatMap(n =>
        stats.get(n).flatMap(_.get(keyCol)).collect {
          case ("l", mn: Long, mx: Long) => (n, mn, mx)
        })
      val dvs = dvsOf(spark, dir, basis.get)
      val candidateNames: Seq[String] =
        if (bounded.isEmpty) basisFiles
        else {
          val sess = spark
          import sess.implicits._
          val rdf = bounded.toDF("_f", "_mn", "_mx")
          val hit = keys.join(broadcast(rdf),
            col(keyCol).cast("long") >= col("_mn") &&
              col(keyCol).cast("long") <= col("_mx"))
            .select("_f").distinct().collect().map(_.getString(0))
          val unbounded = basisFiles.filterNot(bounded.map(_._1).toSet)
          hit.toSeq ++ unbounded
        }
      // touched-file discovery over LIVE rows only — a key whose every row
      // a dv already masked must not drag its file into the rewrite
      val touchedNames: Set[String] =
        if (candidateNames.isEmpty) Set.empty
        else {
          val dmask = dvRowsFor(spark, dir, dvs, candidateNames)
            .withColumnRenamed("file", "_gdv_f").withColumnRenamed("pos", "_gdv_p")
          readWithPos(spark, dir, candidateNames)
            .join(broadcast(dmask), Seq("_gdv_f", "_gdv_p"), "left_anti")
            .select(col("_gdv_f").as("_file"), col(keyCol))
            .join(keys, Seq(keyCol))
            .select("_file").distinct()
            .collect().map(_.getString(0)).toSet
        }
      // rewriting a touched file MATERIALIZES its dv (survivors are read
      // dv-applied and the pointer is dropped); untouched files keep theirs
      val haveChange = net.schema.fieldNames.toSet
      val upserts = net.where(col(opCol) =!= deleteOp)
        .select(targetCols.map { c =>
          if (haveChange(c)) col(c)
          else if (mergeSchema) lit(null).cast(fillType(c)).as(c)
          else col(c) // strict mode: analysis fails naming the column, as before
        }: _*)
      val survivors =
        if (touchedNames.isEmpty) upserts.limit(0)
        else {
          // survivors read schema-reconciled for the same reason as `snap`:
          // a touched file may predate an evolution this merge didn't ask for
          val base = readApplied(spark, dir, touchedNames.toSeq, dvs, mergeSchema = true)
            .join(keys, Seq(keyCol), "left_anti")
          val have = base.schema.fieldNames.toSet
          base.select(targetCols.map { c =>
            if (have(c)) col(c) else lit(null).cast(fillType(c)).as(c)
          }: _*)
        }
      val rewritten = survivors.unionByName(upserts)
      val v = basis.get + 1
      val staged = stage(spark, rewritten, dir, v)
      lockFor(dir).synchronized {
        val head = versions(spark, dir).lastOption
        if (head != basis)
          throw new ConcurrentWriteException(
            s"merge into $dir based on v${basis.get} lost to a concurrent commit " +
              s"(head is now v${head.getOrElse(0L)}); staged files are vacuumable — " +
              "retry the merge: it re-derives from the new head")
        val prevFiles = readManifest(spark, dir, basis.get)
        if (!publishManifest(spark, dir, v,
          prevFiles.filterNot(touchedNames) ++ staged, epoch,
          priorMaxEpoch(spark, dir, basis), dvs -- touchedNames, op = "merge"))
          throw new ConcurrentWriteException(
            s"merge into $dir lost the v$v manifest publish to a concurrent " +
              "committer in another process; retry the merge")
      }
      graft.Tables.invalidateSpread(dir)
      v
    } finally { net.unpersist(); () }
  }

  /** D22d — OPTIMIZE: rewrite the CURRENT snapshot's small files into
    * size-targeted ones and commit the result as a files-replaced version.
    * [[graft.ops.IncrementalAgg]]-style append chains accumulate one file
    * set per micro-batch/commit forever, and D11's directory compaction
    * would break the manifest log (it swaps the directory under the
    * manifests' feet) — this is the in-history rewrite path: history and
    * time travel stay intact (old manifests still reference the old
    * files), and the superseded small files are reclaimed by [[vacuum]]
    * once their manifests age out of retention.
    *
    * Only files under `targetBytes` are rewritten (coalesced to
    * ceil(total/target) files via a shuffle-boundary repartition); files
    * already at size ride into the new manifest by name, zero bytes
    * moved. Needs ≥ 2 small files to act — otherwise returns the current
    * version with NO new commit. The compaction read reconciles schema
    * across the small files (`mergeSchema`) so an evolved append chain
    * compacts to the union schema instead of a random file's.
    *
    * Concurrency: replace-flavored OCC like [[merge]] (the rewrite is
    * invalid under any concurrent commit); [[newFiles]] across an
    * optimize correctly reports None (not a pure append), forcing
    * incremental consumers to their full-recompute fallback.
    */
  def optimize(spark: SparkSession, dir: String,
               targetBytes: Long = 128L * 1024 * 1024,
               clusterBy: Seq[String] = Nil): Long = {
    val basis = versions(spark, dir).lastOption
    require(basis.nonEmpty, s"optimize requires an existing table under $dir")
    val fs = fsOf(spark, new Path(dir))
    val prevFiles = readManifest(spark, dir, basis.get)
    val sized = prevFiles.map { n =>
      n -> fs.getFileStatus(new Path(dir, s"data/$n")).getLen
    }
    val dvs = dvsOf(spark, dir, basis.get)
    // clustered OPTIMIZE (OPTIMIZE ... CLUSTER BY): rewrite the WHOLE
    // snapshot range-sorted on the cluster keys, so every file owns a
    // narrow key slice and the manifest's per-file min/max (D22f) turns
    // prunedRead/merge candidate scans into near-exact file selection —
    // D13's layout discipline applied IN-HISTORY, where D13 itself would
    // break the manifest log. All dvs materialize; size targeting and
    // history semantics are the compaction path's.
    if (clusterBy.nonEmpty) {
      import org.apache.spark.sql.functions.col
      val total = sized.map(_._2).sum
      val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
      val clustered = readApplied(spark, dir, prevFiles, dvs, mergeSchema = true)
        .repartitionByRange(nOut, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
      val v = basis.get + 1
      val staged = stage(spark, clustered, dir, v)
      lockFor(dir).synchronized {
        val head = versions(spark, dir).lastOption
        if (head != basis)
          throw new ConcurrentWriteException(
            s"optimize of $dir based on v${basis.get} lost to a concurrent commit; " +
              "staged files are vacuumable — retry")
        if (!publishManifest(spark, dir, v, staged, -1L,
          priorMaxEpoch(spark, dir, basis), Map.empty, op = "optimize"))
          throw new ConcurrentWriteException(
            s"optimize of $dir lost the v$v manifest publish; retry")
      }
      graft.Tables.invalidateSpread(dir)
      return v
    }
    val (small, big) = sized.partition(_._2 < targetBytes)
    // act when ≥2 small files need coalescing OR a small file carries a
    // deletion vector (the rewrite MATERIALIZES it — dv chains don't
    // accumulate forever; [[deleteWhere]]'s maintenance contract)
    if (small.size < 2 && !small.exists(p => dvs.contains(p._1)))
      return basis.get
    val totalSmall = small.map(_._2).sum
    val n = math.max(1L, (totalSmall + targetBytes - 1) / targetBytes).toInt
    val compacted =
      readApplied(spark, dir, small.map(_._1), dvs, mergeSchema = true)
        .repartition(n)
    val v = basis.get + 1
    val staged = stage(spark, compacted, dir, v)
    lockFor(dir).synchronized {
      val head = versions(spark, dir).lastOption
      if (head != basis)
        throw new ConcurrentWriteException(
          s"optimize of $dir based on v${basis.get} lost to a concurrent commit; " +
            "staged files are vacuumable — retry")
      if (!publishManifest(spark, dir, v, big.map(_._1) ++ staged, -1L,
        priorMaxEpoch(spark, dir, basis), dvs.filter(kv => big.exists(_._1 == kv._1)),
        op = "optimize"))
        throw new ConcurrentWriteException(
          s"optimize of $dir lost the v$v manifest publish; retry")
    }
    graft.Tables.invalidateSpread(dir)
    v
  }

  /** The user-facing retry recipe for replace-flavored commits (r15,
    * VERDICT r14 #7): a REPLACE that loses an OCC race must re-read the
    * new head and RE-DERIVE its result — a blind resubmit would clobber a
    * snapshot it never saw, which is exactly why [[commit]] throws. This
    * wraps that loop: `derive` receives the current snapshot (None for an
    * empty table) and returns the replacement; on
    * [[ConcurrentWriteException]] the loop re-reads and re-derives
    * against the new head. Appends never need this (they rebase
    * internally); use it for read-modify-write replaces and [[merge]]/
    * [[optimize]]-class rewrites built on [[commit]].
    */
  def commitWithRetry(spark: SparkSession, dir: String, maxAttempts: Int = 5)
                     (derive: Option[DataFrame] => DataFrame): Long = {
    var attempts = 0
    while (true) {
      attempts += 1
      // the basis is captured HERE — derive's read and the commit's
      // conflict check anchor to the same observed head (commitAt), so a
      // foreign commit landing anywhere between read and publish is
      // detected and re-derived, never silently overwritten
      val basis = versions(spark, dir).lastOption
      val current = basis.map(v => read(spark, dir, v))
      try return commitAt(spark, derive(current), dir, -1L, basis)
      catch {
        case e: ConcurrentWriteException =>
          if (attempts >= maxAttempts)
            throw new ConcurrentWriteException(
              s"replace of $dir still losing after $attempts derive-and-commit " +
                s"attempts: ${e.getMessage}")
      }
    }
    -1L // unreachable
  }

  /** Drop all but the newest `keepLast` manifests and delete every data
    * file the RETAINED manifests do not reference (files shared with a
    * retained snapshot — e.g. via rollback — survive). Returns the deleted
    * file names. Also reclaims crash debris: staging dirs and data files
    * no manifest ever published.
    *
    * `graceMs` (Delta's retention-check idea, sized down): an unreferenced
    * data file or staging/temp path modified within the last `graceMs` is
    * SPARED — under multi-writer commits (object doc) a concurrent
    * committer's staged-but-not-yet-published files look exactly like
    * crash debris, and deleting them would let the commit publish a
    * manifest referencing vanished files. The default (10 min) dwarfs any
    * stage-to-publish window; pass 0 only for a table known quiescent
    * (tests, decommissioning). Published manifests are never in-flight,
    * so manifest retention ignores the grace.
    */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 2,
             graceMs: Long = 600000L): Seq[String] = {
    require(keepLast >= 1, "must retain at least the latest version")
    val base = new Path(dir)
    val fs = fsOf(spark, base)
    val vs = versions(spark, dir)
    // D22h: tagged versions are PINNED — a named ref (a training-data
    // release, an audit snapshot) holds its manifest and files through any
    // retention window, exactly like Iceberg tags survive snapshot expiry
    val pinned = tags(spark, dir).values.toSet
    val (drop0, keep0) = vs.splitAt(math.max(vs.size - keepLast, 0))
    val keep = keep0 ++ drop0.filter(pinned)
    val drop = drop0.filterNot(pinned)
    // dv sidecars are references too: a retained manifest pointing at a
    // sidecar keeps it alive exactly like a data file
    val live = keep.flatMap(v =>
      readManifest(spark, dir, v) ++ dvsOf(spark, dir, v).values).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    // data/ may not exist yet: vacuum on a table with no commits (or one
    // whose every commit crashed pre-rename) is a legal no-op, not a
    // FileNotFoundException (ADVICE r11)
    val dataDir = new Path(base, "data")
    val deletedData =
      (if (fs.exists(dataDir)) fs.listStatus(dataDir) else Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(st => !live(st.getPath.getName) && st.getModificationTime <= cutoff)
        .map { st => fs.delete(st.getPath, false); s"data/${st.getPath.getName}" }
    val deletedManifests = drop.map { v =>
      fs.delete(manifestPath(dir, v), false); s"manifest-v$v.json"
    }
    // crash debris: unpublished staging dirs AND half-written manifest
    // temps (a writeManifest crash between create and rename leaves
    // _manifest-v*.json.tmp, which nothing else reclaims — ADVICE r11),
    // both behind the same in-flight grace as unreferenced data
    val debris = fs.listStatus(base)
      .filter { st =>
        val n = st.getPath.getName
        (n.startsWith("_staging-") ||
          (n.startsWith("_manifest-") && n.endsWith(".tmp"))) &&
          st.getModificationTime <= cutoff
      }
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
    graft.Tables.invalidateSpread(dir)
    (deletedData ++ deletedManifests ++ debris).toSeq
  }

  // ---- D22i: the operation log -------------------------------------------

  /** One row per retained version, newest last: (version, op, ts, epoch,
    * n_files) — DESCRIBE HISTORY for the table. `op` says what produced
    * the version (append / replace / merge / optimize / delete / rollback
    * / commit), `ts` is the publish wall clock. Manifests written before
    * the fields existed report op="commit" and the manifest FILE's
    * modification time (same clock, coarser fs granularity) so old tables
    * stay auditable. Metadata-only: one small read per retained manifest,
    * never a data scan.
    */
  def history(spark: SparkSession, dir: String): Seq[(Long, String, Long, Long, Int)] = {
    val fs = fsOf(spark, new Path(dir))
    versions(spark, dir).map { v =>
      val node = manifestNode(spark, dir, v)
      val ts =
        if (node.has("ts")) node.get("ts").asLong()
        else fs.getFileStatus(manifestPath(dir, v)).getModificationTime
      (v,
        if (node.has("op")) node.get("op").asText() else "commit",
        ts,
        node.path("epoch").asLong(-1L),
        node.path("n_files").asInt(0))
    }
  }

  /** Time-travel by WALL CLOCK: read the newest version whose publish `ts`
    * is ≤ `tsMillis` — "the corpus as the pipeline saw it at 14:00", the
    * timestamp face of `read(dir, version)`. Throws when the table has no
    * version that old (distinguishable from an empty frame: the caller
    * asked about a time before the table existed). Commit timestamps are
    * assigned at publish under the OCC serialization, so they ascend with
    * versions on one table; clock skew across WRITERS is the usual
    * lakehouse caveat (Delta shares it) — version pins (tags, D22h) are
    * the reproducibility primitive, timestamps are the exploration one.
    */
  def readAsOf(spark: SparkSession, dir: String, tsMillis: Long): DataFrame = {
    val h = history(spark, dir).filter(_._3 <= tsMillis)
    require(h.nonEmpty,
      s"no version of $dir published at or before $tsMillis " +
        s"(earliest is ${history(spark, dir).headOption.map(_._3)})")
    read(spark, dir, h.last._1)
  }

  // ---- D22h: named refs (tags) -------------------------------------------

  private val tagNameRule = "[A-Za-z0-9][A-Za-z0-9._-]{0,63}"
  private def tagPath(dir: String, name: String) =
    new Path(new Path(dir, "refs"), s"$name.json")

  /** D22h — tag a version under a stable name: the reproducibility primitive
    * a training-data pipeline needs most — "model M trained on
    * `corpus@release-2026-08`" must stay readable long after the retention
    * window rolls the version number out. A tag is a tiny JSON ref under
    * `refs/`; [[vacuum]] treats tagged versions as pinned (manifest and
    * files survive any `keepLast`), and [[readTag]] resolves the name to a
    * time-travel read. Tags are IMMUTABLE once created — publishing uses
    * the same temp + no-overwrite rename as manifests, so two writers
    * racing the same name get one winner and one clean error; [[retag]] is
    * the explicit atomic-replace escape hatch, [[untag]] releases the pin.
    * Defaults to the latest version. Returns the pinned version.
    */
  def tag(spark: SparkSession, dir: String, name: String,
          version: Long = -1L): Long = {
    require(name.matches(tagNameRule), s"tag name must match $tagNameRule: '$name'")
    val vs = versions(spark, dir)
    val v = if (version < 0) vs.lastOption.getOrElse(
      throw new IllegalArgumentException(s"cannot tag an empty table: $dir"))
    else version
    require(vs.contains(v), s"version $v does not exist under $dir (have $vs)")
    val fs = fsOf(spark, new Path(dir))
    fs.mkdirs(new Path(dir, "refs"))
    val tmp = new Path(dir, s"_staging-tag-${newToken()}.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"name":"$name","version":$v}""".getBytes("UTF-8"))
    finally out.close()
    val target = fs.makeQualified(tagPath(dir, name))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, spark.sparkContext.hadoopConfiguration)
    val won =
      try { fc.rename(fs.makeQualified(tmp), target,
        org.apache.hadoop.fs.Options.Rename.NONE); true }
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                   _: java.nio.file.FileAlreadyExistsException |
                   _: org.apache.hadoop.fs.PathExistsException => false }
    if (!won) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"tag '$name' already exists on $dir — tags are immutable; " +
          "untag first or retag to move it atomically")
    }
    v
  }

  /** Atomically move an existing (or create a new) tag — rename with
    * OVERWRITE, so readers see the old target or the new, never a gap.
    */
  def retag(spark: SparkSession, dir: String, name: String, version: Long): Long = {
    require(name.matches(tagNameRule), s"tag name must match $tagNameRule: '$name'")
    require(versions(spark, dir).contains(version),
      s"version $version does not exist under $dir")
    val fs = fsOf(spark, new Path(dir))
    fs.mkdirs(new Path(dir, "refs"))
    val tmp = new Path(dir, s"_staging-tag-${newToken()}.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"name":"$name","version":$version}""".getBytes("UTF-8"))
    finally out.close()
    val target = fs.makeQualified(tagPath(dir, name))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, spark.sparkContext.hadoopConfiguration)
    // delete the temp ref if the overwrite rename throws (mirrors tag's
    // lost-race cleanup) — a failed retag must not leak staging debris that
    // vacuum's manifest-based sweep won't classify
    try fc.rename(fs.makeQualified(tmp), target,
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch { case e: Throwable => fs.delete(tmp, false); throw e }
    version
  }

  /** Delete a tag; returns whether it existed. The pinned version becomes
    * ordinary history and the next [[vacuum]] may reclaim it.
    */
  def untag(spark: SparkSession, dir: String, name: String): Boolean = {
    require(name.matches(tagNameRule), s"tag name must match $tagNameRule: '$name'")
    fsOf(spark, new Path(dir)).delete(tagPath(dir, name), false)
  }

  /** All tags on the table, name → version. Missing refs/ dir = no tags. */
  def tags(spark: SparkSession, dir: String): Map[String, Long] = {
    val fs = fsOf(spark, new Path(dir))
    val refs = new Path(dir, "refs")
    if (!fs.exists(refs)) Map.empty
    else fs.listStatus(refs).filter(_.getPath.getName.endsWith(".json")).map { st =>
      val in = fs.open(st.getPath)
      val node = try mapper.readTree(in) finally in.close()
      node.get("name").asText() -> node.get("version").asLong()
    }.toMap
  }

  /** Time-travel read through a named ref. */
  def readTag(spark: SparkSession, dir: String, name: String): DataFrame = {
    val v = tags(spark, dir).getOrElse(name,
      throw new IllegalArgumentException(s"no tag '$name' on $dir"))
    read(spark, dir, v)
  }
}
