package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.operators.MergeOps

/** Result of a copy-on-write merge: where the new snapshot lives and which
  * files were rewritten vs passed through untouched.
  *
  * The byte accessors are the engine's merge-job metrics — the analog of
  * the reference's per-merge timing/size report (ParquetRewriter.java:
  * 349-359): how much data the CoW left untouched vs re-encoded. Driver-
  * side `Files.size` only (cost scales with FILE COUNT, never data). */
final case class MergeResult(
    snapshotDir: String,
    rewrittenFiles: Seq[String],
    passthroughFiles: Seq[String],
    insertedFileCount: Int) {

  private def sz(fs: Seq[String]): Long =
    fs.map(f => java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum

  /** Bytes passed through untouched (hard-linked, never decoded). */
  def bytesPassedThrough: Long = sz(passthroughFiles)

  /** Bytes of source data the merge had to read and re-encode. */
  def bytesRewrittenInput: Long = sz(rewrittenFiles)

  /** Bytes this merge physically wrote (snapshot minus passthrough). */
  def bytesWritten: Long = {
    val linked = passthroughFiles
      .map(f => java.nio.file.Paths.get(f).getFileName.toString).toSet
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(snapshotDir))
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .filterNot(p => linked(p.getFileName.toString))
      .map(java.nio.file.Files.size).sum
    finally s.close()
  }

  /** Fraction of the source table's bytes the CoW left untouched — the
    * reference's partial-rewrite headline number (README.md:109-111). */
  def passthroughFraction: Double = {
    val total = bytesPassedThrough + bytesRewrittenInput
    if (total == 0) 1.0 else bytesPassedThrough.toDouble / total
  }

  /** One-line JSON summary for logs/telemetry. */
  def summaryJson: String =
    s"""{"snapshotDir":"$snapshotDir","filesLinked":${passthroughFiles.size},""" +
      s""""filesRewritten":${rewrittenFiles.size},""" +
      s""""filesInserted":$insertedFileCount,""" +
      s""""bytesPassedThrough":$bytesPassedThrough,""" +
      s""""bytesRewrittenInput":$bytesRewrittenInput,""" +
      s""""bytesWritten":$bytesWritten,""" +
      s""""passthroughFraction":$passthroughFraction}"""
}

/** A key-sorted Parquet table supporting copy-on-write merges.
  *
  * This is the Spark-native re-expression of the reference's whole design
  * (ParquetRewriter.java:29-40): apply upserts/deletes to a key-sorted
  * Parquet dataset while leaving clean data untouched. The reference works
  * at row-group granularity inside one file (raw passthrough,
  * ParquetRewriter.java:312-322); at cluster scale the natural CoW unit is
  * the *file* — clean files are passed through as metadata-only links and
  * never opened, dirty files are rewritten by a distributed merge job.
  *
  * Keys may be any numeric type or strings — the reference's canonical key
  * is a uuid `Binary` under signed-lexicographic order (README.md:26-43,
  * ParquetRewriter.java:35-37); here both key families route through one
  * order-preserving byte encoding ([[KeyBytes]]) that matches Spark's sort
  * order and parquet's UNSIGNED string stats order.
  *
  * Layout invariant (README.md:21): files hold disjoint key ranges, each
  * internally sorted — produced by [[ParquetTable.writeSorted]] and
  * PRESERVED by `merge`: rewritten data is sliced at the neighboring clean
  * files' range boundaries (per dirty run), so no output file ever spans a
  * passthrough file's range and chained merges keep routing correct.
  * Dirty-file detection = footer key ranges (the reference's loadStats zone
  * map, ParquetRewriter.java:239-251) binary-searched against the update
  * keys (the seekToKey routing of ParquetRewriter.java:263-283, made
  * set-wise).
  *
  * Atomicity: a snapshot is committed by `manifest.json` (file inventory +
  * key ranges + row counts), written LAST via temp-file + atomic rename.
  * A crash mid-merge leaves a snapshot directory without a manifest —
  * detectably partial ([[MutableParquetTable.isCommitted]]) — while the
  * prior snapshot is untouched. The single-file reference gets the same
  * property from one `writer.end` (ParquetRewriter.java:129-146); at
  * 100 TB, snapshot validity must be decidable from metadata alone.
  *
  * Scale notes (100 TB): footer stats are read on executors; the per-file
  * ranges involved in routing are tiny (one row per file) and broadcast;
  * only dirty files are scanned, and the rewrite job is one task per dirty
  * file's worth of data. A no-op merge touches zero data files
  * (noChangesTest analog, ParquetRewriterTests.java:318-323).
  */
final class MutableParquetTable(spark: SparkSession, val dir: String, val key: String) {

  import MutableParquetTable._

  def read(): DataFrame = spark.read.parquet(dir)

  /** Per-file [minKey, maxKey] from footers only. */
  def fileRanges(): DataFrame = ParquetStats.fileKeyRanges(spark, dir, key)

  /** Commit `outDir` as a snapshot of this table's key: build the manifest
    * from its files' footers and write it atomically. For snapshot dirs
    * produced OUTSIDE `merge` — e.g. a compaction output — so they join
    * the committed chain with the same read/prune/crash guarantees. */
  def commitManifest(outDir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(outDir))
    val files = try s.iterator().asScala.map(_.toString)
      .filter(_.endsWith(".parquet")).toList.sorted
    finally s.close()
    require(files.nonEmpty, s"nothing to commit in $outDir")
    writeManifest(outDir, Nil, files)
  }

  /** Route update keys to files: a key is owned by the last file (in key
    * order) whose minKey <= key, or the first file if below all ranges
    * (the reference's "insert into current block" rule,
    * ParquetRewriter.java:263-283). Returns the owning files. */
  def dirtyFiles(updateKeys: DataFrame): Seq[String] =
    routedFiles(sortedRanges(), updateKeys)

  private def sortedRanges(): Seq[ParquetStats.FileKeyRange] =
    ParquetStats.fileKeyRangesTyped(spark, dir, key)
      .sortBy(_.minBytes)(KeyBytes.ordering)

  private def routedFiles(ranges: Seq[ParquetStats.FileKeyRange],
                          updateKeys: DataFrame): Seq[String] = {
    if (ranges.isEmpty) return Seq.empty
    val mins: Array[(String, Array[Byte])] =
      ranges.map(r => (r.file, r.minBytes)).toArray
    val bcast = spark.sparkContext.broadcast(mins)
    val keyName = updateKeys.columns.head
    import spark.implicits._
    val routed: Dataset[String] =
      updateKeys.schema.head.dataType match {
        case StringType =>
          updateKeys.select(col(keyName).cast("string")).as[String]
            .mapPartitions { it =>
              val rs = bcast.value
              it.map(k => route(KeyBytes.fromString(k), rs))
            }
        case _ =>
          updateKeys.select(col(keyName).cast("long")).as[Long]
            .mapPartitions { it =>
              val rs = bcast.value
              it.map(k => route(KeyBytes.fromLong(k), rs))
            }
      }
    routed.distinct().collect().toSeq.sorted
  }

  /** Copy-on-write merge. `batch` = base schema + op column.
    * Writes a new snapshot directory: clean files hard-linked (fallback:
    * copied) without ever being opened; dirty files re-merged and rewritten
    * sorted, sliced at clean-file range boundaries; manifest written last
    * as the commit marker. Returns the merge summary. */
  def merge(batch: DataFrame, opCol: String = "op",
            snapshotDir: Option[String] = None): MergeResult = {
    val outDir = snapshotDir.getOrElse(s"$dir-v${System.currentTimeMillis()}")
    Files.createDirectories(Paths.get(outDir))

    val ranges = sortedRanges()
    // dirty/clean split by FILE NAME: footer stats yield `file:/…` URIs
    // while the local listing yields the caller's path form (possibly
    // relative) — comparing full paths would silently classify every file
    // clean AND re-merge the dirty ones (duplicate rows)
    val routed = routedFiles(ranges, batch.select(key)).map(fileName).toSet
    // non-cut expansion (see KeyBytes.expandNonCut): the run slices below
    // are key-range filters, so a key straddling a file boundary (repeated
    // keys — out of the primary-key contract, matching the reference's
    // unique-key requirement) would otherwise lose rows or leave stale
    // copies beside a replacement
    val dirtyNames = KeyBytes.expandNonCut(ranges.size,
        i => ranges(i).minBytes, i => ranges(i).maxBytes,
        ranges.zipWithIndex.collect {
          case (r, i) if routed(fileName(r.file)) => i
        }.toSet)
      .map(i => fileName(ranges(i).file))
    val allFiles = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toList.sorted
      finally s.close()
    }
    val (dirty, clean) = allFiles.partition(f => dirtyNames.contains(fileName(f)))

    // metadata-only passthrough of clean files (S6 analog)
    clean.foreach { f =>
      val src = Paths.get(f)
      val dst = Paths.get(outDir, src.getFileName.toString)
      try Files.createLink(dst, src)
      catch { case _: Exception =>
        Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING) }
    }

    var inserted = 0
    if (dirty.nonEmpty || clean.isEmpty) {
      // distributed re-merge of just the dirty slice
      val base =
        if (dirty.nonEmpty) spark.read.parquet(dirty: _*)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          batch.drop(opCol).schema)
      // persist: each dirty run below re-scans the merged result with a
      // different range slice; without the persist every slice would re-run
      // the merge join
      val merged = MergeOps.applyMutations(base, batch, key, opCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (ranges.isEmpty) {
          merged.repartitionByRange(1, col(key)).sortWithinPartitions(col(key))
            .write.mode("append").parquet(outDir)
          inserted = 1
        } else {
          // Maximal runs of CONSECUTIVE dirty files in global key order.
          // Each run is rewritten separately, sliced to
          // [run.head.min, nextFile.min): when dirty files are
          // non-contiguous (files 1 and 3 dirty, 2 clean), one merged
          // write could range-sample boundaries spanning clean file 2's
          // range — a later merge would then route keys inside that
          // spanning file to file 2, leaving stale rows behind. Slicing at
          // the clean boundaries preserves the disjoint-range invariant
          // across chained merges.
          val dirtyIdx = ranges.zipWithIndex.collect {
            case (r, i) if dirtyNames.contains(fileName(r.file)) => i
          }
          val runs = dirtyIdx.foldLeft(Vector.empty[Vector[Int]]) {
            case (acc, i) if acc.nonEmpty && acc.last.last == i - 1 =>
              acc.init :+ (acc.last :+ i)
            case (acc, i) => acc :+ Vector(i)
          }
          runs.foreach { run =>
            val lower = if (run.head == 0) None else Some(ranges(run.head).min)
            val upper = if (run.last == ranges.size - 1) None
                        else Some(ranges(run.last + 1).min)
            // single run ⇒ the slice is provably the whole merged set
            // (dirty-file rows lie in their own ranges ⊂ [lower, upper);
            // batch keys route into the run ⇒ lower <= k < upper), so skip
            // the filter pass over the persisted data
            val slice = if (runs.size == 1) merged else (lower, upper) match {
              case (Some(lo), Some(up)) =>
                merged.where(col(key) >= lit(lo) && col(key) < lit(up))
              case (Some(lo), None) => merged.where(col(key) >= lit(lo))
              case (None, Some(up)) => merged.where(col(key) < lit(up))
              case (None, None)     => merged
            }
            slice
              .repartitionByRange(run.size, col(key))
              .sortWithinPartitions(col(key))
              .write.mode("append").parquet(outDir)
            inserted += run.size
          }
        }
      } finally merged.unpersist(false)
    }

    // manifest: passthrough files carry their already-read ranges (their
    // bytes are untouched — hard links); footer IO is paid only for the
    // files this merge actually wrote. A no-op merge writes its manifest
    // with ZERO additional IO — still metadata-only end to end.
    val cleanNames = clean.map(fileName).toSet
    val carried = ranges.filter(r => cleanNames.contains(fileName(r.file)))
    val newFiles = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(outDir))
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toList
        .filterNot(f => cleanNames.contains(fileName(f)))
      finally s.close()
    }
    writeManifest(outDir, carried, newFiles)
    MergeResult(outDir, dirty, clean, inserted)
  }

  /** Row-group-granularity CoW merge: like [[merge]], but each dirty
    * file keeps its identity and only its dirty ROW GROUPS re-encode —
    * clean groups are spliced byte-for-byte ([[RowGroupCoW]]), clean
    * files hard-linked as usual. Rewrite bytes scale with dirty *groups*,
    * not dirty *files*: for scattered point updates (one key per file,
    * where [[merge]] degenerates to a full rewrite) this touches a few
    * percent of the data — the reference's partial-rewrite scaling
    * (README.md:109-111) operating across a whole table. One small Spark
    * merge job per dirty file, submitted concurrently.
    *
    * File key ranges can only be preserved or extended toward a file's
    * ownership interval (batch keys route into it), so the disjoint-range
    * invariant and chained merges keep working unchanged.
    *
    * PRECONDITION: unique keys (the primary-key contract). Files are
    * rewritten independently, so a key duplicated ACROSS files cannot
    * have all its copies replaced in one pass — use [[merge]] (which
    * rewrites straddling files together) for out-of-contract data. */
  def mergeFineGrained(batch: DataFrame, opCol: String = "op",
                       snapshotDir: Option[String] = None): MergeResult = {
    val ranges = sortedRanges()
    // an empty (or stat-less) table has nothing to splice — the
    // file-level merge owns the insert-into-empty path; silently
    // committing an empty snapshot would drop the batch
    if (ranges.isEmpty) return merge(batch, opCol, snapshotDir)
    val outDir = snapshotDir.getOrElse(s"$dir-v${System.currentTimeMillis()}")
    Files.createDirectories(Paths.get(outDir))
    val dirtyNames = routedFiles(ranges, batch.select(key)).map(fileName).toSet
    val allFiles = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toList.sorted
      finally s.close()
    }
    val (dirty, clean) = allFiles.partition(f => dirtyNames.contains(fileName(f)))
    clean.foreach { f =>
      val src = Paths.get(f)
      val dst = Paths.get(outDir, src.getFileName.toString)
      try Files.createLink(dst, src)
      catch { case _: Exception =>
        Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING) }
    }

    if (dirty.nonEmpty) {
      val idxByName = ranges.zipWithIndex
        .map { case (r, i) => fileName(r.file) -> i }.toMap
      // batch is re-sliced once per dirty file — persist so the slices
      // scan a materialized batch, not the caller's arbitrary plan
      val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val jobs = dirty.map { f => Future {
          val i = idxByName(fileName(f))
          val lower = if (i == 0) None else Some(ranges(i).min)
          val upper = if (i == ranges.size - 1) None else Some(ranges(i + 1).min)
          val slice = (lower, upper) match {
            case (Some(lo), Some(up)) =>
              b.where(col(key) >= lit(lo) && col(key) < lit(up))
            case (Some(lo), None) => b.where(col(key) >= lit(lo))
            case (None, Some(up)) => b.where(col(key) < lit(up))
            case (None, None)     => b
          }
          RowGroupCoW.rewriteFile(spark, f,
            s"$outDir/${fileName(f)}", key, slice, opCol)
        }}
        Await.result(Future.sequence(jobs), scala.concurrent.duration.Duration.Inf)
      } finally b.unpersist(false)
    }

    val carried = ranges.filter(r => !dirtyNames.contains(fileName(r.file)))
    writeManifest(outDir, carried, dirty.map(f => s"$outDir/${fileName(f)}"))
    MergeResult(outDir, dirty, clean, dirty.size)
  }

  /** Write the snapshot's commit marker: file inventory with key ranges
    * and row counts. Temp-file + atomic rename, LAST — presence of
    * `_manifest.json` IS the commit. */
  private def writeManifest(outDir: String,
                            carried: Seq[ParquetStats.FileKeyRange],
                            newFiles: Seq[String]): Unit = {
    val ranges = (carried ++
      ParquetStats.fileKeyRangesTypedFor(spark, newFiles, key))
      .sortBy(_.minBytes)(KeyBytes.ordering)
    import MutableParquetTable.js
    // files with no key stats (all-null keys — out of contract but
    // possible) can't be range-pruned, but they ARE part of the snapshot:
    // list them without bounds so readCommitted/readRange never lose them
    val rangedNames = ranges.map(r => fileName(r.file)).toSet
    val statless = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(outDir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).filterNot(rangedNames).toList.sorted
      finally s.close()
    }
    val files = (ranges.map { r =>
      s"""{"file":${js(fileName(r.file))},"minKey":${js(r.min.toString)},""" +
        s""""maxKey":${js(r.max.toString)},"rows":${r.rowCount}}"""
    } ++ statless.map(n => s"""{"file":${js(n)}}""")).mkString("[", ",", "]")
    val keyType = ranges.headOption.map(_.min) match {
      case Some(_: java.lang.Long) => "long"
      case Some(_)                 => "string"
      case None                    => "unknown"
    }
    // table schema embedded in the commit (StructType JSON, exact
    // round-trip): readers construct relations from the manifest alone —
    // zero footer probes (the V2 source's relation setup path)
    val schemaJson = (ranges.headOption.map(_.file) orElse
        newFiles.headOption orElse statless.headOption.map(n => s"$outDir/$n"))
      .map(f => spark.read.parquet(f).schema.json)
    val json =
      s"""{"key":${js(key)},"keyType":"$keyType",""" +
        schemaJson.map(s => s""""schema":${js(s)},""").getOrElse("") +
        s""""fileCount":${ranges.size + statless.size},""" +
        s""""totalRows":${ranges.map(_.rowCount).sum},"files":$files}"""
    val tmp = Paths.get(outDir, ManifestName + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(outDir, ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object MutableParquetTable {
  // leading underscore: Spark/Hadoop file indexes treat _-prefixed files as
  // hidden metadata (like _SUCCESS), so the snapshot stays directly readable
  // via spark.read.parquet(dir)
  val ManifestName = "_manifest.json"

  def apply(spark: SparkSession, dir: String, key: String): MutableParquetTable =
    new MutableParquetTable(spark, dir, key)

  /** A snapshot directory is a committed, complete snapshot iff its
    * manifest exists — the mid-merge-crash detector. */
  def isCommitted(snapshotDir: String): Boolean =
    Files.exists(Paths.get(snapshotDir, ManifestName))

  /** Raw manifest JSON, if committed. */
  def readManifest(snapshotDir: String): Option[String] =
    if (isCommitted(snapshotDir))
      Some(Files.readString(Paths.get(snapshotDir, ManifestName)))
    else None

  /** Read a committed snapshot STRICTLY through its manifest: only files
    * the manifest lists are scanned, so stray part files — a concurrent
    * writer, a crashed later merge attempt into the same directory — are
    * invisible. This is the object-store read discipline: the manifest,
    * not the directory listing, defines the table. Throws if the snapshot
    * has no commit marker. */
  def readCommitted(spark: SparkSession, snapshotDir: String): DataFrame = {
    val files = manifestFileNames(snapshotDir).getOrElse(
      throw new IllegalStateException(
        s"$snapshotDir has no $ManifestName — not a committed snapshot"))
    require(files.nonEmpty, s"$snapshotDir manifest lists no files")
    spark.read.parquet(files.map(n => s"$snapshotDir/$n"): _*)
  }

  /** The table schema a committed snapshot's manifest embeds (None for
    * manifests written before schemas were recorded, and for uncommitted
    * directories). Everything inside the embedded schema string is
    * quote-escaped by [[js]], so the manifest's other regex readers can
    * never match keys inside it. */
  def manifestSchema(snapshotDir: String): Option[org.apache.spark.sql.types.StructType] =
    readManifest(snapshotDir).flatMap { m =>
      "\"schema\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(m)
        .map(x => org.apache.spark.sql.types.DataType.fromJson(unjs(x.group(1)))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
    }

  /** The file names a committed snapshot's manifest lists (None when the
    * snapshot has no commit marker). The manifest, not the directory
    * listing, defines the snapshot's contents. */
  def manifestFileNames(snapshotDir: String): Option[Seq[String]] =
    readManifest(snapshotDir).map { m =>
      "\"file\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(m).map(x => unjs(x.group(1))).toSeq
    }

  /** Manifest-pruned range scan: select only the files whose key range
    * intersects [lo, hi] — decided purely from the manifest, ZERO footer
    * or data IO for excluded files — then scan with the residual filter.
    * File-level zone-map pruning one level above parquet's row-group
    * skip: at 100 TB this is the difference between listing/opening a
    * million files and touching the handful a key range lives in.
    * Result ≡ `readCommitted(...).where(key between lo and hi)`. */
  def readRange(spark: SparkSession, snapshotDir: String,
                lo: Any, hi: Any): DataFrame = {
    val (keyName, files) =
      pruneManifestFiles(snapshotDir, Some(lo), Some(hi))
        .getOrElse(throw new IllegalStateException(
          s"$snapshotDir has no $ManifestName — not a committed snapshot"))
    if (files.isEmpty)
      return readCommitted(spark, snapshotDir).where(lit(false))
    spark.read.parquet(files: _*)
      .where(col(keyName) >= lit(lo) && col(keyName) <= lit(hi))
  }

  /** The manifest's key column name and the snapshot files whose key range
    * intersects [lo, hi] (either bound optional; None = unbounded) —
    * decided purely from the manifest. Bounds-less manifest entries (files
    * with no key stats) are always kept. Returns None when the directory
    * has no commit marker. Shared by [[readRange]] and the `graft` SQL
    * data source's filter pushdown. */
  def pruneManifestFiles(snapshotDir: String, lo: Option[Any],
                         hi: Option[Any]): Option[(String, Seq[String])] =
    readManifest(snapshotDir).map { m =>
      val keyName = unjs("\"key\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findFirstMatchIn(m).get.group(1))
      val entry =
        ("\\{\"file\":\"((?:[^\"\\\\]|\\\\.)*)\",\"minKey\":\"((?:[^\"\\\\]|\\\\.)*)\"," +
          "\"maxKey\":\"((?:[^\"\\\\]|\\\\.)*)\"").r
      val loB = lo.map(KeyBytes.fromAny)
      val hiB = hi.map(KeyBytes.fromAny)
      val isLong = m.contains("\"keyType\":\"long\"")
      def enc(s: String): Array[Byte] =
        if (isLong) KeyBytes.fromLong(s.toLong) else KeyBytes.fromString(s)
      val ranged = entry.findAllMatchIn(m)
        .map(e => (unjs(e.group(1)), unjs(e.group(2)), unjs(e.group(3)))).toSeq
      val inRange = ranged.collect {
        case (f, mn, mx)
            if hiB.forall(h => KeyBytes.compare(enc(mn), h) <= 0) &&
               loB.forall(l => KeyBytes.compare(enc(mx), l) >= 0) => f
      }
      val rangedNames = ranged.map(_._1).toSet
      val unprunable = "\"file\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(m).map(x => unjs(x.group(1))).toSeq
        .filterNot(rangedNames)
      (keyName, (inRange ++ unprunable).map(n => s"$snapshotDir/$n"))
    }

  private def fileName(p: String): String =
    new org.apache.hadoop.fs.Path(p).getName

  /** Minimal JSON string escape for the manifest's self-written format. */
  private[sources] def js(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Inverse of [[js]] — manifest readers must unescape what the writer
    * escaped, or string keys/file names containing quotes or backslashes
    * would compare on the wrong bytes and silently mis-prune. */
  private[sources] def unjs(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Binary search over the key-ordered file mins: last file whose
    * min <= key, else the first file. */
  private def route(kb: Array[Byte], rs: Array[(String, Array[Byte])]): String = {
    var lo = 0; var hi = rs.length - 1; var ans = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (KeyBytes.compare(rs(mid)._2, kb) <= 0) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    rs(ans)._1
  }
}
