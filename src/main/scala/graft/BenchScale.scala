package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.{MutableParquetTable, ParquetTable}

/** sf1-equivalent headline bench: the merge / incremental-dedup / ANN
  * lanes at 10× the sf0.1 fixture (~TPC-H sf1 volume), where the
  * ratios those lanes claim stop being dominated by fixed job costs.
  *
  * No sf1 fixture ships with the sandbox, so the inputs are DERIVED
  * from the driver's sf0.1 parquet — each table unioned `mult` times
  * with shifted surrogate ids; document replicas get a per-replica
  * suffix token (near-duplicates, not byte-duplicates, so the LSH
  * lanes see realistic bucket depth) and embedding replicas a
  * deterministic per-replica perturbation on one component (no exact
  * vector ties). This is a BENCH fixture only — correctness is judged
  * by the oracle harness on the driver's own tables.
  *
  * Points mirror [[Bench]]'s same-named lanes (same batch construction,
  * same warm-sweep-then-interleaved-medians discipline) so the sf0.1 →
  * sf1 movement of each ratio is read off directly:
  *  - `merge_*`: no-op / 10% / 50% / full CoW merges on a 128-file
  *    key-sorted table (~24M rows, ~60 MB files — cluster-shaped).
  *  - `incdedup_*` vs `minhash_resketch_full`: the probe of a
  *    batch-sized ingest against a persisted LSH index vs re-sketching
  *    the whole corpus — at ~100:1 corpus/batch the constant-vs-
  *    corpus-sized claim becomes visible (the sf0.1 3:1 fixture
  *    cannot show it; BENCH_NOTES r6).
  *  - `cosine_topk_native` / `pq_adc_native` / `pq_search_native`:
  *    the ANN serving paths on a 10× vector corpus.
  */
object BenchScale {
  import Bench.{time, runToNoop, copyDir}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val workDir = java.nio.file.Files.createTempDirectory("graft-sf1").toString

    // ---- merge lanes at ~24M rows / 128 files (~sf1 lineitem ×4, the
    //      same ×4 replication Bench applies at sf0.1) ----
    try {
      val baseDir = s"$workDir/merge-base"
      val li0 = Tables.lineitem(spark, sfDir)
      val li = (0 until 4 * mult).map(r => li0.withColumn("rep", lit(r)))
        .reduce(_ unionByName _)
        .withColumn("li_key", monotonically_increasing_id())
      val nFiles = 128
      results("fixture_rows") = li.count().toDouble
      results("merge_fixture_build") =
        time(ParquetTable.writeSorted(li, baseDir, "li_key", nFiles))
      val t = MutableParquetTable(spark, baseDir, "li_key")
      t.commitManifest(baseDir)
      val base0 = spark.read.parquet(baseDir)
      def batchBelow(frac: Double, name: String): DataFrame = {
        val thr = base0.stat.approxQuantile("li_key", Array(frac), 0.001).head.toLong
        base0.where(col("li_key") <= thr)
          .withColumn("l_quantity", col("l_quantity") + 1.0)
          .withColumn("op", lit("upsert"))
          .write.parquet(s"$workDir/batch-$name")
        spark.read.parquet(s"$workDir/batch-$name")
      }
      val empty = base0.withColumn("op", lit("upsert")).limit(0)
      val b10 = batchBelow(0.1, "10")
      val b50 = batchBelow(0.5, "50")
      val bFull = batchBelow(1.0, "full")
      // one untimed sweep (writer JIT / codec init), then interleaved
      // rounds with per-point medians — the Bench discipline
      t.merge(empty, snapshotDir = Some(s"$workDir/v-warm-noop"))
      t.merge(b10, snapshotDir = Some(s"$workDir/v-warm-10"))
      t.merge(b50, snapshotDir = Some(s"$workDir/v-warm-50"))
      t.merge(bFull, snapshotDir = Some(s"$workDir/v-warm-full"))
      val points = Seq(
        "merge_noop" -> ((i: Int) =>
          t.merge(empty, snapshotDir = Some(s"$workDir/v-noop-$i"))),
        "merge_10pct_dirty" -> ((i: Int) =>
          t.merge(b10, snapshotDir = Some(s"$workDir/v-10-$i"))),
        "merge_50pct_dirty" -> ((i: Int) =>
          t.merge(b50, snapshotDir = Some(s"$workDir/v-50-$i"))),
        "merge_full_rewrite" -> ((i: Int) =>
          t.merge(bFull, snapshotDir = Some(s"$workDir/v-full-$i"))))
      val samples = scala.collection.mutable.Map(
        points.map(_._1 -> Vector.empty[Double]): _*)
      for (i <- 1 to 5; (name, run) <- points) {
        samples(name) = samples(name) :+ time(run(i))
        // merge snapshots of a 2+ GB table pile up fast — drop each
        // round's outputs (untimed) so the sandbox disk survives
        MutableParquetTable.deleteDir(
          java.nio.file.Paths.get(s"$workDir/v-${name.split('_')(1) match {
            case "noop" => "noop"; case "10pct" => "10"
            case "50pct" => "50"; case _ => "full"}}-$i"))
      }
      def median(xs: Vector[Double]): Double = {
        val s = xs.sorted; s((s.size - 1) / 2)
      }
      points.foreach { case (name, _) =>
        results(name) = median(samples(name)) }
      // drift-canceled ratio points, the Bench discipline: the median of
      // PER-ROUND ratios is immune to host-speed phases between rounds
      def ratioOf(num: String, den: String): Double = median(
        samples(num).zip(samples(den)).map { case (a, b) => a / b })
      results("merge_ratio_full_over_10pct") =
        ratioOf("merge_full_rewrite", "merge_10pct_dirty")
      results("merge_ratio_full_over_50pct") =
        ratioOf("merge_full_rewrite", "merge_50pct_dirty")
    } catch { case e: Throwable =>
      System.err.println(s"[bench-sf1] merge experiment failed: ${e.getMessage}")
    }

    // ---- incremental dedup at ~100:1 corpus/batch ----
    try {
      graft.plans.MinHashSignature.register(spark)
      val d0 = Tables.documents(spark, sfDir)
        .select(col("doc_id"), lower(col("text")).as("text"))
      // replicas are NEAR-duplicates (one appended token) under shifted
      // ids — realistic LSH bucket depth instead of byte-identical rows
      val corpus = (0 until mult).map(r =>
        d0.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" replicamark$r")).as("text")))
        .reduce(_ unionByName _)
        .write.parquet(s"$workDir/docs-corpus")
      val corpusDf = spark.read.parquet(s"$workDir/docs-corpus")
      results("dedup_corpus_docs") = corpusDf.count().toDouble
      // the ingest batch: ~1% of the corpus, under fresh ids
      d0.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
        .write.parquet(s"$workDir/docs-batch")
      val batchDf = spark.read.parquet(s"$workDir/docs-batch")
      results("dedup_batch_docs") = batchDf.count().toDouble
      val root = s"$workDir/inc-idx"
      results("incdedup_index_seed") = time {
        graft.operators.Dedup.dedupIncremental(root, corpusDf, "text",
          "doc_id", threshold = 0.25, native = true).pairs.count(): Unit
      }
      def probe(extend: Boolean): Unit =
        graft.operators.Dedup.dedupIncremental(root, batchDf, "text",
          "doc_id", threshold = 0.25, native = true,
          extendIndex = extend).pairs.count(): Unit
      probe(extend = false) // warm
      results("incdedup_probe_pairs") =
        (1 to 2).map(_ => time(probe(extend = false))).min
      val seeded = s"$workDir/inc-idx-seeded"
      copyDir(root, seeded)
      results("incdedup_ingest") = (1 to 2).map { _ =>
        MutableParquetTable.deleteDir(java.nio.file.Paths.get(root))
        copyDir(seeded, root)
        time(probe(extend = true))
      }.min
      // the alternative the incremental index replaces: re-sketch the
      // WHOLE corpus+batch on every ingest (the batch-LSH pipeline)
      val full = corpusDf.unionByName(batchDf)
      def resketch(): Unit = runToNoop(graft.operators.Dedup.minHashPairs(
        full, "text", "doc_id", threshold = 0.25, native = true))
      resketch() // warm
      results("minhash_resketch_full") = (1 to 2).map(_ => time(resketch())).min

      // ---- persisted BM25 index on the same 10× corpus: term-pruned
      //      probe vs re-tokenizing recompute — the contrast only shows
      //      its shape once the corpus dwarfs the probed postings ----
      val bmRoot = s"$workDir/bm25-idx"
      val bmq = Seq("data", "merge", "window")
      results("bm25_index_seed") = time(
        graft.operators.CorpusPrep.bm25SeedIndex(
          bmRoot, corpusDf, "text", "doc_id", indexFiles = 64))
      def bmProbe(): Unit = runToNoop(
        graft.operators.CorpusPrep.bm25TopKIndexed(spark, bmRoot, bmq, 15))
      def bmRecompute(): Unit = runToNoop(
        graft.operators.CorpusPrep.bm25TopK(corpusDf, "text", "doc_id", bmq, 15))
      bmProbe(); bmRecompute() // warm
      results("bm25_probe_indexed") = (1 to 2).map(_ => time(bmProbe())).min
      results("bm25_recompute") = (1 to 2).map(_ => time(bmRecompute())).min
      runToNoop(spark.read.format("graft").load(s"$bmRoot/postings")
        .where(col("term").isin(bmq: _*)))
      results("bm25_probe_files") =
        graft.sources.GraftSource.lastScanFiles.size.toDouble
      results("bm25_index_files") = MutableParquetTable
        .manifestFileNames(graft.streaming.CdcMergeSink
          .latestSnapshot(s"$bmRoot/postings"))
        .map(_.size).getOrElse(0).toDouble
    } catch { case e: Throwable =>
      System.err.println(s"[bench-sf1] incdedup experiment failed: ${e.getMessage}")
    }

    // ---- graph lanes: PageRank / BFS supersteps on a 10× node+edge
    //      graph (each replica its own component — node AND edge count
    //      scale together, so the per-superstep shuffle-pair cost is
    //      read directly) ----
    try {
      val o0 = Tables.orders(spark, sfDir)
      val l0 = Tables.lineitem(spark, sfDir)
      val e0 = o0.join(l0, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"),
          (lit(SparkEntry.SuppNodeOffset) + col("l_suppkey")).as("sk"))
        .agg(count(lit(1)).as("w"))
      val rep = (0 until mult).map { r =>
        e0.select((col("c") + lit(r * 10000000L)).as("src"),
          (col("sk") + lit(r * 10000000L)).as("dst"), col("w"))
      }.reduce(_ unionByName _)
      rep.unionByName(rep.select(col("dst").as("src"),
          col("src").as("dst"), col("w")))
        // overwrite: a rerun against an existing workDir must re-measure,
        // not throw into the catch-all and silently skip the lane
        .write.mode("overwrite").parquet(s"$workDir/graph-edges")
      val eg = spark.read.parquet(s"$workDir/graph-edges")
      results("graph_edges") = eg.count().toDouble
      results("pagerank_6step") = time(runToNoop(
        graft.operators.Graph.pageRank(eg, iterations = 6)))
      val seeds = eg.select(col("src").as("node_id")).distinct()
        .where(pmod(col("node_id"), lit(10L)) === 0)
      results("bfs_4hop") = time(runToNoop(
        graft.operators.Graph.shortestPaths(eg, seeds, maxHops = 4)))
      // round-11 graph tier at 10x edges: star-contraction components
      // (each replica is its own component — the label frame proves
      // it), HITS, and 4-round synchronous label propagation
      results("connected_components") = time(runToNoop(
        graft.operators.Graph.connectedComponents(eg, maxRounds = 16)))
      results("hits_4iter") = time(runToNoop(
        graft.operators.Graph.hits(eg, iterations = 4)))
      results("label_prop_4round") = time(runToNoop(
        graft.operators.Graph.labelPropagation(eg, rounds = 4)))
      // round-12: directed SCC — forward edges + a quarter reversed, so
      // real multi-node SCCs exist and the peel pays >1 outer round
      val dirEdges = rep.select(col("src"), col("dst"))
        .unionByName(rep.where(pmod(col("src"), lit(4L)) === 0)
          .select(col("dst").as("src"), col("src").as("dst")))
      results("scc_directed") = time(runToNoop(
        graft.operators.Graph.stronglyConnectedComponents(dirEdges,
          maxRounds = 32)))
    } catch { case e: Throwable =>
      System.err.println(s"[bench-sf1] graph experiment failed: ${e.getMessage}")
    }

    // ---- ANN serving on a 10× vector corpus ----
    try {
      graft.plans.CosineSimilarity.register(spark)
      val e0 = Tables.embeddings(spark, sfDir)
      // deterministic per-replica perturbation on component 0 — replicas
      // are distinct vectors, no exact ties in the top-k
      (0 until mult).map { r =>
        val jit = r.toFloat / 1000f
        e0.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> " +
            s"if(i = 0, x + cast($jit as float), x))").as("embedding"))
      }.reduce(_ unionByName _)
        .write.parquet(s"$workDir/emb")
      val e = spark.read.parquet(s"$workDir/emb")
      results("ann_corpus_vecs") = e.count().toDouble
      val q = e.where(col("vec_id") < 200)
      runToNoop(Similarity.bruteForceTopK(
        e.limit(50), q.limit(5), "embedding", "vec_id", 10, native = true))
      results("cosine_topk_native") = (1 to 2).map(_ => time(runToNoop(
        Similarity.bruteForceTopK(e, q, "embedding", "vec_id", 10,
          native = true)))).min
      val books = Similarity.pqCodebooks(e, "embedding", "vec_id",
        dim = 64, m = 8, ksub = 16, kmeansIters = 1)
      results("pq_build_codebooks") = time {
        Similarity.pqCodebooks(e, "embedding", "vec_id",
          dim = 64, m = 8, ksub = 16, kmeansIters = 1)
      }
      val codesDir = s"$workDir/pq-codes"
      results("pq_encode") = time {
        Similarity.pqEncodePacked(spark, e, "embedding", "vec_id", books,
          dim = 64).write.parquet(codesDir)
      }
      val codesDf = spark.read.parquet(codesDir)
      def adcOnly() = runToNoop(Similarity.pqTopKEncoded(
        spark, codesDf, e, q, books, "embedding", "vec_id", k = 10,
        dim = 64, rerank = 0, native = true))
      adcOnly() // warm
      results("pq_adc_native") = (1 to 2).map(_ => time(adcOnly())).min
      def search() = runToNoop(Similarity.pqTopKEncoded(
        spark, codesDf, e, q, books, "embedding", "vec_id", k = 10,
        dim = 64, rerank = 50, native = true))
      search() // warm
      results("pq_search_native") = (1 to 2).map(_ => time(search())).min
      // SQ8: the 4x rung on the same corpus/query load — scan cost should
      // land between cosine_topk_native (4*dim bytes) and pq (m bytes)
      graft.plans.Sq8Cosine.register(spark)
      val sqDir = s"$workDir/sq-codes"
      results("sq_encode") = time {
        Similarity.sqEncode(e, "embedding", "vec_id", native = true)
          .write.parquet(sqDir)
      }
      val sqCodes = spark.read.parquet(sqDir)
      def sqSearch(rerank: Int) = runToNoop(Similarity.sqTopKEncoded(
        spark, sqCodes, e, q, "embedding", "vec_id", k = 10, rerank = rerank,
        native = true))
      sqSearch(0); sqSearch(30) // warm
      results("sq_scan_native") = (1 to 2).map(_ => time(sqSearch(0))).min
      results("sq_search_native") = (1 to 2).map(_ => time(sqSearch(30))).min
    } catch { case e: Throwable =>
      System.err.println(s"[bench-sf1] ann experiment failed: ${e.getMessage}")
    }

    // ---- round-13 pins: the r12/r13 non-graph rewrites at 10× volume
    //      (q40 two-level agg, q193 CDC novelty incl. the skew-guarded
    //      exchange, q204 thresholded levenshtein, q221 containment
    //      discovery) plus the r13 Bloom-prefiltered triangle closing
    //      join — evidence that the wins grow (or at least hold) with
    //      scale rather than being local-phase artifacts ----
    try {
      import graft.functions.TextFunctions
      val docs10 = {
        val d0 = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        (0 until mult).map(r =>
          d0.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
            concat(col("text"), lit(s" replicamark$r")).as("text")))
          .reduce(_ unionByName _)
      }
      docs10.write.mode("overwrite").parquet(s"$workDir/docs10")
      val d10 = spark.read.parquet(s"$workDir/docs10")

      // q40 shape: two-level distinct + (approx, exact) agg
      val li0 = Tables.lineitem(spark, sfDir)
      val li10 = (0 until mult).map(r =>
        li0.select(col("l_returnflag"),
          (col("l_partkey") + lit(r * 1000000L)).as("l_partkey")))
        .reduce(_ unionByName _)
      def q40shape(): Unit = runToNoop(li10
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
          count(col("l_partkey")).as("exact_parts")))
      q40shape() // warm
      results("approx_distinct_10x") = (1 to 2).map(_ => time(q40shape())).min

      // q193 shape: CDC chunk novelty (native kernel + skew-guarded
      // chunk exchange)
      def cdcNov(): Unit = runToNoop(
        graft.operators.CorpusPrep.cdcChunkNovelty(d10, "doc_id", "text"))
      cdcNov() // warm
      results("cdc_novelty_10x") = (1 to 2).map(_ => time(cdcNov())).min

      // q204 shape: banded-levenshtein fuzzy key join with planted twins
      val ks = d10.where(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          lower(substring(trim(col("text")), 1, 12)).as("k"))
        .where(length(col("k")) >= 12)
      val seed = ks.where(col("doc_id") % 50 === 0)
      val tw1 = seed.select((col("doc_id") + 100000000L).as("doc_id"),
        concat(substring(col("k"), 1, 3), lit("x"),
          substring(col("k"), 5, 8)).as("k"))
      val fuzz = ks.unionByName(tw1)
      def fuzzy(): Unit = runToNoop(
        graft.operators.Dedup.editDistancePairs(fuzz, "k", "doc_id",
          maxDist = 2))
      fuzzy() // warm
      results("edit_distance_10x") = (1 to 2).map(_ => time(fuzzy())).min

      // q221 shape: prefix-filtered containment discovery over 10×
      // shingle sets (materialized once, the r12 move)
      val sets = graft.operators.Materialize.ck(d10.select(
        col("doc_id").as("id"),
        array_distinct(TextFunctions.shingles(lower(col("text")), 3))
          .as("elems")))
      def contain(): Unit = runToNoop(
        graft.operators.Dedup.containmentPairs(sets, 0.9,
          maxPostingWidth = 32)._1)
      contain() // warm
      results("containment_10x") = (1 to 2).map(_ => time(contain())).min

      // r13: triangle counts on a 10× co-supply graph — the closing
      // join's Bloom prefilter at a volume where the wedge table is the
      // dominant shuffle
      val sp = li0.select(col("l_partkey").as("p"), col("l_suppkey").as("sv"))
        .distinct()
      val edges0 = sp.as("x").join(sp.as("y"),
          col("x.p") === col("y.p") && col("x.sv") < col("y.sv"))
        .groupBy(col("x.sv").as("src"), col("y.sv").as("dst"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >= 4 &&
          pmod(col("src") * 131 + col("dst"), lit(10)) < 4)
        .select(col("src"), col("dst"))
      val edges10 = (0 until mult).map(r =>
        edges0.select((col("src") + lit(r * 1000000L)).as("src"),
          (col("dst") + lit(r * 1000000L)).as("dst")))
        .reduce(_ unionByName _)
      edges10.write.mode("overwrite").parquet(s"$workDir/tri-edges")
      val te = spark.read.parquet(s"$workDir/tri-edges")
      results("triangle_edges") = te.count().toDouble
      def tri(): Unit = runToNoop(graft.operators.Graph.triangleCounts(te))
      tri() // warm
      results("triangles_10x") = (1 to 2).map(_ => time(tri())).min
    } catch { case e: Throwable =>
      System.err.println(s"[bench-sf1] r13 experiment failed: ${e.getMessage}")
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json = s"""{"metric":"sf1_headline","value":${
      results.getOrElse("merge_full_rewrite", -1.0)},"unit":"sec","queries":$qs,"sf":"${sfDir}x$mult"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT", "/tmp/BENCH_SF1.json")),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    MutableParquetTable.deleteDir(java.nio.file.Paths.get(workDir))
    spark.stop()
    // Final stdout line, after spark.stop(), same contract shape as Bench.
    println(json)
  }
}
