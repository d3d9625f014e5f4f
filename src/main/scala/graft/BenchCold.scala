package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** DISK-PRESSURE ANN lanes: the SQ8/PQ byte-bound claim measured on
  * COLD page caches instead of argued from byte counts.
  *
  * The sandbox's RAM (~128 GiB) dwarfs any corpus that fits its disk,
  * so "bigger fixture" alone can never make scans IO-bound — instead
  * each cold lane explicitly drops the page cache
  * (`/proc/sys/vm/drop_caches`, root-only; the JSON records whether the
  * drop actually worked) and reads the corpus from the device. Warm
  * lanes re-scan cache-hot for the same-kernel contrast. Three rungs on
  * one query load (k=10, 5 probe vectors, rerank=0 — the pure scan):
  *
  *  - `cold_float_scan`  : exact cosine over array<float> (4·dim B/vec)
  *  - `cold_sq8_scan`    : fused packed-byte cosine (dim B/vec)
  *  - `cold_pq_adc_scan` : PQ asymmetric-distance (m B/vec)
  *
  * Corpus: the sf0.1 embeddings replicated `SPARK_GRAFT_COLD_MULT`
  * times (default 20000 → 40M vectors, ~10 GB of floats vs ~2.5 GB SQ8
  * vs ~0.3 GB PQ) by one narrow explode — each replica id-shifted and
  * deterministically perturbed on component 0 so there are no exact
  * vector ties. Bench fixture only; correctness is the oracle gate's
  * job. Writes BENCH_COLD.json in the CWD.
  */
object BenchCold {
  import Bench.{time, runToNoop}

  private def dropCaches(): Boolean =
    try {
      Runtime.getRuntime.exec(Array("sync")).waitFor()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/proc/sys/vm/drop_caches"), "3\n")
      true
    } catch { case _: Throwable => false }

  private def dirBytes(d: String): Long = {
    val p = java.nio.file.Paths.get(d)
    if (!java.nio.file.Files.exists(p)) return 0L
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_COLD_MULT", "20000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val workDir =
      java.nio.file.Files.createTempDirectory("graft-bench-cold").toString

    graft.plans.CosineSimilarity.register(spark)
    graft.plans.Sq8Cosine.register(spark)
    graft.plans.PqAdcScore.register(spark)

    val e0 = Tables.embeddings(spark, sfDir)
    val q = e0.where(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).localCheckpoint(eager = true)

    // one narrow explode builds the corpus: replica r gets shifted ids
    // and a deterministic component-0 perturbation (no exact ties)
    val floatDir = s"$workDir/emb"
    results("corpus_build") = time {
      e0.select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0), lit(mult - 1))).as("__r"))
        .select((col("vec_id") + col("__r") * 1000000L).as("vec_id"),
          expr("transform(embedding, (x, i) -> if(i = 0, " +
            "cast(x + __r / cast(1e9 as double) as float), x))")
            .as("embedding"))
        .repartition(32)
        .write.parquet(floatDir)
    }
    val e = spark.read.parquet(floatDir)
    results("corpus_vecs") = e.count().toDouble
    results("float_bytes_mb") = dirBytes(floatDir) / 1e6

    val sqDir = s"$workDir/sq"
    results("sq_encode") = time {
      Similarity.sqEncode(e, "embedding", "vec_id", native = true)
        .write.parquet(sqDir)
    }
    val sqCodes = spark.read.parquet(sqDir)
    results("sq8_bytes_mb") = dirBytes(sqDir) / 1e6

    val books = Similarity.pqCodebooks(e0, "embedding", "vec_id",
      dim = 64, m = 8, ksub = 16, kmeansIters = 1)
    val pqDir = s"$workDir/pq"
    results("pq_encode") = time {
      Similarity.pqEncodePacked(spark, e, "embedding", "vec_id", books,
        dim = 64).write.parquet(pqDir)
    }
    val pqCodes = spark.read.parquet(pqDir)
    results("pq_bytes_mb") = dirBytes(pqDir) / 1e6

    def floatScan() = runToNoop(Similarity.bruteForceTopK(
      e, q, "embedding", "vec_id", 10, native = true))
    def sqScan() = runToNoop(Similarity.sqTopKEncoded(
      spark, sqCodes, e, q, "embedding", "vec_id", k = 10, rerank = 0,
      native = true))
    def pqScan() = runToNoop(Similarity.pqTopKEncoded(
      spark, pqCodes, e, q, books, "embedding", "vec_id", k = 10,
      dim = 64, rerank = 0, native = true))

    // warm (cache-hot) lanes: warm sweep, then best-of-2
    floatScan(); sqScan(); pqScan()
    results("warm_float_scan") = (1 to 2).map(_ => time(floatScan())).min
    results("warm_sq8_scan") = (1 to 2).map(_ => time(sqScan())).min
    results("warm_pq_adc_scan") = (1 to 2).map(_ => time(pqScan())).min

    // cold lanes: drop the page cache before EVERY run; best-of-2 so a
    // single scheduler hiccup doesn't masquerade as IO cost
    var dropOk = true
    def cold(f: () => Unit): Double =
      (1 to 2).map { _ =>
        dropOk &= dropCaches()
        time(f())
      }.min
    results("cold_float_scan") = cold(floatScan _)
    results("cold_sq8_scan") = cold(sqScan _)
    results("cold_pq_adc_scan") = cold(pqScan _)
    results("cold_drop_ok") = if (dropOk) 1.0 else 0.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val json = s"""{"metric":"cold_ann","value":${
      results.getOrElse("cold_float_scan", -1.0)
    },"unit":"sec","queries":$qs,"sf":"${sfDir}x$mult"}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_COLD.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try graft.sources.MutableParquetTable.deleteDir(
      java.nio.file.Paths.get(workDir))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
