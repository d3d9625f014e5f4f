package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MergeOps

/** Round-trip mutation semantics, reproducing the reference's test cases
  * (ParquetRewriterTests.java: deletionTest :273-282, insertTest :285-296,
  * comboTest :298-316, noChangesTest :318-323, largeSet :325-341) against
  * the same in-memory oracle pattern (validateMutations :215-244):
  * result == (base minus batch keys) union upserts.
  */
class MergeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def baseDf(rows: Seq[(String, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("key", "value")
  }

  private def batchDf(ups: Seq[(String, String)], dels: Seq[String]): DataFrame = {
    val s = spark; import s.implicits._
    val u = ups.map { case (k, v) => (k, v, "upsert") }
    val d = dels.map(k => (k, null.asInstanceOf[String], "delete"))
    (u ++ d).toDF("key", "value", "op")
  }

  /** In-memory oracle: the reference's validateMutations set algebra. */
  private def oracle(base: Seq[(String, String)], ups: Seq[(String, String)],
                     dels: Seq[String]): Set[(String, String)] = {
    val touched = ups.map(_._1).toSet ++ dels
    base.filterNot(r => touched(r._1)).toSet ++ ups.toSet
  }

  private def run(base: Seq[(String, String)], ups: Seq[(String, String)],
                  dels: Seq[String]): Unit = {
    val got = MergeOps.applyMutations(baseDf(base), batchDf(ups, dels), "key")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === oracle(base, ups, dels))
  }

  // lexicographically sorted stringified keys, as the reference's fixture
  // (ParquetRewriterTests.java:87-91)
  private val keys = (0 until 100).map(_.toString).sorted
  private val base = keys.map(k => (k, s"v$k"))

  test("delete first, middle, and last key (deletionTest)") {
    run(base, Nil, Seq(keys.head, keys(50), keys.last))
  }

  test("delete of absent key is a no-op") {
    run(base, Nil, Seq("zzz-not-there"))
  }

  test("insert before-first, mid, after-last (insertTest)") {
    run(base, Seq(("!", "first"), ("50a", "mid"), ("~", "last")), Nil)
  }

  test("upsert replaces existing payload (appendRecord replace half)") {
    run(base, Seq((keys(10), "replaced"), (keys(99), "replaced2")), Nil)
  }

  test("interleaved upserts and deletes (comboTest)") {
    val ups = (0 until 100 by 7).map(i => (keys(i), s"u$i"))
    val dels = (3 until 100 by 11).map(i => keys(i))
    run(base, ups, dels)
  }

  test("empty batch leaves base unchanged (noChangesTest)") {
    run(base, Nil, Nil)
  }

  test("large alternating delete/upsert set (largeSet)") {
    val bigKeys = (0 until 20000).map(_.toString).sorted
    val bigBase = bigKeys.map(k => (k, s"v$k"))
    val ups = bigKeys.zipWithIndex.collect { case (k, i) if i % 2 == 0 => (k, s"u$k") }
    val dels = bigKeys.zipWithIndex.collect { case (k, i) if i % 2 == 1 => k }
    run(bigBase, ups, dels)
  }

  test("property: random bases and batches match the set-algebra oracle") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val n = 1 + rnd.nextInt(200)
      val b = (0 until n).map(i => (s"k${rnd.nextInt(300)}", s"v$i"))
        .distinctBy(_._1)
      val ups = (0 until rnd.nextInt(50)).map(i => (s"k${rnd.nextInt(300)}", s"u$i"))
        .distinctBy(_._1)
      val dels = (0 until rnd.nextInt(50)).map(_ => s"k${rnd.nextInt(300)}")
        .distinct.filterNot(ups.map(_._1).contains)
      run(b, ups, dels)
    }
  }

  test("last-writer-wins within a batch via seq column") {
    val s = spark; import s.implicits._
    val batch = Seq(
      ("5", "old", "upsert", 1L),
      ("5", "new", "upsert", 2L),
      ("7", "x", "upsert", 1L),
      ("7", null.asInstanceOf[String], "delete", 2L)).toDF("key", "value", "op", "seq")
    val got = MergeOps.applyMutations(baseDf(base), batch, "key", seqCol = Some("seq"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = base.filterNot(r => Set("5", "7")(r._1)).toSet + (("5", "new"))
    assert(got === expected)
  }

  test("upsert() alone inserts and replaces") {
    val s = spark; import s.implicits._
    val ups = Seq(("10", "r"), ("new1", "n")).toDF("key", "value")
    val got = MergeOps.upsert(baseDf(base), ups, "key")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === (base.filterNot(_._1 == "10").toSet + (("10", "r")) + (("new1", "n"))))
  }

  test("deleteByKey() alone removes exactly the keyed rows") {
    val s = spark; import s.implicits._
    val dels = Seq("1", "2", "nope").toDF("key")
    val got = MergeOps.deleteByKey(baseDf(base), dels, "key")
      .collect().map(r => r.getString(0)).toSet
    assert(got === base.map(_._1).toSet -- Set("1", "2"))
  }
}
