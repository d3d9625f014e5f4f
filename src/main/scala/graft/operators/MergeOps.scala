package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational merge semantics — the reference's core capability
  * (upsert: ParquetRewriter.java:157-167 + the sorted merge cursor
  * ParquetBlockMutator.java:129-186; delete: ParquetRewriter.java:187-191)
  * re-expressed as declarative joins so Catalyst picks the physical strategy
  * (sort-merge for large sides, broadcast-hash for small update batches, AQE
  * switching at runtime).
  *
  * Semantics contract:
  *  - an update batch is a DataFrame with the base schema plus an `op`
  *    column in {"upsert","delete"} (README.md:36-43's Thrift
  *    `union Update` as a column);
  *  - within a batch, last-writer-wins by batch order when a `seq` column
  *    is provided; otherwise the batch must have unique keys (the reference
  *    enforces strictly-ascending unique keys, ParquetRewriter.java:35-37,
  *    256-258 — order-free joins replace that invariant);
  *  - result = (base ∖ batchKeys) ∪ upserts — deletes of absent keys are
  *    no-ops, upserts of absent keys are inserts.
  */
object MergeOps {

  /** Insert-or-replace by key (S9/S12). `updates` has base schema. */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = base.columns
    // union + row_number()=1 dedup: one shuffle on key, no join build side;
    // `src=1` rows (updates) win over `src=0` (base) rows with the same key.
    val tagged = base.select(cols.map(col): _*).withColumn("__src", lit(0))
      .unionByName(updates.select(cols.map(col): _*).withColumn("__src", lit(1)))
    val w = Window.partitionBy(col(key)).orderBy(col("__src").desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(cols.map(col): _*)
  }

  /** Delete by key (S10/S11/S14): left anti join. Accepts a NESTED key
    * path (`person.uuid` — the reference locates keys by `ColumnPath`,
    * ParquetRewriter.java:84): a USING join needs top-level columns, so
    * dotted keys join on an aliased key expression instead. */
  def deleteByKey(base: DataFrame, deleteKeys: DataFrame, key: String): DataFrame =
    if (key.contains("."))
      base.join(deleteKeys.select(col(key).as("__gk0")).distinct(),
        col(key) === col("__gk0"), "left_anti")
    else
      base.join(deleteKeys.select(col(key)).distinct(), Seq(key), "left_anti")

  /** Combined upsert+delete batch in one pass (comboTest,
    * ParquetRewriterTests.java:298-316):
    * result = (base anti-join batchKeys) ∪ (batch where op=upsert).
    * One anti join + one union — no full-outer join needed because a key
    * present in the batch always replaces or removes the base row.
    */
  def applyMutations(base: DataFrame, batch: DataFrame, key: String,
                     opCol: String = "op", seqCol: Option[String] = None): DataFrame =
    applyMutationsMulti(base, batch, Seq(key), opCol, seqCol)

  /** [[applyMutations]] on a COMPOSITE key: row identity is the full
    * column tuple (e.g. (tenant, id) or (date, id)). Same one-anti-join +
    * union shape — the shuffle key is simply wider. */
  def applyMutationsMulti(base: DataFrame, batch: DataFrame, keys: Seq[String],
                          opCol: String = "op",
                          seqCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "at least one merge-key column required")
    val cols = base.columns
    // last-writer-wins within the batch (SURVEY.md §7.5)
    val effective = seqCol match {
      case Some(s) =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(s).desc)
        batch.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
      case None => batch
    }
    val survivors =
      if (keys.exists(_.contains(".")))
        // NESTED key paths (reference ColumnPath parity,
        // ParquetRewriter.java:84): a USING join requires top-level
        // columns, so the key tuple joins as aliased expressions — same
        // anti-join shape, same shuffle key
        base.join(
          effective.select(keys.zipWithIndex.map {
            case (k, i) => col(k).as(s"__gk$i") }: _*).distinct(),
          keys.zipWithIndex.map { case (k, i) => col(k) === col(s"__gk$i") }
            .reduce(_ && _),
          "left_anti")
      else
        base.join(effective.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val inserts = effective.where(col(opCol) === "upsert").select(cols.map(col): _*)
    survivors.select(cols.map(col): _*).unionByName(inserts)
  }
}
