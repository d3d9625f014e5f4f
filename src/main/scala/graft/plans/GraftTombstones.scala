package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.broadcast

import graft.sources.{GraftBatchTable, MutableParquetTable}

/** DELETION-TOMBSTONE read rewrite: a graft relation over a snapshot
  * carrying a tombstone sidecar ([[MutableParquetTable.TombstoneName]])
  * is replaced — during analysis, via the injected post-hoc rule — with
  *
  * {{{ relation LEFT ANTI JOIN broadcast(tombstones) ON key tuple }}}
  *
  * so deleted rows subtract logically while the scan itself stays
  * Spark's vectorized parquet read with codegen — the Spark-first form
  * of merge-on-read deletion vectors (keys address exactly one logical
  * row in a graft table, so key tombstones ≡ position deletes). The
  * rewrite reaches a fixpoint by substituting the table handle with its
  * `tombstonesApplied` twin; relations without tombstones (and the
  * change-feed relation) are untouched. The scan builder independently
  * FAILS FAST on tombstoned snapshots when this rule is absent
  * (a session without GraftExtensions), so a raw scan can never
  * resurrect deleted rows silently.
  *
  * Write plans are unaffected: V2 write nodes hold their target table
  * outside the plan's children, so only READ positions rewrite.
  *
  * Scale: the sidecar is delta-sized by construction (scattered deletes
  * between materializations), so the anti-join build side broadcasts —
  * map-side subtraction, no extra shuffle at any table size. */
object GraftTombstoneRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // DML statements (root-level commands) keep their target relation
    // bare: GraftDmlRule owns them and FAILS FAST on tombstoned targets
    // — wrapping first would just hide the target from its matcher (and
    // post-hoc rule order is not guaranteed). A tombstoned SOURCE
    // relation inside a DML is caught by the scan-builder guard when the
    // compiled batch executes — an error, never resurrection.
    case _: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable |
         _: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable |
         _: org.apache.spark.sql.catalyst.plans.logical.UpdateTable => plan
    case _ => rewrite(plan)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftBatchTable] && {
            val t = r.table.asInstanceOf[GraftBatchTable]
            !t.feedMode && !t.tombstonesApplied && t.tombstoneRows > 0 &&
              t.keyName.isDefined
          } =>
        val t = r.table.asInstanceOf[GraftBatchTable]
        val keys = t.keyName.get +: t.moreKeyNames
        val classic = SparkSession.active
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        // the SAME relation (output attribute identity preserved — parent
        // operators keep resolving), just marked applied
        val clean = r.copy(table = t.withTombstonesApplied)
        val cleanDf = org.apache.spark.sql.classic.GraftShims
          .ofRows(classic, clean)
        val ts = classic.read.parquet(
          s"${t.snapshotDir}/${MutableParquetTable.TombstoneName}")
        val cond = keys.zipWithIndex.map { case (k, i) =>
          cleanDf(k) === ts(s"__k$i") }.reduce(_ && _)
        cleanDf.join(broadcast(ts), cond, "left_anti")
          .queryExecution.analyzed
    }
}
