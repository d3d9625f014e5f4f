package graft

/** Plan-inspection main: prints the formatted physical plan for selected
  * queries (all of them when no names are given). Used to keep plans
  * honest: filters must appear in PushedFilters, projections in
  * ReadSchema, small dims behind BroadcastHashJoin, and hot expressions
  * inside WholeStageCodegen spans.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Graft.session("local[4]")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
