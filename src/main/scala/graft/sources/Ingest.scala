package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV/JSON ingestion into the engine's Parquet layout (SURVEY.md §2b
  * "CSV/JSON ingest"). Schemas should be supplied for production paths —
  * inference costs an extra full scan, which at 100 TB is the difference
  * between one pass and two. */
object Ingest {

  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
          header: Boolean = true, delimiter: String = ","): DataFrame = {
    var r = spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
    schema match {
      case Some(s) => r = r.schema(s)
      case None    => r = r.option("inferSchema", "true")
    }
    r.csv(path)
  }

  def json(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    var r = spark.read
    schema.foreach(s => r = r.schema(s))
    r.json(path)
  }

  /** ORC read/write (Spark-native reader; vectorized, predicate pushdown
    * and column pruning work the same as parquet). ORC is the interchange
    * format Hive-era warehouses hand us — ingest is read → land as the
    * engine's parquet layout via [[toSortedParquet]]. */
  def orc(spark: SparkSession, path: String,
          schema: Option[StructType] = None): DataFrame = {
    var r = spark.read
    schema.foreach(s => r = r.schema(s))
    r.orc(path)
  }

  def toOrc(df: DataFrame, path: String, compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** Land an ingested frame as a key-sorted Parquet table ready for
    * merges and pruning. */
  def toSortedParquet(df: DataFrame, path: String, key: String, numFiles: Int,
                      layout: ParquetLayout = ParquetLayout()): Unit =
    ParquetTable.writeSorted(df, path, key, numFiles, layout)
}
