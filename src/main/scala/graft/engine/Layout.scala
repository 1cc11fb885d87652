package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Medallion directory layout + Hive-style date partitioning.
  *
  * Mirrors the reference layout (reference `storage/local_storage.py:6-10,33-41`):
  * {{{
  *   <root>/bronze/<domain>/year=YYYY/month=MM/day=DD/<file>.csv
  *   <root>/silver/<domain>/year=YYYY/month=MM/day=DD/<file>.parquet
  *   <root>/gold/<table>/<snapshot>.parquet
  * }}}
  *
  * Where the reference builds partition paths by hand (`_hive_path`,
  * `local_storage.py:33-41`) and then *ignores* them on read (`rglob`,
  * `local_storage.py:96,134`), we emit real partition columns through
  * `DataFrameWriter.partitionBy` so Spark's file index prunes directories on every
  * partition-filtered read — the difference between scanning 100 TB of history and
  * scanning one day of it.
  */
object Layout {

  def bronzeDir(root: String, domain: String): String = s"$root/bronze/$domain"
  def silverDir(root: String, domain: String): String = s"$root/silver/$domain"
  def goldDir(root: String, table: String): String = s"$root/gold/$table"
  def checkpointDir(root: String, domain: String): String = s"$root/.state/$domain"

  val partitionColumns: Seq[String] = Seq("year", "month", "day")

  /** Append year/month/day partition columns derived from `ts`.
    *
    * The reference partitions by *ingest wall-clock* date (`local_storage.py:60,114`);
    * we default to the event timestamp so that reprocessing is deterministic and
    * event-time queries prune. Pass `current_timestamp()` for strict ingest-time parity.
    */
  def withDatePartitions(df: DataFrame, ts: Column): DataFrame =
    df.withColumn("year", year(ts))
      .withColumn("month", month(ts))
      .withColumn("day", dayofmonth(ts))
}
