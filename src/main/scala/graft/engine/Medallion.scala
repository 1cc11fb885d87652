package graft.engine

import org.apache.spark.sql.SparkSession

/** Whole-pipeline orchestration (SURVEY.md §2.5, OP-35/36): the reference's
  * `bronze_to_silver >> silver_to_gold` Airflow DAG
  * (`dags/data_lake_pipeline.py:107-149`) as one idempotent call per tick.
  *
  * Stage ordering is strict (gold reads what this drain wrote); domains are
  * independent and could run concurrently — kept sequential here because in
  * local mode they'd contend for the same cores anyway, and on a cluster the
  * scheduler overlaps stages of the per-domain jobs regardless.
  */
object Medallion {

  val Domains: Seq[String] = Seq("sales", "customer_events", "inventory")

  /** One pipeline tick: drain all unprocessed bronze per domain into silver
    * (checkpointed, exactly-once), then append a fresh gold snapshot per domain.
    * Returns gold table names written. Re-running without new bronze files
    * appends identical gold snapshots and re-drains nothing — the reference's
    * idempotence contract. */
  def runOnce(spark: SparkSession, root: String,
              domains: Seq[String] = Domains): Seq[String] = {
    domains.foreach { d =>
      Incremental.drainBronzeToSilver(spark, d,
        Layout.bronzeDir(root, d), Layout.silverDir(root, d), Layout.checkpointDir(root, d))
    }
    domains.flatMap { d =>
      val silverPath = Layout.silverDir(root, d)
      // Hadoop-FS existence check (a local java.io.File test would silently skip
      // gold on HDFS/S3A roots) — absent silver = no bronze has ever landed for
      // this domain; skip, like the reference's empty-frame guard
      // (silver_to_gold.py:38-41).
      val p = new org.apache.hadoop.fs.Path(silverPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Incremental.snapshotGold(spark, d, silverPath, root)
      else Seq.empty
    }
  }
}
