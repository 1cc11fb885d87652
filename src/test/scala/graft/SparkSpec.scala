package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one SparkSession per forked test JVM (getOrCreate
  * collapses per-suite lazy vals onto the same session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // read TIMESTAMP(NANOS) parquet footers as long; harmless for MICROS
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def withTempDir[T](f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-test-").toFile
    try f(dir.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
        x.delete()
      }
      rm(dir)
    }
  }
}
