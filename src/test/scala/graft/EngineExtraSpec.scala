package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Gold, Sources}
import graft.plans.GraftExtensions

/** Extension registration, raw ingest, approx-distinct scale variant. */
class EngineExtraSpec extends SparkSpec {

  test("graft_dot is SQL-callable once installed (registry path + extensions wiring)") {
    // Builder-time path: the injector must wire without error.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // Existing-session path (what Verify/Bench/tests use).
    org.apache.spark.sql.graft.Bridge.installGraftFunctions(spark)
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(v == 11.0)
  }

  test("ingestRaw copies staged files byte-for-byte into bronze") {
    withTempDir { dir =>
      val staged = new java.io.File(s"$dir/staging"); staged.mkdirs()
      val f = new java.io.File(staged, "batch1.csv")
      java.nio.file.Files.writeString(f.toPath, "a,b\n1,2\n")
      val copied = Sources.ingestRaw(spark, s"$dir/staging/*.csv", s"$dir/bronze")
      assert(copied.size == 1)
      val dest = new java.io.File(s"$dir/bronze/batch1.csv")
      assert(dest.exists)
      assert(java.nio.file.Files.readString(dest.toPath) == "a,b\n1,2\n")
      // source untouched (copy, not move — bronze append-only contract)
      assert(f.exists)
    }
  }

  test("approxUniques tracks exact countDistinct within rsd on realistic cardinalities") {
    import spark.implicits._
    val df = (1 to 20000).map(i => (i % 977).toString).toDF("k")
    val (exact, approx) = df
      .agg(countDistinct(col("k")), Gold.approxUniques(col("k"), rsd = 0.02))
      .as[(Long, Long)].collect().head
    assert(exact == 977)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
