package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ext.{PortableHash, Shingles}
import graft.functions.HashFunctions

/** Property-based equivalence for the codegen'd hash/shingle expressions
  * against the built-in Column forms they replaced for performance. The fixed
  * adversarial suites live in ExtSpec; these sweep arbitrary unicode
  * (including surrogates, control chars, and whitespace runs) through both
  * implementations in one Spark job per case.
  */
class HashProperties extends Properties("HashExpressions") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  // Arbitrary strings plus whitespace-heavy ones (the shingle tokenizer's
  // interesting axis), batched so each property case is one Spark job.
  private val strBatch: Gen[List[String]] = {
    val ws = Gen.listOf(Gen.oneOf(" ", "\t", "\n", "ab", "çd", "中文", "e f"))
      .map(_.mkString)
    Gen.listOfN(40, Gen.oneOf(Arbitrary.arbitrary[String], ws))
  }

  private def mismatches(rows: List[String], a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column): Long = {
    import spark.implicits._
    rows.toDF("s").filter(a =!= b or (a.isNull =!= b.isNull)).count()
  }

  property("md5Hex(s) == md5(s)") = forAll(strBatch) { rows =>
    mismatches(rows, HashFunctions.md5Hex(col("s")), md5(col("s"))) == 0L
  }

  property("md5Prefix60(s) == conv(substring(md5(s),1,15),16,10)") = forAll(strBatch) { rows =>
    mismatches(rows, PortableHash.hash60(col("s")), PortableHash.hash60Sql(col("s"))) == 0L
  }

  property("wordShingles(s,k) == HOF form, k ∈ {1,2,3,7}") = forAll(strBatch) { rows =>
    Seq(1, 2, 3, 7).forall { k =>
      mismatches(rows, Shingles.wordShingles(col("s"), k),
        Shingles.wordShinglesSql(col("s"), k)) == 0L
    }
  }
}
