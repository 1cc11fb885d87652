package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.engine.{Generators, Gold, Silver}

/** Property-based silver/gold invariants (SURVEY.md §5): for any seeded defect-
  * injecting batch, the cleaned output satisfies the reference's validation
  * contract (`pipeline/bronze_to_silver.py` rules; README.md:215-227).
  *
  * Each property evaluates a handful of seeds (Spark job per case — kept small
  * so the suite stays fast while still sweeping the defect space).
  */
class SilverProperties extends Properties("Silver") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val seeds = Gen.choose(0L, 10000L)

  property("sales: is_valid ⟺ no validation errors ⟺ required columns non-null") = forAll(seeds) { seed =>
    val out = Silver.cleanSales(
      Generators.salesBatch(spark, 60, seed), processedAt = lit("t")).collect()
    out.forall { r =>
      val errs = r.getAs[String]("validation_errors")
      val valid = r.getAs[Boolean]("is_valid")
      val requiredNonNull = Silver.SalesRequired.forall(c => !r.isNullAt(r.fieldIndex(c)))
      (valid == errs.isEmpty) && (valid == requiredNonNull)
    }
  }

  property("sales: valid rows satisfy |total − round(q·p, 2)| ≤ 0.01 after the fix") = forAll(seeds) { seed =>
    val out = Silver.cleanSales(
      Generators.salesBatch(spark, 60, seed), processedAt = lit("t")).collect()
    out.filter(_.getAs[Boolean]("is_valid")).forall { r =>
      val q = r.getAs[Double]("quantity"); val p = r.getAs[Double]("unit_price")
      val t = r.getAs[Double]("total_amount")
      math.abs(t - BigDecimal(q * p).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 0.01
    }
  }

  property("sales: clean is idempotent (dedup + fix are fixpoints)") = forAll(seeds) { seed =>
    val once = Silver.cleanSales(
      Generators.salesBatch(spark, 40, seed, injectDuplicate = true), processedAt = lit("t"))
    val twice = Silver.cleanSales(
      once.withColumn("timestamp", date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")),
      processedAt = lit("t"))
    once.count() == twice.count() &&
      once.agg(sum("total_amount")).collect().head.getDouble(0) ==
        twice.agg(sum("total_amount")).collect().head.getDouble(0)
  }

  property("events: invalid enum or null required ⟺ flagged") = forAll(seeds) { seed =>
    val out = Silver.cleanEvents(
      Generators.customerEventsBatch(spark, 60, seed), processedAt = lit("t")).collect()
    out.forall { r =>
      val errs = r.getAs[String]("validation_errors")
      val enumOk = Silver.ValidEventTypes.contains(r.getAs[String]("event_type"))
      val requiredOk = Silver.EventsRequired.forall(c => !r.isNullAt(r.fieldIndex(c)))
      r.getAs[Boolean]("is_valid") == (enumOk && requiredOk) &&
        (errs.contains("INVALID_EVENT_TYPE") == (!enumOk && r.getAs[String]("event_type") != null))
    }
  }

  property("inventory: valid ⟹ positive quantity and known movement type") = forAll(seeds) { seed =>
    val out = Silver.cleanInventory(
      Generators.inventoryBatch(spark, 60, seed), processedAt = lit("t")).collect()
    out.filter(_.getAs[Boolean]("is_valid")).forall { r =>
      r.getAs[Double]("quantity") > 0 &&
        Silver.ValidMovementTypes.contains(r.getAs[String]("movement_type"))
    }
  }

  property("gold: daily revenue equals the sum of valid totals") = forAll(seeds) { seed =>
    val silver = Silver.cleanSales(Generators.salesBatch(spark, 80, seed), processedAt = lit("t"))
    val goldTotal = Gold.dailySalesSummary(silver)
      .agg(sum("total_revenue")).collect().head.getDouble(0)
    val silverTotal = silver.filter(col("is_valid"))
      .agg(sum("total_amount")).collect().head.getDouble(0)
    math.abs(goldTotal - silverTotal) < 0.05 // per-date 2dp rounding only
  }
}
