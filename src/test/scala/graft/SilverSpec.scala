package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.engine.{Schemas, Silver}

/** Silver cleaning/validation semantics (SURVEY.md §2.2, OP-10..OP-21), asserted
  * against the reference's documented rules (`pipeline/bronze_to_silver.py`). */
class SilverSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def salesDf(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, Schemas.salesBronze)

  private val okSale = Row("S1", "2026-01-01T10:00:00+00:00", "CUST-1", "PROD-101",
    "Laptop", "Electronics", 2.0, 10.0, 20.0, "paypal", "completed")

  test("cleanSales: valid row passes with empty error string") {
    val out = Silver.cleanSales(salesDf(Seq(okSale)), processedAt = lit("t")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Boolean]("is_valid"))
    assert(r.getAs[String]("validation_errors") == "")
    assert(r.getAs[java.sql.Timestamp]("timestamp") != null)
  }

  test("cleanSales: null required columns produce ordered NULL: codes with trailing semicolon") {
    val bad = Row("S2", "2026-01-01T10:00:00+00:00", null, "PROD-101",
      "Laptop", "Electronics", null, 10.0, 20.0, "paypal", "completed")
    val out = Silver.cleanSales(salesDf(Seq(bad)), processedAt = lit("t")).collect().head
    // required order: sale_id, timestamp, customer_id, product_id, quantity, ...
    assert(out.getAs[String]("validation_errors") == "NULL:customer_id; NULL:quantity;")
    assert(!out.getAs[Boolean]("is_valid"))
  }

  test("cleanSales: unparseable timestamp coerces to null and flags NULL:timestamp") {
    val bad = Row("S3", "not-a-timestamp", "CUST-1", "PROD-101",
      "Laptop", "Electronics", 2.0, 10.0, 20.0, "paypal", "completed")
    val out = Silver.cleanSales(salesDf(Seq(bad)), processedAt = lit("t")).collect().head
    assert(out.getAs[java.sql.Timestamp]("timestamp") == null)
    assert(out.getAs[String]("validation_errors") == "NULL:timestamp;")
  }

  test("cleanSales: dedup on sale_id removes exact duplicates") {
    val out = Silver.cleanSales(salesDf(Seq(okSale, okSale)), processedAt = lit("t"))
    assert(out.count() == 1)
  }

  test("cleanSales: total_amount auto-fix rewrites only mismatches > 0.01") {
    val mismatch = Row("S4", "2026-01-01T10:00:00+00:00", "C", "P", "Laptop", "Electronics",
      3.0, 7.5, 99.99, "paypal", "completed") // expected 22.50
    val withinTol = Row("S5", "2026-01-01T10:00:00+00:00", "C", "P", "Laptop", "Electronics",
      3.0, 7.5, 22.505, "paypal", "completed") // |22.505-22.5| <= 0.01 → untouched
    val out = Silver.cleanSales(salesDf(Seq(mismatch, withinTol)), processedAt = lit("t"))
      .orderBy("sale_id").collect()
    assert(out(0).getAs[Double]("total_amount") == 22.50)
    assert(out(1).getAs[Double]("total_amount") == 22.505)
    assert(out.forall(_.getAs[Boolean]("is_valid"))) // fix is silent, not an error
  }

  private def eventsDf(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, Schemas.customerEventsBronze)

  test("cleanEvents: invalid enum flags INVALID_EVENT_TYPE; null enum flags NULL only") {
    val rows = Seq(
      Row("E1", "2026-01-01T10:00:00+00:00", "C1", "SES1", "browse", null, "/home", "mobile"),
      Row("E2", "2026-01-01T10:00:00+00:00", "C1", "SES1", "UNKNOWN", null, "/home", "mobile"),
      Row("E3", "2026-01-01T10:00:00+00:00", "C1", "SES1", null, null, "/home", "mobile"))
    val out = Silver.cleanEvents(eventsDf(rows), processedAt = lit("t"))
      .orderBy("event_id")
      .select("validation_errors").as[String](spark.implicits.newStringEncoder).collect()
    assert(out(0) == "")
    assert(out(1) == "INVALID_EVENT_TYPE;")
    assert(out(2) == "NULL:event_type;") // null is not an enum violation (notna gate)
  }

  test("cleanEvents: null customer and bad enum accumulate in order") {
    val row = Row("E4", "2026-01-01T10:00:00+00:00", null, "SES1", "zap", null, "/home", "mobile")
    val out = Silver.cleanEvents(eventsDf(Seq(row)), processedAt = lit("t")).collect().head
    assert(out.getAs[String]("validation_errors") == "NULL:customer_id; INVALID_EVENT_TYPE;")
  }

  private def invDf(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, Schemas.inventoryBronze)

  test("cleanInventory: zero/negative quantity flags NON_POSITIVE_QUANTITY; null does not") {
    val rows = Seq(
      Row("M1", "2026-01-01T10:00:00+00:00", "PROD-101", "Laptop", "WH-NORTH-01", "inbound", 5.0, 10.0, "SUP-001"),
      Row("M2", "2026-01-01T10:00:00+00:00", "PROD-101", "Laptop", "WH-NORTH-01", "outbound", 0.0, 10.0, null),
      Row("M3", "2026-01-01T10:00:00+00:00", "PROD-101", "Laptop", "WH-NORTH-01", "TRANSFER", -2.0, 10.0, null),
      Row("M4", "2026-01-01T10:00:00+00:00", "PROD-101", "Laptop", "WH-NORTH-01", "adjustment", null, 10.0, null))
    val out = Silver.cleanInventory(invDf(rows), processedAt = lit("t"))
      .orderBy("movement_id")
      .select("validation_errors").as[String](spark.implicits.newStringEncoder).collect()
    assert(out(0) == "")
    assert(out(1) == "NON_POSITIVE_QUANTITY;")
    assert(out(2) == "INVALID_MOVEMENT_TYPE; NON_POSITIVE_QUANTITY;")
    assert(out(3) == "NULL:quantity;")
  }

  test("dedupKeepFirst keeps the row ranked first by the order columns") {
    import spark.implicits._
    val df = Seq(("k", 2, "second"), ("k", 1, "first"), ("z", 9, "only"))
      .toDF("id", "ord", "tag")
    val kept = Silver.dedupKeepFirst(df, "id", col("ord")).orderBy("id")
      .select("tag").as[String].collect()
    assert(kept.toSeq == Seq("first", "only"))
  }
}
