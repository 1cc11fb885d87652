package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.engine.Gold

/** Gold aggregate builders (SURVEY.md §2.3, OP-22..OP-31) against hand-computed
  * expectations, matching the reference gold contracts
  * (`pipeline/silver_to_gold.py`, README.md:231-241). */
class GoldSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val salesSilverSchema = StructType(Seq(
    StructField("sale_id", StringType), StructField("timestamp", TimestampType),
    StructField("customer_id", StringType), StructField("category", StringType),
    StructField("payment_method", StringType), StructField("quantity", DoubleType),
    StructField("unit_price", DoubleType), StructField("total_amount", DoubleType),
    StructField("is_valid", BooleanType)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def salesSilver: DataFrame = spark.createDataFrame(Seq(
    Row("S1", ts("2026-01-01 08:00:00"), "C1", "Books", "paypal", 1.0, 10.0, 10.0, true),
    Row("S2", ts("2026-01-01 09:00:00"), "C1", "Books", "crypto", 2.0, 15.0, 30.0, true),
    Row("S3", ts("2026-01-01 23:59:59"), "C2", "Sports", "paypal", 1.0, 5.0, 5.0, true),
    Row("S4", ts("2026-01-02 00:00:01"), "C2", "Books", "paypal", 1.0, 7.0, 7.0, true),
    Row("S5", ts("2026-01-01 12:00:00"), "C3", "Books", "paypal", 9.0, 9.0, 81.0, false) // invalid: excluded
  ).asJava, salesSilverSchema)

  test("dailySalesSummary: revenue, distinct orders/customers per day; invalid rows excluded") {
    val out = Gold.dailySalesSummary(salesSilver).orderBy("date").collect()
    assert(out.length == 2)
    val d1 = out(0)
    assert(d1.getAs[java.sql.Date]("date").toString == "2026-01-01")
    assert(d1.getAs[Double]("total_revenue") == 45.0)
    assert(d1.getAs[Long]("order_count") == 3L)
    assert(d1.getAs[Double]("avg_order_value") == 15.0)
    assert(d1.getAs[Long]("unique_customers") == 2L)
    val d2 = out(1)
    assert(d2.getAs[Double]("total_revenue") == 7.0)
  }

  test("categorySalesSummary groups by (date, category)") {
    val out = Gold.categorySalesSummary(salesSilver)
      .orderBy("date", "category").collect()
    assert(out.map(r => (r.getAs[java.sql.Date]("date").toString, r.getAs[String]("category"),
      r.getAs[Double]("category_revenue"), r.getAs[Long]("category_orders"))).toSeq == Seq(
      ("2026-01-01", "Books", 40.0, 2L),
      ("2026-01-01", "Sports", 5.0, 1L),
      ("2026-01-02", "Books", 7.0, 1L)))
  }

  test("paymentMethodSummary groups by (date, payment_method)") {
    val out = Gold.paymentMethodSummary(salesSilver).orderBy("date", "payment_method").collect()
    assert(out.map(r => (r.getAs[String]("payment_method"), r.getAs[Double]("payment_revenue"),
      r.getAs[Long]("payment_count"))).toSeq == Seq(
      ("crypto", 30.0, 1L), ("paypal", 15.0, 2L), ("paypal", 7.0, 1L)))
  }

  private val invSilverSchema = StructType(Seq(
    StructField("movement_id", StringType), StructField("timestamp", TimestampType),
    StructField("product_id", StringType), StructField("product_name", StringType),
    StructField("warehouse_id", StringType), StructField("movement_type", StringType),
    StructField("quantity", DoubleType), StructField("unit_cost", DoubleType),
    StructField("is_valid", BooleanType)))

  private def invSilver: DataFrame = spark.createDataFrame(Seq(
    Row("M1", ts("2026-01-01 01:00:00"), "P1", "Laptop", "W1", "inbound", 10.0, 100.0, true),
    Row("M2", ts("2026-01-01 02:00:00"), "P1", "Laptop", "W1", "outbound", 4.0, 40.0, true),
    Row("M3", ts("2026-01-01 03:00:00"), "P1", "Laptop", "W1", "inbound", 1.0, 10.0, true),
    Row("M4", ts("2026-01-01 04:00:00"), "P2", "Tablet", "W1", "adjustment", 2.0, 5.0, true),
    Row("M5", ts("2026-01-01 05:00:00"), "P1", "Laptop", "W1", "inbound", 99.0, 1.0, false)
  ).asJava, invSilverSchema)

  test("inventoryMovementSummary: 5-key group with quantity/cost sums and counts") {
    val out = Gold.inventoryMovementSummary(invSilver)
      .orderBy("product_id", "movement_type").collect()
    assert(out.map(r => (r.getAs[String]("product_id"), r.getAs[String]("movement_type"),
      r.getAs[Double]("total_quantity"), r.getAs[Double]("total_cost"),
      r.getAs[Long]("movement_count"))).toSeq == Seq(
      ("P1", "inbound", 11.0, 110.0, 2L),
      ("P1", "outbound", 4.0, 40.0, 1L),
      ("P2", "adjustment", 2.0, 5.0, 1L)))
  }

  test("inventoryNetPosition: pivot columns 0-filled, net = inbound - outbound") {
    val out = Gold.inventoryNetPosition(invSilver).orderBy("product_id").collect()
    val p1 = out(0); val p2 = out(1)
    assert((p1.getAs[Double]("inbound"), p1.getAs[Double]("outbound"),
      p1.getAs[Double]("adjustment"), p1.getAs[Double]("net_position")) == ((11.0, 4.0, 0.0, 7.0)))
    assert((p2.getAs[Double]("inbound"), p2.getAs[Double]("outbound"),
      p2.getAs[Double]("adjustment"), p2.getAs[Double]("net_position")) == ((0.0, 0.0, 2.0, 0.0)))
  }

  test("inventoryNetPosition conditional-agg form ≡ literal pivot form") {
    val fast = Gold.inventoryNetPosition(invSilver)
    val pivot = Gold.inventoryNetPositionViaPivot(invSilver)
    assert(fast.columns.toSeq == pivot.columns.toSeq)
    assert(fast.exceptAll(pivot).isEmpty && pivot.exceptAll(fast).isEmpty)
  }

  test("customerActivitySummary / deviceUsageSummary count events and distinct sessions") {
    val schema = StructType(Seq(
      StructField("event_id", StringType), StructField("timestamp", TimestampType),
      StructField("customer_id", StringType), StructField("session_id", StringType),
      StructField("event_type", StringType), StructField("device_type", StringType),
      StructField("is_valid", BooleanType)))
    val events = spark.createDataFrame(Seq(
      Row("E1", ts("2026-01-01 01:00:00"), "C1", "S1", "browse", "mobile", true),
      Row("E2", ts("2026-01-01 02:00:00"), "C1", "S1", "browse", "mobile", true),
      Row("E3", ts("2026-01-01 03:00:00"), "C2", "S2", "login", "desktop", true),
      Row("E4", ts("2026-01-01 04:00:00"), "C2", "S2", "browse", "desktop", false)
    ).asJava, schema)
    val act = Gold.customerActivitySummary(events).orderBy("event_type").collect()
    assert(act.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_count"),
      r.getAs[Long]("unique_customers"), r.getAs[Long]("unique_sessions"))).toSeq == Seq(
      ("browse", 2L, 1L, 1L), ("login", 1L, 1L, 1L)))
    val dev = Gold.deviceUsageSummary(events).orderBy("device_type").collect()
    assert(dev.map(r => (r.getAs[String]("device_type"), r.getAs[Long]("session_count"),
      r.getAs[Long]("event_count"))).toSeq == Seq(("desktop", 1L, 1L), ("mobile", 1L, 2L)))
  }
}
