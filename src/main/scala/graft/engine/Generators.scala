package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic fact-batch generators with deliberate defect injection
  * (SURVEY.md §2.4, OP-32..OP-34).
  *
  * Re-expresses the reference's row builders (`generator/sales_generator.py:65-92`,
  * `customer_events_generator.py:47-68`, `inventory_generator.py:51-75`) as a single
  * lazy `spark.range(n)` plan per batch: enum picks via `element_at` over literal
  * arrays, randoms via seeded `rand`, ids via deterministic hashes. Defect injection
  * (reference docstrings `*_generator.py:9-12`) is `when(rand(seed) < p, corrupt)`.
  *
  * Determinism: the reference uses unseeded `random`/`uuid4`; we take an explicit
  * seed so silver-validation tests are reproducible (FIXTURES.md §A). With the same
  * seed+n the emitted batch is identical across runs and partitionings — ids are
  * derived from the row index, and each `rand` call site gets its own fixed offset.
  *
  * Scale: generation is embarrassingly parallel — `spark.range` partitions the index
  * space; no shuffle anywhere; a 100 TB backfill is just `n = 1e12` with enough
  * partitions.
  */
object Generators {

  // Catalogues mirrored from the reference (sales_generator.py:34-50,
  // customer_events_generator.py:34-41, inventory_generator.py:34-44).
  val Categories: Seq[(String, Seq[String])] = Seq(
    "Electronics" -> Seq("Laptop", "Smartphone", "Tablet", "Headphones", "Smartwatch"),
    "Clothing" -> Seq("T-Shirt", "Jeans", "Jacket", "Shoes", "Dress"),
    "Food & Beverage" -> Seq("Coffee", "Tea", "Juice", "Snack Pack", "Energy Drink"),
    "Home & Kitchen" -> Seq("Blender", "Coffee Maker", "Toaster", "Knife Set", "Cookware"),
    "Sports" -> Seq("Running Shoes", "Yoga Mat", "Dumbbell", "Resistance Band", "Water Bottle"),
    "Books" -> Seq("Python Programming", "Data Engineering", "Machine Learning", "SQL Guide", "Cloud Architecture"))
  val PaymentMethods: Seq[String] = Seq("credit_card", "debit_card", "paypal", "bank_transfer", "crypto")
  val Statuses: Seq[String] = Seq("completed", "completed", "completed", "pending", "refunded")
  val DeviceTypes: Seq[String] = Seq("desktop", "mobile", "tablet")
  val Pages: Seq[String] = Seq("/home", "/products", "/products/electronics", "/products/clothing",
    "/cart", "/checkout", "/profile", "/search", "/promotions")
  val Warehouses: Seq[String] = Seq("WH-NORTH-01", "WH-SOUTH-02", "WH-EAST-03", "WH-WEST-04")
  val Suppliers: Seq[String] = (1 to 10).map(i => f"SUP-$i%03d")
  val InventoryCatalogue: Seq[(String, String)] = Seq(
    "PROD-101" -> "Laptop", "PROD-102" -> "Smartphone", "PROD-103" -> "Tablet",
    "PROD-201" -> "T-Shirt", "PROD-202" -> "Jeans", "PROD-301" -> "Coffee",
    "PROD-401" -> "Blender", "PROD-501" -> "Yoga Mat", "PROD-502" -> "Dumbbell",
    "PROD-601" -> "Python Programming")

  /** Pick a random element of a literal catalogue: `element_at(array, 1-based idx)`.
    * `floor(rand)*k` is always < k, so the index is ANSI-safe. */
  private def pick(values: Seq[String], seed: Long): Column =
    element_at(array(values.map(lit): _*), (floor(rand(seed) * values.size) + 1).cast("int"))

  /** Deterministic uuid-shaped id from the row index (reference uses `uuid.uuid4()`,
    * e.g. `sales_generator.py:81`; hashing the index keeps batches reproducible). */
  private def rowId(prefix: String, seed: Long): Column =
    concat(lit(prefix), lit("-"), md5(concat(lit(seed), lit(":"), col("id"))))

  /** ISO-8601 UTC timestamp within `spreadHours` before `baseTs` (the reference
    * stamps `datetime.now()` per row; a seeded spread is the reproducible analog). */
  private def isoTimestamp(baseTs: String, spreadHours: Int, seed: Long): Column =
    date_format(
      timestamp_seconds(
        unix_timestamp(to_timestamp(lit(baseTs))) - floor(rand(seed) * spreadHours * 3600)),
      "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")

  /** Stable product dimension (product_name → PROD-id, category): the reference's
    * memo dict (`_get_product_id`, `sales_generator.py:52-58`). As a DataFrame it is
    * the engine's one dimension table; joins against it broadcast (OP-34). */
  def productDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Categories.zipWithIndex.flatMap { case ((cat, products), ci) =>
      products.zipWithIndex.map { case (p, pi) => (p, f"PROD-${(ci + 1) * 100 + pi + 1}%d", cat) }
    }.toDF("product_name", "product_id", "category")
  }

  /** Sales batch (reference `sales_generator.py:65-92`; defects `:9-12,72-78`):
    * ~3% null quantity, ~5% corrupted total_amount (×0.7-1.3), plus one exact
    * duplicate of the first row when `injectDuplicate` (`:111-113`, ~5% of runs). */
  def salesBatch(spark: SparkSession, n: Long, seed: Long,
                 baseTs: String = "2026-01-01 00:00:00",
                 injectDuplicate: Boolean = false): DataFrame = {
    val dim = productDim(spark)
    val qty = (floor(rand(seed + 2) * 10) + 1).cast("double")
    val price = round(rand(seed + 3) * 495 + 5, 2)
    // Totals derive from the pre-null quantity: the reference computes
    // total_amount before the ~3% quantity nulling (sales_generator.py:69-78),
    // so a null-quantity row still carries a non-null total.
    val cleanTotal = round(col("quantity_raw") * col("unit_price"), 2)
    val base = spark.range(n)
      .withColumn("sale_id", rowId("SALE", seed))
      .withColumn("timestamp", isoTimestamp(baseTs, 24, seed + 1))
      .withColumn("customer_id",
        concat(lit("CUST-"), (floor(rand(seed + 4) * 9000) + 1000).cast("int")))
      .withColumn("product_name", pick(Categories.flatMap(_._2), seed + 5))
      .withColumn("quantity_raw", qty)
      .withColumn("quantity", when(rand(seed + 6) < 0.03, lit(null)).otherwise(col("quantity_raw")))
      .withColumn("unit_price", price)
      .withColumn("payment_method", pick(PaymentMethods, seed + 7))
      .withColumn("status", pick(Statuses, seed + 8))
      // OP-34: the one join in the reference — broadcast the 30-row dimension.
      .join(broadcast(dim), "product_name")
      .withColumn("total_amount",
        when(rand(seed + 9) < 0.05, round(cleanTotal * (rand(seed + 10) * 0.6 + 0.7), 2))
          .otherwise(cleanTotal))
      .select("sale_id", "timestamp", "customer_id", "product_id", "product_name",
        "category", "quantity", "unit_price", "total_amount", "payment_method", "status")
    if (injectDuplicate) base.unionAll(base.orderBy("sale_id").limit(1)) else base
  }

  /** Customer-events batch (reference `customer_events_generator.py:47-68`; defects
    * `:9-12,51-57`): ~4% invalid event_type ("UNKNOWN"), ~3% null customer_id. */
  def customerEventsBatch(spark: SparkSession, n: Long, seed: Long,
                          baseTs: String = "2026-01-01 00:00:00",
                          injectDuplicate: Boolean = false): DataFrame = {
    val base = spark.range(n)
      .withColumn("event_id", rowId("EVT", seed))
      .withColumn("timestamp", isoTimestamp(baseTs, 24, seed + 1))
      .withColumn("customer_id",
        when(rand(seed + 2) < 0.03, lit(null))
          .otherwise(concat(lit("CUST-"), (floor(rand(seed + 3) * 9000) + 1000).cast("int"))))
      // ~3 concurrent sessions per batch (reference :86-87): each row draws one
      // of 3 stable per-batch session ids, so sessions are genuinely reused
      .withColumn("session_id",
        concat(lit("SESS-"), md5(concat(lit(seed), lit(":"), floor(rand(seed + 4) * 3)))))
      .withColumn("event_type",
        when(rand(seed + 5) < 0.04, lit("UNKNOWN")).otherwise(pick(Silver.ValidEventTypes, seed + 6)))
      .withColumn("product_id",
        when(col("event_type").isin("browse", "add_to_cart", "checkout"),
          concat(lit("PROD-"), (floor(rand(seed + 7) * 100) + 100).cast("int"))))
      .withColumn("page_url", pick(Pages, seed + 8))
      .withColumn("device_type", pick(DeviceTypes, seed + 9))
      .drop("id")
    if (injectDuplicate) base.unionAll(base.orderBy("event_id").limit(1)) else base
  }

  /** Inventory batch (reference `inventory_generator.py:51-75`; defects `:9-12,57-63`):
    * ~4% invalid movement_type ("TRANSFER"), ~3% null-or-zero quantity. */
  def inventoryBatch(spark: SparkSession, n: Long, seed: Long,
                     baseTs: String = "2026-01-01 00:00:00",
                     injectDuplicate: Boolean = false): DataFrame = {
    val catalogueIds = InventoryCatalogue.map(_._1)
    val catalogueNames = InventoryCatalogue.map(_._2)
    val idx = (floor(rand(seed + 2) * InventoryCatalogue.size) + 1).cast("int")
    val base = spark.range(n)
      .withColumn("movement_id", rowId("MOVE", seed))
      .withColumn("timestamp", isoTimestamp(baseTs, 24, seed + 1))
      .withColumn("product_id", element_at(array(catalogueIds.map(lit): _*), idx))
      .withColumn("product_name", element_at(array(catalogueNames.map(lit): _*), idx))
      .withColumn("warehouse_id", pick(Warehouses, seed + 3))
      .withColumn("movement_type",
        when(rand(seed + 4) < 0.04, lit("TRANSFER")).otherwise(pick(Silver.ValidMovementTypes, seed + 5)))
      .withColumn("quantity",
        when(rand(seed + 6) < 0.03,
          when(rand(seed + 7) < 0.5, lit(null)).otherwise(lit(0.0)))
          .otherwise((floor(rand(seed + 8) * 200) + 1).cast("double")))
      .withColumn("unit_cost", round(rand(seed + 9) * 299 + 1, 2))
      .withColumn("supplier_id",
        when(col("movement_type") === "inbound", pick(Suppliers, seed + 10)))
      .drop("id")
    if (injectDuplicate) base.unionAll(base.orderBy("movement_id").limit(1)) else base
  }

  val batchByDomain: Map[String, (SparkSession, Long, Long) => DataFrame] = Map(
    "sales" -> ((s, n, seed) => salesBatch(s, n, seed)),
    "customer_events" -> ((s, n, seed) => customerEventsBatch(s, n, seed)),
    "inventory" -> ((s, n, seed) => inventoryBatch(s, n, seed))
  )
}
