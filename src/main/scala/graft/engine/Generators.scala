package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic fact-batch generators with deliberate defect injection
  * (SURVEY.md §2.4, OP-32..OP-34).
  *
  * Re-expresses the reference's row builders (`generator/sales_generator.py:65-92`,
  * `customer_events_generator.py:47-68`, `inventory_generator.py:51-75`) as a single
  * lazy `spark.range(n)` plan per batch: enum picks via `element_at` over literal
  * arrays, ids via deterministic hashes. Defect injection (reference docstrings
  * `*_generator.py:9-12`) is `when(hash % 100 < p, corrupt)`.
  *
  * Determinism & PORTABILITY: the reference uses unseeded `random`/`uuid4`; we
  * draw every random from the engine-portable 60-bit md5 family
  * ([[graft.ext.PortableHash.hash60]] over `"<seed>:<site>:<row id>"`), so a
  * batch is identical across runs, partitionings, AND engines — DuckDB replays
  * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)` bit-for-bit, which is
  * what lets the end-to-end medallion drain (q18) carry a hash oracle instead
  * of a rows-only smoke check. Money is integer-cents-derived (`cents/100.0`):
  * an exact-integer-over-100 double is correctly rounded identically on any
  * IEEE engine, where a `rand()*495` float pipeline differs in the last ulp.
  *
  * Scale: generation is embarrassingly parallel — `spark.range` partitions the
  * index space; no shuffle anywhere except the one broadcast dim join; a 100 TB
  * backfill is just `n = 1e12` with enough partitions.
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

  /** One portable draw per (seed, site, row): non-negative bigint < 2^60.
    * The site label keeps call sites independent (the rand-era `seed + k`
    * offsets, made self-describing). Oracle mirror:
    * `CAST(concat('0x', substr(md5('<seed>:<site>:' || id), 1, 15)) AS BIGINT)`. */
  private def draw(seed: Long, site: String): Column =
    graft.ext.PortableHash.hash60(
      concat(lit(s"$seed:$site:"), col("id").cast("string")))

  /** Uniform pick from a literal catalogue: `element_at(array, hash mod k + 1)`.
    * (Modulo over a 60-bit draw: bias ≤ k/2^60 — unmeasurable.) */
  private def pick(values: Seq[String], seed: Long, site: String): Column =
    element_at(array(values.map(lit): _*),
      (pmod(draw(seed, site), lit(values.size)) + 1).cast("int"))

  /** Deterministic uuid-shaped id from the row index (reference uses `uuid.uuid4()`,
    * e.g. `sales_generator.py:81`; hashing the index keeps batches reproducible). */
  private def rowId(prefix: String, seed: Long): Column =
    concat(lit(prefix), lit("-"), md5(concat(lit(seed), lit(":"), col("id"))))

  /** ISO-8601 UTC timestamp within `spreadHours` before `baseTs` (the reference
    * stamps `datetime.now()` per row; a portable-hash spread is the reproducible
    * analog — oracle replays `base_epoch - hash mod spread·3600` exactly). */
  private def isoTimestamp(baseTs: String, spreadHours: Int, seed: Long,
                           site: String = "ts"): Column =
    date_format(
      timestamp_seconds(
        unix_timestamp(to_timestamp(lit(baseTs))) -
          pmod(draw(seed, site), lit(spreadHours * 3600L))),
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
    * duplicate of the first row when `injectDuplicate` (`:111-113`, ~5% of runs).
    *
    * Money stays on the integer cent grid end to end: unit_price is
    * `price_cents/100.0`, the clean total is `qty·price_cents/100.0` (provably
    * equal to silver's `round(quantity·unit_price, 2)` for every (qty, cents)
    * in range — exhaustively checked), and the corrupted total is
    * `(qty·price_cents·f4) DIV 10000 / 100.0` with `f4 ∈ [7000, 13000)`
    * integer ten-thousandths — so every emitted double is an exact integer
    * over 100 and the DuckDB oracle reproduces it bit-for-bit. */
  def salesBatch(spark: SparkSession, n: Long, seed: Long,
                 baseTs: String = "2026-01-01 00:00:00",
                 injectDuplicate: Boolean = false): DataFrame = {
    val dim = productDim(spark)
    val priceCents = pmod(draw(seed, "price"), lit(49500L)) + 500L
    val qtyInt = pmod(draw(seed, "qty"), lit(10L)) + 1L
    val base = spark.range(n)
      .withColumn("sale_id", rowId("SALE", seed))
      .withColumn("timestamp", isoTimestamp(baseTs, 24, seed))
      .withColumn("customer_id",
        concat(lit("CUST-"), (pmod(draw(seed, "cust"), lit(9000L)) + 1000L).cast("int")))
      .withColumn("product_name", pick(Categories.flatMap(_._2), seed, "prod"))
      .withColumn("__qty_int", qtyInt)
      .withColumn("__price_cents", priceCents)
      // totals derive from the pre-null quantity: the reference computes
      // total_amount before the ~3% quantity nulling (sales_generator.py:69-78),
      // so a null-quantity row still carries a non-null total.
      .withColumn("quantity",
        when(pmod(draw(seed, "qnull"), lit(100L)) < 3, lit(null))
          .otherwise(col("__qty_int").cast("double")))
      .withColumn("unit_price", col("__price_cents").cast("double") / 100.0)
      .withColumn("payment_method", pick(PaymentMethods, seed, "pay"))
      .withColumn("status", pick(Statuses, seed, "status"))
      // OP-34: the one join in the reference — broadcast the 30-row dimension.
      .join(broadcast(dim), "product_name")
      .withColumn("__clean_cents", col("__qty_int") * col("__price_cents"))
      .withColumn("__f4", pmod(draw(seed, "factor"), lit(6000L)) + 7000L)
      .withColumn("__total_cents",
        when(pmod(draw(seed, "corrupt"), lit(100L)) < 5,
          expr("__clean_cents * __f4 DIV 10000"))
          .otherwise(col("__clean_cents")))
      .withColumn("total_amount", col("__total_cents").cast("double") / 100.0)
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
      .withColumn("timestamp", isoTimestamp(baseTs, 24, seed))
      .withColumn("customer_id",
        when(pmod(draw(seed, "cnull"), lit(100L)) < 3, lit(null))
          .otherwise(concat(lit("CUST-"),
            (pmod(draw(seed, "cust"), lit(9000L)) + 1000L).cast("int"))))
      // ~3 concurrent sessions per batch (reference :86-87): each row draws one
      // of 3 stable per-batch session ids, so sessions are genuinely reused
      .withColumn("session_id",
        concat(lit("SESS-"), md5(concat(lit(seed), lit(":"),
          pmod(draw(seed, "sess"), lit(3L))))))
      .withColumn("event_type",
        when(pmod(draw(seed, "etbad"), lit(100L)) < 4, lit("UNKNOWN"))
          .otherwise(pick(Silver.ValidEventTypes, seed, "etype")))
      .withColumn("product_id",
        when(col("event_type").isin("browse", "add_to_cart", "checkout"),
          concat(lit("PROD-"), (pmod(draw(seed, "eprod"), lit(100L)) + 100L).cast("int"))))
      .withColumn("page_url", pick(Pages, seed, "page"))
      .withColumn("device_type", pick(DeviceTypes, seed, "dev"))
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
    val idx = (pmod(draw(seed, "item"), lit(InventoryCatalogue.size.toLong)) + 1).cast("int")
    val base = spark.range(n)
      .withColumn("movement_id", rowId("MOVE", seed))
      .withColumn("timestamp", isoTimestamp(baseTs, 24, seed))
      .withColumn("product_id", element_at(array(catalogueIds.map(lit): _*), idx))
      .withColumn("product_name", element_at(array(catalogueNames.map(lit): _*), idx))
      .withColumn("warehouse_id", pick(Warehouses, seed, "wh"))
      .withColumn("movement_type",
        when(pmod(draw(seed, "mtbad"), lit(100L)) < 4, lit("TRANSFER"))
          .otherwise(pick(Silver.ValidMovementTypes, seed, "mtype")))
      .withColumn("quantity",
        when(pmod(draw(seed, "qbad"), lit(100L)) < 3,
          when(pmod(draw(seed, "qnullzero"), lit(100L)) < 50, lit(null)).otherwise(lit(0.0)))
          .otherwise((pmod(draw(seed, "qn"), lit(200L)) + 1L).cast("double")))
      .withColumn("unit_cost",
        (pmod(draw(seed, "cost"), lit(29900L)) + 100L).cast("double") / 100.0)
      .withColumn("supplier_id",
        when(col("movement_type") === "inbound", pick(Suppliers, seed, "sup")))
      .drop("id")
    if (injectDuplicate) base.unionAll(base.orderBy("movement_id").limit(1)) else base
  }

  val batchByDomain: Map[String, (SparkSession, Long, Long) => DataFrame] = Map(
    "sales" -> ((s, n, seed) => salesBatch(s, n, seed)),
    "customer_events" -> ((s, n, seed) => customerEventsBatch(s, n, seed)),
    "inventory" -> ((s, n, seed) => inventoryBatch(s, n, seed))
  )
}
