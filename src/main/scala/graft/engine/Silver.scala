package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bronze→silver cleaning/validation (SURVEY.md §2.2, OP-10..OP-21).
  *
  * One pure `DataFrame => DataFrame` per domain, mirroring the reference's
  * `_process_sales` / `_process_customer_events` / `_process_inventory`
  * (reference `pipeline/bronze_to_silver.py:35-176`):
  *
  *   1. parse timestamp, null on failure        (`:51,102,147`, errors="coerce")
  *   2. dedup on the domain id                  (`:53-56,104-107,149-152`)
  *   3. accumulate per-row validation errors    (`:59-64,110-117,155-165`)
  *   4. (sales) auto-fix mismatched totals      (`:66-73`)
  *   5. stamp is_valid / validation_errors / processed_at (`:76-78,...`)
  *
  * Everything is `Column` expressions — no UDFs — so the whole clean stays inside
  * whole-stage codegen and Parquet/CSV pushdown, and scales to any number of
  * executors with zero shuffles except the dedup itself.
  */
object Silver {

  /** Allowed enums (reference `bronze_to_silver.py:27-28`). */
  val ValidEventTypes: Seq[String] = Seq("login", "browse", "add_to_cart", "checkout", "logout")
  val ValidMovementTypes: Seq[String] = Seq("inbound", "outbound", "adjustment")

  /** Required (null-checked) columns per domain (reference `bronze_to_silver.py:47-48,99,143-144`). */
  val SalesRequired: Seq[String] =
    Seq("sale_id", "timestamp", "customer_id", "product_id", "quantity", "unit_price", "total_amount")
  val EventsRequired: Seq[String] =
    Seq("event_id", "timestamp", "customer_id", "session_id", "event_type")
  val InventoryRequired: Seq[String] =
    Seq("movement_id", "timestamp", "product_id", "warehouse_id", "movement_type", "quantity")

  /** Build the reference's exact error string: `"<CODE>; "` fragments appended in
    * required-column order then domain-check order, then stripped — so
    * `"NULL:a; NULL:b;"` (trailing `;` survives the strip;
    * reference `bronze_to_silver.py:59-77`). Empty string ⇒ valid row.
    *
    * Deliberately the reference's own accumulate-then-strip construction
    * (`errors += "<CODE>; "` … `.str.strip()`) as a flat `concat` of
    * when-fragments: pure string codegen. An earlier array_compact/array_join
    * form cost 10s+ per 600k rows — collection higher-order expressions are
    * interpreted and fall out of whole-stage codegen. */
  def errorString(required: Seq[String], domainChecks: Seq[(Column, String)]): Column = {
    val fragments =
      required.map(c => when(col(c).isNull, lit(s"NULL:$c; ")).otherwise(lit(""))) ++
        domainChecks.map { case (pred, code) => when(pred, lit(s"$code; ")).otherwise(lit("")) }
    trim(concat(fragments: _*))
  }

  /** OP-12: enum-membership check — non-null value outside the allowed set
    * (reference `bronze_to_silver.py:116-117,161-162`). */
  def invalidEnum(c: Column, allowed: Seq[String]): Column =
    c.isNotNull && !c.isin(allowed: _*)

  /** Stamp the three audit columns (OP-16..18). `processedAt` is a parameter so
    * tests and oracle-compared queries stay deterministic; production callers pass
    * an ISO-formatted `current_timestamp()`. */
  private def finalizeSilver(df: DataFrame, errors: Column, processedAt: Column): DataFrame =
    df.withColumn("validation_errors", errors)
      .withColumn("is_valid", col("validation_errors") === "")
      .withColumn("processed_at", processedAt)

  /** ISO-8601 UTC audit stamp, same shape the reference writes
    * (`datetime.now(timezone.utc).isoformat()`, `bronze_to_silver.py:78`). */
  def nowIso: Column = date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")

  /** OP-10: ISO string → timestamp, null on failure (ANSI-safe). */
  def parseTimestamp(df: DataFrame): DataFrame =
    df.withColumn("timestamp", try_to_timestamp(col("timestamp")))

  /** Clean fact_sales (reference `_process_sales`, `bronze_to_silver.py:35-85`).
    *
    * The total_amount auto-fix (OP-14) silently overwrites totals that disagree with
    * `round(quantity × unit_price, 2)` by more than 0.01 — it is a *fix*, not a
    * validation error (`bronze_to_silver.py:66-73`).
    */
  def cleanSales(df: DataFrame, processedAt: Column = nowIso): DataFrame = {
    val q = col("quantity"); val p = col("unit_price"); val t = col("total_amount")
    val expected = round(q * p, 2)
    val fixed = parseTimestamp(df)
      .dropDuplicates("sale_id")
      .withColumn("total_amount",
        when(q.isNotNull && p.isNotNull && abs(t - expected) > 0.01, expected).otherwise(t))
    finalizeSilver(fixed, errorString(SalesRequired, Nil), processedAt)
  }

  /** Clean fact_customer_events (reference `_process_customer_events`,
    * `bronze_to_silver.py:88-128`). */
  def cleanEvents(df: DataFrame, processedAt: Column = nowIso): DataFrame = {
    val deduped = parseTimestamp(df).dropDuplicates("event_id")
    val checks = Seq(invalidEnum(col("event_type"), ValidEventTypes) -> "INVALID_EVENT_TYPE")
    finalizeSilver(deduped, errorString(EventsRequired, checks), processedAt)
  }

  /** Clean fact_inventory_movements (reference `_process_inventory`,
    * `bronze_to_silver.py:131-176`). `quantity` arrives as DoubleType under the
    * explicit schema, so the reference's `pd.to_numeric(errors="coerce")` re-coercion
    * (`:164`) is already satisfied; the `<= 0` range check is OP-13. */
  def cleanInventory(df: DataFrame, processedAt: Column = nowIso): DataFrame = {
    val deduped = parseTimestamp(df).dropDuplicates("movement_id")
    val checks = Seq(
      invalidEnum(col("movement_type"), ValidMovementTypes) -> "INVALID_MOVEMENT_TYPE",
      (col("quantity").isNotNull && col("quantity") <= 0) -> "NON_POSITIVE_QUANTITY")
    finalizeSilver(deduped, errorString(InventoryRequired, checks), processedAt)
  }

  val cleanerByDomain: Map[String, DataFrame => DataFrame] = Map(
    "sales" -> (df => cleanSales(df)),
    "customer_events" -> (df => cleanEvents(df)),
    "inventory" -> (df => cleanInventory(df))
  )

  /** OP-21 order-faithful variant: pandas `drop_duplicates` keeps the *first* row in
    * file order (`bronze_to_silver.py:55`); Spark's `dropDuplicates` keeps an
    * arbitrary one. When the kept row matters (rows differ beyond the key), order by
    * a stable column instead. One shuffle on the key, same as dropDuplicates. */
  def dedupKeepFirst(df: DataFrame, key: String, order: Column*): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
