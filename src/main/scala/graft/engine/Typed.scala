package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed (`Dataset[T]`) view of the silver layer.
  *
  * The engine is `DataFrame`-first (the reference is schema-dynamic and
  * column-name-driven — SURVEY.md §1.3), but compile-time row types earn their
  * keep at the boundary where domain logic leaves the engine: downstream jobs
  * consuming silver get field-checked access and typed aggregation instead of
  * stringly-typed column lookups. Encoders are Catalyst `ExpressionEncoder`s, so
  * typed transforms stay in Tungsten rows — no Kryo detour.
  */
object Typed {

  /** Silver sales row (silver schema, `Schemas.silverFor("sales")`). */
  final case class SaleSilver(
      sale_id: String,
      timestamp: Option[java.sql.Timestamp],
      customer_id: Option[String],
      product_id: Option[String],
      product_name: Option[String],
      category: Option[String],
      quantity: Option[Double],
      unit_price: Option[Double],
      total_amount: Option[Double],
      payment_method: Option[String],
      status: Option[String],
      validation_errors: String,
      is_valid: Boolean,
      processed_at: String)

  implicit val saleSilverEncoder: Encoder[SaleSilver] = Encoders.product[SaleSilver]

  /** Field-checked view of a silver sales frame (extra columns are dropped,
    * missing/mistyped ones fail analysis — the typed contract). */
  def sales(silver: DataFrame): Dataset[SaleSilver] = {
    val cols = saleSilverEncoder.schema.fieldNames.toSeq
    silver.select(cols.head, cols.tail: _*).as[SaleSilver]
  }

  /** Typed revenue aggregator: sums valid totals — `Aggregator` over the case
    * class, merged map-side like any built-in aggregate. */
  object ValidRevenue extends Aggregator[SaleSilver, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(acc: Double, s: SaleSilver): Double =
      if (s.is_valid) acc + s.total_amount.getOrElse(0.0) else acc
    override def merge(a: Double, b: Double): Double = a + b
    override def finish(acc: Double): Double = acc
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Revenue per category via the typed path (groupByKey + Aggregator). */
  def revenueByCategory(silver: DataFrame): Dataset[(String, Double)] = {
    implicit val tupleEnc: Encoder[(String, Double)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)
    implicit val strEnc: Encoder[String] = Encoders.STRING
    sales(silver)
      .groupByKey(s => s.category.getOrElse(""))
      .agg(ValidRevenue.toColumn.name("revenue"))
  }
}
