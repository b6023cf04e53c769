package graft.typed

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed (case-class) surface over the engine's tables — `Dataset[T]`
  * where compile-time field checks help (pipeline code that survives
  * refactors), `DataFrame` elsewhere (dynamic schemas, the DSL).
  *
  * Encoders come from `spark.implicits`; fields mirror FIXTURES.md §A
  * exactly (timestamps surface as java.sql.Timestamp after the ns
  * normalization in [[graft.Tables.events]]).
  */
object TypedTables {
  final case class LineItem(l_orderkey: Long, l_partkey: Long,
      l_suppkey: Long, l_linenumber: Int, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_tax: Double,
      l_returnflag: String, l_linestatus: String,
      l_shipdate: java.sql.Timestamp)

  final case class Order(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double,
      o_orderdate: java.sql.Timestamp, o_orderpriority: String)

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)

  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  def lineitem(spark: SparkSession, dir: String): Dataset[LineItem] = {
    import spark.implicits._
    graft.Tables.lineitem(spark, dir).as[LineItem]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    graft.Tables.orders(spark, dir).as[Order]
  }

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    graft.Tables.events(spark, dir).as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).as[Document]
  }

  /** Example typed pipeline: revenue per returnflag with compile-time
    * field access — `groupByKey` + typed agg columns keep the plan
    * identical to the untyped groupBy (one hash aggregate), while the
    * lambda key is checked at compile time. */
  def revenueByFlag(li: Dataset[LineItem]): Dataset[(String, Double, Long)] = {
    import li.sparkSession.implicits._
    li.groupByKey(_.l_returnflag)
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue").as[Double],
        count(lit(1)).as("n").as[Long])
  }
}
