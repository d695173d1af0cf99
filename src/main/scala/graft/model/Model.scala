package graft.model

import java.time.LocalDateTime
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.sources.Tables

/** Typed `Dataset[T]` façade over the corpus tables (SURVEY.md §1.1): the
  * schema contract as case classes, for call sites where compile-time
  * column safety and typed lambdas beat dynamic `DataFrame` flexibility.
  * Timestamps are `LocalDateTime` (the tables load as TIMESTAMP_NTZ).
  * The untyped loaders in [[graft.sources.Tables]] remain the general path
  * — encoders are a per-row boundary cost, so wide scans should stay
  * `DataFrame` and convert late.
  */
case class Lineitem(
    l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double, l_tax: Double,
    l_returnflag: String, l_linestatus: String, l_shipdate: LocalDateTime)

case class Order(
    o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: LocalDateTime, o_orderpriority: String)

case class Customer(
    c_custkey: Long, c_name: String, c_nationkey: Long,
    c_acctbal: Double, c_mktsegment: String)

case class Event(
    event_id: Long, ts: LocalDateTime, user_id: Long,
    event_type: String, value: Double, props: String)

case class Document(doc_id: Long, text: String)

case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

object Model {
  def lineitems(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).select(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate").as[Lineitem]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, dir).select(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority").as[Order]
  }

  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.customer(spark, dir).select(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment").as[Customer]
  }

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir).select(
      "event_id", "ts", "user_id", "event_type", "value", "props").as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).select("vec_id", "embedding", "label").as[Embedding]
  }
}
