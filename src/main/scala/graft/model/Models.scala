package graft.model

import java.time.{Instant, LocalDateTime}

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.Tables

/** Typed entities for the core tables (SURVEY.md §1.3: `Dataset[T]` where
  * compile-time safety helps — entity-level transforms and tests; the
  * wide-query surface stays DataFrame). Parquet TIMESTAMP_NTZ maps to
  * LocalDateTime; the events stream (converted tz-aware) maps to Instant.
  */
final case class Customer(
    c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)

final case class Order(
    o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: LocalDateTime, o_orderpriority: String)

final case class Event(
    event_id: Long, ts: Instant, user_id: Long,
    event_type: String, value: Double, props: String)

object Typed {
  def customers(s: SparkSession, d: String): Dataset[Customer] = {
    import s.implicits._
    Tables.customer(s, d).as[Customer]
  }
  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._
    Tables.orders(s, d).as[Order]
  }
  def events(s: SparkSession, d: String): Dataset[Event] = {
    import s.implicits._
    Tables.events(s, d).as[Event]
  }
}
