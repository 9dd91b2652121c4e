package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling salted join (SURVEY.md §7.4.7 / the 100 TB design
  * points): when one join key dominates the fact side, a plain shuffle
  * join sends the hot key to a single reducer. Salting splits the hot
  * key's rows across `saltFactor` reducers and replicates the (small)
  * build side once per salt — correctness-preserving, skew-breaking.
  *
  * AQE's skew-join handles sort-merge cases adaptively; explicit salting
  * remains the tool for aggregate-under-join and stateful-streaming
  * shapes AQE can't rewrite.
  */
object SaltedJoin {

  /** Equi-join `large ⋈ small` on `key`, salted `saltFactor` ways.
    * `small` is replicated saltFactor× and broadcast when it fits. */
  def apply(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
