package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching. Spark's approx_count_distinct
  * (HyperLogLog++) is engine-specific — no other system reproduces its
  * estimate, so it can't be oracle-checked and two stacks disagree on
  * the same data. The K-Minimum-Values sketch estimates distinct counts
  * from the k smallest values of a uniform hash: with md5-derived
  * hashes the k-minima are a pure function of the DATA, so any engine
  * computes the identical sketch AND the identical estimate.
  *
  * Estimator (Bar-Yossef et al. 2002): with h_k = the k-th smallest
  * hash over a space of size U, distinct ≈ (k-1) · U / h_k. Exact
  * integer arithmetic below 2^53 keeps engines bit-equal.
  *
  * Scale: one hash-aggregate for distinct hashes, then a global top-k
  * (TakeOrdered — no full sort). Mergeable: the sketch of a union is
  * the k smallest of the concatenated minima — store per-partition
  * sketches and fold.
  */
object Sketch {

  val HashSpace: Long = 1L << 40 // md5-derived 40-bit hashes

  /** 40-bit md5-derived hash of a value (uniform over [0, 2^40)). */
  def hash40(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 10), 16, 10)
      .cast("long")

  /** The KMV sketch: the k smallest DISTINCT hash values of `valueCol`,
    * ascending. (distinct-hash aggregate + top-k; both shuffles are on
    * tiny keys.)
    */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.select(hash40(col(valueCol)).as("h")).distinct()
      .orderBy(col("h")).limit(k)

  /** Distinct-count estimate from the sketch: exact integers, identical
    * on every engine. When fewer than k distinct hashes exist the count
    * is exact (the sketch IS the distinct set).
    */
  def kmvEstimate(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val sk = kmvSketch(df, valueCol, k)
    // (k-1)·U stays < 2^53; DIV is true integer division (double
    // division + floor can flip at exact-divisor boundaries)
    sk.agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(
        when(col("n") < k, col("n"))
          .otherwise(expr(s"${(k - 1).toLong * HashSpace}L DIV hk"))
          .cast("long").as("distinct_estimate"),
        col("n").cast("long").as("sketch_size"))
  }

  /** Typed `Aggregator` building a KMV sketch PER GROUP: the buffer is
    * the ascending k-minima of the distinct hashes seen so far, so
    * partial (map-side) aggregation and shuffle-merge both apply — each
    * partition ships at most k longs per group, never the distinct set.
    * The per-group form approx_count_distinct can't give us: engine-
    * portable (pure function of the data) and therefore oracle-checkable.
    */
  final case class KmvAggregator(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.empty
    override def reduce(b: Array[Long], h: Long): Array[Long] =
      if (b.length == k && h >= b(k - 1)) b // above the k-th min: no-op
      else if (java.util.Arrays.binarySearch(b, h) >= 0) b // dup hash
      else {
        val nb = (b :+ h).sorted
        if (nb.length > k) nb.take(k) else nb
      }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      (b1 ++ b2).distinct.sorted.take(k)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Misra–Gries heavy-hitters sketch as a typed Aggregator: at most
    * `k` (token → lower-bound count) counters per buffer, so map-side
    * partials ship k entries per partition regardless of vocabulary
    * size — where an exact top-k ([[graft.queries]] t9's explode +
    * groupBy) shuffles one key per distinct token, a non-starter at a
    * 100 TB vocabulary. Guarantees: every item with true frequency
    * > N/(k+1) survives, and each reported count undercounts by at most
    * the total decrement. Deterministic given the data (merge order
    * affects only which sub-threshold stragglers remain, so callers
    * threshold the output; in the exact regime — fewer than k distinct
    * items — counts are exact and partition-independent).
    */
  final case class MisraGriesAggregator(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      if (b.contains(x)) b.updated(x, b(x) + 1L)
      else if (b.size < k) b.updated(x, 1L)
      else { // decrement-all; drop zeros (the classic MG step)
        val dec = b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
        dec
      }
    override def merge(b1: Map[String, Long], b2: Map[String, Long])
        : Map[String, Long] = {
      val sum = (b1.keySet ++ b2.keySet).iterator
        .map(t => t -> (b1.getOrElse(t, 0L) + b2.getOrElse(t, 0L))).toMap
      if (sum.size <= k) sum
      else { // keep top-k after subtracting the (k+1)-th largest count
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    }
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Per-group distinct-count estimates from [[KmvAggregator]]: one hash
    * aggregate keyed on `groupCols`, the same Bar-Yossef estimator per
    * group. `hashCol` must already be a [[hash40]] column.
    */
  def kmvEstimateByGroup(df: DataFrame, groupCols: Seq[String],
      hashCol: String, k: Int): DataFrame = {
    val sketch = udaf(KmvAggregator(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(sketch(col(hashCol)).as("sk"))
      .select(groupCols.map(col) ++ Seq(
        when(size(col("sk")) < k, size(col("sk")).cast("long"))
          .otherwise(expr(
            s"${(k - 1).toLong * HashSpace}L DIV element_at(sk, $k)"))
          .as("distinct_estimate"),
        size(col("sk")).cast("long").as("sketch_size")): _*)
  }
}
