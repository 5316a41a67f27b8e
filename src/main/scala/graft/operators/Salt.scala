package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: the classic remedy when one join key
  * dominates a shuffle partition (AQE's skew-join split handles most
  * cases at runtime; salting is the static fallback for extreme keys).
  *
  * The skewed (big) side gets a deterministic pseudo-random salt in
  * `[0, factor)`; the small side is exploded `factor`× so every
  * (key, salt) pair finds its match. Join output is identical to the
  * unsalted join — only the partitioning changes (key cardinality
  * effectively multiplied by `factor`).
  */
object Salt {

  /** Deterministic per-row salt derived from the whole row hash (no RNG:
    * reproducible plans). */
  private def saltCol(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(factor)).cast("int")

  /** Two-phase salted aggregation for skewed group keys: partial
    * count/sum per `(keys, salt)` — `factor` reducers share each hot
    * key's rows — then the tiny per-salt partials combine per key.
    * Exact for decomposable aggregates (count/sum here): the result is
    * identical to the direct groupBy, only the shuffle distribution
    * changes. Returns (keys…, n, sum_cents); pass the value pre-scaled
    * to an exact integer (the cent-sum convention) so the two-phase sum
    * is bit-stable. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueInt: Column,
      factor: Int): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(df, factor))
      .withColumn("__v", valueInt)
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_cents"))
  }

  /** Equi-join `big ⋈ small` on `keys`, salted `factor`-ways.
    * Only inner/left(-semi) preserve output equivalence: an outer join on
    * the exploded small side would emit `factor` null-padded copies of an
    * unmatched small key. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int, how: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(how.toLowerCase),
      s"saltedJoin preserves semantics only for inner/left joins, got $how")
    val saltedBig = big.withColumn("__salt", saltCol(big, factor))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", how).drop("__salt")
  }
}
