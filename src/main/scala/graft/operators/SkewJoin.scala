package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the classic hot-key shuffle fix, packaged: when
  * one join key carries a disproportionate share of the fact side
  * (the null-ish tenant, the default user, the empty-string bucket), a
  * plain shuffle join serializes that key's entire row mass through
  * ONE reducer. Salting spreads it: the fact side gets a deterministic
  * salt in `[0, salts)`, the (smaller) dim side replicates each row
  * `salts` times, and the join runs on `(keys…, _salt)` — the hot
  * key's rows land on `salts` reducers instead of one. The result
  * row-set is IDENTICAL to the plain join (each fact row meets each
  * matching dim row exactly once, at its own salt), which
  * SkewJoinSpec asserts on a 90%-one-key corpus.
  *
  * Cost model: the dim side's shuffle volume multiplies by `salts` —
  * only salt a join whose dim side is small relative to the fact's
  * hot-key mass (the usual case: fact-to-dimension). When the dim side
  * broadcasts anyway there is nothing to salt — broadcast first,
  * salt only when the dim side exceeds broadcast reach.
  *
  * Versus AQE skew-join (`spark.sql.adaptive.skewJoin.*`): AQE splits
  * oversized SORT-MERGE partitions at runtime and is the right default
  * — prefer it when it fires. Explicit salting still earns its keep
  * when (a) the skew is in a shuffled-hash join AQE won't split,
  * (b) the hot key exceeds even a split partition's memory, or (c) the
  * join feeds a window/aggregation that re-shuffles on the same key and
  * needs the spread to survive downstream. The salt is deterministic
  * (xxhash64 of the fact row), so replays and retries are stable.
  */
object SkewJoin {

  /** Inner equi-join of `fact` ⋈ `dim` on `keys`, salted `salts` ways.
    * Output columns = fact's ++ dim's non-key columns (plain-join
    * shape); `_salt` never escapes. */
  def salted(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    require(keys.nonEmpty, "salted join needs at least one key")
    require(salts >= 2 && salts <= 4096, s"salts in [2, 4096], got $salts")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "inputs must not already carry a _salt column")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts))
        .cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, keys :+ "_salt").drop("_salt")
  }

  /** Hot-key census — the decision input for [[salted]]: the `topN`
    * heaviest join keys with their row counts and share in parts per
    * million (integers only). One aggregation, map-side combined; the
    * global total rides the same pass via a grand-total rollup. */
  def hotKeys(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
    val total = df.count() // one job; driver-known scalar
    counts
      .withColumn("share_ppm", (col("n_rows") * 1000000L / lit(total)).cast("long"))
      // total order: count desc, then EVERY key column asc — ties on
      // (n_rows, keys.head) at the topN boundary would otherwise make
      // the census nondeterministic across runs/partitionings
      .orderBy(col("n_rows").desc +: keys.map(col(_).asc): _*)
      .limit(topN)
  }
}
