package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Broadcast-Bloom join pruning — the 100 TB substitute for shuffling a
  * fact table against a key set that is too big to broadcast exactly.
  *
  * At warehouse scale the pruning key set (a blocklist, the orderkeys of
  * one order segment, a contaminated-id list) is often 10^7–10^9 keys:
  * too big for a broadcast hash join, so Catalyst plans a full shuffle
  * of BOTH sides. A Bloom filter at 1% FPP costs ~1.2 bytes/key — a
  * 10^8-key set broadcasts as ~120 MB — and lets every map task drop
  * definitely-absent rows at scan speed. Only the (tiny) might-contain
  * remainder pays the exact shuffle join that scrubs false positives,
  * so results are EXACT, not approximate:
  *
  *  - semi join: bloom-negative rows are definitely not in the key set
  *    → dropped map-side; bloom-positive rows re-verify with an exact
  *    LeftSemi join (removes the ~fpp false positives).
  *  - anti join: bloom-negative rows are definitely-keep → bypass the
  *    join entirely; only bloom-positive rows (selectivity ≈ |keys|/N
  *    + fpp) pay the exact LeftAnti join.
  *
  * Spark's own runtime-filter rewrite (`InjectRuntimeFilter`) applies
  * the same idea only inside one query when thresholds line up; this
  * operator makes it an explicit, reusable primitive. The bloom build
  * is a distributed treeAggregate (`df.stat.bloomFilter`); the
  * membership probe is a Scala UDF over the broadcast sketch —
  * justified because Spark exposes no public bloom-probe expression
  * (`BloomFilterMightContain` is internal to the runtime-filter rule),
  * and the UDF is a pure in-memory bit-test per row.
  *
  * Long and String key columns are supported (the two key shapes the
  * corpus uses); the two-branch anti shape scans `big` twice — at scale
  * that is the documented trade: two scans of a columnar source are
  * cheaper than one full shuffle of it.
  */
object BloomPrune {

  private def bloomOf(keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double) = {
    val n = math.max(expectedItems, 1L)
    keys.stat.bloomFilter(keyCol, n, fpp)
  }

  private def mightContainUdf(keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double) = {
    val bloom = bloomOf(keys, keyCol, expectedItems, fpp)
    val bc = keys.sparkSession.sparkContext.broadcast(bloom)
    keys.schema(keyCol).dataType match {
      case LongType =>
        udf((v: java.lang.Long) => v != null && bc.value.mightContainLong(v))
      case StringType =>
        udf((v: String) => v != null && bc.value.mightContainString(v))
      case dt => throw new IllegalArgumentException(
        s"BloomPrune supports Long/String keys, got $dt")
    }
  }

  /** EXACT semi join of `big` against `keys`, with a broadcast-Bloom
    * map-side pre-filter so only might-contain rows reach the shuffle. */
  def semiJoinPruned(big: DataFrame, keys: DataFrame,
      bigKey: String, keyCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val might = mightContainUdf(keys, keyCol, expectedItems, fpp)
    big.filter(might(col(bigKey)))
      .join(keys.select(col(keyCol).as(bigKey)).distinct(), Seq(bigKey),
        "left_semi")
  }

  /** EXACT anti join of `big` against `keys`: bloom-negative rows pass
    * without joining; only bloom-positives pay the exact LeftAnti. */
  def antiJoinPruned(big: DataFrame, keys: DataFrame,
      bigKey: String, keyCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val might = mightContainUdf(keys, keyCol, expectedItems, fpp)
    val definitelyAbsent = big.filter(!might(col(bigKey)))
    val needsCheck = big.filter(might(col(bigKey)))
      .join(keys.select(col(keyCol).as(bigKey)).distinct(), Seq(bigKey),
        "left_anti")
    definitelyAbsent.unionByName(needsCheck)
  }
}
