package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence conversion funnel (the ClickHouse `windowFunnel` /
  * product-analytics staple): per user, match the ordered step sequence
  * greedily from the earliest occurrence — `t(0)` = first step-0 event,
  * `t(k)` = first step-k event STRICTLY after `t(k-1)` and within
  * `withinNs` of `t(0)` — and report how deep the user got.
  *
  * Greedy-earliest is deterministic and SQL-replayable; like
  * windowFunnel it can under-count a user whose later step-0 entry
  * would have completed where the earliest did not — the standard
  * funnel trade, documented rather than hidden.
  *
  * Spark shape: one narrow per-step aggregation chain — step k is a
  * `groupBy(user).min(ts)` over step-k events joined to the step-k−1
  * frontier (equi-join on the user key, broadcast-eligible when the
  * funnel head is selective). k−1 shuffles for a k-step funnel, all
  * keyed on the user column; no windows over the corpus, no sequence
  * state — at 100 TB each stage is a filtered scan + keyed join that
  * AQE sizes independently.
  *
  * Output: one row per user with a step-0 event —
  * `(user, t0 … t{k-1}, n_steps)`; `t(i)` NULL once the sequence
  * breaks, `n_steps` = completed prefix length.
  */
object EventFunnel {

  /** @param events   event stream `(userCol, tsCol, typeCol, …)`
    * @param userCol  grouping key
    * @param tsCol    numeric/orderable timestamp (use epoch nanos)
    * @param typeCol  event-type column matched against `steps`
    * @param steps    ordered step types, length ≥ 2
    * @param withinNs optional completion window measured from t0, in
    *                 tsCol's native unit (inclusive bound) */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      withinNs: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    val ev = events.select(
      col(userCol).as("_u"), col(tsCol).as("_ts"), col(typeCol).as("_ty"))
    val head = ev.filter(col("_ty") === steps.head)
      .groupBy("_u").agg(min("_ts").as("t0"))
    val full = steps.zipWithIndex.tail.foldLeft(head) { case (acc, (step, k)) =>
      val next = ev.filter(col("_ty") === step)
        .join(acc.select(col("_u"), col(s"t${k - 1}").as("_prev"), col("t0").as("_t0")), "_u")
        .filter(col("_ts") > col("_prev") &&
          withinNs.map(w => col("_ts") - col("_t0") <= w).getOrElse(lit(true)))
        .groupBy("_u").agg(min("_ts").as(s"t$k"))
      acc.join(next, Seq("_u"), "left")
    }
    full.select(
      Seq(col("_u").as(userCol)) ++
        steps.indices.map(i => col(s"t$i")) :+
        steps.indices.map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("long").as("n_steps"): _*)
  }
}
