package graft.meta

import java.util.regex.Pattern

/** Failure-as-no-match regex matching for the M4 REGEXP operator.
  *
  * The reference matches with fancy-regex and maps every error — invalid
  * pattern, backtrack-limit overrun — to "row does not match"
  * (next-plaid/src/filtering.rs:2026-2031). Spark's RLIKE instead throws
  * on an invalid pattern and can run unbounded on catastrophic
  * backtracking, so REGEXP conditions render to this kernel (registered
  * as the `graft_regexp` UDF) rather than RLIKE:
  *
  *  - a pattern that fails to compile matches nothing (cached verdict);
  *  - each match attempt gets a bounded character-access budget (the
  *    java.util.regex twin of fancy-regex's backtrack_limit, default
  *    1,000,000); exceeding it means "no match" for that row only.
  */
object SafeRegex {

  /** Per-attempt character-access budget (fancy-regex's default
    * backtrack_limit is 1M steps). */
  val DefaultBudget: Long = 1000000L

  private final class BudgetExceeded extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** CharSequence that charges every charAt to a shared budget, so a
    * catastrophically-backtracking matcher is cut off deterministically. */
  private final class Budgeted(s: CharSequence, counter: Array[Long]) extends CharSequence {
    def length: Int = s.length
    def charAt(i: Int): Char = {
      counter(0) -= 1
      if (counter(0) < 0) throw new BudgetExceeded
      s.charAt(i)
    }
    def subSequence(a: Int, b: Int): CharSequence =
      new Budgeted(s.subSequence(a, b), counter)
    override def toString: String = s.toString
  }

  /** Compiled-pattern cache; `None` = invalid pattern (matches nothing).
    * Executor-local (the object is a per-JVM singleton). Bounded: a
    * long-lived service evaluating many distinct ad-hoc patterns must
    * not grow it without limit — past [[MaxCacheSize]] the whole cache
    * is dropped (patterns are cheap to recompile; a rare clear beats
    * per-lookup LRU bookkeeping in the match hot path). */
  private[meta] val MaxCacheSize = 4096
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Pattern]]()

  def compile(pattern: String): Option[Pattern] = {
    if (cache.size > MaxCacheSize) cache.clear()
    cache.computeIfAbsent(pattern, p =>
      try Some(Pattern.compile(p))
      catch { case _: Exception => None })
  }

  /** Unanchored search (RLIKE/fancy-regex `is_match` semantics); null
    * input, invalid pattern, and budget overrun are all "no match". */
  def matches(s: String, pattern: String): Boolean = {
    if (s == null || pattern == null) return false
    compile(pattern) match {
      case None => false
      case Some(p) =>
        try p.matcher(new Budgeted(s, Array(DefaultBudget))).find()
        catch {
          case _: BudgetExceeded   => false
          case _: StackOverflowError => false
        }
    }
  }
}
