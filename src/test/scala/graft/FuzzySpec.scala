package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Fuzzy

class FuzzySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ed(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(words: Seq[String], minLen: Int = 4): Set[(String, String)] = {
    import spark.implicits._
    Fuzzy.ed1Pairs(words.toDF("tok"), "tok", minLen = minLen)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("ed1Pairs equals brute force on random words with planted edit families") {
    val rnd = new scala.util.Random(23)
    val base = (0 until 150).map(_ =>
      (0 until (5 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    // plant one of each edit type
    val edits = base.take(30).flatMap { w =>
      val i = rnd.nextInt(w.length)
      Seq(
        w.updated(i, if (w(i) == 'z') 'y' else 'z'),           // substitution
        w.substring(0, i) + w.substring(i + 1),                 // deletion
        w.substring(0, i) + "x" + w.substring(i),               // insertion
        "x" + w,                                                // prefix insert
        w + "x")                                                // suffix insert
    }
    val words = (base ++ edits).distinct.filter(_.length >= 4)
    val got = run(words)
    val want = (for {
      a <- words; b <- words
      if a < b && a.length <= 64 && b.length <= 64 && ed(a, b) == 1
    } yield (a, b)).toSet
    assert(want.nonEmpty, "fixture must contain ed-1 pairs")
    assert(got === want)
  }

  test("equal strings and distance-2 lookalikes are not pairs") {
    // the transposition "abcd"/"abdc" is ed 2 under classic
    // Levenshtein yet SHARES deletion keys ("abc" and "abd" both) — the
    // canonical neighborhood false positive; the verify must reject it
    val got = run(Seq("abcd", "abcd", "abdc", "dcba", "abce", "abcf"))
    got.foreach { case (a, b) => assert(ed(a, b) == 1, s"($a,$b) not ed-1") }
    // real ed-1 pairs survive; transposition and reversal do not
    assert(got.contains(("abce", "abcf")) && got.contains(("abcd", "abce")))
    assert(!got.contains(("abcd", "abdc")) && !got.contains(("abcd", "dcba")))
    assert(!got.exists(p => p._1 == p._2))
  }

  test("minLen excludes short tokens entirely") {
    val got = run(Seq("ab", "ac", "abcd", "abce"), minLen = 4)
    assert(got === Set(("abcd", "abce")))
  }
}
