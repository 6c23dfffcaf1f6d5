package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Assoc

class AssocSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rules: hand-computed support/confidence/lift on a 5-basket corpus") {
    import spark.implicits._
    // baskets: {m,b}, {m,b,e}, {m,e}, {b,e}, {m} — with a dup row
    val rows = Seq(
      (1L, "milk"), (1L, "bread"),
      (2L, "milk"), (2L, "bread"), (2L, "eggs"),
      (3L, "milk"), (3L, "eggs"),
      (4L, "bread"), (4L, "eggs"),
      (5L, "milk"), (5L, "milk"))
    val got = Assoc.rules(rows.toDF("basket", "item"), "basket", "item",
      minPairCount = 2L, maxBasketSize = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    // n_baskets=5; n(milk)=4 n(bread)=3 n(eggs)=3
    // (bread,milk): n_ab=2 → support 400000, conf_ab 2e6/3=666666,
    //   conf_ba 2e6/4=500000, lift 1e6*2*5/(3*4)=833333
    assert(got(("bread", "milk")) ===
      ((2L, 3L, 4L, 400000L, 666666L, 500000L, 833333L)))
    // (bread,eggs): n_ab=2 → conf both 666666, lift 1e6*10/9=1111111
    assert(got(("bread", "eggs")) ===
      ((2L, 3L, 3L, 400000L, 666666L, 666666L, 1111111L)))
    // (eggs,milk): n_ab=2, lift 1e6*10/12=833333
    assert(got(("eggs", "milk")) ===
      ((2L, 3L, 4L, 400000L, 666666L, 500000L, 833333L)))
    assert(got.size === 3)
  }

  test("rules: minPairCount prunes, mega-baskets are dropped from the universe") {
    import spark.implicits._
    // basket 9 has 5 items > maxBasketSize=4 → excluded entirely,
    // including from n_baskets and item counts
    val rows =
      Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a")) ++
        (1 to 5).map(i => (9L, s"x$i"))
    val got = Assoc.rules(rows.toDF("basket", "item"), "basket", "item",
      minPairCount = 2L, maxBasketSize = 4).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getString(0), r.getString(1)) === (("a", "b")))
    // n_baskets=3 (basket 9 dropped): support 2e6/3 = 666666
    assert(r.getLong(5) === 666666L)
    // lift = 1e6*2*3/(3*2) = 1000000 (independence)
    assert(r.getLong(8) === 1000000L)
  }
}
