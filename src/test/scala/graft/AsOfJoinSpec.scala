package graft

import graft.operators.Joins
import org.apache.spark.sql.functions.col

/** Pins the as-of join semantics: inclusive <= at equal timestamps, latest
  * right row wins, null before any right row, per-key isolation.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val left = Seq(
    ("u1", 100L, "c1"), ("u1", 200L, "c2"), ("u1", 50L, "c0"),
    ("u2", 100L, "c3")
  ).toDF("k", "t", "name")

  private val right = Seq(
    ("u1", 100L, 10.0, 1L), // exactly at c1's time -> included (<=)
    ("u1", 150L, 20.0, 2L),
    ("u2", 999L, 99.0, 3L) // after u2's only left row
  ).toDF("k", "t", "v", "rid")

  private def run() =
    Joins.asOfJoin(left, right, Seq("k"), "t", "t", Seq("v", "rid"), "rid")
      .select("k", "name", "asof_v", "asof_rid")
      .collect()
      .map(r => r.getString(1) -> (Option(r.get(2)), Option(r.get(3)))).toMap

  test("inclusive <= at equal timestamps") {
    assert(run()("c1") == (Some(10.0), Some(1L)))
  }

  test("latest preceding right row wins") {
    assert(run()("c2") == (Some(20.0), Some(2L)))
  }

  test("left row before any right row gets nulls") {
    assert(run()("c0") == (None, None))
    assert(run()("c3") == (None, None)) // u2's purchase is later
  }

  test("same-time right rows: highest tiebreak wins deterministically") {
    val r2 = Seq(("u1", 100L, 1.0, 1L), ("u1", 100L, 2.0, 2L)).toDF("k", "t", "v", "rid")
    val l2 = Seq(("u1", 100L, "x")).toDF("k", "t", "name")
    val out = Joins.asOfJoin(l2, r2, Seq("k"), "t", "t", Seq("v"), "rid")
      .select("asof_v").as[Double].head()
    assert(out == 2.0)
  }

  // --- forward variant -------------------------------------------------------

  private def runFwd() =
    Joins.asOfJoinForward(left, right, Seq("k"), "t", "t", Seq("v", "rid"), "rid")
      .select("k", "name", "next_v", "next_rid")
      .collect()
      .map(r => r.getString(1) -> (Option(r.get(2)), Option(r.get(3)))).toMap

  test("forward: inclusive >= at equal timestamps") {
    assert(runFwd()("c1") == (Some(10.0), Some(1L)))
  }

  test("forward: earliest following right row wins") {
    assert(runFwd()("c0") == (Some(10.0), Some(1L)))
    assert(runFwd()("c3") == (Some(99.0), Some(3L)))
  }

  test("forward: left row after the last right row gets nulls") {
    assert(runFwd()("c2") == (None, None))
  }

  test("forward: same-time right rows pick the lowest tiebreak") {
    val r2 = Seq(("u1", 100L, 1.0, 1L), ("u1", 100L, 2.0, 2L)).toDF("k", "t", "v", "rid")
    val l2 = Seq(("u1", 100L, "x")).toDF("k", "t", "name")
    val out = Joins.asOfJoinForward(l2, r2, Seq("k"), "t", "t", Seq("v"), "rid")
      .select("next_v").as[Double].head()
    assert(out == 1.0)
  }

  test("carried columns are row-atomic: a NULL field never tears the match") {
    // matched right row has v = NULL; per-column carries would splice the
    // OLDER row's v (backward) / the LATER row's v (forward) onto this
    // row's rid — a right row that never existed
    val r3 = Seq(
      ("u1", 100L, Some(7.0), 1L),
      ("u1", 200L, None, 2L), // latest preceding for l@250; v is NULL
      ("u1", 300L, Some(9.0), 3L)
    ).toDF("k", "t", "v", "rid")
    val l3 = Seq(("u1", 250L, "x")).toDF("k", "t", "name")
    val back = Joins.asOfJoin(l3, r3, Seq("k"), "t", "t", Seq("v", "rid"), "rid")
      .select("asof_v", "asof_rid").head()
    assert(back.isNullAt(0) && back.getLong(1) == 2L,
      s"backward tore the row: $back")
    val l4 = Seq(("u1", 150L, "y")).toDF("k", "t", "name")
    val fwd = Joins.asOfJoinForward(l4, r3, Seq("k"), "t", "t", Seq("v", "rid"), "rid")
      .select("next_v", "next_rid").head()
    assert(fwd.isNullAt(0) && fwd.getLong(1) == 2L,
      s"forward tore the row: $fwd")
  }

  test("round-13: NULL timestamps never match — right NULL-time rows are " +
      "unmatchable, left NULL-time rows get no phantom carry") {
    // a NULL-time right row sorts FIRST under ASC (NULLS FIRST): pre-fix
    // it was carried onto every left row with no real predecessor
    val rNull = Seq(
      (Some("u1"), Option.empty[Long], Some(66.0), Some(9L)),
      (Some("u1"), Some(200L), Some(20.0), Some(2L))
    ).toDF("k", "t", "v", "rid")
    val lEarly = Seq(("u1", 100L, "early")).toDF("k", "t", "name")
    val back = Joins.asOfJoin(lEarly, rNull, Seq("k"), "t", "t",
      Seq("v", "rid"), "rid").select("asof_v", "asof_rid").head()
    assert(back.isNullAt(0) && back.isNullAt(1),
      s"NULL-time right row leaked into the carry: $back")
    // forward mode (DESC = NULLS LAST): a NULL-time LEFT row pre-fix
    // picked up the earliest right row as a phantom next_* match
    val lNull = Seq((Some("u1"), Option.empty[Long], Some("ghost")))
      .toDF("k", "t", "name")
    val rReal = Seq(("u1", 100L, 10.0, 1L)).toDF("k", "t", "v", "rid")
    val fwd = Joins.asOfJoinForward(lNull, rReal, Seq("k"), "t", "t",
      Seq("v", "rid"), "rid").select("next_v", "next_rid").head()
    assert(fwd.isNullAt(0) && fwd.isNullAt(1),
      s"NULL-time left row got a phantom forward match: $fwd")
  }

  test("round-13: string tiebreaks resolve same-time rows deterministically " +
      "(the old cast-to-long nulled them into a layout coin flip)") {
    val r2 = Seq(
      ("u1", 100L, 1.0, "url-a"), ("u1", 100L, 2.0, "url-b")
    ).toDF("k", "t", "v", "rid").repartition(4)
    val l2 = Seq(("u1", 150L, "x")).toDF("k", "t", "name")
    val out = Joins.asOfJoin(l2, r2, Seq("k"), "t", "t", Seq("v", "rid"), "rid")
      .select("asof_v", "asof_rid").head()
    // backward: highest tiebreak wins at equal times
    assert(out.getDouble(0) == 2.0 && out.getString(1) == "url-b", s"$out")
  }

  test("round-13: reserved working columns are rejected, not clobbered") {
    val lBad = Seq(("u1", 100L, 5.0)).toDF("k", "t", "_t")
    val e = intercept[IllegalArgumentException] {
      Joins.asOfJoin(lBad, right, Seq("k"), "t", "t", Seq("v"), "rid")
    }
    assert(e.getMessage.contains("reserved working column"))
    val dfBad = Seq(("g", 1.0, 1)).toDF("g", "v", "_rn")
    val e2 = intercept[IllegalArgumentException] {
      Joins.topKPerGroup(dfBad, Seq("g"), Seq("v"), 1)
    }
    assert(e2.getMessage.contains("reserved working column"))
  }

  test("round-13: getOrCreate never mints ids for NULL natural keys " +
      "(idempotence: re-running on the same input must not grow the dim)") {
    val dim = Seq((1L, "btc"), (2L, "eth")).toDF("id", "nk")
    val incoming = Seq(Some("btc"), Some("sol"), Option.empty[String])
      .toDF("nk")
    val once = Joins.getOrCreate(dim, incoming, "id", "nk")
    assert(once.filter(col("nk").isNull).count() == 0,
      "NULL key was minted an id")
    assert(once.count() == 3) // btc, eth, sol
    val twice = Joins.getOrCreate(once, incoming, "id", "nk")
    assert(twice.count() == 3, "re-run grew the dimension (NULL re-insert)")
  }

  test("round-14: getOrCreate rejects reserved bookkeeping column names " +
      "(same contract as asOfJoin/topKPerGroup)") {
    val dim = Seq((1L, "btc")).toDF("id", "_pid")
    val incoming = Seq("btc").toDF("_pid")
    val e = intercept[IllegalArgumentException] {
      Joins.getOrCreate(dim, incoming, "id", "_pid")
    }
    assert(e.getMessage.contains("reserved"))
  }
}
