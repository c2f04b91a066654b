package graft.plans

import org.apache.spark.sql.Row
import graft.SparkSuite

/** ASOF JOIN SQL syntax (plans/AsOfSql.scala): the token rewrite in
  * isolation, then end-to-end `spark.sql` parity with the programmatic
  * AsOf API, plan shape, and the analysis-time error contract. */
class AsOfSqlSpec extends SparkSuite {

  // ---------------------------------------------------------------- rewrite

  test("rewrite wraps the ON condition and drops the ASOF keyword") {
    val out = AsOfSql.rewrite(
      "SELECT * FROM t ASOF JOIN q ON t.k = q.k AND t.ts >= q.ts WHERE t.v > 0")
    assert(out.contains("JOIN q ON graft_asof( t.k = q.k AND t.ts >= q.ts ) WHERE"))
    assert(!out.toUpperCase.contains("ASOF JOIN"))
  }

  test("rewrite keeps LEFT and stops the condition at ORDER BY") {
    val out = AsOfSql.rewrite(
      "SELECT * FROM t ASOF LEFT JOIN q ON t.k = q.k AND t.ts >= q.ts ORDER BY t.k")
    assert(out.contains("LEFT JOIN q ON graft_asof( t.k = q.k AND t.ts >= q.ts ) ORDER BY"))
  }

  test("rewrite leaves asof-as-identifier and quoted text alone") {
    val id = "SELECT asof, `asof join` FROM t WHERE note = 'ASOF JOIN x ON y'"
    assert(AsOfSql.rewrite(id) == id)
    val col = "SELECT t.asof FROM t"
    assert(AsOfSql.rewrite(col) == col)
  }

  test("rewrite handles a parenthesized subquery side and a following join") {
    val out = AsOfSql.rewrite(
      "SELECT * FROM a ASOF JOIN (SELECT k, ts FROM b WHERE ok) c " +
        "ON a.k = c.k AND a.ts >= c.ts JOIN d ON c.k = d.k")
    assert(out.contains("ON graft_asof( a.k = c.k AND a.ts >= c.ts ) JOIN d ON c.k = d.k"))
    // the subquery's own WHERE did not terminate the outer condition scan
    assert(out.contains("(SELECT k, ts FROM b WHERE ok)"))
  }

  test("rewrite processes two ASOF joins in one statement") {
    val out = AsOfSql.rewrite(
      "SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t " +
        "ASOF LEFT JOIN c ON a.k = c.k AND a.t >= c.t")
    assert(out.sliding("graft_asof(".length).count(_ == "graft_asof(") == 2)
    assert(!out.toUpperCase.contains("ASOF "))
  }

  test("rewrite rejects USING and a missing ON") {
    intercept[IllegalArgumentException] {
      AsOfSql.rewrite("SELECT * FROM a ASOF JOIN b USING (k)")
    }
    intercept[IllegalArgumentException] {
      AsOfSql.rewrite("SELECT * FROM a ASOF JOIN b WHERE a.k = 1")
    }
  }

  // ------------------------------------------------------------ end-to-end

  private def fixture(): Unit = {
    import spark.implicits._
    Seq((1L, 100L), (1L, 205L), (1L, 300L), (2L, 50L), (3L, 10L))
      .toDF("k", "t").createOrReplaceTempView("trades_v")
    Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 250L, "c"), (2L, 60L, "x"))
      .toDF("qk", "qt", "px").createOrReplaceTempView("quotes_v")
  }

  test("ASOF LEFT JOIN sql matches the programmatic backward join") {
    fixture()
    val out = spark.sql(
      """SELECT k, t, qk, qt, px FROM trades_v ASOF LEFT JOIN quotes_v
        |ON k = qk AND t >= qt ORDER BY k, t""".stripMargin).collect().toSeq
    assert(out == Seq(
      Row(1L, 100L, 1L, 100L, "a"),
      Row(1L, 205L, 1L, 200L, "b"),
      Row(1L, 300L, 1L, 250L, "c"),
      Row(2L, 50L, null, null, null),
      Row(3L, 10L, null, null, null)))
  }

  test("plain ASOF JOIN is inner: unmatched lefts dropped") {
    fixture()
    val out = spark.sql(
      """SELECT k, t, px FROM trades_v ASOF JOIN quotes_v
        |ON k = qk AND t >= qt ORDER BY k, t""".stripMargin).collect().toSeq
    assert(out == Seq(
      Row(1L, 100L, "a"), Row(1L, 205L, "b"), Row(1L, 300L, "c")))
  }

  test("<= inequality runs the forward merge (earliest at-or-after)") {
    fixture()
    val out = spark.sql(
      """SELECT k, t, qt, px FROM trades_v ASOF LEFT JOIN quotes_v
        |ON k = qk AND t <= qt ORDER BY k, t""".stripMargin).collect().toSeq
    assert(out == Seq(
      Row(1L, 100L, 100L, "a"),     // inclusive bound
      Row(1L, 205L, 250L, "c"),     // earliest of the later quotes
      Row(1L, 300L, null, null),    // nothing at-or-after
      Row(2L, 50L, 60L, "x"),
      Row(3L, 10L, null, null)))
  }

  test("the physical plan is the native AsOfJoin exec") {
    fixture()
    val df = spark.sql(
      "SELECT k, t, px FROM trades_v ASOF JOIN quotes_v ON k = qk AND t >= qt")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin ["))
    df.collect() // and it runs
  }

  test("both sides from the same source work (relation dedup)") {
    fixture()
    // self-as-of: latest earlier trade of the same key
    val out = spark.sql(
      """SELECT a.t AS t1, b.t AS t2 FROM trades_v a ASOF JOIN trades_v b
        |ON a.k = b.k AND a.t >= b.t + 1 ORDER BY t1""".stripMargin)
    // b.t + 1 keeps the match strictly earlier; key 1 rows at 205/300 match
    assert(out.collect().toSeq == Seq(Row(205L, 100L), Row(300L, 205L)))
  }

  test("analysis rejects shapes the merge cannot run") {
    fixture()
    def bad(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    assert(bad("SELECT * FROM trades_v ASOF JOIN quotes_v ON t >= qt")
      .contains("equi-key"))
    assert(bad("SELECT * FROM trades_v ASOF JOIN quotes_v " +
      "ON k = qk AND t >= qt AND t <= qt + 10")
      .contains("exactly one time inequality"))
    assert(bad("SELECT * FROM trades_v ASOF JOIN quotes_v ON k = qk")
      .contains("time inequality"))
  }
}
