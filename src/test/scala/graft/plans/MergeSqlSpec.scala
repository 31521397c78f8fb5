package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The injected MERGE INTO parser (GraftSqlParser): clause semantics on
  * a controlled fixture — both WHEN branches, first-matching-clause
  * order, condition-less clauses — and rejection of malformed
  * statements. The oracle gate (k_merge_sql ≡ k_merge_upsert's oracle)
  * proves the production lowering; this spec pins the grammar. */
class MergeSqlSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def fixture(): Unit = {
    import s.implicits._
    Seq((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L), (4L, "four", 40L))
      .toDF("id", "name", "v").createOrReplaceTempView("msq_t")
    Seq(("D", 1L, ""), ("U", 2L, "TWO"), ("I", 9L, "nine"))
      .toDF("op", "id", "nv").createOrReplaceTempView("msq_s")
  }

  test("delete, update, and insert branches all apply; unmatched rows keep") {
    fixture()
    val out = s.sql(
      """MERGE INTO msq_t AS t USING msq_s AS c
        |ON t.id = c.id AND c.op <> 'I'
        |WHEN MATCHED AND c.op = 'D' THEN DELETE
        |WHEN MATCHED AND c.op = 'U' THEN UPDATE SET name = c.nv
        |WHEN NOT MATCHED AND c.op = 'I' THEN INSERT (id, name, v) VALUES (c.id, c.nv, 0)
        |""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (2L, "TWO", 20L),    // updated, other columns kept
      (3L, "three", 30L),  // untouched
      (4L, "four", 40L),   // untouched
      (9L, "nine", 0L)))   // inserted; id 1 deleted
  }

  test("first matching clause wins (SQL:2003 order semantics)") {
    fixture()
    val out = s.sql(
      """MERGE INTO msq_t AS t USING msq_s AS c
        |ON t.id = c.id
        |WHEN MATCHED AND t.id = 2 THEN UPDATE SET name = 'first'
        |WHEN MATCHED THEN UPDATE SET name = 'second'
        |""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // id 1 and 2 both match; id 2 takes the FIRST clause, id 1 falls
    // through to the unconditioned second
    assert(out == Seq((1L, "second"), (2L, "first"), (3L, "three"), (4L, "four")))
  }

  test("condition-less NOT MATCHED inserts every unmatched source row") {
    fixture()
    val out = s.sql(
      """MERGE INTO msq_t t USING msq_s c
        |ON t.id = c.id
        |WHEN NOT MATCHED THEN INSERT (id, name, v) VALUES (c.id, c.nv, -1)
        |""".stripMargin)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L, 9L))
  }

  test("malformed statements are rejected with a parse error") {
    fixture()
    def bad(sql: String, fragment: String): Unit = {
      val e = intercept[Exception](s.sql(sql))
      assert(e.getMessage.contains(fragment),
        s"expected '$fragment' in: ${e.getMessage}")
    }
    bad("""MERGE INTO msq_t t USING msq_s c ON t.id = c.id
          |WHEN MATCHED THEN INSERT (id) VALUES (c.id)""".stripMargin,
      "INSERT is not allowed under WHEN MATCHED")
    bad("""MERGE INTO msq_t t USING msq_s c ON t.id = c.id
          |WHEN NOT MATCHED THEN DELETE""".stripMargin,
      "not allowed under WHEN NOT MATCHED")
    bad("""MERGE INTO msq_t t USING msq_s c ON t.id = c.id
          |WHEN NOT MATCHED THEN UPDATE SET name = c.nv""".stripMargin,
      "not allowed under WHEN NOT MATCHED")
    bad("MERGE INTO msq_t t USING msq_s c ON t.id = c.id",
      "at least one WHEN clause")
    bad("""MERGE INTO msq_t t USING msq_s c ON t.id = c.id
          |WHEN NOT MATCHED THEN INSERT (id, name) VALUES (c.id)""".stripMargin,
      "arity mismatch")
    bad("""MERGE INTO msq_t t USING msq_s c ON t.id = c.id
          |WHEN MATCHED THEN UPDATE SET name""".stripMargin,
      "cannot parse UPDATE SET assignment")
    bad("MERGE msq_t USING msq_s", "expected MERGE INTO")
  }

  test("non-MERGE statements pass through the delegate untouched") {
    assert(s.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) == 2)
  }
}
