package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the semantic contracts of the cohort-analytics operators that the
  * value-equality oracle can't discriminate on its own: retention's
  * offset-0 identity (everyone is active in their own cohort week) and
  * WAU's sliding-window meaning, cross-checked against a brute-force
  * range join the production operator deliberately avoids. */
class CohortSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("retention: offset 0 is the full cohort; counts conserve user-weeks") {
    val r = Events.retention(s, sf)
    val rows = r.collect()
    assert(rows.nonEmpty)
    // week 0 of every cohort contains exactly the cohort
    val off0 = rows.filter(_.getLong(1) == 0L)
    assert(off0.nonEmpty)
    off0.foreach { row =>
      assert(row.getLong(2) == row.getLong(3),
        s"cohort ${row.getLong(0)}: offset-0 n_active != cohort_size")
    }
    rows.foreach { row =>
      assert(row.getLong(1) >= 0, "negative week offset")
      val ret = row.getDouble(4)
      assert(ret > 0.0 && ret <= 1.0, s"retention out of (0,1]: $ret")
    }
    // sum of n_active over all cells == distinct (user, week) pairs
    val totalActive = rows.map(_.getLong(2)).sum
    val userWeeks = Tables.events(s, sf)
      .select(col("user_id"),
        (datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) / 7)
          .cast("long").as("week"))
      .distinct().count()
    assert(totalActive == userWeeks, "retention cells lose or invent user-weeks")
  }

  test("active users: WAU equals the brute-force trailing-7-day distinct count") {
    val out = Events.activeUsers(s, sf)
    val ud = Tables.events(s, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    // test-only brute force: a genuine range join over the bounded domain
    val brute = ud.select(col("day")).distinct()
      .join(ud.select(col("user_id"), col("day").as("aday")),
        datediff(col("day"), col("aday")).between(0, 6))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("expect_wau"))
    val joined = out.join(brute, "day")
    assert(joined.count() == out.count(), "day domains differ")
    assert(joined.filter(col("wau") =!= col("expect_wau")).count() == 0,
      "WAU disagrees with the brute-force sliding count")
    assert(out.filter(col("wau") < col("dau")).count() == 0, "WAU below DAU")
  }

  test("stickiness: MAU equals the brute-force trailing-28-day distinct count") {
    val out = Events.stickiness(s, sf)
    val ud = Tables.events(s, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    // test-only brute force: a genuine range join over the bounded domain
    val brute = ud.select(col("day")).distinct()
      .join(ud.select(col("user_id"), col("day").as("aday")),
        datediff(col("day"), col("aday")).between(0, 27))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("expect_mau"))
    val joined = out.join(brute, "day")
    assert(joined.count() == out.count(), "day domains differ")
    assert(joined.filter(col("mau") =!= col("expect_mau")).count() == 0,
      "MAU disagrees with the brute-force sliding count")
    assert(out.filter(col("mau") < col("dau")).count() == 0, "MAU below DAU")
    assert(out.filter(col("stickiness") <= 0.0 || col("stickiness") > 1.0).count() == 0,
      "stickiness out of (0, 1]")
  }

  test("growth accounting conserves weekly actives and balances churn") {
    val wk = Tables.events(s, sf)
      .select(col("user_id"),
        (datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) / 7)
          .cast("long").as("week"))
      .distinct()
    val active = wk.groupBy("week").agg(count(lit(1)).as("n_active"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Events.growthAccounting(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, nNew, nRet, nRes, nChu) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // new + retained + resurrected decomposes exactly this week's actives
      assert(nNew + nRet + nRes == active.getOrElse(w, 0L),
        s"week $w: decomposition does not sum to the active count")
      // churn balance: everyone active last week either retained or churned
      if (active.contains(w - 1))
        assert(nRet + nChu == active(w - 1),
          s"week $w: retained + churned != last week's actives")
    }
    // nobody can churn after the horizon: the last week carries no
    // phantom churn row beyond max_week (attribution stops at horizon)
    val maxWeek = active.keys.max
    assert(rows.forall(_.getLong(0) <= maxWeek), "churn attributed past the horizon")
    // the first observed week is all-new
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(1) == active(first.getLong(0)) &&
      first.getLong(2) == 0L && first.getLong(3) == 0L,
      "first week must be entirely new users")
  }

  test("power curve is a complete partition of users and activity") {
    val ud = Tables.events(s, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val rows = Events.powerCurve(s, sf).collect()
    assert(rows.nonEmpty)
    // buckets partition the user base and the (user, day) activity mass
    val users = rows.map(_.getLong(1)).sum
    assert(users == ud.select("user_id").distinct().count(), "histogram loses users")
    val userDays = rows.map(_.getLong(2)).sum
    assert(userDays == ud.count(), "user-day mass not conserved")
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares must sum to 1, got $shareSum")
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1), "user_days != n_days * n_users")
    }
  }

  test("retention and WAU plan equi-joins and map-side-combined aggregates only") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    def nonEqui(p: SparkPlan) = flatten(p).collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    val r = Events.retention(s, sf)
    r.collect() // force AQE finalization
    assert(nonEqui(r.queryExecution.executedPlan).isEmpty,
      s"retention must stay equi-join only:\n${r.queryExecution.executedPlan}")
    // Catalyst rewrites min-over-distinct into a direct partial min (a
    // smaller shuffle payload than reusing the distinct's exchange);
    // what matters is that every corpus-sized aggregate combines
    // map-side before its shuffle
    val rStr = r.queryExecution.executedPlan.toString
    assert(rStr.contains("partial_min") && rStr.contains("partial_count"),
      s"cohort/offset aggregates must combine map-side:\n$rStr")
    val w = Events.activeUsers(s, sf)
    w.collect()
    assert(nonEqui(w.queryExecution.executedPlan).isEmpty,
      s"WAU must stay equi-join/aggregate only:\n${w.queryExecution.executedPlan}")
  }
}
