package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench self-healing DECISION RULES (r21: sentinel dead band closed).
  * Both r20 anomalies sat in the 1.2–1.6× sentinel band — below the old
  * 2×-only triggers — so the rules gained a weight-aware leg (heavy query
  * retries at 1.3× base) and a phase-level leg (replay phase re-runs at
  * 1.4× base). The predicates are pure, so the spec pins the exact
  * boundaries the board's published numbers depend on.
  */
class BenchSelfHealSpec extends AnyFunSuite {

  private val base = 0.15

  test("retry fires above 2x base regardless of query weight (unchanged leg)") {
    assert(Bench.shouldRetry(sec = 0.05, sen = 0.31, base = base))
    assert(Bench.shouldRetry(sec = 9.0, sen = 0.31, base = base))
  }

  test("retry does NOT fire for a light query in the 1.3-2x band") {
    // the r19/r20 behaviour preserved for sub-noise-floor queries: a mild
    // sentinel elevation on a 0.3 s query is noise, not signal
    assert(!Bench.shouldRetry(sec = 0.3, sen = 0.25, base = base))
  }

  test("retry DOES fire for a heavy query in the 1.3-2x band (r20 t_line_dedup class)") {
    // t_line_dedup's official 9.41 s reading came with sentinel 0.1868 vs
    // base 0.1505 (1.24x) — just under this trigger; its class (heavy
    // query + mildly elevated sentinel) is what the 1.3x leg exists for
    assert(Bench.shouldRetry(sec = 9.41, sen = base * 1.35, base = base))
    assert(!Bench.shouldRetry(sec = 9.41, sen = base * 1.25, base = base))
  }

  test("heavy-query leg activates strictly above 2s cost") {
    assert(!Bench.shouldRetry(sec = 1.9, sen = base * 1.5, base = base))
    assert(Bench.shouldRetry(sec = 2.1, sen = base * 1.5, base = base))
  }

  test("replay phase re-runs above 1.4x base (r20 replay_total class)") {
    // the r20 official phase: sentinel 0.2277 vs base 0.1505 (1.51x) with
    // replay_total 74.08 s — this reading must now trigger the full-phase
    // re-run; a quiet phase start must not
    assert(Bench.replayPhaseContended(0.2277, 0.1505))
    assert(!Bench.replayPhaseContended(0.1600, 0.1505))
  }
}
