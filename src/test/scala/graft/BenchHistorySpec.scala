package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sustained-contention detector: bench mins verified against the
  * persisted best-idle baseline, not against the run itself. The
  * regression test is the r11 escape — a driver record whose entries sat
  * 4–13× above their idle truth with first/min ≈ 1.0 (all three reps
  * slowed equally), which the within-run ratio heuristic certified
  * "clean".
  */
class BenchHistorySpec extends AnyFunSuite {

  // the r11 polluted driver record (judge-adjudicated idle truths right)
  private val r11Record = Map(
    "q183_frequent_triples" -> 17.06, "q182_grid_cluster" -> 11.09,
    "q184_cdc_chunks" -> 9.18, "q109_pagerank" -> 7.06,
    "q187_web_pipeline" -> 6.76, "q185_jaro_winkler" -> 5.56,
    "q110_data_card" -> 5.46, "q113_asof_nearest" -> 4.13)
  private val idleBest = Map(
    "q183_frequent_triples" -> 3.97, "q182_grid_cluster" -> 2.52,
    "q184_cdc_chunks" -> 0.93, "q109_pagerank" -> 2.81,
    "q187_web_pipeline" -> 1.24, "q185_jaro_winkler" -> 1.04,
    "q110_data_card" -> 0.40, "q113_asof_nearest" -> 0.84)

  test("replaying the r11 polluted record against the idle map flags every offender") {
    val reg = Bench.historyRegressions(r11Record, idleBest)
    // q184 was the heuristic-invisible case: first/min 1.02, yet 9.9× idle
    assert(reg.contains("q184_cdc_chunks"))
    assert(reg.keySet == r11Record.keySet) // all eight are >2x + >0.5s over
  }

  test("an idle re-run of the same queries stays clean") {
    // the judge's idle re-run numbers for the identical binary
    val idleRun = Map(
      "q183_frequent_triples" -> 3.97, "q182_grid_cluster" -> 2.52,
      "q184_cdc_chunks" -> 0.95, "q109_pagerank" -> 2.85,
      "q187_web_pipeline" -> 1.30, "q185_jaro_winkler" -> 1.10,
      "q110_data_card" -> 0.44, "q113_asof_nearest" -> 0.88)
    assert(Bench.historyRegressions(idleRun, idleBest).isEmpty)
  }

  test("sub-second jitter cannot flag: the 0.5s absolute excess floor") {
    // 0.2 -> 0.55 is 2.75x but only +0.35s — scheduler noise, not contention
    assert(Bench.historyRegressions(
      Map("q" -> 0.55), Map("q" -> 0.2)).isEmpty)
    // 0.2 -> 0.9 is both >2x and >0.5s over — flagged
    assert(Bench.historyRegressions(
      Map("q" -> 0.9), Map("q" -> 0.2)).nonEmpty)
  }

  test("queries with no recorded best are never flagged (first recording)") {
    assert(Bench.historyRegressions(Map("new_q" -> 99.0), Map.empty).isEmpty)
  }

  test("mergedBaseline lowers existing mins on any run, admits new only when idle") {
    val base = Map("a" -> 1.0, "b" -> 2.0)
    val run = Map("a" -> 0.8, "b" -> 9.0, "c" -> 3.0)
    val loaded = Bench.mergedBaseline(base, run, admitNew = false)
    assert(loaded == Map("a" -> 0.8, "b" -> 2.0)) // lowered, never raised; no new
    val idle = Bench.mergedBaseline(base, run, admitNew = true)
    assert(idle == Map("a" -> 0.8, "b" -> 2.0, "c" -> 3.0))
    // failed queries (negative sentinel) never pollute the map
    assert(Bench.mergedBaseline(base, Map("a" -> -1.0, "d" -> -1.0),
      admitNew = true) == base)
  }
}
