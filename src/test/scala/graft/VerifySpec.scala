package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.udf
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Verify failure contract: a throwing query leaves a loud
  * `<name>.FAILED` marker in the artifacts (so a dropped CORRECTNESS row
  * can never read as a clean round), and stale results/markers from prior
  * runs can never mask the current run's outcome.
  */
class VerifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => { import s.implicits._; Seq((1, "a")).toDF("k", "v") }
  private val bad: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("boom at plan time")
  // throws at EXECUTION time (the q17 shape: plans fine, dies in the job)
  private val badExec: (SparkSession, String) => DataFrame =
    (s, _) => {
      import s.implicits._
      val boom = udf { (_: Int) =>
        if (System.nanoTime() != 0L)
          throw new IllegalStateException("boom at exec time")
        0
      }
      Seq(1).toDF("k").select(boom($"k").as("k"))
    }

  test("a throwing query writes a FAILED marker; a passing one writes parquet and no marker") {
    val out = Files.createTempDirectory("verify_spec").toString
    assert(Verify.dumpOne(spark, out, "ok_q", good, "unused"))
    assert(Files.exists(Paths.get(s"$out/ok_q")))
    assert(!Files.exists(Paths.get(s"$out/ok_q.FAILED")))

    assert(!Verify.dumpOne(spark, out, "bad_q", bad, "unused"))
    val marker = Paths.get(s"$out/bad_q.FAILED")
    assert(Files.exists(marker))
    assert(Files.readString(marker).contains("boom at plan time"))

    assert(!Verify.dumpOne(spark, out, "bad_exec_q", badExec, "unused"))
    assert(Files.exists(Paths.get(s"$out/bad_exec_q.FAILED")))
  }

  test("stale results cannot mask a new failure, and stale markers clear on success") {
    val out = Files.createTempDirectory("verify_spec2").toString
    // run 1: query passes, parquet exists
    assert(Verify.dumpOne(spark, out, "q", good, "unused"))
    // run 2: same query now throws — old parquet must be GONE + marker set
    assert(!Verify.dumpOne(spark, out, "q", bad, "unused"))
    assert(!Files.exists(Paths.get(s"$out/q")))
    assert(Files.exists(Paths.get(s"$out/q.FAILED")))
    // run 3: fixed again — marker must clear
    assert(Verify.dumpOne(spark, out, "q", good, "unused"))
    assert(!Files.exists(Paths.get(s"$out/q.FAILED")))
    assert(Files.exists(Paths.get(s"$out/q")))
  }
}
