package graft

import org.apache.spark.sql.functions._

/** Scale stress for the privacy tier (not a test: sbt
  * "Test/runMain graft.ScaleStressPrivacy"): closed-form planted
  * answers at 10–20M rows.
  *
  *  - minimal-generalization k-anonymity over 20M rows whose uniform
  *    16-bit QI makes level 8 the exact answer (at level 7 the smallest
  *    bucket is 39_040 < k = 40_000; at level 8 every bucket is
  *    ≥ 78_080) — proves the lattice search stays domain-sized and
  *    lands the provable minimum at scale;
  *  - right-to-erasure over a 10M-row versioned table: exactly the
  *    subject's 100 rows deleted, residual 0, one commit.
  */
object ScaleStressPrivacy {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $label%-42s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    var ok = true
    def check(label: String, cond: Boolean): Unit = {
      if (!cond) ok = false
      println(s"[stress] $label: ${if (cond) "PASS" else "FAIL"}")
    }

    // ---- minimal generalization over 20M rows ------------------------
    locally {
      val df = spark.range(20000000L).select(lit("seg").as("qi"),
        (col("id") % 65536L).cast("double").as("num"),
        (col("id") % 7L).as("sens"))
      val (lvl, classes) = time("k-anonymity lattice 20M rows")(
        graft.operators.Privacy.minimalGeneralization(
          df, Seq("qi"), "num", "sens", k = 40000L, l = 2L))
      check("lattice lands exactly level 8", lvl == 8)
      val stats = classes.agg(count(lit(1)), min(col("class_size")),
        sum(col("class_size"))).head()
      check("256 classes at level 8, all >= 78_080, total 20M",
        stats.getLong(0) == 256L && stats.getLong(1) >= 78080L &&
          stats.getLong(2) == 20000000L)
    }

    // ---- right-to-erasure over a 10M-row versioned table -------------
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("stress_forget").toString
      val t = graft.storage.VersionedTable(spark, s"$root/t")
      time("build 10M-row versioned table")(
        t.append(spark.range(10000000L).select(
          (col("id") % 100000L).as("uid"), col("id").as("payload"))))
      val audit = time("forgetSubject 10M rows")(
        graft.operators.Privacy.forgetSubject(Seq(t -> "uid"), 77L)
          .head())
      check("exactly the subject's 100 rows deleted, residual 0",
        audit.getLong(2) == 100L && audit.getLong(4) == 0L)
      check("table retains the other 9_999_900 rows",
        t.read.count() == 9999900L)
    }

    println(s"[stress] PRIVACY ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
