package graft

import org.apache.spark.sql.functions._

/** Scale stress for the round-11 analytics tiers (not a test: sbt
  * "Test/runMain graft.ScaleStressAnalytics"): each operator runs at
  * 10–50M rows against a CLOSED-FORM planted answer, so the assert is
  * exactness at scale, not a smoke check.
  *
  *  - rolling 7-day distinct actives over 20M events whose activity
  *    pattern makes every interior window count exactly U·7/30 users;
  *  - weighted median over 50M rows whose triangular weight mass puts
  *    the 0.5 crossing at exactly v = 707;
  *  - Kaplan-Meier over 10M subjects with a 100-value duration domain,
  *    checked against an exact driver-side product-limit replay.
  */
object ScaleStressAnalytics {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
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

    // ---- rolling 7-day distinct actives: 20M events, 600k users -------
    // user u is active (for every event type it emits) exactly on day
    // u % 30, so a full 7-day window ending on day w in [6, 29] holds
    // exactly 7/30 of the users; event rows repeat (user, day) ~33x so
    // the distinct collapse is doing real work
    locally {
      val users = 600000L
      val ev = spark.range(20000000L).select(
        (col("id") % users).as("user_id"),
        lit("click").as("event_type"),
        ((col("id") % users) % 30).cast("int").as("dnum"))
      val dau = ev.select(col("event_type"), col("user_id"),
        col("dnum")).distinct()
      val out = time("rolling actives 20M rows")(
        dau.select(col("event_type"), col("user_id"),
            explode(sequence(col("dnum"),
              least(col("dnum") + 6, lit(29)))).as("wend"))
          .groupBy(col("event_type"), col("wend"))
          .agg(countDistinct(col("user_id")).as("active_7d"))
          .collect())
      val interior = out.filter(r => r.getInt(1) >= 6 && r.getInt(1) <= 29)
      check("rolling actives: 24 interior windows",
        interior.length == 24)
      check("rolling actives: every interior window = U*7/30",
        interior.forall(_.getLong(2) == users * 7 / 30))
    }

    // ---- weighted median: 50M rows, triangular weight mass ------------
    // v in 1..1000, weight v, 50k rows per value: cumW(x) = 50k*x(x+1)/2,
    // total 50k*500500; the 0.5 crossing is exactly v = 707
    locally {
      val df = spark.range(50000000L).select(lit("g").as("k"),
        ((col("id") % 1000L) + 1L).as("v"),
        ((col("id") % 1000L) + 1L).as("w"))
      val r = time("weighted median 50M rows")(
        graft.operators.Stats.weightedQuantile(df, Seq("k"), "v", "w",
          Seq(0.5)).head())
      check("weighted median crossing at exactly 707",
        r.getAs[Long]("value") == 707L &&
          r.getAs[Long]("total_weight") == 50000L * 500500L)
    }

    // ---- Kaplan-Meier: 10M subjects, 100-value duration domain --------
    // dur = uid % 100, event = uid % 2: per duration t there are 100k
    // subjects (50k deaths, 50k censored) — replay the product limit
    // exactly on the driver and compare every survival point
    locally {
      // e must be independent of dur: id%2 correlates with id%100
      val df = spark.range(10000000L).select(lit("g").as("k"),
        (col("id") % 100L).as("dur"), expr("(id div 100) % 2").as("e"))
      val got = time("kaplan-meier 10M subjects")(
        graft.operators.Stats.kaplanMeier(df, Seq("k"), "dur", "e")
          .orderBy(col("t")).collect()
          .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
            r.getAs[Long]("n_events"), r.getAs[Double]("survival"))))
      // driver replay with the same exp(sum ln) + 6dp rounding contract
      var atRisk = 10000000L
      var lnSum = 0.0
      val want = (0L until 100L).map { t =>
        val d = 50000L; val m = 100000L
        lnSum += math.log((atRisk - d).toDouble / atRisk)
        val s = BigDecimal(math.exp(lnSum))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val row = (t, atRisk, d, s)
        atRisk -= m
        row
      }
      check("kaplan-meier: all 100 survival points exact",
        got.length == 100 && got.sameElements(want))
    }

    println(s"[stress] ANALYTICS ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
