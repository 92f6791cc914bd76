package graft

// Temporary profiling harness (not a test): sbt "Test/runMain graft.ProfileQ114"
// Times the windowed-dedup query exactly as Bench does (noop sink), three
// reps — rep 1 is the honest cold-in-session cost, reps 2-3 steady-state.
object ProfileQ114 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (run <- 1 to 3)
      time(s"q114 run$run")(
        Queries.all.toMap.apply("q114_windowed_dedup")(spark, dir)
          .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
