package graft

// Temporary profiling harness (not a test): sbt "Test/runMain graft.ProfileQ23"
// Times the near-dup catalog queries exactly as Bench does (noop sink),
// twice each — nothing is pre-cached, so the first number is the honest
// cold-in-session cost and the second shows steady-state (JIT/codegen).
object ProfileQ23 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (q <- Seq("q23_minhash_dedup", "q24_simhash_pairs"); run <- 1 to 2)
      time(s"$q run$run")(
        Queries.all.toMap.apply(q)(spark, dir)
          .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
