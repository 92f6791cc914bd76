package graft

// Temporary profiling harness (not a test): sbt "Test/runMain graft.ProfilePipeline"
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dir = java.nio.file.Files.createTempDirectory("prof_co2")
    val sb = new StringBuilder("# bench fixture\n")
    var d = java.time.LocalDate.of(1974, 1, 1)
    val until = java.time.LocalDate.of(2026, 1, 1)
    while (d.isBefore(until)) {
      val co2 = 330.0 + (d.toEpochDay % 19000) * 0.005
      sb.append(s"${d.getYear} ${d.getMonthValue} ${d.getDayOfMonth} " +
        f"${d.getYear + d.getDayOfYear / 365.25}%.3f $co2%.2f\n")
      d = d.plusDays(1)
    }
    val feed = dir.resolve("feed.txt")
    java.nio.file.Files.writeString(feed, sb.toString)
    spark.range(1).count() // session warm
    val p = graft.co2.Co2Pipeline(spark, dir.resolve("wh").toString)
    time("load")(p.load(feed.toString))
    time("harmonize")(p.harmonize())
    time("analytics")(p.analytics())
    // second incremental run (steady state, one new day)
    java.nio.file.Files.writeString(feed,
      sb.toString + "2026 1 1 2026.003 425.00\n")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(js.properties.getProperty("callSite.short")).getOrElse("?")
        starts.put(js.jobId, (js.time, site)); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          done.add(((je.time - t0) / 1e3, site)) }
        ()
      }
    })
    val wall0 = System.nanoTime()
    time("full runPipeline (incr)")(p.runPipeline(feed.toString))
    val wall = (System.nanoTime() - wall0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val ds = done.asScala.toSeq
    println(f"[prof] jobs=${ds.size} jobTimeSum=${ds.map(_._1).sum}%.2f wall=$wall%.2f")
    ds.sortBy(-_._1).take(15).foreach { case (d, s) => println(f"[prof]   $d%6.2f  $s") }
    spark.stop()
  }
}
