package graft

// Temporary profiling harness (not a test): sbt "Test/runMain graft.ProfileQ23"
object ProfileQ23 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = Tables(spark, dir, "documents")
    time("warm: count docs")(d.count())

    // pieces of minhashDedupExact
    val reps = time("reps materialize") {
      val r = d
        .withColumn("_sig", graft.plans.expressions.minhashText(col("text"), 3, 64))
        .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(graft.plans.expressions.rollingFingerprint(col("text")))
            .orderBy(col("doc_id"))))
        .filter(col("_rn") === 1).drop("_rn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val cand = time("candidate pairs") {
      val c = graft.operators.Dedup.minhashCandidatePairs(
        reps.drop("_sig"), "text", "doc_id", 3, 64, 32, 512)
      c.persist(); c.count(); c
    }
    println(s"[prof] n_cand=${cand.count()}")
    val exactPairs = time("exact rescore") {
      val candIds = cand.select(col("id_a").as("_id"))
        .union(cand.select(col("id_b").as("_id"))).distinct()
      val sh = reps.select(col("doc_id").cast("long").as("_id"), col("text"))
        .join(candIds, Seq("_id"), "left_semi")
        .select(col("_id"), graft.operators.Dedup.shingles(col("text"), 3).as("_sh"))
      val e = cand
        .join(sh.select(col("_id").as("id_a"), col("_sh").as("sh_a")), "id_a")
        .join(sh.select(col("_id").as("id_b"), col("_sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          graft.operators.Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.7)
      e.persist(); e.count(); e
    }
    val cc = time("connected components") {
      val c = graft.operators.Dedup.connectedComponents(exactPairs)
      c.count(); c
    }
    time("final anti-join + agg") {
      val dup = cc.filter(col("id") =!= col("component")).select(col("id").as("_dup_id"))
      reps.join(dup, col("doc_id").cast("long") === col("_dup_id"), "left_anti")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_survivors"))
        .write.mode("overwrite").format("noop").save()
    }
    // full query, second run (steady state)
    time("full q23 (fresh)")(
      Queries.q23MinhashDedup(spark, dir).write.mode("overwrite").format("noop").save())
    time("full q23 (again)")(
      Queries.q23MinhashDedup(spark, dir).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
