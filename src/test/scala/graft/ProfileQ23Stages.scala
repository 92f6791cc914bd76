package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Temporary phase-budget harness (not a test):
  * sbt "Test/runMain graft.operators.ProfileQ23Stages [sfDir]"
  * Replays minhashDedupExact's phases with a forcing count per phase so
  * the q23 stage budget (SURVEY §6 creep watch) attributes time to the
  * exact pre-pass / banding / rescore / components / anti-join stages.
  * Lives in graft.operators for access to the candidate generator.
  */
object ProfileQ23Stages {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.plans.expressions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q23-stage] $label%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"-- rep $rep --")
      val d = graft.Tables(spark, dir, "documents")
      val reps = d
        .withColumn("_rn", row_number().over(
          Window.partitionBy(md5(normalizedText(col("text")).cast("binary")))
            .orderBy(col("doc_id"))))
        .filter(col("_rn") === 1).drop("_rn")
        .withColumn("_sig", minhashText(col("text"), 3, 64))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("exact pre-pass + sig")(reps.count())
      val cand = Dedup.candidatePairsFromSigs(
          reps.select(col("doc_id").cast("long").as("id"), col("_sig").as("sig")),
          bands = 32, rowsPerBand = 2, maxBucketSize = 512)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("banding + candidates")(cand.count())
      val candIds = cand
        .select(explode(array(col("id_a"), col("id_b"))).as("_id")).distinct()
      val sh = reps.select(col("doc_id").cast("long").as("_id"), col("text"))
        .join(candIds, Seq("_id"), "left_semi")
        .select(col("_id"), Dedup.shingles(col("text"), 3).as("_sh"))
      val exactPairs = cand
        .join(sh.select(col("_id").as("id_a"), col("_sh").as("sh_a")), "id_a")
        .join(sh.select(col("_id").as("id_b"), col("_sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.7)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("exact rescore")(exactPairs.count())
      val dupIds = Dedup.connectedComponents(exactPairs)
        .filter(col("id") =!= col("component"))
        .select(col("id").as("_dup_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("connected components")(dupIds.count())
      time("anti-join + result ck")(
        reps.join(dupIds, col("doc_id").cast("long") === col("_dup_id"),
            "left_anti").drop("_sig")
          .localCheckpoint(true))
      Seq(reps, cand, exactPairs, dupIds).foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
