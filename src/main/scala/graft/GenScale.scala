package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out generator for cross-scale certification: replicates a driver
  * sf directory N× with per-copy key offsets, so sf1 = 10 × sf0.1 with the
  * SAME schema, value distributions, duplicate structure, and referential
  * integrity (every foreign key is offset consistently with its dimension).
  * Dimension constants (region, nation) are shared across copies, exactly
  * like TPC-H dbgen at higher scale factors.
  *
  * Copied embeddings get a tiny deterministic per-copy component jitter
  * (±3e-4, a function of (copy, component) only) so ANN rankings keep
  * distinct scores instead of 10-way exact ties; copy 0 stays bit-identical
  * to the source, so fixed query vectors (vec_id 3/7) are unchanged.
  *
  * `events.ts` is re-emitted as an ordinary micro timestamp (the source's
  * TIMESTAMP(NANOS) is unwritable by Spark); [[Tables.events]] handles both
  * shapes, and DuckDB's `CAST(ts AS TIMESTAMP)` truncates nanos to the same
  * micros, so oracle comparisons stay aligned at every scale.
  *
  * Usage: runMain graft.GenScale <srcSfDir> <outDir> <copies>
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args
    val copies = copiesS.toInt
    require(copies >= 1, s"copies must be >= 1, got $copies")
    val spark = GraftSession.get(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()

    // per-table key cardinality = offset stride (keys are 0-based dense)
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // one parquet FILE per table (the driver's sf layout, and what the
    // DuckDB oracle's read_parquet('<dir>/<t>.parquet') expects): write a
    // single-part dir, then promote the part file
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def write(name: String, df: DataFrame): Unit = {
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      require(part.length == 1, s"$name: expected 1 part, got ${part.length}")
      val dest = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
      fs.delete(dest, true)
      require(fs.rename(part.head, dest), s"$name: rename failed")
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      println(s"[genscale] $name: ${spark.read.parquet(dest.toString).count()} rows")
    }

    // dimension constants: one copy, shared by every replica
    for (t <- Seq("region", "nation"))
      write(t, spark.read.parquet(s"$src/$t.parquet"))

    val customer = Tables(spark, src, "customer")
    val supplier = Tables(spark, src, "supplier")
    val part = Tables(spark, src, "part")
    val orders = Tables(spark, src, "orders")
    val lineitem = Tables(spark, src, "lineitem")
    val events = Tables(spark, src, "events")
    val documents = Tables(spark, src, "documents")
    val embeddings = Tables(spark, src, "embeddings")

    val nCust = stride(customer, "c_custkey")
    val nSupp = stride(supplier, "s_suppkey")
    val nPart = stride(part, "p_partkey")
    val nOrd = stride(orders, "o_orderkey")
    val nEvt = stride(events, "event_id")
    val nUser = events.agg(max(col("user_id"))).head.getLong(0) + 1L
    val nDoc = stride(documents, "doc_id")
    val nVec = stride(embeddings, "vec_id")

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => shift(df, i)).reduce(_ unionByName _)

    write("customer", replicate(customer)((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * nCust))))
    write("supplier", replicate(supplier)((d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * nSupp))))
    write("part", replicate(part)((d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * nPart))))
    write("orders", replicate(orders)((d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * nOrd))
        .withColumn("o_custkey", col("o_custkey") + lit(i * nCust))))
    write("lineitem", replicate(lineitem)((d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * nOrd))
        .withColumn("l_partkey", col("l_partkey") + lit(i * nPart))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * nSupp))))
    write("events", replicate(events)((d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * nEvt))
        .withColumn("user_id", col("user_id") + lit(i * nUser))))
    // copies > 0 get a per-copy text marker: a corpus grows with NEW
    // near-duplicate content, not bitwise shards — within-copy duplicate
    // structure is preserved, cross-copy texts stay distinct (q68-style
    // unique-text probes keep a witness), and the n_chars = length(text)
    // invariant is maintained
    write("documents", replicate(documents)((d, i) =>
      if (i == 0) d
      else d.withColumn("doc_id", col("doc_id") + lit(i * nDoc))
        .withColumn("text", concat(col("text"), lit(s" c$i")))
        .withColumn("n_chars", col("n_chars") + lit(s" c$i".length.toLong))))
    write("embeddings", replicate(embeddings)((d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * nVec))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"transform(embedding, (x, j) -> x + " +
            s"cast((($i * 31 + j) % 7 - 3) * 1e-4 as float))"))))

    println(s"[genscale] wrote ${copies}x of $src to $out")
    spark.stop()
  }
}
