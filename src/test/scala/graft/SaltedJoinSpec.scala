package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SaltedJoin

/** Salted join must produce exactly the rows of the plain join, just spread
  * over saltFactor× sub-partitions.
  */
class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("salted inner join == plain inner join (skewed fact side)") {
    // 10k fact rows, 90% on one hot key
    val fact = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 5).as("k"),
        (col("id") * 2).as("v"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"), (7L, "hot"))
      .toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).select("id", "k", "v", "name")
    val salted = SaltedJoin.inner(fact, dim, Seq("k"), 8, col("id"))
      .select("id", "k", "v", "name")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("skewProfile surfaces the hot key with its share") {
    val fact = spark.range(1000)
      .select(when(col("id") < 900, lit(42L)).otherwise(col("id")).as("k"))
    val prof = SaltedJoin.skewProfile(fact, Seq("k"), topN = 1).collect().head
    assert(prof.getLong(0) == 42L)
    assert(prof.getLong(1) == 900L)
    assert(math.abs(prof.getDouble(2) - 0.9) < 1e-12)
  }
}
