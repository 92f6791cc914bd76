package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.storage.{VersionedTable, ZOrder}

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("zorder_").toString

  test("key is the Morton code on an aligned grid") {
    // 4x4 grid with bits=2 maps each coordinate to itself, so the key
    // must be the textbook interleave: (x,y) -> y1x1y0x0
    val grid = (for (x <- 0 to 3; y <- 0 to 3) yield (x, y)).toDF("x", "y")
    val keyed = grid.withColumn("z", ZOrder.key(grid, Seq("x", "y"), bits = 2))
      .as[(Int, Int, Long)].collect()
    keyed.foreach { case (x, y, z) =>
      val want = (0 until 2).map { b =>
        (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))
      }.sum
      assert(z == want, s"($x,$y) -> $z, want $want")
    }
  }

  test("3-dimension key interleaves every third bit") {
    val grid = (for (x <- 0 to 1; y <- 0 to 1; w <- 0 to 1)
      yield (x, y, w)).toDF("x", "y", "w")
    val keyed = grid.withColumn("z", ZOrder.key(grid, Seq("x", "y", "w"), bits = 1))
      .as[(Int, Int, Int, Long)].collect()
    keyed.foreach { case (x, y, w, z) =>
      assert(z == (x | (y << 1) | (w << 2)), s"($x,$y,$w) -> $z")
    }
  }

  test("compactZorder prunes 2-D boxes where linear clustering cannot") {
    val rows = {
      val rnd = new scala.util.Random(7)
      (0 until 40000).map(i => (rnd.nextInt(1000), rnd.nextInt(1000), i.toLong))
    }
    val df = rows.toDF("x", "y", "pay")

    val zRoot = tmp()
    val zt = VersionedTable(spark, zRoot)
    // arrival order = insertion order: uncorrelated with x and y
    (0 until 4).foreach(i => zt.append(df.filter(col("pay") % 4 === i)))
    zt.compactZorder(Seq("x", "y"), nParts = 16)

    val cRoot = tmp()
    val ct = VersionedTable(spark, cRoot)
    (0 until 4).foreach(i => ct.append(df.filter(col("pay") % 4 === i)))
    ct.compactClustered(Seq("x", "y"), nParts = 16)

    // 2-D box ~1/8 of each dimension
    val box = col("x").between(300, 420) && col("y").between(500, 620)
    val (zKept, zTotal) = zt.pruneStats(box)
    assert(zTotal == 16 && zKept * 2 <= zTotal,
      s"z-order kept $zKept of $zTotal for a 2-D box")

    // second-dimension-only predicate: linear clustering keeps ~all parts
    // (y is the tiebreak key), z-order still skips at least half
    val yOnly = col("y").between(0, 99)
    val (zyKept, _) = zt.pruneStats(yOnly)
    val (cyKept, cyTotal) = ct.pruneStats(yOnly)
    assert(zyKept * 2 <= zTotal,
      s"z-order kept $zyKept of $zTotal for a y-only range")
    assert(zyKept < cyKept || cyKept == cyTotal,
      s"z-order ($zyKept) should beat linear clustering ($cyKept) on y-only")

    // pruned reads stay exact
    val got = zt.readWhere(box).select("x", "y", "pay")
      .as[(Int, Int, Long)].collect().toSet
    val want = rows.filter(r => r._1 >= 300 && r._1 <= 420 &&
      r._2 >= 500 && r._2 <= 620).toSet
    assert(got == want)
    val gotY = zt.readWhere(yOnly).count()
    assert(gotY == rows.count(r => r._2 <= 99))
  }

  test("z-order rewrite preserves contents, schema, and offsets") {
    val root = tmp()
    val vt = VersionedTable(spark, root)
    vt.append((0 until 100).map(i => (i, i * 2, s"s$i")).toDF("a", "b", "s"),
      offsets = Map("k" -> 5L))
    vt.append((100 until 200).map(i => (i, i * 2, s"s$i")).toDF("a", "b", "s"))
    val before = vt.read.as[(Int, Int, String)].collect().toSet
    vt.compactZorder(Seq("a", "b"), nParts = 4)
    assert(vt.read.as[(Int, Int, String)].collect().toSet == before)
    assert(vt.offsets == Map("k" -> 5L))
    assert(vt.schema.fieldNames.toSeq == Seq("a", "b", "s"))
    // old version still readable (time travel untouched)
    assert(vt.readVersion(2).count() == 200)
  }

  test("date and timestamp dimensions are supported; strings are rejected") {
    val df = Seq(
      (java.sql.Date.valueOf("2020-01-01"), 1, "a"),
      (java.sql.Date.valueOf("2021-06-15"), 2, "b"))
      .toDF("d", "n", "s")
    // builds without error and yields a long key
    val z = df.withColumn("z", ZOrder.key(df, Seq("d", "n")))
      .select("z").as[Long].collect()
    assert(z.length == 2 && z.distinct.length == 2)
    val e = intercept[IllegalArgumentException] {
      ZOrder.key(df, Seq("d", "s"))
    }
    assert(e.getMessage.contains("zorder"))
  }

  test("appendZorder: delta lands as box-prunable parts; old parts untouched") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_zapp").toString
    val t = graft.storage.VersionedTable(spark, root)
    // base: one z-ordered grid
    val grid = for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong, s"b$x-$y")
    t.overwrite(grid.toDF("x", "y", "payload"))
    t.compactZorder(Seq("x", "y"), nParts = 4)
    val partsBefore = t.state.get.parts
    // delta: a disjoint id range, z-appended in its own 4 ranges
    val delta = for { x <- 100 until 132; y <- 100 until 132 }
      yield (x.toLong, y.toLong, s"d$x-$y")
    t.appendZorder(delta.toDF("x", "y", "payload"), Seq("x", "y"), nParts = 4)
    val s = t.state.get
    assert(s.parts.take(partsBefore.size) == partsBefore)
    assert(s.parts.size == partsBefore.size + 4)
    // a 2-D box INSIDE the delta prunes: the base parts and most delta
    // ranges are provably outside it
    val box = col("x").between(100L, 107L) && col("y").between(100L, 107L)
    val (kept, total) = t.pruneStats(box)
    assert(kept < total, s"kept $kept of $total")
    assert(t.readWhere(box).count() == 64L)
    assert(t.read.count() == (32 * 32 + 32 * 32).toLong)
  }
}
