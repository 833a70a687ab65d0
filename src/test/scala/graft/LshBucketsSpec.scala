package graft

import org.apache.spark.sql.functions._
import graft.functions.LshBuckets
import graft.ops.Similarity

/** Bit-identity gate for the [[graft.functions.LshBuckets]] codegen
  * expression vs the per-column `Similarity.lshBucket` formulation it
  * replaced in every bucketed-LSH plan (the old CreateArray-of-whens
  * tree blew the 64 KB codegen method limit at the 100× knob schedule).
  * Equality here is what keeps every LSH oracle valid: same plane
  * family, same left-to-right IEEE accumulation, same ≥0 sign rule,
  * same null/empty edge semantics.
  */
class LshBucketsSpec extends SparkSpecBase {
  import spark.implicits._

  test("LshBuckets is bit-identical to the per-column lshBucket battery") {
    val rnd = new scala.util.Random(42)
    val dim = 16; val bits = 5; val tables = 7
    val rows = (0 until 500).map { id =>
      (id.toLong, Array.fill(dim)(rnd.nextGaussian()))
    }
    val df = rows.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val neu = df.select(col("vec_id"),
      LshBuckets(col("v"), dim, bits, tables).as("b"))
    val old = df.select(col("vec_id"), array((0 until tables).map(t =>
      Similarity.lshBucket(col("v"), dim, bits, t)): _*).as("b"))
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty)
  }

  test("LshBuckets at the 100x schedule (dim 64, bits 12, tables 64)") {
    val rnd = new scala.util.Random(7)
    val dim = 64; val bits = 12; val tables = 64
    val df = (0 until 50).map(id => (id.toLong, Array.fill(dim)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val got = df.select(LshBuckets(col("v"), dim, bits, tables).as("b"))
      .as[Array[Long]].collect()
    assert(got.forall(_.length == tables))
    assert(got.forall(_.forall(b => b >= 0 && b < (1L << bits))))
    // spot-check one row against a from-first-principles replay
    val v = df.orderBy("vec_id").select("v").as[Array[Double]].head()
    val expect = (0 until tables).map { t =>
      (0 until bits).map { j =>
        val p = t * bits + j
        val dot = (0 until dim).foldLeft(0.0)((a, i) =>
          a + v(i) * LshBuckets.planeSign(p, i))
        if (dot >= 0) 1L << j else 0L
      }.sum
    }.toArray
    val first = df.orderBy("vec_id")
      .select(LshBuckets(col("v"), dim, bits, tables)).as[Array[Long]].head()
    assert(java.util.Arrays.equals(first, expect))
  }

  test("LshBuckets null and empty vector edges match the old formulation") {
    val bits = 5; val tables = 3
    val df = Seq(
      (1L, Some(Array(0.5, -0.25, 1.0, 0.125))),
      (2L, None: Option[Array[Double]]),
      (3L, Some(Array.empty[Double]))
    ).toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val got = df.orderBy("vec_id")
      .select(LshBuckets(col("v"), 4, bits, tables).as("b"))
      .as[Array[Long]].collect()
    val old = df.orderBy("vec_id")
      .select(array((0 until tables).map(t =>
        Similarity.lshBucket(col("v"), 4, bits, t)): _*).as("b"))
      .as[Array[Long]].collect()
    assert(got.zip(old).forall { case (a, b) => java.util.Arrays.equals(a, b) })
    // null vector -> all-zero buckets; empty vector -> every bit set
    assert(got(1).forall(_ == 0L))
    assert(got(2).forall(_ == (1L << bits) - 1))
  }

  test("LshBuckets rejects a non-array<double> child at analysis time") {
    val df = Seq((1L, Array(1L, 2L))).toDF("vec_id", "v")
    val e = intercept[Exception] {
      df.select(LshBuckets(col("v"), 2, 3, 2)).collect()
    }
    assert(e.getMessage.contains("array<double>") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
