package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 fused native expressions: each must be VALUE-identical to
  * the composed expression-tree formulation it replaced, because every
  * consuming gate's DuckDB oracle recomputes those values in SQL (the
  * q132 swap discipline — prove equivalence with a spec, then swap).
  */
class FusedExprSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)

  test("md5_keyed_hashes equals the composed md5/conv transform tree") {
    val texts = Seq("hello world", "αβγ 漢字 test", "a", "x y z " * 40,
      "the quick brown fox", "", "ünïcodé|pipe|chars", "123|456")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "gram")
    val K = 32
    val composed = df.select($"id", expr(
      "transform(sequence(0, 31), i -> " +
        "cast(conv(substring(md5(concat(cast(i as string), '|', gram))," +
        " 1, 15), 16, 10) as bigint))").as("ha"))
      .as[(Long, Seq[Long])].collect().toMap
    val native = df.select($"id",
      VectorExpressions.md5_keyed_hashes($"gram", K).as("ha"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.keySet == composed.keySet)
    native.keySet.foreach { id =>
      assert(native(id) == composed(id),
        s"gram ${texts(id.toInt)}: native=${native(id)} composed=${composed(id)}")
    }
  }

  // the exact HOF trees pq_codes/adc_dist replaced (round 14)
  private def hofPqCodes(cb: Seq[Seq[Long]], vec: org.apache.spark.sql.Column,
                         m: Int, sub: Int): org.apache.spark.sql.Column =
    transform(typedLit(List.range(0, m)), sIdx =>
      array_min(transform(typedLit(cb), (cbv, ci) => struct(
        aggregate(
          zip_with(slice(vec, sIdx * sub + 1, lit(sub)),
            slice(cbv, sIdx * sub + 1, lit(sub)),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"),
        ci.as("code")))).getField("code"))

  private def hofAdcDist(cb: Seq[Seq[Long]], q: org.apache.spark.sql.Column,
                         codes: org.apache.spark.sql.Column,
                         m: Int, sub: Int): org.apache.spark.sql.Column =
    aggregate(
      transform(typedLit(List.range(0, m)), sIdx =>
        aggregate(
          zip_with(slice(q, sIdx * sub + 1, lit(sub)),
            slice(element_at(typedLit(cb), element_at(codes, sIdx + 1) + 1),
              sIdx * sub + 1, lit(sub)),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)),
      lit(0L), (acc, x) => acc + x)

  test("pq_codes and adc_dist equal the composed HOF trees, incl. ties") {
    val M = 4; val SUB = 16; val K = 16; val DIM = M * SUB
    val codebook: Array[Array[Long]] = Array.tabulate(K, DIM) { (c, d) =>
      // include duplicate codewords (0 and 1 identical) to pin the
      // smaller-code tiebreak
      if (c <= 1) (d % 7).toLong else rnd.nextInt(2001).toLong - 1000L
    }
    val cbSeq = codebook.map(_.toSeq).toSeq
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(DIM)(d =>
        if (i == 0) (d % 7).toLong // exactly equal to codewords 0 AND 1
        else rnd.nextInt(2001).toLong - 1000L).toSeq)
    }
    val df = vecs.toDF("id", "v")
    val composedCodes = df.select($"id",
      hofPqCodes(cbSeq, $"v", M, SUB).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    val nativeCodes = df.select($"id",
      VectorExpressions.pq_codes($"v", codebook, M, SUB).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(nativeCodes == composedCodes)
    // tie case: vec 0 must pick code 0, not 1
    assert(nativeCodes(0L) == Seq(0, 0, 0, 0))

    val coded = df.select($"id", $"v",
      VectorExpressions.pq_codes($"v", codebook, M, SUB).as("codes"))
    val composedDist = coded.select($"id",
      hofAdcDist(cbSeq, $"v", $"codes", M, SUB).as("d"))
      .as[(Long, Long)].collect().toMap
    val nativeDist = coded.select($"id",
      VectorExpressions.adc_dist($"v", $"codes", codebook, M, SUB).as("d"))
      .as[(Long, Long)].collect().toMap
    assert(nativeDist == composedDist)
    // self-coded exact-codeword vector reconstructs exactly: distance 0
    assert(nativeDist(0L) == 0L)
  }

  test("grid_l2sq equals the composed zip_with/aggregate tree") {
    val DIM = 64
    val vecs = (0 until 40).map { i =>
      (i.toLong,
        Array.tabulate(DIM)(_ => rnd.nextInt(2001).toLong - 1000L).toSeq,
        Array.tabulate(DIM)(_ => rnd.nextInt(2001).toLong - 1000L).toSeq)
    } :+ ((40L, Seq(1L, 2L), Seq(1L, 2L, 3L))) // length mismatch → NULL
    val df = vecs.toDF("id", "a", "b")
    def hof(pfx: Option[Int]) = {
      val (x, y) = pfx match {
        case Some(p) => (slice($"a", 1, p), slice($"b", 1, p))
        case None    => ($"a", $"b")
      }
      aggregate(zip_with(x, y, (u, v) => (u - v) * (u - v)),
        lit(0L), (acc, e) => acc + e)
    }
    for ((pfx, native) <- Seq(
        (None, VectorExpressions.grid_l2sq($"a", $"b")),
        (Some(16), VectorExpressions.grid_l2sq($"a", $"b", 16)))) {
      val c = df.select($"id", hof(pfx).as("d")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
          else java.lang.Long.valueOf(r.getLong(1)))).toMap
      val n = df.select($"id", native.as("d")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
          else java.lang.Long.valueOf(r.getLong(1)))).toMap
      assert(n == c, s"prefix=$pfx")
    }
  }

  test("adc_dist is NULL (not an error) on out-of-range codes") {
    // the HOF tree THREW here under ANSI element_at (Spark 4 default);
    // no gate can reach this case — codes always come from pq_codes, so
    // they are in [0, K) by construction — and the fused expression
    // picks the strictly-safer total behavior: NULL, never a crash
    val M = 2; val SUB = 2
    val codebook = Array(Array(1L, 2L, 3L, 4L), Array(5L, 6L, 7L, 8L))
    val df = Seq((1L, Seq(1L, 2L, 3L, 4L), Seq(0, 5)))
      .toDF("id", "v", "codes")
    val nat = df.select(
      VectorExpressions.adc_dist($"v", $"codes", codebook, M, SUB).as("d"))
      .collect()(0).isNullAt(0)
    assert(nat, "out-of-range code must be NULL")
  }
}
