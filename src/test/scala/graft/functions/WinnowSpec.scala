package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing expression: algorithmic correctness vs a naive
  * reference, the detection guarantee, and codegen/interpreted parity.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val B = 0x100000001b3L

  /** Naive reference: hash every k-gram independently, min per window
    * with the rightmost tie rule, collapse consecutive re-selections.
    */
  private def naive(s: String, k: Int, w: Int): Option[Seq[Long]] = {
    val b = s.getBytes("UTF-8")
    if (b.length < k + w - 1) return None
    val hs = (0 to b.length - k).map { i =>
      var h = 0L
      (i until i + k).foreach(j => h = h * B + (b(j) & 0xff))
      h
    }
    val sel = scala.collection.mutable.ArrayBuffer[Int]()
    (0 to hs.length - w).foreach { j =>
      val win = hs.slice(j, j + w)
      val min = win.min
      val pos = j + win.lastIndexOf(min) // rightmost minimal
      if (sel.isEmpty || sel.last != pos) sel += pos
    }
    Some(sel.map(hs).toSeq)
  }

  test("winnow matches the naive reference on varied strings") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abcd", "abcdefghij klmnop")
    for (len <- Seq(27, 28, 40, 100, 500); a <- alphabets; rep <- 1 to 3) {
      val s = (0 until len).map(_ => a(rnd.nextInt(a.length))).mkString
      val got = Option(WinnowFingerprints.winnow(
        UTF8String.fromString(s), 20, 8)).map(_.toSeq)
      assert(got == naive(s, 20, 8), s"mismatch on len=$len alphabet='$a'")
    }
  }

  test("short input yields NULL; boundary length yields one selection") {
    assert(WinnowFingerprints.winnow(UTF8String.fromString("x" * 26), 20, 8) == null)
    val one = WinnowFingerprints.winnow(UTF8String.fromString("x" * 27), 20, 8)
    assert(one != null && one.length == 1)
  }

  test("winnowOverlapPairs detects a planted shared run (production path)") {
    val shared = "the quick brown fox jumps over lazy dogs"
    val df = Seq(
      (1L, s"totally unrelated preamble before $shared and some tail"),
      (2L, s"$shared followed by other content that matches nothing"),
      (3L, "this third document shares no runs with the others at all"))
      .toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.winnowOverlapPairs(df)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    graft.ops.Dedup.releaseCaches()
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("md5_winnow_set equals the composed md5/conv/array_min formulation") {
    // the q132 gate swap (VERDICT r7 #3) is only sound if the native
    // fused pass is VALUE-identical to the expression-tree spec the
    // DuckDB oracle mirrors — including multi-byte chars, where the
    // composed form hashes the UTF-8 bytes of a CHAR substring
    val K = 20; val W = 8
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab", "abcdefghij klmnop", "αβγδε ζηθικ", "aé漢b ")
    val texts = (for (len <- Seq(27, 30, 64, 200); a <- alphabets) yield
      (0 until len).map(_ => a(rnd.nextInt(a.length))).mkString) :+
      ("x" * 27) :+ ("the quick brown fox jumps over the lazy dog " * 5)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val composed = df.filter(length($"text") >= K + W - 1)
      .select($"doc_id",
        array_distinct(transform(
          sequence(lit(1), length($"text") - (K - 1) - (W - 1)),
          j => array_min(slice(
            transform(sequence(lit(1), length($"text") - (K - 1)),
              i => conv(substring(md5($"text".substr(i, lit(K))
                .cast("binary")), 1, 15), 16, 10).cast("long")),
            j, lit(W))))).as("f"))
    val native = df.filter(length($"text") >= K + W - 1)
      .select($"doc_id",
        WinnowFingerprints.md5_winnow_set($"text", K, W).as("f"))
    val c = composed.as[(Long, Seq[Long])].collect().toMap
    val n = native.as[(Long, Seq[Long])].collect().toMap
    assert(n.keySet == c.keySet)
    n.keySet.foreach { id =>
      assert(n(id) == c(id), s"doc $id: native=${n(id)} composed=${c(id)}")
    }
  }

  test("expression is SQL-reachable and codegen agrees with the helper") {
    graft.GraftExtensions.install(spark)
    val s = "abcdefghijklmnopqrstuvwxyz0123456789 the quick brown fox"
    val viaSql = spark.sql(
      s"SELECT winnow_fingerprints('$s', 20, 8) AS f").as[Seq[Long]].head()
    val direct = WinnowFingerprints.winnow(UTF8String.fromString(s), 20, 8).toSeq
    assert(viaSql == direct)
  }
}
