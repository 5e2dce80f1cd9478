package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Forces whole-stage codegen with fallback DISABLED while evaluating
  * every custom expression — a doGenCode bug normally degrades silently
  * to interpreted eval; here it throws. Also cross-checks codegen vs
  * interpreted results for equality.
  */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "the quick brown fox jumps over it all", Array(1.0f, 2.0f, 3.0f)),
    (2L, "café straße ﬁle", Array(0.5f, -1.0f, 2.5f))
  ).toDF("id", "text", "vec")

  private def allExprs(d: org.apache.spark.sql.DataFrame) = d.select(
    col("id"),
    VectorExpressions.cosine_similarity(col("vec"), col("vec")).as("cos"),
    VectorExpressions.dot_product(col("vec"), col("vec")).as("dot"),
    VectorExpressions.simhash64(split(col("text"), "\\s+")).as("sh"),
    MinHashSignature.minhash_signature(split(col("text"), "\\s+"), 8).as("mh"),
    WordShingleMinHash.word_shingle_minhash(col("text"), 2, 8).as("wmh"),
    CharShingleMinHash.char_shingle_minhash(col("text"), 4, 8).as("cmh"),
    NormalizeUnicode.normalize_unicode(col("text"), "NFC").as("nfc"),
    VectorExpressions.srp_bucket(col("vec"), 6).as("srp"),
    VectorExpressions.nearest_cells(col("vec"),
      Array(1L, 2L), Array(Array(1f, 0f, 0f), Array(0f, 1f, 0f)), 1).as("cell"),
    VectorExpressions.morton_interleave(col("id"), col("id") + 1).as("mz"))

  test("all custom expressions survive forced codegen (no fallback)") {
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.fallback", "false")
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val rows = allExprs(df).collect()
      assert(rows.length == 2)
      assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-12) // self-cosine
      assert(rows(0).getDouble(2) === 14.0)                // 1+4+9
    } finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("morton_interleave: exact bit interleave + quadrant locality") {
    import VectorExpressions.MortonInterleave.interleave
    assert(interleave(0L, 0L) == 0L)
    assert(interleave(1L, 0L) == 1L)           // a bit 0 → position 0
    assert(interleave(0L, 1L) == 2L)           // b bit 0 → position 1
    assert(interleave(3L, 3L) == 15L)          // 0b11,0b11 → 0b1111
    assert(interleave(0xffffffffL, 0L) == 0x5555555555555555L)
    // quadrant locality: points sharing high halves of (x, y) sort together
    val inQuadrant = for (x <- 0 until 4; y <- 0 until 4)
      yield interleave(x, y)
    val elsewhere = interleave(4, 0)
    assert(inQuadrant.max < elsewhere)
    // column API over a frame
    val got = Seq((5L, 9L)).toDF("a", "b")
      .select(VectorExpressions.morton_interleave(col("a"), col("b")))
      .as[Long].head()
    assert(got == interleave(5L, 9L))
  }

  test("codegen and interpreted paths agree") {
    val conf = spark.conf
    def run(): Seq[Seq[Any]] =
      allExprs(df).orderBy("id").collect().map(_.toSeq).toSeq
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen = run()
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = run()
    conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(gen == interp)
  }
}
