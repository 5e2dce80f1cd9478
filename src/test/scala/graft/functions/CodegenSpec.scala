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
    NormalizeUnicode.normalize_unicode(col("text"), "NFC").as("nfc"))

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
