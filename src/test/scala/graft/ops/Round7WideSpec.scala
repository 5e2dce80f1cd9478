package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Targeted property specs for the round-7 widening (q204–q219) — the
  * invariants an oracle hash can't name:
  *  - HRW's minimal-disruption property (the REASON to use rendezvous
  *    hashing — removing a shard must move only that shard's docs);
  *  - µs-fidelity of streaming sessionization boundaries (the
  *    Timestamp.getTime millis trap);
  *  - RRF rank dominance; nDCG perfect-ranking = 1; tau-b on a known
  *    permutation; JS symmetry/identity; modularity on planted
  *    communities; memorization coverage on a planted duplicate;
  *    manifest order-invariance + single-bucket flip.
  */
class Round7WideSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q205 HRW: removing one shard only moves that shard's docs") {
    // assignment over S shards vs S-1 shards (drop shard 7): every doc
    // NOT on shard 7 keeps its assignment — the 1/S-disruption property
    def weights(n: Int) = array((0 until n).map { i =>
      struct(
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":" + i))), 1, 15), 16, 10).cast("long").as("w"),
        lit(i).as("shard"))
    }: _*)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"))
    val a8 = docs.select(col("doc_id"),
      array_max(weights(8)).getField("shard").as("s8"))
    val a7 = docs.select(col("doc_id"),
      array_max(weights(7)).getField("shard").as("s7"))
    val joined = a8.join(a7, "doc_id")
    val moved = joined.filter(col("s8") =!= col("s7"))
    assert(moved.filter(col("s8") =!= 7).count() == 0,
      "a doc not on the removed shard changed assignment")
    assert(joined.filter(col("s8") === 7).count() > 0, "gate binds")
  }

  test("streaming sessionize state carries exact microseconds") {
    // boundary events 1 µs apart inside a session must survive into the
    // emitted session bounds (Timestamp.getTime would truncate to ms)
    import graft.streaming.EventStreams
    import spark.implicits._
    def ts(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000000L * 1000L)
      t.setNanos((us % 1000000L * 1000L).toInt)
      t
    }
    val base = 1700000000000000L // epoch µs
    val evs = Seq(
      EventStreams.Event(1L, ts(base + 1L), 1L, "a", 0.0),
      EventStreams.Event(2L, ts(base + 123457L), 1L, "a", 0.0),
      // > 30 min gap, new session; sentinel user flushes via watermark
      EventStreams.Event(3L, ts(base + 3600L * 1000000L + 7L), 1L, "a", 0.0),
      EventStreams.Event(9L, ts(base + 40L * 86400L * 1000000L), -1L, "z", 0.0))
    val src = java.nio.file.Files.createTempDirectory("graft_sessus")
    evs.toDS().coalesce(1).write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream
      .schema(evs.toDS().schema).parquet(src.toString)
      .as[EventStreams.Event]
    val out = EventStreams.sessionize(stream)(spark)
    val q = out.toDF().writeStream.outputMode("append").format("memory")
      .queryName("graft_sessus_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("graft_sessus_sink")
      .filter(col("user_id") === 1L)
      .select(unix_micros(col("session_start")).as("su"),
        unix_micros(col("session_end")).as("eu"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.contains((base + 1L, base + 123457L)),
      s"µs bounds lost: $rows")
  }

  test("q204 RRF: a doc ranked high in both lists outranks single-list docs") {
    val out = graft.Queries.all("q204_rrf_fusion")(spark, sfDir).collect()
    val both = out.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = out.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    assert(both.nonEmpty && single.nonEmpty, "gate binds on both shapes")
    // rrf of (r_a, r_b) both <= 50 strictly beats any single-list rrf
    // when ranks are comparable: check the top row is a both-lists doc
    assert(!out.head.isNullAt(1) || !out.head.isNullAt(2))
    val bestSingle = single.map(_.getDouble(3)).max
    val bestBoth = both.map(_.getDouble(3)).max
    assert(bestBoth > bestSingle)
  }

  test("q211 nDCG: a perfectly relevant top-20 gives ndcg = 1") {
    // planted: rank by rel itself -> dcg == idcg
    import spark.implicits._
    val n = 40
    val rel = (1 to n).map(i => (i.toLong, if (i <= 20) 1 else 0))
    val df = rel.toDF("rk", "rel")
    val disc = lit(1.0) / (log(col("rk") + 1) / log(lit(2.0)))
    val r = df.filter(col("rk") <= 20)
      .agg(sum(round(col("rel") * disc, 8).cast("decimal(18,8)")).as("d"),
        sum(round(disc, 8).cast("decimal(18,8)")).as("i")).head()
    assert(r.getDecimal(0) == r.getDecimal(1))
  }

  test("q206 tau-b: hand-checked on a known permutation") {
    // x ranks 1..4, y = (1,2,4,3): one discordant pair of 6 -> tau = 2/3
    import spark.implicits._
    val per = Seq(("a", 10L, 1L), ("b", 20L, 2L), ("c", 30L, 4L),
      ("d", 40L, 3L)).toDF("source", "sc", "mx")
    def sign(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      when(a > b, 1).when(a < b, -1).otherwise(0)
    val p = per.as("a").join(per.as("b"), col("a.source") < col("b.source"))
      .select(sign(col("a.sc"), col("b.sc")).as("sx"),
        sign(col("a.mx"), col("b.mx")).as("sy"))
    val r = p.agg(
      sum(when(col("sx") * col("sy") > 0, 1L).otherwise(0L)).as("c"),
      sum(when(col("sx") * col("sy") < 0, 1L).otherwise(0L)).as("d")).head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 1)
  }

  test("q219 JS: zero against itself, symmetric, bounded by ln 2") {
    val out = graft.Queries.all("q219_js_divergence_matrix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.nonEmpty)
    // emitted ordered a < b: no self-pairs; all values in [0, ln 2]
    assert(out.forall { case (a, b, v) => a < b && v >= 0.0 && v <= 0.6932 })
  }

  test("q212 modularity: planted two-clique community structure is high") {
    // two 4-cliques, classes = cliques: per class e=6, d=12, m=12 →
    // term = 6/12 − (12/24)² = 1/4 each → Q = 1/2
    import spark.implicits._
    val edges = (for {
      base <- Seq(0, 10); i <- 0 until 4; j <- (i + 1) until 4
    } yield (base + i, base + j)).toDF("src", "dst")
    val cls = (0 until 4).map(i => (i, "A")) ++ (10 until 14).map(i => (i, "B"))
    val cdf = cls.toDF("pk", "cl")
    val m = edges.count().toDouble
    val withCls = edges
      .join(cdf.select(col("pk").as("src"), col("cl").as("ca")), "src")
      .join(cdf.select(col("pk").as("dst"), col("cl").as("cb")), "dst")
    val eIn = withCls.filter(col("ca") === col("cb"))
      .groupBy(col("ca")).agg(count(lit(1)).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q = Seq("A", "B").map { c =>
      val e = eIn(c).toDouble; val d = 2.0 * e // within-clique degrees only
      e / m - math.pow(d / (2 * m), 2)
    }.sum
    assert(math.abs(q - 0.5) < 1e-9)
  }

  test("q218 coverage: planted cross-doc duplicate covers its span") {
    import spark.implicits._
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 chars
    val docs = Seq(
      (1L, s"UNIQUEPREFIXONE $shared", "s1"),
      (2L, s"$shared TOTALLYDIFFERENTTAIL", "s2"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.createOrReplaceTempView("t_cov")
    // inline re-run of the operator body over the planted frame
    val K = 13
    val pos = docs.select(col("doc_id"), col("source"),
        explode(sequence(lit(1),
          (length(col("text")) - (K - 1)).cast("int"))).as("i"), col("text"))
      .select(col("doc_id"), col("i"),
        conv(substring(md5(col("text").substr(col("i"), lit(K))
          .cast("binary")), 1, 15), 16, 10).cast("long").as("h"))
    val freq = pos.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df")).filter(col("df") >= 2)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val covered = pos.join(freq.select(col("h")), Seq("h"), "left_semi")
      .withColumn("prev", lag(col("i"), 1).over(w))
      .select(col("doc_id"),
        when(col("prev").isNull, lit(K.toLong))
          .otherwise(least(lit(K.toLong), (col("i") - col("prev")).cast("long")))
          .as("add"))
      .groupBy(col("doc_id")).agg(sum(col("add")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each doc's covered span is exactly the 36-char shared block
    assert(covered(1L) == 36L && covered(2L) == 36L, covered.toString)
  }

  test("q215 manifest: order-invariant; one-doc change flips one bucket") {
    import spark.implicits._
    def manifest(df: org.apache.spark.sql.DataFrame) = {
      val assigned = df.select(lit(0).as("shard"),
        md5(col("text").cast("binary")).as("fp"))
      assigned.withColumn("bucket", substring(col("fp"), 1, 1))
        .groupBy(col("shard"), col("bucket"))
        .agg(md5(array_join(sort_array(collect_list(col("fp"))), "")
          .cast("binary")).as("digest"))
        .collect().map(r => (r.getString(1), r.getString(2))).toMap
    }
    val a = Seq("one", "two", "three", "four").toDF("text")
    val b = Seq("four", "three", "two", "one").toDF("text") // reordered
    val c = Seq("one", "two", "three", "CHANGED").toDF("text")
    val ma = manifest(a); val mb = manifest(b); val mc = manifest(c)
    assert(ma == mb, "manifest must be row-order-invariant")
    val changedBuckets = (ma.keySet ++ mc.keySet)
      .count(k => ma.get(k) != mc.get(k))
    assert(changedBuckets <= 2, // bucket of removed fp + bucket of added fp
      s"a one-doc change flipped $changedBuckets buckets")
    assert(ma != mc)
  }
}
