package graft

import graft.ops.Dedup

/** Pins the [[Dedup.exactSubstrScrub]] `keyBits` contract (r19 verdict
  * item 5): the published output is key-representation-independent —
  * the 64-bit gram-hash key (the declared x100 spelling) and the
  * 128-bit two-seeded-struct escape hatch must produce IDENTICAL
  * scrub output on the fixture, because equal token windows get equal
  * keys under either width and the fixture's gram population is far
  * below either width's birthday bound. A divergence here would mean
  * either a real 64-bit collision on fixture-scale data (implausible,
  * ~g²/2⁶⁵) or a key-plumbing bug in the 128-bit path.
  */
class KeyWidthSpec extends SparkSpec {

  test("exactSubstrScrub: 64-bit and 128-bit keys publish identical " +
      "output on the sf0.001 documents fixture") {
    val docs = Tables.load(spark, sf0001, "documents")
    val k64 = Dedup.exactSubstrScrub(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id")
    val k128 = Dedup.exactSubstrScrub(docs, "doc_id", "text", k = 8,
      keyBits = 128).orderBy("doc_id")
    assert(k64.schema == k128.schema)
    val a = k64.collect()
    val b = k128.collect()
    assert(a.length == b.length && a.length > 0)
    assert(a.sameElements(b))
    // the scrub actually removed something — identical-but-empty
    // output would vacuously pass
    assert(a.exists(_.getAs[Long]("n_removed") > 0L))
  }

  test("keyBits validates") {
    val docs = Tables.load(spark, sf0001, "documents")
    intercept[IllegalArgumentException] {
      Dedup.exactSubstrScrub(docs, "doc_id", "text", k = 8, keyBits = 96)
    }
  }
}
