package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextHash

/** One-permutation MinHash ([[TextHash.minhashOphFromHashes]]) — kernel
  * properties plus end-to-end agreement of the verified pair set with
  * the k-wise kernel (the exact verify makes the output
  * kernel-independent; this spec pins that).
  */
class OphMinhashSpec extends SparkSpec {
  import spark.implicits._

  private def hashesOf(text: String) = TextHash.shingleHashes(text, 3)

  test("identical sets yield identical signatures; deterministic; length k") {
    val h = hashesOf("the quick brown fox jumps over the lazy dog again and again")
    val a = TextHash.minhashOphFromHashes(h, 64)
    val b = TextHash.minhashOphFromHashes(h.clone(), 64)
    assert(a.length == 64)
    assert(a.toSeq == b.toSeq)
  }

  test("densification fills every slot; singleton set gets k distinct values") {
    val one = TextHash.minhashOphFromHashes(Array(TextHash.fnv1a64("x")), 64)
    assert(!one.contains(Long.MaxValue))
    // every empty bin borrows at a different distance, so the rotation
    // offset must make all k values distinct (the anti-collision rule)
    assert(one.toSet.size == 64)
    // all-empty input keeps the empty-text sentinel shape
    assert(TextHash.minhashOphFromHashes(Array.empty[Long], 8)
      .forall(_ == Long.MaxValue))
  }

  test("slot agreement tracks jaccard: clones all, disjoint almost none") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve"
    val clone = TextHash.minhashOphFromHashes(hashesOf(base), 64)
    val same = TextHash.minhashOphFromHashes(hashesOf(base), 64)
    assert(clone.toSeq == same.toSeq)
    val other = "completely different words in this document nothing shared " +
      "with the other text at all every token unique here truly disjoint " +
      "red orange yellow green blue indigo violet crimson amber teal navy"
    val dis = TextHash.minhashOphFromHashes(hashesOf(other), 64)
    val agree = clone.zip(dis).count { case (x, y) => x == y }
    assert(agree <= 6, s"disjoint docs agree on $agree/64 slots")
  }

  test("verified near-dup pairs agree between OPH and k-wise kernels") {
    val docs = (1L to 30L).map { i =>
      val body =
        if (i <= 10) // ten mutual near-clones of one base text
          s"the shared base document with many stable words throughout " +
            s"and a tiny per copy marker m$i at the end of the text body " +
            s"that keeps the jaccard high across all copies of the set"
        else // unique fillers
          s"unique filler number $i with its own vocabulary v$i w$i x$i " +
            s"y$i z$i nothing else shared between these filler documents"
      (i, body)
    }.toDF("doc_id", "text")
    def pairs(oph: Boolean) =
      Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.7,
          numHashes = 64, bands = 32, shingle = 3, oph = oph)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val kwise = pairs(oph = false)
    val o = pairs(oph = true)
    assert(kwise.nonEmpty, "fixture produced no near-dup pairs")
    assert(o == kwise, s"OPH pairs ${o.size} != k-wise pairs ${kwise.size}")
  }
}
