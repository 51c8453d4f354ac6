package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Multimodal.dHash]] perceptual-hash properties and the image
  * near-dup pipeline (dHash → simHashPairs pigeonhole Hamming).
  */
class ImageDedupSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def blob(seed: Int, len: Int = 720): Array[Byte] =
    Array.tabulate(len)(i => (((i * 131 + seed * 977) % 251) & 0xff).toByte)

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("dHash: deterministic, local under small perturbation, far for unrelated blobs") {
    val base = blob(1)
    assert(Multimodal.dHash(base) === Multimodal.dHash(base.clone()))
    // flip 3 adjacent bytes mid-blob: only the covering cells move
    val pert = base.clone(); (360 until 363).foreach(i => pert(i) = 0)
    assert(hamming(Multimodal.dHash(base), Multimodal.dHash(pert)) <= 4,
      "small byte perturbation must stay within the Hamming radius")
    // a genuinely different blob lands far away
    assert(hamming(Multimodal.dHash(base), Multimodal.dHash(blob(99))) > 8)
  }

  test("dHash: empty blobs error like null (no all-zero-hash pair flood)") {
    // an empty blob hashing to (0,0) would pair with every other empty
    // at Hamming 0 — empty must take the same error path as null
    intercept[IllegalArgumentException] { Multimodal.dHash(Array.emptyByteArray) }
    intercept[IllegalArgumentException] { Multimodal.dHash(null) }
  }

  test("audioFingerprint: deterministic, local under perturbation, far for unrelated") {
    def fp(b: Array[Byte]) = Multimodal.audioFingerprint(b)
    val base = blob(7)
    assert(fp(base) === fp(base.clone()))
    val pert = base.clone(); (100 until 103).foreach(i => pert(i) = 1)
    assert(hamming(fp(base), fp(pert)) <= 4,
      "3-byte perturbation must move only its own frames")
    assert(hamming(fp(base), fp(blob(77))) > 8)
    intercept[IllegalArgumentException] { fp(Array.emptyByteArray) }
    intercept[IllegalArgumentException] { Multimodal.audioFingerprint(null) }
  }

  test("perceptualHash isolates per-row failures; pipeline finds constructed near-dups") {
    val rows = Seq(
      (1L, blob(1)), (2L, { val p = blob(1).clone(); p(100) = 0; p }), // near-dup pair
      (3L, blob(50)),                                                  // unrelated
      (4L, null.asInstanceOf[Array[Byte]])                             // decoder failure
    ).toDF("doc_id", "blob")
    val ph = Multimodal.perceptualHash(rows, "blob", Seq("doc_id"))
    assert(ph.filter(!col("ok")).select("doc_id").as[Long].collect().toSeq === Seq(4L))
    val fp = ph.filter(col("ok")).select(col("doc_id"),
      shiftleft(col("ph_hi"), 32).bitwiseOR(col("ph_lo")).as("fp"))
    val pairs = Dedup.simHashPairs(fp, col("doc_id"), col("fp"), 64, 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"constructed near-dup not found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false positive: $pairs")
  }
}
