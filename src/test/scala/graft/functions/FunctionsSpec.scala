package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextHashSpec extends AnyFunSuite {
  test("fnv1a64 known vectors stay stable across rounds") {
    // FNV-1a 64 reference values (public test vectors)
    assert(TextHash.fnv1a64("") == 0xcbf29ce484222325L)
    assert(TextHash.fnv1a64("a") == 0xaf63dc4c8601ec8cL)
  }

  test("tokens / shingles edge cases") {
    assert(TextHash.tokens(null).isEmpty)
    assert(TextHash.tokens("  ").isEmpty)
    assert(TextHash.tokens(" a  b ").toSeq == Seq("a", "b"))
    assert(TextHash.tokens("a\tb\nc\fd\re").toSeq == Seq("a", "b", "c", "d", "e"))
    // Vertical tab is NOT a delimiter: RE2 (the oracle engines) keeps
    // \x0B inside \S, so the JVM tokenizer must too — Java's \s would
    // split here and silently diverge every downstream hash gate.
    assert(TextHash.tokens("a\u000Bb").toSeq == Seq("a\u000Bb"))
    assert(TextHash.shingles("a b c d", 3).toSeq == Seq("a b c", "b c d"))
    assert(TextHash.shingles("a b", 3).toSeq == Seq("a b")) // short text → one shingle
    assert(TextHash.shingles("", 3).isEmpty)
  }

  test("sha60 matches the first 60 sha-256 bits (independent python oracle)") {
    // python3: int.from_bytes(hashlib.sha256(t.encode()).digest()[:8],'big') >> 4
    assert(TextHash.sha60("a") == 0xca978112ca1bbdcL)
    assert(TextHash.sha60("the") == 0xb9776d7ddf459c9L)
    assert(TextHash.sha60("fox") == 0x776cb326ab0cd5fL)
    assert(TextHash.sha60("") >= 0L) // 60 bits → always non-negative
  }

  test("simhash: identical text identical hash; permuted words identical too") {
    val a = TextHash.simhash60("the quick brown fox")
    assert(a == TextHash.simhash60("the quick brown fox"))
    // bag-of-words property: order-insensitive by construction
    assert(a == TextHash.simhash60("fox brown quick the"))
    assert(a >= 0L && a < (1L << 60)) // packed sketch stays in 60 bits
    assert(TextHash.simhash60("   ") == 0L)
    val far = TextHash.simhash60("completely different words entirely")
    assert(TextHash.hammingDistance(a, far) > 10)
  }

  test("minhash: containment raises signature agreement") {
    val sig1 = TextHash.minhash("a b c d e f g h i j", 64, 2)
    val sig2 = TextHash.minhash("a b c d e f g h i j", 64, 2)
    assert(sig1.toSeq == sig2.toSeq)
    val sig3 = TextHash.minhash("a b c d e f g h i x", 64, 2)
    val agree = sig1.zip(sig3).count { case (x, y) => x == y }
    assert(agree > 32) // high overlap → most slots agree
    assert(TextHash.minhash("", 16, 3).forall(_ == Long.MaxValue))
  }

  test("band keys: equal signatures → equal bands; emptiness is inert") {
    val s1 = TextHash.minhash("x y z w", 64, 2)
    assert(TextHash.bandKeys(s1, 16).toSeq == TextHash.bandKeys(s1, 16).toSeq)
    assert(TextHash.bandKeys(s1, 16).length == 16)
  }

  test("jaccard exact values") {
    assert(TextHash.jaccard("a b c", "a b c", 1) == 1.0)
    assert(TextHash.jaccard("a b", "c d", 1) == 0.0)
    assert(TextHash.jaccard("a b c d", "a b c e", 1) == 3.0 / 5.0)
    assert(TextHash.jaccard("", "", 3) == 1.0)
  }

  test("fingerprint normalizes case and whitespace") {
    assert(TextHash.fingerprint("Hello  World") == TextHash.fingerprint("hello world"))
    assert(TextHash.fingerprint(" hello world ") == TextHash.fingerprint("hello world"))
    assert(TextHash.fingerprint("hello world") != TextHash.fingerprint("hello worlds"))
    // \x0B is CONTENT, not whitespace (RE2 parity with the d2 oracle's
    // regexp_replace(text,'\s+',' ') + trim — neither touches it).
    assert(TextHash.fingerprint("a\u000Bb") != TextHash.fingerprint("a b"))
    assert(TextHash.fingerprint(" \ta\u000Bb\n") == TextHash.fingerprint("a\u000Bb"))
  }

  test("label bucket kernel matches the reference python semantics") {
    import org.apache.spark.unsafe.types.UTF8String
    def b(s: String) = LabelHashBucketUtil.bucket(UTF8String.fromString(s), 64)
    // int.from_bytes(sha256(x)[:8],'big') % 64 — computed independently
    assert(b("de") == 24 && b("en") == 14 && b("es") == 45)
    assert(b("fr") == 24 && b("zh") == 12)
    assert(LabelHashBucketUtil.bucket(null, 64) == -1)
    assert(b("  ") == -1)
    assert(b("nan") == -1 && b("NaN") == -1)
  }
}

/** Pins the ADVICE contract on the shared cosine kernel: the
  * `Array[Float]` overloads (Similarity's partition-local heap path)
  * and the `ArrayData` kernels (the codegen'd SQL expression) must
  * stay BIT-identical, or heap-ranked candidates and window-ranked
  * oracle results silently disagree on ties.
  */
class VectorOpsParitySpec extends AnyFunSuite {
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  test("float-array cosine/dot/norm are bit-identical to the ArrayData path") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 300) {
      val n = 1 + rnd.nextInt(96)
      val a = Array.fill(n)((rnd.nextGaussian() * 3).toFloat)
      val b = if (trial % 5 == 0) a.clone() // exact-duplicate vectors too
              else Array.fill(n)(rnd.nextGaussian().toFloat)
      val ad = UnsafeArrayData.fromPrimitiveArray(a)
      val bd = UnsafeArrayData.fromPrimitiveArray(b)
      def bits(x: Double) = java.lang.Double.doubleToRawLongBits(x)
      assert(bits(VectorOpsUtil.cosine(a, b)) == bits(VectorOpsUtil.cosine(ad, bd)))
      assert(bits(VectorOpsUtil.dot(a, b)) == bits(VectorOpsUtil.dot(ad, bd)))
      assert(bits(VectorOpsUtil.norm(a)) == bits(VectorOpsUtil.norm(ad)))
    }
  }

  test("zero-norm and dimension-drift contracts agree across representations") {
    val z = Array.fill(8)(0f)
    val v = Array.fill(8)(1f)
    assert(VectorOpsUtil.cosine(z, v) == 0.0)
    assert(VectorOpsUtil.cosine(
      UnsafeArrayData.fromPrimitiveArray(z),
      UnsafeArrayData.fromPrimitiveArray(v)) == 0.0)
    intercept[IllegalArgumentException](
      VectorOpsUtil.cosine(Array(1f), Array(1f, 2f)))
    intercept[IllegalArgumentException](
      VectorOpsUtil.cosine(
        UnsafeArrayData.fromPrimitiveArray(Array(1f)),
        UnsafeArrayData.fromPrimitiveArray(Array(1f, 2f))))
  }
}
