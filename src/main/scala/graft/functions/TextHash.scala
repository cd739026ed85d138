package graft.functions

/** Deterministic, JVM-stable text hashing kernels for the dedup family
  * (SimHash, MinHash, shingle fingerprints). MinHash/fingerprints build
  * on FNV-1a 64 (fast, JVM-stable); SimHash builds on a sha-256-derived
  * token hash so the whole sketch is replicable in ANY engine with a
  * sha256 function — which is what lets the d4 gate hash-check it
  * end-to-end against DuckDB. Never use `String.hashCode` (32-bit,
  * weak) or anything seeded by runtime state.
  */
object TextHash {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** Seeded variant (used to derive the MinHash permutation family). */
  def fnv1a64(s: String, seed: Long): Long = {
    var h = FnvOffset ^ seed
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** Finalizer (splitmix64) to decorrelate the seeded FNV streams. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Whitespace tokenization shared by every text operator — one
    * definition so token counts, shingles and hashes stay in lockstep.
    *
    * The delimiter class is the EXPLICIT `[ \t\n\f\r]` rather than
    * `\s`: Java's `\s` includes vertical tab (U+000B) but RE2's — the
    * engine behind the DuckDB/Trino-style oracles — does not, so a
    * document containing `\x0B` would tokenize differently in the two
    * engines and silently flip every downstream hash gate. One
    * explicit class means the JVM kernel, Spark's `regexp_*`
    * built-ins and the SQL oracles all agree byte for byte.
    */
  def tokens(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else graft.util.Words.iterator(text).toArray

  /** Word-level n-gram shingles (the dedup unit for MinHash / Jaccard). */
  def shingles(text: String, n: Int): Array[String] = {
    val t = tokens(text)
    if (t.length < n) { if (t.isEmpty) Array.empty else Array(t.mkString(" ")) }
    else t.sliding(n).map(_.mkString(" ")).toArray
  }

  /** First 60 bits of sha-256 (big-endian) as a non-negative Long — the
    * SimHash token hash. sha-256 (not FNV/murmur) because every engine
    * the oracle might run in (DuckDB, Trino, Spark SQL) exposes it, so
    * the full SimHash pipeline is SQL-replicable; 60 bits (15 hex
    * chars) because every intermediate — hash, shifts, the packed
    * sketch itself — then stays positive in a SIGNED 64-bit integer on
    * both engines, sidestepping the unsigned-hex edge cases entirely.
    */
  // One digest per thread: getInstance does a Security-provider lookup
  // + allocation, and sha60 sits in the innermost loop of the simhash
  // UDF (once per distinct token per document). digest() resets the
  // instance after each use, so reuse is safe.
  private val sha256Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("SHA-256"))

  def sha60(token: String): Long = {
    val d = sha256Local.get()
      .digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** 60-bit SimHash over whitespace tokens: sign-aggregate each token-
    * hash bit weighted by term frequency. Near-duplicate docs differ in
    * few bits. Empty/blank text → 0L.
    */
  def simhash60(text: String): Long = {
    val counts = new java.util.HashMap[String, Int]()
    tokens(text).foreach(t => counts.merge(t, 1, Integer.sum _))
    if (counts.isEmpty) return 0L
    val acc = new Array[Int](60)
    counts.forEach { (tok, w) =>
      val h = sha60(tok)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature of `k` hashes over `n`-gram shingles. Empty text →
    * all Long.MaxValue (never matches a non-empty signature band).
    */
  def minhash(text: String, k: Int, shingleN: Int): Array[Long] = {
    val sh = shingles(text, shingleN)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val base = fnv1a64(sh(i))
      var j = 0
      while (j < k) {
        val h = mix64(base ^ (j.toLong * 0x9e3779b97f4a7c15L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys for a MinHash signature: `bands` hashes, each over
    * `k/bands` adjacent signature slots. Docs sharing ANY band key are
    * candidate near-duplicates (bucket-join, never a cartesian).
    */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = FnvOffset ^ b.toLong
      var r = 0
      while (r < rows) { h ^= sig(b * rows + r); h *= FnvPrime; r += 1 }
      mix64(h)
    }
  }

  /** Sorted distinct FNV-1a hashes of the word n-gram shingles — the
    * reusable per-document representation: MinHash signatures derive
    * from it ([[minhashFromHashes]]) and the exact-jaccard verify
    * intersects two of them ([[jaccardSorted]]) with NO per-pair
    * re-tokenization. At scale this turns the LSH verify step from
    * O(pairs × doc_len) string work into O(pairs × |shingles|) long
    * comparisons.
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val sh = shingles(text, n)
    // Empty text → the singleton {hash("")}: an empty SET would make
    // blank documents invisible to every inverted/banded index (they
    // would never pair with each other), while jaccard says two blank
    // docs are identical (j = 1). The sentinel mirrors the SQL oracles'
    // [''] representation, so engine and oracle agree on blank corpora.
    if (sh.isEmpty) Array(fnv1a64(""))
    else {
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < sh.length) { set.add(fnv1a64(sh(i))); i += 1 }
      val out = new Array[Long](set.size)
      var j = 0
      val it = set.iterator()
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }

  /** ORDERED, NON-distinct FNV-1a hashes of the sliding word n-gram
    * windows — the span-dedup unit ([[graft.ops.Dedup.duplicatedSpanStats]]).
    * Unlike [[shingleHashes]] this keeps multiplicity and document
    * order: span-level dedup counts every OCCURRENCE of a window
    * across the corpus (a document repeating its own span contributes
    * each repeat), so collapsing to a distinct set would undercount
    * exactly the self-repetition the signal exists to expose. A
    * document shorter than `n` words yields its whole text as the one
    * window (the [[shingles]] rule); no tokens yields no windows.
    */
  def windowHashes(text: String, n: Int): Array[Long] = {
    val sh = shingles(text, n)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = fnv1a64(sh(i)); i += 1 }
    out
  }

  /** MinHash signature from precomputed shingle hashes. Identical output
    * to [[minhash]] for non-empty text (the min over duplicate shingles
    * equals the min over distinct ones) but shares the tokenize+hash
    * work with the verify step. For EMPTY text the inputs differ by
    * design: [[shingleHashes]]' sentinel gives blank documents a real
    * shared signature (so they pair with each other, matching jaccard
    * = 1), where [[minhash]] returns the all-MaxValue signature.
    */
  def minhashFromHashes(hashes: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val base = hashes(i)
      var j = 0
      while (j < k) {
        val h = mix64(base ^ (j.toLong * 0x9e3779b97f4a7c15L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** One-permutation MinHash signature (Li, Owen & Zhang, NIPS 2012)
    * with rotation densification (Shrivastava & Li, ICML 2014): ONE
    * mix per shingle hash instead of k, so the signature pass drops
    * from O(|shingles|·k) to O(|shingles| + k) — at k = 64 that is the
    * difference between 64 hash evaluations per shingle and 1, the
    * whole point at 100 TB where signatures dominate dedup cost.
    *
    * Bin = unsigned `mix64(hash)` mod k; each bin keeps its minimum;
    * an empty bin borrows from the nearest non-empty bin to its RIGHT
    * (circular), offset by `hops · golden` so two documents that are
    * both empty at a bin but borrow across different distances cannot
    * collide accidentally (the ICML 2014 fix for the empty-bin bias).
    * Identical hash sets yield identical signatures, and
    * P(sig_a[i] = sig_b[i]) ≈ jaccard, so [[bandKeys]] and the whole
    * banded-LSH machinery apply unchanged. All-empty input (impossible
    * with [[shingleHashes]]' sentinel) → all Long.MaxValue, matching
    * [[minhash]] on empty text.
    */
  def minhashOphFromHashes(hashes: Array[Long], k: Int): Array[Long] = {
    val golden = 0x9e3779b97f4a7c15L
    val sig = Array.fill(k)(Long.MaxValue)
    val filled = new Array[Boolean](k)
    var i = 0
    while (i < hashes.length) {
      val h = mix64(hashes(i))
      val bin = java.lang.Long.remainderUnsigned(h, k.toLong).toInt
      if (!filled(bin) || h < sig(bin)) { sig(bin) = h; filled(bin) = true }
      i += 1
    }
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      if (filled(j)) out(j) = sig(j)
      else {
        var t = 1
        while (t < k && !filled((j + t) % k)) t += 1
        out(j) =
          if (t >= k) Long.MaxValue
          else sig((j + t) % k) + t.toLong * golden // wraps; deterministic
      }
      j += 1
    }
    out
  }

  /** Jaccard from two sorted distinct-hash arrays (merge intersection,
    * O(|a|+|b|), no set allocation). Both-empty → 1.0, matching
    * [[jaccard]] on empty texts (with [[shingleHashes]]' sentinel the
    * empty case resolves to {hash("")} ∩ {hash("")} = 1 anyway).
    */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Exact word-shingle Jaccard similarity (the verify step after LSH
    * candidate generation).
    */
  def jaccard(a: String, b: String, shingleN: Int): Double = {
    val sa = shingles(a, shingleN).toSet
    val sb = shingles(b, shingleN).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      val union = sa.size + sb.size - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
  }

  /** Rolling (Rabin-Karp-style polynomial) fingerprint of the normalized
    * document: lowercase, whitespace collapsed. Equal fingerprints ⇒
    * same normalized content (modulo 64-bit collisions).
    *
    * Normalization mirrors the d2 oracle's
    * `lower(trim(regexp_replace(text,'\s+',' ','g')))` step for step
    * under the explicit `[ \t\n\f\r]` whitespace contract (see
    * [[tokens]]): collapse first, then strip the single edge spaces the
    * collapse leaves (SQL `trim` strips only spaces — Java's `trim`
    * would also eat `\x0B` and diverge), then lowercase with a fixed
    * locale.
    */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    val norm = text.replaceAll("[ \t\n\f\r]+", " ")
      .stripPrefix(" ").stripSuffix(" ")
      .toLowerCase(java.util.Locale.ROOT)
    var h = 0L
    var i = 0
    while (i < norm.length) { h = h * 1315423911L + norm.charAt(i); i += 1 }
    h
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
