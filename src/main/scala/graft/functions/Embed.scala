package graft.functions

import scala.util.hashing.MurmurHash3

/** Deterministic text embeddings.
  *
  * The reference embeds entity names / facts with a hosted model
  * (text-embedding-3-large, 3072-d — /root/reference/src/pipeline.py:160-167).
  * The sandbox has no network, so the rebuild uses a deterministic
  * hashed-character-n-gram feature vector: same input → same vector on every
  * JVM and at every parallelism level. Cosine over these vectors plays the
  * same role (similarity edges for dedup J1, link scoring J4, retrieval
  * scoring) with fully reproducible results.
  */
object Embed {

  val Dim = 64

  /** The SEMANTIC entity vector: embeds `"{name}: {summary}"` (reference
    * pipeline.py:952-965; name alone when the summary is absent). The ONE
    * definition of the format — the batch dedup path, the incremental link
    * fold, and the parity specs all call this, so the vector cannot drift
    * between the paths that must agree on it.
    */
  def semantic(name: String, summary: String): Array[Double] =
    embed(if (summary == null || summary.isEmpty) name else s"$name: $summary")

  /** Signed hashed char-trigram embedding, L2-normalized. */
  def embed(text: String, dim: Int = Dim): Array[Double] = {
    val v = new Array[Double](dim)
    if (text == null) return v
    if (text.isEmpty) return v
    // \u0001 boundary pads give begin/end trigrams weight (alias similarity)
    val s = "\u0001\u0001" + text.toLowerCase(java.util.Locale.ROOT) + "\u0001\u0001"
    var i = 0
    while (i + 3 <= s.length) {
      val g = s.substring(i, i + 3)
      val h = MurmurHash3.stringHash(g, 0x9747b28c)
      val bucket = math.floorMod(h, dim)
      val sign = if (((h >>> 31) & 1) == 0) 1.0 else -1.0
      v(bucket) += sign
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j) * v(j); j += 1 }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }

  /** Cosine between two embeddings (zero-norm guard → 0.0), matching the
    * reference's numpy cosine (entity_dedup.py:215-224).
    */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
