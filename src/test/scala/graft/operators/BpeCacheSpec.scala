package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the executor-side BPE encoder memo state: the
  * thread-local identity fast path, content-fingerprint dedupe across
  * distinct deserialized copies, per-model cache isolation, and
  * model-level LRU eviction (no clear-all thrash).
  */
class BpeCacheSpec extends AnyFunSuite {

  private def model(pairs: (String, String)*): Array[(String, String)] = pairs.toArray

  test("same array reference resolves to the same entry without rehashing") {
    val m = model("a" -> "b", "ab" -> "c")
    val e1 = BpeEncoderCache.entryFor(m)
    val e2 = BpeEncoderCache.entryFor(m)
    assert(e1 eq e2, "identity memo must return the cached entry")
  }

  test("distinct copies with identical content share one entry (fingerprint dedupe)") {
    val m1 = model("x" -> "y", "xy" -> "z")
    val m2 = model("x" -> "y", "xy" -> "z") // different array instance
    assert(!(m1 eq m2))
    val e1 = BpeEncoderCache.entryFor(m1)
    val e2 = BpeEncoderCache.entryFor(m2)
    assert(e1 eq e2, "content fingerprint must dedupe deserialized copies")
  }

  test("fingerprint separates boundary-shifted merge tables") {
    val a = BpeEncoderCache.fingerprint(model("ab" -> "c"))
    val b = BpeEncoderCache.fingerprint(model("a" -> "bc"))
    assert(a != b, "separator mix must distinguish (ab,c) from (a,bc)")
  }

  test("concurrent models encode with their own ranks — no cross-model starvation") {
    // model A merges (h,e); model B merges (l,o) — same word encodes
    // differently under each, and repeated alternation must stay correct
    val mA = model("h" -> "e")
    val mB = model("l" -> "o")
    (1 to 3).foreach { _ =>
      val encA = BpeEncoderCache.entryFor(mA).encode("hello").toSeq
      val encB = BpeEncoderCache.entryFor(mB).encode("hello").toSeq
      assert(encA == Seq("he", "l", "l", "o", Bpe.EndOfWord), encA.toString)
      assert(encB == Seq("h", "e", "l", "lo", Bpe.EndOfWord), encB.toString)
    }
  }

  test("model-level LRU evicts one at a time; evicted models resolve fresh and correct") {
    val keep = model("k" -> "p")
    val keepEntry = BpeEncoderCache.entryFor(keep)
    // flood with > MaxModels distinct models, touching `keep` between
    // insertions so access-order LRU retains it
    (0 until 12).foreach { i =>
      BpeEncoderCache.entryFor(model(s"t$i" -> s"u$i"))
      assert(BpeEncoderCache.entryFor(keep) eq keepEntry,
        s"recently-touched model must survive insertion $i")
    }
    // an early flooded model was evicted — re-request builds a fresh,
    // still-correct entry rather than thrashing everything
    val again = BpeEncoderCache.entryFor(model("t0" -> "u0"))
    assert(again.encode("t0u0").toSeq == Seq("t", "0", "u", "0", Bpe.EndOfWord),
      "re-resolved model must encode correctly")
  }
}
