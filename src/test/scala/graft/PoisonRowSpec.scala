package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusPipeline, Dedup}

/** Poison-row robustness: at crawl scale some rows WILL carry null
  * text/html/url (failed fetches, truncated records, bad upstream
  * joins). One such row must never kill a 100 TB job — every batch
  * face either drops the row or passes it through with neutral
  * outputs, and the real rows' results are unaffected. (The streaming
  * twin of this contract — null event times — is pinned in
  * StreamingSpec; the as-of batch operators pin null timestamps in
  * AsofJoinSpec.)
  */
class PoisonRowSpec extends SparkTestBase {
  import spark.implicits._

  private val prose = "the data and model pipeline have that sort of careful work " +
    "to be done with many diverse sources and long running jobs "
  private def distinctProse(i: Int) = (prose * 3).trim.split(" ").zipWithIndex
    .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")

  private lazy val docs = Seq(
    (1L, distinctProse(1)),
    (2L, distinctProse(1)), // exact dup of 1
    (3L, distinctProse(2)),
    (90L, null.asInstanceOf[String]),
    (91L, ""),
    (92L, "   \n  \n "), // whitespace-only
  ).toDF("doc_id", "text")

  test("exact dedup faces: null/empty text groups don't crash; real dup still collapses") {
    val exact = Dedup.exactDedup(docs, "doc_id", "text").collect()
    assert(exact.length == 6)
    val canonical = exact.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_canonical")).toMap
    assert(canonical(1L) && !canonical(2L), "real exact dup collapses to min id")
    // null text hashes to null — its row survives and is its own group
    assert(canonical(90L), s"null-text row must survive as its own canonical: $canonical")

    val best = Dedup.exactDedupBest(docs, "doc_id", "text", Seq(length(col("text")).desc))
    val kept = best.where(col("is_kept")).select("doc_id").as[Long].collect().toSet
    assert(kept.contains(90L) && kept.contains(91L), s"poison rows keep themselves: $kept")
  }

  test("near-dup faces: null/empty text never enters a bucket; real near-dup still drops") {
    def summary(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "canonical_id", "near_dup_count").as[(Long, Long, Long)]
        .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val mh = summary(Dedup.minHashDedup(docs, "doc_id", "text"))
    assert(mh(2L)._1 == 1L, s"exact dup is also a near dup — canonicalized to 1: $mh")
    Seq(90L, 91L, 92L).foreach { id =>
      assert(mh(id) == ((id, 0L)), s"poison row $id un-grouped: ${mh(id)}")
    }
    val sh = summary(Dedup.simHashDedup(docs, "doc_id", "text"))
    assert(sh(2L)._1 == 1L, s"simhash collapses the exact dup: $sh")
    // simhash of null/empty coalesces to 0L — poison rows bucket
    // together but verification is hamming on the SAME hash, so they
    // do pair with each other; the contract is just "no crash" and
    // real rows unaffected
    assert(sh(1L)._1 == 1L && sh(3L)._1 == 3L, s"real rows: $sh")

    val nj = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
    val njIds = nj.select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(njIds.intersect(Set(90L, 91L, 92L)).isEmpty, s"no poison pair: $njIds")

    val clean = Dedup.cleanCorpus(docs, "doc_id", "text", jaccardThreshold = 0.8,
      transitive = true)
    val cleanIds = clean.select("doc_id").as[Long].collect().toSet
    assert(cleanIds == Set(1L, 3L, 90L, 91L, 92L), s"cleanCorpus: $cleanIds")
  }

  test("span/line dedup: null text becomes an empty doc, not a crash") {
    val ld = Dedup.lineDedup(docs, "doc_id", "text", minLineChars = 5)
    val byId = ld.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("clean_text")).toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 90L, 91L, 92L))
    assert(byId(90L) == "", "null text rebuilds to empty")

    val sd = Dedup.spanDedup(docs, "doc_id", "text", k = 5)
    val sdIds = sd.select("id").as[Long].collect().toSet
    assert(sdIds == Set(1L, 2L, 3L, 90L, 91L, 92L), s"spanDedup surfaces every doc: $sdIds")
  }

  test("prepare with minQuality=0 routes poison rows through pii/dedup/chunk unharmed") {
    val out = CorpusPipeline.prepare(docs, "doc_id", "text",
      langs = Seq("en", "und"), minQuality = 0.0)
    // chunkTokens emits zero chunks for empty/null docs; the real docs chunk
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L) && ids.contains(3L) && !ids.contains(2L),
      s"dup dropped, real docs chunked: $ids")
  }

  test("webIngest: null html / null url rows drop at extraction, real rows unaffected") {
    def page(body: String) = s"<html><body><p>$body</p></body></html>"
    val crawl = Seq(
      (1L, page(distinctProse(1)), "http://a.com/page"),
      (80L, null.asInstanceOf[String], "http://b.com/broken"), // failed fetch
      (81L, page(distinctProse(2)), null.asInstanceOf[String]), // lost url
      (82L, "", "http://c.com/empty"),
    ).toDF("doc_id", "html", "url")
    val out = CorpusPipeline.webIngest(crawl, "doc_id", "html", "url", langs = Seq("en"))
    val ids = out.select("id").as[Long].collect().toSet
    assert(ids.contains(1L), s"real row survives: $ids")
    assert(!ids.contains(80L) && !ids.contains(82L), s"empty extractions drop: $ids")
  }
}
