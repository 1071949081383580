package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.{DataFrame, Dataset}

import graft.operators.Dsir

/** Streaming face of [[Dsir.select]] — keep the running top-k
  * highest-importance documents over an unbounded stream.
  *
  * Scores are pure per-row functions of the broadcast model (and the
  * seeded Gumbel noise, a pure function of the id), so the stream
  * face needs no rescoring state — only a bounded top-k register.
  * The id space hash-partitions into `numGroups` slices, each keeping
  * its own k-bounded heap in `mapGroupsWithState`; top-k is
  * MERGEABLE (the global top-k is contained in the union of slice
  * top-ks), so merging the latest update per group reproduces the
  * batch [[Dsir.select]] row set EXACTLY at every trigger, regardless
  * of micro-batch boundaries — the same stream≡batch contract the
  * sketch faces pin, here for a selection operator. State is
  * O(numGroups × k) forever.
  *
  * Tie-break caveat: state keys are STRINGS, so tied scores break on
  * the id's string form; the batch face breaks on the raw column. For
  * string ids (or any corpus without exact score ties — log-ratio
  * scores tie only on symmetric planted constructions) the two faces
  * agree row-for-row; numeric ids WITH ties can order differently
  * within the tie group.
  */
object StreamingDsir {

  /** One slice's current top-k after a trigger (update semantics):
    * ids with their scores, sorted by (score desc, id asc) — the
    * batch operator's exact ordering.
    */
  final case class SelectionUpdate(
      group_id: Int,
      ids: Array[String],
      scores: Array[Double],
      total_seen: Long,
  )

  def dsirSelectStream(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      model: Dsir.DsirModel,
      gumbelScale: Double = 0.0,
      seed: Long = 42L,
      numGroups: Int = 16,
  ): Dataset[SelectionUpdate] = {
    require(k > 0 && numGroups > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val scoreUdf = udf { (id: String, text: String) =>
      val w = bc.value.logWeight(text)
      if (gumbelScale == 0.0) w else w + gumbelScale * Dsir.gumbel(id, seed)
    }
    val keyed = df
      .select(
        col(idCol).cast("string").as("id"),
        scoreUdf(col(idCol).cast("string"), col(textCol).cast("string")).as("score"),
        pmod(hash(col(idCol).cast("string")), lit(numGroups)).as("group_id"),
      )
      .where(col("id").isNotNull)
      .as[(String, Double, Int)]
    keyed
      .groupByKey(_._3)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (gid: Int, rows: Iterator[(String, Double, Int)],
            state: GroupState[(Array[String], Array[Double], Long)]) => {
          // the register is tiny (k entries): keep it a sorted array,
          // rebuild on update — simpler than a heap and the ordering
          // IS the output contract
          val (pIds, pScores, pSeen) = state.getOption.getOrElse(
            (Array.empty[String], Array.empty[Double], 0L))
          val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
          var i = 0
          while (i < pIds.length) { buf += ((pIds(i), pScores(i))); i += 1 }
          var seen = pSeen
          rows.foreach { case (id, score, _) => buf += ((id, score)); seen += 1 }
          val top = buf
            .sortBy { case (id, s) => (-s, id) }
            .take(k)
          state.update((top.map(_._1).toArray, top.map(_._2).toArray, seen))
          SelectionUpdate(gid, top.map(_._1).toArray, top.map(_._2).toArray, seen)
        },
      )
  }

  /** Merge the LATEST update per group into the global top-k —
    * identical (ids AND order) to [[Dsir.select]] over everything the
    * stream has seen.
    */
  def mergeSelectionUpdates(updates: Seq[SelectionUpdate], k: Int): Seq[(String, Double)] = {
    val all = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    updates.groupBy(_.group_id).foreach { case (_, us) =>
      val u = us.last
      var i = 0
      while (i < u.ids.length) { all += ((u.ids(i), u.scores(i))); i += 1 }
    }
    all.sortBy { case (id, s) => (-s, id) }.take(k).toSeq
  }
}
