package graft.operators

import org.apache.spark.sql.DataFrame

/** How an operator lands a CORPUS-sized output at a pipeline-stage
  * boundary. Every multi-consumer operator in this library cuts its
  * lineage at the stage boundary (the upstream filter/redact/dedup
  * chain must not re-execute per downstream consumer); this chooses
  * where the cut materializes:
  *
  *   - [[Materialize.LocalCheckpoint]] (default): executor
  *     memory/disk blocks, reference-tracked and freed on GC, zero
  *     external storage. The trade: NO fault recovery — one lost
  *     executor makes the frame unrecomputable and the operator must
  *     be rerun. Right for interactive sessions, tests, and
  *     small-to-medium outputs on reliable executors.
  *   - [[Materialize.ParquetDir]]: the output is written to a durable
  *     parquet directory and the returned frame READS BACK from it.
  *     Survives any number of executor losses (tasks recompute from
  *     the files), costs one write of the output, and doubles as the
  *     stage's restart point: a failed downstream stage resumes from
  *     the directory instead of rerunning the operator. Right for
  *     100 TB pipeline runs on preemptible executors, where a
  *     corpus-sized rerun is unaffordable.
  *   - [[Materialize.Lazy]]: no lineage cut at all — the plan is
  *     returned as-is, fully lazy and fully fault-tolerant, and the
  *     upstream subtree re-executes once PER downstream consumer.
  *     Right when the caller composes the result into exactly one
  *     action, or wants classic lazy-DataFrame semantics (no job runs
  *     until the caller acts).
  *
  * NOTE both landing modes are EAGER: constructing the operator's
  * result triggers a Spark job at call time (the checkpoint or the
  * parquet write), unlike a plain lazy DataFrame. Callers that need
  * call-time laziness must pass [[Materialize.Lazy]].
  */
sealed trait Materialize

object Materialize {
  case object LocalCheckpoint extends Materialize

  /** No materialization: return the plan unchanged. Lazy and
    * fault-tolerant; multi-consumer operators will re-run the
    * upstream subtree once per consumer.
    */
  case object Lazy extends Materialize

  /** `path` is any Spark-writable URI (HDFS/S3/local); contents are
    * overwritten.
    */
  final case class ParquetDir(path: String) extends Materialize

  /** Land `df` per `mode` and return the frame downstream consumers
    * should read.
    */
  private[operators] def apply(df: DataFrame, mode: Materialize): DataFrame = mode match {
    case Lazy => df
    case LocalCheckpoint => df.localCheckpoint(true)
    case ParquetDir(path) =>
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
  }
}
