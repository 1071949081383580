package graft

import org.apache.spark.sql.functions._

/** Pins the premise of the repo-wide UDF vector-parameter convention
  * (SCALE.md "UDF vector parameters"): a `Seq[Float]` UDF parameter
  * deserializes to a linear-access List — so an indexed while-loop
  * kernel on it is O(dim²) per row — while an `Array[Float]`
  * parameter arrives as the primitive float[] (measured ~130× faster
  * on a dim-2048 indexed loop). If a Spark upgrade ever changes the
  * Seq deserializer to an indexed sequence, this spec fails and the
  * convention note can be revisited; until then every per-row vector
  * kernel takes Array[Float].
  */
class UdfParamConventionSpec extends SparkTestBase {
  import spark.implicits._

  test("Seq[Float] UDF params deserialize to a linear Seq; Array[Float] to primitive float[]") {
    val seqClass = udf((v: Seq[Float]) => v.getClass.getName)
    val arrClass = udf((v: Array[Float]) => v.getClass.getName)
    val base = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "vec")
    // every source shape hands the Seq form a List (checked on toDF
    // here; parquet, UDF output, and localCheckpoint shapes were
    // probed identically when the convention was adopted)
    val mk = udf((i: Long) => Array.fill(3)(i.toFloat))
    val viaUdf = base.select(mk($"id").as("vec"))
    for (df <- Seq(base, viaUdf, viaUdf.localCheckpoint(true))) {
      val s = df.select(seqClass($"vec")).head().getString(0)
      assert(classOf[scala.collection.LinearSeq[_]].isAssignableFrom(Class.forName(s)),
        s"Seq[Float] UDF param is $s — if this became an IndexedSeq, the " +
          "Array[Float] kernel convention's premise changed (see SCALE.md)")
      assert(df.select(arrClass($"vec")).head().getString(0) == "[F",
        "Array[Float] UDF param must arrive as the primitive float[]")
    }
  }
}
