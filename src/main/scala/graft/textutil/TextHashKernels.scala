package graft.textutil

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-facing faces over [[TextHash]], callable from generated
  * Java (Scala-object static forwarders): UTF8String in,
  * UnsafeArrayData / InternalRow out — no Scala↔Catalyst converters,
  * no boxing. These are what the graftext signature expressions
  * compile down to.
  */
object TextHashKernels {

  /** Sorted distinct mixed shingle-hash set as Catalyst array data. */
  def shingleSet(text: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(TextHash.sortedShingleSet(text.toString, n))

  /** struct(sig: array<long>, grams: array<long>) — the one-scan
    * MinHash prep (densified-OPH signature + the exact shingle set the
    * verify path intersects).
    */
  def minhashPrep(text: UTF8String, n: Int, numHashes: Int): InternalRow = {
    val grams = TextHash.sortedShingleSet(text.toString, n)
    new GenericInternalRow(
      Array[Any](
        UnsafeArrayData.fromPrimitiveArray(TextHash.ophSignature(grams, numHashes)),
        UnsafeArrayData.fromPrimitiveArray(grams),
      ),
    )
  }

  def simhash64(text: UTF8String): Long = TextHash.simhash64(text.toString)

  def winnowSignature(text: UTF8String, k: Int, w: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(TextHash.winnowSignature(text.toString, k, w))
}
