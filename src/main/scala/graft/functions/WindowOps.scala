package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[WindowHashes]] — ONE implementation shared by the
  * interpreted eval and the generated code (a static call from both,
  * so the two paths cannot drift).
  */
object WindowHashKernel {

  /** Seed of Spark's `xxhash64(...)` builtin — the kernel must emit
    * bit-identical hashes so candidate sets match the HOF reference.
    */
  val Seed = 42L

  /** xxhash64 of every w-char sliding window of s, in position order:
    * out(p) == xxhash64(substr(s, p+1, w)) for every p in
    * [0, numChars - w]. Windows are CODE-POINT windows (substr
    * slicing) hashed over their underlying UTF-8 bytes, computed in
    * one pass: a char→byte offset walk, then one XXH64 call per
    * window over the in-place bytes — no per-window UTF8String copy,
    * no text column duplicated into generator rows.
    */
  def hashes(s: UTF8String, w: Int): ArrayData = {
    val nBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // char-start byte offsets; offs(nChars) is the end sentinel
    val offs = new Array[Int](nBytes + 1)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      offs(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
    }
    offs(nChars) = nBytes
    val nWin = nChars - w + 1
    if (nWin <= 0) {
      UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    } else {
      val out = new Array[Long](nWin)
      var p = 0
      while (p < nWin) {
        out(p) = XXH64.hashUnsafeBytes(
          base, off + offs(p), offs(p + w) - offs(p), Seed)
        p += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }
}

/** Native Catalyst expression for the duplicated-window hot path
  * (exact-substring dedup, [[graft.analytics.TextOps.dupSpans]]).
  *
  * The compositional form — `explode(sequence(...))` then
  * `xxhash64(substr(text, pos+1, w))` — copies the full text column
  * into EVERY generated row (~w-char docs become O(len·len_text)
  * bytes of unsafe-row traffic) and allocates a w-char UTF8String per
  * window. This expression emits the long[] of all window hashes
  * straight from the document row; `posexplode` of the result carries
  * 12 bytes per window instead of the document. Measured at sf0.1:
  * the two scans of the dup-span pipeline drop from ~2.8 s to ~0.6 s.
  *
  * Shorter-than-w (and empty) strings produce an empty array — the
  * same windows the sequence guard produced. NULL in → NULL out.
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {

  require(w > 0, s"window_hashes needs w > 0, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_hashes"

  override protected def nullSafeEval(x: Any): Any =
    WindowHashKernel.hashes(x.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WindowHashKernel.hashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowOps {

  /** Codegen'd sliding-window xxhash64 array (see [[WindowHashes]]). */
  def windowHashes(text: Column, w: Int): Column =
    GraftBridge.column(WindowHashes(GraftBridge.expression(text), w))
}
