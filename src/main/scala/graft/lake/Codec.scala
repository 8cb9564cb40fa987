package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Byte-level kernels for the store path: deflate/inflate (the
  * compress-before-encrypt step that makes the reference's
  * "store raw when encryption would enlarge" fallback meaningful,
  * store/mod.rs:380-385) and a single-allocation binary concat for
  * blob reassembly (the `aggregate(concat)` HOF it replaces re-copies
  * the accumulated prefix per part — O(parts²) bytes).
  *
  * All three are thin Catalyst expressions whose codegen is one static
  * call — they stay inside whole-stage codegen without emitting loops.
  */
object Codec {

  /** Deterministic raw-deflate (no zlib header, fixed level). The fixed
    * parameters matter: convergent encryption requires identical bytes
    * in → identical bytes out across executors and runs.
    */
  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(data)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 2))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated deflate stream")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** Concatenate an array<binary> in one pass: size, allocate once, copy. */
  def concatAll(parts: ArrayData): Array[Byte] = {
    val n = parts.numElements()
    var total = 0L
    var i = 0
    while (i < n) { total += parts.getBinary(i).length; i += 1 }
    require(total <= Int.MaxValue, s"reassembled blob exceeds 2 GiB ($total bytes) — split the read")
    val out = new Array[Byte](total.toInt)
    var off = 0
    i = 0
    while (i < n) {
      val p = parts.getBinary(i)
      System.arraycopy(p, 0, out, off, p.length)
      off += p.length
      i += 1
    }
    out
  }

  def deflateCol(c: Column): Column = ColumnBridge.column(DeflateRaw(ColumnBridge.expression(c)))
  def inflateCol(c: Column): Column = ColumnBridge.column(InflateRaw(ColumnBridge.expression(c)))

  /** Linear-time ordered reassembly of an array<binary> column. */
  def concatBinary(c: Column): Column = ColumnBridge.column(ConcatBinaryArray(ColumnBridge.expression(c)))
}

case class DeflateRaw(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(in: Any): Any = Codec.deflate(in.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = graft.lake.Codec.deflate($in);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class InflateRaw(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(in: Any): Any = Codec.inflate(in.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = graft.lake.Codec.inflate($in);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ConcatBinaryArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(in: Any): Any = Codec.concatAll(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = graft.lake.Codec.concatAll($in);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
