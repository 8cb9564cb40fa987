package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Deflate helpers shared by interpreted eval and generated code.
  * Scala object methods get static forwarders, so generated Java calls
  * `graft.functions.CompressKernels.deflateLen(bytes)` directly.
  */
object CompressKernels {

  // Deflater wraps native zlib state — constructing one per row would
  // dominate the kernel. One per task thread, reset per call.
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }

  /** Length in bytes of the raw-deflate stream of `data`. */
  def deflateLen(data: Array[Byte]): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(data)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

object Compress {

  /** Raw-deflate byte length of a binary column. */
  def deflateLen(bytes: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(bytes)))
}

/** Deflate-compressed size of a binary value — the compression-ratio
  * quality signal (near-random text ≈ 1, boilerplate/repetition ≪ 1)
  * used by large-corpus quality filters. A custom expression (not a
  * UDF) so it composes inside whole-stage codegen: the call is a
  * single static-method invocation in the generated projection, no
  * encoder boxing, no fallback of the surrounding stage.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"DeflateLen expects BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(in: Any): Any =
    CompressKernels.deflateLen(in.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressKernels.deflateLen($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
