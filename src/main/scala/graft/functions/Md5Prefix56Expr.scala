package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Expression,
  LambdaFunction, UnaryExpression, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The first 56 bits of md5 over a string's UTF-8 bytes, as one native
  * expression — semantically identical to the SQL chain
  * `cast(conv(substr(md5(t), 1, 14), 16, 10) as bigint)` (14 hex chars =
  * first 7 digest bytes, big-endian; DuckDB computes the same value with
  * `CAST('0x' || substr(md5(t), 1, 14) AS BIGINT)`, which is what keeps
  * the SimHash pipeline oracle-checkable) but without the hex-string
  * render, substring, and base-conversion allocations per token — the SQL
  * chain measured ~2× the whole simhash stage at sf0.1. */
case class Md5Prefix56Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix56Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix56Expr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix56Expr =
    copy(child = newChild)
}

object Md5Prefix56Expr {

  // MessageDigest is stateful — one per task thread, reset per call.
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** md5(utf8 bytes), first 7 bytes big-endian (called from generated code). */
  def compute(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(s.getBytes)
    ((h(0) & 0xffL) << 48) | ((h(1) & 0xffL) << 40) | ((h(2) & 0xffL) << 32) |
      ((h(3) & 0xffL) << 24) | ((h(4) & 0xffL) << 16) | ((h(5) & 0xffL) << 8) |
      (h(6) & 0xffL)
  }

  /** `transform(arr, t -> md5_prefix56(t))` built programmatically — no
    * session function registration needed. */
  def hashArray(arr: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val v = UnresolvedNamedLambdaVariable(Seq("t"))
    ColumnBridge.column(ArrayTransform(ColumnBridge.expression(arr),
      LambdaFunction(Md5Prefix56Expr(v), Seq(v))))
  }
}
