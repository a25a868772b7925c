package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels shared by interpreted eval and generated code.
  * Semantics are pinned (and mirrored in DuckDB oracle SQL):
  *
  *   polyHash(s, m)  = fold over code points: acc = (acc*31 + cp) mod m
  *   simHash32(s)    = 32-bit SimHash over whitespace tokens of trim(s),
  *                     token hash = polyHash(token, 2^32); bit j of the
  *                     result is 1 iff Σ_tokens (bit_j(h) ? +1 : -1) > 0
  */
object HashUtil {
  def polyHash(s: UTF8String, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * 31 + cp) % mod
    }
    acc
  }

  def simHash32(s: UTF8String): Long = {
    val text = s.toString.trim
    if (text.isEmpty) return 0L
    val counts = new Array[Int](32)
    for (tok <- text.split("\\s+")) {
      val h = polyHash(UTF8String.fromString(tok), 4294967296L)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

/** Rolling polynomial string hash as a native Catalyst expression —
  * single pass over the string, codegen'd (whole-stage), no per-row
  * array materialization. The scale workhorse under MinHash: hashing
  * every shingle of 100 TB of text through Column-space `aggregate`
  * folds would allocate an array per shingle; this is one JVM loop. */
case class PolyHash(child: Expression, mod: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashUtil.polyHash(input.asInstanceOf[UTF8String], mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.polyHash($c, ${mod}L)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
  override def prettyName: String = "polyhash"
}

/** 32-bit SimHash of a text column — one pass, codegen'd. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashUtil.simHash32(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.simHash32($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
  override def prettyName: String = "simhash32"
}

/** Column wrappers + SQL registration for the custom expressions.
  * Spark 4 keeps `Expression -> Column` private, so the public route is
  * the function registry: [[register]] installs the builders (idempotent)
  * and the wrappers emit `call_function` nodes resolved at analysis.
  * Operators call `register(df.sparkSession)` before building columns. */
object GraftFunctions {
  def polyhash(c: Column, mod: Long = 1000000007L): Column =
    call_function("polyhash", c, lit(mod))

  def simhash32(c: Column): Column =
    call_function("simhash32", c)

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("polyhash",
      exprs => PolyHash(exprs.head, exprs(1) match {
        case Literal(v: Long, _) => v
        case Literal(v: Int, _) => v.toLong
        case other => throw new IllegalArgumentException(s"polyhash mod must be a literal, got $other")
      }), "built-in")
    registry.createOrReplaceTempFunction("simhash32",
      exprs => SimHash32(exprs.head), "built-in")
  }
}
