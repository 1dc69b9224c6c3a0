package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a whitespace-tokenized string as a native
  * expression: one pass over the UTF8 bytes, no per-element lambda
  * dispatch.
  *
  * Replaces the `transform(sequence(1, size-1), i -> concat_ws(...))`
  * higher-order chain, which evaluates interpreted lambdas per shingle —
  * measured ~8 s for 5k docs at sf0.1 versus milliseconds here. The call is
  * per ROW (documents), not per candidate pair, so CodegenFallback's
  * interpreted boundary costs nothing measurable while keeping the
  * implementation simple. Produces the same shingle strings the DuckDB
  * oracle builds with `toks[i] || ' ' || toks[i+1]`.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    // split(' ') semantics must match Spark's split(text, " ") /
    // DuckDB's string_split: empty tokens from consecutive spaces kept
    val toks = input.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      var s = toks(i)
      var j = 1
      while (j < n) {
        s = UTF8String.concat(s, UTF8String.fromString(" "), toks(i + j))
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))
}
