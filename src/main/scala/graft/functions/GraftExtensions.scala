package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** SparkSessionExtensions hook: registers graft's native expressions and
  * the scalar pipeline operators so they are callable from SQL too
  * (`SELECT graft_cosine(a, b)`, `SELECT graft_fingerprint(text)`).
  *
  * The `graft_*` text functions are Catalyst trees over built-in
  * expressions — mirroring [[graft.pipeline.TextAnalysis]]'s Column
  * definitions node for node (ExtendedSpec asserts SQL ≡ DataFrame on
  * sample inputs, so the two surfaces cannot silently drift). They
  * cannot simply reuse the Column trees via GraftBridge: a Column
  * converted back with `GraftBridge.expression` stays a
  * ColumnNodeExpression, which the analyzer only resolves on the
  * DataFrame path — returned from a FunctionRegistry builder it
  * reaches codegen unresolved and throws (Unevaluable).
  *
  * Wire up via
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`,
  * `SparkSession.builder.withExtensions(new GraftExtensions)`, or on a
  * live session with [[GraftExtensions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        GraftExtensions.checked(name, arity, builder)))
    }
}

object GraftExtensions {

  private def checked(name: String, arity: Int,
      builder: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    children => {
      require(children.length == arity,
        s"$name expects exactly $arity argument(s)")
      builder(children)
    }

  /** trim(regexp_replace(lower(t), '\s+', ' ')) — whitespace-normalized
    * lowercase text, the [[graft.pipeline.TextAnalysis.fingerprint]]
    * input. */
  private def normalized(t: Expression): Expression =
    StringTrim(RegExpReplace(Lower(t), Literal("\\s+"), Literal(" ")))

  /** Whitespace tokens of trimmed text; empty text → empty array
    * (mirrors [[graft.pipeline.TextAnalysis.tokens]]). */
  private def tokensExpr(t: Expression): Expression =
    If(EqualTo(Length(StringTrim(t)), Literal(0)),
      Literal.create(Array.empty[String], ArrayType(StringType)),
      StringSplit(StringTrim(t), Literal("\\s+"), Literal(-1)))

  /** (name, arity, builder) for every SQL-surface function. The
    * analyzer's type-coercion batch runs over the returned tree, so
    * implicit numeric casts behave exactly as in the DataFrame API. */
  val functions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", 2,
      (c: Seq[Expression]) => CosineSimilarity(c(0), c(1))),
    ("graft_int_dot", 2,
      (c: Seq[Expression]) => IntDotProduct(c(0), c(1))),
    ("graft_fingerprint", 1,
      (c: Seq[Expression]) => Sha2(normalized(c.head), Literal(256))),
    ("graft_tokens", 1,
      (c: Seq[Expression]) => tokensExpr(c.head)),
    ("graft_token_count", 1,
      (c: Seq[Expression]) => Size(tokensExpr(c.head))),
    ("graft_subwords", 1,
      (c: Seq[Expression]) => Size(RegExpExtractAll(c.head,
        Literal("[A-Z][a-z]*|[a-z]+|[0-9]+"), Literal(0)))),
    ("graft_punct_ratio", 1,
      (c: Seq[Expression]) => If(EqualTo(Length(c.head), Literal(0)),
        Literal(0.0),
        Divide(
          Subtract(Length(c.head),
            Length(RegExpReplace(c.head,
              Literal("[^a-zA-Z0-9 ]"), Literal("")))),
          Length(c.head)))))

  /** Register every function on a LIVE session (extensions only apply
    * at builder time) — specs and the CLI use this. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, arity, builder) =>
      GraftBridge.registerFunction(spark, name,
        checked(name, arity, builder))
    }
}
