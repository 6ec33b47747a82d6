package graft.functions

import java.net.{URI, URISyntaxException}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ksql-faithful `URL_EXTRACT_PARAMETER(url, name)` (ksqlDB 0.28,
  * reference docker-compose.yml:83).
  *
  * ksql's UDF reads `java.net.URI.getQuery()` — which percent-DECODES
  * the query as a whole while leaving `+` untouched — and only THEN
  * splits on `&` / `=`. The previous mapping,
  * `url_decode(parse_url(url, 'QUERY', name))`, diverged on two edges
  * (ADVICE r12):
  *
  *  - a literal `+` in a value stays `+` under ksql, but
  *    `java.net.URLDecoder` (Spark's `url_decode`) turns it into a
  *    space;
  *  - percent-encoded separators inside a value (`%26` = `&`,
  *    `%3D` = `=`) are split-AFTER-decode under ksql — the decoded
  *    `&`/`=` take part in the split — whereas decode-after-split
  *    keeps them inside the value.
  *
  * This expression reproduces the decode-then-split pipeline exactly:
  * `?a=1%262` yields `1` for `a` (the decoded `&` splits), and
  * `?t=a+b` yields `a+b` verbatim. Remaining micro-edges are chosen,
  * not inherited: a valueless parameter (`?a` or a match whose pair
  * has no `=`) yields NULL, `?a=` yields the empty string, and a
  * value containing a decoded `=` splits at the FIRST `=` only
  * (`?a=b=c` → `b=c`). Malformed URLs (URISyntaxException) and URLs
  * without a query yield NULL, as does an absent parameter.
  */
case class UrlExtractParameterKsql(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType | NullType, StringType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"url_extract_parameter expects (string, string), got $other")
    }

  override def nullSafeEval(u: Any, p: Any): Any = {
    val param = p.asInstanceOf[UTF8String].toString
    val query =
      try new URI(u.asInstanceOf[UTF8String].toString).getQuery
      catch { case _: URISyntaxException => null }
    if (query == null) null
    else {
      // First matching pair wins, as in ksql's stream-findFirst.
      val it = query.split("&").iterator
      var res: Any = null
      var found = false
      while (it.hasNext && !found) {
        val pair = it.next()
        val eq = pair.indexOf('=')
        val name = if (eq < 0) pair else pair.substring(0, eq)
        if (name == param) {
          found = true
          if (eq >= 0) res = UTF8String.fromString(pair.substring(eq + 1))
        }
      }
      res
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UrlExtractParameterKsql =
    copy(left = newLeft, right = newRight)
}
