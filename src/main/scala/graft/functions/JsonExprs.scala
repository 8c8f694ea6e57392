package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 7386 JSON merge patch with DuckDB's rendering contract
  * (probed v1.0): output is minified; an UNTOUCHED key keeps its
  * position, a REPLACED or ADDED key is appended at the END in patch
  * order (delete-then-insert, observable as
  * `merge_patch('{"a":1,"b":2}','{"a":9}') = '{"b":2,"a":9}'`), `null`
  * patch values remove keys recursively, a non-object patch replaces the
  * target outright, and a NULL SQL argument is SKIPPED (`merge(NULL, x)
  * = x`), so the result is NULL only when every argument is.
  *
  * Deviation (documented): DuckDB raises on malformed JSON input; this
  * returns NULL, the lenient stance the rest of the json surface takes
  * (`get_json_object` precedent). Reference behavior:
  * keboola/component-duckdb-transformation hands SQL to DuckDB verbatim
  * (src/query_orchestrator.py), so its merge_patch is DuckDB 1.0's.
  *
  * Codegen: delegates to the static [[JsonMergePatch.merge]] — the
  * Jackson walk can't inline, but the expression participates in
  * whole-stage codegen so the enclosing stage stays compiled (the
  * EvalDelegatingCodegen rationale in [[TextExprs]]).
  */
case class JsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable && right.nullable
  override def prettyName: String = "json_merge_patch"

  override def eval(input: InternalRow): Any =
    JsonMergePatch.merge(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val cls = classOf[JsonMergePatch].getName
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        $cls.merge(${l.isNull} ? null : ${l.value},
                   ${r.isNull} ? null : ${r.value});
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonMergePatch =
    copy(left = newLeft, right = newRight)
}

object JsonMergePatch {
  // ObjectMapper is thread-safe after configuration; Jackson object
  // nodes preserve insertion order, which carries DuckDB's key-order
  // contract through the recursive patch.
  private val mapper = new ObjectMapper()

  /** NULL-skipping two-sided merge (see class doc). Called from
    * generated code — must stay a public static-forwarding method. */
  def merge(l: UTF8String, r: UTF8String): UTF8String = {
    if (l == null && r == null) return null
    if (l == null) return renderOrNull(r.toString)
    if (r == null) return renderOrNull(l.toString)
    try {
      val target = mapper.readTree(l.toString)
      val patch = mapper.readTree(r.toString)
      UTF8String.fromString(mapper.writeValueAsString(applyPatch(target, patch)))
    } catch {
      case _: java.io.IOException => null
      case _: IllegalArgumentException => null
    }
  }

  /** A lone surviving argument still round-trips through the parser so
    * the output is minified (and malformed input maps to NULL). */
  private def renderOrNull(s: String): UTF8String =
    try UTF8String.fromString(mapper.writeValueAsString(mapper.readTree(s)))
    catch { case _: java.io.IOException => null }

  private def applyPatch(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch.deepCopy[JsonNode]()
    else {
      val out = mapper.createObjectNode()
      // surviving keys first, in target order — any key the patch
      // mentions (even to replace) is dropped here and re-appended below
      if (target != null && target.isObject) {
        val it = target.asInstanceOf[ObjectNode].properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (!patch.has(e.getKey)) out.set[JsonNode](e.getKey, e.getValue.deepCopy[JsonNode]())
        }
      }
      val pit = patch.asInstanceOf[ObjectNode].properties().iterator()
      while (pit.hasNext) {
        val e = pit.next()
        if (!e.getValue.isNull) {
          val prev = if (target != null && target.isObject) target.get(e.getKey) else null
          out.set[JsonNode](e.getKey, applyPatch(prev, e.getValue))
        }
      }
      out
    }
}
