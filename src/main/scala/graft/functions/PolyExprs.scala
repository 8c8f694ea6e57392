package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** DuckDB's `len()` is POLYMORPHIC — BIGINT length of a string, list or
  * map — while Spark splits the surface into `length` (string/binary)
  * and `size`/`cardinality` (array/map). A function-registry builder
  * sees UNRESOLVED children (no types yet), so the dispatch cannot
  * happen at bind time; this RuntimeReplaceable defers it to analysis:
  * once the child resolves, `replacement` lowers to the native
  * codegen'd Length or Size node — the optimizer replaces the wrapper
  * outright, so nothing interpreted survives into the physical plan. */
case class PolyLen(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Cast(Size(child), LongType)
    // enum columns decode to their LABEL first (replacements are not
    // re-analyzed, so DuckEnumRule cannot fix this one up — r17, when
    // the shared `length` name started routing here)
    case st if EnumExprs.enumNameOf(st).isDefined =>
      graft.component.TypeSql.enumValues(EnumExprs.enumNameOf(st).get) match {
        case Some(vs) => Cast(Length(EnumExprs.decode(child, vs)), LongType)
        case None => Cast(Length(child), LongType) // loud unresolvable
      }
    case _ => Cast(Length(child), LongType)
  }

  override def prettyName: String = "len"

  override protected def withNewChildInternal(newChild: Expression): PolyLen =
    copy(child = newChild)
}
