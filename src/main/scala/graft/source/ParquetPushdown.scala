package graft.source

import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Spark source filters → a parquet-mr `FilterPredicate` for ROW-GROUP
  * pruning inside the catalog's vectorized scans (statistics, dictionary
  * and bloom levels — parquet-mr applies all three at open). Translation
  * is deliberately partial: a conjunct that doesn't translate is simply
  * not pushed (it stays a residual Spark re-applies), and `Or` pushes
  * only when BOTH sides do. Values are typed against the TABLE schema;
  * per-file physical mismatches (a legacy file missing the column) are
  * handled at open time by falling back to an unfiltered read — pruning
  * is an optimization, never a correctness bet.
  */
object ParquetPushdown {

  def predicate(filters: Seq[Filter], schema: StructType,
      nameMap: Map[String, String]): Option[FilterPredicate] =
    filters.flatMap(translate(_, schema, nameMap))
      .reduceOption(FilterApi.and)

  /** The subset of `filters` that contributed to the pushed predicate —
    * what `pushedFilters()` reports so `.explain` shows the pushdown.
    */
  def pushable(filters: Seq[Filter], schema: StructType,
      nameMap: Map[String, String]): Seq[Filter] =
    filters.filter(translate(_, schema, nameMap).isDefined)

  private def fieldType(a: String, schema: StructType): Option[DataType] =
    schema.fields.find(_.name == a).map(_.dataType)

  private def phys(a: String, nameMap: Map[String, String]): String =
    nameMap.getOrElse(a, a)

  // scalastyle:off cyclomatic.complexity
  private def translate(f: Filter, schema: StructType,
      nameMap: Map[String, String]): Option[FilterPredicate] = f match {
    case EqualTo(a, v) => leaf(a, v, schema, nameMap, Cmp.Eq)
    case GreaterThan(a, v) => leaf(a, v, schema, nameMap, Cmp.Gt)
    case GreaterThanOrEqual(a, v) => leaf(a, v, schema, nameMap, Cmp.GtEq)
    case LessThan(a, v) => leaf(a, v, schema, nameMap, Cmp.Lt)
    case LessThanOrEqual(a, v) => leaf(a, v, schema, nameMap, Cmp.LtEq)
    case IsNull(a) => nullLeaf(a, schema, nameMap, isNull = true)
    case IsNotNull(a) => nullLeaf(a, schema, nameMap, isNull = false)
    case In(a, vs) if vs.nonEmpty && vs.length <= 20 && !vs.contains(null) =>
      val legs = vs.toSeq.map(v => leaf(a, v, schema, nameMap, Cmp.Eq))
      if (legs.forall(_.isDefined)) legs.flatten.reduceOption(FilterApi.or)
      else None
    case And(l, r) =>
      // pushing either side alone is a SUPERSET of the conjunction — safe
      (translate(l, schema, nameMap), translate(r, schema, nameMap)) match {
        case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
        case (one, other) => one.orElse(other)
      }
    case Or(l, r) =>
      for {
        a <- translate(l, schema, nameMap)
        b <- translate(r, schema, nameMap)
      } yield FilterApi.or(a, b)
    case _ => None // Not, string matches, timestamps/decimals: residual only
  }
  // scalastyle:on cyclomatic.complexity

  private object Cmp extends Enumeration { val Eq, Gt, GtEq, Lt, LtEq = Value }

  private def nullLeaf(a: String, schema: StructType,
      nameMap: Map[String, String], isNull: Boolean): Option[FilterPredicate] =
    fieldType(a, schema).flatMap { dt =>
      val c = phys(a, nameMap)
      dt match {
        case LongType =>
          Some(if (isNull) FilterApi.eq(FilterApi.longColumn(c), null: java.lang.Long)
          else FilterApi.notEq(FilterApi.longColumn(c), null: java.lang.Long))
        case IntegerType =>
          Some(if (isNull) FilterApi.eq(FilterApi.intColumn(c), null: java.lang.Integer)
          else FilterApi.notEq(FilterApi.intColumn(c), null: java.lang.Integer))
        case StringType =>
          Some(if (isNull) FilterApi.eq(FilterApi.binaryColumn(c), null: Binary)
          else FilterApi.notEq(FilterApi.binaryColumn(c), null: Binary))
        case DoubleType =>
          Some(if (isNull) FilterApi.eq(FilterApi.doubleColumn(c), null: java.lang.Double)
          else FilterApi.notEq(FilterApi.doubleColumn(c), null: java.lang.Double))
        case FloatType =>
          Some(if (isNull) FilterApi.eq(FilterApi.floatColumn(c), null: java.lang.Float)
          else FilterApi.notEq(FilterApi.floatColumn(c), null: java.lang.Float))
        case BooleanType =>
          Some(if (isNull) FilterApi.eq(FilterApi.booleanColumn(c), null: java.lang.Boolean)
          else FilterApi.notEq(FilterApi.booleanColumn(c), null: java.lang.Boolean))
        case _ => None
      }
    }

  private def leaf(a: String, v: Any, schema: StructType,
      nameMap: Map[String, String], op: Cmp.Value): Option[FilterPredicate] = {
    if (v == null) return if (op == Cmp.Eq) nullLeaf(a, schema, nameMap, isNull = true) else None
    val c = phys(a, nameMap)
    fieldType(a, schema).flatMap {
      case LongType =>
        val col = FilterApi.longColumn(c)
        val x: java.lang.Long = v match {
          case n: Number => Long.box(n.longValue); case _ => return None
        }
        Some(op match {
          case Cmp.Eq => FilterApi.eq(col, x)
          case Cmp.Gt => FilterApi.gt(col, x)
          case Cmp.GtEq => FilterApi.gtEq(col, x)
          case Cmp.Lt => FilterApi.lt(col, x)
          case Cmp.LtEq => FilterApi.ltEq(col, x)
        })
      case IntegerType =>
        val col = FilterApi.intColumn(c)
        val x: java.lang.Integer = v match {
          case n: Number => Int.box(n.intValue); case _ => return None
        }
        Some(op match {
          case Cmp.Eq => FilterApi.eq(col, x)
          case Cmp.Gt => FilterApi.gt(col, x)
          case Cmp.GtEq => FilterApi.gtEq(col, x)
          case Cmp.Lt => FilterApi.lt(col, x)
          case Cmp.LtEq => FilterApi.ltEq(col, x)
        })
      case StringType =>
        val col = FilterApi.binaryColumn(c)
        val x = v match {
          case s: String => Binary.fromString(s)
          case u: org.apache.spark.unsafe.types.UTF8String => Binary.fromString(u.toString)
          case _ => return None
        }
        Some(op match {
          case Cmp.Eq => FilterApi.eq(col, x)
          case Cmp.Gt => FilterApi.gt(col, x)
          case Cmp.GtEq => FilterApi.gtEq(col, x)
          case Cmp.Lt => FilterApi.lt(col, x)
          case Cmp.LtEq => FilterApi.ltEq(col, x)
        })
      case DoubleType =>
        val col = FilterApi.doubleColumn(c)
        val x: java.lang.Double = v match {
          case n: Number => Double.box(n.doubleValue); case _ => return None
        }
        Some(op match {
          case Cmp.Eq => FilterApi.eq(col, x)
          case Cmp.Gt => FilterApi.gt(col, x)
          case Cmp.GtEq => FilterApi.gtEq(col, x)
          case Cmp.Lt => FilterApi.lt(col, x)
          case Cmp.LtEq => FilterApi.ltEq(col, x)
        })
      case FloatType =>
        val col = FilterApi.floatColumn(c)
        val x: java.lang.Float = v match {
          case n: Number => Float.box(n.floatValue); case _ => return None
        }
        Some(op match {
          case Cmp.Eq => FilterApi.eq(col, x)
          case Cmp.Gt => FilterApi.gt(col, x)
          case Cmp.GtEq => FilterApi.gtEq(col, x)
          case Cmp.Lt => FilterApi.lt(col, x)
          case Cmp.LtEq => FilterApi.ltEq(col, x)
        })
      case BooleanType =>
        val col = FilterApi.booleanColumn(c)
        v match {
          case b: java.lang.Boolean if op == Cmp.Eq => Some(FilterApi.eq(col, b))
          case _ => None
        }
      case _ => None // dates/timestamps/decimals: value encodings differ — residual
    }
  }
}
