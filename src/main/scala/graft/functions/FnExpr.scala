package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/**
 * Spec for one scalar function: name, accepted arities (each with the expected
 * Catalyst input types, which lets Spark's ImplicitTypeCasts coerce e.g.
 * INT→DOUBLE exactly like the reference's overload resolution,
 * /root/reference/spatial/src/spatial/core/functions/scalar/st_area.cpp:200-214),
 * result type, and an eval factory.
 *
 * `make` sees the bound child expressions so a function can specialize for
 * foldable (constant) arguments — the Spark analogue of the reference's
 * prepared-geometry fast path (geos_executor.hpp:28-31).
 */
final case class FnSpec(
    name: String,
    arities: Map[Int, Seq[DataType]],
    out: DataType,
    make: Seq[Expression] => Array[Any] => Any)

object FnRegistry {
  private val specs = new java.util.concurrent.ConcurrentHashMap[String, FnSpec]()
  @volatile private var loaded = false

  private[functions] def add(s: FnSpec): Unit = specs.put(s.name, s)

  private def ensureLoaded(): Unit = if (!loaded) synchronized {
    if (!loaded) {
      GeoFns.load()
      TextFns.load()
      VecFns.load()
      LinearFns.load()
      MeasureFns.load()
      ThreeDFns.load()
      CompGeomFns.load()
      TopoFns.load()
      GeneratePoints.load()
      loaded = true
    }
  }

  def apply(name: String): FnSpec = {
    ensureLoaded()
    val s = specs.get(name)
    if (s == null) throw new IllegalArgumentException(s"unknown graft function: $name")
    s
  }

  def names: Seq[String] = { ensureLoaded(); import scala.jdk.CollectionConverters._; specs.keySet().asScala.toSeq.sorted }
}

/**
 * The single scalar-expression shape for every registered graft function.
 * Dispatch is by name through [[FnRegistry]] so Catalyst equality,
 * canonicalization, and (de)serialization work structurally. All functions are
 * null-intolerant (NULL in → NULL out), matching the reference's default
 * function null semantics. `foldable` children make the whole call foldable, so
 * Catalyst constant-folds literal geometry construction at plan time.
 */
case class FnExpr(fn: String, children: Seq[Expression])
    extends Expression with ImplicitCastInputTypes {

  @transient private lazy val spec = FnRegistry(fn)
  @transient private lazy val f: Array[Any] => Any = {
    val base = spec.make(children)
    val expected = spec.arities.getOrElse(children.length, children.map(_.dataType))
    val convs: Array[Any => Any] = expected.lazyZip(children).map {
      case (BinaryType, c) if c.resolved && FnExpr.isGeomStruct(c.dataType) =>
        FnExpr.structConverter(c.dataType)
      case _ => null
    }.toArray
    if (convs.forall(_ == null)) base
    else {
      // the reference's validity predicates report degenerate columnar
      // geometries (1-point LINESTRING_2D, <4-point rings) as invalid rather
      // than erroring — they "can't be constructed in GEOS" (st_isvalid.test)
      val validity = fn == "st_isvalid" || fn == "st_issimple" || fn == "st_isring"
      (args: Array[Any]) => {
        var bad = false
        var i = 0
        while (i < args.length && !bad) {
          if (convs(i) != null) {
            try args(i) = convs(i)(args(i))
            catch { case _: IllegalArgumentException if validity => bad = true }
          }
          i += 1
        }
        if (bad) false else base(args)
      }
    }
  }

  /** Expected input types, with one twist reproducing the reference's
   *  implicit VARCHAR→GEOMETRY cast (§1.4 cast lattice, geometry_cast.cpp):
   *  where a geometry (binary) argument receives a string, the string is let
   *  through untouched and parsed as WKT at eval — a Cast(string→binary)
   *  would reinterpret the text bytes as WKB garbage. */
  override def inputTypes: Seq[DataType] = {
    val base = spec.arities.getOrElse(children.length, children.map(_.dataType))
    base.lazyZip(children).map {
      case (BinaryType, c) if c.resolved && c.dataType == StringType => StringType
      // columnar POINT_2D/3D/4D (struct of doubles), LINESTRING_2D (array of
      // point structs) and POLYGON_2D (array of rings) coerce to geometry —
      // the reference's two-tier type model (SURVEY §1.3, dimensional_cast.cpp)
      case (BinaryType, c) if c.resolved && FnExpr.isGeomStruct(c.dataType) => c.dataType
      case (t, _) => t
    }
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!spec.arities.contains(children.length))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$fn accepts ${spec.arities.keys.toSeq.sorted.mkString("/")} arguments, got ${children.length}")
    else super.checkInputDataTypes()
  }

  override def dataType: DataType = spec.out
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val args = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      args(i) = v
      i += 1
    }
    f(args)
  }

  /** Codegen that stays inside whole-stage spans: children evaluate through
   *  their own generated code (column reads and arithmetic remain native);
   *  only the kernel call itself is a boxed Function1 invoke. CodegenFallback
   *  would instead force an InternalRow materialization for every call. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fnRef = ctx.addReferenceObj("graftFn", f, "scala.Function1")
    val childGen = children.map(_.genCode(ctx))
    val args = ctx.freshName("graftArgs")
    val res = ctx.freshName("graftRes")
    val javaType = CodeGenerator.javaType(dataType)
    val setArgs = childGen.zipWithIndex.map { case (g, i) =>
      val box = children(i).dataType match {
        case DoubleType => s"java.lang.Double.valueOf(${g.value})"
        case IntegerType => s"java.lang.Integer.valueOf(${g.value})"
        case LongType => s"java.lang.Long.valueOf(${g.value})"
        case BooleanType => s"java.lang.Boolean.valueOf(${g.value})"
        case FloatType => s"java.lang.Float.valueOf(${g.value})"
        case ShortType => s"java.lang.Short.valueOf(${g.value})"
        case ByteType => s"java.lang.Byte.valueOf(${g.value})"
        case _ => g.value.toString
      }
      s"""
         |if (!${ev.isNull}) {
         |  ${g.code}
         |  if (${g.isNull}) { ${ev.isNull} = true; } else { $args[$i] = $box; }
         |}""".stripMargin
    }.mkString("\n")
    val unboxed = dataType match {
      case DoubleType => s"((java.lang.Double) $res).doubleValue()"
      case IntegerType => s"((java.lang.Integer) $res).intValue()"
      case LongType => s"((java.lang.Long) $res).longValue()"
      case BooleanType => s"((java.lang.Boolean) $res).booleanValue()"
      case FloatType => s"((java.lang.Float) $res).floatValue()"
      case _ => s"($javaType) $res"
    }
    ev.copy(code = code"""
      |boolean ${ev.isNull} = false;
      |$javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      |java.lang.Object[] $args = new java.lang.Object[${children.length}];
      |$setArgs
      |if (!${ev.isNull}) {
      |  java.lang.Object $res = ((scala.Function1) $fnRef).apply($args);
      |  if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $unboxed; }
      |}""".stripMargin)
  }

  override def prettyName: String = fn
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object FnExpr {
  private def allDoubles(s: StructType): Boolean = s.fields.forall(_.dataType == DoubleType)

  /** The reference's columnar geometry encodings (types.cpp:51-62):
   *  POINT_2D/3D/4D = struct of 2-4 doubles, LINESTRING_2D = array of point
   *  structs, POLYGON_2D = array of rings. */
  def isGeomStruct(dt: DataType): Boolean = dt match {
    case s: StructType => s.length >= 2 && s.length <= 4 && allDoubles(s)
    case ArrayType(s: StructType, _) => s.length == 2 && allDoubles(s)
    case ArrayType(ArrayType(s: StructType, _), _) => s.length == 2 && allDoubles(s)
    case _ => false
  }

  /** dataType-directed conversion of a columnar geometry value → WKB bytes
   *  (resolved once per plan, so per-row work is just the coordinate copy). */
  def structConverter(dt: DataType): Any => Any = {
    import graft.geom.{Geo, Wkb}
    import org.locationtech.jts.geom.{Coordinate, CoordinateXYM, CoordinateXYZM}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.ArrayData
    dt match {
      case s: StructType =>
        val n = s.length
        // POINT_3D with a field literally named m is XYM (dimensional_cast.cpp)
        val thirdIsM = n == 3 && s.fieldNames(2).equalsIgnoreCase("m")
        // BOX_2D (min_x, min_y, max_x, max_y) converts to its envelope
        // polygon, not an XYZM point (the reference's BOX_2D→GEOMETRY cast)
        val isBox = n == 4 && s.fieldNames(0).equalsIgnoreCase("min_x") &&
          s.fieldNames(1).equalsIgnoreCase("min_y") &&
          s.fieldNames(2).equalsIgnoreCase("max_x") &&
          s.fieldNames(3).equalsIgnoreCase("max_y")
        (v: Any) => v match {
          case r: InternalRow =>
            val x = r.getDouble(0); val y = r.getDouble(1)
            if (isBox) Wkb.write(Geo.box(x, y, r.getDouble(2), r.getDouble(3)))
            else {
              val c: Coordinate =
                if (n == 2) new Coordinate(x, y)
                else if (n == 4) new CoordinateXYZM(x, y, r.getDouble(2), r.getDouble(3))
                else if (thirdIsM) new CoordinateXYM(x, y, r.getDouble(2))
                else new Coordinate(x, y, r.getDouble(2))
              Wkb.write(Geo.factory.createPoint(c))
            }
          case other => other
        }
      case ArrayType(_: StructType, _) =>
        (v: Any) => v match {
          case ad: ArrayData =>
            val cs = Array.tabulate(ad.numElements()) { i =>
              val r = ad.getStruct(i, 2); new Coordinate(r.getDouble(0), r.getDouble(1))
            }
            Wkb.write(Geo.factory.createLineString(cs))
          case other => other
        }
      case ArrayType(ArrayType(_, _), _) =>
        (v: Any) => v match {
          case ad: ArrayData =>
            def ring(rd: ArrayData): org.locationtech.jts.geom.LinearRing = {
              val cs = Array.tabulate(rd.numElements()) { j =>
                val r = rd.getStruct(j, 2); new Coordinate(r.getDouble(0), r.getDouble(1))
              }
              val closed =
                if (cs.length >= 3 && !cs.head.equals2D(cs.last)) cs :+ cs.head.copy() else cs
              Geo.factory.createLinearRing(closed)
            }
            val rings = Array.tabulate(ad.numElements())(i => ring(ad.getArray(i)))
            Wkb.write(
              if (rings.isEmpty) Geo.factory.createPolygon()
              else Geo.factory.createPolygon(rings.head, rings.tail))
          case other => other
        }
      case _ => identity
    }
  }
}
