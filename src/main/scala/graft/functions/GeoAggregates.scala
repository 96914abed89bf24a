package graft.functions

import graft.geom.{Geo, Wkb}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.union.UnaryUnionOp
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/**
 * Spatial aggregates (reference: st_extent_agg.cpp:14-123 and
 * geos/functions/aggregate.cpp:34-215). All are TypedImperativeAggregates with
 * real merge, so Spark's partial aggregation (map-side combine) applies — at
 * 100 TB the shuffle carries one small state per partition per group, not rows.
 */
object GeoAggregates {

  /** ST_Extent_Agg / ST_Envelope_Agg — min/max bbox merge; finalize → bbox
   *  polygon. State is 4 doubles, the cheapest possible shuffle payload. */
  case class StExtentAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): Array[Double] =
      Array(Double.PositiveInfinity, Double.PositiveInfinity, Double.NegativeInfinity, Double.NegativeInfinity)

    override def update(b: Array[Double], input: InternalRow): Array[Double] = {
      val v = child.eval(input)
      if (v != null) {
        // envelope straight off the WKB bytes (no JTS parse); fall back to
        // the reader for bytes the scanner doesn't recognize
        val bytes = v.asInstanceOf[Array[Byte]]
        val e =
          try Wkb.envelope(bytes)
          catch {
            case _: Exception =>
              val g = Geo.read(bytes)
              if (g.isEmpty) null
              else {
                val je = g.getEnvelopeInternal
                Array(je.getMinX, je.getMinY, je.getMaxX, je.getMaxY)
              }
          }
        if (e != null) {
          if (e(0) < b(0)) b(0) = e(0)
          if (e(1) < b(1)) b(1) = e(1)
          if (e(2) > b(2)) b(2) = e(2)
          if (e(3) > b(3)) b(3) = e(3)
        }
      }
      b
    }

    override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
      if (o(0) < b(0)) b(0) = o(0)
      if (o(1) < b(1)) b(1) = o(1)
      if (o(2) > b(2)) b(2) = o(2)
      if (o(3) > b(3)) b(3) = o(3)
      b
    }

    override def eval(b: Array[Double]): Any =
      if (b(0).isInfinite) null else Wkb.write(Geo.box(b(0), b(1), b(2), b(3)))

    override def serialize(b: Array[Double]): Array[Byte] = {
      val buf = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      b.foreach(buf.putDouble)
      buf.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Double] = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      Array.fill(4)(buf.getDouble())
    }

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def withNewMutableAggBufferOffset(o: Int): StExtentAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): StExtentAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): StExtentAgg = copy(child = newChild)
    override def prettyName: String = "st_extent_agg"
  }

  private def serializeGeoms(gs: Seq[Geometry]): Array[Byte] = {
    val blobs = gs.map(Wkb.write)
    val buf = ByteBuffer.allocate(4 + blobs.map(_.length + 4).sum).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(blobs.length)
    blobs.foreach { b => buf.putInt(b.length); buf.put(b) }
    buf.array()
  }
  private def deserializeGeoms(bytes: Array[Byte]): ArrayBuffer[Geometry] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt()
    val out = new ArrayBuffer[Geometry](n)
    var i = 0
    while (i < n) {
      val len = buf.getInt()
      val b = new Array[Byte](len)
      buf.get(b)
      out += Geo.read(b)
      i += 1
    }
    out
  }

  /** ST_Union_Agg — buffers geometries and cascades the union (JTS
   *  UnaryUnionOp) every `collapseAt` inputs, mirroring the reference's
   *  GEOSUnion cascade (geos/functions/aggregate.cpp:106-172). */
  case class StUnionAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[ArrayBuffer[Geometry]] with UnaryLike[Expression] {

    private val collapseAt = 64

    override def createAggregationBuffer(): ArrayBuffer[Geometry] = new ArrayBuffer[Geometry]()

    private def collapse(b: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
      if (b.length > 1) {
        val u = UnaryUnionOp.union(scala.jdk.CollectionConverters.SeqHasAsJava(b.toSeq).asJava)
        b.clear()
        b += u
      }
      b
    }

    override def update(b: ArrayBuffer[Geometry], input: InternalRow): ArrayBuffer[Geometry] = {
      val v = child.eval(input)
      if (v != null) {
        b += Geo.read(v.asInstanceOf[Array[Byte]])
        if (b.length >= collapseAt) collapse(b)
      }
      b
    }

    override def merge(b: ArrayBuffer[Geometry], o: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
      b ++= o
      if (b.length >= collapseAt) collapse(b)
      b
    }

    override def eval(b: ArrayBuffer[Geometry]): Any =
      if (b.isEmpty) null else Wkb.write(collapse(b).head)

    override def serialize(b: ArrayBuffer[Geometry]): Array[Byte] = serializeGeoms(collapse(b).toSeq)
    override def deserialize(bytes: Array[Byte]): ArrayBuffer[Geometry] = deserializeGeoms(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def withNewMutableAggBufferOffset(o: Int): StUnionAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): StUnionAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): StUnionAgg = copy(child = newChild)
    override def prettyName: String = "st_union_agg"
  }

  /** ST_Intersection_Agg — running pairwise intersection (associative, so
   *  partial merge is just another intersection). */
  case class StIntersectionAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[ArrayBuffer[Geometry]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): ArrayBuffer[Geometry] = new ArrayBuffer[Geometry](1)

    private def add(b: ArrayBuffer[Geometry], g: Geometry): ArrayBuffer[Geometry] = {
      if (b.isEmpty) b += g
      else b(0) = b(0).intersection(g)
      b
    }

    override def update(b: ArrayBuffer[Geometry], input: InternalRow): ArrayBuffer[Geometry] = {
      val v = child.eval(input)
      if (v != null) add(b, Geo.read(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def merge(b: ArrayBuffer[Geometry], o: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
      if (o.nonEmpty) add(b, o(0))
      b
    }
    override def eval(b: ArrayBuffer[Geometry]): Any =
      if (b.isEmpty) null else Wkb.write(b(0))

    override def serialize(b: ArrayBuffer[Geometry]): Array[Byte] = serializeGeoms(b.toSeq)
    override def deserialize(bytes: Array[Byte]): ArrayBuffer[Geometry] = deserializeGeoms(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def withNewMutableAggBufferOffset(o: Int): StIntersectionAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): StIntersectionAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): StIntersectionAgg = copy(child = newChild)
    override def prettyName: String = "st_intersection_agg"
  }

  /** ST_Collect_Agg — gathers inputs into a MULTI-x/GEOMETRYCOLLECTION (the
   *  aggregate companion of scalar ST_Collect; skips empties like st_collect.cpp). */
  case class StCollectAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[ArrayBuffer[Geometry]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): ArrayBuffer[Geometry] = new ArrayBuffer[Geometry]()

    override def update(b: ArrayBuffer[Geometry], input: InternalRow): ArrayBuffer[Geometry] = {
      val v = child.eval(input)
      if (v != null) {
        val g = Geo.read(v.asInstanceOf[Array[Byte]])
        if (!g.isEmpty) b += g
      }
      b
    }
    override def merge(b: ArrayBuffer[Geometry], o: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = { b ++= o; b }

    override def eval(b: ArrayBuffer[Geometry]): Any = {
      val f = Geo.factory
      if (b.isEmpty) Wkb.write(f.createGeometryCollection())
      else if (b.forall(_.isInstanceOf[org.locationtech.jts.geom.Point]))
        Wkb.write(f.createMultiPoint(b.map(_.asInstanceOf[org.locationtech.jts.geom.Point]).toArray))
      else if (b.forall(_.isInstanceOf[org.locationtech.jts.geom.LineString]))
        Wkb.write(f.createMultiLineString(b.map(_.asInstanceOf[org.locationtech.jts.geom.LineString]).toArray))
      else if (b.forall(_.isInstanceOf[org.locationtech.jts.geom.Polygon]))
        Wkb.write(f.createMultiPolygon(b.map(_.asInstanceOf[org.locationtech.jts.geom.Polygon]).toArray))
      else Wkb.write(f.createGeometryCollection(b.toArray))
    }

    override def serialize(b: ArrayBuffer[Geometry]): Array[Byte] = serializeGeoms(b.toSeq)
    override def deserialize(bytes: Array[Byte]): ArrayBuffer[Geometry] = deserializeGeoms(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): StCollectAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): StCollectAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): StCollectAgg = copy(child = newChild)
    override def prettyName: String = "st_collect_agg"
  }
}
