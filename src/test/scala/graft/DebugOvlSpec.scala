package graft
import graft.geom.Geo
import org.scalatest.funsuite.AnyFunSuite

class DebugOvlSpec extends AnyFunSuite {
  val f = Geo.factory
  def rect(x0:Double,y0:Double,x1:Double,y1:Double) = Geo.box(x0,y0,x1,y1)
  test("print JTS overlay outputs") {
    val cases = Seq(
      ("union cross", rect(0,0,4,2), rect(1,0,2,3), "u"),
      ("union corner", rect(0,0,2,2), rect(1,1,3,3), "u"),
      ("inter corner", rect(0,0,2,2), rect(1,1,3,3), "i"),
      ("diff corner", rect(0,0,2,2), rect(1,1,3,3), "d"),
      ("diff slab", rect(0,0,6,6), rect(2,-1,4,7), "d"),
      ("diff hole", rect(0,0,6,6), rect(2,2,4,4), "d"),
      ("inter contained", rect(0,0,6,6), rect(2,2,4,4), "i"),
      ("union contained", rect(0,0,6,6), rect(2,2,4,4), "u"))
    cases.foreach { case (name, a, b, op) =>
      val r = op match { case "u" => a.union(b) case "i" => a.intersection(b) case "d" => a.difference(b) }
      println(s"== $name: ${r.toText}")
    }
  }
}
