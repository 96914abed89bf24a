package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical surface audit: every `### ST_*` heading in the reference's
 *  own function documentation (/root/reference/docs/functions.md) must
 *  resolve to a registered implementation — a scalar/aggregate builder or a
 *  table-valued function. This pins the SURVEY §2 "complete surface" claim
 *  as a test instead of a per-round manual sweep. */
class DocsCoverageSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val docs = "/root/reference/docs/functions.md"

  test("every documented reference function name resolves in the registry") {
    assume(new java.io.File(docs).exists())
    val names = scala.io.Source.fromFile(docs)(scala.io.Codec.ISO8859).getLines()
      .collect { case l if l.startsWith("### ") => l.stripPrefix("### ").trim.toLowerCase }
      .filter(_.nonEmpty).toSet
    assert(names.size >= 100, s"docs parse looks wrong: ${names.size} names")

    Graft.register(spark)
    val scalarsAndAggs = Graft.builders.map(_._1).toSet
    val reg = spark.sessionState.functionRegistry
    val tfr = spark.sessionState.tableFunctionRegistry
    def resolvable(n: String): Boolean = {
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(n)
      scalarsAndAggs.contains(n) ||
        reg.functionExists(id) || tfr.functionExists(id)
    }
    val missing = names.filterNot(resolvable).toSeq.sorted
    assert(missing.isEmpty, s"documented but unregistered: ${missing.mkString(", ")}")
    info(s"${names.size} documented names, all resolvable " +
      s"(${scalarsAndAggs.size} registered builders total)")
  }
}
