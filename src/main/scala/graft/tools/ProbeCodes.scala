package graft.tools

/** Dev diagnostic: resolve CRS codes against the registry from the command
  * line (tools/run_main.sh graft.tools.ProbeCodes EPSG:3460 ...). */
object ProbeCodes {
  def main(args: Array[String]): Unit = {
    if (args.sameElements(Array("--count"))) {
      val all = graft.geom.Proj.allCodes
      println(s"resolvable codes: ${all.size}")
    } else for (c <- args)
      println(s"$c -> ${graft.geom.Proj.lookup(c).map(_.name).getOrElse("MISSING")}")
  }
}
