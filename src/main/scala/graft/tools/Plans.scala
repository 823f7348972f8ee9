package graft.tools

import graft.{GraftSession, Registry}

/** Dump formatted plans for headline queries (dev tool for the
  * explain-driven optimization loop).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = GraftSession.get("plans")
    Registry.all
      .filter(q => if (names.nonEmpty) names(q.name) else q.headline)
      .foreach { q =>
        println(s"\n================ ${q.name} ================")
        q.build(spark, dir).explain("formatted")
      }
    spark.stop()
  }
}
