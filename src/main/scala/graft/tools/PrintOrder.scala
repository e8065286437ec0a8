package graft.tools
/** Debug: print the seeded bench execution order (Bench.scala's shuffle). */
object PrintOrder extends App {
  val seed = args.headOption.map(_.toLong).getOrElse(42L)
  val ordered = new scala.util.Random(seed)
    .shuffle(graft.SparkEntry.queries.toSeq.sortBy(_._1)).map(_._1)
  ordered.zipWithIndex.foreach { case (n, i) => println(f"ORD $i%3d $n") }
}
