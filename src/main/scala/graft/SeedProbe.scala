package graft
object SeedProbe {
  def main(args: Array[String]): Unit = {
    Fuzz.corpus(310L, 200).zipWithIndex.foreach { case (q, i) =>
      if (Set("spgemm", "graph_iter", "hybrid_skew").contains(q.template))
        println(s"${q.name} ${q.template}")
    }
  }
}
