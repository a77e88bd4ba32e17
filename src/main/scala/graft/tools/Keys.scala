package graft.tools
object Keys { def main(a: Array[String]): Unit = {
  val q = graft.SparkEntry.queries.keySet
  val o = graft.SparkEntry.oracleSql.keySet
  println("queries=" + q.size + " oracles=" + o.size)
  println("noOracle=" + (q -- o).toList.sorted.mkString(","))
  println("orphanOracle=" + (o -- q).toList.sorted.mkString(","))
}}
