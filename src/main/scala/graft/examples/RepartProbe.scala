package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 15): which reuse-barrier shapes survive physical
  * planning when the child is ALREADY hash-partitioned on the same key
  * with the same partition count (the keyed narrow-scan fan-out shape)?
  * EnsureRequirements removes user repartitions whose distribution the
  * child satisfies; this prints the physical plan for each candidate so
  * the multi-consumer barrier can be built from a shape that is kept.
  */
object RepartProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fanned = docs.repartition(32, col("doc_id"))
    val perDoc = fanned
      .select(col("doc_id"), explode(split(col("text"), " ")).as("_t"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("_dl"))

    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val phys = df.queryExecution.executedPlan.toString
      val nEx = "(?m)^\\s*[+:]?[- ]*Exchange".r.findAllIn(phys).size
      println(s"== $name: exchanges(initial-physical)=$nEx")
      println(phys.linesIterator.take(14).mkString("\n"))
    }

    show("baseline (no barrier)", perDoc)
    show("repartition(32, doc_id)", perDoc.repartition(32, col("doc_id")))
    show("repartition(doc_id)", perDoc.repartition(col("doc_id")))
    show("repartition(16, doc_id)", perDoc.repartition(16, col("doc_id")))
    show("repartition(32) round-robin", perDoc.repartition(32))
    spark.stop()
  }
}
