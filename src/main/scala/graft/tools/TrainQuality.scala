package graft.tools

import graft.GraftSession
import graft.functions.TextFns
import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** One-off artifact trainer: distill the heuristic quality score into
  * the hashed-feature logistic model and print the frozen constants
  * (see [[graft.queries.TextPipeline]]'s frozen model scaladoc).
  */
object TrainQuality {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val docs = graft.Tables.documents(spark, args(0))
    val scored = docs.select(col("doc_id"), col("text"),
      TextFns.qualityScore(col("text")).as("q"))
    val qMed = scored.stat.approxQuantile("q", Array(0.5), 0.0).head
    println(s"quality median: $qMed")
    val labeled = scored.select(col("doc_id"), col("text"),
      (col("q") >= qMed).as("label"))
    println("label balance: " +
      labeled.groupBy("label").count().collect().mkString(", "))
    val (w, b) = QualityClassifier.train(labeled, col("text"), col("label"),
      d = 64, iters = args.lift(1).map(_.toInt).getOrElse(120), lr = 1.0)
    // shortest-round-trip doubles: parse back to identical bits anywhere
    // matches FrozenQualityModel's member declarations verbatim
    println("    val W: Array[Double] = Array(")
    println(w.grouped(4).map(g => "      " + g.mkString(", ")).mkString(",\n") + ")")
    println(s"    val B: Double = $b")
    // in-sample sanity
    val acc = labeled.select(
      avg(((QualityClassifier.score(TextFns.tokens(col("text")), w, b) >= 0.5)
        === col("label")).cast("double")).as("acc")).head.getDouble(0)
    println(s"in-sample accuracy: $acc")
    spark.stop()
  }
}
