package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.Encoders

/** The typed (Models) and untyped (Schemas) surfaces must agree on
  * field names and order — reading a store table `.as[T]` depends on
  * it.
  */
class ModelsSpec extends SparkSpec {

  private def names[T](e: org.apache.spark.sql.Encoder[T]) = e.schema.fieldNames.toSeq

  test("case-class encoders align with the declared StructTypes") {
    assert(names(Encoders.product[Models.BlockCheck]) == Schemas.blockCheck.fieldNames.toSeq)
    assert(names(Encoders.product[Models.HolderRaw]) == Schemas.holdersRaw.fieldNames.toSeq)
    assert(names(Encoders.product[Models.Top100Row]) == Schemas.refinedWalletTop100.fieldNames.toSeq)
    assert(names(Encoders.product[Models.WalletTransaction]) == Schemas.walletTransactions.fieldNames.toSeq)
    assert(names(Encoders.product[Models.IngestionCursor]) == Schemas.ingestionCursors.fieldNames.toSeq)
    assert(names(Encoders.product[Models.JobRun]) == Schemas.jobRuns.fieldNames.toSeq)
  }

  test("a store round-trip reads back as the typed Dataset") {
    val ss = spark; import ss.implicits._
    val store = new MerlStore(spark,
      java.nio.file.Files.createTempDirectory("models_rt").toString)
    store.jobStart("typed")
    val jobs = store.read("job_runs").as[Models.JobRun].collect()
    assert(jobs.length == 1 && jobs.head.job_name == "typed"
      && jobs.head.status == "running")
  }
}
