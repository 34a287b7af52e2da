package graft.streaming

import graft.SparkSpec
import graft.model.ObjectStoreSpec

/** The Kafka seam of CdcStream (S11). The container ships no broker and no
  * spark-sql-kafka artifact, so the live-wire path cannot run here; this
  * spec pins the CAPABILITY CONTRACT instead: the flag reflects the
  * classpath truthfully, and `fromKafka` fails fast with an actionable
  * message rather than returning a stream that never starts. On a
  * deployment with the kafka artifact the flag flips true and the
  * absent-case test auto-skips.
  */
class CdcStreamKafkaSpec extends SparkSpec {

  private val sink = ObjectStoreSpec(path = "/tmp/unused", database = "g",
    table = "t", keyFields = Seq("id"))

  test("kafkaAvailable reflects the classpath (no kafka-sql artifact offline)") {
    CdcStream.kafkaAvailable shouldBe
      (try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
       catch { case _: ClassNotFoundException => false })
  }

  test("fromKafka without the kafka source fails fast with a capability error") {
    assume(!CdcStream.kafkaAvailable) // auto-skips on kafka-equipped deployments
    val e = intercept[IllegalArgumentException] {
      CdcStream.fromKafka(spark, "broker:9092", "cdc\\..*", sink,
        keys = Seq("id"), checkpointDir = "/tmp/unused-ckpt")
    }
    e.getMessage should include ("spark-sql-kafka")
  }
}
