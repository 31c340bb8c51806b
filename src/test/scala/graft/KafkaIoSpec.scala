package graft

import graft.sources.KafkaIo
import graft.streaming.Pipelines
import org.apache.spark.sql.functions._

/** The broker-independent half of the Kafka layer: envelope parsing, dirty
  * split, 3-way log split, CDC normalization, dynamic-topic shaping. The
  * `format("kafka")` builders themselves need the connector jar + a broker
  * (absent here) and are exercised only up to options construction.
  */
class KafkaIoSpec extends SparkSpec {
  import spark.implicits._

  private val startLine =
    """{"common":{"uid":"7","mid":"m1","is_new":"1"},
       "start":{"entry":"icon","loading_time":1500},"ts":1608861278000}"""
      .replaceAll("\n\\s*", "")
  private val pageLine =
    """{"common":{"uid":"8","mid":"m2","is_new":"0"},
       "page":{"page_id":"home","last_page_id":null,"during_time":4500},
       "displays":[{"item":"9","item_type":"sku_id","order":1},
                   {"item":"10","item_type":"sku_id","order":2}],"ts":1608861279000}"""
      .replaceAll("\n\\s*", "")
  private val dirtyLine = "not json {"

  /** raw frame shaped like KafkaIo.source output. */
  private def raw(lines: String*) =
    lines.zipWithIndex
      .map { case (v, i) => (null.asInstanceOf[String], v, "t", 0, i.toLong, new java.sql.Timestamp(0L)) }
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")

  test("log envelope: parse + dirty split mirrors BaseLogApp side-output") {
    val parsed = KafkaIo.parseJson(raw(startLine, pageLine, dirtyLine), KafkaIo.logEnvelopeSchema)
    val (clean, dirty) = KafkaIo.splitDirty(parsed, "ts")
    assert(clean.count() == 2)
    assert(dirty.count() == 1)
    assert(dirty.select("value").as[String].collect().head == dirtyLine)
  }

  test("log envelope: 3-way split routes start/display/page") {
    val parsed = KafkaIo.parseJson(raw(startLine, pageLine), KafkaIo.logEnvelopeSchema)
    val (clean, _) = KafkaIo.splitDirty(parsed, "ts")
    val (start, displays, page) = KafkaIo.splitLog(clean)
    assert(start.select("start.entry").as[String].collect().toSeq == Seq("icon"))
    // display records explode per array element, keeping page context
    assert(displays.select("display.item").as[String].collect().sorted.toSeq == Seq("10", "9"))
    assert(displays.select("page_id").as[String].collect().toSet == Set("home"))
    // the page stream excludes start records
    assert(page.select("page.page_id").as[String].collect().toSeq == Seq("home"))
  }

  test("cdc envelope: normalized stream feeds routeCdcBatch unchanged") {
    val env =
      """{"database":"graft","tableName":"order_info","type":"insert",
         "before":{},"after":{"id":"1","total_amount":"10.5"}}"""
        .replaceAll("\n\\s*", "")
    val cdc = KafkaIo.cdcStream(raw(env, dirtyLine))
    assert(cdc.columns.toSeq ==
      Seq("database", "tableName", "type", "before", "after", "op_seq"))
    assert(cdc.count() == 1) // malformed line dropped exactly like the file path
    val out = java.nio.file.Files.createTempDirectory("kafkaio").toString
    val config = Seq(("order_info", "insert", "kafka", "dwd_order_info", "id,total_amount", "id"))
      .toDF("source_table", "operate_type", "sink_type", "sink_table", "sink_columns", "sink_pk")
    Pipelines.routeCdcBatch(cdc, 0L, config, out)
    val routed = spark.read.parquet(s"$out/kafka/dwd_order_info/batch=0")
    assert(routed.select("id", "total_amount").as[(String, String)].collect().toSeq ==
      Seq(("1", "10.5")))
  }

  test("dynamic-topic shaping emits (topic, value-json) rows") {
    val routed = Seq(("1", "10.5")).toDF("id", "total_amount")
    val shaped = KafkaIo.routedForKafka(routed, lit("dwd_order_info"))
    assert(shaped.columns.toSeq == Seq("topic", "value"))
    val (topic, value) = shaped.as[(String, String)].collect().head
    assert(topic == "dwd_order_info")
    assert(value.contains("\"total_amount\":\"10.5\""))
  }

  test("source/sink builders construct without a broker") {
    // plan construction must not require the connector; only start() would.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val stream = ms.toDF().select(col("value"))
    val w = KafkaIo.sink(stream, "broker:9092", "t", "/tmp/ck")
    assert(w != null)
    val d = KafkaIo.dynamicSink(stream, "broker:9092", "/tmp/ck")
    assert(d != null)
  }

  test("jsonl staging format: documents roundtrip with full value parity") {
    // the reference's ODS layer is JSON-per-record on a topic; the same
    // schema-on-read contract must hold through a JSON-lines staging dir
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() == docs.count())
    def rowHashSum(df: org.apache.spark.sql.DataFrame): Long = df
      .select(md5(to_json(struct(df.columns.sorted.map(col): _*))).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 8), 16, 10).cast("long")))
      .head.getLong(0)
    assert(rowHashSum(back) == rowHashSum(docs), "jsonl roundtrip altered values")
  }
}
