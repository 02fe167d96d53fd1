package graft

import java.math.{BigDecimal => JBigDecimal}
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
import org.scalatest.funsuite.AnyFunSuite

/** Every encoder graft hands to Spark must survive CODEGEN_ONLY.
  *
  * Why this gate exists: encoder (de)serializers are built through
  * `CodeGeneratorWithInterpretedFallback` — when Janino can't compile the
  * generated projection (e.g. a `private` case class whose constructor the
  * generated code can't resolve), Spark logs one line and silently runs the
  * INTERPRETED path forever. On a `transformWithState`/`flatMapGroupsWithState`
  * hot path that's a per-row interpreted state (de)serialization plus a
  * compile-and-fail per codegen-cache miss — invisible at sf0.01, exactly
  * the kind of cost a 100× scale-up exposes. Round 5 shipped one such
  * fallback (`RunningTotals.Tot` was `private`); this suite turns any
  * recurrence from a log line into a test failure by setting
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` (no fallback allowed) and
  * round-tripping every case class graft uses as a Dataset element, a
  * `flatMapGroupsWithState`/`transformWithState` state type, or a
  * mapPartitions batch row.
  */
class EncoderCodegenSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  private def withCodegenOnly[A](f: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try f
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  /** Serializer AND deserializer compiled (not fallen back), then value
    * round-tripped exactly. `createSerializer`/`createDeserializer` go
    * through `UnsafeProjection.create`/`SafeProjection.create`, the exact
    * factories the streaming state stores use — under CODEGEN_ONLY a Janino
    * failure throws instead of degrading.
    */
  private def roundTrip[T](enc: Encoder[T], v: T): Unit = withCodegenOnly {
    val ee = ExpressionEncoder(enc.asInstanceOf[AgnosticEncoder[T]]).resolveAndBind()
    val ser = ee.createSerializer()
    val de = ee.createDeserializer()
    val back = de(ser(v).copy())
    (v, back) match {
      // Array fields compare by reference under ==; compare contents
      case (a: multimodal.MediaRow, b: multimodal.MediaRow) =>
        assert(a.copy(payload = null) == b.copy(payload = null) &&
          java.util.Arrays.equals(a.payload, b.payload))
      // the encoder legitimately rescales decimals to the schema's (38,18);
      // value equality (compareTo), not scale equality, is the contract
      case (a: model.EodPrice, b: model.EodPrice) =>
        def eq(x: JBigDecimal, y: JBigDecimal) = x.compareTo(y) == 0
        assert(a.trade_date == b.trade_date && a.symbol == b.symbol &&
          a.load_ts == b.load_ts && eq(a.open, b.open) && eq(a.high, b.high) &&
          eq(a.low, b.low) && eq(a.close, b.close) && eq(a.volume, b.volume))
      case _ => assert(back == v, s"round trip changed value: $v -> $back")
    }
  }

  test("streaming state + output encoders compile under CODEGEN_ONLY") {
    import streaming._
    roundTrip(Encoders.product[RunningTotals.In], RunningTotals.In("view", 7L))
    roundTrip(Encoders.product[RunningTotals.Out], RunningTotals.Out("view", 2L, 9L))
    roundTrip(Encoders.product[RunningTotals.Tot], RunningTotals.Tot(3L, 12L))
    roundTrip(Encoders.product[Cep.CepEvent], Cep.CepEvent(1L, 10L, "view"))
    roundTrip(Encoders.product[Cep.CepState], Cep.CepState(1L, 2L, 3L, 4L, 1))
    roundTrip(Encoders.product[Cep.CepMatch], Cep.CepMatch(1L, 2L, 3L, 4L))
    roundTrip(Encoders.product[Sessionize.SessionEvent], Sessionize.SessionEvent(1L, 5L))
    roundTrip(Encoders.product[Sessionize.SessionState], Sessionize.SessionState(1L, 2L, 3L))
    roundTrip(Encoders.product[Sessionize.SessionOut],
      Sessionize.SessionOut(1L, 0, 3L, 10L, 20L))
    roundTrip(Encoders.product[(List[Sessionize.SessionState], Int)],
      (List(Sessionize.SessionState(1L, 2L, 3L)), 1))
    roundTrip(Encoders.product[StreamingSketch.KmvEstimate],
      StreamingSketch.KmvEstimate("k", 4, 12.5))
  }

  test("multimodal + model + source encoders compile under CODEGEN_ONLY") {
    import multimodal._
    roundTrip(Encoders.product[MediaRow],
      MediaRow(1L, "image", Array[Byte](1, 2, 3), 4, 5))
    roundTrip(Encoders.product[MediaFeatures],
      MediaFeatures(1L, "image", 3, "abc", 4, 5))
    roundTrip(Encoders.product[ImageFeatures],
      ImageFeatures(1L, "png", 2, 2, 4L, 10L, 20L, 30L))
    roundTrip(Encoders.product[AudioFeatures],
      AudioFeatures(1L, 8000, 1, 16, 100L, 5L, -3, 7))
    roundTrip(Encoders.product[model.EodPrice],
      model.EodPrice(Date.valueOf("2024-01-15"), "AAPL",
        new JBigDecimal("1.000001"), new JBigDecimal("2.000001"),
        new JBigDecimal("0.500000"), new JBigDecimal("1.500000"),
        new JBigDecimal("1000"), Timestamp.valueOf("2024-01-15 00:00:00")))
    roundTrip(Encoders.product[queries.EventRow],
      queries.EventRow(1L, Timestamp.valueOf("2024-01-15 00:00:00"),
        2L, "view", 1.5, "{}"))
  }

  test("q188 transformWithState pipeline runs end-to-end under CODEGEN_ONLY") {
    // The executor-side proof: SQLExecution propagates the session's SQL
    // confs into task threads, so with CODEGEN_ONLY active the state-store
    // encoder projections inside transformWithState tasks must compile or
    // the streaming query (and this test) fails. This is the path round 5's
    // fallback actually hid on.
    import spark.implicits._
    import streaming.RunningTotals
    withCodegenOnly {
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = spark.conf.get(provKey)
      spark.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val dir = TestSpark.tmpDir("enc-cg")
      try {
        Seq(RunningTotals.In("view", 1L), RunningTotals.In("view", 2L),
          RunningTotals.In("click", 5L))
          .toDS().write.parquet(s"$dir/in/f1")
        val src = spark.readStream
          .schema("etype STRING, eventId BIGINT")
          .parquet(s"$dir/in/*")
          .as[RunningTotals.In]
        val q = RunningTotals.totals(src)
          .writeStream.format("parquet")
          .option("path", s"$dir/out")
          .option("checkpointLocation", s"$dir/cp")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val out = spark.read.parquet(s"$dir/out").as[RunningTotals.Out]
          .collect().sortBy(_.etype)
        assert(out.toSeq == Seq(RunningTotals.Out("click", 1L, 5L),
          RunningTotals.Out("view", 2L, 3L)))
      } finally spark.conf.set(provKey, prevProv)
    }
  }
}
