package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.sources.ResultExport

/** Property pin for the S11 export losslessness claim: arbitrary rows —
  * hostile strings (separators, quotes, embedded newlines, backslashes,
  * unicode), null/empty distinctions, nested arrays/maps/structs with
  * internal nulls, binary, NaN/Inf doubles — survive export → re-read →
  * type reconstruction byte-for-byte, for BOTH csv (via csvSafe +
  * the `\N` null contract) and json (schema re-read).
  */
object ResultExportRoundTripSpec {
  // top-level: Spark encoders cannot instantiate inner classes
  case class Inner(a: String, b: Long)
  case class Rec(id: Long, s: String, d: Double, arr: Seq[Long],
                 m: Map[String, Long], st: Inner, bin: Array[Byte])
}

class ResultExportRoundTripSpec extends SparkSpec {
  import spark.implicits._
  import ResultExportRoundTripSpec.{Inner, Rec}

  private val nastyChar = Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(',', '"', '\n', '\r', '\\', '|', ';', '\'', ' '),
    1 -> Gen.oneOf('é', '中', '✓'))
  private val nastyString: Gen[String] = Gen.frequency(
    8 -> Gen.listOf(nastyChar).map(_.mkString),
    1 -> Gen.const(""),
    1 -> Gen.const(null: String))
    // the documented CSV caveat: a whole-cell literal sentinel is the
    // one string the format cannot carry
    .map(s => if (s == ResultExport.CsvNullValue) s + "_" else s)

  private val genRec: Gen[Long => Rec] = for {
    s <- nastyString
    d <- Gen.oneOf(Gen.choose(-1e9, 1e9),
      Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, -0.0))
      .flatMap(identity(_))
    arr <- Gen.oneOf(
      Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)),
      Gen.const(null: List[Long]))
      .flatMap(identity(_))
    mKeys <- Gen.listOf(nastyString.suchThat(_ != null))
    mVals <- Gen.listOfN(mKeys.size, Gen.choose(-1000L, 1000L))
    stA <- nastyString
    stNull <- Gen.prob(0.2)
    bin <- Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.const(null: Array[Byte]))
      .flatMap(identity(_))
  } yield (id: Long) => Rec(id, s, d, arr,
    mKeys.zip(mVals).toMap, if (stNull) null else Inner(stA, id * 7), bin)

  private def key(r: Rec): (Long, String, String, Seq[Long], Map[String, Long],
      Option[(String, Long)], Seq[Byte]) =
    (r.id, r.s,
      // NaN != NaN and -0.0 vs 0.0: compare doubles by bit pattern
      java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(r.d)),
      Option(r.arr).orNull, r.m,
      Option(r.st).map(i => (i.a, i.b)),
      Option(r.bin).map(_.toSeq).orNull)

  private def reconstruct(raw: DataFrame): Seq[Rec] =
    raw.select(
      col("id").cast("long"),
      col("s"),
      col("d").cast("double"),
      from_json(col("arr"), ArrayType(LongType)).as("arr"),
      from_json(col("m"), MapType(StringType, LongType)).as("m"),
      from_json(col("st"), StructType(Seq(StructField("a", StringType),
        StructField("b", LongType)))).as("st"),
      unbase64(col("bin")).as("bin"))
      .as[Rec].collect().toSeq

  /** None = all three formats round-trip; Some(diagnostic) otherwise. */
  private def roundTripFailure(recs: List[Rec]): Option[String] = {
    val out = tmpDir("rt")
    val df = recs.toDS().toDF()
    ResultExport.exportResult(df, out, "r", Seq("parquet", "csv", "json"))
    val want = recs.map(key).sortBy(_._1)

    val csvBack = reconstruct(spark.read
      .option("header", "true")
      .option("nullValue", ResultExport.CsvNullValue)
      .option("multiLine", "true")
      .schema(StructType(df.schema.fields.map(f =>
        StructField(f.name, StringType, nullable = true))))
      .csv(s"$out/r.csv"))
    val jsonBack = spark.read.schema(df.schema).json(s"$out/r.json")
      .as[Rec].collect().toSeq
    val pqBack = spark.read.parquet(s"$out/r").as[Rec].collect().toSeq

    def diff(tag: String, got: Seq[Rec]): Option[String] = {
      val g = got.map(key).sortBy(_._1)
      if (g == want) None
      else Some(s"$tag mismatch:\n  want=${want.zip(g).collectFirst {
        case (w, x) if w != x => s"$w\n   got=$x" }.getOrElse("size " + (want.size, g.size))}")
    }
    diff("csv", csvBack).orElse(diff("json", jsonBack)).orElse(diff("parquet", pqBack))
  }

  private def roundTrips(recs: List[Rec]): Boolean =
    roundTripFailure(recs).isEmpty

  private def check(name: String)(prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(6)
      .withInitialSeed(Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: $res")
  }

  test("export -> re-read -> reconstruct is identity for csv/json/parquet") {
    check("export-roundtrip")(Prop.forAllNoShrink(Gen.listOfN(12, genRec)) { mks =>
      val recs = mks.zipWithIndex.map { case (mk, i) => mk(i.toLong) }
      roundTripFailure(recs) match {
        case None => true
        case Some(d) =>
          info(d); info(s"recs=$recs")
          false
      }
    })
  }

  test("fixed hostile edge rows round-trip") {
    val recs = List(
      Rec(0L, "", 0.0, Nil, Map.empty, Inner("", 0), Array.empty[Byte]),
      Rec(1L, null, Double.NaN, null, Map("" -> 1L), null, null),
      Rec(2L, "a,b\"c\r\n\\Nd", -0.0, Seq(Long.MinValue, Long.MaxValue),
        Map("k\"1" -> 1L, "k,2" -> 2L), Inner("x\ny", 9L),
        Array[Byte](0, -1, 127, -128)),
      Rec(3L, "\\\\N", Double.NegativeInfinity, Seq(0L), Map.empty,
        Inner(null, 3L), Array[Byte](1)))
    assert(roundTripFailure(recs).isEmpty, roundTripFailure(recs).getOrElse(""))
  }
}
