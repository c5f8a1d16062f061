package graft

import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkFunSuite {

  test("all graft_* functions are callable from SQL") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    Seq((1L, "the quick brown fox jumps over the dog", 0.9),
      (2L, "another document entirely", 0.7))
      .toDF("id", "text", "score").createOrReplaceTempView("gf_t")

    val row = s.sql(
      """SELECT
        |  graft_top_k(score, id, 1) AS topk,
        |  graft_minhash_sig(graft_word_shingle_hashes(lower(text), 3), 8) AS mh,
        |  graft_simhash64(graft_word_shingle_hashes(lower(text), 3)) AS sh,
        |  graft_char_ngram_hashes(lower(text), 5) AS cg,
        |  graft_jaccard_sorted(graft_word_shingle_hashes(lower(text), 3),
        |                       graft_word_shingle_hashes(lower(text), 3)) AS jac
        |FROM gf_t GROUP BY text, score, id""".stripMargin).collect()
    assert(row.length == 2)
    row.foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("mh")).length == 8)
      assert(r.getAs[Double]("jac") == 1.0)
    }

    // round-6 kernels: dup-ngram coverage, CountMin grid, sign projection
    val r6 = s.sql(
      """SELECT
        |  graft_dup_ngram_coverage(text, 2) AS cov,
        |  graft_sign_project(array(CAST(1.0 AS FLOAT),
        |    CAST(-2.0 AS FLOAT)), 4) AS sp,
        |  graft_sign_project(array(CAST(1.0 AS FLOAT),
        |    CAST(-2.0 AS FLOAT)), 4, 7) AS sp7
        |FROM gf_t""".stripMargin).collect()
    r6.foreach { r =>
      assert(r.getSeq[Double](r.fieldIndex("sp")).length == 4)
      assert(r.getSeq[Double](1) != r.getSeq[Double](2),
        "seed argument must reach the kernel")
    }
    val cms = s.sql(
      """SELECT graft_cms_agg(array(CAST(1 AS BIGINT), CAST(3 AS BIGINT)),
        |  2, 8) AS grid FROM gf_t""".stripMargin).collect().head
    assert(cms.getSeq[Long](0).length == 16, "depth x width grid")

    // round-7 media header parsers (Column compositions expanded into the
    // SQL expression tree): sniff a GIF and read its dimensions
    val media = s.sql(
      """SELECT
        |  graft_sniff_kind(encode('GIF89a', 'utf-8')) AS kind,
        |  graft_media_dims(concat(encode('GIF89a', 'utf-8'),
        |    unhex('40010A00000000'))).width AS w,
        |  graft_wav_meta(encode('nope', 'utf-8')) AS not_wav,
        |  graft_flac_meta(encode('nope', 'utf-8')) AS not_flac
        |FROM gf_t LIMIT 1""".stripMargin).collect().head
    assert(media.getString(0) == "gif")
    assert(media.getLong(1) == 320L)
    assert(media.isNullAt(2) && media.isNullAt(3))

    // round-14 wikitext cleaner (a Column composition expanded into
    // the SQL expression tree)
    val wiki = s.sql(
      """SELECT graft_wikitext_strip(
        |  "'''Bold''' [[a|link]] {{tmpl|x}} end") AS clean
        |FROM gf_t LIMIT 1""".stripMargin).collect().head
    assert(wiki.getString(0) == "Bold link end")

    // round-14 zstd codec pair: compress really shrinks a repetitive
    // payload, and the decompress hop is byte-lossless
    val z = s.sql(
      """SELECT
        |  decode(graft_zstd_decompress(graft_zstd_compress(
        |    encode(repeat('compress me. ', 500), 'utf-8'))),
        |    'utf-8') AS rt,
        |  octet_length(graft_zstd_compress(
        |    encode(repeat('compress me. ', 500), 'utf-8'))) AS clen,
        |  graft_zstd_decompress(encode('not zstd', 'utf-8')) AS bad
        |FROM gf_t LIMIT 1""".stripMargin).collect().head
    assert(z.getString(0) == "compress me. " * 500)
    assert(z.getInt(1) < 200, s"6500 bytes should shrink, got " +
      s"${z.getInt(1)}")
    assert(z.isNullAt(2))
  }

  test("graft_top_k coerces int scores/ids at analysis time " +
      "(ImplicitCastInputTypes)") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    Seq((1, 10), (5, 20), (3, 30)).toDF("sc", "id")
      .createOrReplaceTempView("gf_int")
    // int score + int id: previously ClassCastException inside update()
    val top = s.sql("SELECT graft_top_k(sc, id, 2) FROM gf_int")
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((5.0, 20L), (3.0, 30L)))
  }

  test("graft_to_avro / graft_from_avro round-trip from SQL") {
    val s = spark
    GraftFunctions.register(s)
    val schema = graft.avro.Fixtures.FullNameSchemaJson.replace("\"", "\\\"")
    val got = s.sql(
      s"""SELECT graft_from_avro(
         |  concat(X'0000000001',
         |    graft_to_avro(named_struct('first', 'a', 'last', 'b'),
         |      "$schema")),
         |  "$schema", 1).first AS f""".stripMargin).head.getString(0)
    assert(got == "a")
  }

  test("graft_from_avro 4-arg form applies reader-schema evolution " +
      "from SQL") {
    val s = spark
    GraftFunctions.register(s)
    val writer = graft.avro.Fixtures.FullNameSchemaJson.replace("\"", "\\\"")
    // reader: drop `last`, rename `first`→`fname` via alias, add
    // `lang` with a default
    val reader =
      ("""{"type":"record","name":"FullName","namespace":"com.ing.eventbus""" +
        """.connect.schema.converters","fields":[{"name":"fname","type":""" +
        """"string","aliases":["first"]},{"name":"lang","type":"string",""" +
        """"default":"en"}]}""").replace("\"", "\\\"")
    val got = s.sql(
      s"""SELECT e.fname, e.lang FROM (SELECT graft_from_avro(
         |  concat(X'0000000001',
         |    graft_to_avro(named_struct('first', 'ada', 'last', 'l'),
         |      "$writer")),
         |  "$writer", 1, "$reader") AS e)""".stripMargin).head
    assert(got.getString(0) == "ada" && got.getString(1) == "en")
  }

  test("graft_hyperplane_sig from SQL over array<float>") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    Seq((1L, Array(0.5f, -0.25f, 1.0f))).toDF("id", "v")
      .createOrReplaceTempView("gf_v")
    val sig = s.sql("SELECT graft_hyperplane_sig(v, 16, 42) FROM gf_v")
      .head.getLong(0)
    val again = s.sql("SELECT graft_hyperplane_sig(v, 16, 42) FROM gf_v")
      .head.getLong(0)
    assert(sig == again)
  }

  test("graft_nearest_centroids from SQL with literal centroid arrays") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    Seq((0L, Array(0.0f, 0.0f)), (1L, Array(9.0f, 9.0f)),
      (2L, Array(10.0f, 10.0f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("gf_vecs")
    val out = s.sql(
      """SELECT vec_id, graft_nearest_centroids(embedding,
        |  array(100L, 200L),
        |  array(array(0.0D, 0.0D), array(10.0D, 10.0D)), 2) AS cells
        |FROM gf_vecs ORDER BY vec_id""".stripMargin).collect()
      .map(r => r.getSeq[Long](1).toSeq)
    assert(out(0) == Seq(100L, 200L)) // nearest origin first
    assert(out(1) == Seq(200L, 100L)) // (9,9) closer to (10,10)
    assert(out(2) == Seq(200L, 100L))
  }
}
