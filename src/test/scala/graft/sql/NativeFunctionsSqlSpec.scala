package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Every graft native expression is callable from SQL through
  * GraftExtensions — the full dedup/similarity pipeline is expressible
  * in pure SQL text, matching the Column-API results exactly.
  */
class NativeFunctionsSqlSpec extends SparkSuite {
  import spark.implicits._

  test("shingles -> minhash -> bands round-trips through SQL") {
    Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "x y z w v u t"))
      .toDF("id", "text").createOrReplaceTempView("nf_docs")
    val out = spark.sql("""
      SELECT id,
        graft_word_shingles(text, 3) AS sh,
        graft_minhash_sig(graft_word_shingles(text, 3), 64) AS sig,
        graft_band_hashes(graft_minhash_sig(graft_word_shingles(text, 3), 64), 16) AS bands
      FROM nf_docs""").collect().map(r =>
        r.getLong(0) -> (r.getSeq[String](1), r.getSeq[Long](2), r.getSeq[Long](3)))
      .toMap
    assert(out(1L) === out(2L))          // identical text, identical everything
    assert(out(1L)._2 !== out(3L)._2)    // different text, different sigs
    assert(out(1L)._3.size === 16)
    // SQL route equals the Column-API route
    val viaCol = graft.dedup.Dedup.withMinHashSignature(
        graft.dedup.Dedup.withShingles(
          Seq((1L, "a b c d e f g")).toDF("id", "text"), "text", 3), 64)
      .select("minhash_sig").as[Seq[Long]].head()
    assert(out(1L)._2 === viaCol)
  }

  test("portable md5 expressions compute in SQL and match their SQL-builtin twins") {
    Seq((1L, "a b c d e f g")).toDF("id", "text")
      .createOrReplaceTempView("nf_port")
    val r = spark.sql("""
      SELECT
        graft_portable_minhash_sig(graft_word_shingles(text, 3), 16) AS sig,
        graft_portable_band_hashes(
          graft_portable_minhash_sig(graft_word_shingles(text, 3), 16), 4) AS bands,
        graft_hashed_bucket_counts(graft_word_shingles(text, 2), 8) AS fv,
        transform(sequence(0, 15), j -> array_min(transform(
          graft_word_shingles(text, 3), x ->
            pmod(CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
                 + j * pmod(CAST(conv(substring(md5(x), 16, 15), 16, 10) AS BIGINT),
                            2147483647L),
                 2147483647L)))) AS sig_ref
      FROM nf_port""").collect().head
    // the fused loop reproduces the conv/substring/md5 HOF formulation
    // (modular arithmetic note: h1 < p, so pmod(h1 + j*pmod(h2), p)
    // equals pmod(h1 + j*h2, p))
    assert(r.getSeq[Long](0) === r.getSeq[Long](3))
    assert(r.getSeq[String](1).size === 4)
    assert(r.getSeq[String](1).forall(_.length === 32))
    val fv = r.getSeq[Long](2)
    assert(fv.size === 8 && fv.sum === 6L) // 6 bigrams from 7 tokens
  }

  test("similarity functions compute in SQL: jaccard, sig agreement, cosine") {
    val r = spark.sql("""
      SELECT
        graft_jaccard(array('a','b','c'), array('b','c','d')) AS j,
        graft_sig_agreement(array(1L,2L,3L,4L), array(1L,2L,9L,9L)) AS agree,
        graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                     array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos
      """).head()
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)    // |{b,c}| / |{a,b,c,d}|
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)    // 2 of 4 positions agree
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
  }

  test("gram stats and lsh bucket compute in SQL") {
    val r = spark.sql("""
      SELECT
        graft_gram_stats('a b a b a', 2) AS g,
        graft_lsh_bucket(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 8) AS b
      """).head()
    val g = r.getStruct(0)
    assert((g.getLong(0), g.getLong(1), g.getLong(2)) === ((4L, 2L, 2L)))
    // bucket value: 8 sign bits -> [0, 256)
    assert(r.getLong(1) >= 0L && r.getLong(1) < 256L)
    // SQL route equals the Column API
    val viaCol = Seq(Tuple1(Seq(0.5f, -0.5f))).toDF("v")
      .select(graft.functions.LshBucket.col(col("v"), 8)).as[Long].head()
    assert(r.getLong(1) === viaCol)
  }

  test("multimodal header decoders compute in SQL over binary columns") {
    Seq(
      (1L, graft.multimodal.ImageFixtures.png(12, 34, "p".getBytes)),
      (2L, graft.multimodal.AudioFixtures.wav(2, 44100, 16, 10, "a".getBytes)),
      (3L, graft.multimodal.VideoFixtures.mp4(600, 1200, 640, 480,
        audioTrack = true, trailingMoov = false, payload = "v".getBytes)),
      (4L, "not media".getBytes))
      .toDF("id", "content").createOrReplaceTempView("nf_media")
    val rows = spark.sql("""
      SELECT id,
        graft_image_dims(content) AS img,
        graft_audio_meta(content) AS aud,
        graft_video_meta(content) AS vid
      FROM nf_media ORDER BY id""").collect()
    assert(rows(0).getStruct(1).getString(0) === "png" &&
      rows(0).getStruct(1).getInt(1) === 12 &&
      rows(0).getStruct(1).getInt(2) === 34)
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3))
    assert(rows(1).getStruct(2).getString(0) === "wav" &&
      rows(1).getStruct(2).getInt(2) === 44100)
    assert(rows(2).getStruct(3).getString(0) === "mp4" &&
      rows(2).getStruct(3).getInt(3) === 640 &&
      rows(2).getStruct(3).getInt(5) === 2)
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2) && rows(3).isNullAt(3))
  }
}
