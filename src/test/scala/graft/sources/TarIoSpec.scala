package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.multimodal.{Multimodal, PngCodec}

/** ustar wire-format roundtrips + the WebDataset sample model: block
  * alignment, checksum verification, named refusals, task-local sample
  * grouping, deterministic sharded writes, and composition with the
  * real codec boundary. */
class TarIoSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_tar_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("tar roundtrip: names, payloads, block alignment, odd sizes") {
    val entries = Seq(
      "a/0.txt" -> "hello".getBytes("UTF-8"),
      "a/0.cls" -> "7".getBytes("UTF-8"),
      "b/1.bin" -> Array.tabulate(513)(i => (i * 7).toByte), // crosses a block
      "empty.x" -> Array.empty[Byte])
    val bytes = TarIO.writeTar(entries)
    assert(bytes.length % 512 == 0)
    val back = TarIO.parseTar(bytes)
    assert(back.map(_.name) == entries.map(_._1).toVector)
    back.zip(entries).foreach { case (got, (_, want)) =>
      assert(got.bytes.toSeq == want.toSeq)
    }
  }

  test("refusals: checksum, magic, typeflags, base-256, truncation") {
    val good = TarIO.writeTar(Seq("f.txt" -> "x".getBytes("UTF-8")))

    val badSum = good.clone(); badSum(0) = 'z'.toByte
    assert(intercept[IllegalArgumentException] {
      TarIO.parseTar(badSum)
    }.getMessage.contains("checksum"))

    val badMagic = good.clone(); badMagic(257) = 'G'.toByte
    assert(intercept[IllegalArgumentException] {
      TarIO.parseTar(badMagic)
    }.getMessage.contains("magic"))

    // patches below re-checksum so the refusal under test is the one
    // that fires (the checksum check comes first in the parser)
    def rechecksum(h: Array[Byte]): Unit = {
      var sum = 0L
      (0 until 512).foreach(i =>
        sum += (if (i >= 148 && i < 156) 32 else h(i) & 0xff))
      val ck = ("0" * (6 - java.lang.Long.toOctalString(sum).length)) +
        java.lang.Long.toOctalString(sum)
      ck.getBytes("US-ASCII").copyToArray(h, 148)
      h(154) = 0; h(155) = ' '.toByte
    }

    val pax = good.clone(); pax(156) = 'x'.toByte; rechecksum(pax)
    assert(intercept[IllegalArgumentException] {
      TarIO.parseTar(pax)
    }.getMessage.contains("pax"))

    val b256 = good.clone(); b256(124) = 0x80.toByte; rechecksum(b256)
    assert(intercept[IllegalArgumentException] {
      TarIO.parseTar(b256)
    }.getMessage.contains("base-256"))

    assert(intercept[IllegalArgumentException] {
      TarIO.parseTar(good.dropRight(1024)) // kill both trailer blocks
    }.getMessage.contains("end-of-archive"))

    assert(intercept[IllegalArgumentException] {
      TarIO.writeTar(Seq(("n" * 101) -> Array.empty[Byte]))
    }.getMessage.contains("100 bytes"))
  }

  test("non-ASCII entry names roundtrip as UTF-8, never mangled") {
    val entries = Seq("café.txt" -> "x".getBytes("UTF-8"),
      "日本語.bin" -> Array[Byte](1, 2))
    val back = TarIO.parseTar(TarIO.writeTar(entries))
    assert(back.map(_.name) == Vector("café.txt", "日本語.bin"))
  }

  test("splitKey: first dot of the basename, directories in the key") {
    assert(TarIO.splitKey("000123.jpg") == ("000123", "jpg"))
    assert(TarIO.splitKey("d/000123.seg.txt") == ("d/000123", "seg.txt"))
    assert(TarIO.splitKey("a.b/000123.jpg") == ("a.b/000123", "jpg"))
    assert(TarIO.splitKey("noext") == ("noext", ""))
  }

  test("readWebDataset groups samples task-locally; entries read flat") {
    val dir = tmpDir("read")
    TarIO.writeTarFile(s"$dir/shard-0.tar", Seq(
      "0.txt" -> "zero".getBytes("UTF-8"),
      "0.cls" -> "5".getBytes("UTF-8"),
      "1.txt" -> "one".getBytes("UTF-8")))
    TarIO.writeTarFile(s"$dir/shard-1.tar", Seq(
      "2.txt" -> "two".getBytes("UTF-8"),
      "2.cls" -> "9".getBytes("UTF-8")))

    val flat = TarIO.readTarEntries(spark, dir)
    assert(flat.count() == 5)

    val wds = TarIO.readWebDataset(spark, dir)
      .select(col("key"), col("n_files"),
        element_at(col("files"), "txt").cast("string").as("txt"),
        element_at(col("files"), "cls").cast("string").as("cls"))
      .orderBy("key").collect()
    assert(wds.map(r => (r.getString(0), r.getInt(1), r.getString(2),
      r.getString(3))).toSeq == Seq(
      ("0", 2, "zero", "5"), ("1", 1, "one", null), ("2", 2, "two", "9")))
  }

  test("sharded write is deterministic and reproducible across partitionings") {
    val docs = (0L until 40L).map(i =>
      (s"doc$i", Map("txt" -> s"text $i".getBytes("UTF-8"))))
    val dirA = tmpDir("wA"); val dirB = tmpDir("wB")
    TarIO.writeWebDatasetShards(docs.toDF("key", "files"), dirA, 4)
    TarIO.writeWebDatasetShards(
      docs.reverse.toDF("key", "files").repartition(7), dirB, 4)
    val shardsA = Paths.get(dirA).toFile.list().sorted.toSeq
    assert(shardsA.nonEmpty && shardsA.forall(_.matches("shard-\\d{5}\\.tar")))
    assert(shardsA == Paths.get(dirB).toFile.list().sorted.toSeq)
    shardsA.foreach { f =>
      val a = Files.readAllBytes(Paths.get(dirA, f))
      val b = Files.readAllBytes(Paths.get(dirB, f))
      assert(a.toSeq == b.toSeq, s"shard $f differs across partitionings")
    }
    // read back: every sample present exactly once
    val back = TarIO.readWebDataset(spark, dirA)
    assert(back.count() == 40)
    assert(back.select("key").distinct().count() == 40)
  }

  test("sharded write refuses a dotted-basename key (read-back ambiguity)") {
    // key 'a.b' + ext 'txt' would read back as key 'a', ext 'b.txt' —
    // splitKey cuts at the FIRST dot after the last slash
    val dir = tmpDir("dotkey")
    val bad = Seq(("a.b", Map("txt" -> "x".getBytes("UTF-8"))))
    val e = intercept[Exception] {
      TarIO.writeWebDatasetShards(bad.toDF("key", "files"), dir, 1)
    }
    assert(e.toString.contains("basename") ||
      Option(e.getCause).exists(_.toString.contains("basename")))
    // dots in DIRECTORY components are fine — only the basename splits
    val ok = Seq(("v1.2/doc0", Map("txt" -> "x".getBytes("UTF-8"))))
    TarIO.writeWebDatasetShards(ok.toDF("key", "files"), dir, 1)
    val back = TarIO.readWebDataset(spark, dir).select("key").collect()
    assert(back.map(_.getString(0)).toSeq == Seq("v1.2/doc0"))
  }

  test("composition: PNG payloads in shards feed the codec boundary") {
    val dir = tmpDir("png")
    def png(id: Int): Array[Byte] = PngCodec.encode(PngCodec.Image(8, 4, 3,
      Array.tabulate(8 * 4 * 3)(i => ((id * 31 + i * 7) % 256).toByte)))
    val df = (0 until 6).map(i =>
      (s"img$i", Map("png" -> png(i), "txt" -> s"caption $i".getBytes("UTF-8"))))
      .toDF("key", "files")
    TarIO.writeWebDatasetShards(df, dir, 2)
    val samples = TarIO.readWebDataset(spark, dir)
      .select(col("key"), element_at(col("files"), "png").as("content"))
      .withColumn("media_id",
        regexp_extract(col("key"), "(\\d+)", 1).cast("long"))
    val decoded = Multimodal.decodeImages(spark, samples, "media_id", "content")
    assert(decoded.filter(col("sum_c0").isNotNull).count() == 6)
    val one = decoded.filter(col("media_id") === 2L).collect().head
    val img = PngCodec.decode(png(2))
    var want = 0L
    (0 until img.pixels.length / 3).foreach(i => want += img.pixels(i * 3) & 0xff)
    assert(one.getLong(one.fieldIndex("sum_c0")) == want)
  }
}
