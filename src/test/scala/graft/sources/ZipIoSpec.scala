package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** PKWARE ZIP wire-format roundtrips: central-directory-driven reads,
  * stored + deflate methods, CRC verification, named refusals, and the
  * sharded Spark lifecycle. */
class ZipIoSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_zip_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("roundtrip: deflate for compressible, stored for incompressible") {
    val big = ("lorem ipsum " * 100).getBytes("UTF-8")
    val tiny = Array[Byte](1, 2, 3)
    val rand = Array.tabulate(64)(i => (i * 101 + 37).toByte)
    val entries = Seq("a/big.txt" -> big, "tiny.bin" -> tiny,
      "rand.bin" -> rand, "empty" -> Array.empty[Byte])
    val bytes = ZipIO.writeZip(entries)
    // deflate must have been chosen for the big entry: archive is
    // much smaller than the raw payload
    assert(bytes.length < big.length / 2)
    val back = ZipIO.parseZip(bytes)
    assert(back.map(_._1) == entries.map(_._1).toVector)
    back.zip(entries).foreach { case ((_, got), (_, want)) =>
      assert(got.toSeq == want.toSeq)
    }
  }

  test("refusals: CRC, encryption flag, bad method, missing EOCD") {
    val good = ZipIO.writeZip(Seq("f.txt" -> ("repeat " * 40).getBytes("UTF-8")))

    // corrupt one payload byte (after the local header + name): the
    // refusal is either the CRC or a malformed deflate stream — loud
    // either way, never a silently-wrong payload
    val bad = good.clone(); bad(40) = (bad(40) ^ 0x55).toByte
    intercept[Exception] { ZipIO.parseZip(bad) }

    // encryption flag in the central directory entry
    val enc = good.clone()
    def findCentral(b: Array[Byte]): Int =
      b.indices.find(i => i + 4 <= b.length &&
        (b(i) & 0xff) == 0x50 && (b(i + 1) & 0xff) == 0x4b &&
        (b(i + 2) & 0xff) == 0x01 && (b(i + 3) & 0xff) == 0x02).get
    val cd = findCentral(enc)
    enc(cd + 8) = (enc(cd + 8) | 0x1).toByte
    assert(intercept[IllegalArgumentException] {
      ZipIO.parseZip(enc)
    }.getMessage.contains("encrypted"))

    // unsupported method
    val meth = good.clone(); val cd2 = findCentral(meth)
    meth(cd2 + 10) = 99
    assert(intercept[IllegalArgumentException] {
      ZipIO.parseZip(meth)
    }.getMessage.contains("method 99"))

    // no EOCD
    assert(intercept[IllegalArgumentException] {
      ZipIO.parseZip(good.dropRight(22))
    }.getMessage.contains("end-of-central-directory"))

    // more entries than the 16-bit EOCD count can hold → loud, never
    // a silently-truncated read-back
    val many = (0 until 65536).map(i => (s"e$i", Array.empty[Byte]))
    assert(intercept[IllegalArgumentException] {
      ZipIO.writeZip(many)
    }.getMessage.contains("16-bit"))
  }

  test("refusals: 2 GiB+ sizes and out-of-range local offsets are named, never wrapped") {
    val good = ZipIO.writeZip(Seq("f.txt" -> ("repeat " * 40).getBytes("UTF-8")))
    def findCentral(b: Array[Byte]): Int =
      b.indices.find(i => i + 4 <= b.length &&
        (b(i) & 0xff) == 0x50 && (b(i + 1) & 0xff) == 0x4b &&
        (b(i + 2) & 0xff) == 0x01 && (b(i + 3) & 0xff) == 0x02).get

    // csize = 0x80000000 (legal non-zip64, overflows Int) → named
    // refusal, never a NegativeArraySizeException
    val big = good.clone(); val cd = findCentral(big)
    big(cd + 20) = 0; big(cd + 21) = 0; big(cd + 22) = 0
    big(cd + 23) = 0x80.toByte // little-endian 0x80000000
    assert(intercept[IllegalArgumentException] {
      ZipIO.parseZip(big)
    }.getMessage.contains("2 GiB"))

    // local-header offset beyond the archive → overrun refusal, never
    // an ArrayIndexOutOfBounds from reading the signature there
    val far = good.clone(); val cd2 = findCentral(far)
    far(cd2 + 42) = 0xff.toByte; far(cd2 + 43) = 0xff.toByte
    far(cd2 + 44) = 0x7f.toByte; far(cd2 + 45) = 0
    assert(intercept[IllegalArgumentException] {
      ZipIO.parseZip(far)
    }.getMessage.contains("overruns"))
  }

  test("sharded write is deterministic; read is one task per archive") {
    val docs = (0L until 30L).map(i =>
      (s"doc$i.txt", s"content $i ".repeat(20).getBytes("UTF-8")))
    val dirA = tmpDir("wA"); val dirB = tmpDir("wB")
    ZipIO.writeZipShards(docs.toDF("name", "content"), dirA, 4)
    ZipIO.writeZipShards(
      docs.reverse.toDF("name", "content").repartition(5), dirB, 4)
    val shardsA = Paths.get(dirA).toFile.list().sorted.toSeq
    assert(shardsA.nonEmpty && shardsA.forall(_.matches("shard-\\d{5}\\.zip")))
    shardsA.foreach { f =>
      assert(Files.readAllBytes(Paths.get(dirA, f)).toSeq ==
        Files.readAllBytes(Paths.get(dirB, f)).toSeq, s"$f differs")
    }
    val back = ZipIO.readZipEntries(spark, dirA)
    assert(back.count() == 30)
    assert(back.select("name").distinct().count() == 30)
    val one = back.filter(col("name") === "doc7.txt")
      .select(col("content").cast("string")).head().getString(0)
    assert(one == "content 7 ".repeat(20))
  }
}
