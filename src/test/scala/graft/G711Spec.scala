package graft

import graft.ops.Multimodal

/** G.711 companding: the expansion tables are pinned against known
  * CCITT reference values, and the WAV decode path is checked
  * end-to-end over synthesized payloads. */
class G711Spec extends SparkSpec {
  import spark.implicits._

  test("mu-law expansion matches CCITT reference points") {
    // (code, linear) — endpoints and segment boundaries of the public
    // u-law table (G.711 Table 2a as used by Sun's reference codec)
    assert(Multimodal.ulaw2linear(0x00) == -32124)
    assert(Multimodal.ulaw2linear(0x80) == 32124)
    assert(Multimodal.ulaw2linear(0xff) == 0)
    assert(Multimodal.ulaw2linear(0x7f) == -0) // negative zero == 0
    assert(Multimodal.ulaw2linear(0xfe) == 8) // smallest positive step
    // odd symmetry: code and code+0x80 mirror around zero
    (0 until 128).foreach { c =>
      assert(Multimodal.ulaw2linear(c) == -Multimodal.ulaw2linear(c | 0x80))
    }
  }

  test("A-law expansion matches CCITT reference points") {
    assert(Multimodal.alaw2linear(0x00) == -5504)
    assert(Multimodal.alaw2linear(0x80) == 5504)
    assert(Multimodal.alaw2linear(0x55) == -8) // XOR-identity code
    assert(Multimodal.alaw2linear(0xd5) == 8)
    assert(Multimodal.alaw2linear(0xaa) == 32256) // max magnitude
    assert(Multimodal.alaw2linear(0x2a) == -32256)
    (0 until 128).foreach { c =>
      assert(Multimodal.alaw2linear(c) == -Multimodal.alaw2linear(c | 0x80))
    }
  }

  test("G.711 WAV decode recovers per-clip stats from the real bytes") {
    val docs = spark.range(20).select($"id".as("doc_id"))
    for (law <- Seq("ulaw", "alaw")) {
      val out = Multimodal.decodeG711(
        Multimodal.g711FromDocuments(docs, law)).collect()
      assert(out.length == 20)
      assert(out.forall(_.law == law))
      assert(out.forall(_.sample_rate == 8000))
      // byte-exact replay of one clip
      val expand: Int => Int =
        if (law == "ulaw") Multimodal.ulaw2linear else Multimodal.alaw2linear
      val id = 7L
      val n = 64 + (id % 64).toInt
      val samples = (0 until n)
        .map(k => math.abs(expand(((id * 31 + k * 17) % 256).toInt)))
      val got = out.find(_.media_id == id).get
      assert(got.n_samples == n)
      assert(got.abs_sum == samples.map(_.toLong).sum)
      assert(got.peak == samples.max)
    }
  }

  test("decode fails loudly on a 16-bit PCM payload (wrong format tag)") {
    val docs = spark.range(3).select($"id".as("doc_id"))
    val pcm = Multimodal.wavFromDocuments(docs)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeG711(pcm).collect()
    }
    assert(e.getMessage != null)
  }
}
