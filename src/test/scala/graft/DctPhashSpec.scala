package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** The real (DCT) perceptual hash, M11: known-value DC pin, clone
  * equality feeding the Hamming-LSH consumer, and the decode-or-nothing
  * contract. The cross-engine arithmetic pin is the m11 oracle (the
  * literal cosine table and fold order are stated in SQL); this spec
  * owns the value-level invariants.
  */
class DctPhashSpec extends SparkSpec {
  import spark.implicits._

  /** A valid 8×8 binary PPM whose 192 payload bytes are `fill`. */
  private def ppm(fill: Byte): Array[Byte] =
    "P6\n8 8\n255\n".getBytes("UTF-8") ++ Array.fill(192)(fill)

  /** 8×8 PPM with per-pixel bytes from a deterministic function. */
  private def ppmGen(f: Int => Int): Array[Byte] =
    "P6\n8 8\n255\n".getBytes("UTF-8") ++
      (0 until 192).map(i => f(i).toByte).toArray

  test("dc equals the gray64 sum computed independently") {
    val bytes = ppmGen(i => 40 + (i * 7) % 90)
    val out = Multimodal.dctPerceptualHash(
      Seq((1L, bytes)).toDF("doc_id", "payload"), "payload", "doc_id")
      .collect().head
    // gray pixel i = (b(3i)+b(3i+1)+b(3i+2)) / 3, unsigned
    val gray = (0 until 64).map { i =>
      val p = (0 until 3).map(j => (40 + ((3 * i + j) * 7) % 90)).sum
      p / 3
    }
    assert(out.getLong(1) === gray.sum.toLong, "DC coefficient drifted")
  }

  test("byte-identical images hash identically; hammingNearDup finds the pair") {
    val img = ppmGen(i => 30 + (i * 13) % 200)
    val other = ppmGen(i => 60 + (i * 11) % 150)
    val hashes = Multimodal.dctPerceptualHash(
      Seq((1L, img), (2L, img), (3L, other)).toDF("doc_id", "payload"),
      "payload", "doc_id")
    val rows = hashes.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(1L) === rows(2L))
    val pairs = Dedup.hammingNearDup(hashes.select($"doc_id", $"phash"),
        nBits = 16, bands = 4, maxHamming = 3, sigCol = "phash")
      .select($"da", $"db", $"hamming").as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)), s"clone pair missing: $pairs")
  }

  test("phash bits live in the declared 15-bit range (DC bit clear)") {
    val out = Multimodal.dctPerceptualHash(
      Seq((1L, ppmGen(i => i)), (2L, ppm(77))).toDF("doc_id", "payload"),
      "payload", "doc_id").collect()
    out.foreach { r =>
      val h = r.getLong(2)
      assert((h & 1L) === 0L, "DC bit must stay clear")
      assert(h >= 0L && h < (1L << 16), s"hash out of 16-bit range: $h")
    }
  }

  /** Deterministic JPEG payload: fixed-pattern RGB image encoded
    * through the JDK's own ImageIO JPEG writer (no external encoder in
    * the zero-egress sandbox — a real corpus's JPEGs go through the
    * same ImageIO READ path regardless of what wrote them).
    */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        (((x * 4) % 256) << 16) | (((y * 5) % 256) << 8) | ((x + y) * 3) % 256)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", baos)
    baos.toByteArray
  }

  test("JPEG payloads decode for real: header metadata, per-JVM determinism, " +
      "and the committed golden pin (VERDICT r11 task 4)") {
    val bytes = jpegBytes(64, 48)
    // header facts are byte-exact: SOF dimensions, format tag
    val meta = Multimodal.binaryMetadata(
      Seq((1L, bytes)).toDF("doc_id", "payload"), "payload", "doc_id")
      .collect().head
    assert(meta.getAs[String]("format") === "jpeg")
    assert(meta.getAs[Int]("width") === 64)
    assert(meta.getAs[Int]("height") === 48)
    // per-JVM determinism: re-encode + re-decode of the same pixels is
    // bit-identical through both hash pipelines (aHash m6 and pHash m11)
    val again = jpegBytes(64, 48)
    assert(java.util.Arrays.equals(bytes, again), "ImageIO JPEG encode drifted")
    val df = Seq((1L, bytes), (2L, again)).toDF("doc_id", "payload")
    val ahash = Multimodal.perceptualHash(df, "payload", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ahash(1L) === ahash(2L))
    val phash = Multimodal.dctPerceptualHash(df, "payload", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(phash(1L) === phash(2L))
    // committed GOLDEN values (the m8 golden-twin precedent): these pin
    // the JDK's JPEG IDCT output — deterministic for a given JDK, NOT
    // cross-engine, which is why the m6/m11 ORACLE rows stay on PPM/PNG
    // and this pin lives in a spec. A JDK upgrade that changes the
    // decoder fails here deliberately; re-golden after inspecting.
    assert(ahash(1L) === GOLDEN_JPEG_AHASH,
      s"JPEG aHash drifted from golden: ${ahash(1L)}")
    assert(phash(1L) === GOLDEN_JPEG_PHASH,
      s"JPEG (dc, phash) drifted from golden: ${phash(1L)}")
  }

  private val GOLDEN_JPEG_AHASH = 9151029638986776768L
  private val GOLDEN_JPEG_PHASH = (8109L, 65480L) // (dc, phash)

  test("undecodable payloads are excluded (decode-or-nothing)") {
    val out = Multimodal.dctPerceptualHash(
      Seq((1L, "not an image".getBytes("UTF-8")),
        (2L, ppm(99))).toDF("doc_id", "payload"), "payload", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(out === Set(2L))
  }
}
