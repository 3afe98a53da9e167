package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** E5 multimodal byte-level surface (SURVEY.md §2.11): the graded slice of
  * [[graft.operators.Multimodal]] — payload byte statistics computed on the
  * UTF-8 encoding of `documents.text` (the environment has no real media
  * bytes, so text bytes stand in; the operators are payload-agnostic).
  * Decode-dependent features (width/height/checksum) are deliberately
  * ungraded: the decoder is a stub (Multimodal.fakeDecode) covered by
  * MultimodalSpec instead.
  */
object MultimodalQueries {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_multimodal_bytes",
      "payload byte stats: utf8 byte length vs char length, first codepoint",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            octet_length(coalesce(col("text"), lit(""))).cast("long").as("n_bytes"),
            length(coalesce(col("text"), lit(""))).cast("long").as("n_chars_utf"),
            when(col("text").isNull || col("text") === "", lit(-1L))
              .otherwise(ascii(col("text")).cast("long")).as("first_cp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
             |       CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars_utf,
             |       CAST(CASE WHEN text IS NULL OR text = '' THEN -1
             |                 ELSE unicode(text) END AS BIGINT) AS first_cp
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Round-trip image-dimension audit: synthesize structurally real PNG /
    // JPEG headers from doc_id-derived dims — JPEG rows carry 1–3 leading
    // APP0/APP1/APP13 segments (the JFIF/EXIF/IPTC trio; VERDICT r7 #6) —
    // then recover the dims from the BYTES alone via Multimodal.imageDims'
    // bounded marker walk (binary substr + hex math, fold-state position).
    // The oracle synthesizes the identical hex string and replays the SAME
    // walk at the string level as an unrolled CTE chain, so any off-by-one
    // in any hop breaks the hash. Scale: header-prefix reads, single scan,
    // no decoder, no shuffle beyond the final sort.
    GraftQuery(
      "q_image_dims",
      "parse width/height from synthesized PNG/multi-APPn-JPEG header bytes",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            (lit(16) + pmod(col("doc_id"), lit(1024))).cast("int").as("w0"),
            (lit(16) + pmod(col("doc_id") * 7, lit(768))).cast("int").as("h0"),
            (lit(16) + pmod(col("doc_id"), lit(8))).cast("int").as("al"),
            (lit(1) + pmod(col("doc_id"), lit(3))).cast("int").as("ns"))
          .withColumn(
            "payload",
            unhex(when(pmod(col("doc_id"), lit(2)) === 0,
                    Multimodal.synthPngHex(col("w0"), col("h0")))
              .otherwise(Multimodal.synthJpegMultiHex(
                col("w0"), col("h0"), col("ns"), col("al")))))
          // parse from bytes only — w0/h0/al/ns must not leak into the output
          .select(col("doc_id"), Multimodal.imageDims(col("payload")).as("d"))
          .select(
            col("doc_id"), col("d.fmt").as("fmt"), col("d.marker_ok").as("marker_ok"),
            col("d.width").as("width"), col("d.height").as("height"))
          .orderBy("doc_id"),
      Some {
        // the walk, unrolled: each step either stays (SOF0 / non-marker —
        // hex-string positions, marker at char mp) or hops 4 + 2·len chars
        val hops = (1 to Multimodal.MaxSegHops).map { i =>
          s"""mw$i AS (SELECT doc_id, hx, is_png, is_jpeg,
             |  CASE WHEN substr(hx, CAST(mp AS INT), 4) = 'FFC0'
             |         OR substr(hx, CAST(mp AS INT), 2) <> 'FF' THEN mp
             |       ELSE mp + 4 + 2 * TRY_CAST(
             |         '0x' || substr(hx, CAST(mp AS INT) + 4, 4) AS BIGINT) END AS mp
             |  FROM mw${i - 1})""".stripMargin
        }.mkString(",\n")
        s"""WITH base AS (
           |  SELECT doc_id,
           |         16 + doc_id % 1024 AS w0,
           |         16 + (doc_id * 7) % 768 AS h0,
           |         16 + doc_id % 8 AS al,
           |         1 + doc_id % 3 AS ns
           |  FROM documents),
           |syn AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 2 = 0 THEN
           |      '89504E470D0A1A0A0000000D49484452'
           |        || lpad(upper(to_hex(w0)), 8, '0')
           |        || lpad(upper(to_hex(h0)), 8, '0') || '0806000000'
           |    ELSE
           |      'FFD8'
           |        || CASE WHEN ns > 0 THEN 'FFE0' || lpad(upper(to_hex(al)), 4, '0')
           |             || repeat('4A', CAST(al - 2 AS INT)) ELSE '' END
           |        || CASE WHEN ns > 1 THEN 'FFE1' || lpad(upper(to_hex(al + 1)), 4, '0')
           |             || repeat('4A', CAST(al - 1 AS INT)) ELSE '' END
           |        || CASE WHEN ns > 2 THEN 'FFED' || lpad(upper(to_hex(al + 2)), 4, '0')
           |             || repeat('4A', CAST(al AS INT)) ELSE '' END
           |        || 'FFC0001108'
           |        || lpad(upper(to_hex(h0)), 4, '0')
           |        || lpad(upper(to_hex(w0)), 4, '0') || '03012200021101031101'
           |    END AS hx
           |  FROM base),
           |mw0 AS (
           |  SELECT doc_id, hx,
           |         substr(hx, 1, 8) = '89504E47' AS is_png,
           |         substr(hx, 1, 4) = 'FFD8' AS is_jpeg,
           |         5::BIGINT AS mp
           |  FROM syn),
           |$hops
           |SELECT doc_id,
           |  CASE WHEN is_png THEN 'png' WHEN is_jpeg THEN 'jpeg'
           |       ELSE 'unknown' END AS fmt,
           |  CAST(CASE WHEN (is_png AND substr(hx, 1, 16) = '89504E470D0A1A0A'
           |                  AND substr(hx, 25, 8) = '49484452')
           |              OR (is_jpeg AND substr(hx, CAST(mp AS INT), 4) = 'FFC0')
           |            THEN 1 ELSE 0 END AS BIGINT) AS marker_ok,
           |  CASE WHEN is_png THEN ('0x' || substr(hx, 33, 8))::BIGINT
           |       WHEN is_jpeg AND substr(hx, CAST(mp AS INT), 4) = 'FFC0'
           |         THEN ('0x' || substr(hx, CAST(mp AS INT) + 14, 4))::BIGINT
           |  END AS width,
           |  CASE WHEN is_png THEN ('0x' || substr(hx, 41, 8))::BIGINT
           |       WHEN is_jpeg AND substr(hx, CAST(mp AS INT), 4) = 'FFC0'
           |         THEN ('0x' || substr(hx, CAST(mp AS INT) + 10, 4))::BIGINT
           |  END AS height
           |FROM mw${Multimodal.MaxSegHops} ORDER BY doc_id""".stripMargin
      }
    ),

    // E5d little-endian image twins: BMP (BITMAPINFOHEADER) and GIF
    // (87a/89a) dimensions from synthesized headers — fixed-offset reads,
    // no marker walk, but BMP's SIGNED height (negative = top-down rows)
    // adds the two's-complement reconstruction no other header query
    // exercises. Same round-trip discipline as q_image_dims: the oracle
    // synthesizes the identical hex string and replays the parse at the
    // string level, so a wrong offset or an unsigned-height shortcut in
    // either engine breaks the hash. Single scan, header prefixes only.
    GraftQuery(
      "q_bmp_gif_dims",
      "parse width/height/topdown from synthesized BMP + GIF header bytes",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            (lit(16) + pmod(col("doc_id"), lit(1024))).cast("int").as("w0"),
            (lit(16) + pmod(col("doc_id") * 7, lit(768))).cast("int").as("h0"),
            pmod(col("doc_id"), lit(4)).cast("int").as("m4"))
          .withColumn(
            "payload",
            unhex(when(pmod(col("m4"), lit(2)) === 0,
                Multimodal.synthBmpHex(col("w0"), col("h0"),
                  when(col("m4") === 2, lit(1)).otherwise(lit(0))))
              .otherwise(Multimodal.synthGifHex(col("w0"), col("h0"),
                when(col("m4") === 1, lit(1)).otherwise(lit(0))))))
          // parse from bytes only — w0/h0/m4 must not leak into the output
          .select(col("doc_id"), Multimodal.bmpGifDims(col("payload")).as("d"))
          .select(
            col("doc_id"), col("d.fmt").as("fmt"), col("d.hdr_ok").as("hdr_ok"),
            col("d.width").as("width"), col("d.height").as("height"),
            col("d.topdown").as("topdown"))
          .orderBy("doc_id"),
      Some("""WITH base AS (
             |  SELECT doc_id,
             |         16 + doc_id % 1024 AS w0,
             |         16 + (doc_id * 7) % 768 AS h0,
             |         doc_id % 4 AS m4
             |  FROM documents),
             |syn AS (
             |  SELECT doc_id,
             |    CASE WHEN m4 % 2 = 0 THEN
             |      '424D' || '36000000' || '00000000' || '36000000' || '28000000'
             |      || lpad(upper(to_hex(w0 % 256)), 2, '0')
             |      || lpad(upper(to_hex((w0 // 256) % 256)), 2, '0') || '0000'
             |      || lpad(upper(to_hex((CASE WHEN m4 = 2 THEN 4294967296 - h0 ELSE h0 END) % 256)), 2, '0')
             |      || lpad(upper(to_hex(((CASE WHEN m4 = 2 THEN 4294967296 - h0 ELSE h0 END) // 256) % 256)), 2, '0')
             |      || lpad(upper(to_hex(((CASE WHEN m4 = 2 THEN 4294967296 - h0 ELSE h0 END) // 65536) % 256)), 2, '0')
             |      || lpad(upper(to_hex(((CASE WHEN m4 = 2 THEN 4294967296 - h0 ELSE h0 END) // 16777216) % 256)), 2, '0')
             |      || '0100' || '1800' || '00000000' || '00000000'
             |      || '00000000' || '00000000' || '00000000' || '00000000'
             |    ELSE
             |      '47494638' || CASE WHEN m4 = 1 THEN '3961' ELSE '3761' END
             |      || lpad(upper(to_hex(w0 % 256)), 2, '0')
             |      || lpad(upper(to_hex((w0 // 256) % 256)), 2, '0')
             |      || lpad(upper(to_hex(h0 % 256)), 2, '0')
             |      || lpad(upper(to_hex((h0 // 256) % 256)), 2, '0')
             |      || 'F70000'
             |    END AS hx
             |  FROM base),
             |parsed AS (
             |  SELECT doc_id, hx,
             |    substr(hx, 1, 4) = '424D' AS is_bmp,
             |    substr(hx, 1, 8) = '47494638'
             |      AND substr(hx, 9, 4) IN ('3761', '3961') AS is_gif,
             |    substr(hx, 1, 4) = '424D' AND TRY_CAST('0x' || substr(hx, 35, 2) || substr(hx, 33, 2)
             |      || substr(hx, 31, 2) || substr(hx, 29, 2) AS BIGINT) >= 40 AS bmp_ok,
             |    TRY_CAST('0x' || substr(hx, 43, 2) || substr(hx, 41, 2)
             |      || substr(hx, 39, 2) || substr(hx, 37, 2) AS BIGINT) AS bmp_w,
             |    TRY_CAST('0x' || substr(hx, 51, 2) || substr(hx, 49, 2)
             |      || substr(hx, 47, 2) || substr(hx, 45, 2) AS BIGINT) AS bmp_rawh,
             |    TRY_CAST('0x' || substr(hx, 15, 2) || substr(hx, 13, 2) AS BIGINT) AS gif_w,
             |    TRY_CAST('0x' || substr(hx, 19, 2) || substr(hx, 17, 2) AS BIGINT) AS gif_h
             |  FROM syn)
             |SELECT doc_id,
             |  CASE WHEN is_bmp THEN 'bmp' WHEN is_gif THEN 'gif' ELSE 'unknown' END AS fmt,
             |  CAST(CASE WHEN bmp_ok OR is_gif THEN 1 ELSE 0 END AS BIGINT) AS hdr_ok,
             |  CASE WHEN bmp_ok THEN bmp_w WHEN is_gif THEN gif_w END AS width,
             |  CASE WHEN bmp_ok THEN (CASE WHEN bmp_rawh >= 2147483648 THEN 4294967296 - bmp_rawh ELSE bmp_rawh END)
             |       WHEN is_gif THEN gif_h END AS height,
             |  CAST(CASE WHEN bmp_ok THEN (CASE WHEN bmp_rawh >= 2147483648 THEN 1 ELSE 0 END)
             |            WHEN is_gif THEN 0 END AS BIGINT) AS topdown
             |FROM parsed ORDER BY doc_id""".stripMargin)
    ),

    // The audio twin of q_image_dims: canonical 44-byte PCM WAV headers
    // synthesized from doc_id-derived (channels, rate, bits), then parsed
    // back from the BYTES alone by Multimodal.wavMeta — RIFF is
    // LITTLE-endian, so this grades the opposite byte order through the
    // same substr+hex machinery (byte_rate is derived rate·ch·bits/8 at
    // synthesis and re-read at parse, an internal consistency check). The
    // oracle synthesizes the identical hex string and parses it with
    // reversed-byte-pair concatenation at the string level.
    GraftQuery(
      "q_wav_meta",
      "parse channels/rate/bits from synthesized PCM WAV headers (little-endian)",
      (s, dir) => {
        val ch   = (lit(1) + pmod(col("doc_id"), lit(2))).cast("int")
        val rate = expr("CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000 " +
          "WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END")
        val bits = expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END")
        Tables.documents(s, dir)
          .select(col("doc_id"),
            unhex(Multimodal.synthWavHex(ch, rate, bits)).as("payload"))
          .select(col("doc_id"), Multimodal.wavMeta(col("payload")).as("m"))
          .select(col("doc_id"), col("m.riff_ok").as("riff_ok"),
            col("m.channels").as("channels"), col("m.sample_rate").as("sample_rate"),
            col("m.byte_rate").as("byte_rate"), col("m.bits").as("bits"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id,
             |         1 + doc_id % 2 AS ch,
             |         CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
             |              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS rate,
             |         CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END AS bits
             |  FROM documents),
             |d AS (SELECT doc_id, ch, rate, bits,
             |             ch * bits // 8 AS ba,
             |             rate * (ch * bits // 8) AS br FROM base),
             |syn AS (
             |  SELECT doc_id,
             |    '52494646' || '24000000' || '57415645666D7420' || '10000000' || '0100'
             |      || lpad(upper(to_hex(ch % 256)), 2, '0')
             |      || lpad(upper(to_hex(ch // 256)), 2, '0')
             |      || lpad(upper(to_hex(rate % 256)), 2, '0')
             |      || lpad(upper(to_hex((rate // 256) % 256)), 2, '0')
             |      || lpad(upper(to_hex((rate // 65536) % 256)), 2, '0')
             |      || lpad(upper(to_hex((rate // 16777216) % 256)), 2, '0')
             |      || lpad(upper(to_hex(br % 256)), 2, '0')
             |      || lpad(upper(to_hex((br // 256) % 256)), 2, '0')
             |      || lpad(upper(to_hex((br // 65536) % 256)), 2, '0')
             |      || lpad(upper(to_hex((br // 16777216) % 256)), 2, '0')
             |      || lpad(upper(to_hex(ba % 256)), 2, '0')
             |      || lpad(upper(to_hex(ba // 256)), 2, '0')
             |      || lpad(upper(to_hex(bits % 256)), 2, '0')
             |      || lpad(upper(to_hex(bits // 256)), 2, '0')
             |      || '6461746100000000' AS hx
             |  FROM d),
             |parsed AS (
             |  SELECT doc_id, hx,
             |         substr(hx, 1, 8) = '52494646'
             |           AND substr(hx, 17, 8) = '57415645'
             |           AND substr(hx, 25, 8) = '666D7420'
             |           AND ('0x' || substr(hx, 43, 2) || substr(hx, 41, 2))::BIGINT = 1 AS ok
             |  FROM syn)
             |SELECT doc_id,
             |  CAST(CASE WHEN ok THEN 1 ELSE 0 END AS BIGINT) AS riff_ok,
             |  CASE WHEN ok THEN ('0x' || substr(hx, 47, 2) || substr(hx, 45, 2))::BIGINT END AS channels,
             |  CASE WHEN ok THEN ('0x' || substr(hx, 55, 2) || substr(hx, 53, 2)
             |    || substr(hx, 51, 2) || substr(hx, 49, 2))::BIGINT END AS sample_rate,
             |  CASE WHEN ok THEN ('0x' || substr(hx, 63, 2) || substr(hx, 61, 2)
             |    || substr(hx, 59, 2) || substr(hx, 57, 2))::BIGINT END AS byte_rate,
             |  CASE WHEN ok THEN ('0x' || substr(hx, 71, 2) || substr(hx, 69, 2))::BIGINT END AS bits
             |FROM parsed ORDER BY doc_id""".stripMargin)
    ),

    // E5e PCM frame-energy extraction: past the header and into the DATA
    // chunk — each document synthesizes a complete mono 16-bit PCM WAV (44
    // byte header + 64 deterministic signed samples), and the operator cuts
    // the samples into 4 frames of 16, emitting per-frame energy (Σ|s|) and
    // peak (max|s|) — the silence/clipping profile an audio curation pass
    // gates on, and the first graded operator that DECODES samples (16-bit
    // little-endian two's complement) rather than reading header fields.
    // All codegen'd substr+hex byte math; bounded at frames·perFrame bytes
    // per row no matter the payload size. The oracle synthesizes the
    // identical hex string and decodes it with reversed-byte-pair
    // concatenation + the same two's-complement CASE at the string level.
    GraftQuery(
      "q_pcm_frames",
      "per-frame energy/peak decoded from 16-bit PCM WAV data chunks",
      (s, dir) =>
        // payload behind a cache boundary: the frame decode reads each of
        // the 128 sample bytes through the payload column, and
        // CollapseProject would otherwise inline the full 172-byte WAV
        // synthesis subtree into every read (same fix as q_phash_pairs)
        Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"),
            unhex(Multimodal.synthPcm16Hex(col("doc_id"), 64)).as("payload"))
          .persist()
          .select(col("doc_id"),
            explode(Multimodal.pcmFrames(col("payload"), 4, 16)).as("f"))
          .select(col("doc_id"), col("f.frame").as("frame"),
            col("f.energy").as("energy"), col("f.peak").as("peak"))
          .orderBy("doc_id", "frame"),
      Some("""WITH syn AS (
             |  SELECT doc_id,
             |    '52494646' || 'A4000000' || '57415645666D7420' || '10000000'
             |      || '0100' || '0100' || '401F0000' || '803E0000' || '0200' || '1000'
             |      || '64617461' || '80000000'
             |      || array_to_string([
             |           lpad(to_hex(((doc_id * 31 + k * 17) % 997 - 498 + 65536) % 65536 % 256), 2, '0')
             |             || lpad(to_hex((((doc_id * 31 + k * 17) % 997 - 498 + 65536) % 65536) // 256), 2, '0')
             |           for k in range(0, 64)], '') AS hx
             |  FROM documents)
             |SELECT doc_id, CAST(f AS BIGINT) AS frame,
             |  CAST(list_sum([
             |    abs(CASE WHEN ('0x' || substr(hx, 91 + 4*j, 2) || substr(hx, 89 + 4*j, 2))::BIGINT >= 32768
             |             THEN ('0x' || substr(hx, 91 + 4*j, 2) || substr(hx, 89 + 4*j, 2))::BIGINT - 65536
             |             ELSE ('0x' || substr(hx, 91 + 4*j, 2) || substr(hx, 89 + 4*j, 2))::BIGINT END)
             |    for j in range(16*f, 16*f + 16)]) AS BIGINT) AS energy,
             |  CAST(list_max([
             |    abs(CASE WHEN ('0x' || substr(hx, 91 + 4*j, 2) || substr(hx, 89 + 4*j, 2))::BIGINT >= 32768
             |             THEN ('0x' || substr(hx, 91 + 4*j, 2) || substr(hx, 89 + 4*j, 2))::BIGINT - 65536
             |             ELSE ('0x' || substr(hx, 91 + 4*j, 2) || substr(hx, 89 + 4*j, 2))::BIGINT END)
             |    for j in range(16*f, 16*f + 16)]) AS BIGINT) AS peak
             |FROM syn, (SELECT unnest(range(0, 4)) AS f) fr
             |ORDER BY doc_id, frame""".stripMargin)
    ),

    // E5f BMP pixel decoding — the image twin of q_pcm_frames' sample walk:
    // each document synthesizes a complete 3×3 24-bpp bottom-up BMP (54
    // byte header + REAL pixel rows padded to 4-byte boundaries) and the
    // operator walks the pixel array per the header's own geometry,
    // emitting per-channel sums + the first stored pixel's BGR. The stride
    // rule is the graded teeth: 3 px × 3 B = 9 B rows pad to 12, so a
    // naive 3·w walk shears every row after the first — exactly the bug
    // class a byte-level image audit must not have. The oracle synthesizes
    // the identical hex and decodes it at the string level.
    GraftQuery(
      "q_bmp_pixels",
      "per-channel pixel sums + first-pixel BGR decoded from 24-bpp BMP payloads",
      (s, dir) =>
        // payload behind a cache boundary (same CollapseProject inlining
        // fix as q_phash_pairs / q_pcm_frames)
        Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"),
            unhex(Multimodal.synthBmp24Hex(col("doc_id"), 3, 3)).as("payload"))
          .persist()
          .select(col("doc_id"), Multimodal.bmpPixelStats(col("payload")).as("p"))
          .select(col("doc_id"), col("p.w").as("w"), col("p.h").as("h"),
            col("p.sum_b").as("sum_b"), col("p.sum_g").as("sum_g"),
            col("p.sum_r").as("sum_r"), col("p.p0_b").as("p0_b"),
            col("p.p0_g").as("p0_g"), col("p.p0_r").as("p0_r"))
          .orderBy("doc_id"),
      Some("""WITH syn AS (
             |  SELECT doc_id,
             |    '424D' || '5A000000' || '00000000' || '36000000' || '28000000'
             |      || '03000000' || '03000000' || '0100' || '1800'
             |      || '00000000' || '24000000'
             |      || '00000000' || '00000000' || '00000000' || '00000000'
             |      || array_to_string([
             |           lpad(to_hex(CASE WHEN k % 12 >= 9 THEN 0 ELSE
             |             (doc_id * 7 + (k // 12) * 31 + ((k % 12) // 3) * 13
             |              + CASE (k % 12) % 3 WHEN 0 THEN 0 WHEN 1 THEN 97 ELSE 181 END) % 256
             |           END), 2, '0')
             |           for k in range(0, 36)], '') AS hx
             |  FROM documents),
             |geo AS (
             |  SELECT doc_id, hx,
             |    ('0x' || substr(hx, 43, 2) || substr(hx, 41, 2)
             |      || substr(hx, 39, 2) || substr(hx, 37, 2))::BIGINT AS w,
             |    ('0x' || substr(hx, 51, 2) || substr(hx, 49, 2)
             |      || substr(hx, 47, 2) || substr(hx, 45, 2))::BIGINT AS h,
             |    ('0x' || substr(hx, 27, 2) || substr(hx, 25, 2)
             |      || substr(hx, 23, 2) || substr(hx, 21, 2))::BIGINT AS doff
             |  FROM syn)
             |SELECT doc_id, w, h,
             |  CAST(list_sum([('0x' || substr(hx, 2*(doff + (i // w)*(((3*w + 3) // 4)*4) + (i % w)*3 + 0) + 1, 2))::BIGINT
             |                 for i in range(0, w*h)]) AS BIGINT) AS sum_b,
             |  CAST(list_sum([('0x' || substr(hx, 2*(doff + (i // w)*(((3*w + 3) // 4)*4) + (i % w)*3 + 1) + 1, 2))::BIGINT
             |                 for i in range(0, w*h)]) AS BIGINT) AS sum_g,
             |  CAST(list_sum([('0x' || substr(hx, 2*(doff + (i // w)*(((3*w + 3) // 4)*4) + (i % w)*3 + 2) + 1, 2))::BIGINT
             |                 for i in range(0, w*h)]) AS BIGINT) AS sum_r,
             |  ('0x' || substr(hx, 2*doff + 1, 2))::BIGINT AS p0_b,
             |  ('0x' || substr(hx, 2*doff + 3, 2))::BIGINT AS p0_g,
             |  ('0x' || substr(hx, 2*doff + 5, 2))::BIGINT AS p0_r
             |FROM geo ORDER BY doc_id""".stripMargin)
    ),

    // Perceptual near-duplicate IMAGE detection end-to-end: dHash
    // fingerprints over decoded 8×8 BMP thumbnails ([[Multimodal.bmpDHash]]
    // — 56 sign-of-luminance-delta bits), then FINGERPRINT-LEVEL banded LSH.
    // The pair stage runs over DISTINCT hashes, not documents: perceptual
    // hashes collide in dense classes by design (that is what makes them
    // useful), so doc-level band buckets go |class|² the moment a popular
    // image is re-scraped — measured 8× time at 4× corpus before this
    // dedup-then-pair shape replaced it (the r8 scale gate caught it). Now
    //  1. hash each doc (one codegen fold per row),
    //  2. cap each fingerprint's member list at MaxBucket lowest doc_ids
    //     (row_number — truncation, mirrored in the oracle),
    //  3. band the DISTINCT hashes (4 × 14 bits, buckets capped) and pair
    //     hash VALUES with hamming ≤ 6 — a set whose size is bounded by the
    //     fingerprint space, CONSTANT in corpus size,
    //  4. expand hash pairs back to doc pairs through two equi-joins, plus
    //     dist-0 pairs inside each fingerprint class — both output-bound.
    //
    // The corpus synthesizes one 8×8 thumbnail per doc from doc_id
    // (deterministic channel ramps, same synthesizer as q_bmp_pixels) —
    // ids congruent mod 256 yield identical images, so the graded output
    // contains REAL hamming-0 dup classes plus the band near-collisions.
    // The oracle re-decodes the identical hex at the string level and
    // re-derives hash, caps, bands, and expansion bit-for-bit.
    GraftQuery(
      "q_phash_pairs",
      "dHash (8×8 BMP, 56-bit) perceptual near-dup pairs: distinct-fingerprint LSH, hamming <= 6",
      (s, dir) => phashPairsFrame(s, dir).orderBy("a", "b"),
      // NO outer stripMargin: the interpolated CTE fragment has lines that
      // BEGIN with the `||` concat operator, and stripMargin would eat one
      // pipe of each (VERDICT-class oracle corruption, caught by the gate)
      Some(s"WITH $duckPhashPairsCtes\nSELECT a, b, dist FROM ppairs ORDER BY a, b")
    ),

    // E5i cross-modal duplicate confirmation — the composite only a
    // multimodal engine can run: pairs near-duplicate in BOTH modalities
    // (text simhash hamming ≤ 6 AND thumbnail dHash hamming ≤ 6). Either
    // signal alone over-fires — boilerplate text around distinct images,
    // or a stock photo under distinct articles; the conjunction is the
    // high-precision dedup delete list. Both sides are the EXACT graded
    // pipelines (shared simhashPairsFrame / phashPairsFrame and their
    // s-/p-prefixed oracle CTE chains composed into one WITH clause), so
    // this query cannot drift from its parents; the join is (a, b)
    // equi — pair sets, both already capped upstream.
    //
    // Phase attribution (VERDICT r11 next-step #3): this is the most
    // expensive graded key (2.2–3.3 s idle) and the one that swung 5.2×
    // under the r11 host contention — with no split, a simhash-side, a
    // phash-side, and a join regression were indistinguishable without a
    // rerun. Under a bench capture ONLY, each stage is materialized
    // eagerly (persist + count) inside its own Phases.timed, so
    // BENCH_FULL.json carries `phases.q_crossmodal_dups` =
    // {simhash_side, phash_side, pair_join}; outside a capture
    // (Verify, specs, production) the stages are identity and the lazy
    // plan is exactly the pre-r12 one. The eager barriers are NOT free —
    // measured ~2× the lazy wall at sf0.1 (cache encode + extra action
    // scheduling + losing stage fusion), which is why the bench times its
    // repeats capture-free and takes this split from one dedicated
    // untimed evaluation (Bench.PhasedQueries): the published total is
    // always the lazy plan's, and the phases are a diagnostic shape
    // comparable only to other rounds' phases.
    GraftQuery(
      "q_crossmodal_dups",
      "pairs near-dup in BOTH text (simhash <= 6) and thumbnail (dHash <= 6)",
      (s, dir) => {
        val capturing = graft.Phases.capturing
        def stage(name: String)(df: org.apache.spark.sql.DataFrame) =
          if (!capturing) df
          else graft.Phases.timed(name) { val p = df.persist(); p.count(); p }
        // The FINAL stage is timed by its materialize alone, never
        // persisted (ADVICE r12): persisting it too left the joined frame
        // cached after the bench's diagnostic evaluation — harmless there
        // (the next repeat's clearAllCaches sweeps), but a shared-session
        // capture caller (PhasedQueriesSpec, future tools) accumulated one
        // cached result frame per capture. The count over the persisted
        // SIDES is the join's own cost either way; the caller's forceFrame
        // re-derives the rows lazily after the sides unpersist below, so a
        // capture leaves no stage frame behind.
        def finalStage(name: String)(df: org.apache.spark.sql.DataFrame) =
          if (!capturing) df
          else { graft.Phases.timed(name) { df.count(); () }; df }
        val text  = stage("simhash_side")(DedupQueries.simhashPairsFrame(s, dir))
        val image = stage("phash_side")(phashPairsFrame(s, dir))
        val joined = finalStage("pair_join")(
          text.withColumnRenamed("dist", "text_dist")
            .join(image.withColumnRenamed("dist", "image_dist"), Seq("a", "b"))
            .select("a", "b", "text_dist", "image_dist")
            .orderBy("a", "b"))
        // the join is materialized; its parents' cache is dead weight now
        if (capturing) { text.unpersist(); image.unpersist(); () }
        joined
      },
      // no outer stripMargin — see q_phash_pairs
      Some(s"WITH ${DedupQueries.duckSimhashPairsCtes},\n$duckPhashPairsCtes\n" +
        "SELECT s.a, s.b, s.dist AS text_dist, p.dist AS image_dist\n" +
        "FROM spairs s JOIN ppairs p ON p.a = s.a AND p.b = s.b\n" +
        "ORDER BY s.a, s.b")
    ),

    // E5h silence detection — the trim/discard gate of an audio curation
    // pass, and the first operator to reason about sample ORDER rather than
    // per-frame aggregates: n_silent (samples with |s| < 100) says how
    // quiet a clip is, max_run (longest consecutive silent stretch) says
    // whether that quiet is dead air or just a soft recording — the
    // distinction energy histograms cannot make. The Spark side is ONE
    // row-local encoded fold (cur·1000+best, see
    // [[Multimodal.pcmSilence]]); the oracle derives the identical runs via
    // the classic gaps-and-islands window (k − row_number() grouping) — the
    // two standard formulations of run-length analysis checking each other.
    GraftQuery(
      "q_silence_runs",
      "silent-sample count + longest silent run decoded from 16-bit PCM data chunks",
      (s, dir) =>
        Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"),
            unhex(Multimodal.synthPcm16Hex(col("doc_id"), 64)).as("payload"))
          .persist()
          .select(col("doc_id"), Multimodal.pcmSilence(col("payload"), 64, 100L).as("sl"))
          .select(col("doc_id"), col("sl.n_silent").as("n_silent"),
            col("sl.max_run").as("max_run"))
          .orderBy("doc_id"),
      Some("""WITH syn AS (
             |  SELECT doc_id,
             |    '52494646' || 'A4000000' || '57415645666D7420' || '10000000'
             |      || '0100' || '0100' || '401F0000' || '803E0000' || '0200' || '1000'
             |      || '64617461' || '80000000'
             |      || array_to_string([
             |           lpad(to_hex(((doc_id * 31 + k * 17) % 997 - 498 + 65536) % 65536 % 256), 2, '0')
             |             || lpad(to_hex((((doc_id * 31 + k * 17) % 997 - 498 + 65536) % 65536) // 256), 2, '0')
             |           for k in range(0, 64)], '') AS hx
             |  FROM documents),
             |smp AS (
             |  SELECT doc_id, k,
             |    abs(CASE WHEN ('0x' || substr(hx, 91 + 4*k, 2) || substr(hx, 89 + 4*k, 2))::BIGINT >= 32768
             |             THEN ('0x' || substr(hx, 91 + 4*k, 2) || substr(hx, 89 + 4*k, 2))::BIGINT - 65536
             |             ELSE ('0x' || substr(hx, 91 + 4*k, 2) || substr(hx, 89 + 4*k, 2))::BIGINT END) AS a
             |  FROM syn, (SELECT unnest(range(0, 64)) AS k) ks),
             |sil AS (SELECT doc_id, k FROM smp WHERE a < 100),
             |isl AS (SELECT doc_id,
             |               k - row_number() OVER (PARTITION BY doc_id ORDER BY k) AS g
             |        FROM sil),
             |runs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS run
             |         FROM isl GROUP BY doc_id, g),
             |agg AS (SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_silent,
             |               CAST(max(run) AS BIGINT) AS max_run
             |        FROM runs GROUP BY doc_id)
             |SELECT d.doc_id,
             |       coalesce(a.n_silent, CAST(0 AS BIGINT)) AS n_silent,
             |       coalesce(a.max_run, CAST(0 AS BIGINT)) AS max_run
             |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)
    )
  )

  /** (a, b, dist) perceptual near-dup pairs, pre-ORDER BY — the
    * distinct-fingerprint LSH pipeline shared by `q_phash_pairs` and the
    * cross-modal composite. The payload is persisted BEFORE hashing: the
    * dHash fold reads ~340 payload bytes, and CollapseProject would
    * otherwise inline the whole 246-byte BMP synthesis subtree into every
    * one of those reads (measured 3.1 s → sub-second at sf0.1); behind the
    * cache boundary each read is an O(1) attribute access.
    */
  private[graft] def phashPairsFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val cap = DedupQueries.MaxBucket
    val wd  = Window.partitionBy(col("dhash")).orderBy(col("doc_id"))
    // pay is consumed exactly once (by mem, which IS persisted) — caching
    // it only added a second in-memory copy of the payload bytes plus the
    // columnar encode on the hot path (guide §5: persist only on reuse)
    val pay = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"),
        unhex(Multimodal.synthBmp24Hex(col("doc_id"), 8, 8)).as("payload"))
    // flat (doc_id, dhash) rows persisted once behind the window cap; the
    // bucket distinct and the same-hash groupBy both ride the CACHED window
    // partitioning (hash(dhash) satisfies their clustering), so neither
    // re-exchanges at runtime. A single-aggregate collect_list backbone was
    // tried in r17 and reverted: identical jobs/stages/tasks (13/13/293 at
    // sf0.1 — the "saved" exchanges were never real under the cache
    // partitioning) but +25 % executor time from the list aggregate plus a
    // per-consumer explode.
    val mem = pay
      .select(col("doc_id"), Multimodal.bmpDHash(col("payload")).as("dhash"))
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") <= cap)
      .select("doc_id", "dhash")
      .persist()
    val buckets = mem.select("dhash").distinct()
      .select(col("dhash"),
        posexplode(array((0 until 4).map(b =>
          expr(s"shiftright(dhash, ${14 * b}) & 16383L")): _*)).as(Seq("band", "bv")))
      .groupBy("band", "bv")
      .agg(array_sort(collect_set(col("dhash"))).as("hs"))
      .filter(size(col("hs")).between(2, cap))
    val hashPairs = buckets
      .select(explode(expr(DedupQueries.pairExpansionSql("hs")((x, y) =>
        s"named_struct('h1', $x, 'h2', $y)"))).as("p"))
      .select(col("p.h1").as("h1"), col("p.h2").as("h2"),
        expr("bit_count(p.h1 ^ p.h2)").cast("long").as("dist"))
      .filter(col("dist") <= 6)
      .distinct()
    val cross = hashPairs
      .join(mem.select(col("dhash").as("h1"), col("doc_id").as("da")), Seq("h1"))
      .join(mem.select(col("dhash").as("h2"), col("doc_id").as("db")), Seq("h2"))
      .select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"), col("dist"))
    val same = mem.groupBy("dhash")
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(DedupQueries.pairExpansionSql("ids")((x, y) =>
        s"named_struct('a', $x, 'b', $y)"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), lit(0L).as("dist"))
    cross.union(same)
  }

  /** DuckDB CTE chain ending in `ppairs(a, b, dist)` — the oracle twin of
    * [[phashPairsFrame]], p-prefixed names so it composes with the simhash
    * chain ([[DedupQueries.duckSimhashPairsCtes]]) in one WITH clause.
    */
  private[graft] def duckPhashPairsCtes: String = {
    def lum(row: String, c: String) = (0 to 2).map(ch =>
      s"('0x' || substr(hx, 2*(doff + ($row)*stride + ($c)*3 + $ch) + 1, 2))::BIGINT")
      .mkString(" + ")
    s"""psyn AS (
       |  SELECT doc_id,
       |    '424D' || 'F6000000' || '00000000' || '36000000' || '28000000'
       |      || '08000000' || '08000000' || '0100' || '1800'
       |      || '00000000' || 'C0000000'
       |      || '00000000' || '00000000' || '00000000' || '00000000'
       |      || array_to_string([
       |           lpad(to_hex((doc_id * 7 + (k // 24) * 31 + ((k % 24) // 3) * 13
       |              + CASE (k % 24) % 3 WHEN 0 THEN 0 WHEN 1 THEN 97 ELSE 181 END) % 256),
       |             2, '0')
       |           for k in range(0, 192)], '') AS hx
       |  FROM documents),
       |pgeo AS (
       |  SELECT doc_id, hx,
       |    ('0x' || substr(hx, 43, 2) || substr(hx, 41, 2)
       |      || substr(hx, 39, 2) || substr(hx, 37, 2))::BIGINT AS w,
       |    ('0x' || substr(hx, 51, 2) || substr(hx, 49, 2)
       |      || substr(hx, 47, 2) || substr(hx, 45, 2))::BIGINT AS h,
       |    ('0x' || substr(hx, 27, 2) || substr(hx, 25, 2)
       |      || substr(hx, 23, 2) || substr(hx, 21, 2))::BIGINT AS doff
       |  FROM psyn),
       |pg2 AS (SELECT doc_id, hx, w, h, doff, ((3*w + 3) // 4) * 4 AS stride FROM pgeo),
       |pdh AS (
       |  SELECT doc_id,
       |    CAST(list_sum([
       |      CASE WHEN ${lum("k // (w-1)", "k % (w-1)")}
       |             > ${lum("k // (w-1)", "k % (w-1) + 1")}
       |           THEN (CAST(1 AS BIGINT) << CAST(h*(w-1) - 1 - k AS INTEGER))
       |           ELSE CAST(0 AS BIGINT) END
       |      for k in range(0, CAST(h*(w-1) AS INTEGER))]) AS BIGINT) AS dhash
       |  FROM pg2),
       |pmem AS (
       |  SELECT doc_id, dhash FROM (
       |    SELECT doc_id, dhash,
       |           row_number() OVER (PARTITION BY dhash ORDER BY doc_id) AS rn
       |    FROM pdh) t WHERE rn <= ${DedupQueries.MaxBucket}),
       |preps AS (SELECT DISTINCT dhash FROM pmem),
       |pe AS (
       |  SELECT dhash, b, (dhash >> CAST(14*b AS INTEGER)) & 16383 AS bv
       |  FROM preps, (SELECT unnest(range(0, 4)) AS b) bs),
       |pcb AS (SELECT dhash, b, bv,
       |               count(*) OVER (PARTITION BY b, bv) AS bn
       |        FROM pe),
       |pcap AS (SELECT dhash, b, bv FROM pcb WHERE bn BETWEEN 2 AND ${DedupQueries.MaxBucket}),
       |php AS (
       |  SELECT DISTINCT l.dhash AS h1, r.dhash AS h2,
       |         CAST(bit_count(xor(l.dhash, r.dhash)) AS BIGINT) AS dist
       |  FROM pcap l JOIN pcap r ON l.b = r.b AND l.bv = r.bv
       |                         AND l.dhash < r.dhash
       |  WHERE bit_count(xor(l.dhash, r.dhash)) <= 6),
       |pcross AS (
       |  SELECT least(x.doc_id, y.doc_id) AS a,
       |         greatest(x.doc_id, y.doc_id) AS b, p.dist
       |  FROM php p JOIN pmem x ON x.dhash = p.h1
       |             JOIN pmem y ON y.dhash = p.h2),
       |psame AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, CAST(0 AS BIGINT) AS dist
       |  FROM pmem x JOIN pmem y
       |    ON x.dhash = y.dhash AND x.doc_id < y.doc_id),
       |ppairs AS (SELECT * FROM pcross UNION ALL SELECT * FROM psame)""".stripMargin
  }
}
