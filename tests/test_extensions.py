"""Property tests for the probabilistic / non-SQL-expressible
extension operators: where the driver only gets a rows-only check,
these tests pin down the real semantics locally."""

from __future__ import annotations

from data_warehouse_solution_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_simhash,
    near_dup_jaccard_pairs,
)
from data_warehouse_solution_spark.operators.multimodal import (
    fake_decode_features,
    multimodal_feature_extract,
)
from data_warehouse_solution_spark.operators.similarity import (
    ann_cosine_topk_bruteforce,
    ann_lsh_bucketed,
)

from .conftest import SF_ORACLE


def test_minhash_lsh_matches_exact_jaccard(spark):
    """On the fixture's 25 planted near-dup pairs (J>=0.5), LSH
    candidates + exact verify must equal the exact-join ground truth:
    the verify stage guarantees precision 1.0; this asserts recall
    1.0 at this threshold/band configuration too."""
    exact = {
        (r["doc_a"], r["doc_b"]) for r in near_dup_jaccard_pairs(spark, SF_ORACLE).collect()
    }
    lsh = {(r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, SF_ORACLE).collect()}
    assert exact, "fixture should contain planted near-dup pairs"
    assert lsh <= exact  # precision 1.0 (verify stage filters)
    recall = len(lsh & exact) / len(exact)
    assert recall == 1.0, f"LSH missed pairs: {sorted(exact - lsh)}"


def test_simhash_flags_near_dups(spark):
    """SimHash (hamming<=3) should flag a large fraction of the
    planted near-dup pairs and not explode into the cross product."""
    exact = {
        (r["doc_a"], r["doc_b"]) for r in near_dup_jaccard_pairs(spark, SF_ORACLE).collect()
    }
    sim = {(r["doc_a"], r["doc_b"]) for r in dedup_simhash(spark, SF_ORACLE).collect()}
    assert len(sim) < 5000  # far below the 125k cross-product pairs
    overlap = len(sim & exact) / len(exact)
    assert overlap >= 0.6, f"simhash found only {overlap:.0%} of planted pairs"


def test_simhash_skips_null_text_docs(spark, tmp_path):
    """Dirty corpora contain NULL text. The vectorized fingerprint
    must SKIP those docs (the explode-based predecessor's silent-drop
    behavior), not crash inside mapInPandas on np.asarray(None) —
    round-4 ADVICE regression."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, "alpha beta gamma delta"), (4, "")],
        "doc_id long, text string",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup_simhash(spark, str(tmp_path)).collect()}
    assert (1, 3) in pairs  # identical docs still pair up
    assert not any(2 in p for p in pairs)  # the null doc is gone, quietly


def test_ann_lsh_recall_vs_bruteforce(spark):
    """Bucketed ANN must recover a reasonable fraction of the true
    top-5 per query (single-table, no multiprobe: modest recall is
    expected; zero would mean broken bucketing)."""
    bf = {
        (r["q_id"], r["n_id"]) for r in ann_cosine_topk_bruteforce(spark, SF_ORACLE).collect()
    }
    lsh = {(r["q_id"], r["n_id"]) for r in ann_lsh_bucketed(spark, SF_ORACLE).collect()}
    assert bf and lsh
    recall = len(bf & lsh) / len(bf)
    assert recall > 0.0
    # every LSH result must at least be a real vector pair with sane
    # sim, and the emitted recall_at_k column must agree with the
    # externally-computed recall for that query
    per_q_true = {}
    for q, n in bf:
        per_q_true.setdefault(q, set()).add(n)
    per_q_lsh = {}
    for q, n in lsh:
        per_q_lsh.setdefault(q, set()).add(n)
    for r in ann_lsh_bucketed(spark, SF_ORACLE).collect():
        assert -1.0 <= r["sim"] <= 1.0
        expected = len(per_q_true.get(r["q_id"], set()) & per_q_lsh.get(r["q_id"], set())) / 5
        assert abs(r["recall_at_k"] - expected) < 1e-6, r["q_id"]


def test_fake_decode_features_deterministic():
    a = fake_decode_features(b"payload")
    b = fake_decode_features(b"payload")
    c = fake_decode_features(b"other")
    assert a == b
    assert a != c
    assert len(a) == 8
    assert all(0 <= v < 1 for v in a)


def test_multimodal_pipeline_deterministic(spark):
    r1 = {(r["dim"], r["mean_feature"]) for r in multimodal_feature_extract(spark, SF_ORACLE).collect()}
    r2 = {(r["dim"], r["mean_feature"]) for r in multimodal_feature_extract(spark, SF_ORACLE).collect()}
    assert r1 == r2
    assert len(r1) == 8  # FEATURE_DIM rows


def test_mllib_minhash_agrees_with_custom(spark):
    """The MLlib MinHashLSH variant must find the same planted
    near-dup pairs as the custom implementation (distance<=0.5 ==
    Jaccard>=0.5)."""
    from data_warehouse_solution_spark.operators.mllib_variants import dedup_minhash_mllib

    custom = {
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, SF_ORACLE).collect()
    }
    mllib = {
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_mllib(spark, SF_ORACLE).collect()
    }
    assert custom  # 25 planted pairs
    # approx join may add borderline candidates but must cover the planted set
    assert custom <= mllib
    assert len(mllib) <= len(custom) + 10


def test_mllib_tfidf_output_sane(spark):
    from data_warehouse_solution_spark.operators.mllib_variants import text_tfidf_mllib

    out = text_tfidf_mllib(spark, SF_ORACLE)
    rows = out.collect()
    assert len(rows) == 500
    assert all(r["n_active"] > 0 for r in rows)
    assert all(r["max_tfidf"] >= 0.0 for r in rows)


def test_multimodal_resize_deterministic_and_box_exact(spark):
    """The REAL resize (decode -> 2x2 box filter) that retired the
    stride-sampling stub: deterministic across runs, box means are
    exact multiples of 0.25, dims halved."""
    from data_warehouse_solution_spark.operators.multimodal import (
        multimodal_resize_stats,
    )

    out1 = {tuple(r) for r in multimodal_resize_stats(spark, SF_ORACLE).collect()}
    out2 = {tuple(r) for r in multimodal_resize_stats(spark, SF_ORACLE).collect()}
    assert out1 == out2
    for r in out1:
        did, fmt, rw, rh, mr, mg, mb, _ = r
        assert rw == 3 + did % 4 and rh == 3 + did % 3
        assert fmt == ("bmp", "ppm", "png")[did % 3]
        for m in (mr, mg, mb):
            # exact sums of quarter-integers divided once by count
            assert 0.0 <= m <= 255.0
            assert abs(m * rw * rh * 4 - round(m * rw * rh * 4)) < 1e-9


def test_approx_percentile_within_tolerance(spark):
    from data_warehouse_solution_spark.operators.textops import agg_approx_percentile

    for r in agg_approx_percentile(spark, SF_ORACLE).collect():
        rel_err = abs(r["approx_median"] - r["exact_median"]) / r["exact_median"]
        assert rel_err < 0.02, f"{r['o_orderstatus']}: rel_err={rel_err:.4f}"


def test_shingles_short_and_empty_docs(spark):
    """Docs with <5 words (incl. empty text) must yield an EMPTY
    shingle array, not a runtime error — regression for the
    F.sequence/F.slice crash on short documents."""
    from pyspark.sql import functions as F

    from data_warehouse_solution_spark.operators.dedup import _shingles

    df = spark.createDataFrame(
        [("", ), ("one", ), ("one two three four", ), ("a b c d e f", )], ["text"]
    )
    sizes = [r["n"] for r in df.select(F.size(_shingles()).alias("n")).collect()]
    assert sizes == [0, 0, 0, 2]


def test_frame_sample_empty_payload(spark, tmp_path):
    """multimodal_frame_sample must silently drop empty documents
    (oracle's generate_series is empty there) instead of raising on
    sequence(0, -1)."""
    import shutil

    from data_warehouse_solution_spark.operators.multimodal import multimodal_frame_sample

    from .conftest import SF_ORACLE

    sf = str(tmp_path / "sf")
    shutil.copytree(SF_ORACLE, sf)
    extra = spark.createDataFrame(
        [(99999901, "", "en", "web", 0), (99999902, "tiny doc", "en", "web", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    base.unionByName(extra, allowMissingColumns=True).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    out = multimodal_frame_sample(spark, sf)
    rows = out.filter(out.doc_id >= 99999900).collect()
    assert {r["doc_id"] for r in rows} == {99999902}


def test_signature_table_drop_top_shingles(spark):
    """Skew mitigation: dropping the N most frequent shingles must
    keep every multi-shingle doc signed (the fixture has no doc made
    ENTIRELY of the top-5 shingles) while changing the signatures of
    docs that contained them."""
    from pyspark.sql import functions as F

    from data_warehouse_solution_spark.operators.dedup import signature_table
    from data_warehouse_solution_spark.tables import load_tables

    d = load_tables(spark, SF_ORACLE, ("documents",))["documents"]
    base = signature_table(d)
    dropped = signature_table(d, drop_top_shingles=5)
    assert base.count() == dropped.count()  # no doc lost at N=5
    # the hash-set sizes shrink for the docs that held a top shingle
    joined = (
        base.select("doc_id", F.size("hset").alias("n_base"))
        .join(dropped.select("doc_id", F.size("hset").alias("n_drop")), "doc_id")
    )
    shrunk = joined.filter(F.col("n_drop") < F.col("n_base")).count()
    grew = joined.filter(F.col("n_drop") > F.col("n_base")).count()
    # synthetic text has few repeated shingles: at least the docs
    # SHARING a top shingle shrink, and nothing ever grows
    assert shrunk >= 1 and grew == 0


def test_image_codec_roundtrip_and_hostile_inputs():
    """Pure-numpy PPM/BMP codec: encode->decode is the identity
    (including BMP's padded odd-width rows and bottom-up flip), PPM
    comments parse, and unsupported shapes fail loudly."""
    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 7), (6, 8), (5, 4)]:  # odd widths force BMP padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_image(encode_ppm(px)) == px).all(), (h, w, "ppm")
        assert (decode_image(encode_bmp(px)) == px).all(), (h, w, "bmp")
    # position sensitivity: a vertical flip must change the decode
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    assert not (decode_image(encode_bmp(px[::-1])) == px).all()
    # PPM comment lines in the header are skipped
    with_comment = b"P6\n# a comment\n2 1\n255\n" + bytes(range(6))
    assert decode_image(with_comment).shape == (1, 2, 3)
    assert decode_image(with_comment).ravel().tolist() == list(range(6))
    with _pytest.raises(ValueError, match="unrecognized image magic"):
        decode_image(b"\x89PNG....")
    # 16-bit maxval scales by maxval (big-endian samples, r10);
    # 65535 -> 255 and 32768 -> round(32768*255/65535) = 128
    import struct as _struct

    a16 = decode_image(
        b"P6\n1 1\n65535\n" + _struct.pack(">3H", 65535, 32768, 0)
    )
    assert a16[0, 0].tolist() == [255, 128, 0]
    # sub-8-bit maxval scales to full range too (maxval 3 -> 0/85/170/255)
    a3 = decode_image(b"P6\n2 1\n3\n" + bytes([0, 1, 2, 3, 3, 3]))
    assert a3[0].tolist() == [[0, 85, 170], [255, 255, 255]]
    # out-of-spec maxval is loud
    with _pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n1 1\n0\n")
    with _pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n1 1\n70000\n\0\0\0\0\0\0")


def test_png_codec_roundtrip_filters_crc_and_scope():
    """Pure-numpy PNG codec: encode->decode identity across sizes that
    exercise all five row filters, multi-IDAT streams, CRC rejection,
    and the documented scope boundary (truecolor 8-bit only)."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(23)
    for h, w in [(1, 1), (5, 4), (8, 8), (7, 3), (13, 2)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(px)) == px).all(), (h, w)
        assert (decode_image(encode_png(px)) == px).all(), (h, w)
    # foreign-encoder shape: IDAT split across chunks must concatenate
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    b = encode_png(px)
    sig, pos, chunks = b[:8], 8, []
    while pos < len(b):
        ln = struct.unpack_from(">I", b, pos)[0]
        chunks.append((b[pos + 4 : pos + 8], b[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    out = bytearray(sig)
    for t, d in chunks:
        parts = [d[:7], d[7:]] if t == b"IDAT" else [d]
        for part in parts:
            out += struct.pack(">I", len(part)) + t + part
            out += struct.pack(">I", zlib.crc32(t + part) & 0xFFFFFFFF)
    assert (decode_png(bytes(out)) == px).all()
    # a flipped byte fails the chunk CRC, never yields wrong pixels
    bad = bytearray(encode_png(px))
    bad[20] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_png(bytes(bad))
    # Adam7 interlace round-trips (r10 punch #2): sizes under 8 hit
    # EMPTY passes (spec: empty passes emit no bytes), >8 exercises
    # every pass at multi-unit widths, non-multiples hit ragged passes
    for h, w in [(1, 1), (2, 2), (5, 4), (8, 8), (9, 9), (16, 13), (3, 21)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(px, interlace=True)) == px).all(), (h, w)
    # a truncated interlaced stream is loud, never silent garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    adam7_short = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + struct.pack(">I", len(zlib.compress(b"\x00\x01\x02\x03")))
        + b"IDAT"
        + zlib.compress(b"\x00\x01\x02\x03")
        + struct.pack(
            ">I",
            zlib.crc32(b"IDAT" + zlib.compress(b"\x00\x01\x02\x03")) & 0xFFFFFFFF,
        )
    )
    with _pytest.raises(ValueError, match="wrong length"):
        decode_png(adam7_short)


def test_png_adam7_interlaced_packed_formats():
    """Adam7 over NON-truecolor pixel formats (hand-built streams):
    each pass defilters at ITS OWN width, which matters most for
    packed bit depths where pass strides round up per pass — a decoder
    that defilters at the full-image stride mis-slices every pass."""
    import struct
    import zlib

    import numpy as np

    from data_warehouse_solution_spark.operators.multimodal import decode_png

    SIG = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def build(w, h, bitd, ct, raw, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, bitd, ct, 0, 0, 1)
        return (
            SIG + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    ADAM7 = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )

    def interlace_gray1(bits):
        """(h, w) 0/1 array -> Adam7 pass stream at 1-bit packing."""
        raw = bytearray()
        for x0, y0, dx, dy in ADAM7:
            sub = bits[y0::dy, x0::dx]
            if not (sub.shape[0] and sub.shape[1]):
                continue
            for row in sub:
                raw.append(0)  # filter None
                packed = np.packbits(row.astype(np.uint8))
                raw += packed.tobytes()
        return bytes(raw)

    rng = np.random.default_rng(41)
    for h, w in [(9, 10), (4, 4), (8, 3)]:
        bits = rng.integers(0, 2, size=(h, w), dtype=np.uint8)
        a = decode_png(build(w, h, 1, 0, interlace_gray1(bits)))
        assert (a[:, :, 0] == bits * 255).all(), (h, w)
        assert (a[:, :, 0] == a[:, :, 2]).all()


def test_png_palette_alpha_gray_and_16bit():
    """Every non-interlaced PNG pixel format decodes (hand-built
    streams, no PIL in the container): palette (PLTE-mapped, 8-bit
    and packed 2-bit indices), RGBA (alpha dropped), grayscale
    (replicated, incl. packed 1-bit and 16-bit high-byte), and
    gray+alpha — so a scraped web corpus's PNGs no longer need a
    fallback decoder for the common non-truecolor shapes."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import decode_png

    SIG = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def build(w, h, bitd, ct, raw, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, bitd, ct, 0, 0, 0)
        return (
            SIG + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    # palette, 8-bit indices (filter 0 rows)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    raw = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([3, 3, 0])
    a = decode_png(build(3, 2, 8, 3, raw, chunk(b"PLTE", plte)))
    assert a.tolist() == [
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        [[7, 8, 9], [7, 8, 9], [255, 0, 0]],
    ]
    # palette, PACKED 2-bit indices: 5 pixels/row -> 2 bytes, MSB first
    # row indices [0,1,2,3,0] -> 0b00_01_10_11, 0b00_000000
    raw2 = b"\x00" + bytes([0b00011011, 0b00000000])
    a2 = decode_png(build(5, 1, 2, 3, raw2, chunk(b"PLTE", plte)))
    assert a2[0].tolist() == [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9], [255, 0, 0],
    ]
    # index past the palette: loud, never garbage pixels
    with _pytest.raises(ValueError, match="palette index"):
        decode_png(build(1, 1, 8, 3, b"\x00\x09", chunk(b"PLTE", plte)))
    # RGBA: alpha dropped, SUB filter exercised at bpp=4
    row0 = bytes([10, 20, 30, 255, 5, 5, 5, 0])  # filter 1: second px +5
    a3 = decode_png(build(2, 1, 8, 6, b"\x01" + row0))
    assert a3[0].tolist() == [[10, 20, 30], [15, 25, 35]]
    # grayscale 8-bit replicates; UP filter at bpp=1
    raw4 = b"\x00" + bytes([9, 200]) + b"\x02" + bytes([1, 55])
    a4 = decode_png(build(2, 2, 8, 0, raw4))
    assert a4.tolist() == [
        [[9, 9, 9], [200, 200, 200]],
        [[10, 10, 10], [255, 255, 255]],
    ]
    # packed 1-bit grayscale scales to 0/255
    a5 = decode_png(build(3, 1, 1, 0, b"\x00" + bytes([0b10100000])))
    assert a5[0].tolist() == [[255] * 3, [0] * 3, [255] * 3]
    # gray+alpha: alpha dropped
    a6 = decode_png(build(2, 1, 8, 4, b"\x00" + bytes([77, 0, 99, 128])))
    assert a6[0].tolist() == [[77] * 3, [99] * 3]
    # 16-bit truecolor: high byte wins (0x1234 -> 0x12)
    px16 = struct.pack(">6H", 0x1234, 0xFFFF, 0x0001, 0x8000, 0x00FF, 0xABCD)
    a7 = decode_png(build(2, 1, 16, 2, b"\x00" + px16))
    assert a7[0].tolist() == [[0x12, 0xFF, 0x00], [0x80, 0x00, 0xAB]]
    # palette image without PLTE is loud
    with _pytest.raises(ValueError, match="PLTE"):
        decode_png(build(1, 1, 8, 3, b"\x00\x00"))


def test_wav_codec_roundtrip_alignment_and_scope():
    """Pure-numpy WAV codec: encode->decode identity (mono + stereo,
    odd frame counts), unknown-chunk skipping with RIFF word
    alignment, and the PCM16 scope boundary."""
    import struct

    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(31)
    for frames, ch, rate in [(1, 1, 8000), (101, 2, 44100), (64, 1, 16000)]:
        s = rng.integers(-32768, 32768, size=(frames, ch), dtype=np.int16)
        arr, got_rate = decode_wav(encode_wav(s, rate))
        assert got_rate == rate and (arr == s).all(), (frames, ch)
    # foreign-encoder shape: a LIST chunk with an ODD length between
    # fmt and data must be skipped word-aligned, or data mis-parses
    s = rng.integers(-32768, 32768, size=(5, 2), dtype=np.int16)
    b = encode_wav(s, 8000)
    fmt_at = b.index(b"fmt ")
    data_at = b.index(b"data")
    odd_list = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    patched = b[:data_at] + odd_list + b[data_at:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    arr, _ = decode_wav(patched)
    assert (arr == s).all()
    assert fmt_at < data_at
    # IEEE float (format 3): now IN scope — value/32768 round-trips
    # int16 exactly at both widths; NaN reads 0; out-of-range clips
    import numpy as _np

    for wfmt in ("float32", "float64"):
        arr, rr = decode_wav(encode_wav(s, 8000, fmt=wfmt))
        assert rr == 8000 and (arr == s).all(), wfmt
    fb = bytearray(encode_wav(_np.zeros(4, dtype=_np.int16), 8000, fmt="float32"))
    dat = fb.index(b"data") + 8
    struct.pack_into("<4f", fb, dat, float("nan"), 2.5, -2.5, 0.5)
    arr, _ = decode_wav(bytes(fb))
    assert arr.ravel().tolist() == [0, 32767, -32768, 16384]
    # scope boundary: format 3 at a non-IEEE width raises with reason
    bad = bytearray(encode_wav(s, 8000))
    bad[b.index(b"fmt ") + 8] = 3  # format 3 but bits stays 16
    with _pytest.raises(ValueError, match="float32/64"):
        decode_wav(bytes(bad))
    # WAVE_FORMAT_EXTENSIBLE stays refused
    bad2 = bytearray(encode_wav(s, 8000))
    struct.pack_into("<H", bad2, b.index(b"fmt ") + 8, 0xFFFE)
    with _pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad2))


def test_jpeg_codec_roundtrip_tolerance_and_scope():
    """Baseline JPEG codec: exact on block-constant grayscale (DC-only
    blocks, incl. non-multiple-of-8 dims), near-lossless (q=1) on
    arbitrary grayscale (full AC/Huffman path), bounded error on
    color (YCbCr float round trip), restart-marker streams decode
    identically, and non-baseline streams raise with the reason."""
    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(41)
    for h, w in [(8, 8), (16, 24), (13, 21), (9, 8)]:
        bi = np.arange(-(-h // 8)).reshape(-1, 1)
        bj = np.arange(-(-w // 8)).reshape(1, -1)
        g = ((bi * 7 + bj * 3 + 11) % 256).astype(np.uint8)
        px = np.repeat(np.repeat(g, 8, 0), 8, 1)[:h, :w]
        dec = decode_jpeg(encode_jpeg(px))
        assert dec.shape == (h, w, 3)
        assert (dec[:, :, 0] == px).all(), (h, w)
    px = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(px))
    assert np.abs(dec[:, :, 0].astype(int) - px.astype(int)).max() <= 1
    pxc = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    decc = decode_jpeg(encode_jpeg(pxc))
    assert np.abs(decc.astype(int) - pxc.astype(int)).max() <= 3
    # restart markers: DRI/RSTn stream decodes identically
    px = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(px, restart_interval=3))
            == decode_jpeg(encode_jpeg(px))).all()
    # scope boundaries raise with the reason
    b = bytearray(encode_jpeg(px))
    sof = bytes(b).index(b"\xff\xc0")
    b[sof + 1] = 0xC9  # arithmetic-coded sequential
    with _pytest.raises(ValueError, match="SOF9"):
        decode_jpeg(bytes(b))
    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00")


def test_jpeg_chroma_subsampling_420_422():
    """4:2:0 / 4:2:2 streams: exact on the constructions the oracle
    relies on (gray-valued RGB -> Cb=Cr=128; chroma constant per
    averaging cell), tolerance-pinned on NON-constant blocks (random
    luma under subsampling, 2x2-replicated random color, smooth color
    gradients), MCU-interleaved restart markers, and scope boundaries
    (non-integer upsampling ratio, zero sampling factor) raise."""
    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(43)
    # block-constant gray-valued RGB: bit-exact under both subsamplings
    # (odd dims exercise MCU edge padding: 4:2:0 pads Y to 16-multiples)
    for h, w in [(16, 16), (13, 21), (9, 8), (33, 47)]:
        bi = np.arange(-(-h // 8)).reshape(-1, 1)
        bj = np.arange(-(-w // 8)).reshape(1, -1)
        g = ((bi * 7 + bj * 3 + 11) % 256).astype(np.uint8)
        gray = np.repeat(np.repeat(g, 8, 0), 8, 1)[:h, :w]
        px = np.stack([gray] * 3, axis=-1)
        for sub in ("420", "422"):
            dec = decode_jpeg(encode_jpeg(px, subsampling=sub))
            assert dec.shape == (h, w, 3)
            assert (dec == px).all(), (h, w, sub)
    # NON-constant blocks, gray-valued RGB (full-res Y carries random
    # detail; chroma stays 128): near-lossless at q=1
    g = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    px = np.stack([g] * 3, axis=-1)
    for sub in ("420", "422"):
        dec = decode_jpeg(encode_jpeg(px, subsampling=sub))
        assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2, sub
    # NON-constant color whose chroma is constant per 2x2 averaging
    # cell: box-average downsample + nearest upsample are exact, so
    # only DCT/YCbCr rounding remains
    c = rng.integers(0, 256, size=(12, 20, 3), dtype=np.uint8)
    px2 = np.repeat(np.repeat(c, 2, 0), 2, 1)
    dec = decode_jpeg(encode_jpeg(px2, subsampling="420"))
    assert np.abs(dec.astype(int) - px2.astype(int)).max() <= 3
    # smooth gradients: chroma varies slowly, subsampling near-lossless
    h, w = 40, 56
    r = np.clip(np.add.outer(np.arange(h) * 2, np.arange(w)), 0, 255)
    gg = np.clip(np.add.outer(np.arange(h), np.arange(w) * 2), 0, 255)
    b = np.clip(255 - np.add.outer(np.arange(h), np.arange(w)), 0, 255)
    smooth = np.stack([r, gg, b], axis=-1).astype(np.uint8)
    for sub in ("420", "422"):
        dec = decode_jpeg(encode_jpeg(smooth, subsampling=sub))
        assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 4, sub
    # restart markers count interleaved MCUs: DRI stream == plain stream
    px = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    assert (
        decode_jpeg(encode_jpeg(px, restart_interval=2, subsampling="420"))
        == decode_jpeg(encode_jpeg(px, subsampling="420"))
    ).all()
    # scope boundaries: patch SOF sampling factors in a 4:2:0 stream
    base = encode_jpeg(px, subsampling="420")
    sof = base.index(b"\xff\xc0")
    # component entries start at sof+2(marker)+2(len)+6(prec,h,w,nc)
    cb_hv = sof + 4 + 6 + 3 + 1  # second component's h/v byte
    assert base[cb_hv - 1] == 2  # sanity: this is Cb's component id
    patched = bytearray(base)
    patched[cb_hv] = 0x31  # Cb 3x1 with Y 2x2 -> hmax=3, 3%2 != 0
    with _pytest.raises(ValueError, match="non-integer"):
        decode_jpeg(bytes(patched))
    patched = bytearray(base)
    patched[cb_hv] = 0x01  # h=0 is invalid per the spec
    with _pytest.raises(ValueError, match="invalid sampling factors"):
        decode_jpeg(bytes(patched))


def test_jpeg_progressive_differential_and_scope():
    """Progressive (SOF2) JPEG: the decode of a progressive stream is
    BIT-IDENTICAL to the baseline decode of the same input, because
    encode_jpeg_progressive re-encodes the same quantized
    coefficients — one differential pins every progressive path (DC
    first/refine with successive approximation, AC spectral bands,
    EOB runs, ZRL, AC refinement correction bits, interleaved DC /
    non-interleaved AC walks, subsampled component grids). Block-
    constant grayscale stays EXACT through the multi-scan loop, and
    still-unsupported SOF types raise with the reason."""
    import struct

    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(47)
    # grayscale differential across dims that exercise edge blocks
    for h, w in [(8, 8), (13, 21), (16, 24), (9, 8), (24, 40)]:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert (
            decode_jpeg(encode_jpeg_progressive(px))
            == decode_jpeg(encode_jpeg(px))
        ).all(), (h, w)
    # color differential across every subsampling mode
    for h, w in [(16, 16), (13, 21), (33, 47)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for sub in ("444", "422", "420"):
            assert (
                decode_jpeg(encode_jpeg_progressive(px, subsampling=sub))
                == decode_jpeg(encode_jpeg(px, subsampling=sub))
            ).all(), (h, w, sub)
    # block-constant grayscale: the oracle construction is exact
    # through the progressive loop too
    for h, w in [(13, 21), (9, 8)]:
        bi = np.arange(-(-h // 8)).reshape(-1, 1)
        bj = np.arange(-(-w // 8)).reshape(1, -1)
        g = ((bi * 7 + bj * 3 + 11) % 256).astype(np.uint8)
        px = np.repeat(np.repeat(g, 8, 0), 8, 1)[:h, :w]
        dec = decode_jpeg(encode_jpeg_progressive(px))
        assert (dec[:, :, 0] == px).all(), (h, w)
    # arbitrary spectral-band splits (real progression scripts vary):
    # one band, three bands, and a single-coefficient first band all
    # decode bit-identically to baseline
    px = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px))
    for bands in (((1, 63),), ((1, 2), (3, 10), (11, 63)), ((1, 1), (2, 63))):
        assert (
            decode_jpeg(encode_jpeg_progressive(px, ac_bands=bands)) == base
        ).all(), bands
    # restart intervals: DRI/RSTn in EVERY progressive scan type
    # (interleaved DC, DC refine, AC bands, AC refine — predictors
    # reset, EOB runs flushed at each boundary) decode identically
    px = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, subsampling="420"))
    for dri in (1, 2, 5):
        assert (
            decode_jpeg(encode_jpeg_progressive(
                px, subsampling="420", restart_interval=dri))
            == base
        ).all(), dri
    # still-unsupported frame types raise with the reason
    px = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    b = bytearray(encode_jpeg_progressive(px))
    sof = bytes(b).index(b"\xff\xc2")
    b[sof + 1] = 0xC3  # lossless sequential
    with _pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(bytes(b))


def test_gif_codec_lzw_roundtrip_and_animation_semantics():
    """GIF: LZW differential across width bumps and the 4096 reset,
    encode->decode identity (multi-frame, interlaced), and the
    animation semantics a naive decoder gets wrong — hand-built
    streams (no PIL in the container) with sub-rectangle frames,
    transparency holes, disposal 2 (restore background), and a local
    color table overriding the global one."""
    import struct

    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import _gif_codec

    enc, dec, lzw_e, lzw_d = _gif_codec()
    rng = np.random.default_rng(53)
    # LZW differential: random index streams crossing every code-width
    # boundary and the 4096 clear-reset
    for mcs, n in [(2, 50), (2, 20000), (4, 5000), (8, 70000)]:
        idx = rng.integers(0, 1 << mcs, size=n).tolist()
        assert lzw_d(lzw_e(idx, mcs), mcs, n) == idx, (mcs, n)
    # container round trip (multi-frame + interlace + tiny edge case)
    for n, h, w, k, inter in [(3, 7, 11, 8, False), (2, 16, 9, 4, True), (1, 1, 1, 2, False)]:
        pal = rng.integers(0, 256, size=(k, 3)).astype(np.uint8)
        fr = rng.integers(0, k, size=(n, h, w)).astype(np.uint8)
        out = dec(enc(fr, pal, interlace=inter))
        assert out.shape == (n, h, w, 3)
        assert (out == pal[fr]).all(), (n, h, w, k, inter)

    # hand-built animation: 4x4 canvas, global palette
    # [red, green, blue, white], background index 3 (white)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 4, 4, 0x80 | 0x11, 3, 0)  # depth 2 GCT
    gif += pal

    def frame(left, top, fw, fh, idx, gce=None, lct=None, lct_depth=0):
        b = bytearray()
        if gce is not None:
            b += b"\x21\xf9\x04" + bytes(gce) + b"\x00"
        b += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh)
        b += bytes([0x80 | (lct_depth - 1) if lct else 0x00])
        if lct:
            b += lct
        data = lzw_e(list(idx), 2)
        b += bytes([2, len(data)]) + data + b"\x00"
        return b

    # frame 1: full canvas, all red, disposal 2 (restore bg after)
    gif += frame(0, 0, 4, 4, [0] * 16, gce=[0x08, 0, 0, 0])
    # frame 2: 2x2 sub-rect at (1,1), green with a transparent hole
    # (transparency index 2: the blue entries punch through)
    gif += frame(1, 1, 2, 2, [1, 2, 2, 1], gce=[0x01, 0, 0, 2])
    # frame 3: full canvas via a LOCAL color table (black/yellow...)
    lct = bytes([0, 0, 0, 255, 255, 0, 1, 2, 3, 4, 5, 6])
    gif += frame(0, 0, 4, 4, [1] * 16, lct=lct, lct_depth=2)
    gif += b"\x3b"
    out = dec(bytes(gif))
    assert out.shape == (3, 4, 4, 3)
    assert (out[0] == [255, 0, 0]).all()  # frame 1 all red
    # frame 2: disposal-2 restored the canvas to WHITE background,
    # then the sub-rect landed: (1,1) and (2,2) green, the transparent
    # holes (1,2) and (2,1) show the white background
    assert (out[1][0] == [255, 255, 255]).all()
    assert out[1][1, 1].tolist() == [0, 255, 0]
    assert out[1][2, 2].tolist() == [0, 255, 0]
    assert out[1][1, 2].tolist() == [255, 255, 255]
    assert out[1][2, 1].tolist() == [255, 255, 255]
    # frame 3: local table's index 1 = yellow, everywhere
    assert (out[2] == [255, 255, 0]).all()
    # scope: truncated pixel stream and bad signature are loud
    with _pytest.raises(ValueError, match="not a GIF"):
        dec(b"JIF89a")
    trunc = bytes(gif[: len(gif) - 40])
    with _pytest.raises(ValueError):
        dec(trunc)


def test_bmp_palette_and_32bit():
    """BMP beyond 24-bit BI_RGB: 8-bit palette (BGRX quads, 4-byte row
    padding), 32-bit BI_RGB and 32-bit BI_BITFIELDS with the standard
    BGRA masks — hand-built streams; non-standard masks and RLE stay
    loud boundaries."""
    import struct

    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import decode_image

    def bmp(w, h, bpp, compression, pixel_bytes, palette=b"", masks=b""):
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
            len(pixel_bytes), 2835, 2835, len(palette) // 4, 0,
        )
        off = 14 + 40 + len(masks) + len(palette)
        hdr = b"BM" + struct.pack("<IHHI", off + len(pixel_bytes), 0, 0, off)
        return hdr + info + masks + palette + pixel_bytes

    # 8-bit palette, 3x2 bottom-up, stride padded 3 -> 4
    pal = bytes([255, 0, 0, 0]) + bytes([0, 255, 0, 0]) + bytes([0, 0, 255, 0])
    pal += bytes(4) * 253  # full 256-entry table
    rows = bytes([2, 1, 0, 0]) + bytes([0, 1, 2, 0])  # bottom row first
    a = decode_image(bmp(3, 2, 8, 0, rows, palette=pal))
    assert a.shape == (2, 3, 3)
    # top row (stored last, bottom-up) = indices 0,1,2 = B,G,R in BGRX
    assert a[0].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]
    assert a[1].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    # 32-bit BI_RGB, 2x1: BGRA byte order, alpha ignored
    px = bytes([10, 20, 30, 99]) + bytes([1, 2, 3, 0])
    a2 = decode_image(bmp(2, 1, 32, 0, px))
    assert a2[0].tolist() == [[30, 20, 10], [3, 2, 1]]
    # 32-bit BI_BITFIELDS with standard masks decodes identically
    masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    a3 = decode_image(bmp(2, 1, 32, 3, px, masks=masks))
    assert (a3 == a2).all()
    # non-standard masks are loud
    bad = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)
    with _pytest.raises(ValueError, match="masks"):
        decode_image(bmp(2, 1, 32, 3, px, masks=bad))
    # RLE at the wrong bpp pairing is loud (RLE8 needs 8, RLE4 needs 4)
    with _pytest.raises(ValueError, match="compression=1"):
        decode_image(bmp(2, 1, 32, 1, px))
    # palette index past the declared table is loud
    short_pal = bytes([255, 0, 0, 0]) * 2  # 2 entries
    with _pytest.raises(ValueError, match="palette index"):
        decode_image(bmp(3, 2, 8, 0, rows, palette=short_pal))


def test_jpeg_tail_formats_sof1_dqt16_cmyk_exif():
    """r10 punch #3 tail formats: SOF1 and 16-bit DQT decode
    bit-identically to the SOF0/8-bit stream (same entropy data);
    every Exif orientation value 1-8 is APPLIED (exact on
    block-constant images); Adobe 4-component streams (direct CMYK
    and YCCK) convert to RGB within codec tolerance on arbitrary
    inverted-CMYK input; a 4-component stream WITHOUT the APP14
    transform refuses loudly."""
    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    def blocky(h, w, ch, seed):
        r = np.random.default_rng(seed)
        base = r.integers(16, 240, size=(-(-h // 8), -(-w // 8), ch), dtype=np.uint8)
        return np.repeat(np.repeat(base, 8, 0), 8, 1)[:h, :w]

    px = blocky(24, 16, 3, 1)
    base = decode_jpeg(encode_jpeg(px))
    assert (decode_jpeg(encode_jpeg(px, sof1=True)) == base).all()
    assert (decode_jpeg(encode_jpeg(px, dqt16=True)) == base).all()
    # every orientation, exact against the numpy transform of upright
    xforms = {
        1: lambda a: a,
        2: lambda a: a[:, ::-1],
        3: lambda a: a[::-1, ::-1],
        4: lambda a: a[::-1],
        5: lambda a: a.transpose(1, 0, 2),
        6: lambda a: np.rot90(a, -1),
        7: lambda a: a.transpose(1, 0, 2)[::-1, ::-1],
        8: lambda a: np.rot90(a, 1),
    }
    for o, xf in xforms.items():
        got = decode_jpeg(encode_jpeg(px, orientation=o))
        assert (got == xf(base)).all(), o
    # Adobe 4-component: inverted-CMYK in, RGB = s_cmy * s_k / 255 out
    cmyk = blocky(16, 16, 4, 2)
    want = np.clip(
        np.rint(cmyk[:, :, :3].astype(np.float64) * cmyk[:, :, 3:4] / 255.0),
        0, 255,
    ).astype(int)
    for tf, tol in ((0, 1), (2, 2)):
        got = decode_jpeg(encode_jpeg(cmyk, adobe_transform=tf)).astype(int)
        assert np.abs(got - want).max() <= tol, tf
    # non-blocky CMYK stays within lossy-codec tolerance
    rng = np.random.default_rng(5)
    cm2 = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    got2 = decode_jpeg(encode_jpeg(cm2, adobe_transform=0)).astype(int)
    want2 = np.clip(
        np.rint(cm2[:, :, :3].astype(np.float64) * cm2[:, :, 3:4] / 255.0),
        0, 255,
    ).astype(int)
    assert np.abs(got2 - want2).max() <= 6
    # 4 components with the APP14 marker stripped: loud refusal
    b = encode_jpeg(cmyk, adobe_transform=2)
    i = b.index(b"\xff\xee")
    ln = int.from_bytes(b[i + 2 : i + 4], "big")
    stripped = b[:i] + b[i + 2 + ln :]
    with _pytest.raises(ValueError, match="Adobe"):
        decode_jpeg(stripped)
    # encoder guard: 4-channel input demands a transform
    with _pytest.raises(ValueError, match="adobe_transform"):
        encode_jpeg(cmyk)


def test_bmp_rle_decode_roundtrip_and_escapes():
    """BMP RLE8/RLE4 (r10 punch #7): encode->decode identity on
    limited-palette images through the RLE8 encoder, plus hand-built
    streams exercising every escape — end-of-line, end-of-bitmap
    (early, leaving untouched rows at index 0), delta skips, and
    word-aligned absolute mode — for both nibble (RLE4) and byte
    (RLE8) pixel packing."""
    import struct

    import numpy as np

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_image,
        encode_bmp_rle8,
    )

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (5, 7), (8, 8), (13, 21)]:
        base = rng.integers(0, 6, size=(h, w), dtype=np.uint8)
        px = np.stack(
            [base * 40, 255 - base * 30, base * 11 + 5], axis=-1
        ).astype(np.uint8)
        assert (decode_image(encode_bmp_rle8(px)) == px).all(), (h, w)

    # RLE8 hand-built: run + absolute(3, word-padded) + EOL + delta +
    # run + early EOB; skipped pixels resolve to palette index 0
    pal = bytes([10, 20, 30, 0, 200, 210, 220, 0, 1, 2, 3, 0])
    data = bytes([
        2, 1,
        0, 3, 0, 1, 2, 0,   # absolute: 3 indices + pad byte
        0, 0,               # EOL
        0, 2, 1, 1,         # delta dx=1 dy=1
        3, 2,
        0, 1,               # EOB with the top image row untouched
    ])
    off = 14 + 40 + 12
    info = struct.pack("<IiiHHIIiiII", 40, 5, 4, 1, 8, 1, len(data), 0, 0, 3, 0)
    bmp = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off) + info + pal + data
    a = decode_image(bmp)
    exp_idx = np.zeros((4, 5), int)
    exp_idx[3, 0:2] = 1
    exp_idx[3, 2:5] = [0, 1, 2]
    exp_idx[1, 1:4] = 2  # after EOL + delta(1,1)
    pal_rgb = np.array([[30, 20, 10], [220, 210, 200], [3, 2, 1]])
    assert (a == pal_rgb[exp_idx]).all()

    # RLE4: runs alternate the two nibbles; absolute packs nibbles
    pal4 = bytes([0, 0, 0, 0, 255, 255, 255, 0, 9, 9, 9, 0])
    data4 = bytes([
        5, 0x12,            # -> 1,2,1,2,1
        0, 3, 0x01, 0x20,   # absolute 3 -> 0,1,2 (2 bytes, word-aligned)
        0, 0,
        8, 0x21,            # -> 2,1,2,1,2,1,2,1
        0, 1,
    ])
    info4 = struct.pack("<IiiHHIIiiII", 40, 8, 2, 1, 4, 2, len(data4), 0, 0, 3, 0)
    bmp4 = (
        b"BM" + struct.pack("<IHHI", off + len(data4), 0, 0, off)
        + info4 + pal4 + data4
    )
    a4 = decode_image(bmp4)
    exp4 = np.zeros((2, 8), int)
    exp4[1, :5] = [1, 2, 1, 2, 1]
    exp4[1, 5:8] = [0, 1, 2]
    exp4[0, :] = [2, 1, 2, 1, 2, 1, 2, 1]
    pal_rgb4 = np.array([[0, 0, 0], [255, 255, 255], [9, 9, 9]])
    assert (a4 == pal_rgb4[exp4]).all()


def test_tiff_codec_roundtrip_compressions_and_scope():
    """Pure-numpy TIFF codec (r10): encode->decode identity across
    uncompressed / PackBits / TIFF-LZW (+predictor 2), both byte
    orders, multi-strip layouts, random AND compressible content
    (the LZW early-change and table reset are crossed by the larger
    inputs); scope boundaries refuse with the reason."""
    import struct

    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(17)
    for h, w in [(1, 1), (5, 7), (13, 21)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for comp, pred in [
            ("none", False), ("packbits", False), ("lzw", False), ("lzw", True),
        ]:
            for bo in ("II", "MM"):
                got = decode_tiff(
                    encode_tiff(px, compression=comp, predictor=pred,
                                rows_per_strip=4, byte_order=bo)
                )
                assert (got == px).all(), (h, w, comp, pred, bo)
    # width bumps + the 4094-entry table reset (random = incompressible)
    big = rng.integers(0, 256, size=(60, 120, 3), dtype=np.uint8)
    assert (decode_tiff(encode_tiff(big, compression="lzw")) == big).all()
    # compressible content (long LZW entries + PackBits runs)
    smooth = np.repeat(
        np.repeat(rng.integers(0, 4, size=(8, 8, 3), dtype=np.uint8) * 80, 8, 0),
        8, 1,
    )
    for comp, pred in [("packbits", False), ("lzw", True)]:
        assert (
            decode_tiff(encode_tiff(smooth, compression=comp, predictor=pred))
            == smooth
        ).all(), comp
    # r11: tiled / planar / 16-bit layouts round-trip bit-exactly,
    # alone and combined, across compressions and byte orders (edge
    # tiles pad on encode and crop on decode; 16-bit writes v*257 so
    # the >>8 downshift is exact)
    px = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    for kw in [
        dict(tile=(16, 16)),
        dict(tile=(32, 16), compression="lzw", predictor=True),
        dict(tile=(16, 32), compression="packbits", byte_order="MM"),
        dict(planar=True),
        dict(planar=True, compression="lzw", predictor=True, rows_per_strip=10),
        dict(planar=True, tile=(16, 16), compression="lzw"),
        dict(bits=16),
        dict(bits=16, compression="lzw", predictor=True),
        dict(bits=16, compression="packbits", rows_per_strip=5),
        dict(bits=16, tile=(16, 16), planar=True, compression="lzw",
             predictor=True, byte_order="MM"),
    ]:
        assert (decode_tiff(encode_tiff(px, **kw)) == px).all(), kw
    # encoder refusals: non-16-multiple tiles, bad bit depth
    with _pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(px, tile=(20, 16))
    with _pytest.raises(ValueError, match="bits"):
        encode_tiff(px, bits=12)
    # scope boundaries
    px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    b = bytearray(encode_tiff(px))
    with _pytest.raises(ValueError, match="magic"):
        decode_tiff(b"XX\x00\x00")


def test_tiff_hand_built_photometrics_and_refusals():
    """Hand-built TIFFs (no PIL in the container): photometric 0
    inverts (WhiteIsZero), grayscale replicates, palette maps 16-bit
    ColorMap entries, RGBA drops the extra sample; tiled / planar /
    16-bit refuse loudly."""
    import struct

    import numpy as np
    import pytest as _pytest

    from data_warehouse_solution_spark.operators.multimodal import decode_tiff

    def build(w, h, spp, bits, photo, data, extra_tags=()):
        bo = "<"
        entries = [
            (256, 4, [w]), (257, 4, [h]), (258, 3, [bits] * spp),
            (259, 3, [1]), (262, 3, [photo]), (277, 3, [spp]),
            (278, 4, [h]), (279, 4, [len(data)]),
        ] + list(extra_tags)
        # strip offset patched after layout
        entries.append((273, 4, [0]))
        entries.sort()
        ifd_off = 8
        ifd_len = 2 + 12 * len(entries) + 4
        deferred = bytearray()
        doff = ifd_off + ifd_len
        pre = []
        for tid, typ, vals in entries:
            sz = {3: 2, 4: 4}[typ]
            if len(vals) * sz > 4:
                pre.append((tid, doff))
                doff += len(vals) * sz
        data_off = doff
        ifd = bytearray(struct.pack(bo + "H", len(entries)))
        doff2 = ifd_off + ifd_len
        for tid, typ, vals in entries:
            if tid == 273:
                vals = [data_off]
            sz = {3: 2, 4: 4}[typ]
            fmt = {3: "H", 4: "I"}[typ]
            ifd += struct.pack(bo + "HHI", tid, typ, len(vals))
            if len(vals) * sz <= 4:
                packed = b"".join(struct.pack(bo + fmt, v) for v in vals)
                ifd += packed + b"\x00" * (4 - len(packed))
            else:
                ifd += struct.pack(bo + "I", doff2)
                for v in vals:
                    deferred += struct.pack(bo + fmt, v)
                doff2 += len(vals) * sz
        ifd += struct.pack(bo + "I", 0)
        return (
            struct.pack(bo + "2sHI", b"II", 42, ifd_off)
            + bytes(ifd) + bytes(deferred) + data
        )

    # photometric 1 grayscale replicates
    a = decode_tiff(build(3, 1, 1, 8, 1, bytes([0, 128, 255])))
    assert a[0].tolist() == [[0] * 3, [128] * 3, [255] * 3]
    # photometric 0 inverts
    a0 = decode_tiff(build(3, 1, 1, 8, 0, bytes([0, 128, 255])))
    assert a0[0].tolist() == [[255] * 3, [127] * 3, [0] * 3]
    # palette: ColorMap is 16-bit, R plane then G then B
    cmap = [0, 65535, 32896] + [0, 255 << 8, 1 << 8] + [65535, 0, 77 << 8]
    ap = decode_tiff(
        build(3, 1, 1, 8, 3, bytes([0, 1, 2]), [(320, 3, cmap)])
    )
    assert ap[0].tolist() == [[0, 0, 255], [255, 255, 0], [128, 1, 77]]
    # RGBA: 4th sample dropped
    a4 = decode_tiff(build(1, 1, 4, 8, 2, bytes([9, 8, 7, 200])))
    assert a4[0, 0].tolist() == [9, 8, 7]
    # r11: planar-2 grayscale and 16-bit samples now DECODE (hand
    # built — the encoder writes chunky RGB; these pin the decoder's
    # own tag handling); remaining genuine refusals stay loud
    a2 = decode_tiff(build(3, 1, 1, 8, 1, bytes([1, 2, 3]), [(284, 3, [2])]))
    assert a2[0].tolist() == [[1] * 3, [2] * 3, [3] * 3]
    a16 = decode_tiff(
        build(1, 1, 1, 16, 1, struct.pack("<H", 0xAB12))
    )
    assert a16[0, 0].tolist() == [0xAB] * 3  # downshift >>8
    # refusals: mixed bit depths, unsupported depth, bad planar value
    with _pytest.raises(ValueError, match="bits-per-sample"):
        decode_tiff(build(1, 1, 3, 8, 2, b"\x00" * 4, [(258, 3, [8, 8, 16])]))
    with _pytest.raises(ValueError, match="bits-per-sample"):
        decode_tiff(build(1, 1, 1, 8, 1, b"\x00" * 4, [(258, 3, [32])]))
    with _pytest.raises(ValueError, match="planar"):
        decode_tiff(build(1, 1, 1, 8, 1, b"\x00", [(284, 3, [3])]))
    # tiled with missing tile offsets/bytecounts is loud
    with _pytest.raises(ValueError, match="tile|tag"):
        decode_tiff(build(1, 1, 1, 8, 1, b"\x00", [(322, 4, [16])]))
    # palette without ColorMap is loud
    with _pytest.raises(ValueError, match="ColorMap"):
        decode_tiff(build(1, 1, 1, 8, 3, b"\x00"))


def test_wav_g711_mulaw_alaw():
    """G.711 companded WAV (formats 7/6, r10): every 8-bit code
    expands to a value that re-compresses to a code expanding to the
    SAME value (companding involution on values), and the ITU spot
    values hold (mu-law 0xFF -> 0, 0x80 -> +32124; A-law 0xD5 -> +8,
    0x55 -> -8, 0xAA -> +32256)."""
    import struct

    import numpy as np

    from data_warehouse_solution_spark.operators.multimodal import _audio_codec

    enc, dec, mu_ex, a_ex = _audio_codec()

    def dec_codes(codes, audio_fmt):
        fmt_body = struct.pack("<HHIIHH", audio_fmt, 1, 8000, 8000, 1, 8)
        wav = (
            b"RIFF" + struct.pack("<I", 36 + len(codes)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt_body
            + b"data" + struct.pack("<I", len(codes)) + bytes(codes)
        )
        return dec(wav)[0][:, 0]

    for fmt, audio_fmt, expand in (("mulaw", 7, mu_ex), ("alaw", 6, a_ex)):
        all_codes = list(range(256))
        vals = dec_codes(all_codes, audio_fmt)
        assert (vals == expand(np.arange(256, dtype=np.uint8))).all()
        # value involution through the full encode_wav/decode_wav loop
        vals2, _ = dec(enc(vals.reshape(-1, 1), 8000, fmt=fmt))
        assert (vals2[:, 0] == vals).all(), fmt
    assert dec_codes([0xFF, 0x80], 7).tolist() == [0, 32124]
    assert dec_codes([0xD5, 0x55, 0xAA], 6).tolist() == [8, -8, 32256]


def test_wav_ima_adpcm_differential_and_roundtrip():
    """IMA ADPCM (format 17, r11): the engine's vectorized
    blocks-at-once decoder matches an INDEPENDENT scalar reference
    (written straight from the IMA spec recursion) bit-exactly on
    random code streams — the adaptive step/index paths the
    closed-form oracle route can't reach — and encode->decode tracks
    a smooth signal within normal ADPCM error."""
    import struct

    import numpy as np

    from data_warehouse_solution_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    STEP = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
            34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
            130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
            408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060,
            1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749,
            3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
            7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
            18500, 20350, 22385, 24623, 27086, 29794, 32767]
    IDX = [-1, -1, -1, -1, 2, 4, 6, 8]

    def scalar_decode(data, ch, ba):
        out = [[] for _ in range(ch)]
        for b0 in range(0, len(data) - ba + 1, ba):
            blk = data[b0 : b0 + ba]
            preds, idxs = [], []
            for c in range(ch):
                p = int.from_bytes(blk[4 * c : 4 * c + 2], "little", signed=True)
                preds.append(p)
                idxs.append(min(88, blk[4 * c + 2]))
                out[c].append(p)
            body = blk[4 * ch :]
            for g in range(len(body) // (4 * ch)):
                for c in range(ch):
                    four = body[g * 4 * ch + c * 4 : g * 4 * ch + c * 4 + 4]
                    for byte in four:
                        for code in (byte & 0xF, byte >> 4):
                            st = STEP[idxs[c]]
                            d = st >> 3
                            if code & 1:
                                d += st >> 2
                            if code & 2:
                                d += st >> 1
                            if code & 4:
                                d += st
                            preds[c] = max(
                                -32768,
                                min(32767, preds[c] - d if code & 8 else preds[c] + d),
                            )
                            idxs[c] = max(0, min(88, idxs[c] + IDX[code & 7]))
                            out[c].append(preds[c])
        return np.array(out).T

    rng = np.random.default_rng(11)
    for ch in (1, 2):
        ba = ch * (4 + 32)
        raw = rng.integers(0, 256, size=ba * 4, dtype=np.uint8).tobytes()
        fmt_body = struct.pack("<HHIIHHHH", 17, ch, 8000, 4000, ba, 4, 2, 65)
        wav = (
            b"RIFF" + struct.pack("<I", 100) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        got, rate = decode_wav(wav)
        want = scalar_decode(raw, ch, ba)
        assert rate == 8000
        assert got.shape == want.shape and (got == want).all(), ch

    # encode->decode: exact shape via the fact chunk (non-multiple
    # frame counts drop the final block's padding), close tracking
    t = np.arange(333)
    for ch in (1, 2):
        sig = np.stack(
            [(3000 * np.sin(2 * np.pi * t / 50 + c)).astype(np.int16)
             for c in range(ch)],
            axis=1,
        )
        arr, rate = decode_wav(encode_wav(sig, 16000, fmt="adpcm"))
        assert arr.shape == sig.shape and rate == 16000
        err = np.abs(arr.astype(int) - sig.astype(int))
        assert err.mean() < 200 and err.max() < 2500, (ch, err.max())


# --- AVI/MJPEG video container (r11) --------------------------------


def test_avi_mjpeg_roundtrip_and_stride_sampling():
    import numpy as np

    from data_warehouse_solution_spark.operators.multimodal import _avi_codec

    enc, probe, dec = _avi_codec()
    # block-constant frames: the JPEG loop is exact by construction
    frames = [
        np.full((16, 24), 40 + 11 * f, dtype=np.uint8) for f in range(5)
    ]
    payload = enc(frames, fps=25)
    info = probe(payload)
    assert info["n_frames"] == 5
    assert (info["width"], info["height"]) == (24, 16)
    assert info["handler"] == "MJPG"
    assert info["usec_per_frame"] == 1_000_000 // 25
    # full decode
    got = dec(payload)
    assert [f for f, _ in got] == [0, 1, 2, 3, 4]
    for f, a in got:
        assert a.shape == (16, 24, 3)
        assert (a == 40 + 11 * f).all()
    # stride sampling decodes only every k-th frame
    got = dec(payload, stride=2)
    assert [f for f, _ in got] == [0, 2, 4]
    got = dec(payload, stride=5)
    assert [f for f, _ in got] == [0]


def test_avi_rgb_frames_and_rec_list_nesting():
    import struct

    import numpy as np

    from data_warehouse_solution_spark.operators.multimodal import _avi_codec

    enc, probe, dec = _avi_codec()
    # RGB block-constant frames (R=G=B keeps the JPEG loop exact)
    frames = [
        np.full((8, 8, 3), 90 + f, dtype=np.uint8) for f in range(2)
    ]
    payload = enc(frames, fps=10)
    got = dec(payload)
    assert [(f, int(a[0, 0, 0])) for f, a in got] == [(0, 90), (1, 91)]
    # hand-wrap the movi chunks in a 'rec ' LIST (AVI interleaving):
    # the walker must descend into it
    i = payload.index(b"LIST", 12)
    (movi_size,) = struct.unpack_from("<I", payload, i + 4)
    while payload[i + 8 : i + 12] != b"movi":
        i = payload.index(b"LIST", i + 4)
        (movi_size,) = struct.unpack_from("<I", payload, i + 4)
    inner = payload[i + 12 : i + 8 + movi_size]
    rec = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"rec " + inner
    rebuilt = (
        payload[: i + 4]
        + struct.pack("<I", 4 + len(rec))
        + b"movi"
        + rec
        + payload[i + 8 + movi_size :]
    )
    got2 = dec(rebuilt)
    assert [(f, int(a[0, 0, 0])) for f, a in got2] == [(0, 90), (1, 91)]


def test_avi_refusals():
    import numpy as np
    import pytest

    from data_warehouse_solution_spark.operators.multimodal import _avi_codec

    enc, probe, dec = _avi_codec()
    with pytest.raises(ValueError, match="RIFF/AVI"):
        probe(b"NOTRIFFxxxxxxxxxxxx")
    payload = enc([np.zeros((8, 8), dtype=np.uint8)])
    hacked = payload.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(ValueError, match="not MJPEG"):
        dec(hacked)
    with pytest.raises(ValueError, match="stride"):
        dec(payload, stride=0)
    with pytest.raises(ValueError, match="at least one frame"):
        enc([])


def test_avi_second_stream_chunks_are_ignored():
    """AVI stream numbers come from strl order; the decoder reads only
    the probed vids stream's NNdc chunks — a second stream's chunks
    must neither shift frame indices nor reach the JPEG decoder."""
    import struct

    import numpy as np

    from data_warehouse_solution_spark.operators.multimodal import _avi_codec

    enc, probe, dec = _avi_codec()
    frames = [np.full((8, 8), 60 + f, dtype=np.uint8) for f in range(3)]
    payload = enc(frames, fps=10)

    def chunk(fourcc, data):
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    # splice garbage 01dc chunks (a hypothetical second stream) into
    # the movi list between every real frame chunk
    i = payload.index(b"movi")
    (movi_size,) = struct.unpack_from("<I", payload, i - 4)
    inner = payload[i + 4 : i + movi_size]
    rebuilt_inner = b""
    for fourcc, body in _iter_chunks(inner):
        rebuilt_inner += chunk(fourcc, body)
        rebuilt_inner += chunk(b"01dc", b"\x12\x34NOTJPEG")
    head = payload[: i - 4]
    tail = payload[i + movi_size :]
    rebuilt = (
        head
        + struct.pack("<I", 4 + len(rebuilt_inner))
        + b"movi"
        + rebuilt_inner
        + tail
    )
    got = dec(rebuilt)
    assert [(f, int(a[0, 0, 0])) for f, a in got] == [
        (0, 60), (1, 61), (2, 62),
    ]


def _iter_chunks(data):
    import struct

    i = 0
    while i + 8 <= len(data):
        fourcc = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        yield fourcc, data[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)


def test_audio_features_dominant_bin_all_frequencies():
    """The square-wave dominant-bin law behind
    multimodal_audio_features: for EVERY k0 the query can generate,
    the FFT's dominant non-DC bin is the fundamental (folded odd
    harmonics each carry <= 1/3 of its amplitude)."""
    import numpy as np

    N, A = 2048, 6000
    n = np.arange(N)
    for k0 in range(3, 183):
        x = np.where((2 * n * k0) % (2 * N) < N, A, -A).astype(np.float64)
        mag = np.abs(np.fft.rfft(x))
        assert int(np.argmax(mag[1:])) + 1 == k0, k0


def test_image_dhash_invariance_and_distinctness():
    """The two laws behind dedup_image_dhash: the hash is EXACTLY
    brightness-invariant (integer cell sums, no clipping) and the 12
    generable gradient patterns produce 12 distinct hashes."""
    import numpy as np

    r = np.arange(32).reshape(-1, 1)
    c = np.arange(32).reshape(1, -1)

    def dh(pat, off):
        g = (
            (
                (
                    (r // 4) * (1 + 2 * pat)
                    + (c // 4) * (7 + 3 * pat)
                    + (r // 4) * (c // 4) * pat
                )
                % 89
            )
            * 2
            + 20
            + off
        ).astype(np.int64)
        cells = g.reshape(8, 4, 8, 4).sum(axis=(1, 3))
        hb = (cells[:, :-1] > cells[:, 1:]).flatten()
        vb = (cells[:-1, :] > cells[1:, :]).flatten()
        h = 0
        for b in np.concatenate([hb, vb]):
            h = (h << 1) | int(b)
        return h

    base = [dh(p, 0) for p in range(12)]
    assert len(set(base)) == 12
    for p in range(12):
        for off in range(0, 13, 3):
            assert dh(p, off) == base[p]


def test_image_near_dup_margins_and_banding_recall():
    """The three laws behind dedup_image_near_dup (r12): (a) the
    scratch flips AT MOST 4 bits (only the comparisons adjacent to
    the saturated cell can change) and is brightness-invariant too;
    (b) distinct patterns sit STRICTLY ABOVE the hamming threshold
    (clean or scratched — margin >= 2x the threshold); (c) the
    5-chunk hex banding has perfect pigeonhole recall at the
    threshold: every within-threshold pair shares >= 1 chunk."""
    import numpy as np

    from data_warehouse_solution_spark.operators.multimodal import (
        _NEARDUP_CHUNKS,
        _NEARDUP_HAM,
    )

    r = np.arange(32).reshape(-1, 1)
    c = np.arange(32).reshape(1, -1)

    def dh(pat, off, scratch):
        g = (
            (
                (
                    (r // 4) * (1 + 2 * pat)
                    + (c // 4) * (7 + 3 * pat)
                    + (r // 4) * (c // 4) * pat
                )
                % 89
            )
            * 2
            + 20
            + off
        ).astype(np.int64)
        if scratch:
            g = g.copy()
            g[12:16, 16:20] = 255
        cells = g.reshape(8, 4, 8, 4).sum(axis=(1, 3))
        hb = (cells[:, :-1] > cells[:, 1:]).flatten()
        vb = (cells[:-1, :] > cells[1:, :]).flatten()
        h = 0
        for b in np.concatenate([hb, vb]):
            h = (h << 1) | int(b)
        return h

    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    H = {}
    for p in range(12):
        clean = {dh(p, off, False) for off in range(0, 13, 3)}
        scr = {dh(p, off, True) for off in range(0, 13, 3)}
        assert len(clean) == 1 and len(scr) == 1  # brightness-invariant
        H[p] = (clean.pop(), scr.pop())
        assert ham(*H[p]) <= _NEARDUP_HAM  # (a) structural bound
    cross = min(
        ham(x, y)
        for p in range(12)
        for q in range(12)
        if p < q
        for x in H[p]
        for y in H[q]
    )
    assert cross > 2 * _NEARDUP_HAM  # (b) precision margin (>= 10)
    # (c) pigeonhole recall over the hex-aligned chunking
    assert sum(ln for _, ln in _NEARDUP_CHUNKS) == 28
    for p in range(12):
        a, b = (f"{h:028x}" for h in H[p])
        shared = sum(
            a[s : s + ln] == b[s : s + ln] for s, ln in _NEARDUP_CHUNKS
        )
        assert shared >= 1, f"pattern {p}: banding missed a near-dup"
