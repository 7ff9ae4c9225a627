"""The native-decoder backend seam (r11 punch #2):
``decode_backend("auto"|"pure"|"native")`` feature-detects Pillow on
the executor and falls back to the pure-numpy codec family. This
container ships no Pillow, so CI pins the FALLBACK path end-to-end;
the differential pure-vs-native assertions auto-activate on any
machine where Pillow imports (same test file, no edits)."""

from __future__ import annotations

import numpy as np
import pytest

from data_warehouse_solution_spark.operators.multimodal import (
    _seam_payloads,
    decode_backend,
    decode_images,
)

try:
    import PIL  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def test_pure_backend_round_trips_every_format():
    dec = decode_backend("pure")
    for fmt, payload, expected, exact in _seam_payloads():
        a = dec(payload)
        assert a.shape == expected.shape, fmt
        if exact:
            assert (a == expected).all(), fmt
        else:  # jpeg 4:2:0 is lossy by design
            mae = float(np.abs(a.astype(int) - expected.astype(int)).mean())
            assert mae < 3.0, (fmt, mae)


def test_auto_backend_matches_available_reality():
    """auto == native where Pillow imports, == pure where it doesn't —
    either way the decode succeeds and meets the fidelity bar."""
    auto, pure = decode_backend("auto"), decode_backend("pure")
    for fmt, payload, expected, exact in _seam_payloads():
        a, p = auto(payload), pure(payload)
        assert a.shape == p.shape, fmt
        if not HAS_PIL:
            # no Pillow: auto IS the pure path, bit-identical
            assert (a == p).all(), fmt
        elif exact:
            # differential: native must agree with pure bit-exactly
            # on lossless formats
            assert (a == p).all(), fmt
        else:
            mae = float(np.abs(a.astype(int) - expected.astype(int)).mean())
            assert mae < 3.0, (fmt, mae)


def test_native_backend_refuses_or_decodes():
    if HAS_PIL:
        dec = decode_backend("native")
        for fmt, payload, expected, exact in _seam_payloads():
            assert dec(payload).shape == expected.shape, fmt
    else:
        dec = decode_backend("native")
        with pytest.raises(ImportError, match="Pillow"):
            dec(_seam_payloads()[0][1])


def test_unknown_backend_refuses():
    with pytest.raises(ValueError, match="auto|pure|native"):
        decode_backend("turbo")


def test_decode_images_operator(spark):
    """The library-level mapInPandas operator: dims + the order-
    sensitive pixel checksum match a locally computed closed form."""
    payloads = _seam_payloads()
    rows = [(i, bytearray(payloads[i % 5][1])) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height, r.px_checksum)
        for r in decode_images(df, backend="auto").collect()
    }
    dec = decode_backend("auto")
    for i in range(10):
        a = dec(payloads[i % 5][1])
        pos = np.arange(a.size, dtype=np.int64)
        want = int((a.reshape(-1).astype(np.int64) * (pos % 997 + 1)).sum())
        assert got[i] == (a.shape[1], a.shape[0], want), i


# -- r12: the seam extended to audio (soundfile) and video (PyAV) ----------

try:
    import soundfile  # noqa: F401

    HAS_SF = True
except ImportError:
    HAS_SF = False

try:
    import av  # noqa: F401

    HAS_AV = True
except ImportError:
    HAS_AV = False


def _wav_fixtures():
    """(name, payload, expected int16 (frames, ch), rate) per WAV
    subformat the pure codec ships."""
    from data_warehouse_solution_spark.operators.multimodal import _audio_codec

    enc = _audio_codec()[0]
    n = np.arange(512)
    sq = np.where((2 * n * 7) % 1024 < 512, 6000, -6000).astype(np.int16)
    mono = sq.reshape(-1, 1)
    stereo = np.stack([sq, (-sq).astype(np.int16)], axis=1)
    return [
        ("pcm16_mono", enc(mono, 16000), mono, 16000),
        ("pcm16_stereo", enc(stereo, 22050), stereo, 22050),
    ]


def _avi_fixture():
    from data_warehouse_solution_spark.operators.multimodal import _avi_codec

    enc, _, _ = _avi_codec()
    h, w, nf = 16, 24, 4
    bi = np.arange(-(-h // 8)).reshape(-1, 1)
    bj = np.arange(-(-w // 8)).reshape(1, -1)
    frames = [
        np.repeat(np.repeat(((13 + f * 11 + bi * 7 + bj * 3) % 256).astype(np.uint8), 8, 0), 8, 1)[:h, :w]
        for f in range(nf)
    ]
    return enc(frames, fps=10), frames


def test_audio_backend_pure_and_auto_agree():
    from data_warehouse_solution_spark.operators.multimodal import audio_backend

    pure, auto = audio_backend("pure"), audio_backend("auto")
    for name, payload, want, rate in _wav_fixtures():
        a, ra = pure(payload)
        assert ra == rate and (a == want).all(), name
        b, rb = auto(payload)
        assert rb == rate, name
        if not HAS_SF:
            assert (b == a).all(), name  # auto IS pure here
        else:
            # differential: PCM16 must be bit-identical under libsndfile
            assert (b == a).all(), name


def test_audio_backend_native_refuses_or_decodes():
    from data_warehouse_solution_spark.operators.multimodal import audio_backend

    name, payload, want, rate = _wav_fixtures()[0]
    dec = audio_backend("native")
    if HAS_SF:
        a, ra = dec(payload)
        assert ra == rate and (a == want).all()
    else:
        with pytest.raises(ImportError, match="soundfile"):
            dec(payload)


def test_video_backend_pure_and_auto_agree():
    from data_warehouse_solution_spark.operators.multimodal import video_backend

    payload, frames = _avi_fixture()
    pure, auto = video_backend("pure"), video_backend("auto")
    for stride in (1, 2):
        got_p = pure(payload, stride)
        want_idx = list(range(0, len(frames), stride))
        assert [i for i, _ in got_p] == want_idx
        for i, a in got_p:
            # block-constant fixture: the MJPEG loop is exact
            assert (a[:, :, 0] == frames[i]).all(), i
        got_a = auto(payload, stride)
        assert [i for i, _ in got_a] == want_idx
        for (i, a), (j, b) in zip(got_p, got_a):
            assert i == j
            if not HAS_AV:
                assert (a == b).all(), i  # auto IS pure here
            else:
                # differential: DC-only MJPEG blocks decode exactly
                # in any conformant decoder
                assert (a == b).all(), i


def test_video_backend_native_refuses_or_decodes():
    from data_warehouse_solution_spark.operators.multimodal import video_backend

    payload, frames = _avi_fixture()
    dec = video_backend("native")
    if HAS_AV:
        got = dec(payload, 2)
        assert [i for i, _ in got] == [0, 2]
    else:
        with pytest.raises(ImportError, match="PyAV"):
            dec(payload)


def test_audio_video_backend_reject_unknown():
    from data_warehouse_solution_spark.operators.multimodal import (
        audio_backend,
        video_backend,
    )

    with pytest.raises(ValueError, match="auto|pure|native"):
        audio_backend("turbo")
    with pytest.raises(ValueError, match="auto|pure|native"):
        video_backend("turbo")
