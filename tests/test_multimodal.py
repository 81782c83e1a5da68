"""Multimodal plumbing: schema, Arrow batch shape, byte-capped rechunking,
frame sampling, payload pruning for metadata-only queries — and the REAL
stdlib PNG codec (round 2): encode -> decode round-trip, all five scanline
filters, decoded dims == planted dims."""

import struct
import zlib

import pytest

from invoice_extraction_spark.operators.multimodal import (
    FEATURE_DIM,
    PNG_SIG,
    _decode_image,
    extract_features,
    frame_sample,
    media_stats,
    png_decode,
    png_encode,
    synth_media,
)
from invoice_extraction_spark.plans.explain import read_schema


def test_png_roundtrip_pure():
    w, h = 13, 9  # odd sizes catch stride bugs
    px = lambda x, y: ((x * 5) % 256, (y * 3) % 256, (x + y) % 256)  # noqa: E731
    data = png_encode(w, h, px)
    assert data[:8] == PNG_SIG
    gw, gh, nch, out = png_decode(data)
    assert (gw, gh, nch) == (w, h, 3)
    want = bytes(v for y in range(h) for x in range(w) for v in px(x, y))
    assert bytes(out) == want


def _filter_line(ftype, line, prev, nch):
    """Forward-apply a PNG filter (encoder side) to exercise the decoder's
    unfiltering for types 1-4, which png_encode itself never emits."""
    out = bytearray(line)
    if ftype == 1:
        for i in range(len(line) - 1, nch - 1, -1):
            out[i] = (line[i] - line[i - nch]) & 0xFF
    elif ftype == 2:
        for i in range(len(line)):
            out[i] = (line[i] - prev[i]) & 0xFF
    elif ftype == 3:
        for i in range(len(line)):
            left = line[i - nch] if i >= nch else 0
            out[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:
        from invoice_extraction_spark.operators.multimodal import _paeth

        for i in range(len(line)):
            left = line[i - nch] if i >= nch else 0
            ul = prev[i - nch] if i >= nch else 0
            out[i] = (line[i] - _paeth(left, prev[i], ul)) & 0xFF
    return bytes(out)


def test_png_decode_all_filter_types():
    w, h, nch = 6, 5, 3
    pixels = [bytes(((x * 17 + y * 29 + c * 7) % 256) for x in range(w) for c in range(nch)) for y in range(h)]
    raw = b""
    prev = bytes(w * nch)
    for y in range(h):
        ftype = y % 5  # exercise None, Sub, Up, Average, Paeth
        raw += bytes([ftype]) + _filter_line(ftype, pixels[y], prev, nch)
        prev = pixels[y]

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    data = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    gw, gh, gnch, out = png_decode(data)
    assert (gw, gh, gnch) == (w, h, nch)
    assert bytes(out) == b"".join(pixels)


def test_decode_image_rejects_non_png():
    with pytest.raises(NotImplementedError):
        _decode_image(b"\xff\xd8\xff\xe0 fake jpeg bytes")


def test_synth_media_deterministic_schema(spark):
    df = synth_media(spark, 48)
    assert df.count() == 48
    rows = {r["media_id"]: r for r in df.collect()}
    again = {r["media_id"]: r for r in synth_media(spark, 48).collect()}
    assert rows[7]["payload"] == again[7]["payload"]
    assert rows[0]["media_type"] == "image" and rows[1]["media_type"] == "audio"
    assert rows[1]["meta"]["width"] is None  # audio has no dims
    assert rows[0]["meta"]["codec"] == "png"


def test_extract_features_shape_and_determinism(spark):
    media = synth_media(spark, 48)
    planted = {r["media_id"]: r["meta"] for r in media.collect()}
    feats = extract_features(media).collect()
    assert len(feats) == 48
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["n_bytes"] > 0 and len(r["sha1"]) == 40
        if r["media_type"] == "image":
            # REAL decode: dims must equal the planted metadata, and the
            # histogram feature must be a true distribution (sums to 1)
            assert r["decoded_w"] == planted[r["media_id"]]["width"]
            assert r["decoded_h"] == planted[r["media_id"]]["height"]
            assert abs(sum(r["feature"]) - 1.0) < 1e-5
        else:
            assert r["decoded_w"] is None and r["decoded_h"] is None
    # deterministic across runs
    again = extract_features(synth_media(spark, 48)).collect()
    assert {r["media_id"]: r["sha1"] for r in feats} == {
        r["media_id"]: r["sha1"] for r in again
    }


def test_byte_capped_rechunking_small_cap(spark):
    # cap smaller than any single batch -> kernel must still emit every row once
    feats = extract_features(synth_media(spark, 48), max_batch_bytes=1024).collect()
    assert sorted(r["media_id"] for r in feats) == list(range(48))


def test_frame_sample_only_videos(spark):
    media = synth_media(spark, 48)
    frames = frame_sample(media, n_frames=4).collect()
    video_ids = {r["media_id"] for r in media.filter("media_type = 'video'").collect()}
    assert {r["media_id"] for r in frames} == video_ids
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r)
    for rows in per.values():
        assert sorted(x["frame_idx"] for x in rows) == [0, 1, 2, 3]
        assert all(len(x["frame"]) > 0 for x in rows)


def test_media_stats_prunes_payload(spark, tmp_path):
    # write to parquet so ReadSchema reflects actual scan pruning
    p = str(tmp_path / "media")
    synth_media(spark, 48).write.parquet(p)
    q = media_stats(spark.read.parquet(p))
    rs = read_schema(q)
    assert "payload" not in rs, rs
    got = {(r["media_type"], r["codec"]): r["n"] for r in q.collect()}
    assert got[("image", "png")] == 16
    assert got[("audio", "wav")] == 16
    assert got[("video", "av1")] == 16


def test_resize_images_real_roundtrip(spark):
    """resize is REAL: decode the synthesized PNG, nearest-neighbor sample,
    re-encode — the output payload must itself decode to the target dims and
    its pixels must equal the source pixels at the sampled grid positions."""
    from invoice_extraction_spark.operators.multimodal import (
        png_decode,
        resize_images,
        synth_media,
    )

    media = synth_media(spark, 12)
    rows = {
        r["media_id"]: r
        for r in resize_images(media, target_w=8, target_h=8).collect()
    }
    src = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'image'").collect()
    }
    assert set(rows) == set(src)  # every image row resized, nothing else
    for mid, r in rows.items():
        assert r["error"] is None
        w2, h2, nch2, pix2 = png_decode(bytes(r["payload"]))
        assert (w2, h2) == (8, 8)
        w, h, nch, pix = png_decode(src[mid])
        # spot-check the nearest-neighbor mapping on the corners
        for tx, ty in [(0, 0), (7, 0), (0, 7), (7, 7)]:
            sx, sy = tx * w // 8, ty * h // 8
            got = pix2[(ty * 8 + tx) * nch2 : (ty * 8 + tx) * nch2 + 3]
            want = pix[(sy * w + sx) * nch : (sy * w + sx) * nch + 3]
            assert bytes(got) == bytes(want), (mid, tx, ty)


def test_resize_images_poison_payload_degrades_to_error_row(spark):
    import pandas as pd

    from invoice_extraction_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1],
                "media_type": ["image"],
                "payload": [b"not a png"],
            }
        )
    )
    r = resize_images(df).first()
    assert r["payload"] is None and "ValueError" in r["error"]


def test_audio_rows_are_real_wav(spark):
    """Round 3: audio payloads are genuine PCM WAV — decoded duration
    equals the planted meta duration, and the RMS envelope matches an
    independent recomputation from the generator's sample formula."""
    import hashlib as _hl
    import struct as _struct

    from invoice_extraction_spark.operators.multimodal import (
        AUDIO_SAMPLE_RATE,
        FEATURE_DIM,
        _decode_audio,
        extract_features,
        synth_media,
    )

    media = synth_media(spark, 12)
    rows = {r["media_id"]: r for r in media.filter("media_type = 'audio'").collect()}
    assert rows  # i % 3 == 1 rows
    for mid, r in rows.items():
        payload = bytes(r["payload"])
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        dur, env = _decode_audio(payload)
        assert dur == r["meta"]["duration_ms"]
        assert len(env) == FEATURE_DIM and any(v > 0 for v in env)

        # independent envelope twin from the generator's sample formula
        h = _hl.sha256(f"42:{mid}".encode()).digest()
        dur_ms = 1000 + h[2] * 37
        n_samp = AUDIO_SAMPLE_RATE * dur_ms // 1000
        amp = 256 + h[5] * 32
        samples = [((j * (3 + h[6] % 5)) % 256 - 128) * amp // 128 for j in range(n_samp)]
        seg = max(len(samples) // FEATURE_DIM, 1)
        want = []
        for i in range(FEATURE_DIM):
            chunk = samples[i * seg : (i + 1) * seg]
            rms = (sum(s * s for s in chunk) / len(chunk)) ** 0.5 if chunk else 0.0
            want.append(round(rms / 32768.0, 6))
        assert env == want

    feats = {
        r["media_id"]: r["feature"]
        for r in extract_features(media).filter("media_type = 'audio'").collect()
    }
    for mid in rows:
        _dur, env = _decode_audio(bytes(rows[mid]["payload"]))
        assert [round(v, 6) for v in feats[mid]] == env


def test_non_wav_audio_is_loud():
    from invoice_extraction_spark.operators.multimodal import _decode_audio

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        _decode_audio(b"OggS fake opus container bytes")


# --- real video decode behind the ffmpeg slot (VERDICT r3 #7) --------------


def test_video_ffmpeg_absent_raises_loudly(spark):
    """No ffmpeg in this container: the real-decode path must fail LOUDLY,
    driver-side and through the Spark kernel — never silently downgrade."""
    from invoice_extraction_spark.operators.multimodal import _decode_video_ffmpeg

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        _decode_video_ffmpeg(b"\x00\x01fakevideo")

    from pyspark.errors import PythonException

    media = synth_media(spark, 9)
    with pytest.raises(PythonException, match="ffmpeg"):
        extract_features(media, video_decoder="ffmpeg").collect()

    with pytest.raises(ValueError, match="video_decoder"):
        extract_features(media, video_decoder="nope")


def test_video_ffmpeg_real_plumbing_with_standin_binaries(tmp_path, monkeypatch):
    """Drive _decode_video_ffmpeg through stand-in ffprobe/ffmpeg
    executables: probe JSON parsing, frame-pattern handoff, PNG frame
    decode and mean-luma feature assembly are all REAL — only the codec
    binary is simulated (it is not installable here)."""
    import os
    import stat
    import sys

    from invoice_extraction_spark.operators.multimodal import (
        FEATURE_DIM,
        _decode_video_ffmpeg,
        png_decode,
        png_encode,
    )

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    frame_paths = []
    for i, base in enumerate((10, 120, 250)):
        p = frames_dir / f"frame{i}.png"
        p.write_bytes(
            png_encode(8, 6, lambda x, y, b=base: (min(b + x, 255), b // 2, 0))
        )
        frame_paths.append(str(p))

    bindir = tmp_path / "bin"
    bindir.mkdir()
    probe = bindir / "ffprobe"
    probe.write_text(
        f"#!{sys.executable}\n"
        "print('{\"format\": {\"duration\": \"2.5\"}, \"streams\": "
        "[{\"codec_type\": \"video\", \"width\": 8, \"height\": 6}]}')\n"
    )
    mpeg = bindir / "ffmpeg"
    mpeg.write_text(
        f"#!{sys.executable}\n"
        "import shutil, sys\n"
        "pattern = sys.argv[-1]\n"
        f"for i, src in enumerate({frame_paths!r}, 1):\n"
        "    shutil.copy(src, pattern % i)\n"
    )
    for f in (probe, mpeg):
        f.chmod(f.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    dur, w, h, feat = _decode_video_ffmpeg(b"any payload")
    assert (dur, w, h) == (2500, 8, 6)
    assert len(feat) == FEATURE_DIM
    # per-frame mean luma, independently recomputed from the frame PNGs
    want = []
    for p in frame_paths:
        fw, fh, ch, px = png_decode(open(p, "rb").read())
        luma = px[::ch]
        want.append(round(sum(luma) / (len(luma) * 255.0), 6))
    assert feat[: len(want)] == want
    assert feat[len(want):] == [0.0] * (FEATURE_DIM - len(want))
