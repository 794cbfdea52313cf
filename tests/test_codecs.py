"""Pure-stdlib PNG / baseline-JPEG codecs (functions/codecs.py):
round-trips, all five PNG filter types against an independent per-pixel
reference, JPEG accuracy on smooth content, and honest out-of-scope
errors."""

import struct
import zlib

import numpy as np
import pytest

from vector_ray.functions.codecs import (
    _PNG_SIG,
    _png_chunk,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
    synth_jpeg,
    synth_png,
)


def test_png_round_trip_lossless():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_all_filter_types():
    """Scanlines cycling filters 0-4 must reconstruct exactly what an
    independent per-pixel reference produces."""
    h, w, nch = 10, 7, 3
    rng = np.random.default_rng(5)
    raw = bytearray()
    for r in range(h):
        raw.append(r % 5)
        raw += rng.integers(0, 256, w * nch, dtype=np.uint8).tobytes()
    raw = bytes(raw)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b""))

    stride = w * nch
    out = np.zeros((h, stride), np.int64)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        row = raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
        for x in range(stride):
            a = out[r][x - nch] if x >= nch else 0
            b = out[r - 1][x] if r > 0 else 0
            c = out[r - 1][x - nch] if (r > 0 and x >= nch) else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] + a
            elif ft == 2:
                v = row[x] + b
            elif ft == 3:
                v = row[x] + (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (
                    b if pb <= pc_ else c)
                v = row[x] + pred
            out[r][x] = v & 0xFF
    want = out.astype(np.uint8).reshape(h, w, nch)
    assert np.array_equal(decode_png(png), want)


def test_png_gray_and_rgba():
    rng = np.random.default_rng(2)
    for ctype, nch in [(0, 1), (6, 4)]:
        raw = bytearray()
        for _ in range(6):
            raw.append(0)
            raw += rng.integers(0, 256, 5 * nch, dtype=np.uint8).tobytes()
        ihdr = struct.pack(">IIBBBBB", 5, 6, 8, ctype, 0, 0, 0)
        png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _png_chunk(b"IEND", b""))
        assert decode_png(png).shape == (6, 5, 3)


def test_png_out_of_scope_raises():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)  # interlaced
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(b"")) + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(png)
    with pytest.raises(ValueError, match="PNG"):
        decode_png(b"nope")


def test_jpeg_smooth_accuracy_and_odd_dims():
    yy, xx = np.mgrid[0:24, 0:32].astype(np.float64)
    smooth = np.stack(
        [(xx * 3 + 20), (yy * 4 + 10), (xx + yy * 2 + 5)], axis=2
    ).clip(0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(smooth))
    err = np.abs(dec.astype(int) - smooth.astype(int))
    assert err.max() <= 14 and err.mean() < 4

    odd = np.random.default_rng(1).integers(0, 256, (13, 9, 3), np.uint8)
    assert decode_jpeg(encode_jpeg(odd)).shape == (13, 9, 3)


def test_jpeg_deterministic_fixtures():
    assert synth_jpeg(7) == synth_jpeg(7)
    assert synth_png(7) == synth_png(7)
    assert decode_jpeg(synth_jpeg(3, 20, 11)).shape == (11, 20, 3)


def test_jpeg_out_of_scope_raises():
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(b"nope")
    # flip the sampling factor to 4:2:0 in a real payload -> honest raise
    j = bytearray(synth_jpeg(1, 16, 16))
    sof = j.find(b"\xff\xc0")
    assert sof > 0
    j[sof + 11] = 0x22  # luma h/v sampling 2x2
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg(bytes(j))


def test_resize_and_features_png_jpeg(ray_session):
    """End-to-end actor-pool stages over real PNG/JPEG payloads."""
    import ray.data as rd

    from vector_ray.functions.multimodal import (
        extract_features,
        png_jpeg_media_table,
        resize_images,
    )

    ds = rd.from_arrow(png_jpeg_media_table(12, seed=9))
    feats = extract_features(ds, mode="real", concurrency=1).to_pandas()
    assert len(feats) == 12
    out = resize_images(ds, out_w=8, out_h=8, concurrency=1).to_pandas()
    assert out["resized"].all()
    # every resized payload decodes to 8x8 in its own format
    from vector_ray.functions.codecs import decode_jpeg as dj
    from vector_ray.functions.codecs import decode_png as dp

    for mt, p in zip(out["media_type"], out["payload"]):
        px = dp(p) if mt == "image/png" else dj(p)
        assert px.shape == (8, 8, 3)


# ---------------------------------------------------------------------------
# mp4 / ISO-BMFF container (round-4): box-level parse, no frame decode
# ---------------------------------------------------------------------------


def test_mp4_round_trip_fields():
    from vector_ray.functions.codecs import encode_mp4, parse_mp4

    tracks = [
        {
            "handler": b"vide", "codec": b"avc1", "width": 640,
            "height": 360, "timescale": 12288,
            "sample_deltas": [512, 512, 1024],
            "sample_bytes": [b"a" * 100, b"b" * 50, b"c" * 200],
        },
        {
            "handler": b"soun", "codec": b"mp4a", "width": 0, "height": 0,
            "timescale": 44100, "sample_deltas": [1024] * 5,
            "sample_bytes": [b"x" * 30] * 5,
        },
    ]
    info = parse_mp4(encode_mp4(tracks))
    assert info["brand"] == "isom"
    assert len(info["tracks"]) == 2
    v, a = info["tracks"]
    assert (v["handler"], v["codec"], v["width"], v["height"]) == (
        "vide", "avc1", 640, 360)
    assert v["n_samples"] == 3 and v["sample_bytes"] == 350
    assert v["max_sample_bytes"] == 200 and v["duration"] == 2048
    assert (a["handler"], a["codec"], a["n_samples"]) == ("soun", "mp4a", 5)
    assert a["sample_bytes"] == 150 and a["duration"] == 5120
    # movie duration = longest track in movie timescale (1000)
    assert info["duration"] == max(
        2048 * 1000 // 12288, 5120 * 1000 // 44100)


def test_mp4_synth_deterministic_and_audio_track():
    from vector_ray.functions.codecs import parse_mp4, synth_mp4

    assert synth_mp4(9) == synth_mp4(9)
    even = parse_mp4(synth_mp4(8))
    odd = parse_mp4(synth_mp4(9))
    assert [t["handler"] for t in even["tracks"]] == ["vide"]
    assert [t["handler"] for t in odd["tracks"]] == ["vide", "soun"]


def test_mp4_frame_decode_is_declared_stub():
    from vector_ray.functions.codecs import decode_mp4_frames, synth_mp4

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_mp4_frames(synth_mp4(1))


def test_mp4_malformed_raises():
    from vector_ray.functions.codecs import parse_mp4

    with pytest.raises(ValueError, match="moov"):
        parse_mp4(b"\x00\x00\x00\x08ftyp" + b"\xff" * 4)  # no moov box
    with pytest.raises(ValueError, match="malformed|missing"):
        parse_mp4(b"not an mp4 at all........")


def test_mp4_features_extractor_real_mode(ray_session):
    import ray.data as rd

    from vector_ray.functions.multimodal import (
        extract_features,
        mp4_media_table,
    )

    tbl = mp4_media_table(6, seed=3)
    out = extract_features(
        rd.from_arrow(tbl), mode="real", concurrency=1
    ).to_pandas()
    assert len(out) == 6
    feats = out["features"].tolist()
    for f in feats:
        assert f[0] == 3.0  # video flag
        assert f[1] > 0     # duration_s


# ---------------------------------------------------------------------------
# round-5: fragmented MP4 (moof/mdat)
# ---------------------------------------------------------------------------


def _one_track(deltas, sizes):
    return [dict(handler=b"vide", codec=b"avc1", width=64, height=48,
                 timescale=1000, sample_deltas=list(deltas),
                 sample_bytes=[bytes([65 + i]) * s
                               for i, s in enumerate(sizes)])]


def test_fmp4_stats_match_moov_resident():
    from vector_ray.functions.codecs import encode_fmp4, encode_mp4, parse_mp4

    tracks = _one_track([40, 40, 20, 40, 40], [10, 20, 5, 30, 15])
    classic = parse_mp4(encode_mp4(tracks))
    frag = parse_mp4(encode_fmp4(tracks, frag_samples=2))
    for k in ("handler", "codec", "width", "height", "timescale",
              "duration", "n_samples", "sample_bytes",
              "max_sample_bytes"):
        assert classic["tracks"][0][k] == frag["tracks"][0][k], k
    assert frag["fragmented"] and not classic["fragmented"]
    # 5 samples at 2/fragment -> 3 fragments, each one trun (= chunk run)
    assert frag["tracks"][0]["n_fragments"] == 3
    assert frag["tracks"][0]["n_chunks"] == 3
    # movie duration derived from fragment runs (mvhd carries 0)
    assert frag["duration"] == classic["duration"]


def test_fmp4_trex_defaults_path():
    from vector_ray.functions.codecs import encode_fmp4, parse_mp4

    # constant deltas equal the trex default -> truns omit per-sample
    # durations entirely; sizes still ride per sample
    tracks = _one_track([1024] * 7, [3, 1, 4, 1, 5, 9, 2])
    info = parse_mp4(encode_fmp4(tracks, frag_samples=3))
    t = info["tracks"][0]
    assert t["n_samples"] == 7
    assert t["duration"] == 7 * 1024
    assert t["sample_bytes"] == 3 + 1 + 4 + 1 + 5 + 9 + 2
    assert t["max_sample_bytes"] == 9


def test_synth_fmp4_two_tracks_and_features():
    from vector_ray.functions.codecs import parse_mp4, synth_fmp4
    from vector_ray.functions.multimodal import mp4_features

    info = parse_mp4(synth_fmp4(5))  # odd seed -> audio track too
    handlers = sorted(t["handler"] for t in info["tracks"])
    assert handlers == ["soun", "vide"]
    assert all(t["n_samples"] > 0 for t in info["tracks"])
    assert info["fragmented"] and info["duration"] > 0
    f = mp4_features(synth_fmp4(5))
    assert f[0] == 3.0 and f[1] > 0 and f[10] == 1.0


def test_fmp4_independent_parser_agrees():
    """The golden-side straight-line parser and the engine parser must
    agree field-for-field on fragmented payloads."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from make_goldens import _parse_mp4_independent

    from vector_ray.functions.codecs import parse_mp4, synth_fmp4

    for seed in (0, 1, 8, 13):
        p = synth_fmp4(seed)
        a, b = parse_mp4(p), _parse_mp4_independent(p)
        assert a["duration"] == b["duration"]
        assert a["timescale"] == b["timescale"]
        for ta, tb in zip(a["tracks"], b["tracks"]):
            for k in ("handler", "codec", "width", "height", "timescale",
                      "duration", "n_samples", "sample_bytes",
                      "max_sample_bytes", "n_chunks"):
                assert ta[k] == tb[k], (seed, k)
