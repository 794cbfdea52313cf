"""Generate frozen golden parquet files for the queries whose semantics
are not SQL-expressible (seeded-rng LSH pruning, minhash/simhash word
hashing, the deterministic fake media features).

Each golden is computed by an INDEPENDENT straight-line reimplementation
(per-row Python loops, no vector_ray imports except the shared fixture
generator for multimodal) of the same published algorithm definition, so
a golden match means two implementations agree — not that one file was
copied from the other. The driver's oracle SQL for these queries is
``SELECT * FROM read_parquet('<golden>')``.

Run from the repo root after any testdata regeneration:

    python tools/make_goldens.py

``tests/test_goldens.py`` recomputes these and fails loudly if the
committed goldens have drifted from the current /root/testdata inputs.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")
SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness-comparison scale

U64 = 1 << 64
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
SHINGLE_MULT = 0x100000001B3
BAND_MULT = 0x9E3779B97F4A7C15
MERSENNE = (1 << 61) - 1


def fnv1a(s: str) -> int:
    out = FNV_OFFSET
    for byte in s.encode():
        out = ((out ^ byte) * FNV_PRIME) % U64
    return out


def to_i64(v: int) -> int:
    return v - U64 if v >= (1 << 63) else v


def word_hashes(text: str) -> list[int]:
    return [fnv1a(w) for w in text.split(" ")]


def shingles(h: list[int], k: int = 3) -> list[int]:
    L = len(h)
    n_sh = max(L - k + 1, min(L, 1))
    out = []
    for start in range(n_sh):
        s = 0
        for j in range(k):
            idx = min(start + j, L - 1)
            s = (s * SHINGLE_MULT + h[idx]) % U64
        out.append(s)
    return out


def simhash64(text: str) -> int:
    votes = [0] * 64
    for h in word_hashes(text):
        for bit in range(64):
            votes[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if votes[bit] > 0:
            out |= 1 << bit
    return out


def golden_simhash(docs: pa.Table) -> pa.Table:
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array([to_i64(simhash64(t)) for t in texts], pa.int64()),
        }
    )


def minhash_sig(sh: list[int], a: np.ndarray, b: np.ndarray) -> list[int]:
    num_perm = len(a)
    sig = [U64 - 1] * num_perm
    for s in sh:
        for p in range(num_perm):
            # emulate numpy uint64 wraparound arithmetic exactly
            v = ((int(a[p]) * s) % U64 + int(b[p])) % U64 % MERSENNE
            if v < sig[p]:
                sig[p] = v
    return sig


def golden_minhash_pairs(
    docs: pa.Table, num_perm=64, bands=16, shingle_k=3, threshold=0.4, seed=7
) -> pa.Table:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    ids = docs["doc_id"].to_pylist()
    sigs = [
        minhash_sig(shingles(word_hashes(t), shingle_k), a, b)
        for t in docs["text"].to_pylist()
    ]
    rows_per_band = num_perm // bands
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, sig in enumerate(sigs):
        for band in range(bands):
            acc = 0
            for j in range(rows_per_band):
                acc = (acc * BAND_MULT + sig[band * rows_per_band + j]) % U64
            buckets.setdefault((band, to_i64(acc)), []).append(i)
    seen: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        for xi in range(len(members)):
            for yi in range(xi + 1, len(members)):
                x, y = members[xi], members[yi]
                if ids[x] == ids[y]:
                    continue
                est = sum(sx == sy for sx, sy in zip(sigs[x], sigs[y])) / num_perm
                if est >= threshold:
                    key = (min(ids[x], ids[y]), max(ids[x], ids[y]))
                    seen.setdefault(key, float(np.round(est, 4)))
    pairs = sorted(seen.items())
    return pa.table(
        {
            "doc_a": pa.array([p[0][0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[0][1] for p in pairs], pa.int64()),
            "est_jaccard": pa.array([p[1] for p in pairs], pa.float64()),
        }
    )


def round_half_away(x: float, nd: int) -> float:
    import math

    scale = 10.0 ** nd
    return math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)


def golden_ann_lsh(
    emb: pa.Table, k=10, n_planes=8, hamming_radius=1, seed=11, round_to=6
) -> pa.Table:
    ids = emb["vec_id"].to_pylist()
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in emb["embedding"].to_pylist()]
    )
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    q = mat[ids.index(0)]
    dim = mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket(v: np.ndarray) -> int:
        bits = (planes @ v) > 0
        return int(sum(1 << i for i, on in enumerate(bits) if on))

    q_bucket = bucket(q)
    allowed = {q_bucket}
    frontier = {q_bucket}
    for _ in range(hamming_radius):
        nxt = set()
        for bk in frontier:
            for i in range(n_planes):
                nxt.add(bk ^ (1 << i))
        allowed |= nxt
        frontier = nxt
    scored = []
    for i, vid in enumerate(ids):
        if bucket(mat[i]) in allowed:
            s = float(mat[i] @ q)
            scored.append((round_half_away(s, round_to), vid))
    scored.sort(key=lambda t: (-t[0], t[1]))
    top = scored[:k]
    return pa.table(
        {
            "vec_id": pa.array([t[1] for t in top], pa.int64()),
            "score": pa.array([t[0] for t in top], pa.float64()),
        }
    )


def golden_embedding_dups_lsh(
    emb: pa.Table, threshold=0.4, bands=8, n_planes=6, seed=11, round_to=6
) -> pa.Table:
    """Banded random-hyperplane LSH near-dup pairs: rows sharing any
    band bucket are candidates, verified with exact cosine, one row per
    pair. Assumes no bucket exceeds the 2048-row cap at sf0.01 (checked
    by an assert)."""
    ids = emb["vec_id"].to_pylist()
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in emb["embedding"].to_pylist()]
    )
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    dim = mat.shape[1]
    rng = np.random.default_rng(seed)
    band_planes = [rng.standard_normal((n_planes, dim)) for _ in range(bands)]
    buckets: dict[tuple[int, int], list[int]] = {}
    for band, planes in enumerate(band_planes):
        for i in range(mat.shape[0]):
            bits = (planes @ mat[i]) > 0
            bk = int(sum(1 << j for j, on in enumerate(bits) if on))
            buckets.setdefault((band, bk), []).append(i)
    seen: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        assert len(members) <= 2048, "bucket exceeds the implementation cap"
        for xi in range(len(members)):
            for yi in range(xi + 1, len(members)):
                x, y = members[xi], members[yi]
                if ids[x] == ids[y]:
                    continue
                cos = round_half_away(round_half_away(float(mat[x] @ mat[y]), 9), round_to)
                if cos >= threshold:
                    key = (min(ids[x], ids[y]), max(ids[x], ids[y]))
                    seen.setdefault(key, cos)
    pairs = sorted(seen.items())
    return pa.table(
        {
            "doc_a": pa.array([p[0][0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[0][1] for p in pairs], pa.int64()),
            "cosine": pa.array([p[1] for p in pairs], pa.float64()),
        }
    )


def golden_multimodal(n=200, seed=3, feature_dim=16) -> pa.Table:
    # the fixture generator is shared (it IS the input definition); the
    # feature computation below is the independent reimplementation
    from vector_ray.functions.multimodal import fake_media_table

    media = fake_media_table(n, seed=seed)
    out_ids, out_types, out_bytes, digests, argmaxes = [], [], [], [], []
    for mid, mtype, payload in zip(
        media["media_id"].to_pylist(),
        media["media_type"].to_pylist(),
        media["payload"].to_pylist(),
    ):
        counts = [0] * feature_dim
        for byte in payload:
            counts[byte // (256 // feature_dim)] += 1
        feats = [np.float32(c / max(len(payload), 1)) for c in counts]
        digest = 0.0
        for i, f in enumerate(feats):
            digest += float(f) * (i + 1)
        best = 0
        for i in range(1, feature_dim):
            if feats[i] > feats[best]:
                best = i
        out_ids.append(mid)
        out_types.append(mtype)
        out_bytes.append(len(payload))
        digests.append(round_half_away(round_half_away(digest, 9), 6))
        argmaxes.append(best)
    return pa.table(
        {
            "media_id": pa.array(out_ids, pa.string()),
            "media_type": pa.array(out_types, pa.string()),
            "payload_bytes": pa.array(out_bytes, pa.int64()),
            "feat_digest": pa.array(digests, pa.float64()),
            "feat_argmax": pa.array(argmaxes, pa.int64()),
        }
    )


def _parse_wav_independent(payload: bytes):
    """RIFF/WAVE parse WITHOUT the stdlib wave module: walk the chunk
    list with struct, pull fmt + data. Returns (mono float64 samples,
    rate, n_channels)."""
    import struct

    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos, rate, nch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _, nch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    assert bits == 16 and data is not None
    x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate, nch


def _parse_bmp_independent(payload: bytes):
    """BMP parse via explicit little-endian int reads (no struct.unpack
    of whole headers): returns uint8 RGB (h, w, 3)."""

    def u32(o):
        return int.from_bytes(payload[o : o + 4], "little")

    def i32(o):
        return int.from_bytes(payload[o : o + 4], "little", signed=True)

    def u16(o):
        return int.from_bytes(payload[o : o + 2], "little")

    assert payload[:2] == b"BM"
    off = u32(10)
    w, h = i32(18), i32(22)
    assert u16(28) == 24 and u32(30) == 0
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for r in range(h):
        row = payload[off + r * stride : off + r * stride + w * 3]
        px = np.frombuffer(row, np.uint8).reshape(w, 3)[:, ::-1]  # BGR->RGB
        rows.append(px)
    img = np.stack(rows)
    return img[::-1] if bottom_up else img


def golden_media_real(n=200, seed=11, dim=16) -> pa.Table:
    """Independent recomputation of q_media_features_wavbmp: payloads
    come from the shared fixture generator (it IS the input definition);
    the header parsing + feature math below never touch
    vector_ray.functions.multimodal's decoders."""
    from vector_ray.functions.multimodal import real_media_table

    media = real_media_table(n, seed=seed)
    ids, types, nbytes, digests, argmaxes = [], [], [], [], []
    wvec = np.arange(1, dim + 1, dtype=np.float64)
    for mid, mtype, payload in zip(
        media["media_id"].to_pylist(),
        media["media_type"].to_pylist(),
        media["payload"].to_pylist(),
    ):
        f = np.zeros(dim, np.float64)
        if mtype == "audio/wav":
            x, rate, nch = _parse_wav_independent(payload)
            segs = np.array_split(x, 8)
            f[:8] = [np.sqrt(np.mean(s * s)) if len(s) else 0.0 for s in segs]
            f[8] = 1.0
            f[9] = nch
            f[10] = rate / 48000.0
            f[11] = len(x) / rate
            f[12] = np.sqrt(np.mean(x * x)) if len(x) else 0.0
            f[13] = np.max(np.abs(x)) if len(x) else 0.0
            f[14] = (
                float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
                if len(x) > 1
                else 0.0
            )
        else:
            px = _parse_bmp_independent(payload).astype(np.float64)
            hh, ww, _ = px.shape
            lum = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
            hist, _ = np.histogram(lum, bins=8, range=(0, 256))
            f[:8] = hist / lum.size
            f[8] = 2.0
            f[9] = ww / 1024.0
            f[10] = hh / 1024.0
            f[11] = ww / hh
            f[12:15] = px.reshape(-1, 3).mean(axis=0) / 255.0
        f32 = f.astype(np.float32)
        digest = float(f32.astype(np.float64) @ wvec)
        ids.append(mid)
        types.append(mtype)
        nbytes.append(len(payload))
        digests.append(round_half_away(round_half_away(digest, 9), 6))
        argmaxes.append(int(np.argmax(f32)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "payload_bytes": pa.array(nbytes, pa.int64()),
            "feat_digest": pa.array(digests, pa.float64()),
            "feat_argmax": pa.array(argmaxes, pa.int64()),
        }
    )


def golden_media_resize(n=200, seed=11, out_w=16, out_h=16) -> pa.Table:
    """Independent recomputation of q_media_resize_bmp: per-pixel Python
    loops for both the resize and the re-encode, then md5."""
    import hashlib

    from vector_ray.functions.multimodal import real_media_table

    media = real_media_table(n, seed=seed)
    ids, types, widths, heights, resized, md5s = [], [], [], [], [], []
    for mid, mtype, payload in zip(
        media["media_id"].to_pylist(),
        media["media_type"].to_pylist(),
        media["payload"].to_pylist(),
    ):
        if mtype == "image/bmp":
            px = _parse_bmp_independent(payload)  # (h, w, 3) RGB
            h, w, _ = px.shape
            # nearest-neighbor, explicit loops
            out_rows = []
            for r in range(out_h):
                sr = (r * h) // out_h
                row = []
                for c in range(out_w):
                    sc = (c * w) // out_w
                    rgb = px[sr][sc]
                    row.append(bytes((int(rgb[2]), int(rgb[1]), int(rgb[0]))))
                out_rows.append(b"".join(row))
            pad = b"\x00" * ((-(out_w * 3)) % 4)
            body = b"".join(out_rows[r] + pad for r in range(out_h - 1, -1, -1))
            import struct as _s

            off = 54
            enc = (
                _s.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
                + _s.pack(
                    "<IiiHHIIiiII",
                    40, out_w, out_h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
                )
                + body
            )
            widths.append(out_w)
            heights.append(out_h)
            resized.append(True)
            md5s.append(hashlib.md5(enc).hexdigest())
        else:
            widths.append(0)
            heights.append(0)
            resized.append(False)
            md5s.append(hashlib.md5(payload).hexdigest())
        ids.append(mid)
        types.append(mtype)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "width": pa.array(np.array(widths, np.int32)),
            "height": pa.array(np.array(heights, np.int32)),
            "resized": pa.array(resized, pa.bool_()),
            "payload_md5": pa.array(md5s, pa.string()),
        }
    )


def golden_media_resample(n=200, seed=11, out_rate=16000) -> pa.Table:
    """Independent recomputation of q_media_resample_wav: RIFF chunk
    walker + per-sample Python loop + hand-built WAV container (no
    stdlib wave module), then md5."""
    import hashlib
    import struct as _s

    from vector_ray.functions.multimodal import real_media_table

    media = real_media_table(n, seed=seed)
    ids, types, rates, flags, md5s = [], [], [], [], []
    for mid, mtype, payload in zip(
        media["media_id"].to_pylist(),
        media["media_type"].to_pylist(),
        media["payload"].to_pylist(),
    ):
        if mtype == "audio/wav":
            x, rate, _ = _parse_wav_independent(payload)
            n_out = max(1, len(x) * out_rate // rate)
            pcm = bytearray()
            for i in range(n_out):
                j = min((i * rate) // out_rate, len(x) - 1)
                v = x[j] * 32768.0
                v = -32768.0 if v < -32768.0 else (32767.0 if v > 32767.0 else v)
                pcm += _s.pack("<h", int(v))
            # hand-built PCM16 mono RIFF container
            data = bytes(pcm)
            fmt = _s.pack("<HHIIHH", 1, 1, out_rate, out_rate * 2, 2, 16)
            body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
            body += b"data" + _s.pack("<I", len(data)) + data
            enc = b"RIFF" + _s.pack("<I", len(body)) + body
            rates.append(out_rate)
            flags.append(True)
            md5s.append(hashlib.md5(enc).hexdigest())
        else:
            rates.append(0)
            flags.append(False)
            md5s.append(hashlib.md5(payload).hexdigest())
        ids.append(mid)
        types.append(mtype)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "sample_rate": pa.array(np.array(rates, np.int32)),
            "resampled": pa.array(flags, pa.bool_()),
            "payload_md5": pa.array(md5s, pa.string()),
        }
    )


def _fmix64_int(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) % U64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) % U64
    h ^= h >> 33
    return h


def golden_agg_sketch(events: pa.Table) -> pa.Table:
    """Independent recomputation of q_agg_sketch_events: HyperLogLog
    (P=12, fmix64 over FNV-1a of the value's string form) + log-linear
    histogram quantiles (K=7 mantissa bits via math.frexp), all
    per-row Python loops and exact-int register/denominator math."""
    import math

    P, M = 12, 1 << 12
    SUB, OFF = 1 << 7, 1100
    groups: dict[str, dict] = {}
    for et, uid, val in zip(
        events["event_type"].to_pylist(),
        events["user_id"].to_pylist(),
        events["value"].to_pylist(),
    ):
        g = groups.setdefault(et, {"reg": [0] * M, "hist": {}, "n": 0})
        h = _fmix64_int(fnv1a(str(uid)))
        ridx = h >> (64 - P)
        w = (h << P) % U64
        rho = (64 + 1 - w.bit_length()) if w > 0 else (64 - P) + 1
        if rho > g["reg"][ridx]:
            g["reg"][ridx] = rho
        v = float(val)
        if v == 0.0:
            bix = 0
        else:
            mant, exp = math.frexp(abs(v))
            sub = int(math.floor((mant - 0.5) * (2 * SUB)))
            pidx = (exp + OFF) * SUB + sub
            bix = -pidx if v < 0 else pidx
        g["hist"][bix] = g["hist"].get(bix, 0) + 1
        g["n"] += 1

    alpha = 0.7213 / (1 + 1.079 / M)
    shift = (64 - P) + 1

    def estimate(reg) -> int:
        denom, zeros = 0, 0
        for r in reg:
            denom += 1 << (shift - r)
            if r == 0:
                zeros += 1
        e = alpha * M * M * float(1 << shift) / float(denom)
        if e <= 2.5 * M and zeros:
            e = M * math.log(M / zeros)
        return int(math.floor(e + 0.5))

    def quantile(hist, n, q) -> float:
        rank = int(math.floor(q * (n - 1)))
        cum = 0
        for bix in sorted(hist):
            cum += hist[bix]
            if cum >= rank + 1:
                if bix == 0:
                    return 0.0
                sign = -1.0 if bix < 0 else 1.0
                p = -bix if bix < 0 else bix
                return sign * math.ldexp(
                    0.5 + (2 * (p % SUB) + 1) / (4.0 * SUB), p // SUB - OFF
                )
        raise AssertionError("rank beyond histogram")

    ets = sorted(groups)
    return pa.table(
        {
            "event_type": pa.array(ets, pa.string()),
            "nd_users": pa.array(
                [estimate(groups[e]["reg"]) for e in ets], pa.int64()
            ),
            "ap50": pa.array(
                [round_half_away(quantile(groups[e]["hist"], groups[e]["n"], 0.5), 6) for e in ets],
                pa.float64(),
            ),
            "ap90": pa.array(
                [round_half_away(quantile(groups[e]["hist"], groups[e]["n"], 0.9), 6) for e in ets],
                pa.float64(),
            ),
            "ap99": pa.array(
                [round_half_away(quantile(groups[e]["hist"], groups[e]["n"], 0.99), 6) for e in ets],
                pa.float64(),
            ),
        }
    )



def golden_pack_documents(chunk_len: int = 2048) -> pa.Table:
    """Independent next-fit document packing over the tokenized-sequence
    corpus: WHOLE docs in ascending doc_id order per source; new bin when
    the doc does not fit; an oversize doc gets its own bin. Straight-line
    per-row loop (the engine version is a searchsorted jump)."""
    import glob

    from vector_ray import datagen  # shared fixture generator only

    datagen.ensure_corpus("sf0.01")
    files = sorted(glob.glob(datagen.sequences_dir("sf0.01") + "/*.parquet"))
    tbl = pa.concat_tables(
        [pq.read_table(f, columns=["doc_id", "source", "n_tok"]) for f in files]
    )
    rows = sorted(
        zip(
            tbl["source"].to_pylist(),
            tbl["doc_id"].to_pylist(),
            tbl["n_tok"].to_pylist(),
        )
    )
    out_src, out_id, out_len, out_bin, out_pos = [], [], [], [], []
    state: dict = {}  # source -> (bin, fill, pos)
    for src_v, did, nt in rows:
        b, fill, pos = state.get(src_v, (0, 0, 0))
        if fill and fill + nt > chunk_len:
            b, fill, pos = b + 1, 0, 0
        out_src.append(src_v)
        out_id.append(did)
        out_len.append(nt)
        out_bin.append(b)
        out_pos.append(pos)
        state[src_v] = (b, fill + nt, pos + 1)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_tok": pa.array(out_len, pa.int32()),
            "bin_id": pa.array(out_bin, pa.int64()),
            "bin_pos": pa.array(out_pos, pa.int64()),
        }
    )




def _bpe_reference(num_merges: int = 12, new_id_base: int = 4096):
    """Independent straight-line BPE over the byte-projected (% 256)
    token stream of the deterministic doc sample (numeric id % 20 == 0):
    count ALL adjacent pairs per round, accept the max-count pair (ties
    to the smallest (a, b)), apply left-to-right. Per-row Python loops
    throughout — nothing shared with vector_ray/functions/bpe.py."""
    import glob

    from vector_ray import datagen  # shared fixture generator only

    datagen.ensure_corpus("sf0.01")
    files = sorted(glob.glob(datagen.sequences_dir("sf0.01") + "/*.parquet"))
    seqs, ids = [], []
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "tokens"])
        for did, toks in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()):
            if int(did[4:]) % 20 == 0:
                seqs.append([int(x) % 256 for x in toks])
                ids.append(did)
    before = [len(s) for s in seqs]
    rows = []
    for k in range(num_merges):
        counts = {}
        for s in seqs:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        new_id = new_id_base + k
        rows.append((k, a, b, new_id, c))
        for si, s in enumerate(seqs):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[si] = out
    return rows, ids, before, seqs


def golden_bpe_train(num_merges: int = 12, new_id_base: int = 4096) -> pa.Table:
    rows, _, _, _ = _bpe_reference(num_merges, new_id_base)
    return pa.table(
        {
            "merge_idx": pa.array([r[0] for r in rows], pa.int32()),
            "a": pa.array([r[1] for r in rows], pa.int64()),
            "b": pa.array([r[2] for r in rows], pa.int64()),
            "new_id": pa.array([r[3] for r in rows], pa.int64()),
            "count": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def golden_bpe_encode(num_merges: int = 12, new_id_base: int = 4096) -> pa.Table:
    """Per-doc compression from applying the learned merges: byte
    length before/after — the deployment half of the BPE golden."""
    _, ids, before, seqs = _bpe_reference(num_merges, new_id_base)
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    return pa.table(
        {
            "doc_id": pa.array([ids[i] for i in order], pa.string()),
            "n_before": pa.array([before[i] for i in order], pa.int32()),
            "n_after": pa.array([len(seqs[i]) for i in order], pa.int32()),
        }
    )


def golden_pca_whiten(k: int = 8, round_to: int = 6) -> pa.Table:
    """Independent straight-line PCA whitening over the sf0.01
    embeddings: mean and covariance accumulated with per-row Python
    loops (outer products), covariance rounded to 6 decimals (the
    determinism pin shared with functions/embeddings.py — both sides'
    eigendecomposition then sees byte-identical input), numpy eigh +
    the positive-max-component sign convention, per-row projection."""
    import numpy as np

    t = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_pylist()
    rows = [[float(v) for v in r] for r in t["embedding"].to_pylist()]
    n, d = len(rows), len(rows[0])
    mean = [0.0] * d
    for r in rows:
        for j in range(d):
            mean[j] += r[j]
    mean = [m / n for m in mean]
    cov = [[0.0] * d for _ in range(d)]
    for r in rows:
        c = [r[j] - mean[j] for j in range(d)]
        for a in range(d):
            ca = c[a]
            row = cov[a]
            for b in range(d):
                row[b] += ca * c[b]
    scale = 10.0 ** 6
    covm = np.array(
        [
            [
                np.sign(v / (n - 1))
                * np.floor(abs(v / (n - 1)) * scale + 0.5)
                / scale
                for v in row
            ]
            for row in cov
        ]
    )
    vals, vecs = np.linalg.eigh(covm)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    for j in range(vecs.shape[1]):
        i = int(np.argmax(np.abs(vecs[:, j])))
        if vecs[i, j] < 0:
            vecs[:, j] = -vecs[:, j]
    sc = 1.0 / np.sqrt(np.maximum(vals, 0) + 1e-9)
    out = []
    r9 = 10.0 ** 9
    r6 = 10.0 ** round_to
    for r in rows:
        c = np.array([r[j] - mean[j] for j in range(d)])
        y = (c @ vecs) * sc
        y = np.sign(y) * np.floor(np.abs(y) * r9 + 0.5) / r9
        y = np.sign(y) * np.floor(np.abs(y) * r6 + 0.5) / r6
        out.append([float(v) for v in y])
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "whitened": pa.array(out, pa.list_(pa.float64())),
        }
    )




# ---------------------------------------------------------------------------
# compression ratio (zlib deflate) — straight-line per-row loop
# ---------------------------------------------------------------------------


def golden_compression(docs: pa.Table) -> pa.Table:
    import zlib

    ids, n_raws, n_comps, ratios = [], [], [], []
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        raw = (text or "").encode("utf-8")
        n_raw = len(raw)
        n_comp = len(zlib.compress(raw, 6))
        ratio = round_half_away(
            round_half_away(n_comp / n_raw, 9), 4) if n_raw > 0 else 0.0
        ids.append(did)
        n_raws.append(n_raw)
        n_comps.append(n_comp)
        ratios.append(ratio)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_raw": pa.array(n_raws, pa.int64()),
            "n_comp": pa.array(n_comps, pa.int64()),
            "ratio": pa.array(ratios, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# product quantization — independent integer reimplementation
# (SQ8 grid, hash-bottom-k sample, integer Lloyd, ADC) with per-row
# loops and Python-int arithmetic throughout.
# ---------------------------------------------------------------------------


def _pq_ref_quantize_row(vec, lo, hi):
    import math

    out = []
    for x, l, h in zip(vec, lo, hi):
        span = h - l
        if span > 0:
            q = round_half_away((x - l) * 255.0 / span, 9)
            q = math.copysign(math.floor(abs(q) + 0.5), q)
            q = min(max(q, 0.0), 255.0)
            out.append(int(q))
        else:
            out.append(0)
    return out


def _pq_ref_model(emb: pa.Table, m=8, kk=16, sample_size=512, iters=4):
    ids = emb["vec_id"].to_pylist()
    vecs = emb["embedding"].to_pylist()
    d = len(vecs[0])
    dsub = d // m
    lo = [min(v[i] for v in vecs) for i in range(d)]
    hi = [max(v[i] for v in vecs) for i in range(d)]
    qrows = {vid: _pq_ref_quantize_row(v, lo, hi) for vid, v in zip(ids, vecs)}
    order = sorted(ids, key=lambda vid: ((vid * 2654435761) % (1 << 32), vid))
    samp = [qrows[vid] for vid in order[:sample_size]]
    n = len(samp)
    kk = min(kk, n)
    init_idx = np.linspace(0, n - 1, kk).astype(int)
    books = []
    for j in range(m):
        sub = [row[j * dsub:(j + 1) * dsub] for row in samp]
        cent = [list(sub[i]) for i in init_idx]
        for _ in range(iters):
            assign = []
            for row in sub:
                best, bestd = 0, None
                for ci, c in enumerate(cent):
                    d2 = sum((a - b) ** 2 for a, b in zip(row, c))
                    if bestd is None or d2 < bestd:
                        best, bestd = ci, d2
                assign.append(best)
            for ci in range(kk):
                members = [sub[i] for i, a in enumerate(assign) if a == ci]
                if members:
                    cnt = len(members)
                    cent[ci] = [
                        (2 * sum(col) + cnt) // (2 * cnt)
                        for col in zip(*members)
                    ]
        books.append(cent)
    return lo, hi, books, dsub


def _pq_ref_code(qrow, books, dsub):
    code = []
    for j, cent in enumerate(books):
        sub = qrow[j * dsub:(j + 1) * dsub]
        best, bestd = 0, None
        for ci, c in enumerate(cent):
            d2 = sum((a - b) ** 2 for a, b in zip(sub, c))
            if bestd is None or d2 < bestd:
                best, bestd = ci, d2
        code.append(best)
    return code


def golden_pq_codes(emb: pa.Table) -> pa.Table:
    lo, hi, books, dsub = _pq_ref_model(emb)
    ids, codes = [], []
    for vid, v in zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist()):
        ids.append(vid)
        codes.append(_pq_ref_code(_pq_ref_quantize_row(v, lo, hi), books, dsub))
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "code": pa.array(codes, pa.list_(pa.int64())),
        }
    )


def golden_pq_topk(emb: pa.Table, k=10) -> pa.Table:
    lo, hi, books, dsub = _pq_ref_model(emb)
    qvec = None
    for vid, v in zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist()):
        if vid == 0:
            qvec = v
            break
    qq = _pq_ref_quantize_row(qvec, lo, hi)
    lut = [
        [
            sum((a - b) ** 2
                for a, b in zip(qq[j * dsub:(j + 1) * dsub], c))
            for c in cent
        ]
        for j, cent in enumerate(books)
    ]
    scored = []
    for vid, v in zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist()):
        code = _pq_ref_code(_pq_ref_quantize_row(v, lo, hi), books, dsub)
        dist = sum(lut[j][c] for j, c in enumerate(code))
        scored.append((dist, vid))
    scored.sort()
    top = scored[:k]
    return pa.table(
        {
            "vec_id": pa.array([vid for _, vid in top], pa.int64()),
            "dist": pa.array([d for d, _ in top], pa.int64()),
        }
    )


def _parse_png_independent(payload: bytes) -> np.ndarray:
    """Independent straight-line PNG decode: explicit chunk walk +
    per-pixel filter reconstruction (nested Python loops, nothing like
    the engine's per-row numpy path). 8-bit grey/RGB/RGBA."""
    import zlib

    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = ctype = None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            assert body[8] == 8 and body[12] == 0
            ctype = body[9]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    stride = w * nch
    out = [[0] * stride for _ in range(h)]
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
            elif ft == 4:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                v = row[x] + pred
            else:
                raise ValueError(f"filter {ft}")
            out[r][x] = v & 0xFF
    px = np.array(out, np.uint8).reshape(h, w, nch)
    if nch == 1:
        px = np.repeat(px, 3, axis=2)
    elif nch == 4:
        px = px[..., :3]
    return np.ascontiguousarray(px)


_JPEG_ZIGZAG = [
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _parse_jpeg_independent(payload: bytes) -> np.ndarray:
    """Independent straight-line baseline-JPEG decode: code-STRING
    huffman maps, a bit-list reader, per-block Python loops (structure
    unlike the engine's table-dict / accumulator / stacked-matmul
    path). The 8x8 DCT basis matrix and YCbCr constants are the shared
    public T.81/JFIF definitions; per-block (C.T @ B) @ C matches the
    engine's documented association so pixels are bit-identical."""
    assert payload[:2] == b"\xff\xd8"
    C = np.array([
        [
            ((1.0 / 8.0) ** 0.5 if u == 0 else (2.0 / 8.0) ** 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ], np.float64)
    pos = 2
    qts, dcs, acs = {}, {}, {}
    comps = None
    h = w = None
    scan = None
    scan_comps = None
    while pos + 4 <= len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            off = 0
            while off < len(body):
                tq = body[off] & 0x0F
                qts[tq] = list(body[off + 1 : off + 65])
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                # code-string map: "0", "10", ... -> value
                table = {}
                code = 0
                k = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[format(code, f"0{ln}b")] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                (acs if tc_th >> 4 else dcs)[tc_th & 0x0F] = table
                off += 17 + nv
        elif marker == 0xC0:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = [
                (body[6 + 3 * c], body[8 + 3 * c]) for c in range(nc)
            ]
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = {
                body[1 + 2 * c]: (body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                for c in range(ns)
            }
            scan = payload[pos:]
            break
    # unstuff and expand the entropy segment to a bit string
    bits_l = []
    i = 0
    while i < len(scan):
        byte = scan[i]
        if byte == 0xFF:
            nxt = scan[i + 1] if i + 1 < len(scan) else 0
            if nxt == 0x00:
                bits_l.append(format(byte, "08b"))
                i += 2
                continue
            break  # marker ends the scan
        bits_l.append(format(byte, "08b"))
        i += 1
    bits = "".join(bits_l)
    bp = 0

    def read_bits(n):
        nonlocal bp
        v = int(bits[bp : bp + n], 2) if n else 0
        bp += n
        return v

    def read_code(table):
        nonlocal bp
        for ln in range(1, 17):
            cand = bits[bp : bp + ln]
            if cand in table:
                bp += ln
                return table[cand]
        raise ValueError("bad huffman code")

    def extend(v, cat):
        if cat == 0:
            return 0
        return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1

    bh, bw = -(-h // 8), -(-w // 8)
    nmcu = bh * bw
    ncomp = len(comps)
    planes = [np.zeros((bh * 8, bw * 8), np.float64) for _ in range(ncomp)]
    preds = [0] * ncomp
    for m in range(nmcu):
        for ci, (cid, tq) in enumerate(comps):
            td, ta = scan_comps[cid]
            cat = read_code(dcs[td])
            preds[ci] += extend(read_bits(cat), cat)
            zz = [0] * 64
            zz[0] = preds[ci]
            k = 1
            while k < 64:
                rs = read_code(acs[ta])
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += rs >> 4
                zz[k] = extend(read_bits(rs & 0x0F), rs & 0x0F)
                k += 1
            block = np.zeros((8, 8), np.float64)
            for k in range(64):
                natural = _JPEG_ZIGZAG[k]
                block[natural // 8][natural % 8] = zz[k] * qts[tq][k]
            spatial = np.matmul(np.matmul(C.T, block), C)
            r0, c0 = (m // bw) * 8, (m % bw) * 8
            planes[ci][r0 : r0 + 8, c0 : c0 + 8] = spatial
    planes = [p[:h, :w] + 128.0 for p in planes]
    if ncomp == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    Y, Cb, Cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = Y + 1.402 * Cr
    g = Y - 0.344136 * Cb - 0.714136 * Cr
    b = Y + 1.772 * Cb
    px = np.stack([r, g, b], axis=2)
    return np.clip(np.round(px), 0, 255).astype(np.uint8)


def golden_media_png_jpeg(n=200, seed=17, dim=16) -> pa.Table:
    """Independent recomputation of q_media_features_png: payloads from
    the shared fixture generator; decode via the independent parsers
    above; same public feature math as golden_media_real images."""
    from vector_ray.functions.multimodal import png_jpeg_media_table

    media = png_jpeg_media_table(n, seed=seed)
    ids, types, nbytes, digests, argmaxes = [], [], [], [], []
    wvec = np.arange(1, dim + 1, dtype=np.float64)
    for mid, mtype, payload in zip(
        media["media_id"].to_pylist(),
        media["media_type"].to_pylist(),
        media["payload"].to_pylist(),
    ):
        px = (
            _parse_png_independent(payload)
            if mtype == "image/png"
            else _parse_jpeg_independent(payload)
        ).astype(np.float64)
        hh, ww, _ = px.shape
        lum = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        hist, _ = np.histogram(lum, bins=8, range=(0, 256))
        f = np.zeros(dim, np.float64)
        f[:8] = hist / lum.size
        f[8] = 2.0
        f[9] = ww / 1024.0
        f[10] = hh / 1024.0
        f[11] = ww / hh
        f[12:15] = px.reshape(-1, 3).mean(axis=0) / 255.0
        f32 = f.astype(np.float32)
        ids.append(mid)
        types.append(mtype)
        nbytes.append(len(payload))
        digests.append(
            round_half_away(
                round_half_away(float(f32.astype(np.float64) @ wvec), 9), 6
            )
        )
        argmaxes.append(int(np.argmax(f32)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "payload_bytes": pa.array(nbytes, pa.int64()),
            "feat_digest": pa.array(digests, pa.float64()),
            "feat_argmax": pa.array(argmaxes, pa.int64()),
        }
    )


def golden_media_resize_jpeg(n=200, seed=17, out_w=16, out_h=16) -> pa.Table:
    """Independent recomputation of q_media_resize_jpeg: independent
    decode + explicit per-pixel nearest-neighbor loops; the re-encode
    uses the SHARED single-writer encoders (encode_png/encode_jpeg are
    the fixture writers — md5 of emitted bytes requires exactly one
    writer, same rationale as encode_wav)."""
    import hashlib

    from vector_ray.functions.codecs import encode_jpeg, encode_png
    from vector_ray.functions.multimodal import png_jpeg_media_table

    media = png_jpeg_media_table(n, seed=seed)
    ids, types, widths, heights, resized, md5s = [], [], [], [], [], []
    for mid, mtype, payload in zip(
        media["media_id"].to_pylist(),
        media["media_type"].to_pylist(),
        media["payload"].to_pylist(),
    ):
        px = (
            _parse_png_independent(payload)
            if mtype == "image/png"
            else _parse_jpeg_independent(payload)
        )
        h, w, _ = px.shape
        rows = []
        for r in range(out_h):
            sr = (r * h) // out_h
            row = []
            for c in range(out_w):
                sc = (c * w) // out_w
                row.append(px[sr][sc])
            rows.append(row)
        small = np.array(rows, np.uint8)
        enc = (
            encode_png(small) if mtype == "image/png" else encode_jpeg(small)
        )
        ids.append(mid)
        types.append(mtype)
        widths.append(out_w)
        heights.append(out_h)
        resized.append(True)
        md5s.append(hashlib.md5(enc).hexdigest())
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "width": pa.array(np.array(widths, np.int32)),
            "height": pa.array(np.array(heights, np.int32)),
            "resized": pa.array(resized, pa.bool_()),
            "payload_md5": pa.array(md5s, pa.string()),
        }
    )


def golden_fingerprint_rolling(docs: pa.Table) -> pa.Table:
    """Independent per-row reimplementation of the full-content
    positional polynomial fingerprint: fp = Σ_i fnv1a(w_i)·R^i mod 2^64
    over the single-space word split (Python int arithmetic, no numpy)."""
    R = 0x9E3779B97F4A7C15
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    out = []
    for t in texts:
        acc = 0
        p = 1
        for w in (t or "").split(" "):
            acc = (acc + fnv1a(w) * p) % U64
            p = (p * R) % U64
        out.append(to_i64(acc))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "fingerprint": pa.array(out, pa.int64()),
        }
    )


def _mp4_children(buf: bytes, lo: int, hi: int) -> list:
    """Independent ISO-BMFF sibling scan (int.from_bytes arithmetic, no
    shared code with codecs._walk_boxes): [(tag, body_lo, box_hi)]."""
    out = []
    i = lo
    while i + 8 <= hi:
        size = int.from_bytes(buf[i : i + 4], "big")
        tag = buf[i + 4 : i + 8].decode("latin1")
        body = i + 8
        if size == 1:
            size = int.from_bytes(buf[i + 8 : i + 16], "big")
            body = i + 16
        elif size == 0:
            size = hi - i
        assert size >= 8 and i + size <= hi, f"bad box {tag} at {i}"
        out.append((tag, body, i + size))
        i += size
    return out


def _mp4_child(buf, lo, hi, want):
    for tag, b, e in _mp4_children(buf, lo, hi):
        if tag == want:
            return b, e
    raise AssertionError(f"no {want} box")


def _parse_mp4_independent(buf: bytes) -> dict:
    """Straight-line re-derivation of the container fields
    codecs.parse_mp4 extracts, written against the public ISO/IEC
    14496-12 box layout."""
    fb, _ = _mp4_child(buf, 0, len(buf), "ftyp")
    mb, me = _mp4_child(buf, 0, len(buf), "moov")
    vb, _ = _mp4_child(buf, mb, me, "mvhd")
    if buf[vb] == 1:
        ts = int.from_bytes(buf[vb + 20 : vb + 24], "big")
        dur = int.from_bytes(buf[vb + 24 : vb + 32], "big")
    else:
        ts = int.from_bytes(buf[vb + 12 : vb + 16], "big")
        dur = int.from_bytes(buf[vb + 16 : vb + 20], "big")
    tracks = []
    for tag, tb, te in _mp4_children(buf, mb, me):
        if tag != "trak":
            continue
        kb, ke = _mp4_child(buf, tb, te, "tkhd")
        w = int.from_bytes(buf[ke - 8 : ke - 6], "big")
        h = int.from_bytes(buf[ke - 4 : ke - 2], "big")
        db, de = _mp4_child(buf, tb, te, "mdia")
        ib, _ = _mp4_child(buf, db, de, "mdhd")
        if buf[ib] == 1:
            mts = int.from_bytes(buf[ib + 20 : ib + 24], "big")
            mdur = int.from_bytes(buf[ib + 24 : ib + 32], "big")
        else:
            mts = int.from_bytes(buf[ib + 12 : ib + 16], "big")
            mdur = int.from_bytes(buf[ib + 16 : ib + 20], "big")
        lb, _ = _mp4_child(buf, db, de, "hdlr")
        handler = buf[lb + 8 : lb + 12].decode("latin1")
        nb, ne = _mp4_child(buf, db, de, "minf")
        sb, se = _mp4_child(buf, nb, ne, "stbl")
        eb, _ = _mp4_child(buf, sb, se, "stsd")
        codec = buf[eb + 12 : eb + 16].decode("latin1")
        zb, _ = _mp4_child(buf, sb, se, "stsz")
        uniform = int.from_bytes(buf[zb + 4 : zb + 8], "big")
        n = int.from_bytes(buf[zb + 8 : zb + 12], "big")
        if uniform:
            total, biggest = uniform * n, (uniform if n else 0)
        else:
            sizes = [
                int.from_bytes(buf[zb + 12 + 4 * j : zb + 16 + 4 * j], "big")
                for j in range(n)
            ]
            total, biggest = sum(sizes), (max(sizes) if sizes else 0)
        cb, _ = _mp4_child(buf, sb, se, "stco")
        n_chunks = int.from_bytes(buf[cb + 4 : cb + 8], "big")
        tid_off = kb + 4 + (16 if buf[kb] == 1 else 8)
        tracks.append(
            dict(track_id=int.from_bytes(buf[tid_off : tid_off + 4], "big"),
                 handler=handler, codec=codec, width=w, height=h,
                 timescale=mts, duration=mdur, n_samples=n,
                 sample_bytes=total, max_sample_bytes=biggest,
                 n_chunks=n_chunks)
        )
    # fragmented MP4 (round-5): independent straight-line walk of the
    # mvex/trex defaults and every top-level moof's traf/tfhd/trun,
    # explicit per-sample loop (no numpy) per ISO/IEC 14496-12 §8.8
    trex = {}
    for tag, xb, xe in _mp4_children(buf, mb, me):
        if tag != "mvex":
            continue
        for t2, eb2, _ in _mp4_children(buf, xb, xe):
            if t2 == "trex":
                trex[int.from_bytes(buf[eb2 + 4 : eb2 + 8], "big")] = (
                    int.from_bytes(buf[eb2 + 12 : eb2 + 16], "big"),
                    int.from_bytes(buf[eb2 + 16 : eb2 + 20], "big"),
                )
    by_id = {t["track_id"]: t for t in tracks}
    saw_moof = False
    for tag, bb, be in _mp4_children(buf, 0, len(buf)):
        if tag != "moof":
            continue
        saw_moof = True
        for t2, tb2, te2 in _mp4_children(buf, bb, be):
            if t2 != "traf":
                continue
            hb2, _ = _mp4_child(buf, tb2, te2, "tfhd")
            tf = int.from_bytes(buf[hb2 + 1 : hb2 + 4], "big")
            tid = int.from_bytes(buf[hb2 + 4 : hb2 + 8], "big")
            p = hb2 + 8
            if tf & 0x1:
                p += 8
            if tf & 0x2:
                p += 4
            d_dur, d_size = trex.get(tid, (0, 0))
            if tf & 0x8:
                d_dur = int.from_bytes(buf[p : p + 4], "big")
                p += 4
            if tf & 0x10:
                d_size = int.from_bytes(buf[p : p + 4], "big")
                p += 4
            tr = by_id[tid]
            for t3, rb, _ in _mp4_children(buf, tb2, te2):
                if t3 != "trun":
                    continue
                rf = int.from_bytes(buf[rb + 1 : rb + 4], "big")
                ns = int.from_bytes(buf[rb + 4 : rb + 8], "big")
                q = rb + 8
                if rf & 0x1:
                    q += 4
                if rf & 0x4:
                    q += 4
                for _ in range(ns):
                    sd, ss = d_dur, d_size
                    if rf & 0x100:
                        sd = int.from_bytes(buf[q : q + 4], "big")
                        q += 4
                    if rf & 0x200:
                        ss = int.from_bytes(buf[q : q + 4], "big")
                        q += 4
                    if rf & 0x400:
                        q += 4
                    if rf & 0x800:
                        q += 4
                    tr["n_samples"] += 1
                    tr["sample_bytes"] += ss
                    tr["max_sample_bytes"] = max(tr["max_sample_bytes"], ss)
                    tr["duration"] += sd
                tr["n_chunks"] += 1
    if saw_moof and dur == 0 and ts:
        dur = max(
            (t["duration"] * ts // t["timescale"]
             for t in tracks if t["timescale"]),
            default=0,
        )
    return dict(timescale=ts, duration=dur, tracks=tracks)


def golden_media_mp4(n=200, seed=23, dim=16) -> pa.Table:
    """Independent recomputation of q_media_features_mp4: payloads from
    the shared fixture generator; container fields via the independent
    parser above; the public 16-dim descriptor math re-derived."""
    from vector_ray.functions.multimodal import mp4_media_table

    media = mp4_media_table(n, seed=seed)
    ids, types, nbytes, digests, argmaxes = [], [], [], [], []
    wvec = np.arange(1, dim + 1, dtype=np.float64)
    for mid, payload in zip(
        media["media_id"].to_pylist(), media["payload"].to_pylist()
    ):
        info = _parse_mp4_independent(payload)
        f = np.zeros(dim, np.float64)
        f[0] = 3.0
        f[1] = info["duration"] / info["timescale"]
        f[2] = len(info["tracks"])
        vid = [t for t in info["tracks"] if t["handler"] == "vide"]
        aud = [t for t in info["tracks"] if t["handler"] == "soun"]
        if vid:
            v = vid[0]
            tdur = v["duration"] / v["timescale"]
            f[3] = v["width"] / 1024.0
            f[4] = v["height"] / 1024.0
            f[5] = v["n_samples"] / tdur if tdur else 0.0
            f[6] = v["sample_bytes"] / 1e6
            f[7] = (
                v["sample_bytes"] / v["n_samples"] / 1e3
                if v["n_samples"]
                else 0.0
            )
            f[8] = v["max_sample_bytes"] / 1e3
            f[9] = 8.0 * v["sample_bytes"] / tdur / 1e6 if tdur else 0.0
        if aud:
            a = aud[0]
            f[10] = 1.0
            f[11] = a["duration"] / a["timescale"]
            f[12] = a["n_samples"] / 1e3
            f[13] = a["sample_bytes"] / 1e6
        f[14] = sum(t["n_chunks"] for t in info["tracks"])
        f[15] = len(payload) / 1e6
        f32 = f.astype(np.float32)
        ids.append(mid)
        types.append("video/mp4")
        nbytes.append(len(payload))
        digests.append(
            round_half_away(
                round_half_away(float(f32.astype(np.float64) @ wvec), 9), 6
            )
        )
        argmaxes.append(int(np.argmax(f32)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "payload_bytes": pa.array(nbytes, pa.int64()),
            "feat_digest": pa.array(digests, pa.float64()),
            "feat_argmax": pa.array(argmaxes, pa.int64()),
        }
    )


def golden_media_fmp4(n=150, seed=29, dim=16) -> pa.Table:
    """Independent recomputation of q_media_features_fmp4: fragmented
    payloads from the shared fixture generator; container fields via
    the fragment-aware independent parser; same 16-dim descriptor."""
    from vector_ray.functions.multimodal import fmp4_media_table

    media = fmp4_media_table(n, seed=seed)
    ids, types, nbytes, digests, argmaxes = [], [], [], [], []
    wvec = np.arange(1, dim + 1, dtype=np.float64)
    for mid, payload in zip(
        media["media_id"].to_pylist(), media["payload"].to_pylist()
    ):
        info = _parse_mp4_independent(payload)
        f = np.zeros(dim, np.float64)
        f[0] = 3.0
        f[1] = info["duration"] / info["timescale"]
        f[2] = len(info["tracks"])
        vid = [t for t in info["tracks"] if t["handler"] == "vide"]
        aud = [t for t in info["tracks"] if t["handler"] == "soun"]
        if vid:
            v = vid[0]
            tdur = v["duration"] / v["timescale"]
            f[3] = v["width"] / 1024.0
            f[4] = v["height"] / 1024.0
            f[5] = v["n_samples"] / tdur if tdur else 0.0
            f[6] = v["sample_bytes"] / 1e6
            f[7] = (
                v["sample_bytes"] / v["n_samples"] / 1e3
                if v["n_samples"]
                else 0.0
            )
            f[8] = v["max_sample_bytes"] / 1e3
            f[9] = 8.0 * v["sample_bytes"] / tdur / 1e6 if tdur else 0.0
        if aud:
            a = aud[0]
            f[10] = 1.0
            f[11] = a["duration"] / a["timescale"]
            f[12] = a["n_samples"] / 1e3
            f[13] = a["sample_bytes"] / 1e6
        f[14] = sum(t["n_chunks"] for t in info["tracks"])
        f[15] = len(payload) / 1e6
        f32 = f.astype(np.float32)
        ids.append(mid)
        types.append("video/mp4")
        nbytes.append(len(payload))
        digests.append(
            round_half_away(
                round_half_away(float(f32.astype(np.float64) @ wvec), 9), 6
            )
        )
        argmaxes.append(int(np.argmax(f32)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "payload_bytes": pa.array(nbytes, pa.int64()),
            "feat_digest": pa.array(digests, pa.float64()),
            "feat_argmax": pa.array(argmaxes, pa.int64()),
        }
    )


GOLDENS = {
    "media_features_mp4": golden_media_mp4,
    "media_features_fmp4": golden_media_fmp4,
    "fingerprint_rolling_documents": lambda: golden_fingerprint_rolling(
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ),
    "compression_documents": lambda: golden_compression(
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ),
    "pq_codes_embeddings": lambda: golden_pq_codes(
        pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ),
    "pq_topk_embeddings": lambda: golden_pq_topk(
        pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ),
    "pca_whiten_embeddings": golden_pca_whiten,
    "bpe_train_corpus": golden_bpe_train,
    "bpe_encode_corpus": golden_bpe_encode,
    "pack_documents_corpus": golden_pack_documents,
    "simhash_documents": lambda: golden_simhash(
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ),
    "minhash_pairs_documents": lambda: golden_minhash_pairs(
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ),
    "ann_lsh_topk": lambda: golden_ann_lsh(
        pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ),
    "multimodal_features": golden_multimodal,
    "media_features_wavbmp": golden_media_real,
    "media_features_png": golden_media_png_jpeg,
    "media_resize_jpeg": golden_media_resize_jpeg,
    "media_resize_bmp": golden_media_resize,
    "media_resample_wav": golden_media_resample,
    "embedding_dups_lsh": lambda: golden_embedding_dups_lsh(
        pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ),
    "agg_sketch_events": lambda: golden_agg_sketch(
        pq.read_table(
            f"{SF_DIR}/events.parquet",
            columns=["event_type", "user_id", "value"],
        )
    ),
}


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in GOLDENS.items():
        tbl = fn()
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"{name}: {tbl.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
