"""Unit tests for the stdlib image parser/rewriter behind the multimodal
queries — including bytes NOT produced by our own synthesizer, so the
parser is checked against the real formats, not its own inverse."""

from __future__ import annotations

import base64
import struct

import pytest

from ufload_spark.operators.multimodal import (
    decode_image,
    make_jpeg,
    make_png,
    resize_image,
)

#: a real 1×1 PNG (independently produced), not from make_png
REAL_1X1_PNG = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def test_decode_real_png():
    assert decode_image(REAL_1X1_PNG) == ("png", 1, 1)


def test_decode_synthesized_roundtrip():
    assert decode_image(make_png(640, 360)) == ("png", 640, 360)
    assert decode_image(make_jpeg(123, 456)) == ("jpeg", 123, 456)


def test_decode_jpeg_walks_past_app_segments():
    # SOI + APP0 (JFIF) + SOF0 + EOI: the parser must skip APP0 by its
    # length field, not assume SOF comes first
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof = make_jpeg(77, 88)[2:-2]  # strip SOI/EOI, keep the SOF segment
    jpeg = b"\xff\xd8" + app0 + sof + b"\xff\xd9"
    assert decode_image(jpeg) == ("jpeg", 77, 88)


def test_decode_rejects_corrupt_bytes():
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")
    # flip a bit inside IHDR → CRC check must catch it
    png = bytearray(make_png(10, 10))
    png[17] ^= 0x01
    with pytest.raises(ValueError):
        decode_image(bytes(png))
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xd9")  # JPEG with no SOF


@pytest.mark.parametrize("maker", [make_png, make_jpeg])
def test_resize_rewrites_header(maker):
    content = maker(640, 480)
    out = resize_image(content, 128)
    fmt, w, h = decode_image(out)
    assert (w, h) == (128, 96)
    # no upscale: already-small images pass through untouched
    small = maker(100, 50)
    assert resize_image(small, 128) is small


def test_video_container_roundtrip_and_corruption():
    """The UFV1 container decodes to exactly the frames written, and every
    corruption class (bad magic, truncation, trailing bytes, bit-flipped
    frame) raises instead of returning wrong data."""
    import pytest

    from ufload_spark.operators.multimodal import (
        _frame_dims,
        decode_image,
        iter_video_frames,
        make_video,
    )

    doc_id = 42
    video = make_video(doc_id)
    frames = list(iter_video_frames(video))
    assert len(frames) == doc_id % 97 + 1
    for idx, frame_bytes in frames:
        fmt, w, h = decode_image(frame_bytes)
        assert fmt == "png" and (w, h) == _frame_dims(doc_id, idx)

    with pytest.raises(ValueError):
        list(iter_video_frames(b"JUNK" + video[4:]))
    with pytest.raises(ValueError):
        list(iter_video_frames(video[:-3]))  # truncated last frame
    with pytest.raises(ValueError):
        list(iter_video_frames(video + b"\x00"))  # trailing garbage
    # flip a byte inside the first frame's IHDR data: CRC check must fire
    corrupt = bytearray(video)
    corrupt[8 + 4 + 8 + 8] ^= 0xFF
    first = next(iter(iter_video_frames(bytes(corrupt))))[1]
    with pytest.raises(ValueError):
        decode_image(first)


def test_wav_roundtrip_and_corruption():
    """decode_wav recovers exactly the synthesized parameters (including the
    sample count from the data chunk's byte length, behind an odd-sized JUNK
    chunk that forces the pad-rule walk), and every corruption class — bad
    magic, wrong RIFF size, truncated chunk, inconsistent fmt, ragged data —
    raises instead of returning wrong metadata."""
    import struct

    import pytest

    from ufload_spark.operators.multimodal import (
        WAV_BITS,
        WAV_RATES,
        decode_wav,
        make_wav,
    )

    for doc_id in (0, 1, 2, 3, 41, 999, 1234):
        wav = make_wav(doc_id)
        channels, rate, bits, n_samples = decode_wav(wav)
        assert channels == doc_id % 2 + 1
        assert rate == WAV_RATES[doc_id % 4]
        assert bits == WAV_BITS
        assert n_samples == doc_id % 1000 + 100

    wav = make_wav(41)
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + wav[4:])  # bad magic
    with pytest.raises(ValueError):
        decode_wav(wav + b"\x00")  # RIFF size no longer matches
    with pytest.raises(ValueError):
        decode_wav(wav[:-5])  # truncated data chunk
    # corrupt the fmt chunk's block_align: cross-check must fire
    fmt_off = wav.index(b"fmt ") + 8
    bad = bytearray(wav)
    ba_off = fmt_off + 12  # block_align field within fmt struct
    bad[ba_off : ba_off + 2] = struct.pack("<H", 7)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_pixel_png_roundtrip_and_corruption():
    """The pixel-level decoder really decodes: a rendered PNG's grid
    round-trips the generator formula exactly, and corrupting one IDAT
    byte is caught by the chunk CRC check (not silently mis-hashed)."""
    import pytest

    from ufload_spark.operators.multimodal import (
        AH_H,
        AH_W,
        ahash_bits,
        decode_png_pixels,
        make_pixel_png,
    )

    png = make_pixel_png(7)
    grid = decode_png_pixels(png)
    assert len(grid) == AH_H and len(grid[0]) == AH_W
    for y in range(AH_H):
        for x in range(AH_W):
            assert grid[y][x] == (7 * x + 13 * y + 31 * 7) % 256
    assert len(ahash_bits(grid)) == 64
    # flip a byte inside the IDAT payload → CRC must catch it
    idat_at = png.index(b"IDAT") + 6
    corrupt = png[:idat_at] + bytes([png[idat_at] ^ 0xFF]) + png[idat_at + 1 :]
    with pytest.raises(ValueError):
        decode_png_pixels(corrupt)


def test_phash_bits_shape_and_pattern_identity():
    from ufload_spark.operators.multimodal import (
        AH_PATTERN_MOD,
        decode_png_pixels,
        make_pixel_png,
        phash_bits,
    )

    h7 = phash_bits(decode_png_pixels(make_pixel_png(7)))
    assert len(h7) == 63 and set(h7) <= {"0", "1"}
    # strict median threshold: 31 coefficients land above the 32nd order
    # statistic unless values tie at the median
    assert h7.count("1") <= 31
    # identical pattern base → identical hash; distinct bases differ
    assert h7 == phash_bits(decode_png_pixels(make_pixel_png(7)))
    others = {
        phash_bits(decode_png_pixels(make_pixel_png(b)))
        for b in range(AH_PATTERN_MOD)
    }
    assert len(others) > 1  # the DCT actually separates patterns


def test_vad_segments_match_pure_python_replay(spark):
    """Engine-external replay for the VAD islands operator: recompute
    frame energies and maximal active runs straight from the
    synthesizer's id-arithmetic in pure python/numpy (no Spark, no SQL,
    no shared decode code path) and require the exact segment set."""
    import numpy as np

    from tests.conftest import SF_DIR
    from ufload_spark.operators.multimodal import (
        VAD_FRAME,
        VAD_THRESH,
        multimodal_audio_vad_segments,
    )

    want = set()
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    for doc_id in ids["doc_id"].to_pylist():
        total = (doc_id % 1000 + 100) * (doc_id % 2 + 1)
        nf = total // VAD_FRAME
        if nf == 0:
            continue
        i = np.arange(nf * VAD_FRAME, dtype=np.int64)
        v = ((doc_id * 31 + i * 7919) % 4096) - 2048
        e = (v.reshape(nf, VAD_FRAME) ** 2).sum(axis=1)
        act = e >= VAD_THRESH
        start = None
        for f in range(nf + 1):
            on = f < nf and act[f]
            if on and start is None:
                start = f
            elif not on and start is not None:
                seg = slice(start, f)
                want.add(
                    (doc_id, start, f - 1, f - start, int(e[seg].sum()))
                )
                start = None
    got = {
        (r["doc_id"], r["start_frame"], r["end_frame"], r["n_frames"],
         r["energy_sum"])
        for r in multimodal_audio_vad_segments(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(want) > 500  # the fixture has real island structure


def test_video_neardup_matches_pure_python_replay(spark):
    """Engine-external replay for the video near-dup operator: rebuild
    every trimmed container's BYTES, walk + decode them in pure python
    (the honest path — container length index, PNG IHDR), shingle,
    group, cap and pair with hashlib.md5 — and require the exact group
    pair set, including jaccard_milli and pair_count."""
    import hashlib
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR
    from ufload_spark.operators.multimodal import (
        FRAME_STEP,
        VID_SHARED_MIN,
        VID_SHINGLE_DF_CAP,
        decode_image,
        iter_video_frames,
        make_trimmed_video,
        multimodal_video_neardup,
    )

    ids = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    doc_sh: dict[int, set] = {}
    for doc_id in ids["doc_id"].to_pylist():
        fps = []
        for idx, frame in iter_video_frames(make_trimmed_video(doc_id)):
            if idx % FRAME_STEP:
                continue
            _, w, h = decode_image(frame)
            fps.append(w * 1000 + h)
        sh = {
            fps[i] * 10**12 + fps[i + 1] * 10**6 + fps[i + 2]
            for i in range(len(fps) - 2)
        }
        if sh:
            doc_sh[doc_id] = sh

    sig_of = {
        d: hashlib.md5(",".join(str(s) for s in sorted(sh)).encode()).hexdigest()
        for d, sh in doc_sh.items()
    }
    n_videos = Counter(sig_of.values())
    gsh0 = defaultdict(set)
    for d, sh in doc_sh.items():
        gsh0[sig_of[d]] |= sh
    df = Counter(s for sh in gsh0.values() for s in sh)
    gsh = {
        sig: {s for s in sh if df[s] <= VID_SHINGLE_DF_CAP}
        for sig, sh in gsh0.items()
    }
    want = set()
    sigs = sorted(gsh)
    for i, sa in enumerate(sigs):
        for sb in sigs[i + 1 :]:
            shared = len(gsh[sa] & gsh[sb])
            if shared >= VID_SHARED_MIN:
                lo, hi = min(sa, sb), max(sa, sb)
                union = len(gsh[lo]) + len(gsh[hi]) - shared
                want.add(
                    (lo, hi, shared, 1000 * shared // union,
                     n_videos[lo] * n_videos[hi])
                )

    got = {
        (r["sig_a"], r["sig_b"], r["n_shared"], r["jaccard_milli"],
         r["pair_count"])
        for r in multimodal_video_neardup(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture really plants trimmed near-dups


def test_video_neardup_gate_matches_pure_python_replay(spark):
    """Engine-external replay for the incremental video gate: base-group
    shingle table and batch probes rebuilt from the container bytes in
    pure python; the admitted set must match exactly, and both collided
    and admitted batch docs must exist (the gate really gates)."""
    import hashlib
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR
    from ufload_spark.operators.multimodal import (
        FRAME_STEP,
        VID_SHARED_MIN,
        VID_SHINGLE_DF_CAP,
        decode_image,
        iter_video_frames,
        make_trimmed_video,
        multimodal_video_neardup_incremental,
    )

    ids = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    all_ids = ids["doc_id"].to_pylist()

    def shingles(doc_id):
        fps = []
        for idx, frame in iter_video_frames(make_trimmed_video(doc_id)):
            if idx % FRAME_STEP:
                continue
            _, w, h = decode_image(frame)
            fps.append(w * 1000 + h)
        return {
            fps[i] * 10**12 + fps[i + 1] * 10**6 + fps[i + 2]
            for i in range(len(fps) - 2)
        }

    base_sh = {d: shingles(d) for d in all_ids if d % 4 != 0}
    gsh0 = defaultdict(set)
    for d, sh in base_sh.items():
        if sh:
            sig = hashlib.md5(
                ",".join(str(s) for s in sorted(sh)).encode()
            ).hexdigest()
            gsh0[sig] |= sh
    df = Counter(s for sh in gsh0.values() for s in sh)
    bgsh = {
        sig: {s for s in sh if df[s] <= VID_SHINGLE_DF_CAP}
        for sig, sh in gsh0.items()
    }
    admitted = set()
    for d in all_ids:
        if d % 4:
            continue
        sh = shingles(d)
        if not any(len(sh & g) >= VID_SHARED_MIN for g in bgsh.values()):
            admitted.add(d)

    got = {
        r["doc_id"]
        for r in multimodal_video_neardup_incremental(spark, SF_DIR).collect()
    }
    assert got == admitted
    n_batch = sum(1 for d in all_ids if d % 4 == 0)
    assert 0 < len(admitted) < n_batch


def test_video_keep_best_cut_matches_union_find_replay(spark):
    """Engine-external replay for the footage-cluster canonicalizer:
    groups, capped pairs, union-find components and the keep-longest-cut
    rule rebuilt from the container bytes in pure python; the cluster
    rows must match exactly, and at least one cluster must span multiple
    groups (the fixture really links cuts of different lengths)."""
    import hashlib
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR
    from ufload_spark.operators.multimodal import (
        FRAME_STEP,
        VID_SHARED_MIN,
        VID_SHINGLE_DF_CAP,
        decode_image,
        iter_video_frames,
        make_trimmed_video,
        multimodal_video_keep_best_cut,
    )

    ids = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    doc_sh, doc_s = {}, {}
    for doc_id in ids["doc_id"].to_pylist():
        fps = []
        for idx, frame in iter_video_frames(make_trimmed_video(doc_id)):
            if idx % FRAME_STEP:
                continue
            _, w, h = decode_image(frame)
            fps.append(w * 1000 + h)
        sh = {
            fps[i] * 10**12 + fps[i + 1] * 10**6 + fps[i + 2]
            for i in range(len(fps) - 2)
        }
        if sh:
            doc_sh[doc_id] = sh
            doc_s[doc_id] = len(fps)

    groups = defaultdict(list)
    for d, sh in doc_sh.items():
        sig = hashlib.md5(
            ",".join(str(x) for x in sorted(sh)).encode()
        ).hexdigest()
        groups[sig].append(d)
    grp = {
        sig: (min(ds), len(ds), max(doc_s[d] for d in ds))
        for sig, ds in groups.items()
    }
    gsh0 = {sig: doc_sh[min(ds)] for sig, ds in groups.items()}
    df = Counter(s for sh in gsh0.values() for s in sh)
    gsh = {
        sig: {s for s in sh if df[s] <= VID_SHINGLE_DF_CAP}
        for sig, sh in gsh0.items()
    }
    parent = {grp[sig][0]: grp[sig][0] for sig in grp}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    sigs = sorted(grp)
    for i, sa in enumerate(sigs):
        for sb in sigs[i + 1 :]:
            if len(gsh[sa] & gsh[sb]) >= VID_SHARED_MIN:
                ra, rb = find(grp[sa][0]), find(grp[sb][0])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    clusters = defaultdict(list)
    for sig, (rep, n_vid, s) in grp.items():
        clusters[find(rep)].append((rep, n_vid, s))
    want = set()
    for cid, members in clusters.items():
        best = sorted(members, key=lambda t: (-t[2], t[0]))[0]
        want.add(
            (cid, len(members), sum(m[1] for m in members), best[0], best[2])
        )

    got = {
        (r["cluster_id"], r["n_groups"], r["n_videos"], r["keep_doc_id"],
         r["keep_frames"])
        for r in multimodal_video_keep_best_cut(spark, SF_DIR).collect()
    }
    assert got == want
    assert any(n > 1 for (_c, n, _v, _k, _f) in want)
