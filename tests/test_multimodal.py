"""Multimodal plumbing tests: schema, batching, stubbed decode."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    raw = spark.createDataFrame(
        [(1, b"\x89PNG fake payload one"), (2, b"RIFF fake audio"), (3, None)],
        "id long, payload binary",
    )
    return M.attach_media_meta(raw, "id", "payload", kind="image")


def test_media_schema_and_meta(media):
    # nullability differs by construction path; names/types must match
    assert [(f.name, f.dataType.simpleString()) for f in media.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in M.MEDIA_SCHEMA.fields
    ]
    rows = {r.media_id: r for r in media.collect()}
    assert rows[1].meta.n_bytes == 21
    assert rows[1].meta.kind == "image"
    assert rows[3].payload is None


def test_metadata_filter_prunes_payload(media):
    """Filtering on meta must not deserialize payload bytes — check the
    pushed plan only reads the meta struct."""
    plan = media.filter(F.col("meta.n_bytes") > 16).select("media_id", "meta")
    assert plan.count() == 1


def test_extract_image_features_fake_decode(media):
    feats = {r.media_id: r for r in M.extract_image_features(media).collect()}
    assert set(feats) == {1, 2, 3}
    payload = b"\x89PNG fake payload one"
    w, h = M.decode_image(payload, fake=True)
    assert (feats[1].width, feats[1].height) == (w, h)
    assert feats[1].n_bytes == len(payload)
    assert feats[1].checksum == hashlib.sha256(payload).hexdigest()
    assert feats[3].width is None and feats[3].checksum is None


def test_decode_image_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"anything")


def _ppm(w, h, raster):
    return f"P6\n{w} {h}\n255\n".encode() + raster


def test_decode_ppm_real_raster():
    # non-constant raster: the mean is computed over the actual bytes,
    # not derived from the header
    raster = bytes(range(2 * 2 * 3))  # 0..11
    w, h, mean = M.decode_ppm(_ppm(2, 2, raster))
    assert (w, h) == (2, 2)
    assert mean == sum(range(12)) / 12
    # trailing junk after the raster is ignored (count-bounded view)
    w2, h2, mean2 = M.decode_ppm(_ppm(2, 2, raster + b"junk"))
    assert (w2, h2, mean2) == (w, h, mean)


def test_decode_ppm_rejects_malformed():
    with pytest.raises(ValueError, match="P6"):
        M.decode_ppm(b"P5\n2 2\n255\n" + bytes(12))
    with pytest.raises(ValueError, match="raster"):
        M.decode_ppm(_ppm(4, 4, bytes(10)))  # truncated raster
    with pytest.raises(ValueError, match="maxval"):
        M.decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))


def test_extract_ppm_features_roundtrip(spark):
    import hashlib

    rows = [
        (1, _ppm(3, 2, bytes([7] * 18))),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    media = M.attach_media_meta(df, "media_id", "blob", "image")
    feats = {r.media_id: r for r in M.extract_ppm_features(media).collect()}
    assert (feats[1].width, feats[1].height) == (3, 2)
    assert feats[1].mean_pixel == 7.0
    assert feats[1].checksum == hashlib.sha256(rows[0][1]).hexdigest()
    assert feats[2].width is None and feats[2].checksum is None


def test_sample_frames(media):
    frames = M.sample_frames(media, every_n_bytes=8).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_offset)
    assert by_id[1] == [0, 8, 16]  # 21 bytes / 8
    assert by_id[2] == [0, 8]  # 15 bytes / 8
    assert 3 not in by_id  # null payload -> no frames


def test_png_roundtrip_all_filters_and_colors():
    """encode_png/decode_png must be exact inverses for every spec
    filter type and every supported color type."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for color, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
        for filt in [0, 1, 2, 3, 4, (lambda y: y % 5)]:
            r = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
            w, h, c, out = decode_png(
                encode_png(r, color_type=color, row_filter=filt)
            )
            assert (w, h, c) == (9, 13, color)
            assert (out == r.reshape(13, 9 * ch)).all(), (color, filt)


def test_png_rejects_corruption():
    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    png = encode_png(
        np.zeros((4, 4, 3), dtype=np.uint8), row_filter=lambda y: y % 5
    )
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    bad = bytearray(png)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(png[: len(png) // 2])


def test_png_rejects_wrong_ihdr_length_with_valid_crc():
    """A CRC-valid IHDR of the wrong length must fail as ValueError,
    not escape as struct.error from the fixed-size unpack."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    png = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    ihdr_data = png[16 : 16 + 13]  # sig(8) + len(4) + type(4)
    short = ihdr_data[:12]
    bad_ihdr = (
        struct.pack(">I", 12)
        + b"IHDR"
        + short
        + struct.pack(">I", zlib.crc32(b"IHDR" + short) & 0xFFFFFFFF)
    )
    patched = png[:8] + bad_ihdr + png[8 + 25 :]  # old IHDR spans 25 B
    with pytest.raises(ValueError, match="IHDR length"):
        decode_png(patched)


def test_wav_rejects_zero_channels():
    """channels=0 in a (CRC-less) fmt chunk must fail as ValueError,
    not ZeroDivisionError inside the executor."""
    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    wav = bytearray(
        encode_wav(np.zeros((4, 1), dtype=np.int16), sample_rate=8000)
    )
    wav[22:24] = b"\x00\x00"  # n_channels field inside 'fmt '
    with pytest.raises(ValueError, match="malformed fmt"):
        decode_wav(bytes(wav))


def test_png_features_distributed(spark):
    """extract_png_features decodes executor-side and emits only
    features; pixel_sum and dims must match the numpy ground truth."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators import multimodal as M

    rows = []
    for i in range(8):
        r = np.full((6, 5, 3), 10 * i + 1, dtype=np.uint8)
        rows.append((i, bytearray(M.encode_png(r, row_filter=i % 5))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: r
        for r in M.extract_png_features(df).collect()
    }
    for i in range(8):
        assert (got[i].width, got[i].height) == (5, 6)
        assert got[i].color_type == 2
        assert got[i].pixel_sum == (10 * i + 1) * 6 * 5 * 3


def test_wav_roundtrip_mono_stereo():
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, size=500, dtype=np.int16)
    ch, rate, s = decode_wav(encode_wav(mono, sample_rate=16000))
    assert (ch, rate) == (1, 16000)
    assert (s[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32768, size=(300, 2), dtype=np.int16)
    ch, rate, s = decode_wav(encode_wav(stereo, sample_rate=44100))
    assert (ch, rate) == (2, 44100)
    assert (s == stereo).all()


def test_wav_skips_unknown_chunks_and_rejects_bad():
    import struct

    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    wav = encode_wav(np.arange(10, dtype=np.int16))
    # splice an unknown odd-sized LIST chunk between fmt and data —
    # spec-compliant readers must skip it (with word alignment)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"
    spliced = wav[:fmt_end] + extra + wav[fmt_end:]
    ch, rate, s = decode_wav(spliced)
    assert (s[:, 0] == np.arange(10)).all()
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"garbage bytes here")
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:30])


def _pvm(nf, w, h, fills):
    header = f"PV\n{nf} {w} {h}\n255\n".encode()
    return header + b"".join(bytes([f]) * (w * h * 3) for f in fills)


def test_pvm_header_parse_and_rejects():
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_pvm_header,
    )

    p = _pvm(3, 2, 2, [10, 20, 30])
    assert decode_pvm_header(p) == (3, 2, 2, len(b"PV\n3 2 2\n255\n"))
    with pytest.raises(ValueError, match="not a PVM"):
        decode_pvm_header(b"P6\n2 2\n255\n" + b"\0" * 12)
    with pytest.raises(ValueError, match="dimensions"):
        decode_pvm_header(b"PV\n2 2\n255\n" + b"\0" * 24)
    with pytest.raises(ValueError, match="maxval"):
        decode_pvm_header(b"PV\n2 2 2\n127\n" + b"\0" * 24)
    with pytest.raises(ValueError, match="raster area"):
        decode_pvm_header(_pvm(3, 2, 2, [10, 20]))  # one frame short
    with pytest.raises(ValueError, match="non-positive"):
        decode_pvm_header(b"PV\n3 0 5\n255\n")  # zero width
    with pytest.raises(ValueError, match="non-positive"):
        decode_pvm_header(b"PV\n-2 4 4\n255\n" + b"\0" * 96)


def test_extract_video_frames_samples_and_seeks(spark):
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        extract_video_frames,
    )

    rows = [
        (1, _pvm(5, 2, 3, [10, 20, 30, 40, 50])),
        (2, _pvm(1, 4, 4, [99])),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["media_id"], r["frame_idx"]): (
            r["width"], r["height"], r["mean_pixel"], r["n_frames"]
        )
        for r in extract_video_frames(df, every_n=2).collect()
    }
    # video 1: frames 0,2,4 sampled; constant rasters -> mean == fill
    assert got == {
        (1, 0): (2, 3, 10.0, 5),
        (1, 2): (2, 3, 30.0, 5),
        (1, 4): (2, 3, 50.0, 5),
        (2, 0): (4, 4, 99.0, 1),
    }
    # every_n=1 decodes every frame
    assert (
        extract_video_frames(df, every_n=1).count() == 6
    )
    with pytest.raises(ValueError, match="every_n"):
        extract_video_frames(df, every_n=0)


# --- perceptual hash (aHash) -------------------------------------------------


def _ppm_bytes(vals):
    """16x16 P6 payload with R=G=B pixel bytes from vals (len 256)."""
    raster = b"".join(bytes([v, v, v]) for v in vals)
    return b"P6\n16 16\n255\n" + raster


def test_ahash64_grid_known_patterns():
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        ahash64_grid,
    )

    # vertical gradient: bottom half above mean -> bits 32..63
    g = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert ahash64_grid(g) & (2**64 - 1) == 0xFFFFFFFF00000000
    # constant image: no cell strictly exceeds the mean -> all zero
    assert ahash64_grid(np.full((16, 16), 7, np.uint8)) == 0
    # left half bright -> columns 0..3 of every row
    g = np.zeros((16, 16), np.uint8)
    g[:, :8] = 200
    expect = 0
    for r in range(8):
        for c in range(4):
            expect |= 1 << (r * 8 + c)
    assert ahash64_grid(g) == expect
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ahash64_grid(np.zeros((4, 16), np.uint8))


def test_ahash_ppm_real_decode_and_near_dup_pairs(spark):
    from implementation_of_an_etl_process_spark.operators.dedup import (
        hamming_banded_pairs,
    )
    from implementation_of_an_etl_process_spark.operators.multimodal import (
        ahash64_grid,
        ahash_ppm,
        attach_media_meta,
    )

    base = [(i * 37) % 200 for i in range(256)]
    near = list(base)
    near[0] = (near[0] + 3) % 200  # one pixel nudged
    other = [((i // 16) * 16) % 256 for i in range(256)]  # row bands
    rows = [
        (1, _ppm_bytes(base)),
        (2, _ppm_bytes(near)),
        (3, _ppm_bytes(other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    media = attach_media_meta(df, "doc_id", "blob", "image")
    sig = ahash_ppm(media)
    got = {r["media_id"]: (r["width"], r["height"], r["ahash"])
           for r in sig.collect()}
    # hash matches the python reference on the same grayscale grid
    import numpy as np

    for mid, vals in ((1, base), (2, near), (3, other)):
        grid = (np.array(vals, np.int64) * 3).reshape(16, 16)
        assert got[mid] == (16, 16, ahash64_grid(grid)), mid
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_banded_pairs(
            sig, "media_id", "ahash", max_hamming=3
        ).collect()
    }
    assert (1, 2) in pairs  # the near-copy is found
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_energy_hash_samples_known_patterns():
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        energy_hash_samples,
    )

    # front-loaded energy: first 32 windows above mean
    e = np.concatenate([np.full(320, 90), np.full(320, 10)])
    assert energy_hash_samples(e) & (2**64 - 1) == 0xFFFFFFFF
    # flat energy: no window strictly exceeds the mean
    assert energy_hash_samples(np.full(640, 50)) == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        energy_hash_samples(np.full(63, 1))


def test_energy_hash_wav_real_decode_and_near_pairs(spark):
    """RIFF-encode three waveforms (two near-identical), real-decode +
    fingerprint in Arrow batches, and find the near pair via the shared
    Hamming banding — the audio twin of the image aHash test."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.dedup import (
        hamming_banded_pairs,
    )
    from implementation_of_an_etl_process_spark.operators.multimodal import (
        attach_media_meta,
        encode_wav,
        energy_hash_samples,
        energy_hash_wav,
    )

    i = np.arange(500, dtype=np.int64)
    base = ((i * 5 + 11) % 191 - 95).astype(np.int16)
    near = base.copy()
    near[:3] += 1
    other = (np.where(i < 250, 90, 2)).astype(np.int16)
    rows = [
        (1, encode_wav(base)),
        (2, encode_wav(near)),
        (3, encode_wav(other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    sig = energy_hash_wav(attach_media_meta(df, "doc_id", "blob", "audio"))
    got = {r["media_id"]: (r["n_samples"], r["ehash"]) for r in sig.collect()}
    for mid, w in ((1, base), (2, near), (3, other)):
        expect = energy_hash_samples(np.abs(w.astype(np.int64)))
        assert got[mid] == (500, expect), mid
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_banded_pairs(
            sig, "media_id", "ehash", max_hamming=3
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_jpeg_dc_only_roundtrip_is_exact():
    """8x8-block-constant images with EVEN pixel values roundtrip
    EXACTLY through the JPEG codec with the default tables: all ACs
    quantize to zero and the Q00=16 DC roundtrip is the identity on
    even values (the closed form the battery oracle uses — decoded =
    v - (v % 2) in general)."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    blocks = np.array([[32, 64, 126], [90, 126, 40]], dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), np.uint8))
    w, h, nc, out = decode_jpeg(encode_jpeg(img))
    assert (w, h, nc) == (24, 16, 1)
    assert (out == img).all()
    # ODD values sit exactly on the Q00/2 quantization boundary, where
    # the float DCT's ulp noise picks the side — they land on v - 1 or
    # v + 1, never anything else. This is WHY the battery's generation
    # rule emits even values only.
    odd = np.kron(
        np.array([[33, 101]], dtype=np.uint8), np.ones((8, 8), np.uint8)
    )
    _, _, _, out_odd = decode_jpeg(encode_jpeg(odd))
    assert (np.abs(out_odd.astype(int) - odd.astype(int)) == 1).all()


def test_jpeg_decoder_matches_independent_reference():
    """decode(encode(X)) must equal an INDEPENDENT loop-based
    DCT -> quantize -> dequantize -> IDCT reference (shares only the
    quantization convention, none of the codec's matrix/Huffman code)
    within the float .5-boundary tolerance — this exercises the full
    AC path: run lengths, ZRL, EOB, multi-category Huffman codes."""
    import math

    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        JPEG_LUMA_QUANT,
        decode_jpeg,
        encode_jpeg,
    )

    def ref_pipeline(img, Q):
        h, w = img.shape
        out = np.zeros_like(img)
        cs = [1 / math.sqrt(2)] + [1.0] * 7
        cos = [
            [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
            for u in range(8)
        ]
        for by in range(h // 8):
            for bx in range(w // 8):
                X = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                    float
                ) - 128.0
                R = np.zeros((8, 8))
                for u in range(8):
                    for v in range(8):
                        s = sum(
                            X[x, y] * cos[u][x] * cos[v][y]
                            for x in range(8)
                            for y in range(8)
                        )
                        f = 0.25 * cs[u] * cs[v] * s
                        q = math.copysign(
                            math.floor(abs(f) / Q[u][v] + 0.5), f
                        )
                        fd = q * Q[u][v]
                        for x in range(8):
                            for y in range(8):
                                R[x, y] += (
                                    0.25 * cs[u] * cs[v] * fd
                                    * cos[u][x] * cos[v][y]
                                )
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.floor(R + 128.5), 0, 255
                )
        return out

    x = np.arange(24)
    y = np.arange(16)
    g = ((x[None, :] * 5 + y[:, None] * 9) % 200 + 20).astype(np.uint8)
    want = ref_pipeline(g, JPEG_LUMA_QUANT)
    w, h, nc, got = decode_jpeg(encode_jpeg(g))
    assert (w, h, nc) == (24, 16, 1)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 3


def test_jpeg_color_and_odd_dims_roundtrip():
    """4:4:4 color roundtrips within quantization tolerance on a
    smooth raster; non-multiple-of-8 dims crop back exactly."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    x = np.arange(24)
    y = np.arange(16)
    base = (40 + x[None, :] * 3 + y[:, None] * 2).astype(np.uint8)  # smooth
    rgb = np.stack([base, base // 2 + 30, np.full_like(base, 90)], axis=-1)
    w, h, nc, out = decode_jpeg(encode_jpeg(rgb))
    assert (w, h, nc) == (24, 16, 3)
    err = np.abs(
        out.reshape(16, 24, 3).astype(int) - rgb.astype(int)
    ).max()
    assert err <= 12, err  # chroma transform + quantization, smooth image
    odd = base[:13, :19]
    w2, h2, nc2, out2 = decode_jpeg(encode_jpeg(odd))
    assert (w2, h2, nc2) == (19, 13, 1)
    assert np.abs(out2.astype(int) - odd.astype(int)).max() <= 12


def test_jpeg_rejects_corruption():
    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.kron(
        np.array([[50, 100]], dtype=np.uint8), np.ones((8, 8), np.uint8)
    )
    jpg = encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"definitely not a jpeg")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(jpg[:40])
    # flip a bit INSIDE the entropy stream: either an invalid Huffman
    # code, a run past the block end, or a truncated stream — never a
    # silent wrong raster with a crashed shape
    bad = bytearray(jpg)
    bad[-6] ^= 0x55
    try:
        _, _, _, out = decode_jpeg(bytes(bad))
        assert out.shape == (8, 16)  # decoded something block-shaped
    except ValueError:
        pass
    # lossless SOF must be rejected loudly
    sof3 = bytearray(jpg)
    i = sof3.find(b"\xff\xc0")
    sof3[i + 1] = 0xC3
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(sof3))
    # flipping SOF0 -> SOF2 dispatches to the progressive decoder,
    # where a baseline full-band scan header is malformed: still loud
    sof2 = bytearray(jpg)
    sof2[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se != 0"):
        decode_jpeg(bytes(sof2))


def test_jpeg_subsampled_fixed_point_roundtrip():
    """4:2:0 and 4:2:2 MCU-interleaved decode, exact: gray RGB
    (r=g=b=v) has Cb=Cr=128 EXACTLY (the JFIF coefficients sum to 0.5
    and 1.0 exactly), so every chroma coefficient is zero at any
    subsampling — and per-8x8-block-constant EVEN luma is a Q00=16
    fixed point. Distinct values per block make any mistake in the
    T.81 MCU data-unit order (Y's vi x hi raster, then Cb, Cr), the
    per-component DC prediction chains, or the replication upsample
    change the output."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    v = (32 + 2 * rng.integers(0, 48, (4, 6))).astype(np.uint8)
    lum = np.kron(v, np.ones((8, 8), np.uint8))  # 32 x 48, varies per block
    rgb = np.repeat(lum[:, :, None], 3, axis=2)
    sizes = {}
    for samp in ("4:4:4", "4:2:2", "4:2:0"):
        blob = encode_jpeg(rgb, sampling=samp)
        sizes[samp] = len(blob)
        w, h, nc, out = decode_jpeg(blob)
        assert (w, h, nc) == (48, 32, 3)
        assert np.array_equal(out, rgb.reshape(32, 144)), samp
    # subsampling must actually shrink the payload (fewer data units)
    assert sizes["4:2:0"] < sizes["4:2:2"] < sizes["4:4:4"]


def test_jpeg_subsampled_crop_and_edge_padding():
    """Dims that are not multiples of the 16-pixel (4:2:0) MCU grid:
    edge replication keeps padded blocks constant, decode crops back
    to the exact requested size."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(13)
    v = (32 + 2 * rng.integers(0, 48, (3, 5))).astype(np.uint8)
    lum = np.kron(v, np.ones((8, 8), np.uint8))  # 24 x 40
    rgb = np.repeat(lum[:, :, None], 3, axis=2)
    for samp in ("4:2:0", "4:2:2"):
        w, h, nc, out = decode_jpeg(encode_jpeg(rgb, sampling=samp))
        assert (w, h, nc) == (40, 24, 3)
        assert np.array_equal(out, rgb.reshape(24, 120)), samp


def test_jpeg_subsampled_real_chroma_bounded_error():
    """Actual non-neutral chroma through downsample -> encode ->
    decode -> upsample: a constant-color image reconstructs within the
    chroma quantizer's step (Q00=17 -> error <= ~2), and a smooth
    gradient stays within a small tolerance — codec-grade lossiness,
    not garbage."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.empty((24, 24, 3), np.uint8)
    img[:] = (200, 64, 100)
    for samp in ("4:2:0", "4:2:2"):
        w, h, nc, out = decode_jpeg(encode_jpeg(img, sampling=samp))
        err = np.abs(
            out.reshape(24, 24, 3).astype(int) - img.astype(int)
        ).max()
        assert err <= 4, (samp, err)
    x = np.linspace(0, 200, 48)
    y = np.linspace(0, 180, 40)
    grad = np.stack(
        [
            np.add.outer(y * 0.5, x * 0.5),
            np.add.outer(y * 0.3, x * 0.7),
            np.full((40, 48), 90.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    for samp in ("4:2:0", "4:2:2"):
        w, h, nc, out = decode_jpeg(encode_jpeg(grad, sampling=samp))
        err = np.abs(
            out.reshape(40, 48, 3).astype(int) - grad.astype(int)
        )
        assert err.mean() < 4 and err.max() <= 16, (samp, err.max())


def test_jpeg_sampling_rejections():
    """Loud boundaries: unknown sampling string at encode; sampling
    factors outside T.81's 1-4 and fractional ratios (hi not dividing
    hmax) at decode — both BEFORE entropy decoding, so corrupt
    geometry can't produce a silently wrong raster."""
    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((16, 16, 3), 100, np.uint8)
    with pytest.raises(ValueError, match="unsupported sampling"):
        encode_jpeg(img, sampling="4:2:1")
    blob = bytearray(encode_jpeg(img, sampling="4:2:0"))
    i = blob.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1), then cid/hv/tq per comp
    hv_luma = i + 2 + 2 + 1 + 4 + 1 + 1
    assert blob[hv_luma] == 0x22
    bad = bytearray(blob)
    bad[hv_luma] = 0x52  # h=5: outside 1-4
    with pytest.raises(ValueError, match="outside T.81"):
        decode_jpeg(bytes(bad))
    bad = bytearray(blob)
    bad[hv_luma] = 0x33  # luma 3x3 with 2x2... no: make chroma 2x2
    bad[hv_luma + 3] = 0x22  # Cb 2x2 -> hmax 3, 3 % 2 != 0
    with pytest.raises(ValueError, match="fractional sampling"):
        decode_jpeg(bytes(bad))


def test_jpeg_restart_markers_and_exotic_samplings_roundtrip():
    """DRI/RSTn through the full pipeline (the encoder now emits what
    the decoder always handled): byte-aligned restart markers every N
    MCUs with DC-predictor resets, at several samplings including the
    decoder's generalized integer-ratio layouts 4:4:0 (1x2 luma) and
    4:1:1 (4x1 luma). The gray-RGB even-block fixed point makes every
    roundtrip EXACT, so a wrong restart split, a missed predictor
    reset, or a bad MCU geometry shows as changed bytes."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(17)
    v = (32 + 2 * rng.integers(0, 48, (4, 8))).astype(np.uint8)
    lum = np.kron(v, np.ones((8, 8), np.uint8))  # 32 x 64
    rgb = np.repeat(lum[:, :, None], 3, axis=2)
    for samp in ("4:4:4", "4:2:0", "4:2:2", "4:4:0", "4:1:1"):
        for ri in (0, 1, 3):
            blob = encode_jpeg(rgb, sampling=samp, restart_interval=ri)
            if ri:
                assert b"\xff\xdd" in blob  # DRI present
                assert any(
                    bytes([0xFF, 0xD0 + i]) in blob for i in range(8)
                )
            w, h, nc, out = decode_jpeg(blob)
            assert (w, h, nc) == (64, 32, 3)
            assert np.array_equal(out, rgb.reshape(32, 192)), (samp, ri)
    # grayscale with restarts too (single-component scan)
    g = encode_jpeg(lum, restart_interval=2)
    w, h, nc, out = decode_jpeg(g)
    assert (w, h, nc) == (64, 32, 1) and np.array_equal(out, lum)
    # >8 restarts wraps the RSTn modulo-8 counter
    many = encode_jpeg(lum, restart_interval=1)
    w, h, nc, out = decode_jpeg(many)
    assert np.array_equal(out, lum)


def test_jpeg_progressive_equals_baseline_byte_for_byte():
    """The STRONG progressive contract: both entropy coders share the
    quantized-coefficient front end, so a progressive stream (DC
    successive approximation, AC spectral-selection bands, EOB-run
    coding, the G.1.2.3 AC correction-bit refinement) must decode to
    the BYTE-IDENTICAL raster as the baseline stream of the same
    input — on arbitrary images, every sampling layout, and odd
    dims. Any defect anywhere in the multi-scan machinery shows as a
    byte diff."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    b = decode_jpeg(encode_jpeg(gray))
    p = decode_jpeg(encode_jpeg_progressive(gray))
    assert b[:3] == p[:3] == (40, 24, 1)
    assert np.array_equal(b[3], p[3])
    color = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    for samp in ("4:4:4", "4:2:0", "4:2:2", "4:4:0", "4:1:1"):
        b = decode_jpeg(encode_jpeg(color, sampling=samp))
        p = decode_jpeg(encode_jpeg_progressive(color, sampling=samp))
        assert np.array_equal(b[3], p[3]), samp
    odd = rng.integers(0, 256, (19, 27, 3)).astype(np.uint8)
    b = decode_jpeg(encode_jpeg(odd, sampling="4:2:0"))
    p = decode_jpeg(encode_jpeg_progressive(odd, sampling="4:2:0"))
    assert b[:3] == p[:3] == (27, 19, 3)
    assert np.array_equal(b[3], p[3])


def test_jpeg_progressive_eob_runs_and_custom_scripts():
    """EOB-run paths: a constant image accumulates one long EOB run
    across every block of every AC scan (multi-bit EOBRUN length
    codes); a spectral-selection-only custom script (Al=0 throughout)
    skips the refinement machinery entirely; both must still match
    baseline exactly."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    img = np.full((64, 96), 100, np.uint8)
    b = decode_jpeg(encode_jpeg(img))
    p = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(b[3], p[3])
    x = np.linspace(0, 255, 80)
    y = np.linspace(0, 200, 64)
    img3 = np.stack(
        [
            np.add.outer(y * 0.6, x * 0.4),
            np.add.outer(y * 0.2, x * 0.8),
            np.full((64, 80), 77.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    scans = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    b = decode_jpeg(encode_jpeg(img3, sampling="4:2:2"))
    p = decode_jpeg(
        encode_jpeg_progressive(img3, sampling="4:2:2", scans=scans)
    )
    assert np.array_equal(b[3], p[3])


def test_jpeg_progressive_fixed_point_and_rejections():
    """The battery-oracle fixed point holds through the default
    progressive script (gray RGB -> zero chroma coefficients; even
    per-block-constant luma survives the full SA ladder exactly), and
    malformed progressive streams fail loudly."""
    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(9)
    v = (32 + 2 * rng.integers(0, 48, (4, 5))).astype(np.uint8)
    lum = np.kron(v, np.ones((8, 8), np.uint8))
    rgb = np.repeat(lum[:, :, None], 3, axis=2)
    w, h, nc, out = decode_jpeg(encode_jpeg_progressive(rgb, sampling="4:2:0"))
    assert (w, h, nc) == (40, 32, 3)
    assert np.array_equal(out, rgb.reshape(32, 120))
    blob = encode_jpeg_progressive(rgb, sampling="4:2:0")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(blob[:60])
    # multi-component AC scan is illegal in progressive
    with pytest.raises(ValueError, match="single-component"):
        encode_jpeg_progressive(rgb, scans=[([0, 1], 1, 5, 0, 0)])
    with pytest.raises(ValueError, match="Se == 0"):
        encode_jpeg_progressive(rgb, scans=[([0], 0, 5, 0, 0)])


def test_resize_nearest_integer_mapping_and_identity():
    """resize_nearest uses the exact half-pixel integer mapping
    src = ((2*i + 1) * src_dim) // (2 * dst_dim) in both directions;
    same-dims resize is the identity."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        resize_nearest,
    )

    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest(img, 13, 3)
    assert out.shape == (3, 13, 3)
    for oy in range(3):
        for ox in range(13):
            sy = ((2 * oy + 1) * 4) // (2 * 3)
            sx = ((2 * ox + 1) * 6) // (2 * 13)
            assert (out[oy, ox] == img[sy, sx]).all()
    assert np.array_equal(resize_nearest(img, 6, 4), img)
    import pytest

    with pytest.raises(ValueError, match="at least 1x1"):
        resize_nearest(img, 0, 4)


def test_resize_box_half_up_exact_integers():
    """resize_box averages fx x fy blocks with half-up rounding in
    exact integers ((2*sum + n) // (2*n)) and refuses non-dividing
    dims loudly."""
    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        resize_box,
    )

    img = np.array([[1, 2], [3, 5]], dtype=np.uint8)
    assert resize_box(img, 2, 2)[0, 0] == 3  # mean 2.75 -> 3
    img2 = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    assert resize_box(img2, 2, 2)[0, 0] == 3  # mean 2.5 -> half-up 3
    rng = np.random.default_rng(19)
    big = rng.integers(0, 256, (12, 16, 3)).astype(np.uint8)
    out = resize_box(big, 4, 2)
    assert out.shape == (6, 4, 3)
    blk = big[:2, :4].astype(int)
    want = (2 * blk.sum(axis=(0, 1)) + 8) // 16
    assert (out[0, 0] == want).all()
    with pytest.raises(ValueError, match="not divisible"):
        resize_box(big, 5, 2)


def test_resize_ppm_media_composes_with_feature_stage(spark):
    """resize_ppm_media is a media->media operator: its output P6
    payloads feed extract_ppm_features unchanged, dims/mean/sha all
    reflecting the resized raster; None payloads pass through."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators import (
        multimodal as M,
    )

    img = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3) % 96 + 32
    payload = b"P6\n8 6\n255\n" + img.astype(np.uint8).tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, None)], "media_id long, payload binary"
    )
    media = M.attach_media_meta(df, "media_id", "payload", "image")
    out = M.extract_ppm_features(
        M.resize_ppm_media(media, out_w=4, out_h=3, method="nearest")
    ).collect()
    rows = {r.media_id: r for r in out}
    want = M.resize_nearest(img.astype(np.uint8), 4, 3)
    assert (rows[1].width, rows[1].height) == (4, 3)
    assert abs(rows[1].mean_pixel - want.mean()) < 1e-12
    assert rows[2].width is None
    boxed = M.extract_ppm_features(
        M.resize_ppm_media(media, method="box", factors=(2, 2))
    ).collect()
    rows = {r.media_id: r for r in boxed}
    wantb = M.resize_box(img.astype(np.uint8), 2, 2)
    assert (rows[1].width, rows[1].height) == (4, 3)
    assert abs(rows[1].mean_pixel - wantb.mean()) < 1e-12


def test_exif_orientation_roundtrip_and_transforms():
    """encode_jpeg(exif_orientation=o) writes a valid APP1 Exif
    segment (either TIFF byte order); jpeg_exif_orientation parses it
    back; apply_exif_orientation matches numpy's rot90/flip ground
    truth for all 8 values; the entropy stream is untouched (decode
    still exact on the fixed point)."""
    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators import (
        multimodal as M,
    )

    rng = np.random.default_rng(31)
    v = (32 + 2 * rng.integers(0, 48, (3, 4))).astype(np.uint8)
    lum = np.kron(v, np.ones((8, 8), np.uint8))
    rgb = np.repeat(lum[:, :, None], 3, axis=2)
    for o in range(1, 9):
        blob = M.encode_jpeg(rgb, sampling="4:2:0", exif_orientation=o)
        assert M.jpeg_exif_orientation(blob) == o
        w, h, nc, out = M.decode_jpeg(blob)
        assert np.array_equal(out, rgb.reshape(24, 96))
    a = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    assert np.array_equal(M.apply_exif_orientation(a, 1), a)
    assert np.array_equal(M.apply_exif_orientation(a, 2), a[:, ::-1])
    assert np.array_equal(M.apply_exif_orientation(a, 3), np.rot90(a, 2))
    assert np.array_equal(M.apply_exif_orientation(a, 4), np.flipud(a))
    assert np.array_equal(
        M.apply_exif_orientation(a, 5), a.transpose(1, 0, 2)
    )
    assert np.array_equal(M.apply_exif_orientation(a, 6), np.rot90(a, -1))
    assert np.array_equal(
        M.apply_exif_orientation(a, 7), np.rot90(a.transpose(1, 0, 2), 2)
    )
    assert np.array_equal(M.apply_exif_orientation(a, 8), np.rot90(a, 1))
    # gray 2-D rasters orient too
    g = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    assert np.array_equal(M.apply_exif_orientation(g, 6), np.rot90(g, -1))
    # absent EXIF -> None; bounds enforced both ways
    assert M.jpeg_exif_orientation(M.encode_jpeg(lum)) is None
    with pytest.raises(ValueError, match="1..8"):
        M.make_exif_app1(9)
    with pytest.raises(ValueError, match="1..8"):
        M.apply_exif_orientation(a, 0)


def test_exif_parser_rejects_malformed_app1():
    """A present-but-corrupt Exif APP1 fails loudly (bad TIFF magic,
    truncated IFD) rather than silently returning orientation 1."""
    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators import (
        multimodal as M,
    )

    img = np.full((8, 8), 100, np.uint8)
    blob = M.encode_jpeg(img, exif_orientation=6)
    i = blob.find(b"Exif\x00\x00")
    bad = bytearray(blob)
    bad[i + 6 : i + 8] = b"XX"  # not II/MM
    with pytest.raises(ValueError, match="TIFF header"):
        M.jpeg_exif_orientation(bytes(bad))
    bad = bytearray(blob)
    bad[i + 8] = 41  # wrong magic
    with pytest.raises(ValueError, match="magic"):
        M.jpeg_exif_orientation(bytes(bad))
    # an APP1 that is not Exif (e.g. XMP) is skipped, not an error
    xmp = bytearray(blob)
    xmp[i : i + 4] = b"XMP\x00"
    assert M.jpeg_exif_orientation(bytes(xmp)) is None


def test_resample_pcm_exact_integer_arithmetic():
    """resample_pcm linear interpolation matches an independent
    float reference within the half-up convention, handles negative
    samples via the +32768 bias (floor/truncate-division portability),
    clamps the final segment, and supports nearest + multi-channel."""
    import numpy as np
    import pytest

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        resample_pcm,
    )

    rng = np.random.default_rng(41)
    s = rng.integers(-32768, 32768, 400).astype(np.int16)
    out = resample_pcm(s, 8000, 3000, method="linear")
    assert len(out) == 400 * 3000 // 8000
    # independent float reference with the same half-up convention
    for i in [0, 1, 7, 50, len(out) - 1]:
        pos = i * 8000 / 3000
        s0 = int(pos)
        frac = pos - s0
        s1 = min(s0 + 1, len(s) - 1)
        want = np.floor(
            (s[s0] + 32768) * (1 - frac) + (s[s1] + 32768) * frac + 0.5
        ) - 32768
        assert out[i] == want, i
    # identity at equal rates; nearest picks the half-pixel mapping
    assert np.array_equal(resample_pcm(s, 8000, 8000), s)
    near = resample_pcm(s, 8000, 2000, method="nearest")
    assert near[3] == s[((2 * 3 + 1) * 8000) // (2 * 2000)]
    # stereo: channels resample independently
    st = np.stack([s, -s], axis=1)
    out2 = resample_pcm(st, 8000, 3000)
    assert out2.shape == (150, 2)
    with pytest.raises(ValueError, match="unknown resample"):
        resample_pcm(s, 8000, 3000, method="cubic")
    with pytest.raises(ValueError, match="positive"):
        resample_pcm(s, 0, 3000)


def test_resample_wav_media_composes_with_feature_stage(spark):
    """resample_wav_media output feeds extract_wav_features unchanged:
    rate, counts and exact sums reflect the resampled PCM."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators import (
        multimodal as M,
    )

    i = np.arange(400, dtype=np.int64)
    s = ((i * 5 + 11) % 191 - 95).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_wav(s, sample_rate=8000))), (2, None)],
        "media_id long, payload binary",
    )
    media = M.attach_media_meta(df, "media_id", "payload", "audio")
    out = {
        r.media_id: r
        for r in M.extract_wav_features(
            M.resample_wav_media(media, 3000)
        ).collect()
    }
    want = M.resample_pcm(s, 8000, 3000)
    assert out[1].sample_rate == 3000
    assert out[1].n_samples == len(want) == 150
    assert out[1].sample_sum == int(want.astype(np.int64).sum())
    assert out[1].peak_abs == int(np.abs(want.astype(np.int32)).max())
    assert out[2].sample_rate is None


def test_jpeg_auto_dispatch_falls_back_without_native_lib():
    """decode_jpeg_auto is the production swap point (r11 verdict item
    6): without Pillow (this container) and with prefer_native=False
    it must be the pure decoder, bit for bit, on gray and color."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        decode_jpeg_auto,
        encode_jpeg,
    )

    gray = np.kron(
        np.array([[32, 64], [90, 126]], dtype=np.uint8),
        np.ones((8, 8), np.uint8),
    )
    rgb = np.kron(
        np.array([[32, 64, 126]], dtype=np.uint8),
        np.ones((8, 8), np.uint8),
    )
    rgb = np.dstack([rgb, rgb, rgb]).reshape(8, 24 * 3)
    for img in (gray, rgb):
        payload = encode_jpeg(img)
        pure = decode_jpeg(payload)
        for auto in (
            decode_jpeg_auto(payload),  # env default, Pillow absent here
            decode_jpeg_auto(payload, prefer_native=False),  # forced pure
        ):
            assert auto[:3] == pure[:3]
            assert (auto[3] == pure[3]).all()


def test_jpeg_auto_env_default_is_off(monkeypatch):
    """r14: the SPARK_GRAFT_NATIVE_JPEG env default is OFF — with the
    env unset, decode_jpeg_auto must not even feature-detect a native
    decoder (no shipped surface reads the env since the r13 fix made
    native per-call opt-in; an 'on' default could silently re-route a
    future caller). Explicit '1' still turns detection on."""
    import numpy as np

    from implementation_of_an_etl_process_spark.operators import (
        multimodal as M,
    )

    img = np.kron(
        np.array([[32, 64]], dtype=np.uint8), np.ones((8, 8), np.uint8)
    )
    payload = M.encode_jpeg(img)
    probed = []

    def probe():
        probed.append(True)
        return None  # "Pillow absent" — auto falls back to pure

    monkeypatch.setattr(M, "_native_jpeg_decoder", probe)
    monkeypatch.delenv("SPARK_GRAFT_NATIVE_JPEG", raising=False)
    pure = M.decode_jpeg(payload)
    auto = M.decode_jpeg_auto(payload)
    assert not probed, "env-unset default must stay on the pure codec"
    assert auto[:3] == pure[:3] and (auto[3] == pure[3]).all()
    monkeypatch.setenv("SPARK_GRAFT_NATIVE_JPEG", "1")
    M.decode_jpeg_auto(payload)
    assert probed, "explicit env opt-in must reach feature detection"


def test_jpeg_auto_native_equals_pure_on_fixed_point_images():
    """When Pillow IS present, the native path must agree with the
    pure codec on the engine's fixed-point images (8x8-block-constant
    even values: every AC quantizes to zero, the DC roundtrip is the
    identity, so ANY correct T.81 decoder lands on the same bytes)."""
    import pytest

    pytest.importorskip("PIL")
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        decode_jpeg_auto,
        encode_jpeg,
    )

    blocks = np.array([[32, 64, 126], [90, 126, 40]], dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), np.uint8))
    payload = encode_jpeg(img)
    pure = decode_jpeg(payload)
    native = decode_jpeg_auto(payload, prefer_native=True)
    assert native[:3] == pure[:3]
    assert (native[3] == pure[3]).all()


def test_jpeg_native_divergence_on_general_images_is_bounded():
    """DOCUMENTED DIVERGENCE (r12 advice): on general (non-fixed-point)
    images libjpeg's integer IDCT legitimately differs from the pure
    float IDCT by about ±1/pixel — same metadata, near-identical
    raster, but NOT bit-identical, which is exactly why the
    oracle-hashed extractors (`extract_jpeg_features`,
    `extract_jpeg_oriented_features`) default to the pure codec and
    expose the native path only behind ``use_native=True``."""
    import pytest

    pytest.importorskip("PIL")
    import numpy as np

    from implementation_of_an_etl_process_spark.operators.multimodal import (
        decode_jpeg,
        decode_jpeg_auto,
        encode_jpeg,
    )

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    payload = encode_jpeg(img)
    pure = decode_jpeg(payload)
    native = decode_jpeg_auto(payload, prefer_native=True)
    assert native[:3] == pure[:3]  # metadata always agrees
    diff = np.abs(
        native[3].astype(np.int16) - pure[3].astype(np.int16)
    ).max()
    assert diff <= 2  # close — but any nonzero diff flips a sha256


def test_jpeg_extractors_are_pure_codec_by_default(spark):
    """The oracle-gated extractor must hash the PURE decoder's raster
    regardless of environment: its sha256 equals decode_jpeg's even
    when the native kill-switch env var says 'prefer native'."""
    import hashlib
    import os

    from implementation_of_an_etl_process_spark.operators import (
        multimodal as M,
    )

    import numpy as np

    blocks = np.array([[32, 64], [90, 126]], dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), np.uint8))
    payload = M.encode_jpeg(img)
    _, _, _, raster = M.decode_jpeg(payload)
    expect = hashlib.sha256(raster.tobytes()).hexdigest()
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    old = os.environ.get("SPARK_GRAFT_NATIVE_JPEG")
    os.environ["SPARK_GRAFT_NATIVE_JPEG"] = "1"
    try:
        row = M.extract_jpeg_features(df).first()
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_NATIVE_JPEG", None)
        else:
            os.environ["SPARK_GRAFT_NATIVE_JPEG"] = old
    assert row.raster_sha256 == expect
