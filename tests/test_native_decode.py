"""Native C++ TIFF/LZW decoder: round-trip, corruption, and batch-shape
guards (native/tiff_lzw.cpp via imageprocess_tpu.native ctypes bindings).

The reference reads TIFFs through tifffile-with-PIL-fallback
(src/INT/Fluor_INT.py:350-368); the rebuild's native tier must fail loudly
on corrupt input (feeding the per-key LoadError isolation) instead of
returning partially-initialized buffers.
"""

import os

import numpy as np
import pytest
from PIL import Image

from imageprocess_tpu.native import decode_tiff, decode_tiff_batch


def _write(path, arr, compression="tiff_lzw"):
    Image.fromarray(arr).save(path, format="TIFF", compression=compression)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("dtype,comp", [
    (np.uint16, "tiff_lzw"),
    (np.uint8, "tiff_lzw"),
    (np.uint16, None),
])
def test_roundtrip_vs_pil(tmp_path_factory, rng, dtype, comp):
    p = str(tmp_path_factory.mktemp("nat") / "a.tif")
    hi = 65535 if dtype == np.uint16 else 255
    arr = rng.integers(0, hi + 1, size=(300, 257)).astype(dtype)
    _write(p, arr, compression=comp)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    assert got.dtype == arr.dtype
    assert np.array_equal(got, np.asarray(Image.open(p)))


def test_batch_matches_serial(tmp_path, rng):
    paths = []
    for i in range(4):
        arr = rng.integers(0, 65536, size=(64, 96)).astype(np.uint16)
        p = str(tmp_path / f"s{i}.tif")
        _write(p, arr)
        paths.append(p)
    out = decode_tiff_batch(paths)
    if out is None:
        pytest.skip("native decoder unavailable")
    assert out.shape == (4, 64, 96)
    for i, p in enumerate(paths):
        assert np.array_equal(out[i], np.asarray(Image.open(p)))


def test_batch_rejects_shape_mismatch(tmp_path, rng):
    """A smaller frame must NOT silently decode into a larger slot
    (misaligned rows + uninitialized tail) — the batch call errors and the
    wrapper returns None so callers fall back to per-file decode."""
    a = rng.integers(0, 65536, size=(64, 96)).astype(np.uint16)
    b = rng.integers(0, 65536, size=(32, 96)).astype(np.uint16)
    pa, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    _write(pa, a)
    _write(pb, b)
    if decode_tiff(pa) is None:
        pytest.skip("native decoder unavailable")
    assert decode_tiff_batch([pa, pb]) is None


def test_truncated_lzw_strip_fails(tmp_path, rng):
    """An in-bounds but short LZW stream must surface as a decode error
    (None), not a silently half-filled buffer."""
    arr = rng.integers(0, 65536, size=(128, 128)).astype(np.uint16)
    p = str(tmp_path / "t.tif")
    _write(p, arr)
    if decode_tiff(p) is None:
        pytest.skip("native decoder unavailable")
    raw = bytearray(open(p, "rb").read())
    # Truncate the file body: chop the last 25% of bytes and re-point any
    # strip that now runs off the end... simpler: zero out the tail of the
    # data so the LZW stream hits EOI/garbage early while staying in-bounds.
    cut = len(raw) * 3 // 4
    truncated = raw[:cut] + bytes(len(raw) - cut)
    p2 = str(tmp_path / "t2.tif")
    open(p2, "wb").write(bytes(truncated))
    got = decode_tiff(p2)
    # Either the header parse fails (None) or the strip decodes short (None);
    # a full-size array of correct content is impossible from corrupt data.
    if got is not None:
        assert not np.array_equal(got, arr)
        pytest.fail("corrupt file decoded without error")


def test_truncated_single_strip_fails(tmp_path, rng):
    """Surgically shorten one strip's byte count so the stream is valid but
    short: decode must fail (ADVICE r1: di == dst_len check)."""
    import struct

    arr = rng.integers(0, 65536, size=(200, 64)).astype(np.uint16)
    p = str(tmp_path / "s.tif")
    _write(p, arr)
    if decode_tiff(p) is None:
        pytest.skip("native decoder unavailable")
    raw = bytearray(open(p, "rb").read())
    # classic little-endian TIFF: walk IFD entries, find StripByteCounts
    # (279) and halve the first count value
    ifd = struct.unpack_from("<I", raw, 4)[0]
    n = struct.unpack_from("<H", raw, ifd)[0]
    for i in range(n):
        eo = ifd + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", raw, eo)
        if tag != 279:
            continue
        if cnt == 1 and typ == 4:  # inline LONG
            v = struct.unpack_from("<I", raw, eo + 8)[0]
            struct.pack_into("<I", raw, eo + 8, max(1, v // 2))
        else:
            off = struct.unpack_from("<I", raw, eo + 8)[0]
            size = 2 if typ == 3 else 4
            fmt = "<H" if typ == 3 else "<I"
            v = struct.unpack_from(fmt, raw, off)[0]
            struct.pack_into(fmt, raw, off, max(1, v // 2))
        break
    else:
        pytest.skip("no StripByteCounts tag found")
    p2 = str(tmp_path / "s2.tif")
    open(p2, "wb").write(bytes(raw))
    assert decode_tiff(p2) is None


def test_golden_parity(golden_intensity_dir):
    p = os.path.join(golden_intensity_dir, "e1_P0", "S01_2.TIF")
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    assert np.array_equal(got, np.asarray(Image.open(p)))


def test_stale_library_disables_gracefully():
    """A libiptiff.so missing a newly-bound symbol must not crash _load:
    _bind reports the stale binary and the loader rebuilds or disables
    the native tier (callers fall back to PIL)."""
    from imageprocess_tpu import native

    class _Stale:
        ip_tiff_info = object()  # has SOME symbols...

        def __getattr__(self, name):  # ...but not the newer ones
            raise AttributeError(name)

    assert native._bind(_Stale()) is False


def test_fuzzed_headers_fail_cleanly(tmp_path, golden_intensity_dir):
    """Randomly corrupted TIFF headers/IFDs must return None (clean error
    through the rc path) — never crash, hang, or hand back a frame of the
    wrong shape.  Guards the parser's bounds checks."""
    src = os.path.join(golden_intensity_dir, "e1_P0", "S01_2.TIF")
    raw = bytearray(open(src, "rb").read())
    if decode_tiff(src) is None:
        pytest.skip("native decoder unavailable")
    ref = np.asarray(Image.open(src))
    rng = np.random.default_rng(7)
    for trial in range(40):
        buf = bytearray(raw)
        # corrupt a burst inside the first 64 KB (header + IFD + early
        # strips) and, on odd trials, truncate the file as well
        off = int(rng.integers(0, min(65536, len(buf) - 16)))
        for k in range(int(rng.integers(1, 12))):
            buf[off + k] = int(rng.integers(0, 256))
        if trial % 2:
            buf = buf[: int(rng.integers(8, len(buf)))]
        p = str(tmp_path / f"fuzz_{trial}.tif")
        open(p, "wb").write(bytes(buf))
        got = decode_tiff(p)
        # either a clean failure or a full decode whose shape matches the
        # (possibly corrupted-in-place) header it declared — never garbage
        # of the wrong size, never an exception
        if got is not None:
            assert got.ndim == 2 and got.size > 0
    # the original still decodes bit-exactly afterwards (no global state
    # poisoned by the failed attempts)
    assert np.array_equal(decode_tiff(src), ref)


def test_u16_hist_percentile_parity():
    """u16_hist + percentile_from_hist == np.percentile (linear) exactly,
    for integer u16 data at any stride."""
    from imageprocess_tpu.native import percentile_from_hist, u16_hist

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 4000, (123, 217)).astype(np.uint16)
    for stride in (1, 4):
        for p1000 in (0, 1000, 2500, 50000, 99000, 100000):
            h = u16_hist(arr, stride)
            got = percentile_from_hist(h, p1000)
            want = float(np.percentile(
                arr.ravel()[::stride].astype(np.float64), p1000 / 1000.0))
            assert got == pytest.approx(want, abs=1e-9), (stride, p1000)


def test_decode_batch_hist_fused(tmp_path, rng):
    """The decoder's fused strided histogram (accumulated during the
    per-strip pass) equals np.bincount of frame.ravel()[::stride], for
    strides that do and don't divide the row width."""
    from PIL import Image

    from imageprocess_tpu.native import decode_tiff_batch, decode_tiff_batch_hist

    paths = []
    for k, (H, W) in enumerate([(96, 128), (61, 77)]):
        img = rng.integers(0, 65536, (H, W)).astype(np.uint16)
        p = str(tmp_path / f"f{k}.tif")
        Image.fromarray(img).save(p, format="TIFF", compression="tiff_lzw")
        paths.append(p)
    for stride in (1, 3, 4):
        for p in paths:  # per-file (shapes differ -> separate batch calls)
            out = decode_tiff_batch_hist([p], stride)
            if out is None:
                pytest.skip("native library unavailable")
            frames, hists = out
            want = np.bincount(frames[0].ravel()[::stride],
                               minlength=65536).astype(np.uint32)
            assert np.array_equal(hists[0], want), (p, stride)
    # stride 0 = no histogram requested; frames identical to plain batch
    f0, h0 = decode_tiff_batch_hist([paths[0]], 0)
    assert h0 is None
    assert np.array_equal(f0, decode_tiff_batch([paths[0]]))


def test_frame_buffer_pool_recycles(tmp_path, rng):
    """Pooled decode returns the SAME pages on the next same-shaped get and
    decodes bit-identically into them; views and foreign arrays are
    refused."""
    from PIL import Image

    from imageprocess_tpu.native import FrameBufferPool, decode_tiff_batch_hist

    imgs = [rng.integers(0, 65536, (64, 96)).astype(np.uint16)
            for _ in range(2)]
    paths = []
    for k, im in enumerate(imgs):
        p = str(tmp_path / f"p{k}.tif")
        Image.fromarray(im).save(p, format="TIFF", compression="tiff_lzw")
        paths.append(p)
    pool = FrameBufferPool()
    out = decode_tiff_batch_hist(paths, 0, pool=pool)
    if out is None:
        pytest.skip("native library unavailable")
    frames1, _ = out
    assert np.array_equal(frames1[0], imgs[0])
    addr1 = frames1.ctypes.data
    pool.put(frames1)
    frames2, _ = decode_tiff_batch_hist(paths[::-1], 0, pool=pool)
    assert frames2.ctypes.data == addr1          # recycled buffer
    assert np.array_equal(frames2[0], imgs[1])   # fully overwritten
    # views are not recyclable
    pool.put(frames2[0])
    got = pool.get(frames2[0].shape, np.uint16)
    assert got.ctypes.data != frames2[0].ctypes.data


def _write_raw_tiff(path, data_bytes, h, w, bits, *, predictor=1,
                    big_endian=False, compression=1, sample_format=None):
    """Hand-rolled minimal classic TIFF: one uncompressed strip, explicit
    predictor tag.  PIL never writes predictor=2, so the decoder's
    horizontal-differencing undo (incl. the SSE2 prefix-sum fast path,
    native/tiff_lzw.cpp undo_predictor) is reachable only through crafted
    files like these."""
    import struct

    e = ">" if big_endian else "<"
    magic = b"MM" if big_endian else b"II"
    data_off = 8
    ifd_off = data_off + len(data_bytes)
    entries = [
        (256, 3, 1, w),            # ImageWidth
        (257, 3, 1, h),            # ImageLength
        (258, 3, 1, bits),         # BitsPerSample
        (259, 3, 1, compression),  # 1 = none, 5 = LZW
        (262, 3, 1, 1),            # Photometric: minisblack
        (273, 4, 1, data_off),     # StripOffsets
        (277, 3, 1, 1),            # SamplesPerPixel
        (278, 3, 1, h),            # RowsPerStrip
        (279, 4, 1, len(data_bytes)),  # StripByteCounts
        (317, 3, 1, predictor),    # Predictor
    ]
    if sample_format is not None:
        entries.append((339, 3, 1, sample_format))  # SampleFormat
    buf = bytearray()
    buf += magic + struct.pack(e + "HI", 42, ifd_off)
    buf += data_bytes
    buf += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:  # SHORT sits left-justified in the 4-byte value field
            buf += struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
        else:
            buf += struct.pack(e + "HHII", tag, typ, cnt, val)
    buf += struct.pack(e + "I", 0)  # next IFD
    open(path, "wb").write(bytes(buf))


@pytest.mark.parametrize("w", [3, 5, 8, 13, 61, 2048])
def test_predictor2_u16_roundtrip(tmp_path, rng, w):
    """Predictor-2 undo == per-row inclusive prefix sum mod 2^16: widths
    below/at/above the 8-lane SIMD width hit the tail, main, and mixed
    paths."""
    h = 16
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    diff = arr.copy()
    diff[:, 1:] -= arr[:, :-1]          # uint16 wraparound == mod 2^16
    p = str(tmp_path / f"p2_{w}.tif")
    _write_raw_tiff(p, diff.tobytes(), h, w, 16, predictor=2)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, arr)


def test_predictor2_u8_roundtrip(tmp_path, rng):
    h, w = 16, 61
    arr = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    diff = arr.copy()
    diff[:, 1:] -= arr[:, :-1]
    p = str(tmp_path / "p2_u8.tif")
    _write_raw_tiff(p, diff.tobytes(), h, w, 8, predictor=2)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, arr)


def test_big_endian_u16_with_predictor(tmp_path, rng):
    """'MM' file: byteswap runs BEFORE the predictor undo; both must
    compose to the original values."""
    h, w = 8, 61
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    diff = arr.copy()
    diff[:, 1:] -= arr[:, :-1]
    p = str(tmp_path / "be.tif")
    _write_raw_tiff(p, diff.astype(">u2").tobytes(), h, w, 16,
                    predictor=2, big_endian=True)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, arr)


def test_big_endian_u16_plain(tmp_path, rng):
    h, w = 8, 32
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    p = str(tmp_path / "be1.tif")
    _write_raw_tiff(p, arr.astype(">u2").tobytes(), h, w, 16,
                    predictor=1, big_endian=True)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, arr)


def test_fuzzed_strip_payloads_fail_cleanly(tmp_path, rng):
    """Structurally valid TIFFs with random LZW strip payloads: decode must
    return data or None, never crash or hang (the ASan/UBSan sweep lives in
    native/fuzz_decode.cc — 2000 cases clean; this keeps a fast slice in CI)."""
    for it in range(60):
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 64))
        payload = rng.integers(0, 256, size=int(rng.integers(1, 2048))).astype(np.uint8)
        p = str(tmp_path / f"f{it}.tif")
        _write_raw_tiff(p, payload.tobytes(), h, w, 16,
                        predictor=int(rng.integers(1, 3)))
        # flip compression to LZW on half the cases by patching tag 259
        if it % 2:
            import struct
            raw = bytearray(open(p, "rb").read())
            ifd = struct.unpack_from("<I", raw, 4)[0]
            n = struct.unpack_from("<H", raw, ifd)[0]
            for i in range(n):
                eo = ifd + 2 + 12 * i
                tag = struct.unpack_from("<H", raw, eo)[0]
                if tag == 259:
                    struct.pack_into("<H", raw, eo + 8, 5)
                    break
            open(p, "wb").write(bytes(raw))
        got = decode_tiff(p)  # None (rejected) or an (h, w) array — both fine
        if got is not None:
            assert got.shape == (h, w)


def test_multi_strip_rows_per_strip_truncation_guard(tmp_path):
    """Crafted RowsPerStrip near 2^31: 32-bit `s * rows_per_strip` once
    truncated strip 2's start row to 2 (0x100000002 -> 2), memcpy-ing
    attacker strip bytes over valid rows (and, at scale, past the buffer
    via the `row0 + rows` uint32 wrap).  64-bit geometry must skip every
    strip whose true start row is past the image."""
    import struct

    h, w = 8, 4
    good = np.arange(h * w, dtype="<u2").reshape(h, w)
    evil = np.full((h, w), 0xBEEF, "<u2")
    data, garbage = good.tobytes(), evil.tobytes()
    e = "<"
    data_off = 8
    garbage_off = data_off + len(data)
    arrays_off = garbage_off + len(garbage)
    # out-of-line arrays: 3 strip offsets (strips 1,2 -> garbage), 3 counts
    offsets = [data_off, garbage_off, garbage_off]
    counts = [len(data)] * 3
    ifd_off = arrays_off + 24
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16),
        (259, 3, 1, 1), (262, 3, 1, 1),
        (273, 4, 3, arrays_off),            # StripOffsets -> array
        (277, 3, 1, 1),
        (278, 4, 1, 0x80000001),            # RowsPerStrip: LONG near 2^31
        (279, 4, 3, arrays_off + 12),       # StripByteCounts -> array
    ]
    buf = bytearray()
    buf += b"II" + struct.pack(e + "HI", 42, ifd_off)
    buf += data + garbage
    for v in offsets + counts:
        buf += struct.pack(e + "I", v)
    buf += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            buf += struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
        else:
            buf += struct.pack(e + "HHII", tag, typ, cnt, val)
    buf += struct.pack(e + "I", 0)
    p = str(tmp_path / "evil_rps.tif")
    open(p, "wb").write(bytes(buf))

    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    # strip 0 covers the full image (rows clamp to h); strips 1-2 start
    # past row h in 64-bit math and must contribute nothing
    np.testing.assert_array_equal(got, good)


def _lzw_encode(data: bytes) -> bytes:
    """Minimal TIFF-variant LZW encoder (MSB-first packing, early change):
    used to craft streams PIL can't be coaxed into writing — in particular
    streams that decode to MORE bytes than the declared image."""
    out = bytearray()
    acc = 0
    nbits = 0
    code_bits = 9

    def put(code):
        nonlocal acc, nbits
        acc = (acc << code_bits) | code
        nbits += code_bits
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    put(256)  # Clear
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        put(table[w])
        table[wc] = next_code
        next_code += 1
        # TIFF early change, seen from the ENCODER: the decoder's table
        # runs one entry behind and bumps width when ITS next_code hits
        # (1 << bits) - 1, which is one code LATER in the stream — so the
        # encoder bumps at (1 << bits)
        if next_code == (1 << code_bits) and code_bits < 12:
            code_bits += 1
        if next_code >= 4094:  # stay clear of table-full handling
            put(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_bits = 9
        w = bytes([b])
    if w:
        put(table[w])
    put(257)  # EoI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_encoder_roundtrip(tmp_path):
    """Sanity-pin the in-test encoder itself against the decoder."""
    data = bytes([0, 0, 7, 7, 7, 0, 1, 2, 3] * 50 + list(range(256)))
    p = str(tmp_path / "enc.tif")
    _write_raw_tiff(p, _lzw_encode(data), 1, len(data), 8, compression=5)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got.ravel(), np.frombuffer(data, np.uint8))


def test_overlong_lzw_stream_clips_without_overrun(tmp_path):
    """A stream that decodes to MORE bytes than the declared image must clip
    at exactly dst_len and succeed with the exact prefix (the reference path
    via PIL truncates the same way) — and never write past dst.

    The (Z, dst_len) sweep is built so the clip point crosses LONG (~50-byte)
    table strings at every offset and pair phase, with both a long-string and
    a 1-byte-literal follow-up code: the hazardous alignment for the bulk
    fast emit, which skips its per-code dst-bound compare (the byte-canary
    sweep over the same geometry lives in native/fuzz_decode.cc and runs
    under ASan; this is the deterministic CI slice)."""
    hit = 0
    for Z in (1276, 1290, 1301):
        data = bytes(Z) + b"\x07" * 64
        enc = _lzw_encode(data)
        full = np.frombuffer(data, np.uint8)
        for w in range(Z - 80, Z + 3):
            p = str(tmp_path / f"o{Z}_{w}.tif")
            _write_raw_tiff(p, enc, 1, w, 8, compression=5)
            got = decode_tiff(p)
            if got is None and hit == 0:
                pytest.skip("native decoder unavailable")
            assert got is not None, (Z, w)
            np.testing.assert_array_equal(got.ravel(), full[:w])
            hit += 1
    assert hit == 3 * 83


@pytest.mark.parametrize("dtype,comp", [
    (np.uint16, "packbits"),
    (np.uint8, "packbits"),
    (np.uint16, "tiff_adobe_deflate"),
    (np.uint8, "tiff_adobe_deflate"),
])
def test_packbits_deflate_roundtrip_vs_pil(tmp_path, rng, dtype, comp):
    """Native PackBits (32773) and Adobe deflate (8) strips decode
    bit-exactly vs PIL (the reference reads these through tifffile/PIL:
    src/INT/Fluor_INT.py:350-368; microscopy exports commonly use both)."""
    hi = 65535 if dtype == np.uint16 else 255
    # runs + noise: exercises both PackBits literal and repeat packets
    arr = rng.integers(0, hi + 1, size=(130, 201)).astype(dtype)
    arr[:40] = 7
    arr[50:60, 100:] = 0
    p = str(tmp_path / "c.tif")
    _write(p, arr, compression=comp)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    assert got.dtype == arr.dtype
    np.testing.assert_array_equal(got, np.asarray(Image.open(p)))


def test_deflate_with_predictor2_and_big_endian(tmp_path, rng):
    """PIL never writes predictor with deflate; craft it: the inflate must
    compose with byteswap + prefix-sum undo exactly like the LZW path."""
    import zlib

    h, w = 16, 61
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    diff = arr.copy()
    diff[:, 1:] -= arr[:, :-1]
    p = str(tmp_path / "dfp.tif")
    _write_raw_tiff(p, zlib.compress(diff.astype(">u2").tobytes()), h, w, 16,
                    predictor=2, big_endian=True, compression=8)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, arr)
    # old-style code 32946 takes the same path
    p2 = str(tmp_path / "dfp2.tif")
    _write_raw_tiff(p2, zlib.compress(diff.astype(">u2").tobytes()), h, w, 16,
                    predictor=2, big_endian=True, compression=32946)
    np.testing.assert_array_equal(decode_tiff(p2), arr)


def test_short_and_corrupt_packbits_deflate_fail(tmp_path, rng):
    """Short or corrupt PackBits/deflate strips must error (None), never
    return a half-filled buffer — same contract as the LZW path."""
    import zlib

    h, w = 32, 64
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    full_deflate = zlib.compress(arr.tobytes())
    probe = str(tmp_path / "probe.tif")
    _write_raw_tiff(probe, full_deflate, h, w, 16, compression=8)
    if decode_tiff(probe) is None:
        pytest.skip("native decoder unavailable")
    cases = {
        # deflate stream for HALF the rows: ends cleanly but short
        "df_short": (zlib.compress(arr[: h // 2].tobytes()), 8),
        # broken zlib header: corrupt from byte 0 (mid-stream byte flips in
        # STORED blocks — random data — stay structurally valid and fall
        # under the clip-accept rule, so corrupt the frame itself)
        "df_corrupt": (b"\x00\x00" + full_deflate[2:], 8),
        # PackBits that ends mid-image
        "pb_short": (b"\x05" + bytes(6), 32773),
    }
    for name, (payload, comp) in cases.items():
        p = str(tmp_path / f"{name}.tif")
        _write_raw_tiff(p, payload, h, w, 16, compression=comp)
        assert decode_tiff(p) is None, name


def test_int16_sample_format_rejected(tmp_path, rng):
    """bits=16 with SampleFormat=2 (signed) or 3 (IEEE half): decoding the
    raw bit patterns as uint16 would be silent garbage — the native tier
    must return None so callers fall back to PIL, which honors the tag.
    SampleFormat=4 ("undefined") conventionally reads as unsigned."""
    h, w = 8, 16
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    probe = str(tmp_path / "sf1.tif")
    _write_raw_tiff(probe, arr.tobytes(), h, w, 16, sample_format=1)
    if decode_tiff(probe) is None:
        pytest.skip("native decoder unavailable")
    for sf in (2, 3):
        p = str(tmp_path / f"sf{sf}.tif")
        _write_raw_tiff(p, arr.tobytes(), h, w, 16, sample_format=sf)
        assert decode_tiff(p) is None, f"sample_format={sf}"
    p4 = str(tmp_path / "sf4.tif")
    _write_raw_tiff(p4, arr.tobytes(), h, w, 16, sample_format=4)
    np.testing.assert_array_equal(decode_tiff(p4), arr)


def test_packbits_truncated_final_literal_clips(tmp_path):
    """A stream whose FINAL literal packet fills dst but is stored
    truncated right after the dst-filling byte is accepted (PIL stops as
    soon as dst fills) — the clip must be applied BEFORE the src bound
    check.  Declaring bytes that are both missing AND needed still errors."""
    h, w = 1, 4
    want = np.frombuffer(bytes([9, 8, 7, 6]), np.uint8).reshape(h, w)
    # header declares 6 literal bytes; only the 4 dst needs are stored
    p = str(tmp_path / "pb_clip.tif")
    _write_raw_tiff(p, b"\x05" + bytes([9, 8, 7, 6]), h, w, 8,
                    compression=32773)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, want)
    # genuinely short: dst needs 4, literal stores only 3
    p2 = str(tmp_path / "pb_short2.tif")
    _write_raw_tiff(p2, b"\x05" + bytes([9, 8, 7]), h, w, 8,
                    compression=32773)
    assert decode_tiff(p2) is None


def test_packbits_multi_strip_vs_pil(tmp_path, rng):
    """PIL writes one PackBits strip per row block; a taller image makes
    multiple strips so the per-strip fill contract is exercised."""
    arr = rng.integers(0, 65536, size=(600, 300)).astype(np.uint16)
    arr[::3] = 1  # compressible rows keep PIL's strips small
    p = str(tmp_path / "ms.tif")
    _write(p, arr, compression="packbits")
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, np.asarray(Image.open(p)))


def _write_raw_tiled_tiff(path, tile_blobs, h, w, tw, th, bits, *,
                          predictor=1, big_endian=False, compression=1):
    """Hand-rolled tiled classic TIFF (tags 322-325).  PIL only writes
    stripped TIFFs, so the tiled path (OME-TIFF-style exports) is reachable
    only through crafted files.  tile_blobs: row-major per-tile encoded
    bytes, each decoding to a FULL tw*th tile (edge tiles padded, TIFF6)."""
    import struct

    e = ">" if big_endian else "<"
    magic = b"MM" if big_endian else b"II"
    data_off = 8
    offs, cnts = [], []
    body = bytearray()
    for blob in tile_blobs:
        offs.append(data_off + len(body))
        cnts.append(len(blob))
        body += blob
    arrays_off = data_off + len(body)
    n = len(tile_blobs)
    ifd_off = arrays_off + 8 * n
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bits),
        (259, 3, 1, compression), (262, 3, 1, 1), (277, 3, 1, 1),
        (317, 3, 1, predictor),
        (322, 3, 1, tw), (323, 3, 1, th),
        (324, 4, n, offs[0] if n == 1 else arrays_off),
        (325, 4, n, cnts[0] if n == 1 else arrays_off + 4 * n),
    ]
    buf = bytearray()
    buf += magic + struct.pack(e + "HI", 42, ifd_off)
    buf += body
    if n > 1:
        for v in offs + cnts:
            buf += struct.pack(e + "I", v)
    else:
        buf += bytes(8)  # keep ifd_off stable
    buf += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            buf += struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
        else:
            buf += struct.pack(e + "HHII", tag, typ, cnt, val)
    buf += struct.pack(e + "I", 0)
    open(path, "wb").write(bytes(buf))


def _tile_grid(arr, tw, th):
    """Split into row-major full-size tiles, zero-padding the edges."""
    h, w = arr.shape
    tiles = []
    for y0 in range(0, h, th):
        for x0 in range(0, w, tw):
            t = np.zeros((th, tw), arr.dtype)
            src = arr[y0:y0 + th, x0:x0 + tw]
            t[: src.shape[0], : src.shape[1]] = src
            tiles.append(t)
    return tiles


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
def test_tiled_tiff_all_compressions(tmp_path, rng, comp):
    """Tiled u16 pages with PARTIAL edge tiles decode exactly under every
    supported compression (tiles are independently compressed full-size
    blocks; only the valid region may land in the output)."""
    import zlib

    h, w, tw, th = 100, 150, 64, 48  # 3x3 grid, ragged right/bottom edges
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    blobs = []
    for t in _tile_grid(arr, tw, th):
        raw = t.tobytes()
        if comp == 1:
            blobs.append(raw)
        elif comp == 5:
            blobs.append(_lzw_encode(raw))
        elif comp == 8:
            blobs.append(zlib.compress(raw))
        else:  # packbits: trivial all-literal packets (128-byte chunks)
            pb = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i:i + 128]
                pb += bytes([len(chunk) - 1]) + chunk
            blobs.append(bytes(pb))
    p = str(tmp_path / f"tiled_{comp}.tif")
    _write_raw_tiled_tiff(p, blobs, h, w, tw, th, 16, compression=comp)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, arr)


def test_tiled_predictor2_big_endian(tmp_path, rng):
    """Predictor-2 applies per TILE row (tile width, not image width) and
    composes with the big-endian byteswap."""
    h, w, tw, th = 40, 70, 32, 16
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    blobs = []
    for t in _tile_grid(arr, tw, th):
        diff = t.copy()
        diff[:, 1:] -= t[:, :-1]
        blobs.append(_lzw_encode(diff.astype(">u2").tobytes()))
    p = str(tmp_path / "tiled_p2be.tif")
    _write_raw_tiled_tiff(p, blobs, h, w, tw, th, 16, predictor=2,
                          big_endian=True, compression=5)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, arr)


def test_tiled_corrupt_and_missing_tiles_fail(tmp_path, rng):
    h, w, tw, th = 64, 64, 32, 32
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    blobs = [_lzw_encode(t.tobytes()) for t in _tile_grid(arr, tw, th)]
    probe = str(tmp_path / "ok.tif")
    _write_raw_tiled_tiff(probe, blobs, h, w, tw, th, 16, compression=5)
    if decode_tiff(probe) is None:
        pytest.skip("native decoder unavailable")
    # drop the last tile: region would stay unwritten -> error
    p1 = str(tmp_path / "missing.tif")
    _write_raw_tiled_tiff(p1, blobs[:-1], h, w, tw, th, 16, compression=5)
    assert decode_tiff(p1) is None
    # truncate one tile's stream -> short -> error
    p2 = str(tmp_path / "shorttile.tif")
    _write_raw_tiled_tiff(p2, blobs[:3] + [blobs[3][:4]], h, w, tw, th, 16,
                          compression=5)
    assert decode_tiff(p2) is None


def test_tiled_batch_hist_parity(tmp_path, rng):
    """Tiled files ride the batch+fused-histogram entry: the strided
    histogram over non-contiguous tile row segments must equal the
    flat-sequence histogram of the whole frame."""
    from imageprocess_tpu.native import decode_tiff_batch_hist

    h, w, tw, th = 96, 130, 64, 32
    imgs = [rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
            for _ in range(2)]
    paths = []
    for k, im in enumerate(imgs):
        blobs = [_lzw_encode(t.tobytes()) for t in _tile_grid(im, tw, th)]
        p = str(tmp_path / f"t{k}.tif")
        _write_raw_tiled_tiff(p, blobs, h, w, tw, th, 16, compression=5)
        paths.append(p)
    stride = 7
    out = decode_tiff_batch_hist(paths, stride)
    if out is None:
        pytest.skip("native decoder unavailable")
    frames, hists = out
    for k, im in enumerate(imgs):
        np.testing.assert_array_equal(frames[k], im)
        want = np.bincount(im.reshape(-1)[::stride], minlength=65536)
        np.testing.assert_array_equal(hists[k], want)


def _write_bigtiff(path, blobs, h, w, bits, *, tw=0, th=0, predictor=1,
                   big_endian=False, compression=1, rows_per_strip=None):
    """Minimal BigTIFF (version 43: u64 offsets, 20-byte IFD entries).
    Neither PIL nor the reference toolkit writes BigTIFF — crafted files are
    the only way to pin the 64-bit parser.  blobs: per-strip (or per-tile
    when tw/th set) encoded payloads."""
    import struct

    e = ">" if big_endian else "<"
    magic = b"MM" if big_endian else b"II"
    data_off = 16
    offs, cnts = [], []
    body = bytearray()
    for blob in blobs:
        offs.append(data_off + len(body))
        cnts.append(len(blob))
        body += blob
    arrays_off = data_off + len(body)
    n = len(blobs)
    ifd_off = arrays_off + 16 * n
    tiled = bool(tw or th)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bits),
        (259, 3, 1, compression), (262, 3, 1, 1), (277, 3, 1, 1),
        (317, 3, 1, predictor),
    ]
    if tiled:
        entries += [(322, 3, 1, tw), (323, 3, 1, th),
                    (324, 16, n, offs[0] if n == 1 else arrays_off),
                    (325, 16, n, cnts[0] if n == 1 else arrays_off + 8 * n)]
    else:
        entries += [(273, 16, n, offs[0] if n == 1 else arrays_off),
                    (278, 3, 1, rows_per_strip or h),
                    (279, 16, n, cnts[0] if n == 1 else arrays_off + 8 * n)]
    entries.sort()
    buf = bytearray()
    buf += magic + struct.pack(e + "HHHQ", 43, 8, 0, ifd_off)
    buf += body
    if n > 1:
        for v in offs + cnts:
            buf += struct.pack(e + "Q", v)
    else:
        buf += bytes(16 * n)  # keep ifd_off stable
    buf += struct.pack(e + "Q", len(entries))
    for tag, typ, cnt, val in entries:
        buf += struct.pack(e + "HHQ", tag, typ, cnt)
        if typ == 3:  # SHORT sits LEFT-justified in the 8-byte value field
            buf += struct.pack(e + "H", val) + bytes(6)
        else:
            buf += struct.pack(e + "Q", val)
    buf += struct.pack(e + "Q", 0)  # next IFD
    open(path, "wb").write(bytes(buf))


def test_bigtiff_strips_lzw(tmp_path, rng):
    """BigTIFF (u64 offsets, LONG8 strip arrays) with multiple LZW strips
    decodes exactly; both endiannesses."""
    h, w, rps = 50, 80, 16
    for be in (False, True):
        arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
        blobs = []
        for y0 in range(0, h, rps):
            rows = arr[y0:y0 + rps]
            raw = rows.astype(">u2" if be else "<u2").tobytes()
            blobs.append(_lzw_encode(raw))
        p = str(tmp_path / f"bt_{be}.tif")
        _write_bigtiff(p, blobs, h, w, 16, compression=5,
                       rows_per_strip=rps, big_endian=be)
        got = decode_tiff(p)
        if got is None:
            pytest.skip("native decoder unavailable")
        np.testing.assert_array_equal(got, arr)


def test_bigtiff_tiled_deflate_predictor(tmp_path, rng):
    import zlib

    h, w, tw, th = 60, 90, 32, 32
    arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    blobs = []
    for t in _tile_grid(arr, tw, th):
        diff = t.copy()
        diff[:, 1:] -= t[:, :-1]
        blobs.append(zlib.compress(diff.tobytes()))
    p = str(tmp_path / "bt_tiled.tif")
    _write_bigtiff(p, blobs, h, w, 16, tw=tw, th=th, predictor=2,
                   compression=8)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, arr)


def test_bigtiff_malformed_header_rejected(tmp_path, rng):
    arr = rng.integers(0, 65536, size=(8, 8)).astype(np.uint16)
    p = str(tmp_path / "bt_ok.tif")
    _write_bigtiff(p, [_lzw_encode(arr.tobytes())], 8, 8, 16, compression=5)
    if decode_tiff(p) is None:
        pytest.skip("native decoder unavailable")
    raw = bytearray(open(p, "rb").read())
    raw[4] = 4  # offset size 4 instead of 8: malformed
    p2 = str(tmp_path / "bt_bad.tif")
    open(p2, "wb").write(bytes(raw))
    assert decode_tiff(p2) is None


def test_rgb_samples3_roundtrip_vs_pil(tmp_path, rng):
    """samples_per_pixel=3 (RGB) decodes to (H, W, 3) bit-exactly, with the
    per-sample predictor-2 undo (row[i] += row[i-samples])."""
    arr = rng.integers(0, 256, (60, 85, 3)).astype(np.uint8)
    p = str(tmp_path / "rgb.tif")
    Image.fromarray(arr, "RGB").save(p, format="TIFF",
                                     compression="tiff_lzw")
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(got, arr)
    # crafted predictor-2 RGB (PIL never writes it)
    diff = arr.astype(np.int16)
    diff[:, 1:] -= arr[:, :-1].astype(np.int16)
    p2 = str(tmp_path / "rgb_p2.tif")
    _write_raw_tiff(p2, (diff & 0xFF).astype(np.uint8).tobytes(),
                    60, 85 * 3 // 3, 8, predictor=2)
    # _write_raw_tiff hardcodes samples=1; craft via the tiled writer's
    # sibling isn't needed — patch SamplesPerPixel (277) to 3 in place
    import struct
    raw = bytearray(open(p2, "rb").read())
    ifd = struct.unpack_from("<I", raw, 4)[0]
    n = struct.unpack_from("<H", raw, ifd)[0]
    for i in range(n):
        eo = ifd + 2 + 12 * i
        if struct.unpack_from("<H", raw, eo)[0] == 277:
            struct.pack_into("<H", raw, eo + 8, 3)
            break
    open(p2, "wb").write(bytes(raw))
    got2 = decode_tiff(p2)
    assert got2 is not None
    np.testing.assert_array_equal(got2, arr)


def test_float32_reads_what_write_tiff32_writes(tmp_path, rng):
    """SampleFormat=3 bits=32: the native tier reads the f32 analysis
    TIFFs core.tiffio.write_tiff32 emits (ratio/R_full exports)."""
    from imageprocess_tpu.core import tiffio

    arr = rng.normal(0, 100, (120, 150)).astype(np.float32)
    p = str(tmp_path / "f32.tif")
    tiffio.write_tiff32(p, arr)
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, arr)
    # LZW-compressed f32 (PIL mode F)
    p2 = str(tmp_path / "f32_lzw.tif")
    Image.fromarray(arr, mode="F").save(p2, format="TIFF",
                                        compression="tiff_lzw")
    got2 = decode_tiff(p2)
    if got2 is not None:  # PIL may not tag SampleFormat on all versions
        np.testing.assert_array_equal(got2, arr)
    np.testing.assert_array_equal(np.asarray(Image.open(p2)), arr)


def test_float32_big_endian_deflate(tmp_path, rng):
    """Crafted big-endian deflate f32: the 4-byte swap composes with
    inflate.  Needs a SampleFormat tag, which _write_raw_tiff lacks —
    patched in via the raw writer's tag table."""
    import struct
    import zlib

    h, w = 20, 31
    arr = rng.normal(0, 10, (h, w)).astype(np.float32)
    payload = zlib.compress(arr.astype(">f4").tobytes())
    p = str(tmp_path / "f32be.tif")
    _write_raw_tiff(p, payload, h, w, 32, big_endian=True, compression=8)
    # append SampleFormat=3: rewrite the IFD with one more entry
    raw = bytearray(open(p, "rb").read())
    ifd = struct.unpack_from(">I", raw, 4)[0]
    n = struct.unpack_from(">H", raw, ifd)[0]
    entries = raw[ifd + 2: ifd + 2 + 12 * n]
    entries += struct.pack(">HHIHH", 339, 3, 1, 3, 0)
    new_ifd = raw[:ifd] + struct.pack(">H", n + 1) + entries + b"\0\0\0\0"
    open(p, "wb").write(bytes(new_ifd))
    got = decode_tiff(p)
    if got is None:
        pytest.skip("native decoder unavailable")
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, arr)


def test_uint32_and_predictor_f32_fall_back(tmp_path, rng):
    """bits=32 WITHOUT SampleFormat=3 (uint32) and f32-with-predictor are
    out of native scope: decode_tiff must return None (PIL fallback), not
    misinterpret the bytes."""
    h, w = 8, 8
    data = rng.integers(0, 2**32, (h, w), dtype=np.uint32).tobytes()
    p = str(tmp_path / "u32.tif")
    _write_raw_tiff(p, data, h, w, 32)
    if decode_tiff(str(p)) is not None:
        pytest.fail("uint32 page decoded despite unsupported SampleFormat")


def test_batch_mixed_compressions(tmp_path, rng):
    """One batch may mix per-file compressions (same shape): each file
    parses independently; the shape check is what gates the batch."""
    arr1 = rng.integers(0, 65536, (64, 96)).astype(np.uint16)
    arr2 = rng.integers(0, 65536, (64, 96)).astype(np.uint16)
    p1, p2 = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    _write(p1, arr1, compression="tiff_lzw")
    _write(p2, arr2, compression="tiff_adobe_deflate")
    out = decode_tiff_batch([p1, p2])
    if out is None:
        pytest.skip("native decoder unavailable")
    np.testing.assert_array_equal(out[0], arr1)
    np.testing.assert_array_equal(out[1], arr2)


def test_decode_batch_hist_tiles_fused(tmp_path, rng):
    """The decoder's fused ROI-tile extraction equals a numpy gather from
    the decoded frames, with hists intact, zeroed pad lanes, and bounds
    rejection (ip_tiff_decode_batch_hist_tiles)."""
    from PIL import Image

    from imageprocess_tpu.native import (
        FrameBufferPool, decode_tiff_batch_hist, decode_tiff_batch_hist_tiles,
    )

    H, W = 96, 131
    paths = []
    for c in range(2):
        img = rng.integers(0, 65536, (H, W)).astype(np.uint16)
        p = str(tmp_path / f"c{c}.tif")
        Image.fromarray(img).save(p, format="TIFF", compression="tiff_lzw")
        paths.append(p)
    tile = 32
    offs = np.array([[0, 0], [64, 99], [13, 7], [64, 0]], np.int32)
    out = decode_tiff_batch_hist_tiles(paths, 4, offs, tile, pad_tiles=2)
    if out is None:
        pytest.skip("native library unavailable")
    frames, hists, tiles = out
    ref = decode_tiff_batch_hist(paths, 4)
    assert np.array_equal(frames, ref[0])
    assert np.array_equal(hists, ref[1])
    assert tiles.shape == (6, 2, tile, tile) and tiles.dtype == np.uint16
    for ti, (oy, ox) in enumerate(offs):
        for c in range(2):
            assert np.array_equal(tiles[ti, c],
                                  frames[c, oy:oy + tile, ox:ox + tile])
    assert not tiles[4:].any()  # pad lanes zeroed

    # out-of-bounds offsets are rejected (never a silent overrun)
    bad = np.array([[H - tile + 1, 0]], np.int32)
    assert decode_tiff_batch_hist_tiles(paths, 0, bad, tile) is None
    assert decode_tiff_batch_hist_tiles(paths, 0,
                                        np.array([[-1, 0]], np.int32),
                                        tile) is None

    # pooled variant recycles both the frame and the tile buffers
    pool = FrameBufferPool()
    out1 = decode_tiff_batch_hist_tiles(paths, 0, offs, tile, pad_tiles=2,
                                        pool=pool)
    f1, _, t1 = out1
    assert np.array_equal(t1[:4], tiles[:4]) and not t1[4:].any()
    pool.put(f1)
    pool.put(t1)
    out2 = decode_tiff_batch_hist_tiles(paths, 0, offs, tile, pad_tiles=2,
                                        pool=pool)
    f2, _, t2 = out2
    assert f2 is f1 and t2 is t1  # same recycled pages
    assert np.array_equal(t2[:4], tiles[:4]) and not t2[4:].any()
