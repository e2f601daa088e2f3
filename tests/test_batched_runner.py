"""Batched multi-frame intensity runner: row parity with the serial runner,
single-device and sharded over the 8-device CPU mesh."""

import os

import numpy as np
import pytest

from imageprocess_tpu.core import roiio, tiffio
from imageprocess_tpu.pipelines.intensity import (
    IntensityConfig, run_intensity, run_intensity_batched,
)


@pytest.fixture(scope="module")
def timelapse_folder(tmp_path_factory):
    # frames must fit the tiled path's chosen tile in BOTH dims so the
    # batch program actually runs (too-small frames silently fall back to
    # the serial path and the parity asserts compare serial vs serial)
    folder = tmp_path_factory.mktemp("tl")
    rng = np.random.default_rng(0)
    H, W = 160, 192
    polys = [np.array([[15, 15], [60, 18], [55, 70], [12, 66]], float),
             np.array([[70, 40], [115, 45], [110, 85], [65, 80]], float)]
    for t in range(8):
        for ch in (1, 2):
            tiffio.write_tiff16(
                str(folder / f"S01_t{t:02d}_{ch}.TIF"),
                rng.integers(10, 3000, (H, W)).astype(np.uint16))
        roiio.save_roi_bundle(str(folder / "roi" / f"S01_t{t:02d}.json"),
                              f"S01_t{t:02d}", (H, W), polys)
    return folder


def _key(r):
    return (r["stage"], r["time"], r["roi"])


def test_batched_matches_serial(timelapse_folder, tmp_path):
    cfg = IntensityConfig(channels=(1, 2), timelapse=True, do_xls=False)
    serial = run_intensity(str(timelapse_folder), cfg,
                           out_root=str(tmp_path / "s"), log=lambda *_: None)
    batch_logs = []
    batched = run_intensity_batched(str(timelapse_folder), cfg,
                                    out_root=str(tmp_path / "b"),
                                    log=batch_logs.append, batch_size=3)
    # the batch program (not the serial fallback) must have run
    assert any(str(line).startswith(("[batch]", "[배치]"))
               for line in batch_logs)
    assert len(serial) == len(batched) == 16
    sd = {_key(r): r for r in serial}
    for r in batched:
        ref = sd[_key(r)]
        for k, v in ref.items():
            if isinstance(v, float):
                if np.isnan(v):
                    assert np.isnan(r[k])
                else:
                    assert abs(r[k] - v) <= 1e-5 * max(abs(v), 1e-9), (k, r[k], v)
            else:
                assert r[k] == v, k


def test_chunk_autoscale_grows_and_stays_correct(tmp_path):
    """When decode runs ahead of the device (always true for tiny frames on
    CPU), the runner doubles the frames-per-dispatch; rows still match the
    serial runner exactly."""
    from imageprocess_tpu.parallel import runner as runner_mod

    folder = tmp_path / "exp"
    rng = np.random.default_rng(1)
    H, W = 160, 192
    polys = [np.array([[15, 15], [60, 18], [55, 70], [12, 66]], float)]
    for t in range(24):
        for ch in (1,):
            tiffio.write_tiff16(str(folder / f"S01_t{t:02d}_{ch}.TIF"),
                                rng.integers(10, 3000, (H, W)).astype(np.uint16))
        roiio.save_roi_bundle(str(folder / "roi" / f"S01_t{t:02d}.json"),
                              f"S01_t{t:02d}", (H, W), polys)
    cfg = IntensityConfig(channels=(1,), timelapse=True, do_xls=False)
    serial = run_intensity(str(folder), cfg, out_root=str(tmp_path / "s"),
                           log=lambda *_: None)

    chunk_lens = []
    orig = runner_mod.stream_batches

    def spy(loader, batch_size, classify, dispatch, emit, serial_fb, on_err,
            **kw):
        def dispatch_spy(chunk):
            chunk_lens.append(len(chunk))
            return dispatch(chunk)
        return orig(loader, batch_size, classify, dispatch_spy, emit,
                    serial_fb, on_err, **kw)

    # the pipeline imports stream_batches at call time, so patching the
    # runner module name is enough
    import unittest.mock as mock
    with mock.patch.object(runner_mod, "stream_batches", spy):
        batched = run_intensity_batched(
            str(folder), cfg, out_root=str(tmp_path / "b"),
            log=lambda *_: None, batch_size=2)
    assert len(batched) == len(serial) == 24
    # the chunk size grew beyond the requested 2 at least once
    assert max(chunk_lens) > 2, chunk_lens
    sd = {_key(r): r for r in serial}
    for r in batched:
        ref = sd[_key(r)]
        for k, v in ref.items():
            if isinstance(v, float) and not np.isnan(v):
                assert abs(r[k] - v) <= 1e-5 * max(abs(v), 1e-9), (k, r[k], v)


def test_stream_batches_callable_size():
    """stream_batches re-reads a callable batch size at chunk boundaries."""
    from imageprocess_tpu.parallel.runner import stream_batches

    sizes = {"bs": 2}
    chunks, emitted = [], []
    stream_batches(
        list(range(10)), lambda: sizes["bs"],
        classify=lambda x: ("batch", x),
        dispatch=lambda c: (chunks.append(list(c)), c)[1],
        emit=lambda rec: (emitted.extend(rec),
                          sizes.__setitem__("bs", sizes["bs"] * 2)),
        serial=lambda e: emitted.append(e),
        on_error=lambda e: None,
    )
    assert emitted == list(range(10))
    assert chunks[0] == [0, 1]          # initial size 2
    assert len(chunks[1]) >= 2          # grew after the first emit
    assert max(len(c) for c in chunks) > 2


def test_stream_batches_two_in_flight_ordered():
    """The default protocol keeps at most TWO dispatched chunks pending
    (emit(k) is deferred until k+1 has dispatched, hiding the result
    fetch), emits strictly in dispatch order, and drains every pending
    chunk before any serial key or at end-of-stream."""
    from imageprocess_tpu.parallel.runner import stream_batches

    events = []
    outstanding = {"now": 0, "max": 0}

    def dispatch(entries):
        outstanding["now"] += 1
        outstanding["max"] = max(outstanding["max"], outstanding["now"])
        events.append(("d", list(entries)))
        return list(entries)

    def emit(rec):
        outstanding["now"] -= 1
        events.append(("e", rec))

    items = [("batch", i) for i in range(8)] + [("serial", 99)] + \
            [("batch", i) for i in range(8, 12)]
    stream_batches(
        [v for _, v in items], 2,
        classify=lambda x: ("serial", x) if x == 99 else ("batch", x),
        dispatch=dispatch, emit=emit,
        serial=lambda e: events.append(("s", e)),
        on_error=lambda e: None,
    )
    assert outstanding["now"] == 0
    assert outstanding["max"] == 2      # two in flight, never three
    emitted = [rec for kind, rec in events if kind == "e"]
    assert emitted == [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9], [10, 11]]
    # the serial key ran only after every earlier chunk had emitted
    s_at = events.index(("s", 99))
    assert [k for k, _ in events[:s_at]].count("e") == 4


def test_batched_single_full_chunk(timelapse_folder, tmp_path):
    """batch_size == number of keys: exactly one in-flight batch whose
    finalize happens after the loader is drained (regression: the in-flight
    record must own its chunk list, not alias the reused buffer)."""
    cfg = IntensityConfig(channels=(1, 2), timelapse=True, do_xls=False)
    rows = run_intensity_batched(str(timelapse_folder), cfg,
                                 out_root=str(tmp_path), log=lambda *_: None,
                                 batch_size=8)
    assert len(rows) == 16
    serial = run_intensity(str(timelapse_folder), cfg,
                           out_root=str(tmp_path / "s"), log=lambda *_: None)
    sd = {_key(r): r for r in serial}
    for r in rows:
        ref = sd[_key(r)]
        assert r["area_px"] == ref["area_px"]
        assert abs(r["ch1_mean"] - ref["ch1_mean"]) <= 1e-5 * max(
            abs(ref["ch1_mean"]), 1e-9)


def test_batched_sharded_over_mesh(timelapse_folder, tmp_path):
    from imageprocess_tpu.parallel.runner import make_mesh

    mesh = make_mesh(8)
    cfg = IntensityConfig(channels=(1, 2), timelapse=True, do_xls=True)
    rows = run_intensity_batched(str(timelapse_folder), cfg,
                                 out_root=str(tmp_path), log=lambda *_: None,
                                 mesh=mesh, batch_size=8)
    assert len(rows) == 16
    serial = run_intensity(str(timelapse_folder), cfg,
                           out_root=str(tmp_path / "s"), log=lambda *_: None)
    sd = {_key(r): r for r in serial}
    for r in rows:
        assert abs(r["ch1_mean"] - sd[_key(r)]["ch1_mean"]) <= 1e-5 * max(
            abs(sd[_key(r)]["ch1_mean"]), 1e-9)
    assert (tmp_path / "xls" / "fluor_intensity_perROI.csv").exists()


def test_batched_mixed_shapes_fall_back_per_key(tmp_path):
    """A non-dominant-shape key drops to the serial path INLINE while the
    rest stream through the batch program — no whole-run restart, no lost
    rows (round-1 behavior restarted the entire run serially)."""
    folder = tmp_path / "mixed"
    rng = np.random.default_rng(1)
    polys = [np.array([[15, 15], [60, 18], [55, 70], [12, 66]], float)]
    shapes = {1: (160, 192), 2: (160, 192), 3: (192, 160), 4: (160, 192)}
    for s, (H, W) in shapes.items():
        tiffio.write_tiff16(str(folder / f"S{s:02d}_1.TIF"),
                            rng.integers(10, 3000, (H, W)).astype(np.uint16))
        roiio.save_roi_bundle(str(folder / "roi" / f"S{s:02d}.json"),
                              f"S{s:02d}", (H, W), polys)
    cfg = IntensityConfig(channels=(1,), do_xls=False)
    logs = []
    rows = run_intensity_batched(str(folder), cfg, out_root=str(tmp_path),
                                 log=logs.append, batch_size=2)
    assert len(rows) == 4
    # rows stay in key order even though S03 took the serial path
    assert [r["stage"] for r in rows] == ["S01", "S02", "S03", "S04"]
    serial = run_intensity(str(folder), cfg, out_root=str(tmp_path / "s"),
                           log=lambda *_: None)
    sd = {r["stage"]: r for r in serial}
    for r in rows:
        assert abs(r["ch1_mean"] - sd[r["stage"]]["ch1_mean"]) <= 1e-5 * max(
            abs(sd[r["stage"]]["ch1_mean"]), 1e-9)


def test_batched_histmode_tile_path(timelapse_folder, tmp_path):
    """bg_mode=hist-mode rides the minimum-transfer tile path: the host
    replays the reference's 2048-bin f32 binning from the strided u16
    histogram with bit-identical arithmetic (native.hist_mode_from_hist),
    so the batched rows must match the serial (device-op) rows with the
    BACKGROUND EXACTLY EQUAL, not merely close."""
    cfg = IntensityConfig(channels=(1, 2), timelapse=True, do_xls=False,
                          bg_mode="hist-mode")
    serial = run_intensity(str(timelapse_folder), cfg,
                           out_root=str(tmp_path / "s"), log=lambda *_: None)
    batched = run_intensity_batched(str(timelapse_folder), cfg,
                                    out_root=str(tmp_path / "b"),
                                    log=lambda *_: None, batch_size=3)
    assert len(serial) == len(batched) == 16
    sd = {_key(r): r for r in serial}
    for r in batched:
        ref = sd[_key(r)]
        assert r["area_px"] == ref["area_px"]
        for f in ("ch1_bg", "ch2_bg"):
            assert r[f] == ref[f], (f, r[f], ref[f])
        for f in ("ch1_mean", "ch2_median"):
            assert abs(r[f] - ref[f]) <= 1e-5 * max(abs(ref[f]), 1e-9), f


def test_hist_mode_host_matches_device_on_golden(golden_intensity_dir):
    """The host hist-mode replicas (from the decoder's u16 histogram AND
    from raw strided values) must be bit-identical to the device op
    (ops.background.histogram_mode_value) on real golden frames."""
    import jax.numpy as jnp

    from imageprocess_tpu.core import tiffio
    from imageprocess_tpu.native import (
        hist_mode_from_hist, hist_mode_from_values,
    )
    from imageprocess_tpu.ops.background import bg_value

    img = np.asarray(tiffio.read_2d(
        os.path.join(golden_intensity_dir, "e1_P0", "S01_2.TIF"), dtype=None))
    assert img.dtype == np.uint16
    for stride, p1000 in ((4, 1000), (1, 1000), (4, 50000), (3, 99000)):
        vals = img.ravel()[::stride]
        hist = np.bincount(vals, minlength=65536)
        host_h = hist_mode_from_hist(hist, p1000)
        host_v = hist_mode_from_values(vals, p1000)
        dev = float(bg_value(jnp.asarray(img), p1000, None, "hist-mode",
                             stride))
        assert host_h == dev, (stride, p1000, host_h, dev)
        assert host_v == dev, (stride, p1000, host_v, dev)


def test_batched_uses_prefetch_uploaded_tiles(timelapse_folder, tmp_path,
                                              monkeypatch):
    """The minimum-transfer fast path: every key's ROI tiles come out of
    ONE fused native call in its prefetch thread (decode + hist + tile
    extraction, native.decode_tiff_batch_hist_tiles) and are device_put
    there; dispatch must stack the device-resident tiles — the Python-side
    gather_tiles must never run.  Guards the pipelining that hides upload
    wire time behind the decode phase AND the fused-gather path itself."""
    from imageprocess_tpu import native
    from imageprocess_tpu.ops import roistats

    py_gathers = []
    fused = []
    real_gather = roistats.gather_tiles
    real_fused = native.decode_tiff_batch_hist_tiles

    def counting_gather(*a, **k):
        py_gathers.append(a[2])
        return real_gather(*a, **k)

    def counting_fused(paths, hist_stride, offsets, tile, **k):
        fused.append(len(offsets) + k.get("pad_tiles", 0))
        return real_fused(paths, hist_stride, offsets, tile, **k)

    monkeypatch.setattr(roistats, "gather_tiles", counting_gather)
    monkeypatch.setattr(native, "decode_tiff_batch_hist_tiles",
                        counting_fused)
    cfg = IntensityConfig(channels=(1, 2), timelapse=True, do_xls=False)
    rows = run_intensity_batched(str(timelapse_folder), cfg,
                                 out_root=str(tmp_path / "b"),
                                 log=lambda *_: None, batch_size=3)
    assert len(rows) == 16
    # one fused native call per key (8 keys), zero Python-side gathers
    assert len(fused) == 8, fused
    assert py_gathers == [], py_gathers


def test_batched_varying_roi_counts_one_shape(tmp_path, monkeypatch):
    """Stages with different ROI counts must still batch (padded to the
    session nb hint -> ONE compiled shape, no per-chunk recompiles) and
    match the serial runner."""
    from imageprocess_tpu.ops import roistats

    folder = tmp_path / "vary"
    rng = np.random.default_rng(1)
    H, W = 160, 192
    p1 = np.array([[15, 15], [60, 18], [55, 70], [12, 66]], float)
    p2 = np.array([[70, 40], [115, 45], [110, 85], [65, 80]], float)
    counts = [2, 1, 2, 1, 1, 2]
    for s, n in enumerate(counts, 1):
        tiffio.write_tiff16(str(folder / f"S{s:02d}_1.TIF"),
                            rng.integers(10, 3000, (H, W)).astype(np.uint16))
        roiio.save_roi_bundle(str(folder / "roi" / f"S{s:02d}.json"),
                              f"S{s:02d}", (H, W), [p1, p2][:n])

    from imageprocess_tpu import native

    gathered_nb = []
    real = roistats.gather_tiles
    real_fused = native.decode_tiff_batch_hist_tiles

    def counting(*a, **k):
        gathered_nb.append(a[2])
        return real(*a, **k)

    def counting_fused(paths, hist_stride, offsets, tile, **k):
        gathered_nb.append(len(offsets) + k.get("pad_tiles", 0))
        return real_fused(paths, hist_stride, offsets, tile, **k)

    monkeypatch.setattr(roistats, "gather_tiles", counting)
    monkeypatch.setattr(native, "decode_tiff_batch_hist_tiles",
                        counting_fused)
    cfg = IntensityConfig(channels=(1,), do_xls=False)
    serial = run_intensity(str(folder), cfg, out_root=str(tmp_path / "s"),
                           log=lambda *_: None)
    logs = []
    batched = run_intensity_batched(str(folder), cfg,
                                    out_root=str(tmp_path / "b"),
                                    log=logs.append, batch_size=3)
    assert any(str(line).startswith(("[batch]", "[배치]")) for line in logs)
    assert len(batched) == len(serial) == sum(counts)
    # every prefetch gather padded to the SAME session hint (one jit shape)
    assert len(set(gathered_nb)) == 1 and len(gathered_nb) == len(counts)
    sd = {(r["stage"], r["roi"]): r for r in serial}
    for r in batched:
        ref = sd[(r["stage"], r["roi"])]
        for k, v in ref.items():
            if isinstance(v, float) and not np.isnan(v):
                assert abs(r[k] - v) <= 1e-5 * max(abs(v), 1e-9), (k, r[k], v)


def test_batched_smaller_frame_than_hint_tile(tmp_path):
    """A key whose FRAME is smaller than the session tile hint must fall
    to the serial path and still produce rows (regression: the prefetch
    pre-gather used the hint tile unclamped and raised in the loader,
    silently dropping the key)."""
    folder = tmp_path / "mix"
    rng = np.random.default_rng(3)
    big_poly = np.array([[20, 20], [150, 25], [145, 150], [18, 140]], float)
    small_poly = np.array([[10, 10], [40, 12], [38, 40], [8, 36]], float)
    tiffio.write_tiff16(str(folder / "S01_1.TIF"),
                        rng.integers(10, 3000, (200, 200)).astype(np.uint16))
    roiio.save_roi_bundle(str(folder / "roi" / "S01.json"), "S01",
                          (200, 200), [big_poly])
    tiffio.write_tiff16(str(folder / "S02_1.TIF"),
                        rng.integers(10, 3000, (64, 64)).astype(np.uint16))
    roiio.save_roi_bundle(str(folder / "roi" / "S02.json"), "S02",
                          (64, 64), [small_poly])
    cfg = IntensityConfig(channels=(1,), do_xls=False)
    errors = []
    rows = run_intensity_batched(str(folder), cfg, out_root=str(tmp_path),
                                 log=errors.append, batch_size=2)
    assert [r["stage"] for r in rows] == ["S01", "S02"], (rows, errors)
    serial = run_intensity(str(folder), cfg, out_root=str(tmp_path / "s"),
                           log=lambda *_: None)
    sd = {r["stage"]: r for r in serial}
    for r in rows:
        assert abs(r["ch1_mean"] - sd[r["stage"]]["ch1_mean"]) <= 1e-5 * max(
            abs(sd[r["stage"]]["ch1_mean"]), 1e-9)


def test_prefetch_loader_abandons_queued_work_on_early_exit():
    """Breaking out of iteration (stream_batches' cancel path) must not
    block on — or execute — the up-to-`ahead` decodes still queued in the
    pool: cancel has to return promptly on a 1-core host."""
    import threading
    import time as _t

    from imageprocess_tpu.parallel.runner import PrefetchLoader

    started = []
    lock = threading.Lock()

    def load(i):
        with lock:
            started.append(i)
        _t.sleep(0.05)
        return i

    loader = PrefetchLoader(load, list(range(32)), workers=2, ahead=16)
    for item in loader:
        assert item == 0
        break  # abandon with ~16 decodes queued
    _t.sleep(0.3)  # give any (wrongly) surviving queue time to drain
    assert len(started) < 16  # queued-but-unstarted futures were cancelled
    """A dispatch failure, or an emit failure raised as EmitFetchError
    (the result fetch died before any side effect), degrades the chunk to
    the serial path; a serial failure is logged through on_error and
    skipped (the reference's per-future worker error handling)."""
    from imageprocess_tpu.parallel.runner import (EmitFetchError,
                                                  stream_batches)

    # dispatch raises on the second chunk; emit raises for chunk 3's rec
    emitted, serialed, errors = [], [], []
    calls = {"dispatch": 0}

    def dispatch(chunk):
        calls["dispatch"] += 1
        if calls["dispatch"] == 2:
            raise RuntimeError("device fell over")
        return ("rec", list(chunk))

    def emit(rec):
        _, chunk = rec
        if 8 in chunk:
            raise EmitFetchError("fetch failed")
        emitted.extend(chunk)

    def serial(entry):
        if entry == 9:
            raise RuntimeError("serial also failed")
        serialed.append(entry)

    stream_batches(
        list(range(12)), 2, lambda x: ("batch", x), dispatch, emit, serial,
        lambda err: errors.append((err.item, str(err.error))),
    )
    # every key accounted for exactly once: emitted, serialed, or errored
    seen = sorted(emitted + serialed + [e[0] for e in errors])
    assert seen == list(range(12))
    assert serialed and emitted                   # both paths exercised
    assert 2 in serialed and 3 in serialed        # chunk 2 fell back
    assert 8 in serialed                          # fetch-failure recovery
    assert [e[0] for e in errors] == [9]


def test_stream_batches_partial_emit_not_rerun():
    """An emit failure AFTER side effects began (any exception other than
    EmitFetchError) must NOT re-run the chunk serially — that would
    duplicate already-appended report rows and double-put recycled decode
    buffers into the FrameBufferPool; the chunk's keys are logged through
    on_error instead."""
    from imageprocess_tpu.parallel.runner import stream_batches

    emitted, serialed, errors = [], [], []

    def emit(rec):
        _, chunk = rec
        emitted.extend(chunk)      # rows appended BEFORE the failure
        if 2 in chunk:
            raise RuntimeError("run-log write failed mid-emit")

    stream_batches(
        list(range(6)), 2, lambda x: ("batch", x),
        lambda chunk: ("rec", list(chunk)), emit,
        serialed.append,
        lambda err: errors.append(err.item),
    )
    assert emitted == [0, 1, 2, 3, 4, 5]   # each key emitted exactly once
    assert serialed == []                  # no duplicating serial re-run
    assert errors == [2, 3]                # the failed chunk's keys logged


def test_batched_cancel_partial_rows(timelapse_folder, tmp_path):
    """Cancel between chunks stops the run but keeps the rows collected so
    far and still writes the workbook (Fluor_INT.py:2219-2233 semantics)."""
    state = {"n": 0}

    def cancel():
        state["n"] += 1
        return state["n"] > 6  # let the first chunks through

    cfg = IntensityConfig(channels=(1, 2), timelapse=True, do_xls=True)
    logs = []
    rows = run_intensity_batched(str(timelapse_folder), cfg,
                                 out_root=str(tmp_path), log=logs.append,
                                 batch_size=2, cancel=cancel)
    assert 0 < len(rows) < 16
    assert any("취소" in str(line) or "CANCEL" in str(line).upper()
               for line in logs)
    assert (tmp_path / "xls" / "fluor_intensity_perROI.csv").exists()


def test_stream_batches_cancel_drops_undispatched():
    """On cancel, the in-flight chunk drains but buffered entries are NOT
    dispatched as a fresh (new-shape) chunk; returns True."""
    from imageprocess_tpu.parallel.runner import stream_batches

    dispatched, emitted = [], []
    state = {"seen": 0}

    def cancel():
        return state["seen"] >= 5  # fires with entries 4 (and 5) buffered

    def classify(x):
        state["seen"] += 1
        return ("batch", x)

    cancelled = stream_batches(
        iter(range(10)), 3, classify,
        lambda c: (dispatched.append(list(c)), list(c))[1],
        lambda rec: emitted.extend(rec),
        lambda e: emitted.append(e),
        lambda err: None,
        cancel=cancel,
    )
    assert cancelled is True
    assert dispatched == [[0, 1, 2]]   # the buffered [3, 4] never dispatch
    assert emitted == [0, 1, 2]        # in-flight chunk drained


def test_batched_image_outputs_fall_back_to_serial(timelapse_folder, tmp_path):
    """--batched with --png must still produce the PNGs: the tables-only
    minimum-transfer path can't render, so the runner falls back to the
    serial path (the same gate run_fret_batched/run_nesprin2_batched
    have) instead of silently dropping requested outputs."""
    import glob

    cfg = IntensityConfig(channels=(1, 2), timelapse=True, do_xls=False,
                          do_png=True)
    logs = []
    rows = run_intensity_batched(str(timelapse_folder), cfg,
                                 out_root=str(tmp_path / "b"),
                                 log=logs.append, batch_size=3)
    assert len(rows) == 16
    assert not any(str(line).startswith(("[batch]", "[배치]"))
                   for line in logs)
    pngs = glob.glob(str(tmp_path / "b" / "**" / "*.png"), recursive=True)
    assert pngs, "requested PNG outputs were not written"


@pytest.mark.parametrize("compression", ["tiff_adobe_deflate", "packbits"])
def test_batched_on_deflate_and_packbits_datasets(tmp_path, compression):
    """Datasets compressed with Deflate or PackBits ride the SAME native
    batch + fused-histogram streaming path as LZW (decode_page dispatches
    per strip): batched rows must match the serial runner, and the chN_bg
    percentile (computed from the decoder-fused histogram) must be exact."""
    from PIL import Image

    folder = tmp_path / "exp"
    os.makedirs(folder / "roi")
    rng = np.random.default_rng(3)
    H, W = 160, 192
    polys = [np.array([[15, 15], [60, 18], [55, 70], [12, 66]], float),
             np.array([[70, 40], [115, 45], [110, 85], [65, 80]], float)]
    for s in range(1, 6):
        for ch in (1, 2):
            arr = rng.integers(10, 3000, (H, W)).astype(np.uint16)
            Image.fromarray(arr).save(
                str(folder / f"S{s:02d}_{ch}.TIF"), format="TIFF",
                compression=compression)
        roiio.save_roi_bundle(str(folder / "roi" / f"S{s:02d}.json"),
                              f"S{s:02d}", (H, W), polys)
    cfg = IntensityConfig(channels=(1, 2), do_xls=False)
    serial = run_intensity(str(folder), cfg, out_root=str(tmp_path / "s"),
                           log=lambda *_: None)
    logs = []
    batched = run_intensity_batched(str(folder), cfg,
                                    out_root=str(tmp_path / "b"),
                                    log=logs.append, batch_size=3)
    assert any(str(line).startswith(("[batch]", "[배치]")) for line in logs)
    assert len(serial) == len(batched) == 10
    sd = {_key(r): r for r in serial}
    for r in batched:
        ref = sd[_key(r)]
        for k, v in ref.items():
            if isinstance(v, float) and not np.isnan(v):
                assert abs(r[k] - v) <= 1e-5 * max(abs(v), 1e-9), (k, r[k], v)
        # fused-hist backgrounds are exact vs the serial path's
        for ch in (1, 2):
            assert r[f"ch{ch}_bg"] == ref[f"ch{ch}_bg"]


def test_batched_on_tiled_dataset(tmp_path):
    """A TILED-LZW dataset (OME-TIFF-style layout) rides the same native
    batch + fused-histogram streaming path: batched == serial, exact bg."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_native_decode import _lzw_encode, _tile_grid, _write_raw_tiled_tiff

    rng = np.random.default_rng(5)
    folder = tmp_path / "exp"
    os.makedirs(folder / "roi")
    H, W, tw, th = 160, 192, 64, 48
    polys = [np.array([[15, 15], [60, 18], [55, 70], [12, 66]], float),
             np.array([[70, 40], [115, 45], [110, 85], [65, 80]], float)]
    for s in range(1, 5):
        for ch in (1, 2):
            arr = rng.integers(10, 3000, (H, W)).astype(np.uint16)
            blobs = [_lzw_encode(t.tobytes()) for t in _tile_grid(arr, tw, th)]
            _write_raw_tiled_tiff(str(folder / f"S{s:02d}_{ch}.TIF"),
                                  blobs, H, W, tw, th, 16, compression=5)
        roiio.save_roi_bundle(str(folder / "roi" / f"S{s:02d}.json"),
                              f"S{s:02d}", (H, W), polys)
    cfg = IntensityConfig(channels=(1, 2), do_xls=False)
    serial = run_intensity(str(folder), cfg, out_root=str(tmp_path / "s"),
                           log=lambda *_: None)
    batched = run_intensity_batched(str(folder), cfg,
                                    out_root=str(tmp_path / "b"),
                                    log=lambda *_: None, batch_size=3)
    assert len(serial) == len(batched) == 8
    sd = {_key(r): r for r in serial}
    for r in batched:
        ref = sd[_key(r)]
        for ch in (1, 2):
            assert r[f"ch{ch}_bg"] == ref[f"ch{ch}_bg"]
            assert abs(r[f"ch{ch}_mean"] - ref[f"ch{ch}_mean"]) <= \
                1e-5 * max(abs(ref[f"ch{ch}_mean"]), 1e-9)


def test_batched_with_native_batch_decode_disabled(timelapse_folder,
                                                   tmp_path, monkeypatch):
    """When the native batch+hist entry is unavailable (no compiler, stale
    .so), load_key falls back to per-file PIL decode with hists=None and
    _host_bg recomputes backgrounds — rows must still match the native
    path bit-for-bit at the tolerance of the device program."""
    from imageprocess_tpu import native as native_mod

    cfg = IntensityConfig(channels=(1, 2), timelapse=True, do_xls=False)
    ref = run_intensity_batched(str(timelapse_folder), cfg,
                                out_root=str(tmp_path / "n"),
                                log=lambda *_: None, batch_size=3)
    monkeypatch.setattr(native_mod, "decode_tiff_batch_hist",
                        lambda *a, **k: None)
    got = run_intensity_batched(str(timelapse_folder), cfg,
                                out_root=str(tmp_path / "p"),
                                log=lambda *_: None, batch_size=3)
    assert len(got) == len(ref) == 16
    rd = {_key(r): r for r in ref}
    for r in got:
        want = rd[_key(r)]
        for k, v in want.items():
            if isinstance(v, float) and not np.isnan(v):
                assert abs(r[k] - v) <= 1e-6 * max(abs(v), 1e-9), (k, r[k], v)
            elif not isinstance(v, float):
                assert r[k] == v, k
