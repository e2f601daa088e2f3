#!/usr/bin/env python
"""Headline benchmark: end-to-end intensity-pipeline throughput on 16-bit
LZW TIFF stacks (decode -> rasterize -> BG -> per-ROI stats -> CSV).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

Baseline: the reference's only measured number — 0.8 Mpix/s end-to-end for
the same workload shape on the author's CPU (BASELINE.md: 8 s for 1 stage,
18 ROIs, 2 channels of 2048x1536 u16 LZW, XLS on).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

H, W = 1536, 2048
# 16 stages / batch 4 = 4 chunks per run, so the streaming runner actually
# pipelines: decode of chunk k+1 overlaps device work of chunk k
N_STAGES = int(os.environ.get("IP_BENCH_STAGES", "16"))
CHANNELS = (2, 3)
DATA_DIR = os.environ.get("IP_BENCH_DATA", f"/tmp/ip_bench_data_{N_STAGES}")
GOLDEN_ROI = (
    "/root/reference/Testsamples/1Flu_Intensity(BCC P0 and P1)/ANA/e1_P0/roi/S01.json"
)


def _make_dataset():
    """Synthesize an N_STAGES x 2-channel u16 LZW TIFF experiment with the
    golden 18-ROI polygon set per stage (or synthetic blobs if absent)."""
    from PIL import Image

    from imageprocess_tpu.core import roiio

    os.makedirs(os.path.join(DATA_DIR, "roi"), exist_ok=True)
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:H, 0:W]
    for s in range(1, N_STAGES + 1):
        for ch in CHANNELS:
            blobs = np.zeros((H, W), np.float32)
            for _ in range(20):
                cy, cx = rng.integers(100, H - 100), rng.integers(100, W - 100)
                r = rng.integers(20, 60)
                blobs += 3000.0 * np.exp(
                    -((yy - cy) ** 2 + (xx - cx) ** 2) / (2.0 * r * r)
                )
            img = (blobs + rng.normal(120, 15, (H, W))).clip(0, 65535).astype(np.uint16)
            Image.fromarray(img).save(
                os.path.join(DATA_DIR, f"S{s:02d}_{ch}.TIF"),
                format="TIFF", compression="tiff_lzw",
            )
    if os.path.exists(GOLDEN_ROI):
        polys = roiio.load_roi_polygons(GOLDEN_ROI)
    else:
        th = np.linspace(0, 2 * np.pi, 24, endpoint=False)
        polys = [
            np.stack([
                150 + 200 * (i % 8) + 60 * np.cos(th),
                150 + 300 * (i // 8) + 60 * np.sin(th),
            ], -1)
            for i in range(18)
        ]
    for s in range(1, N_STAGES + 1):
        roiio.save_roi_bundle(
            os.path.join(DATA_DIR, "roi", f"S{s:02d}.json"),
            f"S{s:02d}", (H, W), polys,
        )


def _device_only_mpix_s(reps: int = 20) -> float:
    """Chip-efficiency metric: time the batched tiled intensity program on a
    pre-decoded, device-resident batch (decode and host I/O excluded).
    Separates device throughput from the single-core host decode wall."""
    import glob

    import jax
    import jax.numpy as jnp

    from imageprocess_tpu.core import roiio
    from imageprocess_tpu.native import decode_tiff_batch
    from imageprocess_tpu.ops.percentile import p1000_of
    from imageprocess_tpu.ops.roistats import (
        choose_tile, pad_local_polys, tile_offsets,
    )
    from imageprocess_tpu.parallel.runner import batched_intensity_step_tiled

    paths = sorted(glob.glob(os.path.join(DATA_DIR, "S*.TIF")))
    frames = decode_tiff_batch(paths)
    if frames is None:
        from imageprocess_tpu.core import tiffio

        frames = np.stack([tiffio.read_2d(p, dtype=None) for p in paths])
    B = N_STAGES
    C = len(CHANNELS)
    imgs_b = frames.reshape(B, C, H, W)
    polys = roiio.load_roi_polygons(os.path.join(DATA_DIR, "roi", "S01.json"))
    tile = choose_tile(polys, H, W)
    nb = ((len(polys) + 7) // 8) * 8
    vb = ((max(len(p) for p in polys) + 31) // 32) * 32
    offs = tile_offsets(polys, H, W, tile)
    lp, off_pad, valid = pad_local_polys(polys, offs, nb, vb)
    lp_b = np.broadcast_to(lp, (B,) + lp.shape)
    off_b = np.broadcast_to(off_pad, (B,) + off_pad.shape)
    val_b = np.broadcast_to(valid, (B,) + valid.shape)
    p_b = np.full((B, C), p1000_of(1.0), np.int32)

    args = [jax.device_put(jnp.asarray(a))
            for a in (imgs_b, lp_b, off_b, val_b, p_b)]

    def step():
        stats, areas, bgs = batched_intensity_step_tiled(*args, tile=tile)
        # force a small FETCH: on the tunneled chip block_until_ready does
        # NOT wait for remote completion (CLAUDE.md), so timing without a
        # fetch would measure dispatch only
        np.asarray(stats["mean"][0, 0, 0])

    step()  # compile
    mpix = B * C * H * W / 1e6
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        step()
        best = max(best, mpix / (time.perf_counter() - t0))
    return best


def _decode_only_mpix_s(reps: int = 7) -> float:
    """Host decode ceiling measured with the PRODUCTION call pattern: the
    per-key native batch entry with fused histograms and recycled output
    buffers, exactly what the streaming loader threads execute (a fresh
    np allocation per frame would hide the decoder's rate behind kernel
    page-zeroing)."""
    import glob

    from imageprocess_tpu.native import FrameBufferPool, decode_tiff_batch_hist

    paths = sorted(glob.glob(os.path.join(DATA_DIR, "S*.TIF")))
    keys = [paths[i:i + len(CHANNELS)]
            for i in range(0, len(paths), len(CHANNELS))]
    pool = FrameBufferPool()
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        tot = 0
        from imageprocess_tpu.pipelines.intensity import IntensityConfig

        stride = max(1, IntensityConfig().bg_stride)  # production hist stride
        for kp in keys:
            res = decode_tiff_batch_hist(kp, stride, pool=pool)
            if res is None:  # native unavailable: plain per-file fallback
                from imageprocess_tpu.core import tiffio

                for p in kp:
                    tot += tiffio.read_2d(p, dtype=None).size
                continue
            frames, _ = res
            tot += frames.size
            pool.put(frames)
        best = max(best, tot / 1e6 / (time.perf_counter() - t0))
    return best


def _fret_e2e_mpix_s() -> float:
    """Second workload metric: two-channel ratiometric FRET tables
    (decode -> host BG/eps -> ROI tiles -> ratio stats -> XLSX) on the same
    dataset, channels 2/3 as donor/acceptor."""
    import shutil as _sh

    from imageprocess_tpu.pipelines.fret import FretConfig, run_fret_batched

    cfg = FretConfig(donor_ch=CHANNELS[0], acceptor_ch=CHANNELS[1])
    out_root = os.path.join(DATA_DIR, "RES_bench_fret")
    mpix = N_STAGES * 2 * H * W / 1e6
    best = 0.0
    n_rows = 0
    for rep in range(6):
        _sh.rmtree(out_root, ignore_errors=True)
        t0 = time.perf_counter()
        rows = run_fret_batched(DATA_DIR, cfg, out_root=out_root,
                                log=lambda *_: None, batch_size=4)
        dt = time.perf_counter() - t0
        n_rows = len(rows)
        if rep:  # rep 0 is compile warm-up
            best = max(best, mpix / dt)
    if n_rows != N_STAGES * 18:
        # never crash the bench on dataset drift — the driver contract is
        # that bench.py ALWAYS prints its one JSON line
        print(f"[bench] unexpected fret row count {n_rows}", file=sys.stderr)
        return 0.0
    return best


def main():
    # sample external load BEFORE our own threads contribute to it
    load_at_start = os.getloadavg()[0]
    if not os.path.exists(os.path.join(DATA_DIR, f"S{N_STAGES:02d}_{CHANNELS[-1]}.TIF")):
        shutil.rmtree(DATA_DIR, ignore_errors=True)
        _make_dataset()

    from imageprocess_tpu.pipelines.intensity import (
        IntensityConfig, run_intensity_batched,
    )

    cfg = IntensityConfig(
        channels=CHANNELS,
        channel_colors={2: "Green", 3: "Red"},
        do_xls=True,
    )
    out_root = os.path.join(DATA_DIR, "RES_bench")
    devnull = lambda *_: None
    # 8 threads measured consistently faster than 4 on the 1-core box
    # (decode overlap with the main thread's pack/fetch work); scale up
    # with real cores
    workers = max(8, (os.cpu_count() or 1) * 2)
    batch = int(os.environ.get("IP_BENCH_BATCH", "4"))

    def one_run():
        return run_intensity_batched(
            DATA_DIR, cfg, out_root=out_root, log=devnull,
            batch_size=batch, prefetch_workers=workers,
        )

    # warm-up: compile + cache
    t0 = time.perf_counter()
    one_run()
    warm = time.perf_counter() - t0

    # time-budgeted best-of (first compile can eat minutes on a cold
    # cache; steady-state capability is what we're measuring).  ALWAYS
    # take >=3 steady reps, then keep sampling until the wall budget is
    # spent: shared-box noise arrives in multi-second bursts, so 8
    # back-to-back reps can ALL land inside one burst — spreading samples
    # over ~45 s gives best-of a real chance at a quiet window.
    best = 0.0
    mpix = N_STAGES * len(CHANNELS) * H * W / 1e6
    budget_s = float(os.environ.get(
        "IP_BENCH_BUDGET_S", "45" if warm < 10 else ("20" if warm < 30 else "0")))
    reps = 0
    t_loop = time.perf_counter()
    while reps < 3 or (time.perf_counter() - t_loop < budget_s and reps < 60):
        t0 = time.perf_counter()
        rows = one_run()
        dt = time.perf_counter() - t0
        best = max(best, mpix / dt)
        reps += 1
    if len(rows) != N_STAGES * 18:
        print(f"[bench] unexpected intensity row count {len(rows)}",
              file=sys.stderr)
        best = 0.0

    def _safe(fn, label):
        # a transient tunnel/backend outage in one sub-metric must not
        # cost the whole bench its one JSON line
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {label} failed: {e}", file=sys.stderr)
            return 0.0

    device_mpix = _safe(_device_only_mpix_s, "device_mpix_s")
    decode_mpix = _safe(_decode_only_mpix_s, "decode_mpix_s")
    fret_mpix = _safe(_fret_e2e_mpix_s, "fret_e2e_mpix_s")

    baseline = 0.8  # Mpix/s, BASELINE.md reference log
    rois_per_s = len(rows) * best / mpix  # same wall time, ROI-count units
    print(json.dumps({
        "metric": "intensity_e2e_throughput",
        "value": round(best, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(best / baseline, 2),
        "rois_per_s": round(rois_per_s, 1),
        # chip efficiency with decode excluded (the 1-core host decode wall
        # caps e2e; this is the device's own Mpix/s at bench shapes)
        "device_mpix_s": round(device_mpix, 1),
        # host decode ceiling (native batch LZW decode, same dataset)
        "decode_mpix_s": round(decode_mpix, 1),
        # second workload: ratiometric FRET tables on the same stack
        "fret_e2e_mpix_s": round(fret_mpix, 2),
        # shared-box context, sampled BEFORE the bench's own threads run:
        # external load on this 1-core host scales all host-bound numbers
        # down ~1/(1+load); readings with load >0.2 under-report the
        # quiet-box throughput (CLAUDE.md noise note)
        "host_load": round(load_at_start, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the driver contract is ONE
        # JSON line no matter what (e.g. a tunnel outage mid-run)
        print(f"[bench] fatal: {e}", file=sys.stderr)
        print(json.dumps({
            "metric": "intensity_e2e_throughput", "value": 0.0,
            "unit": "Mpix/s", "vs_baseline": 0.0, "rois_per_s": 0.0,
            "device_mpix_s": 0.0, "decode_mpix_s": 0.0,
            "fret_e2e_mpix_s": 0.0, "error": str(e)[:200],
        }))
