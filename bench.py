#!/usr/bin/env python
"""Headline benchmark: end-to-end intensity-pipeline throughput on 16-bit
LZW TIFF stacks (decode -> rasterize -> BG -> per-ROI stats -> CSV).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

Baseline: the reference's only measured number — 0.8 Mpix/s end-to-end for
the same workload shape on the author's CPU (BASELINE.md: 8 s for 1 stage,
18 ROIs, 2 channels of 2048x1536 u16 LZW, XLS on).

Architecture (hardened after a transient TPU-tunnel outage zeroed a round's
only driver-verified number, and a separate wedge made backend init HANG):

  supervisor (this process, never imports jax, cannot hang)
      └── child subprocess (IP_BENCH_CHILD=1): runs the real bench with a
          watchdog thread — a hung backend init or a mid-run wedge still
          emits the one JSON line (with partial sub-metrics + phase) and
          exits, instead of blocking forever.

The supervisor retries retryable init failures with backoff (total budget
IP_BENCH_INIT_BUDGET_S, default 480 s), then falls back to the CPU backend
(clearly labelled "backend": "cpu_fallback" with the axon error attached) so
a tunnel outage yields an honest degraded number instead of 0.0.  Every
failure JSON carries "error" AND "phase" so a zero is attributable.
"""

import json
import os
import shutil
import subprocess
import sys
import threading
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

BASELINE_MPIX_S = 0.8  # Mpix/s, BASELINE.md reference log

# Mutable bench state shared with the watchdog thread: the current phase
# (for attributable failure JSON) and every sub-metric completed so far
# (so a mid-run wedge still reports the work that finished).
PHASE = {"name": "start"}
RESULTS = {}

# retryable-init exit code contract between child and supervisor
RC_INIT_FAILED = 3


def _json_line(value: float, **extra) -> str:
    d = {
        "metric": "intensity_e2e_throughput",
        "value": round(value, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(value / BASELINE_MPIX_S, 2),
        "rois_per_s": round(RESULTS.get("rois_per_s", 0.0), 1),
        # chip efficiency with decode excluded (the 1-core host decode wall
        # caps e2e; this is the device's own Mpix/s at bench shapes)
        "device_mpix_s": round(RESULTS.get("device_mpix_s", 0.0), 1),
        # host decode ceiling (native batch LZW decode, same dataset)
        "decode_mpix_s": round(RESULTS.get("decode_mpix_s", 0.0), 1),
        # second workload: ratiometric FRET tables on the same stack
        "fret_e2e_mpix_s": round(RESULTS.get("fret_e2e_mpix_s", 0.0), 2),
        # shared-box context, sampled BEFORE the bench's own threads run:
        # external load on this 1-core host scales all host-bound numbers
        # down ~1/(1+load); readings with load >0.2 under-report the
        # quiet-box throughput (CLAUDE.md noise note)
        "host_load": RESULTS.get("host_load", 0.0),
    }
    if "seg_mpix_s" in RESULTS:
        # fused U-Net instance-segmentation program (reference counterpart:
        # CPU Cellpose at ~0.01-0.05 Mpix/s)
        d["seg_mpix_s"] = round(RESULTS["seg_mpix_s"], 3)
    d.update(extra)
    return json.dumps(d)


class Watchdog:
    """Deadline monitor on a daemon thread.  A wedged TPU tunnel blocks the
    main thread inside a C extension (socket wait releases the GIL), so a
    plain thread CAN still run, emit the contract JSON line, and hard-exit.
    """

    def __init__(self, emit, exit_fn=os._exit, tick_s: float = 1.0):
        self._emit = emit
        self._exit = exit_fn
        self._tick = tick_s
        self._deadline = None
        self._rc = 0
        self._done = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def arm(self, seconds: float, rc: int) -> None:
        self._rc = rc
        self._deadline = time.monotonic() + seconds

    def disarm(self) -> None:
        self._deadline = None

    def done(self) -> None:
        self._done.set()

    def _run(self) -> None:
        while not self._done.wait(self._tick):
            d = self._deadline
            if d is not None and time.monotonic() > d:
                try:
                    self._emit()
                except Exception:  # noqa: BLE001 — exit regardless
                    pass
                self._exit(self._rc)
                return  # only reached with an injected exit_fn (tests)


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


def _device_only_mpix_s(reps: int | None = None) -> float:
    """Chip-efficiency metric: time the batched tiled intensity program on a
    pre-decoded, device-resident batch (decode and host I/O excluded).
    Separates device throughput from the single-core host decode wall.

    The batch is tiled up to the streaming runner's autoscaler cap
    (IP_BENCH_DEVICE_B, default 32 frames/dispatch — the chunk size
    production reaches when the loader outruns the device), where the
    ~28 ms tunnel dispatch floor amortizes best (~950 Mpix/s at 16 vs
    ~1270 at 32, docs/DESIGN.md)."""
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

    if reps is None:
        reps = int(os.environ.get("IP_BENCH_DEVICE_REPS", "20"))
    paths = sorted(glob.glob(os.path.join(DATA_DIR, "S*.TIF")))
    frames = decode_tiff_batch(paths)
    if frames is None:
        from imageprocess_tpu.core import tiffio

        frames = np.stack([tiffio.read_2d(p, dtype=None) for p in paths])
    B = int(os.environ.get("IP_BENCH_DEVICE_B", "32"))
    C = len(CHANNELS)
    imgs_b = frames.reshape(N_STAGES, C, H, W)
    if B != N_STAGES:  # tile the decoded stages up to the cap batch
        imgs_b = np.tile(imgs_b, ((B + N_STAGES - 1) // N_STAGES, 1, 1, 1))[:B]
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


def _fret_e2e_mpix_s(reps: int | None = None, warm: bool = True) -> float:
    """Second workload metric: two-channel ratiometric FRET tables
    (decode -> host BG/eps -> ROI tiles -> ratio stats -> XLSX) on the same
    dataset, channels 2/3 as donor/acceptor.  ``warm=False`` counts every
    rep (for a later re-sample after the first call paid the compile)."""
    import shutil as _sh

    from imageprocess_tpu.pipelines.fret import FretConfig, run_fret_batched

    cfg = FretConfig(donor_ch=CHANNELS[0], acceptor_ch=CHANNELS[1])
    out_root = os.path.join(DATA_DIR, "RES_bench_fret")
    mpix = N_STAGES * 2 * H * W / 1e6
    best = 0.0
    n_rows = 0
    if reps is None:
        reps = int(os.environ.get("IP_BENCH_FRET_REPS", "4"))
    for rep in range(reps):
        _sh.rmtree(out_root, ignore_errors=True)
        t0 = time.perf_counter()
        rows = run_fret_batched(DATA_DIR, cfg, out_root=out_root,
                                log=lambda *_: None, batch_size=4)
        dt = time.perf_counter() - t0
        n_rows = len(rows)
        if rep or not warm:  # rep 0 is compile warm-up on the first call
            best = max(best, mpix / dt)
    if n_rows != N_STAGES * 18:
        # never crash the bench on dataset drift — the driver contract is
        # that bench.py ALWAYS prints its one JSON line
        print(f"[bench] unexpected fret row count {n_rows}", file=sys.stderr)
        return 0.0
    return best


def _seg_mpix_s() -> float:
    """U-Net instance segmentation throughput on one bench frame — the
    fused device program (tiling + forward + recomposition + flow
    labeling on chip, only frame up / labels back).  The reference's
    counterpart is Cellpose at 1-5 min per 3.1 Mpix frame on CPU
    (ROI_auto_drawer.py:198) = 0.01-0.05 Mpix/s."""
    from imageprocess_tpu.native import decode_tiff
    from imageprocess_tpu.segment.auto import AutoSegConfig, _unet_model
    from imageprocess_tpu.segment.cellseg import segment_frame_unet

    frame = decode_tiff(os.path.join(DATA_DIR, f"S01_{CHANNELS[0]}.TIF"))
    if frame is None:
        return 0.0
    frame = frame.astype(np.float32)
    cfg = AutoSegConfig(backend="unet")
    apply_fn, params, tile = _unet_model(cfg)
    best = 0.0
    # >=2: rep 0 is compile warm-up and never recorded, so a configured 1
    # would silently yield 0.0 (indistinguishable from a failed run)
    reps = max(2, int(os.environ.get("IP_BENCH_SEG_REPS", "4")))
    for rep in range(reps):
        t0 = time.perf_counter()
        segment_frame_unet(frame, apply_fn, params, tile=tile)
        dt = time.perf_counter() - t0
        if rep:  # rep 0 is compile warm-up
            best = max(best, frame.size / 1e6 / dt)
    return best


# ---------------------------------------------------------------------------
# child: the real bench, under a watchdog
# ---------------------------------------------------------------------------

def _child_main() -> int:
    backend = os.environ.get("IP_BENCH_BACKEND", "axon")
    # sample external load BEFORE our own threads contribute to it
    RESULTS["host_load"] = round(os.getloadavg()[0], 2)

    selftest = os.environ.get("IP_BENCH_SELFTEST", "")
    if selftest:  # fast plumbing paths for tests/test_bench_harness.py
        attempt = int(os.environ.get("IP_BENCH_ATTEMPT", "1"))
        if selftest == "ok" or (selftest == "fail_once" and attempt > 1):
            RESULTS["decode_mpix_s"] = 123.0
            print(_json_line(1.0, backend=backend), flush=True)
            return 0
        print(_json_line(0.0, error="selftest: simulated init failure",
                         phase="init", backend=backend), flush=True)
        return RC_INIT_FAILED

    wd = Watchdog(emit=lambda: print(
        _json_line(RESULTS.get("value", 0.0),
                   error=f"watchdog: hung in phase {PHASE['name']}",
                   phase=PHASE["name"], backend=backend),
        flush=True))

    # Backend init under a hard watchdog: the observed failure modes are a
    # fast UNAVAILABLE raise AND a multi-minute hang inside jax.devices().
    # The arm time is clamped below the supervisor's kill deadline so a
    # hung init still emits its attributable JSON before the kill lands.
    PHASE["name"] = "init"
    deadline = float(os.environ.get("IP_BENCH_CHILD_DEADLINE_S", "1470"))
    init_timeout = min(
        float(os.environ.get("IP_BENCH_INIT_TIMEOUT_S", "240")),
        max(10.0, deadline - (time.monotonic() - _T0) - 10.0))
    wd.arm(init_timeout, rc=RC_INIT_FAILED)
    try:
        import jax

        if backend == "cpu":
            # the JAX_PLATFORMS env var is ignored by the axon plugin
            # (CLAUDE.md); the config update is the only reliable switch
            jax.config.update("jax_platforms", "cpu")
        devs = jax.devices()
        if backend == "axon" and devs[0].platform not in ("axon", "tpu"):
            raise RuntimeError(
                f"wanted the axon backend, got {devs[0].platform!r}")
        import jax.numpy as jnp

        float(jnp.zeros(()) + 1.0)  # one tiny dispatch: init really works
    except Exception as e:  # noqa: BLE001 — attributable, retryable
        wd.done()
        print(_json_line(0.0, error=str(e)[:200], phase="init",
                         backend=backend), flush=True)
        return RC_INIT_FAILED

    # whole-run deadline: emit partial results before the supervisor's kill
    wd.arm(max(60.0, deadline - (time.monotonic() - _T0)), rc=4)

    PHASE["name"] = "dataset"
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
    PHASE["name"] = "warmup_compile"
    t0 = time.perf_counter()
    one_run()
    warm = time.perf_counter() - t0

    # time-budgeted best-of (first compile can eat minutes on a cold
    # cache; steady-state capability is what we're measuring).  ALWAYS
    # take >=3 steady reps, then keep sampling until the wall budget is
    # spent: shared-box noise arrives in multi-second bursts, so 8
    # back-to-back reps can ALL land inside one burst — spreading samples
    # over ~45 s gives best-of a real chance at a quiet window.
    PHASE["name"] = "e2e_reps"
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
        # record progressively: a watchdog trip mid-loop still reports the
        # best completed rep
        RESULTS["value"] = best
        RESULTS["rois_per_s"] = len(rows) * best / mpix
    err_note = None
    if len(rows) != N_STAGES * 18:
        # zero the headline AND say why in the JSON itself — an
        # unattributed 0.0 from a healthy backend would otherwise be
        # misreported by the supervisor as an axon outage
        err_note = f"intensity row count {len(rows)} != {N_STAGES * 18}"
        print(f"[bench] {err_note}", file=sys.stderr)
        best = 0.0
        RESULTS["value"] = 0.0
        RESULTS["rois_per_s"] = 0.0

    def _safe(fn, label):
        # a transient tunnel/backend outage in one sub-metric must not
        # cost the whole bench its one JSON line
        PHASE["name"] = label
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {label} failed: {e}", file=sys.stderr)
            return 0.0

    # decode is sampled at THREE separate points of the run (3 reps each,
    # best-of across all): one contiguous 7-rep window takes ~3 s, which
    # fits entirely inside a single shared-box noise burst — an r5 driver
    # run read 122.7 that way while the steady rate was ~250-300.
    def _sample_decode():
        RESULTS["decode_mpix_s"] = max(
            RESULTS.get("decode_mpix_s", 0.0),
            _safe(lambda: _decode_only_mpix_s(reps=3), "decode_mpix_s"))

    _sample_decode()
    RESULTS["device_mpix_s"] = _safe(_device_only_mpix_s, "device_mpix_s")
    _sample_decode()
    # fret too is sampled at two separated points (4 reps incl. warm-up,
    # then 2 counted reps after seg) for the same burst-robustness reason
    RESULTS["fret_e2e_mpix_s"] = _safe(
        lambda: _fret_e2e_mpix_s(), "fret_e2e_mpix_s")
    if os.environ.get("IP_BENCH_SEG", "1") == "1":
        RESULTS["seg_mpix_s"] = _safe(_seg_mpix_s, "seg_mpix_s")
    _sample_decode()
    RESULTS["fret_e2e_mpix_s"] = max(
        RESULTS.get("fret_e2e_mpix_s", 0.0),
        _safe(lambda: _fret_e2e_mpix_s(reps=2, warm=False),
              "fret_e2e_mpix_s2"))

    PHASE["name"] = "emit"
    wd.done()
    extra = ({"error": err_note, "phase": "e2e_rows"} if err_note else {})
    print(_json_line(best, backend=backend, **extra), flush=True)
    return 0


# ---------------------------------------------------------------------------
# supervisor: retry/backoff + CPU fallback, never imports jax, cannot hang
# ---------------------------------------------------------------------------

def _parse_last_json(text: str):
    for line in reversed((text or "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                continue
    return None


def _run_child(env_overrides: dict, timeout: float):
    """Run bench.py as a child process; return (rc, parsed_json_or_None).
    rc is RC_INIT_FAILED for retryable init failures, -1 for a timeout kill.
    """
    env = dict(os.environ)
    env.update(env_overrides)
    env["IP_BENCH_CHILD"] = "1"
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        out, err, rc = p.stdout, p.stderr, p.returncode
    except subprocess.TimeoutExpired as e:
        out = e.stdout.decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = e.stderr.decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        err += f"\n[bench] supervisor killed child after {timeout:.0f}s"
        rc = -1
    if err:
        sys.stderr.write(err if err.endswith("\n") else err + "\n")
    return rc, _parse_last_json(out)


def _quality(js) -> tuple:
    """Rank candidate JSON results: nonzero headline first, then most
    nonzero sub-metrics (a watchdog partial beats a bare init error)."""
    if not js:
        return (-1, -1)
    subs = sum(1 for k in ("device_mpix_s", "decode_mpix_s", "fret_e2e_mpix_s",
                           "rois_per_s") if js.get(k, 0) > 0)
    return (1 if js.get("value", 0) > 0 else 0, subs)


def _supervise(run_child=_run_child) -> int:
    t0 = time.monotonic()
    total_budget = float(os.environ.get("IP_BENCH_TOTAL_BUDGET_S", "2400"))
    init_retry_budget = float(os.environ.get("IP_BENCH_INIT_BUDGET_S", "480"))
    child_timeout = float(os.environ.get("IP_BENCH_CHILD_TIMEOUT_S", "1500"))
    attempts = 0
    delay = float(os.environ.get("IP_BENCH_RETRY_DELAY_S", "5"))
    best = None

    def remaining():
        return total_budget - (time.monotonic() - t0)

    # Phase A: the real backend, retrying retryable init failures with
    # backoff until the init budget is spent
    best_rc = None  # the rc of the attempt that produced `best`, not the last
    while remaining() > 60:
        attempts += 1
        to = min(child_timeout, remaining())
        rc, js = run_child({
            "IP_BENCH_BACKEND": "axon",
            "IP_BENCH_ATTEMPT": str(attempts),
            "IP_BENCH_CHILD_DEADLINE_S": str(max(60.0, to - 30.0)),
        }, timeout=to)
        if _quality(js) > _quality(best):
            best = js
            best_rc = rc
        if js and js.get("value", 0) > 0:
            js["attempts"] = attempts
            js.setdefault("backend", "axon")
            print(json.dumps(js), flush=True)
            return 0
        if rc == RC_INIT_FAILED and (time.monotonic() - t0) < init_retry_budget:
            time.sleep(min(delay, max(0.0, remaining())))
            delay = min(delay * 2, 60.0)
            continue
        break  # non-retryable failure, timeout kill, or init budget spent

    # Phase B: CPU-backend fallback — an honest degraded e2e number (decode
    # is host-side anyway) clearly labelled, instead of a 0.0 scoreboard
    # Attribute honestly: only a backend-class failure (init failure,
    # timeout kill, crash with no JSON) is "axon unavailable"; a clean child
    # (rc=0) that zeroed its own headline (e.g. a row-count check) is a
    # product failure and must not be relabelled as a tunnel outage.
    if best is None:
        axon_err = "axon unavailable: no JSON from axon child"
    else:  # e.g. rc=0 with value 0.0: the child must have said why
        detail = best.get("error",
                          "axon child returned zero without an error field")
        backend_class = best_rc != 0 or best.get("phase") == "init"
        axon_err = (f"axon unavailable: {detail}" if backend_class
                    else f"axon run failed: {detail}")
    if remaining() > 120 and os.environ.get("IP_BENCH_CPU_FALLBACK", "1") == "1":
        attempts += 1
        to = remaining() - 10
        rc, js = run_child({
            "IP_BENCH_BACKEND": "cpu",
            "IP_BENCH_ATTEMPT": str(attempts),
            "IP_BENCH_CHILD_DEADLINE_S": str(max(60.0, to - 30.0)),
            # the fallback may be the round's only number: give its best-of
            # a window long enough to dodge the multi-second noise bursts
            # (CLAUDE.md), still tiny next to the total budget
            "IP_BENCH_BUDGET_S": "30",
            "IP_BENCH_DEVICE_REPS": "3",
            "IP_BENCH_FRET_REPS": "3",
            # full-frame U-Net inference on the 1-core CPU fallback takes
            # minutes and the number is meaningless off-chip — skip it so
            # the fallback's e2e/decode metrics land inside the budget
            "IP_BENCH_SEG": "0",
        }, timeout=to)
        if js and js.get("value", 0) > 0:
            js["attempts"] = attempts
            js["backend"] = "cpu_fallback"
            js["error"] = axon_err[:220]
            js["phase"] = "cpu_fallback"
            print(json.dumps(js), flush=True)
            return 0
        if _quality(js) > _quality(best):
            best = js

    # Final: emit the best (zero-value) JSON we have, attributably
    if best is not None:
        best.setdefault("error", "bench failed with no error detail")
        best.setdefault("phase", "unknown")
        best["attempts"] = attempts
        print(json.dumps(best), flush=True)
    else:
        print(_json_line(0.0, error="no child produced JSON", phase="supervisor",
                         attempts=attempts), flush=True)
    return 0


_T0 = time.monotonic()

if __name__ == "__main__":
    if os.environ.get("IP_BENCH_CHILD") == "1":
        try:
            sys.exit(_child_main())
        except Exception as e:  # noqa: BLE001 — the contract is ONE JSON
            # line no matter what (e.g. a tunnel outage mid-run)
            print(f"[bench] fatal: {e}", file=sys.stderr)
            print(_json_line(RESULTS.get("value", 0.0), error=str(e)[:200],
                             phase=PHASE["name"],
                             backend=os.environ.get("IP_BENCH_BACKEND", "axon")),
                  flush=True)
            sys.exit(0)
    else:
        sys.exit(_supervise())
