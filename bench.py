#!/usr/bin/env python
"""Benchmark: fused inference throughput (forward + anchor decode + NMS).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "img/s/chip", "vs_baseline": N}

The baseline for vs_baseline is the BASELINE.json target of 5,000
images/sec/chip fused inference at 352×352 (the reference itself has no
TPU number; its 3.29 ms Kirin-990 latency ≈ 304 img/s).

The compute path is the Pallas fused-inference pipeline
(fastdet/kernels/fused_infer.py: transposed lane-packed span kernels +
composed dw∘pw matmuls + the fused s2d stem + the VMEM-resident NMS
suppression kernel), measured ~48k img/s/chip at 352² b128 bf16 on
v5e after null-RTT correction (plain-XLA forward + dense postprocess:
~29k).  Latency is reported two ways: `p50_latency_ms_b1` is a single
batch-1 dispatch (includes host→device transport — under the axon relay
that is ~28 ms of tunnel overhead); `latency_ms_b1_chip` chains K
batch-1 inferences inside ONE device program and reports per-step time,
i.e. the on-chip latency a co-located server would see.
"""

import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _enable_compile_cache():
    """Point JAX at the repo-local persistent compile cache.

    The bench's programs (serving chain, 640 stem, train step, int8
    chain) cost 15-60 s of XLA compile each on a cold process; under a
    loaded dev tunnel the remote-compile helper has been observed to
    take >15 min (the r5 int8-child 900 s timeout).  A warm on-disk
    cache makes every section's compile near-instant and removes that
    failure mode.  Directory is gitignored (.jax_cache_tpu); disable
    with FASTDET_BENCH_CACHE=0."""
    if os.environ.get("FASTDET_BENCH_CACHE", "1") != "1":
        return
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _int8_child_main():
    """Child-process body for the int8 section (`bench.py --int8-child`).

    r3 post-mortem: the int8 chain is healthy on a clean TPU client
    (measured 5.6k img/s in isolation) but crashed the TPU worker when
    run after the full bench's accumulated device state.  Running it in
    a FRESH process, FIRST, isolates it both ways: it sees a clean
    device, and a fault in it cannot poison the parent's sections.
    Prints one JSON line {"int8_img_s": N} on success."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from fastdet.config import Config
    from fastdet.ops.postprocess import postprocess
    from fastdet.quant import forward_from, load_quantized

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = Config.from_file(os.path.join(repo, "data", "coco.data"))
    hw = (cfg.height, cfg.width)
    anchors = jnp.asarray(np.asarray(cfg.anchors, np.float32)
                          .reshape(cfg.num_scales, cfg.anchor_num, 2))
    int8_art = os.environ.get(
        "FASTDET_BENCH_INT8_ART",
        os.path.join(repo, "weights", "coco-int8.npz"))

    qw_, qsc = load_quantized(int8_art)
    fwd_q = forward_from(qw_, qsc)
    qw_ = jax.tree.map(jnp.asarray, qw_)

    # same null-RTT correction as the parent (see main())
    _null = jax.jit(lambda x: x + 1.0)
    _v = jnp.float32(0)
    float(_null(_v))
    _rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(_null(_v))
        _rtts.append(time.perf_counter() - t0)
    null_rtt = min(_rtts)

    @jax.jit
    def int8_chain(weights, images_k, anchors_arg):
        def body(_, im):
            outs = list(fwd_q(im, weights))
            return None, postprocess(outs, anchors_arg, hw,
                                     conf_thres=0.3, iou_thres=0.4,
                                     max_nms=128)
        return jax.lax.scan(body, None, images_k)[1]

    qb, qk = 128, 32
    q_imgs = jax.jit(lambda k: jax.random.randint(
        k, (qk, qb, cfg.height, cfg.width, 3), 0, 255, jnp.uint8)
    )(jax.random.PRNGKey(5))
    q_imgs.block_until_ready()
    jax.device_get(int8_chain(qw_, q_imgs, anchors)[1][-1, :1])  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(int8_chain(qw_, q_imgs, anchors)[1][-1, :1])
        ts.append(time.perf_counter() - t0 - null_rtt)
    print(json.dumps({"int8_img_s": round(qk * qb / max(min(ts), 1e-9),
                                          1)}))


def main():
    # int8 section FIRST, in a fresh subprocess, BEFORE this process
    # touches the device (see _int8_child_main).  Sequential, so the
    # two processes never contend for the chip.
    section_errors = {}
    int8_img_s = None
    _int8_art = os.environ.get(
        "FASTDET_BENCH_INT8_ART",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "weights", "coco-int8.npz"))
    if (os.environ.get("FASTDET_BENCH_INT8", "1") == "1"
            and os.path.exists(_int8_art)):
        # 2 attempts: the r5 timeout post-mortem found the child healthy
        # in isolation (24 s) but >900 s under a transiently-loaded dev
        # tunnel — a fresh attempt (with the compile cache now warm from
        # the first one) recovers that case.
        for _attempt in range(int(os.environ.get(
                "FASTDET_BENCH_INT8_ATTEMPTS", "2"))):
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--int8-child"],
                    capture_output=True, text=True,
                    timeout=float(os.environ.get(
                        "FASTDET_BENCH_INT8_TIMEOUT", "600")))
                for line in reversed(proc.stdout.strip().splitlines()):
                    try:
                        int8_img_s = json.loads(line)["int8_img_s"]
                        break
                    except (json.JSONDecodeError, KeyError):
                        continue
                if int8_img_s is None:
                    section_errors["int8"] = (
                        f"child rc={proc.returncode}: "
                        + (proc.stderr or "")[-140:])
            except Exception as e:  # noqa: BLE001 — secondary metric
                section_errors["int8"] = repr(e)[:160]
            if int8_img_s is not None:
                section_errors.pop("int8", None)
                break

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    # axon-tunnel calibration: block_until_ready acks do NOT reliably
    # imply device completion (observed even after a warm fetch), so
    # every timed loop ends in a real device fetch (timed_min below).
    # The first fetch of a process can itself block for minutes, so it
    # runs in a daemon thread with a timeout; on normal TPU hardware it
    # completes instantly.
    import threading
    fetched = threading.Event()

    def _warm_fetch():
        jax.device_get(jnp.zeros((8, 128)))
        fetched.set()

    t = threading.Thread(target=_warm_fetch, daemon=True)
    t.start()
    t.join(timeout=float(os.environ.get("FASTDET_BENCH_FETCH_TIMEOUT",
                                        "600")))
    sync_mode = fetched.is_set()

    # Even after the warm fetch, the relay has been observed to stay in
    # async-ack mode for a whole process (block_until_ready returns
    # before execution → absurd readings, e.g. 7e7 img/s).  Every timed
    # loop below therefore forces REAL completion by fetching a few
    # bytes of the final output, and subtracts the measured fixed fetch
    # overhead (~30 ms under the relay, ~µs on a local host).
    import jax.numpy as _jnp
    _probe = jax.device_put(_jnp.zeros((8, 128)))
    jax.device_get(_probe)
    _fts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(_probe)
        _fts.append(time.perf_counter() - t0)
    fetch_ms = float(np.median(_fts) * 1e3)

    # The relay charges a FIXED round-trip on every dispatch→fetch pair
    # (~26-32 ms here; ~µs on a local TPU host) — measured as the time
    # of a null program (x+1 on a scalar) to completion-fetch.  Chip
    # metrics subtract this: a 4096-step null lax.scan completes in the
    # same ~26 ms as a single null dispatch, so the RTT is pure
    # transport, not per-step work.  Validated by consistency: with the
    # subtraction, b128 chain-64 and chain-256 runs agree to <1%
    # (20.9 vs 20.8 µs/img); without it they disagree by 16%.
    _null = jax.jit(lambda x: x + 1.0)
    _v = _jnp.float32(0)
    float(_null(_v))
    _rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(_null(_v))
        _rtts.append(time.perf_counter() - t0)
    null_rtt_ms = float(min(_rtts) * 1e3)

    def timed_min(dispatch, fetch, reps):
        """min over reps of (dispatch→tiny-fetch) minus the fixed
        dispatch+fetch round-trip (null_rtt_ms)."""
        fetch(dispatch())                       # warm / compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(dispatch())
            ts.append(time.perf_counter() - t0 - null_rtt_ms * 1e-3)
        return max(min(ts), 1e-9)

    from fastdet.config import Config
    from fastdet.kernels.fused_infer import build_fused_forward
    from fastdet.models import Detector
    from fastdet.ops.postprocess import build_detect_fn, postprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = Config.from_file(os.path.join(repo, "data", "coco.data")) \
        if os.path.exists(os.path.join(repo, "data", "coco.data")) \
        else Config.from_file("/root/reference/data/coco.data")

    npz = os.path.join(repo, "weights", "coco2017-ref.npz")
    if os.path.exists(npz):
        from fastdet.io.torch_convert import load_npz_variables
        variables = jax.tree.map(jnp.asarray, load_npz_variables(npz))
    else:
        model0 = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num)
        variables = model0.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, cfg.height, cfg.width, 3)),
                                train=False)

    anchors = jnp.asarray(
        np.asarray(cfg.anchors, np.float32).reshape(cfg.num_scales,
                                                    cfg.anchor_num, 2))
    hw = (cfg.height, cfg.width)
    # throughput/latency paths consume the s2d(4) uint8 host layout
    # (fastdet/kernels/fused_infer.py::pack_images_s2d — same byte count
    # as NHWC, written by the host at preprocess/resize time), which lets
    # the stem run as one fused Pallas kernel (~2× the XLA stem)
    fwd, packed = build_fused_forward(variables, input_hw=hw,
                                      anchor_num=cfg.anchor_num,
                                      classes=cfg.classes,
                                      dtype=jnp.bfloat16,
                                      input_format="s2d_u8")
    npad = ((cfg.height // 4) * (cfg.width // 4) + 127) // 128 * 128

    # serving-tuned: across the 500-image derived val set + golden the
    # max pre-NMS candidate count at conf 0.3 is 37 (p99 34), so the
    # 128 window is output-identical to 256/2048 with 3.5× headroom and
    # measured 18.97 vs 21.33 µs/img (+12%) — docs/PERF.md §1
    def fused_detect(packed, images, anchors_arg):
        outs = list(fwd(images, packed))
        return postprocess(outs, anchors_arg, hw, conf_thres=0.3,
                           iou_thres=0.4, max_nms=128)

    # Throughput pipeline: a lax.scan chains CHAIN batches inside ONE
    # program, the way a saturated serving loop feeds the chip — this
    # measures the chip, not per-dispatch host/runtime overhead (which is
    # ~30 ms under the axon relay).  B=128 is the measured sweet spot
    # (v5e sweep at equal total images: b32 38.3, b64 28.6, b128 23.7,
    # b256 26.4, b512 30.2, b1024 41.1 µs/img — small enough for VMEM
    # locality, large enough to amortize per-program overhead).
    batch = int(os.environ.get("FASTDET_BENCH_BATCH", "128"))
    chain = int(os.environ.get("FASTDET_BENCH_CHAIN", "64"))
    iters = int(os.environ.get("FASTDET_BENCH_ITERS", "5"))

    @jax.jit
    def detect_chain(packed, images_k, anchors_arg):
        def body(_, imgs):
            return None, fused_detect(packed, imgs, anchors_arg)
        _, outs = jax.lax.scan(body, None, images_k)
        return outs

    # synthetic inputs are generated ON DEVICE (a dev-tunnel device_put
    # runs at ~5-30 MB/s; multi-GB uploads would dominate the bench)
    def dev_randu8(shape, seed=0):
        return jax.jit(lambda k: jax.random.randint(
            k, shape, 0, 255, jnp.uint8))(jax.random.PRNGKey(seed))

    rng = np.random.RandomState(0)
    imgs_k = dev_randu8((chain, batch, 48, npad))
    imgs_k.block_until_ready()

    # batch-1 latency, single dispatch INCLUDING result fetch (the
    # round-trip a remote client sees; dominated by the ~28 ms axon
    # relay here, ~sub-ms on a local host)
    img1 = jax.device_put(jnp.asarray(
        rng.randint(0, 255, (1, 48, npad), np.uint8)))
    detect1 = jax.jit(fused_detect)
    jax.device_get(detect1(packed, img1, anchors)[1])
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        jax.device_get(detect1(packed, img1, anchors)[1])
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1e3)

    # batch-1 latency, on-chip: K sequential batch-1 detects inside one
    # program; the carried sum forces each step to finish before the next
    # deep enough that the per-step signal (~512 × 0.15 ms ≈ 77 ms)
    # dwarfs the ±2 ms jitter of the subtracted relay round-trip
    k1 = 512
    imgs_1k = dev_randu8((k1, 1, 48, npad), seed=1)

    @jax.jit
    def chain_b1(packed, images_k, anchors_arg):
        def body(c, imgs):
            dets, counts = fused_detect(packed, imgs, anchors_arg)
            return c + dets.sum() + counts.sum().astype(jnp.float32), None
        s, _ = jax.lax.scan(body, jnp.float32(0), images_k)
        return s

    b1_chip_ms = timed_min(
        lambda: chain_b1(packed, imgs_1k, anchors),
        lambda s: float(s), 5) / k1 * 1e3

    # throughput: every rep ends in a tiny device fetch of the last
    # chain step's output (timed_min), which forces real execution —
    # block_until_ready acks alone are NOT trustworthy under the relay
    dt = timed_min(lambda: detect_chain(packed, imgs_k, anchors),
                   lambda out: jax.device_get(out[1][-1, :1]), iters)
    img_per_s = chain * batch / dt
    del imgs_k, imgs_1k                 # free HBM for the sections below

    # stretch config: 640×640 device-resident throughput (BASELINE.json).
    # Named _chip, not _streaming: a lax.scan chains pre-uploaded device
    # batches — it measures the chip, with no host preprocessing overlap
    # (the true host→device streaming rate is `e2e_img_s` below).
    # Secondary sections never sink the artifact: a transient failure
    # (the dev relay's TPU worker has been observed to crash mid-run,
    # which poisons every subsequent device call in this process) nulls
    # that field, records the error, and the headline JSON still prints.
    def run_section(name, fn, enabled=True):
        if not enabled:
            return None
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — secondary metric
            section_errors[name] = repr(e)[:160]
            return None

    def sec_640():
        # 640² runs the row-chunked fused stem (s2d input layout)
        fwd6, packed6 = build_fused_forward(variables, input_hw=(640, 640),
                                            anchor_num=cfg.anchor_num,
                                            classes=cfg.classes,
                                            dtype=jnp.bfloat16,
                                            input_format="s2d_u8")

        @jax.jit
        def chain640(packed, images_k, anchors_arg):
            def body(_, imgs):
                outs = list(fwd6(imgs, packed))
                return None, postprocess(outs, anchors_arg, (640, 640),
                                         conf_thres=0.3, iou_thres=0.4,
                                         max_nms=128)
            _, outs = jax.lax.scan(body, None, images_k)
            return outs

        # b128/k16 measured 95.7 µs/img vs 185 at the old b64/k8 — the
        # same b128 batch optimum as 352², plus a longer chain amortizing
        # the per-dispatch overhead over 4× the images
        b6, k6 = 128, 16
        imgs6 = dev_randu8((k6, b6, 48, 160 * 160), seed=2)
        imgs6.block_until_ready()
        dt6 = timed_min(lambda: chain640(packed6, imgs6, anchors),
                        lambda out: jax.device_get(out[1][-1, :1]), 3)
        return round(k6 * b6 / dt6, 1)

    img_s_640 = run_section(
        "640", sec_640,
        enabled=os.environ.get("FASTDET_BENCH_640", "1") == "1")

    # second model family: anchor-free (FastestDet-style) detect
    # throughput, device-resident chained batches.  Default path is the
    # Pallas fused backbone (head="anchorfree", s2d input) shared with
    # the flagship; FASTDET_BENCH_AF_PATH=xla measures the plain-XLA
    # path instead (b128 measured 29.6 vs b256 34.6 µs/img there — the
    # same batch optimum as the fused path).
    af_path = os.environ.get("FASTDET_BENCH_AF_PATH", "fused")

    def sec_anchorfree():
        nonlocal af_path
        from fastdet.models.anchorfree import (
            AnchorFreeDetector, build_anchorfree_detect_fn,
            build_anchorfree_fused_detect)
        af = AnchorFreeDetector(classes=cfg.classes, dtype=jnp.bfloat16)
        af_vars = af.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, cfg.height, cfg.width, 3)),
                          train=False)
        ab, ak = 128, 64

        def measure_af_fused():
            af_detect_f, af_packed = build_anchorfree_fused_detect(
                af_vars, hw, conf_thres=0.3, iou_thres=0.4)

            @jax.jit
            def af_chain_f(packed, images_k):
                def body(_, im):
                    return None, af_detect_f(packed, im)
                return jax.lax.scan(body, None, images_k)[1]

            imgs = dev_randu8((ak, ab, 48, npad), seed=3)
            imgs.block_until_ready()
            return timed_min(lambda: af_chain_f(af_packed, imgs),
                             lambda out: jax.device_get(out[1][-1, :1]), 3)

        def measure_af_xla():
            af_detect = build_anchorfree_detect_fn(af, hw, conf_thres=0.3,
                                                   iou_thres=0.4)

            @jax.jit
            def af_chain(v, images_k):
                def body(_, im):
                    return None, af_detect(v, im)
                return jax.lax.scan(body, None, images_k)[1]

            imgs = dev_randu8((ak, ab, cfg.height, cfg.width, 3), seed=3)
            imgs.block_until_ready()
            return timed_min(lambda: af_chain(af_vars, imgs),
                             lambda out: jax.device_get(out[1][-1, :1]), 3)

        if af_path == "fused":
            try:
                adt = measure_af_fused()
            except Exception:
                # never lose the whole bench artifact to the newer path;
                # the XLA path is hardware-proven (36.6k img/s r3)
                af_path = "xla-fallback"
                adt = measure_af_xla()
        else:
            adt = measure_af_xla()
        return round(ak * ab / adt, 1)

    # (int8 PTQ throughput was measured FIRST, in a fresh subprocess —
    # see the top of main() and _int8_child_main.)

    # end-to-end serving rate: image FILES → native host decode + resize
    # + s2d pack → device fused detect → boxes on host.  The producer
    # thread preprocesses batch N+1 while the device runs batch N
    # (StreamingPipeline over FusedPipeline).  This is the number the
    # reference's 3.29 ms Kirin-990 figure corresponds to (its
    # detection() includes decode/resize/normalize) — every other
    # throughput field here is device-resident.  `host_pre_us_img` is
    # the host preprocessing cost alone on THIS host's cores;
    # docs/PERF.md gives the per-core scaling model for a real TPU host.
    def sec_e2e():
        import tempfile

        import cv2

        from fastdet.serve import FusedPipeline, StreamingPipeline
        tmp = tempfile.mkdtemp(prefix="fastdet_bench_")
        paths = []
        for i in range(64):
            img = rng.randint(0, 255, (480, 640, 3), np.uint8)
            p = os.path.join(tmp, f"im{i:03d}.jpg")
            cv2.imwrite(p, img)
            paths.append(p)

        e2e_batch = int(os.environ.get("FASTDET_BENCH_E2E_BATCH", "256"))
        fast_decode = os.environ.get("FASTDET_BENCH_FAST_DECODE",
                                     "0") == "1"
        pipe = FusedPipeline(variables, cfg, conf_thres=0.3, iou_thres=0.4,
                             max_nms=128, fast_decode=fast_decode)
        stream = StreamingPipeline(pipe, batch_size=e2e_batch)

        # host-state fields so the number is interpretable (VERDICT r3
        # #6): cores available to this process, 1-min loadavg at section
        # start (>~cores ⇒ the host was contended and host_pre_us_img
        # reads high — the r3 run recorded 42 ms/img on a loaded host vs
        # 9.3 ms/img/core quiet, docs/PERF.md §3)
        host_cores = len(os.sched_getaffinity(0)) \
            if hasattr(os, "sched_getaffinity") else os.cpu_count()
        load1 = os.getloadavg()[0] if hasattr(os, "getloadavg") else None

        # host preprocessing alone (decode+resize+pack, this host, all
        # cores via the native preprocessor's OpenMP parallel-for)
        batch_paths = (paths * ((e2e_batch + 63) // 64))[:e2e_batch]
        pipe.preprocess_files(batch_paths)          # warm (file cache)
        t0 = time.perf_counter()
        pipe.preprocess_files(batch_paths)
        host_pre_us = (time.perf_counter() - t0) / e2e_batch * 1e6

        # single-file preprocess cost = the 1-thread per-image cost the
        # C×(1/cost) scaling model in docs/PERF.md §3 is built on (the
        # OpenMP parallel-for has one file, hence one worker)
        pipe.preprocess_files(paths[:1])
        t0 = time.perf_counter()
        reps_1t = 16
        for i in range(reps_1t):
            pipe.preprocess_files(paths[i % len(paths):][:1])
        host_pre_1t_us = (time.perf_counter() - t0) / reps_1t * 1e6

        n_total = e2e_batch * int(os.environ.get("FASTDET_BENCH_E2E_K",
                                                 "6"))
        all_paths = (paths * ((n_total + 63) // 64))[:n_total]
        stream.run_files(all_paths[:e2e_batch])     # warm (compile)
        t0 = time.perf_counter()
        out = stream.run_files(all_paths)
        dt = time.perf_counter() - t0
        assert len(out) == n_total
        return (round(n_total / dt, 1), host_pre_us, host_pre_1t_us,
                host_cores, load1, fast_decode)

    _e2e = run_section(
        "e2e", sec_e2e,
        enabled=os.environ.get("FASTDET_BENCH_E2E", "1") == "1")
    (e2e_img_s, host_pre_us, host_pre_1t_us, host_cores, load1,
     fast_decode) = _e2e if _e2e else (None,) * 6

    # training throughput (chained steps, on-chip): always measured —
    # the driver artifact must carry the framework's flagship training
    # number (reference: ~4 min/COCO epoch on a GTX 1660 Ti,
    # README.md:7; here ≈16 s at 7k img/s true-bf16).  The chain itself
    # (16 × b256, min of 3 reps; deep enough that the ~25 ms relay
    # dispatch overhead is <5% of a rep) takes ~1 s per rep once
    # compiled — the one-time compile dominates.  FASTDET_BENCH_TRAIN=0
    # skips.
    def sec_train():
        from fastdet.train.trainer import Trainer
        # swept: b64 4.4k, b128 7.45k, b256 7.0k, b512 6.0k img/s —
        # the same b128 optimum as the serving paths.  The recorded
        # path is the custom-VJP fused backbone + s2d stem (measured
        # 80.2 vs 92.3 µs/img XLA, docs/PERF.md §2); if its kernels
        # fail on this backend the section falls back to the default
        # XLA path and labels itself accordingly.
        tb, tk = 128, 32
        tcfg = Config.from_dict({
            "classes": cfg.classes, "width": cfg.width,
            "height": cfg.height, "anchor_num": cfg.anchor_num,
            "anchors": list(np.asarray(cfg.anchors, np.float32)),
            "learning_rate": 1e-3, "steps": [10_000], "subdivisions": 1,
            "batch_size": tb, "epochs": 1})
        model_t = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num,
                           dtype=jnp.bfloat16)
        tlabs = np.zeros((tk, tb, 8, 5), np.float32)
        tlabs[..., 0, :] = [1, 0.5, 0.5, 0.3, 0.3]
        tmask = np.zeros((tk, tb, 8), bool)
        tmask[..., 0] = True
        tlabs, tmask = jnp.asarray(tlabs), jnp.asarray(tmask)
        npad4 = ((cfg.height // 4) * (cfg.width // 4) + 127) // 128 * 128

        def measure(fused):
            trainer = Trainer(
                model_t, tcfg, steps_per_epoch=100,
                compute_dtype=jnp.bfloat16, fused_backbone=fused,
                fused_input_format="s2d_u8" if fused else "nhwc")
            tstate = trainer.init_state(jax.tree.map(
                lambda x: jnp.asarray(x, jnp.float32), variables))
            chained = trainer.make_chained_step(tk)
            shape = ((tk, tb, 48, npad4) if fused
                     else (tk, tb, cfg.height, cfg.width, 3))
            timgs = dev_randu8(shape, seed=4)
            timgs.block_until_ready()
            box = [tstate]

            def tdispatch():
                box[0], mk = chained(box[0], timgs, tlabs, tmask)
                return mk
            tdt = timed_min(tdispatch,
                            lambda mk: jax.device_get(mk["total"][-1:]),
                            3)
            return round(tk * tb / tdt, 1)

        try:
            return measure(True), "fused_vjp+s2d_stem"
        except Exception:
            traceback.print_exc(file=sys.stderr)
            return measure(False), "xla"

    _tr = run_section(
        "train", sec_train,
        enabled=os.environ.get("FASTDET_BENCH_TRAIN", "1") == "1")
    train_img_s, train_path = _tr if _tr else (None, None)

    # The newest device path runs LAST: a TPU-worker crash then costs
    # only this secondary field, never the flagship serving/train
    # numbers.
    af_img_s = run_section(
        "anchorfree", sec_anchorfree,
        enabled=os.environ.get("FASTDET_BENCH_ANCHORFREE", "1") == "1")

    result = {
        "metric": "fused_inference_images_per_sec_per_chip_352",
        "value": round(float(img_per_s), 1),
        "unit": "img/s/chip",
        "vs_baseline": round(float(img_per_s) / 5000.0, 3),
        "batch": batch,
        "chain": chain,
        "p50_latency_ms_b1": round(p50_ms, 3),
        "latency_ms_b1_chip": round(b1_chip_ms, 3),
        "img_s_640_chip": img_s_640,
        "anchorfree_img_s": af_img_s,
        "anchorfree_path": af_path,
        "int8_img_s": int8_img_s,
        "e2e_img_s": e2e_img_s,
        "host_pre_us_img": (round(host_pre_us, 1)
                            if host_pre_us is not None else None),
        "host_pre_1t_us_img": (round(host_pre_1t_us, 1)
                               if host_pre_1t_us is not None else None),
        "host_cores": host_cores,
        "host_load1": (round(load1, 2) if load1 is not None else None),
        "fast_decode": fast_decode,
        "train_img_s": train_img_s,
        "train_path": train_path,
        "kernel_path": "pallas_fused_transposed+s2d_stem",
        "input_format": "s2d_u8",
        "backend": jax.default_backend(),
        "sync_verified": bool(sync_mode),
        "fetch_ms": round(fetch_ms, 3),
        "null_rtt_ms": round(null_rtt_ms, 3),
        "section_errors": section_errors or None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--int8-child" in sys.argv:
        _int8_child_main()
    else:
        main()
