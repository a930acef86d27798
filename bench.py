#!/usr/bin/env python
"""Benchmark: denoised points/sec/chip on the flagship offset-regression
U-Net (l1.yaml geometry: 500-point patches, width 144).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

``value`` is the CHUNKED eval-forward throughput — the production
inference regime, frozen as the headline since round 5 (BENCH.md defines
it; do not change the definition): S=25 eval batches stacked and dispatched
as ONE ``lax.scan`` executable (infer.make_chunk_predict_fn — the same
path scripts/infer.py's voting loop uses by default), every prediction
fetched to host via a real D2H transfer, chunks pipelined with lag 1.
Wall time covers H2D + compute + D2H of every output byte.  ``detail``
also reports the legacy per-batch regimes and the full fwd+bwd+adam
training-step throughput (the reference logs batch time per train step,
train_dist.py:459-463):

  * forward_chunked_pps    — scan-batched production eval (= value)
  * forward_pipelined_pps  — per-batch async dispatch, synced once
                             (r1-r4's headline regime; kept for series
                             continuity)
  * forward_scan_ms        — device-true per-batch forward (delta-scan
                             method; dispatch overhead cancelled)
  * forward_synced_ms      — per-call latency with a sync per call
                             (relay RTT included; lower bound on
                             single-patch round-trip latency)
  * train_step_pipelined_pps / train_step_ms — jitted train step, async

``vs_baseline`` is measured against the BASELINE.md north-star of >=10x the
CPU points/sec: a subprocess measures the same pipelined forward on the CPU
backend, and vs_baseline = tpu_pps / (10 * cpu_pps).  >= 1.0 means the
target is met.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

BATCH = 16
WARMUP = 2
ITERS = 50
SYNC_ITERS = 10
TRAIN_ITERS = 30


def _setup(platform: str | None, batch: int):
    import jax
    from deep3dpointclouddenoising_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    if platform:
        # env-var JAX_PLATFORMS is ignored here: the container's
        # sitecustomize force-sets jax_platforms after reading env vars, so
        # the override must be a post-import config update.
        jax.config.update("jax_platforms", platform)
    from __graft_entry__ import _example_batch, _flagship_config
    from deep3dpointclouddenoising_tpu.models import build_offset_regression

    cfg = _flagship_config()
    model, loss_fn = build_offset_regression(cfg)
    b = _example_batch(cfg, batch_size=batch)
    return jax, cfg, model, loss_fn, b


def analyze_model_flops(batch: int = BATCH) -> float:
    """Algorithmic FLOPs of one eval forward, for the MFU numerator.

    Counted from the CPU lowering of the same graph: on CPU
    ``_pallas_mode`` resolves to the gather+einsum oracle path, so the
    count covers the real algorithmic work (KPConv contractions, 1x1
    convs, distance matrices) WITHOUT the one-hot-matmul gather trick the
    TPU executable uses — those gather FLOPs are an implementation detail
    (and XLA may rewrite them), not useful work, and counting them put the
    round-2 "MFU" over 100%.  Standard MFU counts model FLOPs only."""
    jax, cfg, model, _, b = _setup("cpu", batch)
    variables = model.init(jax.random.PRNGKey(0), b["points"], b["mask"],
                           b["features"], train=False)

    @jax.jit
    def forward(variables, points, mask, features):
        return model.apply(variables, points, mask, features, train=False)

    an = forward.lower(variables, b["points"], b["mask"],
                       b["features"]).cost_analysis()
    if isinstance(an, (list, tuple)):
        an = an[0]
    return float(an["flops"])


def analyze_train_flops(batch: int = BATCH) -> float:
    """XLA-counted FLOPs of one train step (fwd+bwd+adam), CPU lowering.

    DIAGNOSTIC ONLY: even the CPU graph's backward runs the scatter-free
    one-hot gather backward (ops/neighbors.py:_gather_rows_bwd), whose
    emulation matmuls inflate this count ~11x over the model math — so the
    train MFU numerator uses the standard fwd+bwd = 3x forward-model-FLOPs
    convention instead (PaLM-style 6ND accounting), and this figure is
    reported only to quantify that gather-emulation overhead."""
    jax, cfg, model, loss_fn, b = _setup("cpu", batch)
    from deep3dpointclouddenoising_tpu.train import Trainer
    cfg.batch_size = batch
    trainer = Trainer(cfg, model, loss_fn, n_iter_per_epoch=2000)
    state = trainer.init_state(jax.random.PRNGKey(0), b)
    an = trainer._jit_train.lower(
        state, b, jax.random.PRNGKey(1)).cost_analysis()
    if isinstance(an, (list, tuple)):
        an = an[0]
    return float(an["flops"])


def measure_forward_pps(iters: int = ITERS, batch: int = BATCH,
                        platform: str | None = None) -> float:
    """Pipelined (async-dispatch) eval-forward points/sec."""
    jax, cfg, model, _, b = _setup(platform, batch)
    variables = model.init(jax.random.PRNGKey(0), b["points"], b["mask"],
                           b["features"], train=False)

    # variables as an argument (not a closure constant) keeps the compile-
    # cache key independent of the init values
    @jax.jit
    def forward(variables, points, mask, features):
        return model.apply(variables, points, mask, features, train=False)

    v = jax.device_put(variables)
    args = (jax.device_put(b["points"]), jax.device_put(b["mask"]),
            jax.device_put(b["features"]))
    for _ in range(WARMUP):
        forward(v, *args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(v, *args)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    points_per_iter = batch * int(cfg.num_points)
    return points_per_iter * iters / dt


def _scan_forward_ms(jax, model, variables, b, sizes=(16, 64)) -> float:
    """Device-true forward time via the delta-scan method.

    Times a single-dispatch ``lax.scan`` of S forwards at two S values and
    divides the wall-time DIFFERENCE by the iteration difference, so every
    per-dispatch overhead (relay RTT, host tracing) and any sync-semantics
    artifact of the tunneled backend cancels.  Each iteration feeds a
    data-dependent scalar back into the next iteration's input, so steps
    serialize and XLA cannot elide or batch them.  The result is forced
    through a real 1-element D2H fetch (np.asarray), the only sync this
    backend is guaranteed to honor (block_until_ready has been observed to
    return before device completion here — see VERDICT r3 'impossible
    numbers')."""
    import numpy as np
    import jax.numpy as jnp

    def make(S):
        @jax.jit
        def run(variables, points, mask, features):
            def body(c, _):
                out = model.apply(variables, points + c, mask, features,
                                  train=False)
                # tiny but non-foldable data dependence onto the next step
                return jnp.sum(out) * np.float32(1e-38), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=S)
            return c
        return run

    args = (jax.device_put(b["points"]), jax.device_put(b["mask"]),
            jax.device_put(b["features"]))
    times = {}
    for S in sizes:
        fn = make(S)
        np.asarray(fn(variables, *args))  # compile + one run
        # ONE dispatch per timed pass (min of 2): if the backend memoizes
        # identical repeat dispatches, averaging N of them would divide
        # the true time by N; a single dispatch per measurement cannot be
        # elided against itself, and the S-delta cancels its overhead.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fn(variables, *args))
            best = min(best, time.perf_counter() - t0)
        times[S] = best
    s0, s1 = sizes
    ms = 1e3 * (times[s1] - times[s0]) / (s1 - s0)
    # timing noise (or repeat-dispatch memoization) can make the delta
    # non-positive; a zero/negative time basis would propagate into inf
    # pps and negative "MFU" — report the method failure as None instead
    return ms if ms > 0 else None


def measure_all(batch: int = BATCH) -> dict:
    """Pipelined + per-call-synced forward, and pipelined train step."""
    jax, cfg, model, loss_fn, b = _setup(None, batch)
    import numpy as np

    from deep3dpointclouddenoising_tpu.train import Trainer

    variables = model.init(jax.random.PRNGKey(0), b["points"], b["mask"],
                           b["features"], train=False)

    @jax.jit
    def forward(variables, points, mask, features):
        return model.apply(variables, points, mask, features, train=False)

    v = jax.device_put(variables)
    args = (jax.device_put(b["points"]), jax.device_put(b["mask"]),
            jax.device_put(b["features"]))
    for _ in range(WARMUP):
        forward(v, *args).block_until_ready()

    # pipelined: N async dispatches, one sync — steady-state loop regime.
    # The final sync is a real 1-element D2H fetch: block_until_ready on the
    # tunneled backend has been observed to return before device completion,
    # so a np.asarray of the last output is the only trustworthy barrier.
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(v, *args)
    float(np.asarray(out)[0, 0, 0])
    dt_pipelined = time.perf_counter() - t0

    # PRODUCTION EVAL REGIME (the headline): scan-batched dispatch — S
    # stacked batches per executable (infer.make_chunk_predict_fn), every
    # prediction fetched to host.  Each timed pass uploads fresh inputs
    # (distinct per chunk AND per step — nothing for a memoizing relay or
    # CSE to elide), dispatches the S-step scan, and D2H-fetches the full
    # (S, B, N, 3) output; chunks pipeline with lag 1 exactly like the
    # voting loop in infer.predict_offsets_voting_chunked.  Wall time
    # covers H2D + compute + D2H of every byte — an enqueue-only artifact
    # cannot survive the final np.asarray of every output.
    from deep3dpointclouddenoising_tpu.infer import make_chunk_predict_fn
    chunk_fn = make_chunk_predict_fn(model, variables)
    S_EVAL, N_CHUNKS = 25, 4
    host_rng = np.random.default_rng(7)
    stacks = []
    for _ in range(N_CHUNKS):
        noise = host_rng.normal(
            size=(S_EVAL,) + b["points"].shape).astype(np.float32) * 1e-4
        pts = np.asarray(b["points"])[None] + noise
        stacks.append({
            "points": pts,
            "mask": np.broadcast_to(np.asarray(b["mask"]),
                                    (S_EVAL,) + b["mask"].shape).copy(),
            "features": pts.copy(),
        })
    np.asarray(chunk_fn(stacks[0]))  # compile + one run
    t0 = time.perf_counter()
    pending = None
    for i in range(N_CHUNKS):
        dev = chunk_fn(stacks[i])
        if pending is not None:
            np.asarray(pending)
        pending = dev
    np.asarray(pending)
    dt_chunked = time.perf_counter() - t0
    pts_per_chunk = S_EVAL * batch * int(cfg.num_points)
    forward_chunked_pps = pts_per_chunk * N_CHUNKS / dt_chunked
    forward_chunked_ms = 1e3 * dt_chunked / (N_CHUNKS * S_EVAL)

    # device-true forward via the delta-scan method (see _scan_forward_ms)
    forward_scan_ms = _scan_forward_ms(jax, model, v, b)

    # same measurement at compute_dtype=bfloat16 — the TPU-first serving
    # dtype (f32 matmuls run at half the MXU's bf16 rate, so an f32-only
    # MFU is capped at 50% of the quoted peak by construction).  Quality
    # at bf16 is pinned by cfgs/synthetic_quality_diverse_bf16.yaml runs.
    try:
        import copy
        cfg16 = copy.deepcopy(cfg)
        cfg16.compute_dtype = "bfloat16"
        from deep3dpointclouddenoising_tpu.models import \
            build_offset_regression as _build16
        model16, _ = _build16(cfg16)
        forward_scan_bf16_ms = _scan_forward_ms(jax, model16, v, b)
    except Exception:
        forward_scan_bf16_ms = None

    # XLA's static cost-model FLOP count for the compiled TPU executable.
    # This includes Pallas CostEstimates and one-hot gather-emulation math,
    # counts kernels the scheduler may later skip or fuse, and is NOT a
    # measured execution rate — rounds 2/3 divided it by wall time and got
    # numbers above chip peak (the count and the timing cannot both be
    # interpreted that way).  Reported only as a static diagnostic; every
    # MFU figure uses the analytic model FLOPs from the CPU lowering.
    try:
        an = forward.lower(v, *args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        fwd_flops = float(an["flops"])
    except Exception:
        fwd_flops = float("nan")

    # synced: one sync per call — includes the relay round-trip on the
    # tunneled backend, so this is a HOST-observed latency, not device time.
    # The sync is a real D2H fetch (see above).
    lat = []
    for _ in range(SYNC_ITERS):
        t0 = time.perf_counter()
        float(np.asarray(forward(v, *args))[0, 0, 0])
        lat.append(time.perf_counter() - t0)

    # training step (fwd+bwd+adam), pipelined
    cfg.batch_size = batch
    trainer = Trainer(cfg, model, loss_fn, n_iter_per_epoch=2000)
    state = trainer.init_state(jax.random.PRNGKey(0), b)
    rng = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        state, loss = trainer.train_step(state, b, rng)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(TRAIN_ITERS):
        state, loss = trainer.train_step(state, b, rng)
    float(np.asarray(loss))  # real D2H sync
    dt_train = time.perf_counter() - t0

    # training steps via the scan-based chunked dispatch (S steps per jit
    # call, one H2D per chunk — scripts/train.py's default path): the
    # figure that bounds real training-loop wall time on the relay backend
    # delta-scan method (see _scan_forward_ms): time chunks of S=25 and
    # S=75 steps, report (t75 - t25) / 50 — dispatch overhead and any sync
    # artifact cancel, leaving the true device time per optimizer step.
    chunk_t = {}
    for S in (25, 75):
        chunk = {k: np.stack([np.asarray(b[k])] * S) for k in b}
        state, losses = trainer.train_chunk(state, chunk, rng)  # compile
        np.asarray(losses)
        t0 = time.perf_counter()
        for _ in range(3):
            state, losses = trainer.train_chunk(state, chunk, rng)
        np.asarray(losses)  # real D2H sync
        chunk_t[S] = (time.perf_counter() - t0) / 3
    S = 25  # report fields below divide by 3*S, so scale the per-step
    per_step = (chunk_t[75] - chunk_t[25]) / 50.0
    dt_chunk = 3 * S * per_step

    # training with ON-DEVICE patch sampling (data/device_sampler.py): the
    # clouds live on device and each dispatch receives only (S, B, 2) int32
    # centers — the end-state of removing the host->device data path
    from types import SimpleNamespace

    from deep3dpointclouddenoising_tpu.data.device_sampler import (
        DeviceSampler, build_sampled_train_chunk)
    host_rng = np.random.default_rng(0)
    n_cloud = 140000  # reference point density (train_dist.py:230)
    cloud = (host_rng.random((n_cloud, 3), np.float32) * 2 - 1)
    duck = SimpleNamespace(
        shapes=[SimpleNamespace(
            points=cloud,
            offsets=host_rng.normal(size=(n_cloud, 3)).astype(np.float32)
            * 0.005,
            labels=np.zeros(n_cloud, np.int32))],
        point_inds=host_rng.integers(0, n_cloud, 2048).astype(np.int32),
        cloud_inds=np.zeros(2048, np.int32),
        num_steps=2048, fourier_B=None)
    cfg.jitter = 1
    cfg.z_angle_range = 3.1415926
    cfg.augment_symmetries = [1, 0, 0]
    cfg.scale_low = cfg.scale_high = 1.0
    sampler = DeviceSampler(duck, cfg)
    cloud_data = sampler.cloud_data()
    sampled_fn = build_sampled_train_chunk(trainer, sampler)
    centers = jax.device_put(sampler.centers(0, batch)[:S])
    state, losses = sampled_fn(state, centers, cloud_data, rng)  # compile
    np.asarray(losses)
    t0 = time.perf_counter()
    for _ in range(3):
        state, losses = sampled_fn(state, centers, cloud_data, rng)
    np.asarray(losses)  # real D2H sync
    dt_sampled = time.perf_counter() - t0

    pts = batch * int(cfg.num_points)
    have_flops = fwd_flops == fwd_flops  # cost_analysis can fail → NaN
    kind = jax.devices()[0].device_kind.lower()
    # documented bf16 MXU peaks per chip; f32 math runs at half of these
    peaks = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
             "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12}
    peak = next((p for k, p in peaks.items() if k in kind), None)
    return {
        "forward_chunked_pps": forward_chunked_pps,
        "forward_chunked_batch_ms": forward_chunked_ms,
        "forward_chunked_steps": S_EVAL,
        "forward_pipelined_pps": pts * ITERS / dt_pipelined,
        "forward_pipelined_ms": 1e3 * dt_pipelined / ITERS,
        "forward_scan_ms": forward_scan_ms,
        "forward_scan_pps": (pts / (forward_scan_ms * 1e-3)
                             if forward_scan_ms else None),
        "forward_scan_bf16_ms": forward_scan_bf16_ms,
        "xla_cost_model_gflops_per_call": fwd_flops / 1e9 if have_flops
        else None,
        "bf16_peak_tflops": peak / 1e12 if peak else None,
        "forward_synced_ms": 1e3 * statistics.median(lat),
        "forward_synced_ms_min": 1e3 * min(lat),
        "train_step_pipelined_pps": pts * TRAIN_ITERS / dt_train,
        "train_step_ms": 1e3 * dt_train / TRAIN_ITERS,
        "train_chunk_pps": pts * 3 * S / dt_chunk,
        "train_chunk_step_ms": 1e3 * dt_chunk / (3 * S),
        "train_sampled_pps": pts * 3 * S / dt_sampled,
        "train_sampled_step_ms": 1e3 * dt_sampled / (3 * S),
        "host_patch_assembly_ms": _host_loader_ms(int(cfg.num_points)),
        "batch": batch,
        "num_points": int(cfg.num_points),
    }


def measure_voting(batch: int = BATCH, n_cloud: int = 140_000,
                   n_centers: int = 1200) -> dict:
    """End-to-end voting inference throughput on one reference-density
    cloud: the full ``denoise_clouds_device`` protocol — device-resident
    patch extraction, forward, per-point vote scatter inside one jitted
    scan (qualitative_inference_test.py:282-344's accumulate-then-divide
    semantics).  ``voting_pps`` is CLOUD points denoised per second of
    wall time; the patch coverage (~1200 centers for a diag-1 shape at
    sampleDl_patches=0.03) matches the qualitative_test grid protocol."""
    import numpy as np
    jax, cfg, model, _, b = _setup(None, batch)
    from types import SimpleNamespace

    from deep3dpointclouddenoising_tpu.infer import \
        predict_offsets_voting_device
    from deep3dpointclouddenoising_tpu.utils.native import GridIndex

    host_rng = np.random.default_rng(0)
    # sphere surface at the synthetic-quality scale (bbox diagonal 1)
    v = host_rng.normal(size=(n_cloud, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
    pts = v * 0.2887 + host_rng.normal(
        size=(n_cloud, 3)).astype(np.float32) * 0.005 * 0.5
    pts = pts.astype(np.float32)
    centers = host_rng.integers(0, n_cloud, n_centers).astype(np.int32)

    class _VotingDataset:
        """Minimal dataset for the device-voting protocol: real host
        patch extraction (native fused assembler — the r5 device path
        precomputes patch indices on the host) over the synthetic cloud."""

        def __init__(self):
            self.shapes = [SimpleNamespace(
                points=pts, offsets=np.zeros((n_cloud, 3), np.float32),
                labels=np.zeros(n_cloud, np.int32))]
            self.point_inds = centers
            self.cloud_inds = np.zeros(n_centers, np.int32)
            self.num_steps = n_centers
            self.fourier_B = None
            self.fourier_features = False
            self._grid = GridIndex(pts, cell=float(cfg.in_radius))

        def __len__(self):
            return n_centers

        def get(self, i, epoch=0):
            c = int(self.point_inds[i])
            s = self.shapes[0]
            p, offs, labs, mask, inds, _ = self._grid.assemble_patch(
                pts[c], c, float(cfg.in_radius), int(cfg.num_points),
                seed=(0, i), offsets=s.offsets, labels=s.labels)
            return {"points": p, "mask": mask, "features": p.copy(),
                    "offsets": offs, "labels": labs,
                    "cloud_ind": np.int32(0), "input_inds": inds}

    duck = _VotingDataset()

    variables = model.init(jax.random.PRNGKey(0), b["points"], b["mask"],
                           b["features"], train=False)
    # first call compiles + runs; second call measures the steady state
    predict_offsets_voting_device(model, variables, cfg, duck, batch)
    t0 = time.perf_counter()
    offsets = predict_offsets_voting_device(model, variables, cfg, duck,
                                            batch)
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(offsets[0]))
    return {
        "voting_pps": n_cloud / dt,
        "voting_cloud_ms": 1e3 * dt,
        "voting_patches_per_s": n_centers / dt,
        "voting_n_centers": n_centers,
    }


def measure_large(batch: int = 4, num_points: int = 15_000) -> dict:
    """Large-geometry (chamfer_5e3.yaml twin: 15k-point patches) forward +
    train step on the chip — the SURVEY §7 "hard part" shapes: chunked
    ball query under grad, the >2048-support gather backward, and the
    15k-vs-15k chamfer loss (reference
    /root/reference/u_net_arch/cfgs/chamfer_5e3.yaml:20)."""
    import numpy as np
    jax = __import__("jax")
    from deep3dpointclouddenoising_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    from __graft_entry__ import _example_batch, _flagship_config
    from deep3dpointclouddenoising_tpu.models import build_offset_regression
    from deep3dpointclouddenoising_tpu.train import Trainer

    cfg = _flagship_config(num_points=num_points)
    cfg.loss = "chamfer"
    cfg.batch_size = batch
    model, loss_fn = build_offset_regression(cfg)
    b = _example_batch(cfg, batch_size=batch)
    variables = model.init(jax.random.PRNGKey(0), b["points"], b["mask"],
                           b["features"], train=False)

    @jax.jit
    def forward(variables, points, mask, features):
        return model.apply(variables, points, mask, features, train=False)

    v = jax.device_put(variables)
    args = (jax.device_put(b["points"]), jax.device_put(b["mask"]),
            jax.device_put(b["features"]))
    for _ in range(2):
        forward(v, *args).block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(v, *args)
    float(np.asarray(out)[0, 0, 0])  # real D2H sync
    dt_fwd = (time.perf_counter() - t0) / iters

    trainer = Trainer(cfg, model, loss_fn, n_iter_per_epoch=1000)
    state = trainer.init_state(jax.random.PRNGKey(0), b)
    rng = jax.random.PRNGKey(1)
    try:
        ma = trainer._jit_train.lower(
            state, b, rng).compile().memory_analysis()
        hbm_gb = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                  + ma.output_size_in_bytes) / 2**30
    except Exception:
        hbm_gb = None
    for _ in range(2):
        state, loss = trainer.train_step(state, b, rng)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    titers = 10
    for _ in range(titers):
        state, loss = trainer.train_step(state, b, rng)
    float(np.asarray(loss))  # real D2H sync
    dt_tr = (time.perf_counter() - t0) / titers
    pts = batch * num_points
    return {
        "large_num_points": num_points,
        "large_batch": batch,
        "large_forward_ms": 1e3 * dt_fwd,
        "large_forward_pps": pts / dt_fwd,
        "large_train_step_ms": 1e3 * dt_tr,
        "large_train_pps": pts / dt_tr,
        "large_train_hbm_gb": hbm_gb,
        "large_loss_finite": bool(np.isfinite(float(loss))),
    }


def _host_loader_ms(num_points: int, n_cloud: int = 140_000,
                    iters: int = 100) -> float | None:
    """ms per patch for the native fused assembler (d3d_assemble_patch) at
    the reference training geometry: in_radius 2.0 over a unit cloud, i.e.
    every query ranks the whole cloud.  Host-only (no device work)."""
    import numpy as np

    from deep3dpointclouddenoising_tpu.utils.native import (GridIndex,
                                                            native_available)
    if not native_available():
        return None
    rng = np.random.default_rng(0)
    pts = ((rng.random((n_cloud, 3), dtype=np.float32) - 0.5) * 0.9)
    offs = (rng.standard_normal((n_cloud, 3)) * 0.01).astype(np.float32)
    labs = rng.integers(0, 2, n_cloud).astype(np.int32)
    idx = GridIndex(pts, cell=2.0)
    centers = rng.integers(0, n_cloud, iters)
    idx.assemble_patch(pts[centers[0]], int(centers[0]), 2.0, num_points,
                       seed=(0, 0), offsets=offs, labels=labs)
    t0 = time.perf_counter()
    for i, c in enumerate(centers):
        idx.assemble_patch(pts[c], int(c), 2.0, num_points, seed=(0, i),
                           offsets=offs, labels=labs)
    return 1e3 * (time.perf_counter() - t0) / iters


def _measure_all_plus() -> dict:
    """measure_all + the voting and large-geometry sections, each guarded
    so a relay hiccup in one stage doesn't void the others.

    After every section a ``BENCH_PART`` line goes to stdout: if the parent
    kills this subprocess on timeout (the 15k-geometry section can spend
    tens of relay-compile minutes on a cold cache), the sections that DID
    complete still reach the final JSON — and the persistent compile cache
    means the next attempt resumes further along."""
    detail = measure_all()
    print("BENCH_PART " + json.dumps(detail), flush=True)
    for fn in (measure_voting, measure_large):
        try:
            detail.update(fn())
        except Exception as e:  # OOM / relay drop / compile failure
            detail[f"{fn.__name__}_error"] = repr(e)[:200]
        print("BENCH_PART " + json.dumps(detail), flush=True)
    return detail


def _cpu_baseline() -> dict:
    """CPU-backend forward pps (the >=10x north-star denominator) plus the
    algorithmic model + train-step FLOPs (MFU numerators), in one
    subprocess."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # count ALGORITHMIC model FLOPs (and measure the CPU baseline on its
    # fastest gather path): the one-hot MXU gather is a TPU implementation
    # detail whose emulation matmuls otherwise inflate the MFU numerator
    env["D3D_DISABLE_ONEHOT_GATHER"] = "1"
    code = ("import bench, json;"
            "print('CPU_JSON ' + json.dumps("
            "{'pps': bench.measure_forward_pps(iters=3, batch=4,"
            " platform='cpu'),"
            " 'model_flops': bench.analyze_model_flops(),"
            " 'train_flops': bench.analyze_train_flops()}))")
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("CPU_JSON "):
                return json.loads(line[len("CPU_JSON "):])
    except Exception:
        pass
    return {"pps": float("nan"), "model_flops": float("nan")}


def main():
    # The tunneled-TPU backend occasionally drops (UNAVAILABLE on init);
    # observed outages run 10-90 minutes, so retry with generous spacing —
    # a bench line 20 minutes late beats a null result.  A hung init (the
    # relay accepts nothing, the axon plugin retries forever) is bounded by
    # running each attempt in a subprocess with a hard timeout.
    detail = None
    partial = None
    last_err = None
    for attempt in range(5):
        code = ("import bench, json;"
                "print('BENCH_JSON ' + json.dumps(bench._measure_all_plus()))")
        stdout = ""
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=3600,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            stdout = out.stdout or ""
            last_err = (out.stderr or out.stdout or "")[-300:]
        except subprocess.TimeoutExpired as e:
            # keep whatever sections finished before the timeout — the
            # persistent compile cache makes the next attempt resume
            stdout = (e.stdout or b"")
            if isinstance(stdout, bytes):
                stdout = stdout.decode(errors="replace")
            last_err = f"attempt timed out after {e.timeout}s"
        except Exception as e:  # relay outage
            last_err = e
        for line in stdout.splitlines():
            if line.startswith("BENCH_JSON "):
                detail = json.loads(line[len("BENCH_JSON "):])
            elif line.startswith("BENCH_PART "):
                partial = json.loads(line[len("BENCH_PART "):])
        if detail is not None:
            break
        time.sleep(120 * attempt + 30)
    if detail is None and partial is not None:
        partial["incomplete"] = "later sections timed out; values kept"
        detail = partial
    if detail is None:
        print(json.dumps({
            "metric": "denoised_points_per_sec_chip",
            "value": None,
            "unit": "points/s",
            "vs_baseline": None,
            "error": f"TPU unavailable after retries: {last_err}",
        }))
        return
    cpu = _cpu_baseline()
    cpu_pps = cpu["pps"]
    pps = detail.get("forward_chunked_pps") \
        or detail["forward_pipelined_pps"]
    vs = pps / (10.0 * cpu_pps) if cpu_pps == cpu_pps else None
    # MFU = algorithmic model FLOPs (CPU lowering — no gather-trick
    # inflation) / device-true forward time / chip bf16 peak.  The time
    # basis is the delta-scan figure (forward_scan_ms): two scan lengths,
    # difference divided by iteration delta, so dispatch overhead and any
    # tunneled-backend sync artifact cancel.  An MFU above 100% is a
    # methodology error by definition and is flagged, never reported as a
    # headline.
    mf = cpu["model_flops"]
    peak = detail.get("bf16_peak_tflops")

    def _mfu(flops, ms):
        # a non-positive time basis is a methodology failure, and so is a
        # rate above peak — neither is ever reported as a headline number
        if not ms or ms <= 0:
            return None
        pct = 100.0 * flops / (ms * 1e-3) / (peak * 1e12)
        return pct if 0.0 < pct <= 100.0 else None

    fwd_ms = detail.get("forward_scan_ms") or detail.get(
        "forward_pipelined_ms")
    if mf == mf and peak and fwd_ms:
        detail["model_gflops_per_call"] = mf / 1e9
        pct = _mfu(mf, fwd_ms)
        if pct is None:
            detail["mfu_methodology_error"] = (
                f"model FLOPs / forward_scan_ms exceeds peak "
                f"({100.0 * mf / (fwd_ms * 1e-3) / (peak * 1e12):.0f}%)")
        else:
            detail["mfu_pct_bf16_peak"] = pct
        ms16 = detail.get("forward_scan_bf16_ms")
        if ms16:
            pct16 = _mfu(mf, ms16)
            if pct16 is not None:
                detail["mfu_pct_bf16_peak_bf16_model"] = pct16
            else:
                detail["mfu_bf16_methodology_error"] = (
                    "model FLOPs / forward_scan_bf16_ms exceeds peak")
    # train-step MFU at the steady-state chunked dispatch cadence (the
    # number that bounds real training throughput).  Numerator: standard
    # fwd+bwd = 3x forward model FLOPs (the lowered train-step count is
    # inflated by the one-hot gather backward — see analyze_train_flops).
    tf = cpu.get("train_flops", float("nan"))
    if tf == tf:
        detail["xla_train_step_gflops_lowered"] = tf / 1e9
    if mf == mf and peak and detail.get("train_chunk_step_ms"):
        detail["train_model_gflops_per_step"] = 3.0 * mf / 1e9
        pct = _mfu(3.0 * mf, detail["train_chunk_step_ms"])
        if pct is None:
            detail["train_mfu_methodology_error"] = (
                "3x model FLOPs / train_chunk_step_ms exceeds peak")
        else:
            detail["train_mfu_pct_bf16_peak"] = pct
    print(json.dumps({
        "metric": "denoised_points_per_sec_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "detail": {k: (round(val, 3) if isinstance(val, float) else val)
                   for k, val in detail.items()},
    }))


if __name__ == "__main__":
    main()
