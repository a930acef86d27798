"""One-shot TPU measurement session (dev tool, not part of the package).

Acquires the tunneled backend with retries (the relay flaps), then runs all
pending on-device checks in one process: Pallas backward grad check vs the
jnp oracle, flagship pyramid/forward split, bfloat16 comparison, and a
batch-size sweep.  Run detached: results land in the log.
"""
import sys
import time

sys.path.insert(0, '/root/repo')


def acquire(max_tries=30, sleep_s=120):
    import jax
    for i in range(max_tries):
        try:
            devs = jax.devices()
            print(f"backend acquired on try {i+1}: {devs}", flush=True)
            return jax
        except RuntimeError as e:
            print(f"init try {i+1} failed: {str(e)[:100]}", flush=True)
            from jax._src import xla_bridge
            xla_bridge.backends.cache_clear()
            time.sleep(sleep_s)
    raise SystemExit("no backend")


jax = acquire()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def t_of(fn, *a, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---- 1. pallas backward grad check + timing ----
print("== grad check ==", flush=True)
from deep3dpointclouddenoising_tpu.ops.pallas_kpconv import (  # noqa: E402
    kpconv_aggregate, kpconv_aggregate_reference)

B, N, M, S, P, C = 2, 512, 256, 32, 15, 64
ks = jax.random.split(jax.random.PRNGKey(0), 6)
feats = jax.random.normal(ks[0], (B, N, C), jnp.float32)
idx = jax.random.randint(ks[1], (B, M, S), 0, N)
rel = jax.random.normal(ks[2], (B, M, S, 3), jnp.float32) * 0.05
mask = (jax.random.uniform(ks[3], (B, M, S)) > 0.2).astype(jnp.float32)
kpoints = jax.random.normal(ks[4], (P, 3), jnp.float32) * 0.05
kw = jax.random.normal(ks[5], (P, C), jnp.float32) / np.sqrt(C)
extent = 0.06


def loss_fused(f, w):
    return jnp.sum(kpconv_aggregate(f, idx, rel, mask, kpoints, w,
                                    extent) ** 2)


def loss_ref(f, w):
    grouped = jnp.take_along_axis(
        f, idx.reshape(B, M * S)[..., None], axis=1).reshape(B, M, S, C)
    return jnp.sum(kpconv_aggregate_reference(
        grouped, rel, mask, kpoints, w, extent=extent) ** 2)


gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))
gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))
t0 = time.time()
a = jax.block_until_ready(gf(feats, kw))
print("fused grad compile+run", round(time.time() - t0, 1), flush=True)
t0 = time.time()
b = jax.block_until_ready(gr(feats, kw))
print("ref grad compile+run", round(time.time() - t0, 1), flush=True)
for name, x, y in (("d_feat", a[0], b[0]), ("d_kw", a[1], b[1])):
    err = float(jnp.max(jnp.abs(x - y)))
    scale = float(jnp.max(jnp.abs(y))) + 1e-9
    print(f"{name} max abs err {err:.3e} rel {err/scale:.3e}", flush=True)
tf = t_of(lambda: gf(feats, kw))
tr = t_of(lambda: gr(feats, kw))
print(f"grad fused {tf*1e3:.3f} ms  ref {tr*1e3:.3f} ms", flush=True)

# ---- 2. flagship forward split + bf16 + batch sweep ----
print("== forward profile ==", flush=True)
from __graft_entry__ import _example_batch, _flagship_config  # noqa: E402
from deep3dpointclouddenoising_tpu.models import (  # noqa: E402
    build_offset_regression)
from deep3dpointclouddenoising_tpu.models.pyramid import (  # noqa: E402
    build_pyramid)

cfg = _flagship_config()
for batch_size in (16, 64):
    bb = _example_batch(cfg, batch_size=batch_size)
    pts = jax.device_put(jnp.asarray(bb["points"]))
    msk = jax.device_put(jnp.asarray(bb["mask"]))
    fts = jax.device_put(jnp.asarray(bb["features"]))
    denom = batch_size * int(cfg.num_points)
    pyr_fn = jax.jit(lambda p, m: build_pyramid(
        p, m, radius=float(cfg.radius), sample_dl=float(cfg.sampleDl),
        nsamples=list(cfg.nsamples), npoints=list(cfg.npoints)))
    t = t_of(pyr_fn, pts, msk)
    print(f"B={batch_size} pyramid_only: {t*1e3:.3f} ms "
          f"({denom/t:,.0f} pts/s)", flush=True)
    for dtype in ("float32", "bfloat16"):
        cfg.compute_dtype = dtype
        model, _ = build_offset_regression(cfg)
        variables = model.init(jax.random.PRNGKey(0), bb["points"],
                               bb["mask"], bb["features"], train=False)
        fwd = jax.jit(lambda p, m, f: model.apply(variables, p, m, f,
                                                  train=False))
        t = t_of(fwd, pts, msk, fts)
        out = fwd(pts, msk, fts)
        print(f"B={batch_size} forward[{dtype}]: {t*1e3:.3f} ms "
              f"({denom/t:,.0f} pts/s) "
              f"out_std={float(jnp.std(out.astype(jnp.float32))):.5f}",
              flush=True)
    cfg.compute_dtype = "float32"
print("DONE", flush=True)
