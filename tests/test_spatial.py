"""Spatial (sequence/context) parallelism tests: a full-cloud forward with
the point axis sharded over the 8-device CPU mesh must match the unsharded
forward bit-for-bit-ish, load patch-trained parameters unchanged, and keep
the output sharded on the point axis (SURVEY.md §5 stretch goal)."""
import numpy as np
import jax
import jax.numpy as jnp

from deep3dpointclouddenoising_tpu.config import default_config
from deep3dpointclouddenoising_tpu.models import build_offset_regression
from deep3dpointclouddenoising_tpu.parallel.mesh import (
    DATA_AXIS,
    POINTS_AXIS,
    make_mesh,
    make_mesh_2d,
)
from deep3dpointclouddenoising_tpu.parallel.spatial import (
    build_spatial_forward,
    build_spatial_model,
)


def giant_cloud_cfg():
    cfg = default_config()
    # r5 slow-tier trim: depth 1 + narrower geometry halves the 8-device
    # SPMD compile time of every test in this file; the sharded-vs-
    # unsharded parities being pinned are size-independent
    cfg.num_points = 256          # the "giant cloud" at test scale
    cfg.width = 16
    cfg.depth = 1
    cfg.radius = 0.2
    cfg.sampleDl = 0.05
    cfg.nsamples = [8, 8, 8, 8, 8]
    cfg.npoints = [64, 32, 16, 8]
    cfg.local_aggregation_type = "pseudo_grid"
    cfg.head = "offset_reg_head"
    cfg.loss = "L1"
    cfg.use_pallas = False
    return cfg


def make_cloud(rng, B=1, N=256):
    xyz = (rng.random((B, N, 3), dtype=np.float32) * 2 - 1)
    mask = np.ones((B, N), np.float32)
    mask[:, -7:] = 0.0  # ragged tail: padding points
    return xyz, mask


def test_spatial_forward_matches_unsharded(rng):
    assert len(jax.devices()) >= 8
    cfg = giant_cloud_cfg()
    cfg.depth = 2  # keep one depth-2 (self-aggregation levels) parity
    xyz, mask = make_cloud(rng)

    # parameters come from the ordinary (patch-trained) model
    model, _ = build_offset_regression(cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, xyz,
                           train=False)
    want = np.asarray(model.apply(variables, xyz, mask, xyz, train=False))

    mesh = make_mesh(8)
    _, fwd = build_spatial_forward(cfg, mesh)
    got = fwd(variables, xyz, mask, xyz)

    # output stays sharded on the point axis
    spec = got.sharding.spec
    assert DATA_AXIS in tuple(spec), spec
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)


def test_spatial_model_params_identical_tree(rng):
    """The hooked model must expose the exact parameter tree of the plain
    model (checkpoint compatibility)."""
    cfg = giant_cloud_cfg()
    xyz, mask = make_cloud(rng)
    plain, _ = build_offset_regression(cfg)
    spatial = build_spatial_model(cfg, make_mesh(8))
    v_plain = plain.init(jax.random.PRNGKey(0), xyz, mask, xyz, train=False)
    v_spatial = spatial.init(jax.random.PRNGKey(0), xyz, mask, xyz,
                             train=False)
    paths_p = {jax.tree_util.keystr(k): v.shape for k, v in
               jax.tree_util.tree_leaves_with_path(v_plain["params"])}
    paths_s = {jax.tree_util.keystr(k): v.shape for k, v in
               jax.tree_util.tree_leaves_with_path(v_spatial["params"])}
    assert paths_p == paths_s


def test_denoise_clouds_spatial(rng, tmp_path):
    """End-to-end full-cloud spatial denoising over a tiny synthetic shape."""
    from deep3dpointclouddenoising_tpu.data.offset_dataset import \
        OffsetDataset
    from deep3dpointclouddenoising_tpu.data.synthetic import make_icosphere
    from deep3dpointclouddenoising_tpu.infer import denoise_clouds_spatial

    ds = OffsetDataset(
        str(tmp_path), "qualitative_test", in_radius=0.4, num_points=64,
        num_steps=1, num_epochs=1, noise_type="gaussian", noise_level=5e-3,
        num_points_per_shape=300, outlier_proportion=0.0, seed=0,
        sample_dl_patches=0.3,
        shapes={"qualitative_test/sphere": make_icosphere(2)})

    cfg = giant_cloud_cfg()
    model, _ = build_offset_regression(cfg)
    xyz, mask = make_cloud(rng)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, xyz,
                           train=False)
    res = denoise_clouds_spatial(variables, cfg, ds, mesh=make_mesh(8),
                                 size_bucket=128)
    assert len(res) == 1
    assert res[0]["denoised"].shape == (300, 3)
    assert np.all(np.isfinite(res[0]["denoised"]))
    # padding must not leak: offsets for real points depend only on the cloud
    np.testing.assert_allclose(
        res[0]["denoised"], res[0]["noisy"] + res[0]["offsets"])


def test_spatial_training_matches_single_device(rng):
    """Sequence-parallel TRAINING: a point-sharded train step on 8 devices
    must track the unsharded step (BatchNorm point-axis stats and the masked
    loss keep global semantics under GSPMD)."""
    from deep3dpointclouddenoising_tpu.train import Trainer

    cfg = giant_cloud_cfg()
    cfg.optimizer = "adam"
    cfg.base_learning_rate = 1e-3
    cfg.lr_scheduler = "step"
    cfg.warmup_epoch = -1
    cfg.epochs = 10
    cfg.batch_size = 2
    cfg.weight_decay = 0.0

    xyz, mask = make_cloud(rng, B=2)
    offs = rng.normal(size=xyz.shape).astype(np.float32) * 0.02
    # cloud_ind is a rank-1 leaf like real BatchLoader batches carry — the
    # spatial P(None, data) spec must not be applied to it (per-leaf
    # shardings replicate rank<2 leaves)
    batch = {"points": xyz, "mask": mask, "features": xyz.copy(),
             "offsets": offs, "cloud_ind": np.arange(2, dtype=np.int32)}

    plain, loss_fn = build_offset_regression(cfg)
    spatial = build_spatial_model(cfg, make_mesh(8))
    key = jax.random.PRNGKey(0)

    t1 = Trainer(cfg, plain, loss_fn, 10, mesh=make_mesh(1))
    t8 = Trainer(cfg, spatial, loss_fn, 10, mesh=make_mesh(8), spatial=True)
    s1 = t1.init_state(key, batch)
    s8 = t8.init_state(key, batch)

    for i in range(3):
        r = jax.random.PRNGKey(100 + i)
        s1, l1 = t1.train_step(s1, batch, r)
        s8, l8 = t8.train_step(s8, batch, r)
        np.testing.assert_allclose(float(l1), float(l8), rtol=2e-3)
    lr = float(cfg.base_learning_rate)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=6.0 * lr)


def test_spatial_shard_map_pallas_matches_xla(rng):
    """The shard_map-per-device Pallas aggregation (VERDICT #5) must match
    the GSPMD XLA oracle and the unsharded forward — interpret-mode kernel
    on the 8-device CPU mesh, the real kernel on TPU."""
    cfg = giant_cloud_cfg()
    xyz, mask = make_cloud(rng)
    model, _ = build_offset_regression(cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, xyz,
                           train=False)
    want = np.asarray(model.apply(variables, xyz, mask, xyz, train=False))

    mesh = make_mesh(8)
    spatial = build_spatial_model(cfg, mesh, pallas="shard_map")
    got = np.asarray(spatial.apply(variables, xyz, mask, xyz, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_spatial_shard_map_pallas_gradients(rng):
    """The shard_map wrapper must be differentiable: the tiled all-gather
    transposes into a reduce-scatter of the Pallas backward's d_features,
    so parameter gradients must match the unsharded model's."""
    cfg = giant_cloud_cfg()
    xyz, mask = make_cloud(rng)
    model, _ = build_offset_regression(cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, xyz,
                           train=False)
    spatial = build_spatial_model(cfg, make_mesh(8), pallas="shard_map")

    def loss(m):
        def f(params):
            out = m.apply({"params": params,
                           "batch_stats": variables.get("batch_stats", {})},
                          xyz, mask, xyz, train=False)
            return jnp.sum(out * out)
        return f

    g_plain = jax.grad(loss(model))(variables["params"])
    g_shard = jax.grad(loss(spatial))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_spatial_forward_uneven_shards(rng):
    """Point counts that do not divide the mesh (GSPMD pads internally)."""
    cfg = giant_cloud_cfg()
    cfg.num_points = 200          # 200 / 8 = 25 -> fine; npoints uneven:
    cfg.npoints = [50, 22, 10, 3]
    xyz, mask = make_cloud(rng, N=200)
    model, _ = build_offset_regression(cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, xyz,
                           train=False)
    want = np.asarray(model.apply(variables, xyz, mask, xyz, train=False))
    _, fwd = build_spatial_forward(cfg, make_mesh(8))
    got = np.asarray(fwd(variables, xyz, mask, xyz))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_spatial_2d_mesh_dp_sp_matches_unsharded(rng):
    """2-D (data, points) mesh: a BATCH of clouds data-parallel over
    ``data`` with each cloud's point axis sharded over ``points`` — the
    DP x SP combination the reference cannot express at all (its only
    axis is DDP data parallel, train_dist.py:375)."""
    cfg = giant_cloud_cfg()
    B = 4
    xyz, mask = make_cloud(rng, B=B)

    model, _ = build_offset_regression(cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, xyz,
                           train=False)
    want = np.asarray(model.apply(variables, xyz, mask, xyz, train=False))

    mesh = make_mesh_2d(2, 4)     # 8 CPU devices -> 2 data x 4 points
    _, fwd = build_spatial_forward(cfg, mesh, axis=POINTS_AXIS,
                                   batch_axis=DATA_AXIS)
    got = fwd(variables, xyz, mask, xyz)
    spec = tuple(got.sharding.spec)
    assert DATA_AXIS in spec and POINTS_AXIS in spec, spec
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)


def test_spatial_2d_mesh_training_matches_single_device(rng):
    """DP x SP TRAINING on the 2-D mesh: batch sharded over 'data', point
    axis over 'points'; losses must track the single-device step."""
    from deep3dpointclouddenoising_tpu.train import Trainer

    cfg = giant_cloud_cfg()
    cfg.optimizer = "adam"
    cfg.base_learning_rate = 1e-3
    cfg.lr_scheduler = "step"
    cfg.warmup_epoch = -1
    cfg.epochs = 10
    cfg.batch_size = 4
    cfg.weight_decay = 0.0

    xyz, mask = make_cloud(rng, B=4)
    offs = rng.normal(size=xyz.shape).astype(np.float32) * 0.02
    batch = {"points": xyz, "mask": mask, "features": xyz.copy(),
             "offsets": offs, "cloud_ind": np.arange(4, dtype=np.int32)}

    plain, loss_fn = build_offset_regression(cfg)
    mesh2 = make_mesh_2d(2, 4)
    sp_model = build_spatial_model(cfg, mesh2, axis=POINTS_AXIS,
                                   batch_axis=DATA_AXIS)
    key = jax.random.PRNGKey(0)

    t1 = Trainer(cfg, plain, loss_fn, 10, mesh=make_mesh(1))
    t2d = Trainer(cfg, sp_model, loss_fn, 10, mesh=mesh2, spatial="2d")
    s1 = t1.init_state(key, batch)
    s2d = t2d.init_state(key, batch)

    for i in range(3):
        r = jax.random.PRNGKey(100 + i)
        s1, l1 = t1.train_step(s1, batch, r)
        s2d, l2 = t2d.train_step(s2d, batch, r)
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-3)


def test_spatial_2d_mesh_shard_map_pallas(rng):
    """The fused-Pallas shard_map aggregation on the 2-D mesh (interpret
    mode on CPU) matches the XLA path."""
    cfg = giant_cloud_cfg()
    B = 2
    xyz, mask = make_cloud(rng, B=B)
    model, _ = build_offset_regression(cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, xyz,
                           train=False)
    want = np.asarray(model.apply(variables, xyz, mask, xyz, train=False))

    mesh = make_mesh_2d(2, 4)
    sp_model = build_spatial_model(cfg, mesh, pallas="shard_map",
                                   axis=POINTS_AXIS, batch_axis=DATA_AXIS)
    got = np.asarray(sp_model.apply(variables, xyz, mask, xyz,
                                    train=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
