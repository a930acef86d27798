"""Voting inference + evaluation-table tests."""
import numpy as np
import pytest

from deep3dpointclouddenoising_tpu.data.offset_dataset import OffsetDataset
from deep3dpointclouddenoising_tpu.data.synthetic import make_icosphere
from deep3dpointclouddenoising_tpu.evaluate import (
    chamfer_ratio_table, performance_table)
from deep3dpointclouddenoising_tpu.infer import (
    denoise_clouds, predict_offsets_voting)


@pytest.fixture(scope="module")
def test_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shapes_test"))
    return OffsetDataset(
        root, "qualitative_test", in_radius=0.4, num_points=128,
        num_steps=4, num_epochs=1, noise_type="gaussian", noise_level=5e-3,
        num_points_per_shape=2000, outlier_proportion=0.0, seed=0,
        sample_dl_patches=0.3,
        shapes={"qualitative_test/sphere": make_icosphere(2)})


def test_voting_covers_every_point(test_dataset):
    # patch centers grid-cover the shape; with in_radius 0.4 on a unit
    # sphere every point lands in at least one patch
    def zero_pred(batch):
        return np.zeros(batch["points"].shape[:2] + (3,), np.float32)

    votes = predict_offsets_voting(zero_pred, test_dataset, batch_size=2)
    assert len(votes) == 1
    assert votes[0].shape == (2000, 3)


def test_oracle_predictor_denoises(test_dataset):
    # feed the ground-truth offsets back as "predictions": the vote-average
    # must reconstruct (near-)clean clouds
    ds = test_dataset

    def oracle(batch):
        return batch["offsets"]

    results = denoise_clouds(oracle, ds, batch_size=2)
    res = results[0]
    gt_denoised = ds.shapes[0].points + ds.shapes[0].offsets
    covered = np.linalg.norm(res["offsets"], axis=1) > 0
    # vote-averaging identical GT votes is exact where covered
    err = np.linalg.norm(res["denoised"][covered] - gt_denoised[covered],
                         axis=1)
    assert np.max(err) < 1e-4


def test_device_nn_dists_matches_kdtree(rng):
    """The on-device MXU brute-force NN distances must reproduce the host
    KD-tree path to float noise (identical offline tables both ways),
    including the chunk-padding tail."""
    from deep3dpointclouddenoising_tpu.evaluate import (
        _nn_dists, _nn_dists_device, chamfer_ratio_table)

    x = rng.random((1003, 3), dtype=np.float32)  # not a multiple of chunk
    y = rng.random((777, 3), dtype=np.float32)
    # the matmul form x2+y2-2xy cancels catastrophically only at ~1e-6
    # absolute — tables are identical to that noise
    np.testing.assert_allclose(_nn_dists_device(x, y, chunk=256),
                               _nn_dists(x, y), rtol=1e-3, atol=1e-4)

    clean = [rng.random((500, 3), dtype=np.float32)]
    noisy = [clean[0] + rng.normal(size=(500, 3)).astype(np.float32) * 0.01]
    den = [clean[0] + rng.normal(size=(500, 3)).astype(np.float32) * 0.001]
    host = chamfer_ratio_table(clean, noisy, den, names=["s"])
    dev = chamfer_ratio_table(clean, noisy, den, names=["s"], device=True)
    assert dev["s"]["ratio"] == pytest.approx(host["s"]["ratio"], rel=1e-4)


def test_chamfer_ratio_table_improvement(rng):
    clean = [rng.random((500, 3), dtype=np.float32)]
    noisy = [clean[0] + rng.normal(size=(500, 3)).astype(np.float32) * 0.01]
    denoised = [clean[0] + rng.normal(size=(500, 3)).astype(np.float32)
                * 0.001]
    table = chamfer_ratio_table(clean, noisy, denoised, names=["s"])
    assert table["s"]["ratio"] < 0.2
    assert table["mean"]["ratio"] == pytest.approx(table["s"]["ratio"])


def test_performance_table(rng):
    clean = [rng.random((400, 3), dtype=np.float32)]
    noisy = [np.concatenate([clean[0][:360],
                             clean[0][:40] + 0.5])]  # 10% far outliers
    table = performance_table(clean, noisy)
    assert table["shape_0"]["outlier_ratio"] == pytest.approx(0.1, abs=0.02)
    assert table["mean"]["noise_ratio"] < 0.1


def test_pcn_voting_inference(tmp_path, rng):
    from deep3dpointclouddenoising_tpu.infer import denoise_clouds_pcn

    ds = OffsetDataset(
        str(tmp_path), "qualitative_test", in_radius=0.4, num_points=64,
        num_steps=4, num_epochs=1, noise_type="gaussian", noise_level=5e-3,
        num_points_per_shape=500, outlier_proportion=0.0, seed=0,
        architecture="PCN",
        shapes={"qualitative_test/sphere": make_icosphere(2)})
    # PCN test split enumerates every cloud point
    assert len(ds) == 500

    shape = ds.shapes[0]

    def oracle(points):
        # per-patch ground truth offset of the center point; centers come in
        # dataset order, but read it from the patch geometry instead:
        # slot 0 of each patch is the center, points are center-relative
        batch = points.shape[0]
        out = np.zeros((batch, 3), np.float32)
        return out  # zero prediction keeps clouds unchanged

    res = denoise_clouds_pcn(oracle, ds, batch_size=50)
    assert len(res) == 1
    np.testing.assert_allclose(res[0]["denoised"], shape.points)


def test_masked_upsample_modes(rng):
    import jax.numpy as jnp
    from deep3dpointclouddenoising_tpu.models.heads import masked_upsample
    from deep3dpointclouddenoising_tpu.models.pyramid import _neighborhood

    fine = jnp.asarray(rng.random((1, 32, 3), dtype=np.float32))
    coarse = fine[:, :8]
    ones_f = jnp.ones((1, 32), jnp.float32)
    ones_c = jnp.ones((1, 8), jnp.float32)
    nbr = _neighborhood(fine, coarse, ones_f, ones_c, radius=2.0, nsample=4)
    feats = jnp.asarray(rng.normal(size=(1, 8, 6)).astype(np.float32))

    up_max = masked_upsample(feats, nbr, mode="max", nsample=4)
    assert up_max.shape == (1, 32, 6)
    # radius covers everything -> max over (up to) 4 nearest coarse feats
    up_rbf = masked_upsample(feats, nbr, mode="rbf", nsample=4)
    assert up_rbf.shape == (1, 32, 6)
    assert np.all(np.isfinite(np.asarray(up_rbf)))


def test_norm_predict_fn_scales_offsets_only():
    """make_predict_fn(norm_factor=f) must equal f * model(x/f) on the
    offset channels and leave a 4th (outlierness) channel unscaled."""
    import jax
    from deep3dpointclouddenoising_tpu.config import default_config
    from deep3dpointclouddenoising_tpu.infer import make_predict_fn
    from deep3dpointclouddenoising_tpu.models import (
        build_complete_denoising)

    cfg = default_config()
    cfg.num_points = 32
    cfg.width = 16
    cfg.depth = 1
    cfg.radius = 0.2
    cfg.sampleDl = 0.1
    cfg.nsamples = [4, 4, 4, 4, 4]
    cfg.npoints = [8, 4, 2, 1]
    cfg.local_aggregation_type = "pseudo_grid"
    model, _ = build_complete_denoising(cfg)

    rng = np.random.default_rng(0)
    pts = rng.random((2, 32, 3)).astype(np.float32) * 0.1
    mask = np.ones((2, 32), np.float32)
    batch = {"points": pts, "mask": mask, "features": pts.copy()}
    variables = model.init(jax.random.PRNGKey(0), pts, mask, pts,
                           train=False)

    f = 0.0005
    plain = make_predict_fn(model, variables)
    normed = make_predict_fn(model, variables, norm_factor=f)
    # normed on real-scale patches == f * plain on training-scale patches
    train_scale = {"points": pts / f, "mask": mask, "features": pts / f}
    want = np.asarray(plain(train_scale))
    got = np.asarray(normed(batch))
    np.testing.assert_allclose(got[..., :3], f * want[..., :3],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got[..., 3], want[..., 3],
                               rtol=1e-4, atol=1e-5)


def test_multi_vote_offset_equivariance(test_dataset):
    """Augmented voting rotates patches and un-rotates predictions; for a
    rotation-equivariant predictor (pred = c * points) every vote round
    agrees, so 3 votes == 1 vote exactly."""
    def equivariant(batch):
        return 0.1 * np.asarray(batch["points"], np.float32)

    one = predict_offsets_voting(equivariant, test_dataset, batch_size=2,
                                 num_votes=1)
    three = predict_offsets_voting(equivariant, test_dataset, batch_size=2,
                                   num_votes=3)
    np.testing.assert_allclose(three[0], one[0], rtol=1e-5, atol=1e-6)


def test_multi_vote_fourier_features_recomputed(tmp_path_factory):
    """Vote rounds rotate the patch; Fourier features must be recomputed
    from the ROTATED points (voting on features of the unrotated geometry
    silently corrupts the average)."""
    from deep3dpointclouddenoising_tpu.data.offset_dataset import \
        fourier_input_mapping

    root = str(tmp_path_factory.mktemp("shapes_fourier"))
    ds = OffsetDataset(
        root, "qualitative_test", in_radius=0.4, num_points=128,
        num_steps=4, num_epochs=1, noise_type="gaussian", noise_level=5e-3,
        num_points_per_shape=1000, outlier_proportion=0.0, seed=0,
        sample_dl_patches=0.3, fourier_features=True,
        shapes={"qualitative_test/sphere": make_icosphere(2)})

    seen = []

    def checking(batch):
        seen.append(np.max(np.abs(
            batch["features"]
            - fourier_input_mapping(batch["points"], ds.fourier_B))))
        return 0.1 * np.asarray(batch["points"], np.float32)

    predict_offsets_voting(checking, ds, batch_size=2, num_votes=3)
    assert seen and max(seen) < 1e-5


def test_multi_vote_unknown_features_rejected(test_dataset):
    """Non-Fourier multi-dim features cannot be re-derived for a rotated
    patch — voting must refuse instead of feeding inconsistent inputs."""
    def pred(batch):
        return 0.1 * np.asarray(batch["points"], np.float32)

    def widen(batch):
        return dict(batch, features=np.concatenate(
            [batch["features"], batch["features"]], axis=-1))

    class WideLoader:
        pass

    # wrap the dataset's batches with 6-dim features via a patched loader
    import deep3dpointclouddenoising_tpu.infer as infer_mod
    orig = infer_mod.BatchLoader

    class PatchedLoader(orig):
        def epoch_iter(self, e):
            for b in super().epoch_iter(e):
                yield widen(b)

    infer_mod.BatchLoader = PatchedLoader
    try:
        with pytest.raises(NotImplementedError):
            predict_offsets_voting(pred, test_dataset, batch_size=2,
                                   num_votes=2)
    finally:
        infer_mod.BatchLoader = orig


def test_multi_vote_full_cleaning_physical_offsets(test_dataset):
    """Full-cleaning voting averages PHYSICAL (tanh'd) offsets: for a
    predictor whose physical offset is rotation-equivariant
    (logits = arctanh(0.1*points)), 3 votes must equal 1 vote exactly.
    Un-rotating raw pre-tanh logits would break this (tanh does not
    commute with rotation)."""
    def pred(batch):
        pts = np.asarray(batch["points"], np.float32)
        off = np.clip(0.1 * pts, -0.99, 0.99)
        logits = np.arctanh(off)
        outl = np.full(pts.shape[:2] + (1,), -2.0, np.float32)
        return np.concatenate([logits, outl], axis=-1)

    one = predict_offsets_voting(pred, test_dataset, batch_size=2,
                                 num_votes=1, num_outputs=4,
                                 tanh_offsets=True)
    three = predict_offsets_voting(pred, test_dataset, batch_size=2,
                                   num_votes=3, num_outputs=4,
                                   tanh_offsets=True)
    np.testing.assert_allclose(three[0], one[0], rtol=1e-5, atol=1e-6)
    # offsets are physical (tanh applied before averaging): bounded by the
    # 0.1 * |centered patch coords| scale, far below the raw-logit scale
    assert np.all(np.abs(one[0][:, :3]) <= 0.1 * 1.001)


def test_estimate_noise_sigma_recovers_scale(rng):
    # a densely-sampled sphere with per-axis gaussian noise: the local
    # plane-residual estimate must recover sigma within tens of percent
    # and order the regimes correctly (the router only needs the ordering)
    from deep3dpointclouddenoising_tpu.evaluate import estimate_noise_sigma

    u = rng.standard_normal((60000, 3))
    surface = 0.5 * u / np.linalg.norm(u, axis=1, keepdims=True)
    estimates = {}
    for sigma in (0.001, 0.005):
        noisy = surface + sigma * rng.standard_normal(surface.shape)
        estimates[sigma] = estimate_noise_sigma(noisy, seed=1)
    assert estimates[0.005] == pytest.approx(0.005, rel=0.4)
    assert estimates[0.001] < 0.002 < estimates[0.005]


def test_routed_predictor_selects_per_cloud(test_dataset):
    # clouds routed LOW get predict_lo's output, others predict_hi's —
    # verified through the full voting pipeline
    from deep3dpointclouddenoising_tpu.infer import make_routed_predict_fn

    def hi(batch):
        return np.ones(batch["points"].shape[:2] + (3,), np.float32)

    def lo(batch):
        return -np.ones(batch["points"].shape[:2] + (3,), np.float32)

    for route, want in ((np.array([True]), -1.0), (np.array([False]), 1.0)):
        routed = make_routed_predict_fn(hi, lo, route)
        votes = predict_offsets_voting(routed, test_dataset, batch_size=2)
        covered = np.abs(votes[0]).max(axis=1) > 0
        assert covered.any()
        np.testing.assert_allclose(votes[0][covered], want, atol=1e-6)


def test_chunked_voting_matches_per_batch(test_dataset):
    """The scan-batched voting loop (predict_offsets_voting_chunked) must
    reproduce the per-batch path exactly — same vote rounds, same
    rotations (shared rng_seed stream), ragged tail padded not scattered.
    chunk_steps=3 does not divide the batch count, exercising the pad."""
    from deep3dpointclouddenoising_tpu.infer import \
        predict_offsets_voting_chunked

    def equivariant(batch):
        return 0.1 * np.asarray(batch["points"], np.float32)

    def equivariant_chunk(stacked):
        return 0.1 * np.asarray(stacked["points"], np.float32)

    for votes, bs in ((1, 2), (3, 2), (1, 3)):
        # bs=3: the patch count is not divisible, exercising the ragged
        # final BATCH (zero-mask row padding) as well as the ragged chunk
        ref = predict_offsets_voting(equivariant, test_dataset,
                                     batch_size=bs, num_votes=votes)
        got = predict_offsets_voting_chunked(
            equivariant_chunk, test_dataset, batch_size=bs,
            num_votes=votes, chunk_steps=3)
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-5, atol=1e-6)


def test_chunk_predict_fn_matches_per_batch_model():
    """make_chunk_predict_fn's lax.scan forward must equal the per-batch
    jitted forward on every step of a stacked chunk, including the
    norm_factor scaling split (offsets scaled, outlierness channel not)."""
    import jax
    from deep3dpointclouddenoising_tpu.config import default_config
    from deep3dpointclouddenoising_tpu.infer import (make_chunk_predict_fn,
                                                     make_predict_fn)
    from deep3dpointclouddenoising_tpu.models import build_complete_denoising

    cfg = default_config()
    cfg.num_points = 32
    cfg.width = 16
    cfg.depth = 1
    cfg.radius = 0.2
    cfg.sampleDl = 0.1
    cfg.nsamples = [4, 4, 4, 4, 4]
    cfg.npoints = [8, 4, 2, 1]
    cfg.local_aggregation_type = "pseudo_grid"
    model, _ = build_complete_denoising(cfg)

    rng = np.random.default_rng(0)
    pts = rng.random((3, 2, 32, 3)).astype(np.float32) * 0.1
    mask = np.ones((3, 2, 32), np.float32)
    variables = model.init(jax.random.PRNGKey(0), pts[0], mask[0], pts[0],
                           train=False)
    f = 0.0005
    per_batch = make_predict_fn(model, variables, norm_factor=f)
    chunked = make_chunk_predict_fn(model, variables, norm_factor=f)
    stacked = {"points": pts, "mask": mask, "features": pts.copy()}
    got = np.asarray(chunked(stacked))
    assert got.shape[:2] == (3, 2)
    for s in range(3):
        want = np.asarray(per_batch(
            {"points": pts[s], "mask": mask[s], "features": pts[s]}))
        np.testing.assert_allclose(got[s], want, rtol=1e-4, atol=1e-6)


def test_chunked_routing_selects_per_cloud(test_dataset):
    """Checkpoint routing folded into the chunk scan: routed clouds keep
    the low-noise weights' predictions through the full chunked voting
    pipeline."""
    import jax
    from deep3dpointclouddenoising_tpu.config import default_config
    from deep3dpointclouddenoising_tpu.infer import (
        denoise_clouds, make_chunk_predict_fn, make_predict_fn,
        make_routed_predict_fn)
    from deep3dpointclouddenoising_tpu.models import build_offset_regression

    cfg = default_config()
    cfg.num_points = 128
    cfg.width = 16
    cfg.depth = 1
    cfg.radius = 0.2
    cfg.sampleDl = 0.1
    cfg.nsamples = [4, 4, 4, 4, 4]
    cfg.npoints = [32, 16, 8, 4]
    cfg.local_aggregation_type = "pseudo_grid"
    cfg.head = "offset_reg_head"
    model, _ = build_offset_regression(cfg)
    s0 = test_dataset.get(0)
    variables_hi = model.init(jax.random.PRNGKey(0), s0["points"][None],
                              s0["mask"][None], s0["features"][None],
                              train=False)
    variables_lo = model.init(jax.random.PRNGKey(7), s0["points"][None],
                              s0["mask"][None], s0["features"][None],
                              train=False)
    route = np.array([True])

    ref = denoise_clouds(make_routed_predict_fn(
        make_predict_fn(model, variables_hi),
        make_predict_fn(model, variables_lo), route),
        test_dataset, batch_size=2)
    got = denoise_clouds(make_chunk_predict_fn(
        model, variables_hi, variables_lo=variables_lo, route_low=route),
        test_dataset, batch_size=2, chunk_steps=2)
    np.testing.assert_allclose(got[0]["offsets"], ref[0]["offsets"],
                               rtol=1e-4, atol=1e-6)
