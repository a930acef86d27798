"""Device-resident patch sampler: host-equivalence of the extraction
geometry, augmentation invariants, and the fused sample+train scan."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.config import default_config
from deep3dpointclouddenoising_tpu.data.device_sampler import (
    DeviceSampler, build_sampled_train_chunk)
from deep3dpointclouddenoising_tpu.data.offset_dataset import OffsetDataset
from deep3dpointclouddenoising_tpu.data.synthetic import (
    make_icosphere, make_torus)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    shapes = {"sphere": make_icosphere(2), "torus": make_torus(12, 8)}
    root = str(tmp_path_factory.mktemp("devsampler"))
    return OffsetDataset(root, "train", in_radius=0.3, num_points=64,
                         num_steps=8, num_epochs=2,
                         num_points_per_shape=3000, noise_type="gaussian",
                         noise_level=0.005, shapes=shapes, seed=0)


def make_cfg(num_points=64, in_radius=0.3, jitter=0):
    cfg = default_config()
    cfg.num_points = num_points
    cfg.in_radius = in_radius
    cfg.jitter = jitter
    cfg.z_angle_range = np.pi
    cfg.augment_symmetries = [1, 0, 0]
    cfg.scale_low = 1.0
    cfg.scale_high = 1.0
    cfg.noise_std = 1e-5
    cfg.noise_clip = 1e-4
    return cfg


def _rows_sorted(a):
    a = np.asarray(a)
    return a[np.lexsort(a.T)]


def test_sample_matches_host_geometry(dataset):
    """Un-augmented device patches contain exactly the host patches' point
    sets: same center in slot 0, same mask count, same coordinate rows."""
    cfg = make_cfg()
    sampler = DeviceSampler(dataset, cfg)
    data = sampler.cloud_data()
    centers = sampler.centers(0, batch_size=4)[0]  # (4, 2)
    batch = jax.device_get(sampler.sample(
        data, jnp.asarray(centers), jax.random.PRNGKey(0), augment=False))

    for b in range(4):
        idx_in_table = b  # step 0, element b -> table entry b
        host = dataset.get(idx_in_table, 0)
        # slot 0 is the picked center (relative coords = 0)
        np.testing.assert_allclose(batch["points"][b, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(host["points"][0], 0.0, atol=1e-6)
        assert float(batch["mask"][b].sum()) == float(host["mask"].sum())
        m = host["mask"] > 0
        dm = np.asarray(batch["mask"][b]) > 0
        np.testing.assert_allclose(
            _rows_sorted(np.asarray(batch["points"][b])[dm]),
            _rows_sorted(host["points"][m]), atol=1e-5)
        np.testing.assert_allclose(
            _rows_sorted(np.asarray(batch["offsets"][b])[dm]),
            _rows_sorted(host["offsets"][m]), atol=1e-5)


def test_sample_pad_semantics(dataset):
    """num_points larger than the neighborhood: mask marks the real prefix,
    padding slots repeat real neighbors (host pad-by-cycling contract)."""
    cfg = make_cfg(num_points=256, in_radius=0.08)
    sampler = DeviceSampler(dataset, cfg)
    sampler_small = sampler
    data = sampler_small.cloud_data()
    centers = sampler_small.centers(0, batch_size=2)[0]
    batch = jax.device_get(sampler_small.sample(
        data, jnp.asarray(centers), jax.random.PRNGKey(1), augment=False))
    mask = np.asarray(batch["mask"])
    assert 0 < mask.sum() < mask.size  # genuinely padded
    for b in range(2):
        cur = int(mask[b].sum())
        assert np.all(mask[b, :cur] == 1) and np.all(mask[b, cur:] == 0)
        real = np.asarray(batch["points"][b][: cur])
        pads = np.asarray(batch["points"][b][cur:])
        # every pad row equals some real row
        d = np.abs(pads[:, None, :] - real[None, :, :]).sum(-1).min(1)
        assert d.max() < 1e-6
        # all real rows inside the query radius
        assert np.linalg.norm(real, axis=1).max() <= cfg.in_radius + 1e-5


def test_augmentation_invariants(dataset):
    """Rotation-only augmentation preserves per-point distances to the
    center and rotates points and offsets jointly."""
    cfg = make_cfg(jitter=0)
    sampler = DeviceSampler(dataset, cfg)
    data = sampler.cloud_data()
    centers = jnp.asarray(sampler.centers(0, batch_size=2)[0])
    plain = jax.device_get(sampler.sample(data, centers,
                                          jax.random.PRNGKey(2),
                                          augment=False))
    aug = jax.device_get(sampler.sample(data, centers,
                                        jax.random.PRNGKey(2),
                                        augment=True))
    np.testing.assert_array_equal(plain["mask"], aug["mask"])
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(aug["points"]), axis=-1),
        np.linalg.norm(np.asarray(plain["points"]), axis=-1), atol=1e-5)
    # joint rotation preserves <point, offset>
    np.testing.assert_allclose(
        np.sum(np.asarray(aug["points"]) * np.asarray(aug["offsets"]), -1),
        np.sum(np.asarray(plain["points"]) * np.asarray(plain["offsets"]),
               -1), atol=1e-6)


def test_sampled_train_chunk(dataset):
    """The fused on-device sample+train scan runs and descends."""
    from deep3dpointclouddenoising_tpu.models import build_offset_regression
    from deep3dpointclouddenoising_tpu.parallel.mesh import make_mesh
    from deep3dpointclouddenoising_tpu.train import Trainer

    cfg = make_cfg()
    cfg.width = 16
    cfg.depth = 2
    cfg.radius = 0.1
    cfg.sampleDl = 0.03
    cfg.nsamples = [8, 8, 8, 8, 8]
    cfg.npoints = [16, 8, 4, 2]
    cfg.local_aggregation_type = "pseudo_grid"
    cfg.head = "offset_reg_head"
    cfg.loss = "L1"
    cfg.optimizer = "adam"
    cfg.base_learning_rate = 1e-3
    cfg.lr_scheduler = "step"
    cfg.warmup_epoch = -1
    cfg.epochs = 2
    cfg.batch_size = 4

    sampler = DeviceSampler(dataset, cfg)
    data = sampler.cloud_data()
    model, loss_fn = build_offset_regression(cfg)
    trainer = Trainer(cfg, model, loss_fn, 2, mesh=make_mesh(1))

    centers = sampler.centers(0, batch_size=4)  # (2, 4, 2)
    example = jax.device_get(sampler.sample(
        data, jnp.asarray(centers[0]), jax.random.PRNGKey(0)))
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    step_fn = build_sampled_train_chunk(trainer, sampler)
    state, losses = step_fn(state, jnp.asarray(centers),
                            data, jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(losses)))
    assert int(state.step) == 2


class _LinearModel:
    """Mock predictor: a deterministic function of patch coordinates, so
    host and device voting must agree exactly (patch sets are identical;
    ordering and padding must not matter)."""

    def apply(self, variables, points, mask, features, train=False):
        return points * 2.0 + 0.125


def test_device_voting_matches_host(tmp_path):
    from deep3dpointclouddenoising_tpu.infer import (
        denoise_clouds, predict_offsets_voting_device)

    shapes = {"sphere": make_icosphere(2), "torus": make_torus(10, 6)}
    ds = OffsetDataset(str(tmp_path), "qualitative_test", in_radius=0.4,
                       num_points=64, num_steps=1, num_epochs=1,
                       num_points_per_shape=1500, noise_type="gaussian",
                       noise_level=0.005, shapes=shapes, seed=0,
                       sample_dl_patches=0.4)
    cfg = make_cfg(num_points=64, in_radius=0.4)
    model = _LinearModel()

    host = denoise_clouds(lambda b: jnp.asarray(b["points"]) * 2.0 + 0.125,
                          ds, batch_size=4)
    dev = predict_offsets_voting_device(model, {}, cfg, ds, batch_size=4)
    for h, d in zip(host, dev):
        assert h["offsets"].shape == d.shape
        np.testing.assert_allclose(h["offsets"], d, atol=2e-4)


def test_device_voting_real_model(tmp_path):
    """End-to-end smoke with the real U-Net: finite averaged offsets for
    every cloud point."""
    from deep3dpointclouddenoising_tpu.infer import denoise_clouds_device
    from deep3dpointclouddenoising_tpu.models import build_offset_regression

    shapes = {"sphere": make_icosphere(2)}
    ds = OffsetDataset(str(tmp_path), "qualitative_test", in_radius=0.4,
                       num_points=64, num_steps=1, num_epochs=1,
                       num_points_per_shape=1000, noise_type="gaussian",
                       noise_level=0.005, shapes=shapes, seed=0,
                       sample_dl_patches=0.4)
    cfg = make_cfg(num_points=64, in_radius=0.4)
    cfg.width = 16
    cfg.depth = 2
    cfg.radius = 0.15
    cfg.sampleDl = 0.04
    cfg.nsamples = [8, 8, 8, 8, 8]
    cfg.npoints = [16, 8, 4, 2]
    cfg.local_aggregation_type = "pseudo_grid"
    cfg.head = "offset_reg_head"
    cfg.loss = "L1"
    model, _ = build_offset_regression(cfg)
    sample = ds.get(0)
    variables = model.init(jax.random.PRNGKey(0), sample["points"][None],
                           sample["mask"][None], sample["features"][None],
                           train=False)
    results = denoise_clouds_device(model, variables, cfg, ds, batch_size=4)
    assert len(results) == 1
    off = results[0]["offsets"]
    assert off.shape == (1000, 3)
    assert np.all(np.isfinite(off))


def test_device_pcn_matches_host(tmp_path):
    """Device PCN scan equals the host per-patch loop under a deterministic
    mock (same patch sets; PCN writes each center's own prediction)."""
    from deep3dpointclouddenoising_tpu.infer import (
        denoise_clouds_pcn, denoise_clouds_pcn_device)

    shapes = {"sphere": make_icosphere(1)}
    ds = OffsetDataset(str(tmp_path), "qualitative_test", in_radius=2.5,
                       num_points=48, num_steps=1, num_epochs=1,
                       num_points_per_shape=300, noise_type="gaussian",
                       noise_level=0.005, shapes=shapes, seed=0,
                       architecture="PCN", sample_dl_patches=2.5)
    cfg = make_cfg(num_points=48, in_radius=2.5)
    cfg.loss = "L1"
    cfg.batch_size = 16

    class _MeanModel:
        def apply(self, variables, points, train=False):
            pred = jnp.mean(points, axis=1) * 2.0
            trans = jnp.broadcast_to(jnp.eye(3),
                                     (points.shape[0], 3, 3))
            return pred, trans, None

    host = denoise_clouds_pcn(
        lambda pts: np.asarray(jnp.mean(jnp.asarray(pts), axis=1) * 2.0),
        ds, batch_size=16)
    # chunk_steps=4 forces the multi-dispatch path (300 patches / batch 16
    # = 19 steps -> 5 chunks incl. a padded final one); the relay-facing
    # default (128) reduces to a single chunk on this tiny cloud
    dev = denoise_clouds_pcn_device(_MeanModel(), {}, cfg, ds,
                                    batch_size=16, chunk_steps=4)
    np.testing.assert_allclose(host[0]["offsets"], dev[0]["offsets"],
                               atol=1e-5)


def test_device_voting_multivote_unrotation(tmp_path):
    """On-device augmentation votes: an oracle that returns the batch's own
    (rotated) gt offsets must vote-average back to the UNROTATED gt — pins
    the rotate -> predict -> un-rotate -> accumulate chain across rounds."""
    from deep3dpointclouddenoising_tpu.infer import \
        predict_offsets_voting_device

    shapes = {"sphere": make_icosphere(2)}
    ds = OffsetDataset(str(tmp_path), "qualitative_test", in_radius=0.4,
                       num_points=64, num_steps=1, num_epochs=1,
                       num_points_per_shape=1000, noise_type="gaussian",
                       noise_level=0.005, shapes=shapes, seed=0,
                       sample_dl_patches=0.4)
    cfg = make_cfg(num_points=64, in_radius=0.4)

    def oracle(variables, batch):
        return batch["offsets"]

    votes = predict_offsets_voting_device(None, {}, cfg, ds, batch_size=4,
                                          num_votes=3, apply_fn=oracle)
    gt = ds.shapes[0].offsets
    covered = np.abs(votes[0]).max(axis=1) > 0
    assert covered.sum() > 500
    np.testing.assert_allclose(votes[0][covered], gt[covered], atol=5e-5)


def test_device_voting_multivote_fourier(tmp_path):
    """Fourier features are recomputed from the rotated patch inside the
    vote scan (compile + oracle correctness)."""
    from deep3dpointclouddenoising_tpu.infer import \
        predict_offsets_voting_device

    shapes = {"sphere": make_icosphere(2)}
    ds = OffsetDataset(str(tmp_path), "qualitative_test", in_radius=0.4,
                       num_points=64, num_steps=1, num_epochs=1,
                       num_points_per_shape=1000, noise_type="gaussian",
                       noise_level=0.005, shapes=shapes, seed=0,
                       sample_dl_patches=0.4, fourier_features=True)
    cfg = make_cfg(num_points=64, in_radius=0.4)
    cfg.fourier_features = 1

    def oracle(variables, batch):
        # consume the features so the fourier recompute is in the graph
        return batch["offsets"] + 0.0 * batch["features"][..., :3]

    votes = predict_offsets_voting_device(None, {}, cfg, ds, batch_size=4,
                                          num_votes=2, apply_fn=oracle)
    gt = ds.shapes[0].offsets
    covered = np.abs(votes[0]).max(axis=1) > 0
    np.testing.assert_allclose(votes[0][covered], gt[covered], atol=5e-5)


def test_segment_sums_sorted_oracle(rng):
    """The scatter-free sort+prefix-sum vote reduction must equal a numpy
    scatter-add oracle, including zero-weight rows and empty keys."""
    from deep3dpointclouddenoising_tpu.infer import _segment_sums_sorted

    T, C, K = 5000, 4, 700
    keys = rng.integers(0, K, T).astype(np.int32)
    vals = rng.standard_normal((T, C)).astype(np.float32)
    w = (rng.random(T) > 0.3).astype(np.float32)
    sums, counts = jax.jit(
        lambda k, v, ww: _segment_sums_sorted(k, v, ww, K))(keys, vals, w)
    want_s = np.zeros((K, C), np.float64)
    want_c = np.zeros((K,), np.float64)
    np.add.at(want_s, keys, vals * w[:, None])
    np.add.at(want_c, keys, w)
    np.testing.assert_allclose(np.asarray(sums), want_s, atol=2e-3)
    np.testing.assert_allclose(np.asarray(counts)[:, 0], want_c, atol=1e-5)


def test_device_full_cleaning_matches_host(tmp_path):
    """clean_clouds_device == clean_clouds under a deterministic 4-dim
    mock (tanh'd physical offsets + sigmoid outlierness threshold)."""
    from deep3dpointclouddenoising_tpu.infer import (clean_clouds,
                                                     clean_clouds_device)

    shapes = {"sphere": make_icosphere(2)}
    ds = OffsetDataset(str(tmp_path), "qualitative_test", in_radius=0.4,
                       num_points=64, num_steps=1, num_epochs=1,
                       num_points_per_shape=1200, noise_type="gaussian",
                       noise_level=0.005, shapes=shapes, seed=0,
                       sample_dl_patches=0.4)
    cfg = make_cfg(num_points=64, in_radius=0.4)

    class _Mock4:
        def apply(self, variables, points, mask, features, train=False):
            out = jnp.tanh(points) * 0.01
            outl = jnp.sum(points, axis=-1, keepdims=True) * 5.0
            return jnp.concatenate([out, outl], axis=-1)

    def host_pred(batch):
        pts = jnp.asarray(batch["points"])
        return np.asarray(jnp.concatenate(
            [jnp.tanh(pts) * 0.01,
             jnp.sum(pts, axis=-1, keepdims=True) * 5.0], axis=-1))

    host = clean_clouds(host_pred, ds, batch_size=4)
    dev = clean_clouds_device(_Mock4(), {}, cfg, ds, batch_size=4)
    np.testing.assert_allclose(dev[0]["offsets"], host[0]["offsets"],
                               atol=2e-4)
    np.testing.assert_allclose(dev[0]["outlier_prob"],
                               host[0]["outlier_prob"], atol=2e-4)
    assert (dev[0]["keep"] == host[0]["keep"]).mean() > 0.995
