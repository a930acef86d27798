"""Device-resident patch sampling: extract training patches ON the TPU.

The reference's input pipeline assembles every patch on the host (KDTree
radius query + pad/shuffle + numpy augmentation, offset_dataset.py:598-733)
and ships ~320 KB per batch to the device.  On a high-latency host<->device
link that transfer — not compute — bounds the training loop (RESULTS.md
"host/link-bound").  TPU-native fix: upload each split's full noisy clouds
and ground-truth offsets ONCE (a few MB), and run patch extraction inside
the jitted train scan — per step the host sends only the (B, 2) int32
patch-center table entries.

Semantics mirror ``OffsetDataset.get`` (data/offset_dataset.py:291-368):

  * sorted-by-distance radius neighborhood around the picked center,
    truncated to the nearest ``num_points`` (host: query_radius_sorted +
    truncate);
  * the true center occupies slot 0, the remaining real neighbors appear
    in random order, padding slots cycle random real neighbors with
    mask = 0 (host: permutation + pad + center swap);
  * joint augmentation of [points; offsets]: random Euler rotation,
    anisotropic scale with axis symmetries, clipped gaussian jitter
    (data/transforms.py, itself mirroring data_utils.py:97-305) — jitter
    perturbs the offsets too, faithfully replicating the host stack;
  * features = patch coordinates, or Fourier features
    (offset_dataset.py:28-33).

Divergences (documented): ties in the distance sort may resolve
differently than the host KDTree, and the augmentation consumes JAX
RNG instead of numpy Generator streams — per-patch geometry is
identical in distribution, not bitwise.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD_COORD = 1.0e9  # padded cloud rows live "at infinity"


class DeviceSampler:
    """Builds the device-resident cloud tensors + the jittable sampler.

    ``cloud_data`` (returned by :meth:`cloud_data`) is passed back into the
    jitted functions as an ARGUMENT pytree — never closed over — so the
    multi-MB cloud tensors stay out of the compiled executable and the jit
    cache key.
    """

    def __init__(self, dataset, cfg):
        shapes = dataset.shapes
        if not shapes:
            raise ValueError("dataset has no shapes")
        self.num_points = int(cfg.num_points)
        self.in_radius = float(cfg.in_radius)
        # augmentation config (build_train_transforms)
        self.angle_ranges = (float(cfg.x_angle_range),
                             float(cfg.y_angle_range),
                             float(cfg.z_angle_range))
        self.jitter = bool(cfg.jitter)
        self.scale_low = float(cfg.scale_low)
        self.scale_high = float(cfg.scale_high)
        self.noise_std = float(cfg.noise_std)
        self.noise_clip = float(cfg.noise_clip)
        self.augment_symmetries = tuple(float(s)
                                        for s in cfg.augment_symmetries)
        self.norm_factor = (self.in_radius / 100.0) if cfg.norm else None

        max_n = max(len(s.points) for s in shapes)
        n = len(shapes)
        pts = np.full((n, max_n, 3), PAD_COORD, np.float32)
        offs = np.zeros((n, max_n, 3), np.float32)
        labels = np.zeros((n, max_n), np.int32)
        for i, s in enumerate(shapes):
            k = len(s.points)
            pts[i, :k] = s.points
            offs[i, :k] = s.offsets
            labels[i, :k] = s.labels
        data = {"points": pts, "offsets": offs, "labels": labels}
        fourier_b = getattr(dataset, "fourier_B", None)
        self.fourier = fourier_b is not None \
            and bool(getattr(cfg, "fourier_features", False))
        if self.fourier:
            data["fourier_B"] = np.asarray(fourier_b, np.float32)
        self._host_data = data
        # the per-(epoch,step) balanced center table stays host-built
        # (exact reference semantics, offset_dataset.py:515-537) — it is
        # tiny int data
        self.point_inds = np.asarray(dataset.point_inds, np.int32)
        self.cloud_inds = np.asarray(dataset.cloud_inds, np.int32)
        self.num_steps = int(dataset.num_steps)

    # -- host-side helpers ---------------------------------------------------
    def cloud_data(self) -> Dict[str, jax.Array]:
        """device_put the cloud tensors once; reuse the returned pytree."""
        return jax.device_put(self._host_data)

    def centers(self, epoch: int, batch_size: int,
                drop_last: bool = True) -> np.ndarray:
        """(steps, B, 2) int32 [cloud_ind, point_ind] for one epoch, read
        from the pre-sampled balanced table (same indexing as
        OffsetDataset.get: idx + epoch * num_steps, modulo table length)."""
        total = len(self.point_inds)
        steps = self.num_steps // batch_size if drop_last \
            else -(-self.num_steps // batch_size)
        idx = (np.arange(steps * batch_size) + epoch * self.num_steps) % total
        out = np.stack([self.cloud_inds[idx], self.point_inds[idx]],
                       axis=-1)
        return out.reshape(steps, batch_size, 2).astype(np.int32)

    # -- jittable sampling ---------------------------------------------------
    def _rotation(self, rng: jax.Array) -> jnp.ndarray:
        """Random Euler rotation Rz @ Ry @ Rx (transforms.py:46-62)."""
        kx, ky, kz = jax.random.split(rng, 3)
        rx, ry, rz = self.angle_ranges
        ax = jax.random.uniform(kx, (), minval=-rx, maxval=rx)
        ay = jax.random.uniform(ky, (), minval=-ry, maxval=ry)
        az = jax.random.uniform(kz, (), minval=-rz, maxval=rz)

        def rot(angle, axis):
            c, s = jnp.cos(angle), jnp.sin(angle)
            u = jnp.zeros(3).at[axis].set(1.0)
            cross = jnp.array([[0.0, -u[2], u[1]],
                               [u[2], 0.0, -u[0]],
                               [-u[1], u[0], 0.0]])
            return c * jnp.eye(3) + s * cross + (1 - c) * jnp.outer(u, u)

        return rot(az, 2) @ rot(ay, 1) @ rot(ax, 0)

    def _augment(self, points, offsets, rng):
        """Joint augmentation of [points; offsets] (offset_dataset stacks
        them so every transform, including jitter, hits both)."""
        k_rot, k_scale, k_sym, k_j1, k_j2 = jax.random.split(rng, 5)
        r = self._rotation(k_rot)
        points = points @ r.T
        offsets = offsets @ r.T
        if self.jitter:
            scale = jax.random.uniform(k_scale, (3,), minval=self.scale_low,
                                       maxval=self.scale_high)
            sym = jnp.round(jax.random.uniform(k_sym, (3,))) * 2.0 - 1.0
            aug = jnp.asarray(self.augment_symmetries)
            scale = scale * (sym * aug + (1.0 - aug))

            def jit_noise(key, shape):
                return jnp.clip(
                    jax.random.normal(key, shape) * self.noise_std,
                    -self.noise_clip, self.noise_clip)

            points = points * scale + jit_noise(k_j1, points.shape)
            offsets = offsets * scale + jit_noise(k_j2, offsets.shape)
        return points, offsets

    def _sample_one(self, data: Dict, center: jnp.ndarray, rng: jax.Array,
                    augment: bool) -> Dict[str, jnp.ndarray]:
        """Extract one patch for center = [cloud_ind, point_ind]."""
        np_, r2 = self.num_points, self.in_radius ** 2
        cloud = data["points"][center[0]]          # (maxN, 3)
        pick = cloud[center[1]]                    # (3,)
        d2 = jnp.sum((cloud - pick) ** 2, axis=-1)
        # make sure the designated center wins slot 0 even under ties
        d2 = d2.at[center[1]].set(-1.0)
        neg_d, idx = jax.lax.top_k(-d2, np_)       # nearest-first
        is_real = (-neg_d) <= r2                   # (np_,) prefix-true

        # host ordering: center in slot 0, other reals in random order,
        # pads = random real neighbors with mask 0 (offset_dataset.py:
        # 317-336).  Reals occupy the prefix after the sort below.
        cur = jnp.sum(is_real.astype(jnp.int32))
        k_perm, k_pad, k_aug = jax.random.split(rng, 3)
        keys = jax.random.uniform(k_perm, (np_ - 1,))
        keys = keys + jnp.where(is_real[1:], 0.0, 2.0)  # pads sort last
        order = jnp.argsort(keys) + 1              # positions into idx
        pad_pick = jax.random.randint(k_pad, (np_ - 1,), 0,
                                      jnp.maximum(cur, 1))
        slot = jnp.arange(1, np_)
        src = jnp.where(slot < cur, order, pad_pick)
        src = jnp.concatenate([jnp.zeros((1,), src.dtype), src])
        inds = idx[src]
        mask = (jnp.arange(np_) < cur).astype(jnp.float32)

        points = cloud[inds] - pick
        offsets = data["offsets"][center[0]][inds]
        labels = data["labels"][center[0]][inds]
        if augment:
            points, offsets = self._augment(points, offsets, k_aug)
        if self.fourier:
            proj = (2.0 * jnp.pi * points) @ data["fourier_B"].T
            feats = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        else:
            feats = points
        if self.norm_factor:  # train_dist.py:322-326 — the host loop
            # divides points/offsets/features AFTER feature computation
            points = points / self.norm_factor
            offsets = offsets / self.norm_factor
            feats = feats / self.norm_factor
        return {"points": points, "mask": mask, "features": feats,
                "labels": labels, "offsets": offsets,
                "cloud_ind": center[0].astype(jnp.int32),
                "input_inds": inds.astype(jnp.int32)}

    def sample(self, data: Dict, centers: jnp.ndarray, rng: jax.Array,
               augment: bool = True) -> Dict[str, jnp.ndarray]:
        """Jittable batch sampler: centers (B, 2) int32 -> batch dict."""
        keys = jax.random.split(rng, centers.shape[0])
        return jax.vmap(
            lambda c, k: self._sample_one(data, c, k, augment))(centers,
                                                                keys)


def build_sampled_train_chunk(trainer, sampler: DeviceSampler):
    """Jitted S-steps-per-dispatch train function whose per-step batches are
    sampled ON DEVICE: host sends only (S, B, 2) int32 centers per chunk.

    Returns step_chunk(state, centers_chunk, cloud_data, rng) ->
    (state, losses[S]).  Per-step keys fold on the global step counter;
    the sampling stream folds on a salted counter so batch content and
    dropout noise stay independent.
    """
    def _chunk(state, centers_chunk, data, rng):
        def body(st, centers):
            k_sample = jax.random.fold_in(
                jax.random.fold_in(rng, 0x5A17), st.step)
            batch = sampler.sample(data, centers, k_sample, augment=True)
            return trainer._train_step(
                st, batch, jax.random.fold_in(rng, st.step))

        return jax.lax.scan(body, state, centers_chunk)

    return jax.jit(_chunk, donate_argnums=(0,))
