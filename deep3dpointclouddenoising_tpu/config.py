"""Layered configuration system.

Mirrors the semantics of the reference config stack
(/root/reference/u_net_arch/utils/config.py:4-156): a single global default
table, YAML merge with *unknown-key rejection*, argparse-style overrides, and
the derived-geometry block that every reference entry script re-implements
(/root/reference/u_net_arch/train_dist.py:125-137 ==
evaluate_dist.py:106-118 == qualitative_inference_test.py:127-139).  Here the
derivation lives in exactly one place: :func:`derive_geometry`.
"""
from __future__ import annotations

import copy
import math
from typing import Any, Dict, Optional

import yaml


class Config:
    """Attribute/item-access config node (stand-in for easydict).

    Deliberately NOT a dict subclass: flax converts dict-typed module
    attributes into FrozenDict (losing attribute access), so models can take
    a ``cfg: Config`` field only if Config is an opaque object.  Hash/eq are
    identity-based, which keeps jit re-tracing sane when the same config
    object is reused.
    """

    def __init__(self, *args, **kwargs):
        object.__setattr__(self, "_data", {})
        for src in list(args) + [kwargs]:
            items = src.items() if isinstance(src, (dict, Config)) else src
            for k, v in items:
                self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict):
            value = Config(value)
        self._data[key] = value

    def __getitem__(self, key):
        return self._data[key]

    def __contains__(self, key):
        return key in self._data

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return object.__getattribute__(self, "_data")[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def items(self):
        return self._data.items()

    def keys(self):
        return self._data.keys()

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, Config) else v)
                for k, v in self._data.items()}

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def __repr__(self):
        return f"Config({self._data!r})"


def default_config() -> Config:
    """Default table with every key the reference defines.

    Key inventory mirrors /root/reference/u_net_arch/utils/config.py:9-142.
    """
    c = Config()
    # -- experiment ---------------------------------------------------------
    c.experiment_name = ""
    c.noise_level = -1.0
    c.outlier_percentage = -1.0
    c.epoch_model_used = -1
    c.loss = "L1"
    c.jitter = 0
    c.norm = 0
    c.GAN = 0
    # adversarial-loss weight (reference hardcodes ALPHA=0.01,
    # train_dist_GAN.py:44; configurable here because the right balance
    # depends on the task-loss scale of the training regime)
    c.gan_alpha = 0.01
    c.load_path_generator = ""
    c.load_path_discriminator = ""
    c.head_discriminator = "None"
    c.freeze_gen = 0
    c.architecture = "U-Net"
    c.noise_type = "gaussian"
    c.sample_Dl_patches = 0.05  # grid step used to pick test patch centers
    c.fourier_features = 0
    # -- training -----------------------------------------------------------
    c.epochs = 50
    c.start_epoch = 1
    c.base_learning_rate = 0.01
    c.lr_scheduler = "step"  # step | cosine | step_PCN
    c.optimizer = "sgd"  # sgd | adam | adamW
    c.warmup_epoch = 5
    c.warmup_multiplier = 100
    c.lr_decay_steps = 20
    c.lr_decay_rate = 0.7
    c.weight_decay = 0.0
    c.momentum = 0.9
    c.grid_clip_norm = -1
    c.grad_clip_norm = 10.0  # reference hard-codes clip_grad_norm_(10)
    # -- model --------------------------------------------------------------
    c.backbone = "resnet"
    c.head = "resnet_cls"
    c.radius = 0.05
    c.sampleDl = 0.02
    c.density_parameter = 5.0
    c.nsamples = []
    c.npoints = []
    c.width = 144
    c.depth = 2
    c.bottleneck_ratio = 2
    c.bn_momentum = 0.1  # torch convention: running = (1-m)*running + m*new
    # pallas kernels for hot ops: "auto" = on when running on TPU,
    # 0/1 force off/on (forced-on + CPU backend runs in interpret mode)
    c.use_pallas = "auto"
    # matmul compute dtype: float32 | bfloat16 (params and BatchNorm stay
    # float32; bfloat16 feeds the MXU at twice the rate)
    c.compute_dtype = "float32"
    # rematerialize encoder bottlenecks under autodiff (jax.checkpoint):
    # trades recompute FLOPs for activation HBM — enables bigger batches on
    # the 15000-point chamfer configs (cfgs/chamfer_*.yaml geometry)
    c.remat = 0
    # -- data ---------------------------------------------------------------
    # custom sigma set (percent) for the diverse/diverse_stable regimes;
    # empty = the reference's {0, 0.25, 0.5, 1, 1.5, 2.5}
    # (offset_dataset.py:163).  Lets specialist models train on a narrow
    # band, e.g. [0.05, 0.1, 0.25] for the low-noise regime the reference
    # fails at (report section 5.2: CD ratio 1.45 at sigma=0.1%)
    c.diverse_levels = []
    c.datasets = "modelnet40"
    c.dataset = "PCN"
    c.data_root = ""
    c.num_classes = 40
    c.num_parts = 0
    c.features = []
    c.input_features_dim = 1
    c.katz_params = []
    c.katz_type = "std"
    c.batch_size = 32
    c.num_points = 5000
    c.num_workers = 4
    c.num_points_per_shape = 140000
    c.diameter_percent = 10
    # -- augmentation -------------------------------------------------------
    c.x_angle_range = 0.0
    c.y_angle_range = 0.0
    c.z_angle_range = 0.0
    c.scale_low = 2.0 / 3.0
    c.scale_high = 3.0 / 2.0
    c.noise_std = 0.01
    c.noise_clip = 0.05
    c.translate_range = 0.2
    c.color_drop = 0.2
    c.augment_symmetries = [0, 0, 0]
    # -- scene-segmentation-style patch options ----------------------------
    c.in_radius = 2.0
    c.num_steps = 500
    # -- io / misc ----------------------------------------------------------
    c.load_path = ""
    # steps fused into one device dispatch by the scan-based train path
    # (Trainer.train_chunk): the epoch is sent chunk-by-chunk as stacked
    # (S, B, ...) arrays — one H2D transfer + one lax.scan of S optimizer
    # steps per dispatch, so a high-latency host<->device link (the
    # tunneled-TPU relay) is paid once per S steps instead of per step.
    # 0/1 disables chunking (reference-style per-step dispatch).
    c.steps_per_dispatch = 25
    # 1 = sample training patches ON DEVICE (data/device_sampler.py): the
    # full noisy clouds upload once and radius-query + gather + augmentation
    # run inside the train scan, so per-step H2D shrinks to the (B, 2) int32
    # patch-center ids.  0 = host-side patch assembly (reference semantics).
    c.device_sampler = 0
    c.print_freq = 10
    c.save_freq = 10
    c.val_freq = 10
    c.log_dir = "log"
    c.job_name = ""
    c.local_rank = 0
    c.amp_opt_level = ""
    c.rng_seed = 0
    c.DEBUG = 0
    # -- local aggregation --------------------------------------------------
    c.local_aggregation_type = "pospool"
    c.pospool = Config(
        position_embedding="xyz",
        reduction="sum",
        output_conv=False,
    )
    c.adaptive_weight = Config(
        weight_type="dp",
        num_mlps=1,
        shared_channels=1,
        weight_softmax=False,
        reduction="avg",
        output_conv=False,
    )
    c.pointwisemlp = Config(
        feature_type="dp_fj",
        num_mlps=1,
        reduction="max",
    )
    c.pseudo_grid = Config(
        fixed_kernel_points="center",
        KP_influence="linear",
        KP_extent=1.0,
        num_kernel_points=15,
        convolution_mode="sum",
        output_conv=False,
    )
    c.attention = Config(type="Non-local")
    return c


def update_config(cfg: Config, yaml_path: str) -> Config:
    """Merge a YAML experiment file into ``cfg`` in place.

    Unknown top-level keys raise, like the reference
    (/root/reference/u_net_arch/utils/config.py:156).
    """
    with open(yaml_path) as f:
        exp = yaml.safe_load(f) or {}
    merge_config(cfg, exp)
    return cfg


def merge_config(cfg: Config, overrides: Dict[str, Any]) -> Config:
    for k, v in overrides.items():
        if k not in cfg:
            raise ValueError(f"{k} key must exist in the default config")
        if isinstance(v, dict):
            for vk, vv in v.items():
                cfg[k][vk] = vv
        else:
            cfg[k] = v
    return cfg


def derive_geometry(cfg: Config, shape_diameter: Optional[float] = None) -> Config:
    """Compute the derived geometry block, once.

    Mirrors /root/reference/u_net_arch/train_dist.py:112-137: patch radius from
    the shape diameter, grid step = in_radius/32, base ball radius, and the
    per-stage neighbor/point-count schedules keyed on ``num_points``.
    """
    if shape_diameter is None:
        shape_diameter = 10.0 if "EDF" in str(cfg.dataset) else 1.0

    cfg.in_radius = 0.5 * shape_diameter * cfg.diameter_percent / 100.0
    cfg.sampleDl = cfg.in_radius / 32.0
    if cfg.in_radius == 2.0:
        cfg.radius = 0.1
    else:
        cfg.radius = max(cfg.in_radius * math.sqrt(3.0) / 32.0, 0.025)

    if cfg.num_points == 15000:
        cfg.nsamples = [26, 31, 38, 41, 39]
        cfg.npoints = [4096, 1152, 304, 88]
    else:
        cfg.nsamples = [2 * 26, int(1.5 * 26), int(1.25 * 26), 26, 26]
        cfg.npoints = [
            max(int(cfg.num_points / 4.0), 1),
            max(int(cfg.num_points / 16.0), 1),
            max(int(cfg.num_points / 32.0), 1),
            max(int(cfg.num_points / 128.0), 1),
        ]

    # Input feature dim: xyz-as-features padded to a multiple of 3
    # (train_dist.py:165-175).
    dim = 0
    for f in cfg.features:
        if f == "normal":
            dim += 3
        if "katz" in f:
            dim += len(cfg.katz_params)
        if f == "intensity":
            dim += 1
    dim += abs(3 - dim % 3) % 3
    cfg.input_features_dim = dim if dim > 0 else 3
    if cfg.fourier_features:
        # input_mapping with 32 gaussian frequencies -> 64-dim sin/cos
        # features (offset_dataset.py:28-33,727-729)
        cfg.input_features_dim = 64
    return cfg


def load_config(yaml_path: Optional[str] = None,
                overrides: Optional[Dict[str, Any]] = None,
                derive: bool = True) -> Config:
    cfg = default_config()
    if yaml_path is not None:
        update_config(cfg, yaml_path)
    if overrides:
        merge_config(cfg, overrides)
    if derive:
        derive_geometry(cfg)
    return cfg
