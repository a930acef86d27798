"""Every shipped YAML config loads, derives geometry, and names valid
losses/architectures."""
import glob
import os

import pytest

from deep3dpointclouddenoising_tpu.config import load_config
from deep3dpointclouddenoising_tpu.losses.build import (
    get_complete_denoising_loss, get_offset_regression_loss)

CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cfgs")
# includes cfgs/custom_cfgs/ — the twins of the reference's 17-file EDF
# outlier-seg feature-ablation sweep (custom_cfgs/*.yaml)
ALL_CFGS = sorted(glob.glob(os.path.join(CFG_DIR, "*.yaml"))
                  + glob.glob(os.path.join(CFG_DIR, "custom_cfgs",
                                           "*.yaml")))

FULL_CLEANING = {"L1_classification", "Weighted_L1_classification",
                 "double_weight"}
PCN_LOSSES = {"L1", "original", "original_no_reg"}


@pytest.mark.parametrize("path", ALL_CFGS, ids=os.path.basename)
def test_config_loads_and_valid(path):
    cfg = load_config(path)
    assert cfg.experiment_name
    # derived geometry present and consistent
    assert len(cfg.nsamples) == 5
    assert len(cfg.npoints) == 4
    assert cfg.radius > 0 and cfg.sampleDl > 0
    # loss resolves for its architecture
    if cfg.loss in FULL_CLEANING:
        get_complete_denoising_loss(cfg.loss, cfg.in_radius)
    elif str(cfg.architecture) == "PCN":
        assert cfg.loss in PCN_LOSSES
    elif cfg.loss != "CE":
        get_offset_regression_loss(cfg.loss)


def test_unknown_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("not_a_real_key: 1\n")
    with pytest.raises(ValueError):
        load_config(str(bad))
