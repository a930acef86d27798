"""Metric suite vs hand-computed values."""
import numpy as np

from deep3dpointclouddenoising_tpu.utils.metrics import (
    confusion_matrix,
    iou_from_confusions,
    mean_iou,
    metrics_from_confusion,
    partnet_metrics,
    s3dis_metrics,
    shapenetpart_metrics,
    sub_s3dis_metrics,
    topk_accuracy,
)


def test_confusion_and_iou():
    t = np.array([0, 0, 1, 1, 1])
    p = np.array([0, 1, 1, 1, 0])
    conf = confusion_matrix(t, p, 2)
    np.testing.assert_array_equal(conf, [[1, 1], [1, 2]])
    # IoU class0 = 1/3, class1 = 2/4
    ious = iou_from_confusions(conf)
    np.testing.assert_allclose(ious, [1 / 3, 0.5], atol=1e-5)
    assert mean_iou(conf) == np.testing.assert_allclose(
        mean_iou(conf), (1 / 3 + 0.5) / 2, atol=1e-5) or True


def test_metrics_dict_perfect():
    conf = np.array([[50, 0], [0, 50]])
    m = metrics_from_confusion(conf)
    assert m["macc"] == 100.0
    assert m["prec"] > 99.9 and m["rec"] > 99.9
    assert m["fdrate"] < 0.1 and m["forate"] < 0.1


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0],
                       [0.8, 0.1, 0.1],
                       [0.2, 0.3, 0.5]])
    targets = np.array([1, 0, 1])
    top1, top2 = topk_accuracy(logits, targets, topk=(1, 2))
    assert top1 == 2 / 3
    assert top2 == 1.0


def test_s3dis_metrics_oracle():
    labels = np.array([0, 1, 2, 0, 1, 2])
    logits = np.eye(3)[labels].T * 10  # (C, n)
    proj = np.arange(6)
    ious, miou = s3dis_metrics(3, [logits], [proj], [labels])
    np.testing.assert_allclose(ious, 1.0, atol=1e-5)
    assert miou > 0.999
    ious2, miou2 = sub_s3dis_metrics(3, [logits], [labels],
                                     np.array([2.0, 2.0, 2.0]))
    assert miou2 > 0.999


def test_partnet_and_shapenet_oracle():
    # one object class, 3 parts (part 0 = ignore)
    gt = np.array([0, 1, 1, 2, 2, 2])
    pred = np.eye(3)[gt].T * 5  # (parts, N)
    ms, mp, mms, mmp = partnet_metrics(1, [3], [0], [pred], [gt])
    assert mms > 0.999 and mmp > 0.999

    mask = np.ones(6, bool)
    acc, objs, cls_avg, inst_avg = shapenetpart_metrics(
        1, [3], [0], [pred], [gt], [mask])
    assert acc > 0.999 and cls_avg > 0.999 and inst_avg > 0.999
