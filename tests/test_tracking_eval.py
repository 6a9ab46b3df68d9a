import numpy as np

from efg_tpu.evaluator.tracking_evaluator import MOTAccumulator


def test_perfect_tracking_mota_1():
    acc = MOTAccumulator()
    for f in range(5):
        ct = np.array([[f * 1.0, 0.0], [0.0, f * 1.0]])
        acc.add_frame(ct, np.array([10, 11]), ct, np.array([1, 2]))
    r = acc.summarize()
    assert r["MOTA"] == 1.0 and r["IDSW"] == 0 and r["MOTP"] == 0.0


def test_id_switch_detected():
    acc = MOTAccumulator()
    gt = np.array([[0.0, 0.0]])
    acc.add_frame(gt, np.array([10]), gt, np.array([1]))
    acc.add_frame(gt, np.array([99]), gt, np.array([1]))  # new track id → IDSW
    r = acc.summarize()
    assert r["IDSW"] == 1
    assert r["MOTA"] == 1.0 - 1 / 2


def test_fp_fn_counting():
    acc = MOTAccumulator()
    acc.add_frame(np.array([[50.0, 50.0]]), np.array([7]), np.array([[0.0, 0.0]]), np.array([1]))
    r = acc.summarize()
    assert r["FP"] == 1 and r["FN"] == 1 and r["MOTA"] == -1.0


def test_seq_sampler_groups_sequences():
    from efg_tpu.data.samplers.dataset_sampler import SeqInferenceSampler

    seq_ids = ["a", "a", "b", "b", "b", "c"]
    s = SeqInferenceSampler(6, seq_ids)
    order = list(s)
    # frames of a sequence stay contiguous and ordered
    pos = {i: k for k, i in enumerate(order)}
    assert pos[0] < pos[1]
    assert pos[2] < pos[3] < pos[4]
