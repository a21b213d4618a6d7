"""Triple-set evaluation metrics.

Mirrors /root/reference/tests/integration_tests.rs:34-67 (set-intersection
P/R/F1 on exact (subject, predicate, object) equality) and the
macro-average of examples/webnlg_evaluation.rs:113-133.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class EvaluationMetrics:
    precision: float
    recall: float
    f1_score: float
    true_positives: int
    false_positives: int
    false_negatives: int


def evaluate(predicted: set, expected: set) -> EvaluationMetrics:
    tp = len(predicted & expected)
    fp = len(predicted) - tp
    fn = len(expected) - tp
    precision = tp / len(predicted) if predicted else 0.0
    recall = tp / len(expected) if expected else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return EvaluationMetrics(precision, recall, f1, tp, fp, fn)


def macro_average(per_case: list[EvaluationMetrics]) -> dict:
    n = len(per_case)
    if not n:
        return {"precision": 0.0, "recall": 0.0, "f1_score": 0.0, "cases": 0}
    return {
        "precision": sum(m.precision for m in per_case) / n,
        "recall": sum(m.recall for m in per_case) / n,
        "f1_score": sum(m.f1_score for m in per_case) / n,
        "cases": n,
    }
