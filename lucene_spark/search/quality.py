"""IR-quality harness — precision / recall / MAP / nDCG vs judgments
(benchmark/src/java/org/apache/lucene/benchmark/quality/
QualityBenchmark.java, trec/TrecJudge.java semantics: binary relevance
judgments per topic, metrics over ranked engine output).

Pure-python metric kernels (they operate on collected top-k lists — by
construction tiny) + an ``evaluate`` driver that runs a topic set
through an IndexSearcher.
"""

from __future__ import annotations

import math
from collections.abc import Mapping, Sequence


def precision_at_k(ranked: Sequence[int], relevant: set[int], k: int) -> float:
    if k <= 0:
        return 0.0
    top = list(ranked)[:k]
    return sum(1 for d in top if d in relevant) / float(k)


def recall_at_k(ranked: Sequence[int], relevant: set[int], k: int) -> float:
    if not relevant:
        return 0.0
    top = list(ranked)[:k]
    return sum(1 for d in top if d in relevant) / float(len(relevant))


def average_precision(ranked: Sequence[int], relevant: set[int]) -> float:
    """AP = mean over relevant docs of precision at each relevant hit
    (unretrieved relevant docs contribute 0 — TrecJudge convention)."""
    if not relevant:
        return 0.0
    hits = 0
    s = 0.0
    for i, d in enumerate(ranked, start=1):
        if d in relevant:
            hits += 1
            s += hits / i
    return s / len(relevant)


def ndcg_at_k(
    ranked: Sequence[int], grades: Mapping[int, float], k: int
) -> float:
    """nDCG@k with graded relevance, log2 discount."""
    dcg = sum(
        grades.get(d, 0.0) / math.log2(i + 1)
        for i, d in enumerate(list(ranked)[:k], start=1)
    )
    ideal = sorted(grades.values(), reverse=True)[:k]
    idcg = sum(g / math.log2(i + 1) for i, g in enumerate(ideal, start=1))
    return dcg / idcg if idcg > 0 else 0.0


def mean_average_precision(
    runs: Mapping[str, Sequence[int]], qrels: Mapping[str, set[int]]
) -> float:
    if not runs:
        return 0.0
    return sum(
        average_precision(ranked, qrels.get(qid, set()))
        for qid, ranked in runs.items()
    ) / len(runs)


def evaluate(searcher, topics: Mapping[str, object], qrels, k: int = 10) -> dict:
    """Run each topic query, score against qrels.
    -> {per_topic: {qid: {p_at_k, recall_at_k, ap}}, map, mean_p_at_k}."""
    per = {}
    for qid, q in topics.items():
        ranked = [h.doc_id for h in searcher.search(q, k=max(k, 100)).hits]
        rel = set(qrels.get(qid, set()))
        per[qid] = {
            "p_at_k": precision_at_k(ranked, rel, k),
            "recall_at_k": recall_at_k(ranked, rel, k),
            "ap": average_precision(ranked, rel),
        }
    n = max(1, len(per))
    return {
        "per_topic": per,
        "map": sum(v["ap"] for v in per.values()) / n,
        "mean_p_at_k": sum(v["p_at_k"] for v in per.values()) / n,
    }
