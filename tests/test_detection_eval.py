"""Detection quality (reference perf_eval.py parity): per-line precision /
recall / F1 of the region detector against the generator's ground truth."""

from __future__ import annotations

from key_resource_table_extractor_spark import oracle, synth


def detected_offsets(spans):
    lines = oracle.analyze_lines(spans)
    out = set()
    for i, j in oracle.find_regions(lines):
        for ln in lines[i : j + 1]:
            out.add(ln.offset)
    return out


def test_detection_precision_recall():
    tp = fp = fn = 0
    for i in range(400):
        doc_id = f"doc_42_{i:07d}"
        spans, gold = synth.generate_doc_with_gold(doc_id)
        pred = detected_offsets(spans)
        tp += len(pred & gold)
        fp += len(pred - gold)
        fn += len(gold - pred)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    # deterministic rules on a generator that exercises adversarial cases
    # (adjacent plain tables, gap-filled prose, blank lines): not perfect by
    # design, but must stay high — regression-pins the detector
    assert precision >= 0.93, (precision, recall)
    assert recall >= 0.97, (precision, recall)
    assert f1 >= 0.95, (precision, recall, f1)


def test_generator_gold_is_consistent():
    spans, gold = synth.generate_doc_with_gold("doc_42_0000003")
    texts = {o: t for (k, t, _m, o) in spans if k == "text"}
    assert any("Key Resources Table" in texts[o] for o in gold)
    assert all(o in texts for o in gold)
