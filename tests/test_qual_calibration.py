"""QUAL operating-point calibration (tools/qual_sweep.py).

The reference publishes per-platform best quality cutoffs derived from
precision/recall sweeps (ONT 748 / CCS 143 / Illumina 113, reference
README.md:383-401). These tests pin that the framework's QUAL actually
separates false positives on the production held-out flowcell: the
sweep's chosen cutoff must improve precision while keeping recall, and
the production run's false positives must concentrate below it.
"""

import numpy as np
import pytest


def test_sweep_math_exact():
    """sweep() scores thresholds exactly: each distinct call QUAL is a
    candidate cutoff; precision/recall move as calls drop."""
    from tools.qual_sweep import operating_point, sweep

    truth = {100, 200, 300, 400}
    calls = [
        (100, 900.0, True), (200, 800.0, True), (300, 700.0, True),
        (400, 50.0, True),          # low-qual TP: dies at cutoff > 50
        (500, 40.0, False), (600, 30.0, False),  # low-qual FPs
        (700, 850.0, False),        # one high-qual FP survives any cutoff < 850
    ]
    rows = sweep(truth, calls)
    unfiltered = rows[0]
    assert unfiltered == {"qual": 0.0, "tp": 4, "fp": 3,
                          "precision": round(4 / 7, 4), "recall": 1.0,
                          "f1": round(2 * (4 / 7) / (4 / 7 + 1), 4)}
    best = operating_point(rows)
    # cutoff 50 keeps all 4 TPs (the QUAL-50 TP survives a >= cutoff) and
    # drops both low FPs; only the 850 FP survives: P 4/5, R 1
    assert best["qual"] == 50.0
    assert best["tp"] == 4 and best["fp"] == 1
    assert best["precision"] == 0.8 and best["recall"] == 1.0


@pytest.mark.slow
def test_production_false_positives_concentrate_below_cutoff():
    """The production-recipe checkpoint on its held-out flowcell
    (docs/ACCURACY.md: precision 0.880-0.902 with ZERO QUAL filtering):
    the sweep's best-F1 cutoff must demonstrably buy precision — FPs are
    disproportionately low-QUAL — without giving up recall."""
    from tools.qual_sweep import call_heldout, operating_point, sweep

    truth, calls = call_heldout("ont", genome_kb=60)
    assert len(truth) > 100
    rows = sweep(truth, calls)
    unfiltered = rows[0]
    assert unfiltered["recall"] == 1.0
    assert unfiltered["fp"] > 0, "held-out flowcell produced no FPs to calibrate on"

    best = operating_point(rows)
    # the chosen operating point strictly improves F1 and precision
    assert best["qual"] > 0
    assert best["f1"] > unfiltered["f1"]
    assert best["precision"] > unfiltered["precision"]
    assert best["recall"] >= 0.98

    # concentration: the FP rate below the cutoff far exceeds the TP rate
    # below it (QUAL genuinely ranks FPs low; a cutoff trades almost no
    # recall for the precision win)
    fp_quals = np.array([q for _, q, is_tp in calls if not is_tp])
    tp_quals = np.array([q for _, q, is_tp in calls if is_tp])
    fp_below = (fp_quals < best["qual"]).mean()
    tp_below = (tp_quals < best["qual"]).mean()
    assert fp_below >= 3 * max(tp_below, 1e-9), (
        f"QUAL does not separate: {fp_below:.2f} of FPs vs "
        f"{tp_below:.2f} of TPs below cutoff {best['qual']}"
    )
