"""Full-loop smoke test: simulate -> build training data through the real
pipeline -> train -> call -> score against planted truth (the framework's
replacement for the reference's downloadable demo, SURVEY §4)."""

import pytest


@pytest.mark.slow
def test_demo_full_loop(tmp_path):
    from demo import run_demo

    stats = run_demo(
        genome_length=10_000,
        n_variants=30,
        coverage=30,
        epochs=150,
        work_dir=str(tmp_path),
        verbose=False,
    )
    # loose thresholds: this validates the machinery end to end, not model
    # capacity (the CLI demo trains longer and reaches ~0.8/1.0)
    assert stats["n_called"] > 0
    assert stats["recall"] >= 0.5, stats
    assert stats["precision"] >= 0.8, stats
