"""The ensemble chain: call_var --output_for_ensemble x2 -> ensemble
combiner -> call_var --input_probabilities re-decode."""

import io

import numpy as np

from clair_tpu.data.tensor_stream import tensor_line_from
from clair_tpu.io.vcf import VcfWriter
from clair_tpu.pipeline.call_var import (
    call_variants_for_ensemble,
    call_variants_from_probabilities,
)
from clair_tpu.pipeline.decode import OutputConfig
from clair_tpu.post.ensemble import combine_ensemble
from tests.test_call_var import FakePredictor, _counts_tensor, SEQ


def test_ensemble_roundtrip():
    x = _counts_tensor("G", 9)
    lines = [tensor_line_from("chr3", 700 + i, SEQ, x) for i in range(5)]

    # two "runs" of ensemble output (same model here; probabilities average)
    ensemble_outputs = []
    for _ in range(2):
        sink = io.StringIO()
        total = call_variants_for_ensemble(iter(lines), FakePredictor(), sink)
        assert total == 5
        ensemble_outputs.append(sink.getvalue())

    combined = io.StringIO()
    emitted = combine_ensemble(
        (ensemble_outputs[0] + ensemble_outputs[1]).splitlines(),
        combined,
        minimum_count_to_output=2,
    )
    assert emitted == 5

    # the combined rows re-decode to the same calls
    vcf_sink = io.StringIO()
    writer = VcfWriter(vcf_sink, sample_name="S")
    writer.write_header()
    call_variants_from_probabilities(
        iter(combined.getvalue().splitlines()), OutputConfig(), writer
    )
    rows = [r.split("\t") for r in vcf_sink.getvalue().splitlines() if not r.startswith("#")]
    assert len(rows) == 5
    assert all(r[3] == "A" and r[4] == "G" for r in rows)
    assert all(r[9].startswith("1/1") for r in rows)
