"""The composed pretraining-corpus pipeline (examples/pretrain_pipeline.py)
must run end-to-end with a monotone funnel and a readable partitioned
output."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "pretrain_pipeline",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples", "pretrain_pipeline.py"),
)
pipeline_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pipeline_mod)


def test_pipeline_funnel_monotone_and_output_readable(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    final, funnel = pipeline_mod.build_corpus(spark, sf_dir, out)
    counts = [n for _, n in funnel]
    assert counts[0] > 0
    assert all(a >= b for a, b in zip(counts, counts[1:])), funnel
    assert counts[-1] > 0
    back = spark.read.parquet(out)
    assert back.count() == counts[-1]
    assert "bucket" in back.columns and "tok_offset" in back.columns
    # every surviving doc still carries its (masked) text
    assert back.filter("text IS NULL").count() == 0
