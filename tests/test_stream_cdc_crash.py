"""Kill-mid-batch crash matrix for the CDC text-index stream (r8 verdict
item 6): streaming/sinks.stream_apply_text_mutations applies each committed
micro-batch as one generation of the base+delta+tombstone protocol via
foreachBatch.  The PURGE path's crash orderings are pinned in
test_text_index.test_purge_crash_orderings_leave_serving_correct; this
matrix kills the STREAMING APPLY path at each of its commit boundaries and
proves a checkpoint restart replays to a consistent generation:

(a) deltas written, docgen NOT committed — the orphan delta rows are
    invisible (no docgen row references them) and the replayed batch
    overwrites its own generation directory before committing;
(b) docgen staging written, promotion rename/swap never ran — recovery
    sees the old generation, the replay re-stages over the orphan;
(c) generation FULLY committed, crash before the streaming checkpoint
    commit — the replayed batch bumps the generation again with the same
    content (foreachBatch is at-least-once) and serving converges
    latest-wins.
"""

import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as PT

from codecdb_queryengine_spark.sources import text_index as TI
from codecdb_queryengine_spark.streaming import sinks as SK


def _corpus(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta"),
        (2, "beta gamma delta"),
        (3, "alpha alpha alpha"),
        (4, "epsilon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# batch 0: update docs 1 and 4; batch 1: delete doc 0, update doc 2
_BATCHES = [
    [("u", 1, "alpha beta zeta"), ("u", 4, "omega")],
    [("d", 0, None), ("u", 2, "zeta zeta")],
]
# live corpus after both generations
_EXPECT = {
    "zeta": {1, 2},
    "alpha": {1, 3},
    "gamma": set(),
    "omega": {4},
    "epsilon": set(),
}


def _stage(spark, base: str) -> str:
    """One parquet file per batch, mtime-ordered so the file source
    replays batch 0 first (the docs_stream_mutations staging shape)."""
    src = os.path.join(base, "mutations")
    os.makedirs(src, exist_ok=True)
    now = time.time()
    for i, rows in enumerate(_BATCHES):
        tmp = os.path.join(base, f"mut{i}")
        spark.createDataFrame(
            rows, "op string, doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        dst = os.path.join(src, f"{i:03d}_gen.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (now + i, now + i))
    return src


def _drain(spark, src: str, path: str, ckpt: str):
    """Run the CDC stream to exhaustion; return the exception that killed
    it, or None on a clean drain."""
    schema = PT.StructType(
        [
            PT.StructField("op", PT.StringType()),
            PT.StructField("doc_id", PT.LongType()),
            PT.StructField("text", PT.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = SK.stream_apply_text_mutations(stream, path, ckpt)
    try:
        q.awaitTermination()
        return None
    except Exception as e:  # noqa: BLE001 — StreamingQueryException wrapper
        return e


def _search_ids(spark, path, terms):
    return {
        r["doc_id"]
        for r in TI.text_index_search_all(spark, path, terms, num_buckets=8).collect()
    }


def _assert_consistent(spark, path):
    """Serving equals the expected mutated corpus AND the docgen registry
    is internally consistent (no live mutated doc without delta rows, no
    deleted doc served)."""
    for term, want in _EXPECT.items():
        assert _search_ids(spark, path, [term]) == want, term
    dg = TI._read_docgen(spark, path)
    assert dg is not None
    rows = {int(r["doc_id"]): (int(r["gen"]), bool(r["deleted"])) for r in dg.collect()}
    assert rows[0][1] is True  # doc 0 deleted
    delta = spark.read.parquet(TI._delta_root(path, "postings"))
    live_delta = {
        (int(r["doc_id"]), int(r["gen"]))
        for r in delta.select("doc_id", F.col("gen").cast("int").alias("gen"))
        .distinct()
        .collect()
    }
    for doc_id, (gen, deleted) in rows.items():
        if not deleted:
            assert (doc_id, gen) in live_delta, (doc_id, gen)


def _fresh(spark, tmp_path, tag):
    base = str(tmp_path / tag)
    path = os.path.join(base, "index")
    TI.text_index_build(_corpus(spark), path, num_buckets=8)
    return base, path, _stage(spark, base), os.path.join(base, "ckpt")


def test_crash_before_docgen_commit_replays_clean(spark, tmp_path, monkeypatch):
    """(a) the batch's deltas land but the docgen commit never runs: the
    stream dies, serving still answers from the PREVIOUS generation
    (orphan deltas are invisible), and a checkpoint restart replays the
    batch — generation directories overwritten, not merged."""
    base, path, src, ckpt = _fresh(spark, tmp_path, "a")
    # the commit point is _promote_docgen since r12 (staging overlaps the
    # delta writes; promotion still runs strictly after every delta lands)
    real = TI._promote_docgen
    state = {"armed": True}

    def boom(spark_, p, staging):
        if state["armed"]:
            state["armed"] = False
            raise RuntimeError("injected crash before docgen commit")
        return real(spark_, p, staging)

    monkeypatch.setattr(TI, "_promote_docgen", boom)
    err = _drain(spark, src, path, ckpt)
    assert err is not None and "before docgen commit" in str(err)
    # crashed mid-batch-0: no generation committed, base serving intact
    assert TI._read_docgen(spark, path) is None
    assert _search_ids(spark, path, ["gamma"]) == {0, 2}
    assert os.path.exists(TI._delta_root(path, "postings"))  # orphan deltas
    monkeypatch.undo()
    assert _drain(spark, src, path, ckpt) is None  # restart drains clean
    _assert_consistent(spark, path)


def test_crash_between_docgen_stage_and_promote_recovers(spark, tmp_path, monkeypatch):
    """(b) batch 1's docgen staging is written but the journaled swap never
    promotes it: recovery reads the OLD generation (gen 1 only), and the
    replayed batch re-stages over the orphan staging dir."""
    base, path, src, ckpt = _fresh(spark, tmp_path, "b")
    from codecdb_queryengine_spark.sources import io as IO

    real_swap = IO.swap_layout
    state = {"armed": True}

    def boom(dst, staging):
        # fires on the batch-1 docgen promotion (batch 0 creates docgen via
        # bare rename; only an EXISTING docgen goes through swap_layout)
        if state["armed"] and dst == TI._docgen_path(path):
            state["armed"] = False
            raise RuntimeError("injected crash before docgen promote")
        return real_swap(dst, staging)

    monkeypatch.setattr(IO, "swap_layout", boom)
    err = _drain(spark, src, path, ckpt)
    assert err is not None and "before docgen promote" in str(err)
    dg = TI._read_docgen(spark, path)
    assert dg.agg(F.max("gen")).first()[0] == 1  # batch 1 not committed
    # batch 0's generation serves; batch 1's mutations are invisible
    assert _search_ids(spark, path, ["zeta"]) == {1}
    assert _search_ids(spark, path, ["gamma"]) == {0, 2}
    monkeypatch.undo()
    assert _drain(spark, src, path, ckpt) is None
    _assert_consistent(spark, path)


def test_crash_after_commit_before_checkpoint_converges(spark, tmp_path, monkeypatch):
    """(c) the generation commits, then the driver dies before the
    streaming checkpoint commit: foreachBatch's at-least-once contract —
    the restart replays the batch, bumping the generation again with the
    same content, and serving converges latest-wins."""
    base, path, src, ckpt = _fresh(spark, tmp_path, "c")
    real = TI.text_index_upsert
    state = {"armed": True}

    def boom(*a, **kw):
        gen = real(*a, **kw)
        if state["armed"]:
            state["armed"] = False
            raise RuntimeError(f"injected crash after committing gen {gen}")
        return gen

    monkeypatch.setattr(TI, "text_index_upsert", boom)
    # sinks.py binds TI at module import; patch the reference it calls
    monkeypatch.setattr(
        "codecdb_queryengine_spark.sources.text_index.text_index_upsert", boom
    )
    err = _drain(spark, src, path, ckpt)
    assert err is not None and "after committing gen 1" in str(err)
    # gen 1 IS committed — batch 0's mutations already serve
    assert _search_ids(spark, path, ["zeta"]) == {1}
    monkeypatch.undo()
    assert _drain(spark, src, path, ckpt) is None
    # batch 0 replayed as gen 2 (same content), batch 1 became gen 3
    dg = TI._read_docgen(spark, path)
    assert dg.agg(F.max("gen")).first()[0] == 3
    _assert_consistent(spark, path)
