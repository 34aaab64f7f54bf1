"""Streaming corpus ingestion: incremental, exactly-once, dedup-guarded."""

import json

from cryptocurrency_data_pipeline_spark.streaming.corpus import run_corpus_ingest


def _write_docs(path, docs, name):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / name, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def _doc(i, words=40, source="src0", ts="2026-08-13T10:00:00"):
    body = " ".join(f"word{j % 13} the data" for j in range(words // 3 + 1))
    return {
        "doc_id": i,
        "text": body + f" tail{i}",
        "source": source,
        "ingested_at": ts,
    }


def test_incremental_ingest_counts_each_file_once(spark, tmp_path):
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_docs(inp, [_doc(i) for i in range(10)], "batch1.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == 10

    # second invocation: only the NEW file is processed (job-bookmark
    # semantics via the checkpoint), previously seen docs not re-appended
    _write_docs(inp, [_doc(i) for i in range(10, 15)], "batch2.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt))
    got = spark.read.parquet(str(out))
    assert got.count() == 15
    assert got.select("doc_id").distinct().count() == 15
    assert {"split", "n_tokens", "content_fp"} <= set(got.columns)


def test_quality_gate_and_content_dedup_on_stream(spark, tmp_path):
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    docs = [_doc(1), _doc(2)]
    dup = dict(_doc(3))
    dup["text"] = docs[0]["text"]          # exact content dup of doc 1
    junk = {"doc_id": 4, "text": "!!!", "source": "s", "ingested_at": "2026-08-13T10:00:00"}
    _write_docs(inp, docs + [dup, junk], "b.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt), min_quality=0.4)
    got = spark.read.parquet(str(out))
    ids = sorted(r.doc_id for r in got.collect())
    # junk gated out; dup collapsed to one of {1, 3}
    assert 4 not in ids
    assert len(ids) == 2
    assert got.select("content_fp").distinct().count() == 2


def test_split_partition_layout_on_disk(spark, tmp_path):
    import os

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_docs(inp, [_doc(i) for i in range(40)], "b.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt))
    parts = {d for d in os.listdir(out) if d.startswith("split=")}
    assert parts <= {"split=train", "split=val", "split=test"}
    assert "split=train" in parts


def test_rejects_land_in_dlq_not_silently_dropped(spark, tmp_path):
    """Quality rejects AND null-event-time docs (which watermarked dedup
    would silently drop from the stream) must be auditable in the DLQ
    with the silver envelope; accepted rows are unaffected."""
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    good = _doc(1)
    junk = {"doc_id": 2, "text": "!!!", "source": "s",
            "ingested_at": "2026-08-13T10:00:00"}
    no_ts = dict(_doc(3))
    no_ts["ingested_at"] = None
    _write_docs(inp, [good, junk, no_ts], "b.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt), min_quality=0.4)

    ids = sorted(r.doc_id for r in spark.read.parquet(str(out)).collect())
    assert ids == [1]
    dlq = spark.read.parquet(str(out) + "_dlq").collect()
    reasons = {}
    import json as _json

    for r in dlq:
        reasons[_json.loads(r.raw)["doc_id"]] = r.error_reason
    assert reasons == {2: "low_quality", 3: "null_event_time"}

def test_latest_batch_id_probe(spark, tmp_path):
    """The Hadoop-FS batch-id probe: absent dir is None, temp/compact
    entries are ignored, highest integer wins."""
    from cryptocurrency_data_pipeline_spark.streaming.corpus import (
        _latest_batch_id,
    )

    assert _latest_batch_id(spark, str(tmp_path / "nope")) is None
    off = tmp_path / "offsets"
    off.mkdir()
    for name in ("0", "3", "1", ".4.tmp", "5.compact.tmp"):
        (off / name).write_text("{}")
    assert _latest_batch_id(spark, str(off)) == 3


def test_grandfathered_accepted_subcheckpoint(spark, tmp_path):
    """A deployment that ran the intermediate revision (accepted query
    checkpointed at ckpt/accepted) resumes THERE — no re-ingest."""
    import shutil

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_docs(inp, [_doc(i) for i in range(10)], "b1.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt))
    # Rewrite the layout to the intermediate revision's: accepted query
    # state under accepted/, DLQ state stays at dlq/.
    acc = ckpt / "accepted"
    acc.mkdir()
    for entry in list(ckpt.iterdir()):
        if entry.name not in ("accepted", "dlq"):
            shutil.move(str(entry), str(acc / entry.name))
    _write_docs(inp, [_doc(i) for i in range(10, 15)], "b2.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt))
    got = spark.read.parquet(str(out))
    assert got.count() == 15
    assert got.select("doc_id").distinct().count() == 15


def test_both_checkpoint_layouts_newest_wins(spark, tmp_path):
    """When BOTH the bare and accepted/ layouts hold batches, the one
    with the higher latest batch id resumes — resuming the older one
    would re-ingest committed input as duplicates."""
    import shutil

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_docs(inp, [_doc(i) for i in range(5)], "b1.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt))  # bare @ batch 0
    acc = ckpt / "accepted"
    shutil.copytree(str(ckpt), str(acc),
                    ignore=shutil.ignore_patterns("dlq", "accepted"))
    _write_docs(inp, [_doc(i) for i in range(5, 8)], "b2.jsonl")
    # Advance ONLY the accepted/ copy to batch 1 (same query lineage —
    # a copied checkpoint shares the query id, so the sink metadata in
    # out_path stays consistent).
    run_corpus_ingest(spark, str(inp), str(out), str(acc))
    _write_docs(inp, [_doc(i) for i in range(8, 12)], "b3.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt))  # sub=1 > bare=0
    got = spark.read.parquet(str(out))
    assert got.count() == 12
    assert got.select("doc_id").distinct().count() == 12


def test_reset_bare_layout_beats_stale_accepted_copy(spark, tmp_path):
    """The ran-last (mtime) signal: a freshly-RESET bare layout at batch
    0 must beat a stale accepted/ copy at a HIGHER batch id — id order
    alone would resume the stale copy and never re-ingest."""
    import os
    import time

    from cryptocurrency_data_pipeline_spark.streaming.corpus import (
        _pick_accepted_checkpoint,
    )

    ckpt = tmp_path / "ckpt"
    stale = ckpt / "accepted" / "offsets"
    stale.mkdir(parents=True)
    old = time.time() - 3600
    for b in ("0", "1", "2", "3"):
        p = stale / b
        p.write_text("{}")
        os.utime(p, (old, old))
    fresh = ckpt / "offsets"
    fresh.mkdir()
    (fresh / "0").write_text("{}")  # reset: restarted at batch 0, now
    assert _pick_accepted_checkpoint(spark, str(ckpt)) == str(ckpt)
    # And the converse: accepted/ genuinely ran last -> accepted wins
    # even from a lower batch id.
    newer = time.time() + 2
    os.utime(stale / "3", (newer, newer))
    assert _pick_accepted_checkpoint(spark, str(ckpt)) == str(
        ckpt / "accepted"
    )


def test_both_checkpoint_layouts_tied_fails_loudly(spark, tmp_path):
    """Equal latest batch ids in both layouts is unresolvable — the run
    must refuse rather than guess and risk duplicate ingestion."""
    import shutil

    import pytest

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_docs(inp, [_doc(i) for i in range(5)], "b1.jsonl")
    run_corpus_ingest(spark, str(inp), str(out), str(ckpt))
    shutil.copytree(str(ckpt), str(ckpt / "accepted"),
                    ignore=shutil.ignore_patterns("dlq", "accepted"))
    _write_docs(inp, [_doc(i) for i in range(5, 8)], "b2.jsonl")
    with pytest.raises(RuntimeError, match="same batch id"):
        run_corpus_ingest(spark, str(inp), str(out), str(ckpt))
