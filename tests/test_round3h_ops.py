"""Edge-case tests for the round-3h operator batch: politeness
scheduling (window-max recurrence vs a hand-rolled sequential model),
markdown stripping, content-defined chunking, and NFC drift audit."""

from __future__ import annotations

from ocr_spark.functions.curation import (
    markdown_strip,
    nfc_audit,
    politeness_schedule,
)
from ocr_spark.functions.dedup import cdc_chunks

SF = "/root/testdata/sf0.001"


def _sched(spark, rows, delay):
    df = spark.createDataFrame(
        [("h", a, i, delay) for i, a in enumerate(rows)],
        ["host", "arr", "ord", "d"])
    return politeness_schedule(df, "host", "arr", "ord", "d").collect()[0]


def _model(arrivals, d):
    sched, out = None, []
    for a in sorted(arrivals):
        sched = a if sched is None else max(a, sched + d)
        out.append(sched)
    return out


def test_politeness_matches_sequential_model(spark):
    arr = [0, 1, 2, 50, 51, 200]
    d = 10
    exp = _model(arr, d)
    r = _sched(spark, arr, d)
    assert r["n_fetches"] == 6
    assert r["finish_micros"] == exp[-1]
    assert r["total_wait_micros"] == sum(s - a for s, a
                                         in zip(exp, sorted(arr)))
    assert r["max_wait_micros"] == max(s - a for s, a
                                       in zip(exp, sorted(arr)))


def test_politeness_no_wait_when_spaced(spark):
    # arrivals farther apart than the delay never queue
    r = _sched(spark, [0, 100, 200, 300], 10)
    assert r["total_wait_micros"] == 0 and r["max_wait_micros"] == 0
    assert r["finish_micros"] == 300


def test_politeness_burst_linearizes(spark):
    # all arrive at once: waits are 0, d, 2d, ...
    r = _sched(spark, [5, 5, 5, 5], 7)
    assert r["finish_micros"] == 5 + 3 * 7
    assert r["total_wait_micros"] == 7 + 14 + 21


def test_politeness_varying_delay_uses_host_max(spark):
    # per-row delays that vary within a host collapse to MAX(d): the
    # strictest crawl-delay ever seen for the host wins (the closed-form
    # recurrence is only valid for a constant d — round-3 advice)
    rows = [("h", 5, 0, 3), ("h", 5, 1, 7), ("h", 5, 2, 7), ("h", 5, 3, 3)]
    df = spark.createDataFrame(rows, ["host", "arr", "ord", "d"])
    r = politeness_schedule(df, "host", "arr", "ord", "d").collect()[0]
    assert r["finish_micros"] == 5 + 3 * 7
    assert r["total_wait_micros"] == 7 + 14 + 21


def test_politeness_hosts_independent(spark):
    rows = [("a", 0, 0, 10), ("a", 1, 1, 10), ("b", 0, 0, 10)]
    df = spark.createDataFrame(rows, ["host", "arr", "ord", "d"])
    out = {r["host"]: r.asDict() for r in
           politeness_schedule(df, "host", "arr", "ord", "d").collect()}
    assert out["a"]["total_wait_micros"] == 9
    assert out["b"]["total_wait_micros"] == 0


def test_markdown_strip_forms(spark):
    md = ("# Title\ntext [anchor](http://x) more ![alt](i.png) "
          "`code` **b** *i*\n> q\n---\nend")
    df = spark.createDataFrame([(md,)], ["t"])
    r = markdown_strip(df, "t").collect()[0]
    assert r["stripped"] == ("Title\ntext anchor more alt "
                             "code b i\nq\nend")
    assert r["n_links"] == 2  # the image's ]( counts too
    assert r["n_headers"] == 1
    assert r["md_len"] > r["txt_len"]


def test_markdown_strip_plain_text_is_identity(spark):
    df = spark.createDataFrame([("no markdown here at all",)], ["t"])
    r = markdown_strip(df, "t").collect()[0]
    assert r["stripped"] == "no markdown here at all"
    assert r["n_links"] == 0 and r["n_headers"] == 0


def test_cdc_chunks_counts_and_sharing(spark):
    # doc 1 and 2 share identical text -> every chunk shared;
    # doc 3 is disjoint -> zero shared
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, t), (2, t), (3, "one two three four five")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in
           cdc_chunks(df, "doc_id", "text").collect()}
    assert out[1]["n_words"] == 10 and out[3]["n_words"] == 5
    assert out[1]["n_chunks"] == out[2]["n_chunks"]
    assert out[1]["shared_chunks"] == out[1]["n_chunks"]
    assert out[3]["shared_chunks"] == 0


def test_cdc_chunks_insertion_preserves_downstream_chunks(spark):
    # CDC's point: prepending words leaves later chunks shared
    base = " ".join(f"w{i}" for i in range(60))
    rows = [(1, base), (2, "XNEW YNEW " + base)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in
           cdc_chunks(df, "doc_id", "text").collect()}
    # all but the first (perturbed) chunk of each doc still match
    assert out[1]["shared_chunks"] >= out[1]["n_chunks"] - 1
    assert out[2]["shared_chunks"] >= out[2]["n_chunks"] - 1


def test_nfc_audit_counts_decomposed_rows(spark):
    rows = [("s", "café"), ("s", "café"), ("s", "plain")]
    df = spark.createDataFrame(rows, ["source", "t"])
    r = nfc_audit(df, "source", "t").collect()[0]
    assert r["n_docs"] == 3
    assert r["n_drifted"] == 1           # only the NFD row changes
    assert r["chars_raw"] - r["chars_nfc"] == 1  # e+combining -> é
