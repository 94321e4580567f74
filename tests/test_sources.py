"""Source-layer tests: JSONL quarantine ingest and compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from insect_observation_data_pipeline_spark.sources.jsonl import read_jsonl, split_corrupt
from insect_observation_data_pipeline_spark.sources.parquet import compact, read_table

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_jsonl_quarantine_split(spark, tmp_path):
    """Malformed AND schema-violating lines land in quarantine with the
    raw line preserved; clean rows come out typed. One text scan, no
    cache (the reader avoids Spark's internal _corrupt_record column,
    which can't be queried uncached)."""
    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "hello world"}\n')
        f.write('{"doc_id": 2, "text": "ok"}\n')
        f.write("{broken json!!\n")
        f.write('{"doc_id": "not-an-int", "text": "bad type"}\n')
    good, bad = split_corrupt(read_jsonl(spark, p, DOC_SCHEMA))
    assert sorted((r["doc_id"], r["text"]) for r in good.collect()) == [
        (1, "hello world"),
        (2, "ok"),
    ]
    assert good.schema["doc_id"].dataType == LongType()
    bad_rows = bad.collect()
    assert {r["error_message"] for r in bad_rows} == {"Malformed JSON line."}
    assert sorted(r["row_data"] for r in bad_rows) == [
        '{"doc_id": "not-an-int", "text": "bad type"}',
        "{broken json!!",
    ]


def test_jsonl_all_clean_roundtrip(spark, tmp_path):
    """Clean-file fast path: quarantine empty, all rows typed."""
    p = str(tmp_path / "clean.jsonl")
    with open(p, "w") as f:
        for i in range(100):
            f.write(f'{{"doc_id": {i}, "text": "doc {i}"}}\n')
    good, bad = split_corrupt(read_jsonl(spark, p, DOC_SCHEMA))
    assert good.count() == 100 and bad.count() == 0


def test_compact_reduces_file_count(spark, tmp_path):
    """64-way fragmented dataset compacts to the size-derived partition
    count (1 for KB-scale data) with identical contents; works for both
    the coalesce and shuffle paths."""
    frag = str(tmp_path / "frag.parquet")
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    docs.repartition(64).write.parquet(frag)
    assert len(glob.glob(os.path.join(frag, "part-*.parquet"))) == 64

    for shuffle, name in ((False, "out_c.parquet"), (True, "out_r.parquet")):
        out = str(tmp_path / name)
        compacted = compact(spark.read.parquet(frag), shuffle=shuffle)
        compacted.write.parquet(out)
        files = glob.glob(os.path.join(out, "part-*.parquet"))
        assert len(files) == 1, (name, len(files))
        before = docs.select("doc_id").orderBy("doc_id").collect()
        after = (
            spark.read.parquet(out).select("doc_id").orderBy("doc_id").collect()
        )
        assert before == after
