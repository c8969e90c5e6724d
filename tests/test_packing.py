"""Chunking coverage and packing-offset invariants, including two-level ==
naive prefix-sum equality across group widths."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from docling_ocr_qwen3vl_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)


def test_chunks_cover_every_word_and_clamp(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(f"w{i}" for i in range(11))),  # 11 words
        Row(doc_id=2, text="a b"),                                 # < chunk size
        Row(doc_id=3, text="solo"),
    ])
    rows = chunk_documents(docs, chunk_words=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 11 words, stride 3 -> starts 0,3,6,9 -> 4 chunks; last has 2 words
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.n_chunk_words for r in c1] == [4, 4, 4, 2]
    assert c1[0].chunk_text == "w0 w1 w2 w3"
    assert c1[3].chunk_text == "w9 w10"
    covered = set()
    for r in c1:
        covered.update(r.chunk_text.split())
    assert covered == {f"w{i}" for i in range(11)}
    assert [r.chunk_text for r in by_doc[2]] == ["a b"]
    assert [r.chunk_text for r in by_doc[3]] == ["solo"]


def test_pack_offsets_are_exact_cumsums_any_group_width(spark):
    docs = spark.createDataFrame([
        Row(doc_id=i, text=" ".join("w" for _ in range(5 + i % 7)))
        for i in range(50)
    ])
    naive = None
    for gw in (1, 7, 100):  # 50 groups / 8 groups / single group
        got = {
            r.doc_id: (r.pack_id, r.pack_offset, r.spans_boundary)
            for r in pack_sequences(docs, seq_len=16, group_width=gw).collect()
        }
        if naive is None:
            # independent python reference
            cum = 0
            naive = {}
            for i in range(50):
                n = 5 + i % 7
                naive[i] = (cum // 16, cum % 16, cum // 16 != (cum + n - 1) // 16)
                cum += n
        assert got == naive, gw
