"""S4 async job surface: submit -> poll(pending) -> advance -> poll(started)
-> ... -> poll(success), with status visible from a reloaded handle and the
result equal to the one-shot extraction."""

from docling_ocr_qwen3vl_spark.plans.jobs import (
    PENDING,
    STARTED,
    SUCCESS,
    advance_job,
    load_job,
    poll_job,
    submit_job,
)
from docling_ocr_qwen3vl_spark.plans.pipeline import extract_spans


def test_submit_advance_poll_lifecycle(spark, sf_dir, tmp_path):
    job = submit_job(sf_dir, str(tmp_path), n_groups=4)
    assert poll_job(spark, job)["task_status"] == PENDING

    assert advance_job(spark, job, max_groups=1) == 1
    st = poll_job(spark, job)
    assert st["task_status"] == STARTED
    assert st["groups_done"] == 1 and st["result_path"] is None

    # another "frontend" session reloads the handle by task_id and sees
    # the same status (lineage is the shared source of truth)
    reloaded = load_job(str(tmp_path), job.task_id)
    assert poll_job(spark, reloaded)["groups_done"] == 1

    assert advance_job(spark, reloaded, max_groups=3) == 3
    st = poll_job(spark, job)
    assert st["task_status"] == SUCCESS
    assert st["groups_done"] == 4 and st["result_path"]

    # advancing a finished job is a no-op (idempotent)
    assert advance_job(spark, job) == 0

    got = sorted(
        (r.doc_id, r.offset, r.kind, r.text, r.media_ref)
        for r in spark.read.parquet(st["result_path"]).collect()
    )
    want = sorted(
        (r.doc_id, r.offset, r.kind, r.text, r.media_ref)
        for r in extract_spans(spark, sf_dir).collect()
    )
    assert got == want
