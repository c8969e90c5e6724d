"""Serve the extraction engine over HTTP (docling-serve protocol analog).

Sandbox:
  python scripts/serve.py --root /tmp/jobs --port 8080

Cluster:
  zip -r engine.zip docling_ocr_qwen3vl_spark
  spark-submit --py-files engine.zip scripts/serve.py \
    --root hdfs:///jobs --host 0.0.0.0 --port 8080

Endpoints (serving/server.py): GET /health, POST /v1/convert/source/async
with {"sources":[{"kind":"sf_dir","path":...}]}, GET /v1/status/poll/{id},
GET /v1/result/{id}.  Job state lives in the lineage tables under --root,
so a restarted server resumes in-flight jobs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", required=True, help="job-state directory")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from docling_ocr_qwen3vl_spark.plans.session import build_session
    from docling_ocr_qwen3vl_spark.serving.server import make_server

    spark = build_session(app_name="extract-serve", master=args.master)
    server, ctx = make_server(spark, args.root, host=args.host, port=args.port)
    ctx.start()
    print(f"serving on http://{args.host}:{server.server_address[1]} root={args.root}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        ctx.stop()
        spark.stop()


if __name__ == "__main__":
    main()
