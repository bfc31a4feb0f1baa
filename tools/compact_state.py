"""Maintenance CLI for streaming-state generation compaction.

The scheduled counterpart of the jobs' in-stream ``compact_every``
cadence (streaming/compaction.py): fold a state dir's committed
batch=<k> parquet directories (plus the previous generation) into one
new generation of a few large files, bounding file count on a
continuous feed. Safe to run while the stream is live — the stream's
current batch is never folded (up_to caps at the listing's max batch
id + 1) and readers resolve generations atomically via commit markers.

Usage:
    python tools/compact_state.py --dir /lake/state/seen \
        --ddl "fp string, kept_doc_id long" [--num-files N] [--up-to K]
        [--count-only]

``--count-only`` prints the current data-file count and exits — the
observability half (q_audit_small_files measures lake tables; this
measures state dirs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="state dir (any Hadoop-visible URI)")
    ap.add_argument("--ddl", help="declared row schema, e.g. 'fp string, n long'")
    ap.add_argument("--num-files", type=int, default=None)
    ap.add_argument("--up-to", type=int, default=None)
    ap.add_argument("--count-only", action="store_true")
    args = ap.parse_args()

    from micmac_li3ds_spark.session import get_spark
    from micmac_li3ds_spark.streaming import compaction as C

    spark = get_spark("compact_state")
    if args.count_only:
        print(
            json.dumps(
                {
                    "dir": args.dir,
                    "data_files": C.state_file_count(spark, args.dir),
                }
            )
        )
        return
    if not args.ddl:
        ap.error("--ddl is required unless --count-only")
    res = C.compact_state_dir(
        spark,
        args.dir,
        args.ddl,
        num_files=args.num_files,
        up_to=args.up_to,
    )
    res["data_files_after"] = C.state_file_count(spark, args.dir)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
