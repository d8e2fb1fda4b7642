"""Concurrency smoke: the whole catalog building and draining in ONE
SparkSession from many threads at once.

Every other harness runs queries one at a time; a 100 TB deployment
does not. A shared session serves concurrent notebooks/jobs, which
exercises exactly the machinery the single-query gates cannot see:

* the read_table scan memo (lock-guarded per round-7 ADVICE - this is
  the test that the lock actually holds under contention);
* RUNTIME_CONF's per-build ``spark.conf.set`` calls racing each other
  (same values, must be idempotent);
* any query-side temp path / global name that would collide when two
  builds overlap (a fixed staging dir shared by two queries is a real
  multi-tenant defect, not a test artifact);
* the JVM scheduler itself (FIFO pools, broadcast cleanup, AQE state)
  under interleaved jobs.

Method: run every catalog query serially once (row-count baseline),
then run the SAME queries from a thread pool (default 8 workers) in
the SAME session, and compare counts. Any exception or count drift is
a finding. Streaming/file-writing queries participate - their
idempotent merge contracts are supposed to make re-entry safe.

Usage: python tools/concurrency_smoke.py [sf_dir] [--workers N] [name ...]
Exit 1 on any mismatch or error.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reactive_data_pipeline_spark import get_spark  # noqa: E402
from reactive_data_pipeline_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])
    workers = 8
    if "--workers" in args:
        i = args.index("--workers")
        workers = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or list(QUERIES)

    spark = get_spark("concurrency-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    baseline: dict[str, int] = {}
    serial_errors: dict[str, str] = {}
    for n in names:
        try:
            baseline[n] = QUERIES[n].build(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            serial_errors[n] = f"{type(e).__name__}: {str(e)[:120]}"
    serial_sec = time.time() - t0
    if serial_errors:
        for n, msg in serial_errors.items():
            print(f"SERIAL-FAIL {n}: {msg}")
        print("serial baseline failed - fix before measuring concurrency")
        sys.exit(1)

    def one(n: str) -> tuple[str, int | None, str | None]:
        try:
            return n, QUERIES[n].build(spark, sf_dir).count(), None
        except Exception as e:  # noqa: BLE001
            return n, None, f"{type(e).__name__}: {str(e)[:200]}"

    t1 = time.time()
    with ThreadPoolExecutor(max_workers=workers) as pool:
        results = list(pool.map(one, names))
    conc_sec = time.time() - t1

    failures = 0
    for n, count, err in results:
        if err is not None:
            print(f"CONC-FAIL {n}: {err}")
            failures += 1
        elif count != baseline[n]:
            print(f"MISMATCH {n}: serial {baseline[n]} vs concurrent {count}")
            failures += 1
    print(
        f"\n{len(names) - failures}/{len(names)} identical under {workers}-way "
        f"concurrency; serial {serial_sec:.1f}s -> concurrent {conc_sec:.1f}s "
        f"({serial_sec / max(conc_sec, 1e-9):.2f}x)"
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
