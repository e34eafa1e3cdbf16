"""Second-decade scaling probe: run the FROZEN headline batch through
bench.py's interleaved Spark-vs-DuckDB protocol at an arbitrary synthetic
scale directory (built with tools/synth_scale.py), extending the
SCALE.md §7 curve (sf0.1 → sf1.0) by another decade (sf1.0 → sf10).

Usage:
  python tools/synth_scale.py 100 /tmp/sfsynth/sf10     # 100× sf0.1
  SPARK_GRAFT_DRIVER_MEM=48g python tools/decade_probe.py /tmp/sfsynth/sf10 [passes]
    passes  default 5 (>=5 adds a trimmed-mean pass summary — VERDICT r14
            item 3: the 3-pass bands carried 0.28-3.24 host-weather spread)

Prints ONE JSON line with the same fields as bench.py's sf1_0 section
plus the directory and per-table row counts — evidence of how the
batch's wall-clock and the Spark/DuckDB ratio move with another 10× of
data (the local stand-in for "would this survive a 100× scale-up").
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from bigdatawork_spark.schemas import TABLES  # noqa: E402
from bigdatawork_spark.session import get_spark  # noqa: E402


#: Repo-root file the ``--record`` flag appends each run to; bench.py
#: attaches the summarized band to its JSON line as the ``"sf10"`` block
#: (VERDICT r13 item 2: the decade ratio must be a reproducible band in
#: the artifact, not a one-off in prose).
BAND_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "DECADE_SF10.json",
)


def record_run(result: dict) -> None:
    """Append one probe run to BAND_FILE (creating it if needed)."""
    band = {"runs": []}
    if os.path.exists(BAND_FILE):
        with open(BAND_FILE) as fh:
            band = json.load(fh)
    band["runs"].append(result)
    tmp = BAND_FILE + ".inprogress"
    with open(tmp, "w") as fh:
        json.dump(band, fh, indent=1)
    os.rename(tmp, BAND_FILE)


def trimmed_summary(out: dict) -> dict:
    """Trimmed-mean pass summaries (VERDICT r14 item 3): with >=5 passes,
    drop the min and max pass ratio and mean the rest — one host-weather
    draw (an OS flush, a thermal dip) can no longer set the recorded
    number.  No-op below 5 passes (trimming 3 passes to 1 would REDUCE
    the evidence)."""
    extra: dict = {}
    for field, dest in (
        ("pass_ratios", "ratio_vs_duckdb_trimmed"),
        ("pass_ratios_allruns", "ratio_vs_duckdb_allruns_trimmed"),
    ):
        ratios = out.get(field) or []
        if len(ratios) >= 5:
            body = sorted(ratios)[1:-1]
            extra[dest] = round(sum(body) / len(body), 3)
    return extra


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--record"]
    record = "--record" in sys.argv
    sf_dir = argv[0] if len(argv) > 0 else "/tmp/sfsynth/sf10"
    passes = int(argv[1]) if len(argv) > 1 else 5
    import pyarrow.parquet as pq

    rows = {t: pq.read_metadata(f"{sf_dir}/{t}.parquet").num_rows for t in TABLES}
    # Same warm-cache protocol as bench.main (r13 review: without this,
    # _fill_cache was a no-op — io.load only caches under the env flag —
    # and the probe timed an uncached Spark side against DuckDB's warm
    # Q1 table, skewing the ratio against Spark).  Set UNCONDITIONALLY
    # (ADVICE r13): an inherited '0'/'true' would silently revert to the
    # uncached protocol; the warm cache is a stated precondition here.
    os.environ["SPARK_GRAFT_CACHE"] = "1"
    spark = get_spark("decade-probe", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench._warmup(spark, bench.HEADLINE)
    bench._fill_cache(spark, sf_dir)
    try:
        out = bench._sf1_interleaved(
            spark, bench.HEADLINE, passes, sf_dir, native_tables=True
        )
    finally:
        bench._drop_cache(spark, sf_dir)
    result = {"sf_dir": sf_dir, "rows": rows, **(out or {}),
              **trimmed_summary(out or {})}
    if record and out and "ratio_vs_duckdb" in out:
        record_run(result)
    print(json.dumps({"decade_probe": result}))


if __name__ == "__main__":
    main()
