#!/usr/bin/env python3
"""Normalize a Verify plans dir into committable snapshots, so plan
regressions (lost pushdown, a broadcast flipping to a shuffle, a new
exchange) show up as a plain `git diff plans/` between rounds —
machine-visible to reviewer and builder alike instead of needing a
fresh hand audit.

Normalization strips what legitimately churns run-to-run while keeping
everything structural:
  - expression ids        (#12345 / #12345L)        -> #N / #NL
  - plan ids              [plan_id=98765]           -> [plan_id=N]
  - scratch paths         /tmp/graft_*, tempdirs    -> TMP
  - subquery result ids   subquery#123              -> subquery#N
  - cache/checkpoint rdds (LocalTableScan ids etc. are already absent
    from FormattedMode)

Usage: plan_snapshot.py PLANS_DIR OUT_DIR
  e.g.: plan_snapshot.py /tmp/verify_out.plans plans/
"""
import os
import re
import sys


def normalize(text: str) -> str:
    text = re.sub(r"#\d+", "#N", text)
    text = re.sub(r"\[plan_id=\d+\]", "[plan_id=N]", text)
    # AQE runtime statistics churn with row counts/sizes, not shape —
    # r13: d_clusters_incr flipped 16.1 MiB -> 64.1 MiB at identical
    # structure and produced a spurious snapshot diff
    text = re.sub(r"Statistics\(sizeInBytes=[^)]*\)", "Statistics(N)",
                  text)
    text = re.sub(r"/tmp/graft_[^\s,\]\)]*", "TMP", text)
    text = re.sub(r"/tmp/[A-Za-z0-9_.-]*(spark|temporary|checkpoint)"
                  r"[^\s,\]\)]*", "TMP", text, flags=re.I)
    text = re.sub(r"file:/tmp/[^\s,\]\)]*", "file:TMP", text)
    # parquet part files and write-job UUIDs
    text = re.sub(r"part-\d{5}-[0-9a-f-]+", "part-N", text)
    # default shuffle parallelism (spark.sql.shuffle.partitions — a
    # session setting, not a plan property): the ENSURE_REQUIREMENTS
    # suffix marks derived counts; explicit repartition()/shard counts
    # keep their literal (they ARE plan properties)
    text = re.sub(r", \d+\), ENSURE_REQUIREMENTS",
                  ", P), ENSURE_REQUIREMENTS", text)
    # lambda-variable and checkpoint-RDD ids churn with session state
    text = re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_N", text)
    text = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", text)
    # JVM lambda object identities and session-derived repartition
    # counts (decodeFeatures uses defaultParallelism)
    text = re.sub(r"\$\$Lambda\$\d+/0x[0-9a-f]+@[0-9a-f]+",
                  "$$Lambda$N", text)
    text = re.sub(r"\$\$anon\$(\d+)@[0-9a-f]+", r"$$anon$\1@N", text)
    # checkpoint call-site line numbers shift with unrelated edits
    text = re.sub(r"at ([A-Za-z]+\.scala):\d+", r"at \1:N", text)
    text = re.sub(r", \d+\), REPARTITION_BY_NUM",
                  ", P), REPARTITION_BY_NUM", text)
    text = re.sub(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-"
                  r"[0-9a-f]{12}", "UUID", text)
    return text


def main() -> None:
    plans_dir, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(n for n in os.listdir(plans_dir) if n.endswith(".txt"))
    for n in names:
        with open(os.path.join(plans_dir, n)) as f:
            norm = normalize(f.read())
        with open(os.path.join(out_dir, n), "w") as f:
            f.write(norm)
    print(f"snapshotted {len(names)} plans -> {out_dir}")


if __name__ == "__main__":
    main()
