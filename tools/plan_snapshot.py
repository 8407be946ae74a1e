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
    # Range splits follow local[N] (SPARK_GRAFT_CPUS — a session
    # setting, not a plan property): snapshots captured at 4 vs 32
    # threads differed only here
    text = re.sub(r"splits=Some\(\d+\)", "splits=Some(P)", text)
    return text


def _canon_seq(s: str) -> str:
    """Canonicalize one bracketed expression string: recursively sort
    the comma-separated items inside every []/() pair. Multiset content
    and nesting are preserved; only ordering is normalized."""
    def parse(i):
        # returns (canonical string for one item, next index)
        parts = []
        buf = []
        while i < len(s):
            ch = s[i]
            if ch in "[(":
                close = "]" if ch == "[" else ")"
                inner, i = parse_list(i + 1, close)
                buf.append(ch + inner + close)
            elif ch in "])" or ch == ",":
                break
            else:
                buf.append(ch)
                i += 1
        parts.append("".join(buf))
        return "".join(parts), i

    def parse_list(i, close):
        items = []
        while i < len(s):
            item, i = parse(i)
            items.append(item.strip())
            if i < len(s) and s[i] == ",":
                i += 1
                continue
            break
        if i < len(s) and s[i] == close:
            return ", ".join(sorted(items)), i + 1
        return ", ".join(sorted(items)), i

    out = []
    i = 0
    while i < len(s):
        item, j = parse(i)
        out.append(item)
        if j < len(s) and s[j] == ",":
            out.append(",")
            j += 1
        elif j == i:  # stray closer — copy through
            out.append(s[j])
            j += 1
        i = j
    return "".join(out)


def sort_attr_lists(text: str) -> str:
    """Per-file exception for plans built by Spark's multi-countDistinct
    rewrite (RewriteDistinctAggregates): the Expand projection per
    distinct group — and every downstream Keys/Input/Results list — is
    ordered by an ExpressionSet whose iteration order hashes expression
    ids, so two JVM runs of the IDENTICAL query disagree on group ORDER
    (both orders observed in one session, r19). Recursively sorting the
    items inside every bracket pair makes the snapshot order-canonical
    while keeping structure (node types, exchanges, aggregate modes)
    fully diffable. Applied ONLY to files named in ORDER_CANONICAL so
    genuine key-order regressions elsewhere stay visible.

    The distinct-group NUMBERING (gid literal per group, and the
    FILTER (WHERE gid = k) routing in the aggregate) is equally
    id-order-dependent, so the gid literals are masked to K first —
    after which the recursive sort is fully canonical."""
    text = re.sub(r"\(gid#N = \d+\)", "(gid#N = K)", text)
    text = re.sub(r", \d+, (null|cast)", r", K, \1", text)
    return "\n".join(
        _canon_seq(ln) if ("[" in ln or "(" in ln) else ln
        for ln in text.split("\n"))


ORDER_CANONICAL = {"x_profile.txt"}


def main() -> None:
    plans_dir, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(n for n in os.listdir(plans_dir) if n.endswith(".txt"))
    for n in names:
        with open(os.path.join(plans_dir, n)) as f:
            norm = normalize(f.read())
        if n in ORDER_CANONICAL:
            norm = sort_attr_lists(norm)
        with open(os.path.join(out_dir, n), "w") as f:
            f.write(norm)
    print(f"snapshotted {len(names)} plans -> {out_dir}")


if __name__ == "__main__":
    main()
